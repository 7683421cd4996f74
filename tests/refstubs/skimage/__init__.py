"""skimage stand-in: core/utils/warper.py imports skimage.io at module
scope but none of the code paths the parity tests exercise ever call it
(it is only used by Warper's file-based debug helpers)."""

from . import io  # noqa: F401
