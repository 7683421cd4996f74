"""Import the read-only reference implementation (torch) for activation
parity tests.

The reference needs timm/loguru/torchvision/mmcv, none of which are
installed here; tests/refstubs/ provides minimal eval-time-equivalent
stand-ins (see each stub's docstring). The real reference modules are then
importable directly: `core.udis_utils.torch_DLT`,
`core.FlowFormer.PerCostFormer3.{decoder,gru,gma,attention,twins}`,
`core.UDIS2.{Homography,Composition}.network`, the TransRef package, etc.

Tests convert random-init reference state dicts through stitchax/convert.py
and assert layer outputs agree — the activation-level converter check
SURVEY.md §7.3 item 5 calls for.
"""

import os
import sys

import pytest

REF_ROOT = os.environ.get("STITCHAX_REFERENCE", "/root/reference")
STUB_DIR = os.path.join(os.path.dirname(__file__), "refstubs")


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REF_ROOT, "core"))


requires_reference = pytest.mark.skipif(
    not reference_available(),
    reason=f"reference checkout not found at {REF_ROOT}")


def add_reference_path() -> None:
    for p in (STUB_DIR, REF_ROOT):
        if p not in sys.path:
            sys.path.insert(0, p)


def import_ref(name: str):
    """Import a reference module by dotted name with stubs active."""
    add_reference_path()
    import importlib
    return importlib.import_module(name)


def import_transref(name: str):
    """Import a module from the vendored TransRef package, which uses
    package-root-relative imports (`models.*`, `util.*`) — the reference
    itself appends/removes the dir around its import
    (core/inference/mix_methods/utils/transref_inpainter.py:5-8)."""
    add_reference_path()
    troot = os.path.join(REF_ROOT,
                         "core/inference/mix_methods/utils/TransRef")
    sys.path.insert(0, troot)
    try:
        import importlib
        return importlib.import_module(name)
    finally:
        sys.path.remove(troot)
