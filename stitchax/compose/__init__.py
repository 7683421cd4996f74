"""stitchax.compose — mix-method + inpainter plugin layer (L4).

TPU-native rebuild of the reference's composition/inpainting plugins
(reference: core/inference/mix_methods/). Mix methods decide which holes to
fill from where; inpainters synthesize pixels for the remaining holes. Both
are registered by name, preserving the reference's importlib plugin contract
(reference: out.py:235,344).
"""

from .mix_methods import all_img1_with_inpaint, inpaint_all_area, MixResult
from .inpainters import (Inpainter, DiffusionJacobiInpainter,
                         TransRefInpainter, get_inpainter)

__all__ = ["all_img1_with_inpaint", "inpaint_all_area", "MixResult",
           "Inpainter", "DiffusionJacobiInpainter", "TransRefInpainter",
           "get_inpainter"]
