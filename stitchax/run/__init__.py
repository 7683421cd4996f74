"""stitchax.run — CLI orchestration layer (L6).

Preserves the reference's public API (reference: out.py, evaluate.py;
SURVEY.md §1 L6): same flags, same config plugin mechanism, same output
file names — implemented over jitted, shape-bucketed device steps.
"""

from .stitcher import Stitcher, StitchModels, load_pair_list, load_image
from .config import build_out_config, build_eval_config

__all__ = ["Stitcher", "StitchModels", "load_pair_list", "load_image",
           "build_out_config", "build_eval_config"]
