"""Inference config: fast_cv_g8 with the learned seam composition ON.

The cheapest composition-enabled pipeline — classical push-pull inpainter
(no neural inpainter programs) but the full CompositionNet seam stage, so
the trained seam can be exercised/scored end-to-end without the TransRef
compile surface (used by the round-4 composition pipeline eval,
tools/eval_composition_outputs.py).

Follows the reference's plugin contract (reference README.md:38-39: add a
module to inf_configs/ and pass --inf_cfg <name>).
"""

from inf_configs.fast_cv_g8 import (
    get_infernce_config as _base_inference,
    get_tps_pipline_config,  # noqa: F401  (unchanged from fast_cv_g8)
)


def get_infernce_config():
    c = _base_inference()
    c["use_composition"] = True
    return c
