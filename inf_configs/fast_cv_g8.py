"""Inference config: classical push-pull inpainter, grid 8 — the fastest
full-pipeline configuration (no neural inpainter). Useful for smoke tests
and for machines without converted TransRef/SD checkpoints.

Follows the reference's plugin contract (reference README.md:38-39: add a
module to inf_configs/ and pass --inf_cfg <name>).
"""

from inf_configs.all_img1_with_inpaint_g12_transRef import (
    get_infernce_config as _base_inference,
    get_tps_pipline_config as _base_tps,
)


def get_tps_pipline_config(cfg):
    c = _base_tps(cfg)
    c["inpainter"] = "cv_inpainter"
    c["mix_method"] = "all_img1_with_inpaint"
    c["grid_h"] = c["grid_w"] = 8
    return c


def get_infernce_config():
    c = _base_inference()
    c["use_composition"] = False
    return c
