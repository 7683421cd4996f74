"""Inference config: inpaint-everything + diffusion inpainter, grid 12.

Rebuild of reference inf_configs/inpaint_all_area_g12_diffusion.py (differs
from the transref config only in inpainter/mix_method, SURVEY.md §2.1).
"""

from inf_configs.all_img1_with_inpaint_g12_transRef import (
    get_infernce_config as _base_inference,
    get_tps_pipline_config as _base_tps,
)


def get_tps_pipline_config(cfg):
    c = _base_tps(cfg)
    c["inpainter"] = "inpainter"           # SD + ControlNet path
    c["mix_method"] = "inpaint_all_area"
    return c


def get_infernce_config():
    return _base_inference()
