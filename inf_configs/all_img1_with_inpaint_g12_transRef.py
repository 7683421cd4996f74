"""Inference config: img1-first hole filling + TransRef inpainter, grid 12.

Rebuild of reference inf_configs/all_img1_with_inpaint_g12_transRef.py:3-74;
same plugin contract — `python out.py --inf_cfg <this module name>` — and
the same two functions. Add your own module next to this one to extend
(reference README.md:38-39).
"""


def get_tps_pipline_config(cfg):
    return {
        "inpainter": "transref_inpainter",
        "mix_method": "all_img1_with_inpaint",
        "grid_h": 12,
        "grid_w": 12,
        "get_pt_methods": ["advanced_uniform_multi"],
        "tps_method": "stitchax",   # unified JAX backend (opencv-kernel math)
        "is_plot": False,
        "pad_num": 4,
        "add_corner": False,
        "flow_limit": -1,
        "use_valid_on_flow": False,
        "add_meshgrid": False,
        "affine_scale": 1.0,
        "kernel_scale": 1.0,
        "use_boundary_limit": False,
        "residual_flow_use_forward": cfg.get("use_foward", False),
        "use_occ_filter": True,
        "use_border_points_mask": True,
        "do_avg_pooling": True,
        "occlusion_mask": None,
        "use_composition_when_inpaint": False,
        "output2_is_only_tps": True,
        "resize_to_area_limit_before_inpaint": 750 * 750,
    }


def get_infernce_config():
    return {
        "is_plot": False,
        "eval": "udis_eval",
        "only_init_model": False,
        "use_composition": True,
        "composition_model_path": "./checkpoints/composition",
        "resize_to_512": False,
        "pad_mode": "replicate",
        "restore_ckpt": "",
        "test_not_use_combine_h_flow": True,
        "swap_image": False,
        "use_forward": False,
        "use_fb_consistency_mask": True,
        "use_whole_resolution": False,
    }
