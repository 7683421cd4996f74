"""Config-stack tests: CLI args ⊕ inf_configs plugin ⊕ model config merge
(the reference's three-tier stack, out.py:15-54)."""

import argparse

import pytest

from stitchax.run.config import build_eval_config, build_out_config
from stitchax.utils.config import CfgNode


def _args(**over):
    base = dict(ckpt_path="./nope", model_config_name="last_config",
                data_root_path="demo_data/", txt_file="demo.txt", gpu="0",
                inf_cfg="fast_cv_g8", result_dir="results",
                skip_if_avg_fusion_exists=False)
    base.update(over)
    return argparse.Namespace(**base)


class TestOutConfig:
    def test_merge_order_and_plugin(self):
        cfg = build_out_config(_args())
        # inference config keys
        assert cfg.use_composition is False           # fast_cv_g8 override
        assert cfg.pad_mode == "replicate"
        # CLI keys
        assert cfg.inf_cfg == "fast_cv_g8"
        assert cfg.restore_ckpt == "./nope"
        # model config keys
        assert cfg.percostformer3.decoder_depth == 12
        assert cfg.batch_size == 1                    # forced like reference
        # nested TPS node built from the merged cfg
        t = cfg.TPS_PIPELINE_CONFIG
        assert t.grid_h == 8 and t.inpainter == "cv_inpainter"
        assert t.residual_flow_use_forward == cfg.use_foward

    def test_default_plugin(self):
        cfg = build_out_config(_args(inf_cfg="all_img1_with_inpaint_g12_transRef"))
        t = cfg.TPS_PIPELINE_CONFIG
        assert t.grid_h == 12 and t.inpainter == "transref_inpainter"
        assert t.mix_method == "all_img1_with_inpaint"
        assert cfg.use_composition is True

    def test_comp_plugin_derives_from_fast_cv_g8(self):
        # fast_cv_g8_comp = fast_cv_g8 with ONLY the composition stage
        # flipped on (the round-4 composition pipeline eval's config)
        base = build_out_config(_args())
        cfg = build_out_config(_args(inf_cfg="fast_cv_g8_comp"))
        assert cfg.use_composition is True
        t, tb = cfg.TPS_PIPELINE_CONFIG, base.TPS_PIPELINE_CONFIG
        assert t.grid_h == tb.grid_h and t.inpainter == tb.inpainter
        assert t.mix_method == tb.mix_method
        assert cfg.pad_mode == base.pad_mode

    def test_diffusion_plugin(self):
        cfg = build_out_config(_args(inf_cfg="inpaint_all_area_g12_diffusion"))
        t = cfg.TPS_PIPELINE_CONFIG
        assert t.inpainter == "inpainter"
        assert t.mix_method == "inpaint_all_area"


class TestCfgNode:
    def test_merge_and_freeze(self):
        c = CfgNode({"a": 1, "b": {"c": 2}})
        c.merge_from_dict({"b": {"d": 3}, "e": "x"})
        assert c.b.c == 2 and c.b.d == 3 and c.e == "x"
        c.freeze()
        with pytest.raises(AttributeError):
            c.a = 5
        c.defrost()
        c.merge_from_list(["b.c", "7", "a", "9"])
        assert c.b.c == 7 and c.a == 9  # coerced to existing int types

    def test_eval_config(self):
        args = argparse.Namespace(model_config_name="last_config",
                                  data_dir="/tmp", batch_size=12, gpu="0",
                                  ckpt_path="x", max_pairs=-1)
        cfg = build_eval_config(args)
        assert cfg.batch_size == 12
        assert cfg.image_size == [512, 512]
        # --ckpt_path must win over the config's restore_ckpt: None
        assert cfg.restore_ckpt == "x"

    def test_eval_config_none_args_keep_defaults(self):
        # unset CLI flags (argparse None) must not clobber model-config
        # defaults: a None image_size once erased the config's [512, 512]
        args = argparse.Namespace(model_config_name="last_config",
                                  data_dir=None, batch_size=12, gpu="0",
                                  ckpt_path="x", max_pairs=-1,
                                  image_size=None)
        cfg = build_eval_config(args)
        assert cfg.image_size == [512, 512]
        assert cfg.udis_dataset.data_dir  # config default survives
