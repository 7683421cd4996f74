"""Config assembly for the CLIs.

Preserves the reference's three-tier config stack (reference:
out.py:15-54 — argparse ⊕ importlib python-module configs ⊕ yacs merge),
using stitchax.utils.config.CfgNode and the registries' importlib fallback.
"""

from __future__ import annotations

import importlib
from typing import Any, Dict

from ..utils.config import CfgNode


def _load_module_attr(module_name: str, attr: str):
    mod = importlib.import_module(module_name)
    return getattr(mod, attr)


def build_out_config(args) -> CfgNode:
    """Replicates get_config() (reference: out.py:43-54): inference config
    from inf_configs.<name>, merged with CLI args, merged with the model
    config from configs.<model_config_name>, plus the nested
    TPS_PIPELINE_CONFIG built from the merged cfg."""
    inf_mod = f"inf_configs.{args.inf_cfg}"
    get_inference_config = _load_module_attr(inf_mod, "get_infernce_config")
    get_tps_config = _load_module_attr(inf_mod, "get_tps_pipline_config")

    cfg = CfgNode(get_inference_config())
    cfg.merge_from_dict(vars(args))

    model_dict = _load_module_attr(f"configs.{args.model_config_name}",
                                   "config_dict")
    cfg.merge_from_dict(model_dict)
    cfg.batch_size = 1
    cfg.restore_ckpt = args.ckpt_path

    cfg.TPS_PIPELINE_CONFIG = CfgNode(get_tps_config(cfg))
    return cfg


def build_eval_config(args) -> CfgNode:
    """Replicates evaluate.py's config load (reference: evaluate.py:139-144)."""
    model_dict = _load_module_attr(f"configs.{args.model_config_name}",
                                   "config_dict")
    cfg = CfgNode(model_dict)
    # unset CLI flags (argparse None) must NOT clobber model-config
    # defaults (e.g. a None image_size erasing the config's [512, 512] —
    # the reference merges the same way, evaluate.py:139-144, but its
    # arg surface never overlaps config keys; ours does)
    cfg.merge_from_dict({k: v for k, v in vars(args).items()
                         if v is not None})
    cfg.batch_size = getattr(args, "batch_size", 12)
    # --ckpt_path must win over the model config's restore_ckpt (same
    # wiring as build_out_config above; without this the eval CLI
    # silently ran random-init weights regardless of the flag)
    if getattr(args, "ckpt_path", None):
        cfg.restore_ckpt = args.ckpt_path
    return cfg
