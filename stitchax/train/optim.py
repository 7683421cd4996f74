"""Optimizer/schedule factory (optax).

Rebuild of the reference's fetch_optimizer (reference:
core/optimizer/__init__.py:4-74): AdamW(eps=1e-8, weight_decay=1e-4) +
OneCycleLR(linear anneal) + grad-norm clip 1, with an optional lower-LR
parameter group for pretrained encoders (twins_lr_factor).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import optax


@dataclass(frozen=True)
class OptimConfig:
    """Defaults = reference trainer block (configs/last_config.py)."""
    canonical_lr: float = 3.125e-6
    num_steps: int = 31323
    adamw_decay: float = 1e-4
    epsilon: float = 1e-8
    clip: float = 1.0
    pct_start: float = 0.05
    anneal_strategy: str = "linear"
    twins_lr_factor: Optional[float] = None
    batch_scale: int = 1  # lr scales with global batch like the reference CLI


def onecycle_schedule(cfg: OptimConfig) -> optax.Schedule:
    lr = cfg.canonical_lr * cfg.batch_scale
    if cfg.anneal_strategy == "linear":
        return optax.linear_onecycle_schedule(
            transition_steps=cfg.num_steps + 100, peak_value=lr,
            pct_start=cfg.pct_start, pct_final=1.0, div_factor=25.0,
            final_div_factor=1e4)
    return optax.cosine_onecycle_schedule(
        transition_steps=cfg.num_steps + 100, peak_value=lr,
        pct_start=cfg.pct_start, div_factor=25.0, final_div_factor=1e4)


def fetch_optimizer(cfg: OptimConfig,
                    encoder_mask_fn: Optional[Callable] = None
                    ) -> optax.GradientTransformation:
    """AdamW + OneCycle + clip. `encoder_mask_fn(params) -> bool pytree`
    selects pretrained-encoder params for the lower-LR group (the
    reference's twins_lr_factor split, core/optimizer/__init__.py:22-33)."""
    sched = onecycle_schedule(cfg)
    base = optax.chain(
        optax.clip_by_global_norm(cfg.clip),
        optax.adamw(learning_rate=sched, eps=cfg.epsilon,
                    weight_decay=cfg.adamw_decay),
    )
    if cfg.twins_lr_factor is None or encoder_mask_fn is None:
        return base

    f = cfg.twins_lr_factor
    enc_sched = lambda step: sched(step) * f
    encoder_opt = optax.chain(
        optax.clip_by_global_norm(cfg.clip),
        optax.adamw(learning_rate=enc_sched, eps=cfg.epsilon,
                    weight_decay=cfg.adamw_decay),
    )
    return optax.multi_transform(
        {"encoder": encoder_opt, "rest": base},
        lambda params: jax.tree_util.tree_map(
            lambda leaf_is_enc: "encoder" if leaf_is_enc else "rest",
            encoder_mask_fn(params)),
    )
