"""Unsupervised alignment losses.

The reference ships no train.py; these objectives are reconstructed from its
trainer config (reference: configs/last_config.py — gamma=0.8 sequence
weighting, rigid_motion_loss_weight=0.3, border_loss_weight=0.5,
weight_mask_type='occlusion', no_gt_flow=True, is_zero_flow_in_edge=True,
max_flow=500, only_calculate_on_inv_mask=True) and the training forward
(reference: core/flowHomoAdpater.py:83-191 returns all decoder predictions
for sequence loss). UDIS-D has no GT flow (core/datasets.py:430 yields
zeros), so supervision is photometric.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class LossConfig:
    gamma: float = 0.8
    rigid_motion_weight: float = 0.3
    border_weight: float = 0.5
    max_flow: float = 500.0
    border_px: int = 8
    charbonnier_eps: float = 1.0


def photometric_l1(img1: jnp.ndarray, warped2: jnp.ndarray,
                   mask: jnp.ndarray, eps: float = 1.0) -> jnp.ndarray:
    """Masked Charbonnier photometric distance in RAW gray levels.

    Kept on the [0, 255] scale deliberately: the reference's loss weights
    (rigid_motion 0.3, border 0.5 of per-pixel flow magnitude,
    configs/last_config.py) only balance against a gray-level photometric
    term — normalizing the diff to [0,1] makes 0.3·|flow| dominate and
    the optimizer collapses the residual flow to zero instead of letting
    it fix what the homography can't (measured in tools/train_learns.py:
    aligned PSNR stuck == homo-only PSNR under the [0,1] scale)."""
    diff = img1 - warped2
    err = jnp.sqrt(diff * diff + eps * eps)
    w = mask
    return (err * w).sum() / (jnp.maximum(w.sum(), 1.0) * img1.shape[-1])


def border_zero_flow_loss(flow: jnp.ndarray, border_px: int) -> jnp.ndarray:
    """Penalize non-zero flow in a border ring (is_zero_flow_in_edge)."""
    B, H, W, _ = flow.shape
    m = jnp.zeros((H, W), flow.dtype)
    b = border_px
    m = m.at[:b, :].set(1).at[-b:, :].set(1).at[:, :b].set(1).at[:, -b:].set(1)
    mag = jnp.abs(flow).sum(-1)
    return (mag * m[None]).sum() / jnp.maximum(m.sum() * B, 1.0)


def rigid_motion_loss(flow: jnp.ndarray) -> jnp.ndarray:
    """Penalize residual-flow magnitude so the homography explains as much
    motion as possible ('rigid motion'; weight 0.3 in the shipped config)."""
    return jnp.sqrt((flow * flow).sum(-1) + 1e-6).mean()


def smoothness_loss(flow: jnp.ndarray) -> jnp.ndarray:
    """First-order flow smoothness."""
    dx = jnp.abs(flow[:, :, 1:] - flow[:, :, :-1]).mean()
    dy = jnp.abs(flow[:, 1:] - flow[:, :-1]).mean()
    return dx + dy


def sequence_alignment_loss(img1: jnp.ndarray, output_H: jnp.ndarray,
                            flow_predictions: List[jnp.ndarray],
                            occlusion_mask: Optional[jnp.ndarray],
                            cfg: LossConfig) -> Dict[str, jnp.ndarray]:
    """Total unsupervised loss over the decoder's prediction sequence.

    img1 (B, H, W, 3); output_H (B, H, W, 6) = H-warped img2 ⊕ warped-ones
    mask (the adapter's composite); flow_predictions: per-iteration flows,
    exponentially weighted by gamma like RAFT sequence losses (the reference
    trains FlowFormer the same way — gamma in configs/last_config.py).
    """
    from ..ops.flow import flow_warp_b

    n = len(flow_predictions)
    total = jnp.zeros((), img1.dtype)
    photo_last = jnp.zeros((), img1.dtype)
    for i, flow in enumerate(flow_predictions):
        weight = cfg.gamma ** (n - 1 - i)
        # ignore diverged predictions (max_flow clip)
        mag = jnp.sqrt((flow * flow).sum(-1, keepdims=True))
        valid_flow = (mag < cfg.max_flow).astype(img1.dtype)

        warped = flow_warp_b(output_H, flow)
        w2, wmask = warped[..., 0:3], warped[..., 3:6].mean(-1, keepdims=True)
        m = wmask * valid_flow
        if occlusion_mask is not None:
            m = m * occlusion_mask
        photo = photometric_l1(img1, w2, m, cfg.charbonnier_eps)
        total = total + weight * photo
        photo_last = photo

    final_flow = flow_predictions[-1]
    rigid = rigid_motion_loss(final_flow)
    border = border_zero_flow_loss(final_flow, cfg.border_px)
    total = (total + cfg.rigid_motion_weight * rigid
             + cfg.border_weight * border)
    return dict(total=total, photometric=photo_last, rigid=rigid,
                border=border)
