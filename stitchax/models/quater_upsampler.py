"""Quarter-resolution flow refinement (optional; off in the shipped config).

Rebuild of reference core/FlowFormer/PerCostFormer3/quater_upsampler.py:
31-119 (`quater_refine: False` in configs/last_config.py): upsample the
1/8-res flow to 1/4, compute a local 3x3 correlation between 1/4-res
features warped by the current flow, regress a flow delta, and convex-4x
upsample to full resolution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.flow import flow_warp_b
from ..ops.sampling import interpolate_bilinear_b


def local_cost_3x3(f1: jnp.ndarray, f2w: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel 3x3 local correlation (reference: get_local_cost :60-86).
    f1/f2w: (B, H, W, C) -> (B, H, W, 9)."""
    B, H, W, C = f1.shape
    pad = jnp.pad(f2w, ((0, 0), (1, 1), (1, 1), (0, 0)))
    costs = []
    for dy in range(3):
        for dx in range(3):
            shifted = pad[:, dy:dy + H, dx:dx + W]
            costs.append((f1 * shifted).sum(-1) / jnp.sqrt(float(C)))
    return jnp.stack(costs, -1)


class QuaterUpsampler(nn.Module):
    """(reference: quater_upsampler.py:31-119)."""

    @nn.compact
    def __call__(self, flow_lr, feat1_q, feat2_q):
        """flow_lr: (B, H/8, W/8, 2); feat*_q: (B, H/4, W/4, C) quarter-res
        features. Returns full-res flow (B, H, W, 2)."""
        B, Hq, Wq, _ = feat1_q.shape
        flow_q = interpolate_bilinear_b(flow_lr, Hq, Wq) * 2.0

        f2w = flow_warp_b(feat2_q, flow_q)
        cost = local_cost_3x3(feat1_q, f2w)

        x = jnp.concatenate([cost, flow_q, feat1_q], -1)
        x = nn.relu(nn.Conv(128, (3, 3), padding="SAME", name="conv1")(x))
        x = nn.relu(nn.Conv(64, (3, 3), padding="SAME", name="conv2")(x))
        delta = nn.Conv(2, (3, 3), padding="SAME", name="flow_head")(x)
        flow_q = flow_q + delta

        # convex 4x upsample (16*9 mask)
        m = nn.relu(nn.Conv(128, (3, 3), padding="SAME", name="mask1")(x))
        mask = 0.25 * nn.Conv(16 * 9, (1, 1), name="mask2")(m)
        from ..ops.flow import convex_upsample_flow_b
        return convex_upsample_flow_b(flow_q, mask, rate=4)
