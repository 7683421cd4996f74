"""Flow-field utilities: backward warp, resize, convex upsampling.

Reference semantics: core/warp_utils.py:38-80 (resize_flow / warp),
core/FlowFormer/PerCostFormer3/decoder.py:214-225 (convex 8x upsampling).
Flows here are (B, H, W, 2), xy-last, in pixels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .grid import coords_grid
from .sampling import grid_sample, interpolate_bilinear


def flow_to_warp(flow: jnp.ndarray) -> jnp.ndarray:
    """flow (..., H, W, 2) -> absolute sampling coords grid+flow."""
    H, W = flow.shape[-3], flow.shape[-2]
    grid = coords_grid(H, W, dtype=flow.dtype)
    return grid + flow


def flow_warp(x: jnp.ndarray, flow: jnp.ndarray, mode: str = "bilinear") -> jnp.ndarray:
    """Backward-warp (H, W, C) by flow (H, W, 2): out(p) = x(p + flow(p)).

    torch parity: grid_sample align_corners=True, zeros padding
    (reference: core/warp_utils.py:71-80).
    """
    H, W, _ = x.shape
    coords = flow_to_warp(flow)
    gx = 2.0 * coords[..., 0] / max(W - 1, 1) - 1.0
    gy = 2.0 * coords[..., 1] / max(H - 1, 1) - 1.0
    return grid_sample(x, jnp.stack([gx, gy], axis=-1), mode=mode)


flow_warp_b = jax.vmap(flow_warp, in_axes=(0, 0))


def resize_flow(flow: jnp.ndarray, new_h: int, new_w: int) -> jnp.ndarray:
    """Resize (H, W, 2) flow bilinearly (align_corners=True) and rescale the
    vectors to the new pixel units (reference: core/warp_utils.py:38-46)."""
    H, W, _ = flow.shape
    out = interpolate_bilinear(flow, new_h, new_w, align_corners=True)
    scale = jnp.array([new_w / float(W), new_h / float(H)], flow.dtype)
    return out * scale


def resize_flow_b(flow: jnp.ndarray, new_h: int, new_w: int) -> jnp.ndarray:
    return jax.vmap(lambda f: resize_flow(f, new_h, new_w))(flow)


def upflow8(flow: jnp.ndarray) -> jnp.ndarray:
    """8x bilinear upsample + rescale (reference: core/utils/utils.py:103)."""
    H, W, _ = flow.shape
    return 8.0 * interpolate_bilinear(flow, 8 * H, 8 * W, align_corners=True)


def convex_upsample_flow(flow: jnp.ndarray, mask: jnp.ndarray,
                         rate: int = 8) -> jnp.ndarray:
    """RAFT convex upsampling by `rate` (8 for the decoder, 4 for the
    optional quarter-res refiner).

    flow: (H, W, 2); mask: (H, W, rate*rate*9) logits. Output (rH, rW, 2).
    Reference: core/FlowFormer/PerCostFormer3/decoder.py:214-225.
    """
    H, W, _ = flow.shape
    m = mask.reshape(H, W, 1, 9, rate, rate)
    m = jax.nn.softmax(m, axis=3)

    # 3x3 neighborhood of rate*flow with zero padding (F.unfold semantics)
    f = float(rate) * flow
    fpad = jnp.pad(f, ((1, 1), (1, 1), (0, 0)))
    # neighborhood stack: (H, W, 2, 9) in row-major dy,dx order
    taps = []
    for dy in range(3):
        for dx in range(3):
            taps.append(fpad[dy:dy + H, dx:dx + W, :])
    nb = jnp.stack(taps, axis=-1)  # (H, W, 2, 9)

    up = jnp.einsum("hwcn,hwznuv->hwzcuv", nb, m)  # z==1
    up = up[:, :, 0]  # (H, W, 2, rate, rate)
    # interleave: out[r*i+u, r*j+v] = up[i, j, :, u, v]
    up = up.transpose(0, 3, 1, 4, 2)  # (H, rate, W, rate, 2)
    return up.reshape(rate * H, rate * W, 2)


def convex_upsample_flow_b(flow: jnp.ndarray, mask: jnp.ndarray,
                           rate: int = 8) -> jnp.ndarray:
    return jax.vmap(lambda f, m: convex_upsample_flow(f, m, rate))(flow, mask)
