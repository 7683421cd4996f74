"""Deformable convolution as bilinear gather + MXU matmul.

TPU-native replacement for mmcv's CUDA DeformConv2d op used by TransRef's
PA alignment module (reference: .../TransRef/models/RefPA/PA.py:5,15,22;
SURVEY.md §2.4 item 2). Semantics match mmcv deform_conv with
deform_groups=1, no modulation mask, zero padding, no bias:

  out(p) = sum_k W_k * x(p + r_k + Δ_k(p))

where r_k are the regular 3x3 taps and Δ_k are learned per-pixel offsets
stored as 2*K channels ordered (dy, dx) per kernel tap, taps row-major.
The gather produces a (H, W, K*C) tensor contracted against the reshaped
conv weights — one big matmul on the MXU instead of a scatter kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def deform_conv2d(x: jnp.ndarray, offsets: jnp.ndarray, weights: jnp.ndarray,
                  kernel_size: int = 3) -> jnp.ndarray:
    """x (H, W, C); offsets (H, W, 2*K*K) [(dy, dx) per tap, row-major];
    weights (K*K*C, C_out). Returns (H, W, C_out). Batch via jax.vmap."""
    H, W, C = x.shape
    K = kernel_size
    r = K // 2

    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=x.dtype),
                          jnp.arange(W, dtype=x.dtype), indexing="ij")

    taps = []
    for i in range(K):         # row (dy)
        for j in range(K):     # col (dx)
            k = i * K + j
            dy = offsets[..., 2 * k]
            dx = offsets[..., 2 * k + 1]
            sy = ys + (i - r) + dy
            sx = xs + (j - r) + dx
            taps.append(_bilinear_gather_zero(x, sx, sy))
    stacked = jnp.stack(taps, axis=-2)          # (H, W, K*K, C)
    flat = stacked.reshape(H * W, K * K * C)
    out = flat @ weights                        # MXU
    return out.reshape(H, W, -1)


def _bilinear_gather_zero(img: jnp.ndarray, x: jnp.ndarray,
                          y: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample (H, W, C) at pixel coords with zero padding, matching
    the CUDA kernel's out-of-bounds behaviour."""
    H, W, _ = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def tap(xi, yi, w):
        ix = jnp.clip(xi.astype(jnp.int32), 0, W - 1)
        iy = jnp.clip(yi.astype(jnp.int32), 0, H - 1)
        inb = ((xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1))
        return img[iy, ix] * (w * inb.astype(img.dtype))[..., None]

    return (tap(x0, y0, (1 - wx) * (1 - wy)) + tap(x0 + 1, y0, wx * (1 - wy))
            + tap(x0, y0 + 1, (1 - wx) * wy)
            + tap(x0 + 1, y0 + 1, wx * wy))


deform_conv2d_b = jax.vmap(deform_conv2d, in_axes=(0, 0, None), out_axes=0)
