"""Differentiable samplers: grid_sample, bilinear_sampler, resize, homography warp.

All functions are NHWC, xy-last, jit-safe with static shapes. Two distinct
bilinear semantics are implemented on purpose:

  * `grid_sample` — torch ``F.grid_sample(align_corners=True,
    padding_mode='zeros')`` parity: pixel mapping x=(g+1)(W-1)/2, each of the
    four taps masked to zero when its *unclamped* index is out of bounds
    (reference: core/warp_utils.py:71-80, core/utils/utils.py:62-76).

  * `homography_warp` — the UDIS2 spatial-transformer sampler: pixel mapping
    x=(g+1)W/2 (note: W, not W-1) and *clamped-index* weights, whose signed
    weights cancel to exactly 0 outside the source image; this property is
    what makes warped all-ones mask channels valid coverage masks
    (reference: core/udis_utils/torch_homo_transform.py:17-92).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .grid import coords_grid, normalized_grid


def _gather_2d(img: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray) -> jnp.ndarray:
    """Gather pixels: img (H, W, C), ix/iy int (...,) -> (..., C)."""
    return img[iy, ix]


def _axis_weights(i0f: jnp.ndarray, frac: jnp.ndarray, n: int,
                  rule: str = "zeros"):
    """Zeros-padding bilinear weights for the two gathered positions of one
    axis, where the gather start is clip(i0, 0, n-2).

    The true taps are (i0, i0+1) with weights (1-f, f), each zeroed when out
    of [0, n-1]. The gathered block covers (start, start+1); with shift
    s = i0 - start ∈ {-1, 0, +1} (|s|>1 ⇒ fully out of bounds), the gathered
    position start+d carries the true tap d-s's weight, or 0 — which
    reproduces per-tap zeros masking exactly with a single clamped gather.
    """
    start = jnp.clip(i0f, 0.0, float(n - 2))
    s = i0f - start
    if rule == "interior":
        # UDIS2 clamped-index-weight semantics (torch_homo_transform.py):
        # clamping makes out-of-range taps coincide and their signed
        # weights cancel exactly, so only fully-interior floors contribute
        w0 = (1.0 - frac) * (s == 0.0)
        w1 = frac * (s == 0.0)
    else:  # zeros padding: each true tap masked independently
        w0 = (1.0 - frac) * (s == 0.0) + frac * (s == -1.0)
        w1 = frac * (s == 0.0) + (1.0 - frac) * (s == 1.0)
    return start.astype(jnp.int32), w0, w1


def _bilinear_gather_2x2(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                         rule: str = "zeros") -> jnp.ndarray:
    """Bilinear sample img (H, W, C) at pixel coords x/y (...,), zeros
    padding, via ONE flattened row lookup per pixel: TPU gathers are
    per-fetched-row serialized, so the four taps are pre-packed into a
    4-tap image IMG4 (H·W, 4C) with three cheap shifted copies, turning the
    warp into an embedding-style single-row take. Measured at 512² batch 4
    on v5e: 4x (1,1,C) gathers 120 ms -> one (2,2,C) slice gather 30 ms ->
    IMG4 row-take 10 ms, bit-identical (tools/exp_warp_take.py)."""
    H, W, C = img.shape
    shape = x.shape
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    sx, wx0, wx1 = _axis_weights(x0f, x - x0f, W, rule)
    sy, wy0, wy1 = _axis_weights(y0f, y - y0f, H, rule)

    # IMG4[y*W+x] = [img[y,x], img[y,x+1], img[y+1,x], img[y+1,x+1]];
    # starts are clamped to [0, n-2], so the padded row/col is never read.
    p = jnp.pad(img, ((0, 1), (0, 1), (0, 0)))
    img4 = jnp.concatenate(
        [p[:H, :W], p[:H, 1:W + 1], p[1:H + 1, :W], p[1:H + 1, 1:W + 1]],
        axis=-1).reshape(H * W, 4 * C)
    idx = (sy * W + sx).reshape(-1)
    blk = jnp.take(img4, idx, axis=0).reshape(-1, 2, 2, C)
    wy = jnp.stack([wy0.reshape(-1), wy1.reshape(-1)], -1)      # (P, 2)
    wx = jnp.stack([wx0.reshape(-1), wx1.reshape(-1)], -1)
    out = jnp.einsum("pyxc,py,px->pc", blk, wy.astype(img.dtype),
                     wx.astype(img.dtype))
    return out.reshape(shape + (C,))


def grid_sample(img: jnp.ndarray, grid: jnp.ndarray, *, mode: str = "bilinear",
                align_corners: bool = True,
                padding_mode: str = "zeros") -> jnp.ndarray:
    """Sample `img` (H, W, C) at normalized grid (..., 2) in [-1, 1], xy-last.

    torch-parity sampler (see module docstring). Batched use via jax.vmap.
    """
    H, W, _ = img.shape
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        x = (gx + 1.0) * (W - 1) / 2.0
        y = (gy + 1.0) * (H - 1) / 2.0
    else:
        x = ((gx + 1.0) * W - 1.0) / 2.0
        y = ((gy + 1.0) * H - 1.0) / 2.0

    if mode == "nearest":
        # torch rounds half away from zero? It uses round-to-nearest-even via
        # `std::nearbyint`; jnp.round matches (banker's rounding).
        ix = jnp.clip(jnp.round(x).astype(jnp.int32), 0, W - 1)
        iy = jnp.clip(jnp.round(y).astype(jnp.int32), 0, H - 1)
        out = _gather_2d(img, ix, iy)
        if padding_mode == "zeros":
            inb = ((x >= -0.5) & (x <= W - 0.5) & (y >= -0.5) & (y <= H - 0.5))
            out = out * inb[..., None].astype(img.dtype)
        return out

    if padding_mode == "zeros":
        return _bilinear_gather_2x2(img, x, y)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def tap(xi, yi, wgt):
        ix = jnp.clip(xi.astype(jnp.int32), 0, W - 1)
        iy = jnp.clip(yi.astype(jnp.int32), 0, H - 1)
        val = _gather_2d(img, ix, iy)
        return val * wgt[..., None]

    out = (tap(x0, y0, wx0 * wy0) + tap(x1, y0, wx1 * wy0)
           + tap(x0, y1, wx0 * wy1) + tap(x1, y1, wx1 * wy1))
    return out


def bilinear_sampler(img: jnp.ndarray, coords: jnp.ndarray,
                     mode: str = "bilinear") -> jnp.ndarray:
    """Sample at *pixel* coordinates (..., 2), torch bilinear_sampler parity
    (reference: core/utils/utils.py:62-76): normalizes by (W-1, H-1) then
    grid_samples with align_corners=True, zeros padding."""
    H, W, _ = img.shape
    gx = 2.0 * coords[..., 0] / (W - 1) - 1.0
    gy = 2.0 * coords[..., 1] / (H - 1) - 1.0
    return grid_sample(img, jnp.stack([gx, gy], axis=-1), mode=mode)


def _resize_matrix(n_in: int, n_out: int, align_corners: bool):
    """Static (n_out, n_in) bilinear row-interpolation matrix (numpy, built
    at trace time). Matches torch F.interpolate source-coordinate rules."""
    import numpy as np
    if align_corners:
        src = (np.arange(n_out) * (n_in - 1) / max(n_out - 1, 1)
               if n_out > 1 else np.zeros(1))
    else:
        src = np.clip((np.arange(n_out) + 0.5) * n_in / n_out - 0.5,
                      0, n_in - 1)
    i0 = np.floor(src).astype(np.int64)
    f = src - i0
    i1 = np.minimum(i0 + 1, n_in - 1)
    M = np.zeros((n_out, n_in), np.float32)
    M[np.arange(n_out), i0] += 1.0 - f
    M[np.arange(n_out), i1] += f
    return M


def interpolate_bilinear(img: jnp.ndarray, out_h: int, out_w: int,
                         align_corners: bool = True) -> jnp.ndarray:
    """Resize (H, W, C) -> (out_h, out_w, C), torch F.interpolate parity.

    TPU-first formulation: a resize is separable, so it runs as two matmuls
    against static bilinear row/column matrices (MXU) instead of a per-pixel
    gather — measured ~20x faster than the gather lowering at 512² on v5e.
    """
    H, W, _ = img.shape
    Ry = jnp.asarray(_resize_matrix(H, out_h, align_corners), img.dtype)
    Rx = jnp.asarray(_resize_matrix(W, out_w, align_corners), img.dtype)
    out = jnp.einsum("oh,hwc->owc", Ry, img,
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("pw,owc->opc", Rx, out,
                     preferred_element_type=jnp.float32)
    return out.astype(img.dtype)


def resize_image(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """torchvision T.Resize parity (bilinear, antialias-free, align_corners=False).

    Reference: `resize_512` (core/flowHomoAdpater.py:14).
    """
    return interpolate_bilinear(img, out_h, out_w, align_corners=False)


def homography_warp(img: jnp.ndarray, theta: jnp.ndarray,
                    out_h: int, out_w: int) -> jnp.ndarray:
    """Warp (H, W, C) by a normalized-space 3x3 transform into (out_h, out_w, C).

    Exact semantics of the UDIS2 spatial transformer (reference:
    core/udis_utils/torch_homo_transform.py:5-151): build a [-1,1] meshgrid
    over the output, project through `theta`, divide (with the 1e-6 epsilon
    nudge on near-zero denominators), map to pixels via (s+1)*size/2, and
    bilinearly gather with *clamped-index weights* so that signed weights
    cancel to zero outside the source.
    """
    H, W, _ = img.shape
    grid = normalized_grid(out_h, out_w, dtype=img.dtype)  # (oh, ow, 2)
    ones = jnp.ones((out_h, out_w, 1), img.dtype)
    g = jnp.concatenate([grid, ones], axis=-1)  # (oh, ow, 3)
    T = g @ theta.T  # (oh, ow, 3)
    x_s, y_s, t_s = T[..., 0], T[..., 1], T[..., 2]
    small = 1e-7
    t_s = t_s + 1e-6 * (1.0 - (jnp.abs(t_s) >= small).astype(img.dtype))
    x = (x_s / t_s + 1.0) * W / 2.0
    y = (y_s / t_s + 1.0) * H / 2.0

    # clamped-index-weight semantics == interior-gated bilinear: clamping
    # makes out-of-range taps coincide and their signed weights cancel to
    # exactly zero, so the single-row IMG4 lookup with weights gated on
    # floor(x) ∈ [0, W-2] reproduces the reference bit-for-bit (~12x
    # faster than four 1-pixel gathers; TPU gathers are per-row bound)
    return _bilinear_gather_2x2(img, x, y, rule="interior")


# Batched variants -----------------------------------------------------------

grid_sample_b = jax.vmap(grid_sample, in_axes=(0, 0), out_axes=0)
bilinear_sampler_b = jax.vmap(bilinear_sampler, in_axes=(0, 0), out_axes=0)


def homography_warp_b(imgs: jnp.ndarray, thetas: jnp.ndarray,
                      out_h: int, out_w: int) -> jnp.ndarray:
    return jax.vmap(lambda im, th: homography_warp(im, th, out_h, out_w))(imgs, thetas)


def interpolate_bilinear_b(imgs: jnp.ndarray, out_h: int, out_w: int,
                           align_corners: bool = True) -> jnp.ndarray:
    return jax.vmap(
        lambda im: interpolate_bilinear(im, out_h, out_w, align_corners)
    )(imgs)


def resize_image_b(imgs: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    return jax.vmap(lambda im: resize_image(im, out_h, out_w))(imgs)
