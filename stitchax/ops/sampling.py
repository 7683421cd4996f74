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
        if padding_mode == "zeros":
            inb = ((xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1))
            wgt = wgt * inb.astype(img.dtype)
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

    x0 = jnp.floor(x).astype(jnp.int32)
    x1 = x0 + 1
    y0 = jnp.floor(y).astype(jnp.int32)
    y1 = y0 + 1
    x0 = jnp.clip(x0, 0, W - 1)
    x1 = jnp.clip(x1, 0, W - 1)
    y0 = jnp.clip(y0, 0, H - 1)
    y1 = jnp.clip(y1, 0, H - 1)

    x0f = x0.astype(img.dtype)
    x1f = x1.astype(img.dtype)
    y0f = y0.astype(img.dtype)
    y1f = y1.astype(img.dtype)

    Ia = _gather_2d(img, x0, y0)
    Ib = _gather_2d(img, x0, y1)
    Ic = _gather_2d(img, x1, y0)
    Id = _gather_2d(img, x1, y1)

    wa = ((x1f - x) * (y1f - y))[..., None]
    wb = ((x1f - x) * (y - y0f))[..., None]
    wc = ((x - x0f) * (y1f - y))[..., None]
    wd = ((x - x0f) * (y - y0f))[..., None]
    return wa * Ia + wb * Ib + wc * Ic + wd * Id


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
