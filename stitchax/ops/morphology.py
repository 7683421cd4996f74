"""Binary morphology on masks via reduce_window (TPU-friendly min/max pools).

The reference implements erosion/dilation as all-ones conv + threshold
(reference: core/flowHomoAdpater.py:18-35) and cv2.erode/dilate
(reference: core/inference/tps_pipline.py:141-147). With a rectangular
all-ones structuring element those are exactly min/max pooling, which XLA
lowers to fast reduce_window ops — no conv needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pool(mask: jnp.ndarray, k, op) -> jnp.ndarray:
    """mask: (..., H, W, C); k: (kh, kw); SAME padding with op identity.

    Rectangular structuring elements are separable: two 1-D reduce_windows
    (kh x 1 then 1 x kw) compute the same min/max as one kh x kw window in
    O(kh + kw) per pixel instead of O(kh * kw) — measured ~10x faster for
    the 19x19 occlusion open on v5e."""
    kh, kw = k
    init = jnp.array(-jnp.inf if op is jax.lax.max else jnp.inf, mask.dtype)
    ndim = mask.ndim

    def pool_axis(x, axis, ksize):
        window = [1] * ndim
        window[axis] = ksize
        pads = [(0, 0)] * ndim
        pads[axis] = ((ksize - 1) // 2, ksize // 2)
        return jax.lax.reduce_window(x, init, op, window, [1] * ndim, pads)

    out = mask
    if kh > 1:
        out = pool_axis(out, ndim - 3, kh)
    if kw > 1:
        out = pool_axis(out, ndim - 2, kw)
    return out


def dilate(mask: jnp.ndarray, kernel_size=(3, 3)) -> jnp.ndarray:
    return _pool(mask, kernel_size, jax.lax.max)


def erode(mask: jnp.ndarray, kernel_size=(3, 3)) -> jnp.ndarray:
    return _pool(mask, kernel_size, jax.lax.min)


def morph_open(mask: jnp.ndarray, kernel_size=(3, 3)) -> jnp.ndarray:
    """Erosion followed by dilation."""
    return dilate(erode(mask, kernel_size), kernel_size)


def morph_close(mask: jnp.ndarray, kernel_size=(3, 3)) -> jnp.ndarray:
    return erode(dilate(mask, kernel_size), kernel_size)


def preprocess_occlusion_mask(occ: jnp.ndarray, kernel_size=(19, 19)) -> jnp.ndarray:
    """Binarize at 0.5 then morphological open with a 19x19 box, matching the
    reference's conv-based implementation exactly, including its SAME-padding
    edge behaviour: the conv erosion requires the *full* kernel count even at
    borders, so border pixels always erode to 0
    (reference: core/flowHomoAdpater.py:18-35)."""
    m = (occ >= 0.5).astype(occ.dtype)
    kh, kw = kernel_size
    # conv-with-zero-padding erosion: border never reaches kh*kw -> emulate by
    # zero-padding before min-pool (jnp pad with 0, not +inf)
    ndim = m.ndim
    pads = [(0, 0)] * ndim
    pads[-3] = ((kh - 1) // 2, kh // 2)
    pads[-2] = ((kw - 1) // 2, kw // 2)
    padded = jnp.pad(m, pads)  # zero pad: borders always erode (conv parity)
    eroded = _pool_valid_min(padded, (kh, kw))
    dilated = dilate(eroded, kernel_size)
    return (dilated >= 0.5).astype(occ.dtype)


def _pool_valid_min(padded: jnp.ndarray, k) -> jnp.ndarray:
    """Separable VALID-window min over the last-3/-2 axes."""
    kh, kw = k
    ndim = padded.ndim
    init = jnp.array(jnp.inf, padded.dtype)

    def pool_axis(x, axis, ksize):
        window = [1] * ndim
        window[axis] = ksize
        return jax.lax.reduce_window(x, init, jax.lax.min, window,
                                     [1] * ndim, [(0, 0)] * ndim)

    out = pool_axis(padded, ndim - 3, kh)
    return pool_axis(out, ndim - 2, kw)


def avg_pool_same(x: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Average pool stride 1, SAME padding with zero-padded borders, matching
    torch F.avg_pool2d(count_include_pad=True) used to smooth flow before TPS
    sampling (reference: core/inference/tps_pipline.py:213-244)."""
    k = (kernel_size, kernel_size)
    summed = _sum_pool(x, k)
    return summed / (kernel_size * kernel_size)


def _sum_pool(x: jnp.ndarray, k) -> jnp.ndarray:
    kh, kw = k
    ndim = x.ndim
    window = [1] * ndim
    window[-3], window[-2] = kh, kw
    pads = [(0, 0)] * ndim
    pads[-3] = ((kh - 1) // 2, kh // 2)
    pads[-2] = ((kw - 1) // 2, kw // 2)
    return jax.lax.reduce_window(x, jnp.array(0, x.dtype), jax.lax.add,
                                 window, [1] * ndim, pads)


def _even_pool(x: jnp.ndarray, k: int, op, init) -> jnp.ndarray:
    """Even-kernel pool matching torch conv2d(padding=k//2) + crop-to-input:
    window at output i covers rows [i - k//2, i + k//2 - 1]. Borders are
    zero-PADDED explicitly (like the reference's zero-padded conv), then the
    reduction runs with its true identity `init` — passing 0.0 as the
    reduce_window init for a min pool would zero the whole result."""
    ndim = x.ndim
    pads = [(0, 0)] * ndim
    pads[-3] = (k // 2, k - 1 - k // 2)
    pads[-2] = (k // 2, k - 1 - k // 2)
    padded = jnp.pad(x, pads)
    window = [1] * ndim
    window[-3], window[-2] = k, k
    return jax.lax.reduce_window(padded, jnp.array(init, x.dtype), op,
                                 window, [1] * ndim, [(0, 0)] * ndim)


def dilate_thin_area(mask: jnp.ndarray, dilation_kernel_size: int = 8,
                     thickening_kernel_size: int = 8) -> jnp.ndarray:
    """Split a hole mask into thick/thin parts and dilate only the thin part,
    so skinny hole slivers stay inpaintable after downstream resizing
    (reference: core/inference/utils.py:124-160). mask: (..., H, W, C); uses
    channel 0, result broadcast back to C channels.

    The reference's conv-erosion requires the full k*k count, so zero-padded
    borders always erode; the zero pad inside _even_pool emulates that.
    """
    m = mask[..., 0:1]
    k = dilation_kernel_size
    eroded = _even_pool(m, k, jax.lax.min, jnp.inf)  # zero pad => border erodes
    opened = (_even_pool((eroded == 1.0).astype(m.dtype), k, jax.lax.max,
                         -jnp.inf) >= 1.0).astype(m.dtype)
    thick = jnp.clip(m * opened, 0, 1)
    thin = m * (1.0 - thick)
    t = thickening_kernel_size
    thin_d = (_even_pool(thin, t, jax.lax.max, -jnp.inf) >= 1.0).astype(m.dtype)
    out = jnp.clip(thick + thin_d, 0, 1)
    return jnp.broadcast_to(out, mask.shape)


def dilate_binary(mask: jnp.ndarray, kernel_size: int = 3,
                  iterations: int = 1) -> jnp.ndarray:
    """cv2.dilate parity on a binary mask (odd all-ones kernel, repeated)
    (reference: core/inference/utils.py:163-172)."""
    out = mask
    for _ in range(iterations):
        out = dilate(out, (kernel_size, kernel_size))
    return out
