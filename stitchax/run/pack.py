"""Device-side uint8 canvas packing + host-side unpacking.

The per-pair bottleneck of the full stitch is the device->host link
(~13 MB/s relay, tools/exp_fetch.py), so every canvas-resolution output
rides ONE uint8 buffer per pair. Round 5 adds YUV 4:2:0 packing for the
3-channel images (VERDICT r4 #6): every image output is materialized as
a JPEG (reference out.py:266-308; PIL writes baseline JPEG with 4:2:0
chroma subsampling), so the chroma of flow_warp/warp2/composition is
about to be 2x2-subsampled by the encoder anyway — doing it on the
device first moves that loss ahead of the link and cuts each image from
3 channels to 1.5.

Layout of a packed buffer (H, W, C) uint8 for n images + m masks:
  channels [0, n)            Y planes, one per image (BT.601 full range)
  channels [n, n + ceil(n/2)) chroma: per image a (H/2, W) plane holding
                             [Cb | Cr] side by side; two images' planes
                             stack vertically into one full channel
  channels [.., .. + m)      masks, clip(m, 0, 1) * 255

Error bound: Y quantization ±0.5; chroma = 2x2 box mean + uint8
quantization, reconstructed by nearest upsample — identical in kind to
the JPEG encoder's own 4:2:0 loss and below it in magnitude (the
encoder also quantizes DCT coefficients). Pinned by
tests/test_pack_yuv.py on the bundled demo images. STITCHAX_PACK=rgb
restores the exact 3-channel pack.
"""

from __future__ import annotations

import os
from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def pack_mode() -> str:
    """'yuv420' (default) or 'rgb' (exact, 2x the image bytes)."""
    return os.environ.get("STITCHAX_PACK", "yuv420")


# ------------------------------ device side ---------------------------------


def pack_canvas_uint8(imgs: Sequence[jnp.ndarray],
                      masks: Sequence[jnp.ndarray],
                      mode: str) -> jnp.ndarray:
    """imgs: (H, W, 3) in [0, 255]; masks: (H, W, 1) in [0, 1] -> one
    (H, W, C) uint8 buffer. Traced inside the stitcher's pack jit."""
    if mode == "rgb" or not imgs:
        parts = [jnp.clip(i, 0, 255) for i in imgs]
        parts += [jnp.clip(m, 0, 1) * 255.0 for m in masks]
        return jnp.rint(jnp.concatenate(parts, -1)).astype(jnp.uint8)

    H, W, _ = imgs[0].shape
    assert H % 2 == 0 and W % 2 == 0, "bucketed canvases are 64-multiples"
    ys, chroma_halves = [], []
    for img in imgs:
        img = jnp.clip(img, 0, 255)
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 + (b - y) * 0.564
        cr = 128.0 + (r - y) * 0.713
        ys.append(y[..., None])
        sub = lambda c: c.reshape(H // 2, 2, W // 2, 2).mean((1, 3))
        chroma_halves.append(
            jnp.concatenate([sub(cb), sub(cr)], axis=1))  # (H/2, W)
    parts = list(ys)
    for i in range(0, len(chroma_halves), 2):
        top = chroma_halves[i]
        bot = (chroma_halves[i + 1] if i + 1 < len(chroma_halves)
               else jnp.full_like(top, 128.0))
        parts.append(jnp.concatenate([top, bot], axis=0)[..., None])
    parts += [jnp.clip(m, 0, 1) * 255.0 for m in masks]
    return jnp.rint(jnp.clip(jnp.concatenate(parts, -1), 0, 255)
                    ).astype(jnp.uint8)


def packed_channels(n_img: int, n_mask: int, mode: str) -> int:
    if mode == "rgb":
        return 3 * n_img + n_mask
    return n_img + (n_img + 1) // 2 + n_mask


# ------------------------------- host side ----------------------------------


def unpack_canvas_uint8(packed: np.ndarray, n_img: int, n_mask: int,
                        mode: str, true_h: int, true_w: int
                        ) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """Inverse of pack_canvas_uint8 on the host. `packed` is the FULL
    bucketed (H, W, C) uint8 buffer (the chroma layout spans the whole
    canvas, so cropping happens after decode). Returns float32 images
    [0, 255] and masks [0, 1] cropped to (true_h, true_w)."""
    H, W, _ = packed.shape
    p = packed.astype(np.float32)
    imgs, masks = [], []
    if mode == "rgb":
        for i in range(n_img):
            imgs.append(p[:true_h, :true_w, 3 * i:3 * i + 3])
        off = 3 * n_img
    else:
        off = n_img + (n_img + 1) // 2
        for i in range(n_img):
            y = p[..., i]
            ch = p[..., n_img + i // 2]
            half = ch[: H // 2] if i % 2 == 0 else ch[H // 2:]
            cb = half[:, : W // 2]
            cr = half[:, W // 2:]
            up = lambda c: c.repeat(2, axis=0).repeat(2, axis=1)
            cb, cr = up(cb) - 128.0, up(cr) - 128.0
            r = y + 1.402 * cr
            b = y + 1.772 * cb
            g = (y - 0.299 * r - 0.114 * b) / 0.587
            rgb = np.clip(np.stack([r, g, b], -1), 0, 255)
            imgs.append(rgb[:true_h, :true_w])
    for j in range(n_mask):
        masks.append(p[:true_h, :true_w, off + j:off + j + 1] / 255.0)
    return imgs, masks
