"""Border control-point sampling for the breaking pipeline.

Rebuilt from the reference's gradient-guided uniform border sampler
(reference: core/inference/sample_point_methods.py:5-128) and point-pair
utilities (reference: core/inference/utils.py:61-122). TPU-native shape
discipline: the segment layout is computed from *static* image dims at trace
time, so every call returns a fixed-N point array plus a validity mask —
no data-dependent filtering.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.filters import SOBEL_X, SOBEL_Y


def gradient_magnitude_l1(image: jnp.ndarray) -> jnp.ndarray:
    """|sobel_x| + |sobel_y|, channel-meaned: (H, W, C) -> (H, W).

    Matches the reference's gradient map (sample_point_methods.py:70-87):
    per-channel zero-padded Sobel convs, |.| then channel mean, summed.
    """
    H, W, C = image.shape
    x = image.transpose(2, 0, 1)[..., None]  # (C, H, W, 1)
    kx = SOBEL_X.astype(image.dtype)[:, :, None, None]
    ky = SOBEL_Y.astype(image.dtype)[:, :, None, None]
    conv = lambda im, k: jax.lax.conv_general_dilated(
        im, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    gx = jnp.abs(conv(x, kx)).mean(0)[..., 0]
    gy = jnp.abs(conv(x, ky)).mean(0)[..., 0]
    return gx + gy


def border_segments(H: int, W: int, step: int, pad: int
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Static border layout: uniform anchor points and consecutive segments.

    Reproduces the reference's four loops (sample_point_methods.py:38-66):
    anchors at range(pad, dim - pad, step) along each border inset by `pad`,
    segments between consecutive anchors on the same border. Returns
    (anchors (A, 2) int array xy, segments (S, 4) [x1, y1, x2, y2]).
    Pure numpy — runs at trace time.
    """
    anchors: List[Tuple[int, int]] = []
    segments: List[Tuple[int, int, int, int]] = []

    def run(coords: Sequence[int], fixed: int, horizontal: bool):
        prev = None
        for i in coords:
            pt = (i, fixed) if horizontal else (fixed, i)
            anchors.append(pt)
            if prev is not None:
                a = (prev, fixed) if horizontal else (fixed, prev)
                segments.append((a[0], a[1], pt[0], pt[1]))
            prev = i

    xs = list(range(pad, W - pad, step))
    ys = list(range(pad, H - pad, step))
    run(xs, pad, True)            # top
    run(xs, H - 1 - pad, True)    # bottom
    run(ys, pad, False)           # left
    run(ys, W - 1 - pad, False)   # right
    return (np.unique(np.array(anchors, np.int64), axis=0)
            if anchors else np.zeros((0, 2), np.int64),
            np.array(segments, np.int64).reshape(-1, 4))


def sample_border_points(grad: jnp.ndarray, step: int, pad: int
                         ) -> jnp.ndarray:
    """Max-gradient point per border segment: (H, W) grad -> (S, 2) xy.

    For each segment the reference opens a window [y1-2:y2+2, x1-2:x2+2] on
    the gradient map and takes the argmax (sample_point_methods.py:92-109);
    windows are clamped to the image here (the reference's raw python slices
    silently produce empty/wrapped windows when pad < 2 — never hit by the
    shipped pad_num=4 configs).
    """
    H, W = grad.shape
    _, segs = border_segments(H, W, step, pad)
    pts = []
    for x1, y1, x2, y2 in segs:
        ya, yb = max(int(y1) - 2, 0), min(int(y2) + 2, H)
        xa, xb = max(int(x1) - 2, 0), min(int(x2) + 2, W)
        win = jax.lax.dynamic_slice(grad, (ya, xa), (yb - ya, xb - xa))
        idx = jnp.argmax(win.reshape(-1))
        wy, wx = idx // (xb - xa), idx % (xb - xa)
        pts.append(jnp.stack([wx + xa, wy + ya]))
    if not pts:
        return jnp.zeros((0, 2), jnp.int32)
    return jnp.stack(pts).astype(jnp.int32)


def multi_level_pads(H: int, W: int, step: int, base_pad: int) -> List[int]:
    """Pad schedule of the 'advanced_uniform_multi' method: base pad, then
    step, 2*step, 4*step, ... while <= max(H, W)//4
    (reference: tps_pipline.py:294-311)."""
    pads = [base_pad]
    p = step
    while p <= max(H, W) // 4:
        pads.append(p)
        p *= 2
    return pads


def multi_level_border_points(image: jnp.ndarray, grid_h: int, grid_w: int,
                              base_pad: int) -> jnp.ndarray:
    """All border points across pad levels: (H, W, C) image -> (N, 2) xy.

    N is static for given (H, W, grid, pad). The reference's per-level
    torch.unique dedup is dropped — duplicate control points are harmless to
    the regularized solve (solve.py) and dedup would break static shapes.
    """
    H, W, _ = image.shape
    step = max(H, W) // min(grid_h, grid_w)
    grad = gradient_magnitude_l1(image)
    levels = [sample_border_points(grad, step, p)
              for p in multi_level_pads(H, W, step, base_pad)]
    levels = [l for l in levels if l.shape[0] > 0]
    if not levels:
        return jnp.zeros((0, 2), jnp.int32)
    return jnp.concatenate(levels, axis=0)


def point_pairs(points: jnp.ndarray, flow: jnp.ndarray,
                flow_limit: float = -1.0
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Source/target pairs from flow lookups + flow-limit validity.

    points (N, 2) int xy; flow (H, W, 2). target = src + flow[src]; a pair is
    valid when |flow| < limit componentwise; limit -1 means
    ((H + W)//2)//8, the auto rule at reference utils.py:70-73. The
    reference drops invalid pairs; we keep fixed N + mask.
    Returns (src (N, 2) float, tgt (N, 2) float, valid (N,) bool).
    """
    H, W, _ = flow.shape
    if flow_limit == -1:
        flow_limit = ((H + W) // 2) // 8
    x = jnp.clip(points[:, 0], 0, W - 1)
    y = jnp.clip(points[:, 1], 0, H - 1)
    f = flow[y, x]  # (N, 2)
    valid = (jnp.abs(f[:, 0]) < flow_limit) & (jnp.abs(f[:, 1]) < flow_limit)
    src = points.astype(flow.dtype)
    return src, src + f, valid


def shift_points(points: jnp.ndarray, width_min: jnp.ndarray,
                 height_min: jnp.ndarray) -> jnp.ndarray:
    """Shift image-frame points into canvas coordinates by the canvas origin
    (reference: utils.py:92-101 adds (|width_min|, |height_min|))."""
    return points + jnp.stack([jnp.abs(width_min), jnp.abs(height_min)])


def boundary_validity(points_src: jnp.ndarray, points_dst: jnp.ndarray,
                      out_h: int, out_w: int) -> jnp.ndarray:
    """Both endpoints inside the canvas (reference: utils.py:103-121)."""
    def inside(p):
        return ((p[:, 0] >= 0) & (p[:, 0] < out_w)
                & (p[:, 1] >= 0) & (p[:, 1] < out_h))
    return inside(points_src) & inside(points_dst)


def mask_lookup_validity(points: jnp.ndarray, mask: jnp.ndarray
                         ) -> jnp.ndarray:
    """Keep points where mask[y, x] == 1 (the border_points_mask /
    occlusion filter, reference: tps_pipline.py:109-126). mask (H, W)."""
    H, W = mask.shape
    x = jnp.clip(points[:, 0].astype(jnp.int32), 0, W - 1)
    y = jnp.clip(points[:, 1].astype(jnp.int32), 0, H - 1)
    return mask[y, x] == 1
