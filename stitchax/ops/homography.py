"""Batched 4-point DLT and normalized-space homography helpers.

Reference semantics: core/udis_utils/torch_DLT.py:17-45 (the 8x8 linear
system) and the M/M^-1 conjugation that moves a pixel-space homography into
the normalized [-1,1] space the spatial transformer consumes
(reference: core/flowHomoAdpater.py:98-113).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dlt_solve(src_p: jnp.ndarray, dst_p: jnp.ndarray,
              normalize: bool = True) -> jnp.ndarray:
    """Solve the 4-point DLT: src/dst (B, 4, 2) -> H (B, 3, 3) with H[2,2]=1.

    Builds the standard 8x8 system
        [x y 1 0 0 0 -x*x' -y*x'] h = x'
        [0 0 0 x y 1 -x*y' -y*y'] h = y'
    and solves with a batched linear solve. With ``normalize=True`` (default)
    the points are Hartley-normalized first (centroid 0, RMS distance √2),
    which keeps the solve well-conditioned in float32 — the resulting H is
    mathematically identical to the reference's raw torch.inverse solve
    (core/udis_utils/torch_DLT.py:17-45) but far more accurate on TPU.
    """
    if normalize:
        def norm_T(p):
            c = p.mean(axis=1, keepdims=True)  # (B, 1, 2)
            d = jnp.sqrt(((p - c) ** 2).sum(-1)).mean(axis=1)  # (B,)
            s = jnp.sqrt(2.0) / jnp.maximum(d, 1e-8)
            return c[:, 0], s

        c_s, s_s = norm_T(src_p)
        c_d, s_d = norm_T(dst_p)
        src_n = (src_p - c_s[:, None]) * s_s[:, None, None]
        dst_n = (dst_p - c_d[:, None]) * s_d[:, None, None]
        Hn = dlt_solve(src_n, dst_n, normalize=False)
        B = src_p.shape[0]
        zeros = jnp.zeros((B,), src_p.dtype)
        ones = jnp.ones((B,), src_p.dtype)
        # T: pixel -> normalized; H = T_dst^-1 @ Hn @ T_src
        T_src = jnp.stack([
            jnp.stack([s_s, zeros, -s_s * c_s[:, 0]], -1),
            jnp.stack([zeros, s_s, -s_s * c_s[:, 1]], -1),
            jnp.stack([zeros, zeros, ones], -1)], axis=1)
        T_dst_inv = jnp.stack([
            jnp.stack([1.0 / s_d, zeros, c_d[:, 0]], -1),
            jnp.stack([zeros, 1.0 / s_d, c_d[:, 1]], -1),
            jnp.stack([zeros, zeros, ones], -1)], axis=1)
        H = T_dst_inv @ Hn @ T_src
        return H / H[:, 2:3, 2:3]

    B = src_p.shape[0]
    x, y = src_p[..., 0], src_p[..., 1]  # (B, 4)
    xp, yp = dst_p[..., 0], dst_p[..., 1]
    ones = jnp.ones_like(x)
    zeros = jnp.zeros_like(x)

    row_x = jnp.stack([x, y, ones, zeros, zeros, zeros, -x * xp, -y * xp], axis=-1)
    row_y = jnp.stack([zeros, zeros, zeros, x, y, ones, -x * yp, -y * yp], axis=-1)
    # interleave rows: (x_0, y_0, x_1, y_1, ...) matching the reference layout
    A = jnp.stack([row_x, row_y], axis=2).reshape(B, 8, 8)
    b = jnp.stack([xp, yp], axis=2).reshape(B, 8, 1)

    h8 = jnp.linalg.solve(A, b).reshape(B, 8)
    H = jnp.concatenate([h8, jnp.ones((B, 1), h8.dtype)], axis=1).reshape(B, 3, 3)
    return H


def scale_matrix(h: float, w: float, dtype=jnp.float32) -> jnp.ndarray:
    """M mapping normalized [-1,1] coords to pixel coords of an (h, w) image.

    Reference: core/flowHomoAdpater.py:98-101.
    """
    return jnp.array(
        [[w / 2.0, 0.0, w / 2.0], [0.0, h / 2.0, h / 2.0], [0.0, 0.0, 1.0]],
        dtype=dtype,
    )


def to_normalized_homography(H: jnp.ndarray, src_hw, dst_hw) -> jnp.ndarray:
    """Conjugate a pixel-space homography into normalized space:
    theta = M_src^-1 @ H @ M_dst, where the warp samples source pixels at
    H(dst_pixel). Reference: core/flowHomoAdpater.py:105-111."""
    M_src_inv = jnp.linalg.inv(scale_matrix(*src_hw, dtype=H.dtype))
    M_dst = scale_matrix(*dst_hw, dtype=H.dtype)
    return M_src_inv @ H @ M_dst


def four_point_homography(offsets: jnp.ndarray, h: float, w: float) -> jnp.ndarray:
    """Corner offsets (B, 4, 2) -> pixel homography (B, 3, 3).

    Corner order matches the reference: (0,0), (w,0), (0,h), (w,h)
    (reference: core/flowHomoAdpater.py:91-96).
    """
    B = offsets.shape[0]
    src = jnp.array([[0.0, 0.0], [w, 0.0], [0.0, h], [w, h]], offsets.dtype)
    src = jnp.broadcast_to(src[None], (B, 4, 2))
    dst = src + offsets
    return dlt_solve(src, dst)


dlt_solve_b = dlt_solve  # already batched
