"""Thin-plate-spline solve and dense evaluation (pure JAX, MXU-friendly).

Semantics rebuilt from the reference's three interchangeable TPS backends
(reference: core/inference/tps_methods/{opencv_tps,kornia_tps,other_tps}.py;
default ``tps_method='opencv'`` at inf_configs/*.py:25). All backends share
one mathematical contract: fit a *backward* map g: canvas-target-point ->
canvas-source-point on N control pairs, evaluate g on the dense output grid,
and bilinearly sample the homography warp at g(grid).

The TPU-native formulation:

  * fixed N control points with a validity mask instead of dynamic filtering
    (invalid rows are replaced by identity rows => their kernel weight is
    exactly 0 and they drop out of the interpolation);
  * the (N+3)x(N+3) system solved with a batched LU solve in float32 on
    [0,1]-normalized coordinates (the reference normalizes the same way on
    its kornia/other paths) with a small Tikhonov term for near-duplicate
    control points (the reference relies on pinverse for this);
  * the dense evaluation is one (H*W, N) @ (N, 2) matmul -> MXU.

Kernel variants:
  * 'opencv':  U(r^2) = r^2 * log(r^2)           (cv2 TPS distance function)
  * 'kornia':  U(r^2) = 0.5 * r^2 * log(r^2+eps) (kornia _kernel_distance)
They differ only by the constant factor 2 absorbed into the solved weights,
so the *interpolant g is identical*; the option only matters when combined
with the reference's kernel_scale knob (inf_configs/*.py: kernel_scale=1.0).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.sampling import grid_sample


def _u_kernel(d2: jnp.ndarray, variant: str = "opencv",
              eps: float = 1e-9) -> jnp.ndarray:
    """Radial basis U on *squared* distances."""
    if variant == "kornia":
        return 0.5 * d2 * jnp.log(d2 + 1e-8)
    # opencv: r^2 log(r^2), with U(0) = 0
    return d2 * jnp.log(jnp.maximum(d2, eps)) * (d2 > 0)


def _sq_dist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared euclidean distances (N, 2) x (M, 2) -> (N, M)."""
    d = a[:, None, :] - b[None, :, :]
    return (d * d).sum(-1)


def tps_fit(ctrl: jnp.ndarray, target: jnp.ndarray,
            valid: Optional[jnp.ndarray] = None,
            variant: str = "opencv",
            reg: float = 1e-6) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fit TPS weights for the map g(ctrl_i) = target_i.

    ctrl/target: (N, 2) in [0, 1]-normalized coordinates; valid: (N,) bool.
    Returns (kernel_weights (N, 2), affine_weights (3, 2)) with the affine
    part ordered [bias, x, y] like the reference solvers
    (kornia_tps.py:92-99). Invalid points receive exactly zero kernel weight.
    Batch via jax.vmap.
    """
    N = ctrl.shape[0]
    dtype = ctrl.dtype
    if valid is None:
        valid = jnp.ones((N,), bool)
    v = valid.astype(dtype)

    K = _u_kernel(_sq_dist(ctrl, ctrl), variant)
    # mask invalid centers out of every row/column
    K = K * v[:, None] * v[None, :]
    # Tikhonov: keeps near-duplicate control points (the multi-pad-level
    # sampler can emit coincident points) from making L singular.
    K = K + reg * jnp.eye(N, dtype=dtype)

    P = jnp.concatenate([jnp.ones((N, 1), dtype), ctrl], axis=1) * v[:, None]

    L = jnp.zeros((N + 3, N + 3), dtype)
    L = L.at[:N, :N].set(K)
    L = L.at[:N, N:].set(P)
    L = L.at[N:, :N].set(P.T)
    # invalid rows -> identity rows (w_i = 0); their columns are already 0
    diag_fix = (1.0 - v)
    L = L.at[:N, :N].add(jnp.diag(diag_fix))

    rhs = jnp.zeros((N + 3, 2), dtype)
    rhs = rhs.at[:N].set(target * v[:, None])

    w = jnp.linalg.solve(L, rhs)
    return w[:N], w[N:]


def tps_eval_points(points: jnp.ndarray, ctrl: jnp.ndarray,
                    kernel_w: jnp.ndarray, affine_w: jnp.ndarray,
                    valid: Optional[jnp.ndarray] = None,
                    variant: str = "opencv",
                    kernel_scale: float = 1.0,
                    affine_scale: float = 1.0) -> jnp.ndarray:
    """Evaluate g at (M, 2) points: affine + U(dist(points, ctrl)) @ kernel_w.

    The (M, N) @ (N, 2) product is the hot op and runs on the MXU.
    kernel_scale/affine_scale mirror the reference knobs
    (tps_pipline.py:379-380), both 1.0 in shipped configs.
    """
    U = _u_kernel(_sq_dist(points, ctrl), variant)
    if valid is not None:
        U = U * valid.astype(points.dtype)[None, :]
    ones = jnp.ones((points.shape[0], 1), points.dtype)
    A = jnp.concatenate([ones, points], axis=1)  # (M, 3)
    return (kernel_scale * U @ kernel_w
            + affine_scale * A @ affine_w)


def tps_backward_warp(points_src: jnp.ndarray, points_dst: jnp.ndarray,
                      valid: Optional[jnp.ndarray], out_h: int, out_w: int,
                      variant: str = "opencv",
                      kernel_scale: float = 1.0, affine_scale: float = 1.0,
                      reg: float = 1e-6) -> jnp.ndarray:
    """Dense backward warp field for control pairs src->dst in *pixel* coords.

    Fits g: dst -> src (the backward map, exactly what
    cv2 estimateTransformation(target, source) + warpImage computes:
    opencv_tps.py:8-18), evaluates it at every output pixel center, and
    returns pixel source coordinates (out_h, out_w, 2).
    """
    dtype = points_src.dtype
    scale = jnp.array([out_w, out_h], dtype)
    src_n = points_src / scale
    dst_n = points_dst / scale

    kw, aw = tps_fit(dst_n, src_n, valid, variant, reg)
    if valid is not None:
        # fold validity into the weights so the fused grid kernel (which
        # has no mask input) stays exact
        kw = kw * valid.astype(dtype)[:, None]

    from ..ops.pallas.tps_kernel import tps_eval_grid
    mapped = tps_eval_grid(dst_n, kw, aw, out_h, out_w, variant,
                           kernel_scale, affine_scale)
    return mapped * scale


def tps_warp_image(img: jnp.ndarray, points_src: jnp.ndarray,
                   points_dst: jnp.ndarray,
                   valid: Optional[jnp.ndarray] = None,
                   variant: str = "opencv",
                   kernel_scale: float = 1.0, affine_scale: float = 1.0,
                   reg: float = 1e-6) -> jnp.ndarray:
    """TPS-warp (H, W, C) so that content at points_src appears at points_dst
    (the contract of warp_by_tps, tps_pipline.py:339-426: image + mask
    channels are warped together by the backward map). Out-of-source samples
    are zero (cv2.warpImage zero-border parity). Batch via jax.vmap.
    """
    H, W, _ = img.shape
    coords = tps_backward_warp(points_src, points_dst, valid, H, W,
                               variant, kernel_scale, affine_scale, reg)
    gx = 2.0 * coords[..., 0] / (W - 1) - 1.0
    gy = 2.0 * coords[..., 1] / (H - 1) - 1.0
    return grid_sample(img, jnp.stack([gx, gy], -1), align_corners=True,
                       padding_mode="zeros")
