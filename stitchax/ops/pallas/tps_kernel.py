"""Fused TPS dense-evaluation Pallas kernel.

The breaking stage evaluates g(p) = affine(p) + Σ_k w_k U(||p - c_k||²) at
every output pixel (stitchax/tps/solve.py). A naive XLA lowering
materializes the (H·W, N) radial-basis matrix in HBM (~0.5 GB at canvas
resolutions); this kernel streams pixel tiles through VMEM, computes U on
the VPU, and contracts against the kernel weights on the fly —
HBM traffic drops from O(H·W·N) to O(H·W).

Grid: 1-D over pixel tiles of TILE=1024 (8 sublanes x 128 lanes). Control
points are padded to a lane multiple; invalid/padded centers carry zero
kernel weight so they drop out exactly (matching the masked solve).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024  # pixels per program: (8, 128) fp32 tile


def _kernel(ctrl_ref, kw_ref, aw_ref, out_ref, *, out_h: int, out_w: int,
            variant: str, kernel_scale: float, affine_scale: float):
    i = pl.program_id(0)
    idx = (i * TILE + jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)[:, 0])
    px = (idx % out_w).astype(jnp.float32) / out_w   # [0,1] normalized
    py = (idx // out_w).astype(jnp.float32) / out_h

    cx = ctrl_ref[:, 0]          # (N,)
    cy = ctrl_ref[:, 1]
    dx = px[:, None] - cx[None, :]        # (TILE, N)
    dy = py[:, None] - cy[None, :]
    d2 = dx * dx + dy * dy
    if variant == "kornia":
        u = 0.5 * d2 * jnp.log(d2 + 1e-8)
    else:
        u = d2 * jnp.log(jnp.maximum(d2, 1e-9)) * (d2 > 0)

    mapped = kernel_scale * jnp.dot(u, kw_ref[:, :],
                                    preferred_element_type=jnp.float32)
    ones = jnp.ones((TILE, 1), jnp.float32)
    a = jnp.concatenate([ones, px[:, None], py[:, None]], axis=1)  # (TILE, 3)
    mapped = mapped + affine_scale * jnp.dot(
        a, aw_ref[:, :], preferred_element_type=jnp.float32)
    out_ref[:, :] = mapped


def tps_eval_grid_pallas(ctrl: jnp.ndarray, kernel_w: jnp.ndarray,
                         affine_w: jnp.ndarray, out_h: int, out_w: int,
                         variant: str = "opencv",
                         kernel_scale: float = 1.0,
                         affine_scale: float = 1.0,
                         interpret: bool = False) -> jnp.ndarray:
    """ctrl (N, 2) in [0,1], kernel_w (N, 2), affine_w (3, 2) ->
    (out_h, out_w, 2) mapped normalized coords."""
    N = ctrl.shape[0]
    n_pad = -N % 128
    if n_pad:
        ctrl = jnp.pad(ctrl, ((0, n_pad), (0, 0)))
        kernel_w = jnp.pad(kernel_w, ((0, n_pad), (0, 0)))  # zero w => no-op

    total = out_h * out_w
    n_tiles = pl.cdiv(total, TILE)
    kernel = functools.partial(_kernel, out_h=out_h, out_w=out_w,
                               variant=variant, kernel_scale=kernel_scale,
                               affine_scale=affine_scale)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((ctrl.shape[0], 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kernel_w.shape[0], 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, 2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * TILE, 2), jnp.float32),
        interpret=interpret,
    )(ctrl.astype(jnp.float32), kernel_w.astype(jnp.float32),
      affine_w.astype(jnp.float32))
    return out[:total].reshape(out_h, out_w, 2)


def tps_eval_grid_ref(ctrl: jnp.ndarray, kernel_w: jnp.ndarray,
                      affine_w: jnp.ndarray, out_h: int, out_w: int,
                      variant: str = "opencv", kernel_scale: float = 1.0,
                      affine_scale: float = 1.0) -> jnp.ndarray:
    """Pure-XLA reference (materializes U)."""
    from ...tps.solve import tps_eval_points
    ys, xs = jnp.meshgrid(jnp.arange(out_h, dtype=jnp.float32),
                          jnp.arange(out_w, dtype=jnp.float32), indexing="ij")
    grid = jnp.stack([xs / out_w, ys / out_h], -1).reshape(-1, 2)
    m = tps_eval_points(grid, ctrl, kernel_w, affine_w, None, variant,
                        kernel_scale, affine_scale)
    return m.reshape(out_h, out_w, 2)


def tps_eval_grid(ctrl, kernel_w, affine_w, out_h, out_w,
                  variant="opencv", kernel_scale=1.0, affine_scale=1.0):
    """Dispatch: Pallas on TPU, XLA elsewhere."""
    if jax.default_backend() == "tpu":
        return tps_eval_grid_pallas(ctrl, kernel_w, affine_w, out_h, out_w,
                                    variant, kernel_scale, affine_scale)
    return tps_eval_grid_ref(ctrl, kernel_w, affine_w, out_h, out_w,
                             variant, kernel_scale, affine_scale)
