"""Coordinate grids and homography meshes (NHWC / xy-last conventions).

Semantics mirror the reference primitives (reference: core/warp_utils.py:10-34,
core/utils/utils.py:97-100) but are pure jnp functions with static shapes.
"""

from __future__ import annotations

import jax.numpy as jnp


def coords_grid(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """Pixel-center coordinate grid, shape (H, W, 2), last axis = (x, y)."""
    ys = jnp.arange(h, dtype=dtype)
    xs = jnp.arange(w, dtype=dtype)
    gx, gy = jnp.meshgrid(xs, ys)  # (H, W) each
    return jnp.stack([gx, gy], axis=-1)


def normalized_grid(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """Grid of normalized coords in [-1, 1], shape (H, W, 2), xy-last.

    Matches torch linspace(-1, 1, n) endpoints (reference:
    core/udis_utils/torch_homo_transform.py:94-112).
    """
    xs = jnp.linspace(-1.0, 1.0, w, dtype=dtype)
    ys = jnp.linspace(-1.0, 1.0, h, dtype=dtype)
    gx, gy = jnp.meshgrid(xs, ys)
    return jnp.stack([gx, gy], axis=-1)


def get_rigid_mesh(h: int, w: int, grid_h: int = 511, grid_w: int = 511,
                   dtype=jnp.float32) -> jnp.ndarray:
    """Regular (grid_h+1, grid_w+1, 2) mesh spanning [0,W]x[0,H] inclusive.

    Reference: core/warp_utils.py:10-18 (unbatched; vmap for batches).
    """
    xs = jnp.linspace(0.0, float(w), grid_w + 1, dtype=dtype)
    ys = jnp.linspace(0.0, float(h), grid_h + 1, dtype=dtype)
    gx, gy = jnp.meshgrid(xs, ys)
    return jnp.stack([gx, gy], axis=-1)


def apply_homography_to_points(H: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Project (..., 2) points through a 3x3 homography, with perspective divide."""
    ones = jnp.ones(pts.shape[:-1] + (1,), pts.dtype)
    p = jnp.concatenate([pts, ones], axis=-1)
    q = p @ H.T
    return q[..., :2] / q[..., 2:3]


def h2mesh(H: jnp.ndarray, rigid_mesh: jnp.ndarray) -> jnp.ndarray:
    """Map a rigid mesh through H^-1 (target mesh of the homography warp).

    Reference: core/warp_utils.py:20-34. `H` is (3, 3); `rigid_mesh` is
    (..., 2). Returns the projected mesh with perspective divide.
    """
    H_inv = jnp.linalg.inv(H)
    return apply_homography_to_points(H_inv, rigid_mesh)
