"""Experiment: bilinear warp gather as ONE flattened row-take per pixel.

Hypothesis: a (2,2,C)-slice gather costs ~2 fetched rows per index; packing
the four taps of every pixel into one row of a precomputed 4-tap image
IMG4 (H*W, 4C) turns the warp into a single embedding-style row lookup per
pixel — the gather pattern XLA TPU actually optimizes.

Usage: python tools/exp_warp_take.py
"""

import sys
import time

sys.path.insert(0, ".")
from stitchax.utils.platform import setup_cli_jax  # noqa: E402

setup_cli_jax()

import jax                       # noqa: E402
import jax.numpy as jnp          # noqa: E402
import numpy as np               # noqa: E402

from stitchax.ops.sampling import _axis_weights, _bilinear_gather_2x2  # noqa: E402


def bilinear_take4(img, x, y, rule="zeros"):
    """IMG4 single-row-take formulation (same weights as the slice gather)."""
    H, W, C = img.shape
    shape = x.shape
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    sx, wx0, wx1 = _axis_weights(x0f, x - x0f, W, rule)
    sy, wy0, wy1 = _axis_weights(y0f, y - y0f, H, rule)

    p = jnp.pad(img, ((0, 1), (0, 1), (0, 0)))
    img4 = jnp.concatenate(
        [p[:H, :W], p[:H, 1:W + 1], p[1:H + 1, :W], p[1:H + 1, 1:W + 1]],
        axis=-1).reshape(H * W, 4 * C)
    idx = (sy * W + sx).reshape(-1)
    blk = jnp.take(img4, idx, axis=0).reshape(-1, 2, 2, C)
    wy = jnp.stack([wy0.reshape(-1), wy1.reshape(-1)], -1)
    wx = jnp.stack([wx0.reshape(-1), wx1.reshape(-1)], -1)
    out = jnp.einsum("pyxc,py,px->pc", blk, wy.astype(img.dtype),
                     wx.astype(img.dtype))
    return out.reshape(shape + (C,))


def timed(name, fn, *args, iters=20):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).sum())
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt * 1000:9.2f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    B, S, C = 4, 512, 3
    img = jnp.asarray(rng.uniform(0, 255, (B, S, S, C)), jnp.float32)
    # coords spanning in/out of bounds like a real warp
    cx = jnp.asarray(rng.uniform(-20, S + 20, (B, S, S)), jnp.float32)
    cy = jnp.asarray(rng.uniform(-20, S + 20, (B, S, S)), jnp.float32)

    cur = jax.jit(jax.vmap(_bilinear_gather_2x2))
    new = jax.jit(jax.vmap(bilinear_take4))
    a = timed("slice-gather 2x2 (current)", cur, img, cx, cy)
    b = timed("IMG4 row-take (experiment)", new, img, cx, cy)
    err = float(jnp.abs(a - b).max())
    print(f"max abs err: {err:.3e}")


if __name__ == "__main__":
    main()
