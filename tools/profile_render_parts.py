"""Synced micro-profile of the render/TPS-stage sub-ops at canvas res
(run on the TPU). Finds where the ~560 ms/stage goes.

Usage: PYTHONPATH=. python tools/profile_render_parts.py
"""

import sys
import time

sys.path.insert(0, ".")
from stitchax.utils.platform import setup_cli_jax  # noqa: E402

setup_cli_jax()

import jax                       # noqa: E402
import jax.numpy as jnp          # noqa: E402
import numpy as np               # noqa: E402


def timed(name, fn, *args, iters=10):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).sum())
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt * 1000:9.2f} ms", flush=True)
    return dt


def main():
    from stitchax import ops
    from stitchax.align.adapter import AlignConfig
    from stitchax.compose.inpainters import push_pull_inpaint
    from stitchax.ops import morphology
    from stitchax.tps.solve import tps_fit
    from stitchax.ops.pallas.tps_kernel import tps_eval_grid

    rng = np.random.default_rng(0)
    S = 512
    cfg = AlignConfig()

    img6 = jnp.asarray(rng.uniform(0, 255, (1, 384, 448, 6)), jnp.float32)
    theta = jnp.asarray(np.eye(3, dtype=np.float32)[None])
    timed("homography_warp_b 6ch 384x448->512x512",
          jax.jit(lambda im, th: ops.homography_warp_b(im, th, S, S)),
          img6, theta)

    canv6 = jnp.asarray(rng.uniform(0, 255, (1, S, S, 6)), jnp.float32)
    flowc = jnp.asarray(rng.normal(0, 8, (1, S, S, 2)), jnp.float32)
    timed("flow_warp_b 6ch 512x512 (b1)",
          jax.jit(ops.flow_warp_b), canv6, flowc)

    occ = jnp.asarray(rng.random((1, S, S, 1)) > 0.5, jnp.float32)
    timed("preprocess_occlusion_mask",
          jax.jit(lambda o: ops.preprocess_occlusion_mask(
              o, cfg.occlusion_kernel)), occ)

    m = jnp.asarray(rng.random((S, S, 1)) > 0.5, jnp.float32)
    timed("morphology open 11x11",
          jax.jit(lambda x: morphology.morph_open(x, (11, 11))), m)

    img = jnp.asarray(rng.uniform(0, 255, (S, S, 3)), jnp.float32)
    hole = jnp.asarray(rng.random((S, S, 1)) > 0.9, jnp.float32)
    timed("push_pull_inpaint 512x512",
          jax.jit(push_pull_inpaint), img, hole)

    # TPS: solve + fused grid eval at canvas res
    N = 170
    pts_src = jnp.asarray(rng.uniform(0, 1, (N, 2)), jnp.float32)
    pts_dst = pts_src + jnp.asarray(rng.normal(0, 0.01, (N, 2)),
                                    jnp.float32)
    valid = jnp.ones((N,), bool)
    fit = jax.jit(lambda a, b, v: tps_fit(a, b, v))
    timed("tps_fit (N=170)", fit, pts_src, pts_dst, valid)
    kw_, aw_ = fit(pts_src, pts_dst, valid)
    timed("tps_eval_grid 512x512 (pallas)",
          jax.jit(lambda c, kw, aw: tps_eval_grid(c, kw, aw, S, S)),
          pts_src, kw_, aw_)

    # range map (occlusion wang) at canvas
    fl = jnp.asarray(rng.normal(0, 4, (S, S, 2)), jnp.float32)
    timed("compute_range_map 512x512",
          jax.jit(ops.compute_range_map), fl)
    timed("compute_occlusion wang 512x512",
          jax.jit(lambda a, b: ops.compute_occlusion(a, b, "wang")), fl, fl)


if __name__ == "__main__":
    main()
