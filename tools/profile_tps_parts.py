"""Synced breakdown of the TPS-stage program: break/warp vs mix/inpaint
at the demo operating point (512x512 canvas, cv inpainter).

Usage: python tools/profile_tps_parts.py
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
    print(f"{name:40s} {dt * 1000:9.2f} ms", flush=True)
    return out


def main():
    from stitchax.compose.mix_methods import MIX_METHODS
    from stitchax.compose.inpainters import get_inpainter
    from stitchax.tps.pipeline import TPSConfig, tps_break_warp

    S = 512
    rng = np.random.default_rng(0)
    img = lambda c=3: jnp.asarray(rng.uniform(0, 255, (S, S, c)), jnp.float32)
    mask = lambda: jnp.asarray(
        (rng.uniform(0, 1, (S, S, 1)) > 0.3).astype(np.float32))

    cfg = TPSConfig(grid_h=8, grid_w=8)
    output1, mask1 = img(), mask()
    h_warp, h_warp_mask = img(), mask()
    final_warp = img()
    flow = jnp.asarray(rng.normal(0, 4, (384, 448, 2)), jnp.float32)
    occ = mask()
    wmin = jnp.float32(-10.0)
    hmin = jnp.float32(-5.0)

    tps_fn = jax.jit(lambda *a: tps_break_warp(*a, cfg, occlusion_mask=occ))
    t = timed("tps_break_warp", tps_fn, output1, mask1, h_warp,
              h_warp_mask, final_warp, flow, wmin, hmin)

    mix_fn = MIX_METHODS.get("all_img1_with_inpaint")
    inpaint = get_inpainter("cv_inpainter").inpaint

    def mix_part(output2, mask2):
        m = mix_fn(output2, mask2, output1, mask1, final_warp, occ,
                   inpaint=inpaint, inpainter_name="cv_inpainter")
        return m.tps_final_warp

    timed("mix + cv inpaint", jax.jit(mix_part), t["output2"], t["mask2"])


if __name__ == "__main__":
    main()
