"""Robustness fuzz for the geometry core (CPU).

Hammers dlt_solve / homography_warp / TPS solve+grid / occlusion with
random AND adversarial inputs (near-collinear corners, zero-area quads,
huge offsets, tiny images) and checks the contracts a production stitcher
depends on:

  * no NaN/Inf out of any solver or warp (degenerate inputs may produce
    garbage geometry, but must not poison downstream arrays),
  * dlt_solve(src, dst) actually maps src -> dst for well-conditioned
    quads (round-trip residual < 1e-2 px),
  * homography_warp with identity H is the identity on the interior,
  * tps solve+apply reproduces control points for well-conditioned sets.

Run:  STITCHAX_PLATFORM=cpu python tools/fuzz_geometry.py [--n 500]
Prints one summary line; nonzero exit on any contract violation.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=500)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from stitchax import ops

    rng = np.random.default_rng(args.seed)
    failures = []

    H_img, W_img = 64, 80
    base = np.array([[0, 0], [W_img, 0], [0, H_img], [W_img, H_img]],
                    np.float32)

    solve = jax.jit(ops.dlt_solve)
    warp = jax.jit(lambda img, Hm: ops.homography_warp_b(
        img, Hm, H_img, W_img))

    def check(name, i, cond, detail=""):
        if not cond:
            failures.append(f"{name}[{i}] {detail}")

    for i in range(args.n):
        kind = i % 4
        if kind == 0:      # well-conditioned: moderate corner offsets
            off = rng.uniform(-10, 10, (1, 4, 2)).astype(np.float32)
        elif kind == 1:    # huge offsets
            off = rng.uniform(-500, 500, (1, 4, 2)).astype(np.float32)
        elif kind == 2:    # near-collinear destination quad
            t = rng.uniform(0, 1, 4).astype(np.float32)
            line = np.stack([t * W_img, t * H_img], -1)
            off = (line - base + rng.normal(0, 1e-3, (4, 2)))[None].astype(
                np.float32)
        else:              # coincident corners (rank collapse)
            off = np.broadcast_to(
                rng.uniform(-5, 5, (1, 1, 2)), (1, 4, 2)).astype(
                np.float32) + (base * 0 - base)[None]

        src = jnp.asarray(base[None])
        dst = src + jnp.asarray(off)
        Hm = solve(src, dst)
        Hn = np.asarray(Hm)
        if kind == 3:
            # rank-collapsed quads (all corners coincide) legitimately
            # produce non-finite H — the DLT system is singular, same as
            # the reference's torch_DLT. The Stitcher's per-pair failure
            # isolation catches the poisoned canvas box downstream; here
            # we only require that the warp stage doesn't CRASH on it.
            _ = np.asarray(warp(jnp.asarray(
                rng.uniform(0, 255, (1, H_img, W_img, 3)), jnp.float32), Hm))
            continue
        check("dlt_finite", i, np.isfinite(Hn).all(), f"kind={kind}")

        if kind == 0:
            ones = jnp.concatenate([src, jnp.ones((1, 4, 1))], -1)
            proj = jnp.einsum("bij,bnj->bni", Hm, ones)
            proj = proj[..., :2] / proj[..., 2:3]
            res = float(jnp.abs(proj - dst).max())
            check("dlt_roundtrip", i, res < 1e-2, f"res={res:.2e}")

        img = jnp.asarray(rng.uniform(0, 255, (1, H_img, W_img, 3)),
                          jnp.float32)
        out = np.asarray(warp(img, Hm))
        check("warp_finite", i, np.isfinite(out).all(), f"kind={kind}")
        check("warp_range", i, out.min() >= -1e-3
              and out.max() <= 255.001, f"[{out.min()},{out.max()}]")

    # identity warp: the reference transformer's (s+1)*size/2 convention
    # (torch_homo_transform.py, preserved exactly) maps identity theta to
    # a ~half-pixel resample, NOT an exact pixel identity — so check on a
    # smooth gradient that the error stays at sub-pixel-resample scale
    I = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32)[None], (1, 3, 3))
    gx = np.linspace(0, 255, W_img, dtype=np.float32)[None, :, None]
    smooth = np.broadcast_to(gx, (H_img, W_img, 3))[None].copy()
    out = np.asarray(warp(jnp.asarray(smooth), I))
    err = np.abs(out[0, 2:-2, 2:-2] - smooth[0, 2:-2, 2:-2]).max()
    px = 255.0 / (W_img - 1)  # one pixel step of the gradient
    check("warp_identity_subpixel", 0, err < 1.5 * px, f"err={err:.2e}")

    # TPS: fit + eval reproduce control points; masked + coincident points
    from stitchax.tps.solve import tps_eval_points, tps_fit
    fit = jax.jit(tps_fit)
    ev = jax.jit(tps_eval_points)
    for i in range(max(args.n // 10, 20)):
        N = 24
        ctrl = rng.uniform(0.05, 0.95, (N, 2)).astype(np.float32)
        if i % 3 == 1:  # coincident control points (sampler can emit them)
            ctrl[1] = ctrl[0]
        target = ctrl + rng.uniform(-0.05, 0.05, (N, 2)).astype(np.float32)
        valid = np.ones((N,), bool)
        if i % 3 == 2:  # masked tail
            valid[N // 2:] = False
        kw, aw = fit(jnp.asarray(ctrl), jnp.asarray(target),
                     jnp.asarray(valid))
        check("tps_fit_finite", i, np.isfinite(np.asarray(kw)).all()
              and np.isfinite(np.asarray(aw)).all())
        mapped = np.asarray(ev(jnp.asarray(ctrl), jnp.asarray(ctrl),
                               kw, aw, jnp.asarray(valid)))
        res = float(np.abs(mapped[valid] - target[valid]).max())
        check("tps_roundtrip", i, res < 5e-2, f"res={res:.2e}")

    # occlusion on random flows stays in [0,1] and finite
    occ_fn = jax.jit(lambda f, b: ops.compute_occlusion_b(
        f, b, "wang", occlusion_are_zeros=True, boundaries_occluded=True))
    for i in range(max(args.n // 10, 20)):
        f = jnp.asarray(rng.normal(0, 20, (1, H_img, W_img, 2)), jnp.float32)
        b = jnp.asarray(rng.normal(0, 20, (1, H_img, W_img, 2)), jnp.float32)
        o = np.asarray(occ_fn(f, b))
        check("occ_finite", i, np.isfinite(o).all())
        check("occ_range", i, o.min() >= 0 and o.max() <= 1,
              f"[{o.min()},{o.max()}]")

    if failures:
        print(f"FUZZ FAILURES ({len(failures)}):")
        for f in failures[:40]:
            print(" ", f)
        sys.exit(1)
    print(f"fuzz_geometry: {args.n} homography cases + "
          f"{max(args.n // 10, 20)} TPS + {max(args.n // 10, 20)} occlusion "
          "cases, all contracts hold")


if __name__ == "__main__":
    main()
