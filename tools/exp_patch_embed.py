"""Experiment: cost-map patch-embed formulations at the bench operating
point (P = 8*64*64 maps of 64x64x1, bf16).

The shipped stack (CostMapPatchEmbed) is three 6x6/stride-2 convs with
tiny channel counts (1->16->32->64): ~795 GFLOP per align step but the
MXU runs them at 16/32/64 output lanes of 128. This tool breaks the
stack down per conv and times reformulation candidates.

MEASURED (v5e, 2026-08-17): shipped stack 14.33 ms (proj0 5.42 /
proj1 5.14 / proj2 3.22) = ~55 TFLOP/s effective — XLA's conv lowering
handles the thin channel counts far better than a lane-utilization
model predicts. The block-diag lane-packing candidates LOSE big
(proj0 G=8: 30.2 ms, proj1 G=4: 44.4 ms): the (P/G, ..., G) relayout
transposes dominate. Verdict: keep the shipped convs; the perceiver's
real weight is the vertical twins layers, not the patch embed.

Usage: python tools/exp_patch_embed.py
"""

import sys
import time

sys.path.insert(0, ".")
from stitchax.utils.platform import setup_cli_jax  # noqa: E402

setup_cli_jax()

import jax                       # noqa: E402
import jax.numpy as jnp          # noqa: E402
import numpy as np               # noqa: E402


def timed(name, fn, *args, iters=20):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).sum())
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:52s} {dt * 1000:9.2f} ms", flush=True)
    return out


def conv(x, w, b, stride=2):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), ((2, 2), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b.astype(x.dtype)


def main():
    rng = np.random.default_rng(0)
    P = 8 * 64 * 64
    dt = jnp.bfloat16
    mk = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, dt)

    x0 = mk(P, 64, 64, 1)
    w0, b0 = mk(6, 6, 1, 16), mk(16)
    w1, b1 = mk(6, 6, 16, 32), mk(32)
    w2, b2 = mk(6, 6, 32, 64), mk(64)

    c0 = jax.jit(lambda x: jax.nn.relu(conv(x, w0, b0)))
    c1 = jax.jit(lambda x: jax.nn.relu(conv(x, w1, b1)))
    c2 = jax.jit(lambda x: conv(x, w2, b2))
    stack = jax.jit(lambda x: conv(jax.nn.relu(conv(
        jax.nn.relu(conv(x, w0, b0)), w1, b1)), w2, b2))

    x1 = c0(x0)
    x2 = c1(x1)
    ref = timed("full stack (shipped 3-conv)", stack, x0)
    timed("proj0 6x6s2 1->16  (64->32)", c0, x0)
    timed("proj1 6x6s2 16->32 (32->16)", c1, x1)
    timed("proj2 6x6s2 32->64 (16->8)", c2, x2)

    # --- candidate A: batch-folded lanes -----------------------------------
    # Fold G maps into the channel dim with BLOCK-DIAGONAL weights:
    # (P/G, 64, 64, G) conv with kernel (6, 6, G, G*Cout) where
    # w[:, :, g, g*Cout:(g+1)*Cout] = w0 — output lanes G*Cout instead of
    # Cout. G=8 -> proj0 runs at 128 lanes. FLOPs inflate by G on the
    # contraction, but the MXU pass was idling on those lanes anyway.
    def fold(w, cin, cout, G):
        wf = jnp.zeros((6, 6, G * cin, G * cout), w.dtype)
        for g in range(G):
            wf = wf.at[:, :, g * cin:(g + 1) * cin,
                       g * cout:(g + 1) * cout].set(w)
        return wf

    for G in (4, 8):
        w0f = fold(w0, 1, 16, G)
        b0f = jnp.tile(b0, G)

        def c0_fold(x, w0f=w0f, b0f=b0f, G=G):
            xg = x.reshape(P // G, G, 64, 64).transpose(0, 2, 3, 1)
            y = jax.nn.relu(conv(xg, w0f, b0f))       # (P/G,32,32,G*16)
            y = y.reshape(P // G, 32, 32, G, 16).transpose(0, 3, 1, 2, 4)
            return y.reshape(P, 32, 32, 16)

        a = timed(f"proj0 block-diag folded G={G}", jax.jit(c0_fold), x0)
        err = float(jnp.abs(a.astype(jnp.float32)
                            - x1.astype(jnp.float32)).max())
        print(f"    max abs err vs proj0: {err:.3e}")

    # --- candidate B: fold proj1 too ---------------------------------------
    G = 4
    w1f = fold(w1, 16, 32, G)
    b1f = jnp.tile(b1, G)

    def c1_fold(x):
        xg = x.reshape(P // G, G, 32, 32, 16).transpose(0, 2, 3, 1, 4)
        xg = xg.reshape(P // G, 32, 32, G * 16)
        y = jax.nn.relu(conv(xg, w1f, b1f))           # (P/G,16,16,G*32)
        y = y.reshape(P // G, 16, 16, G, 32).transpose(0, 3, 1, 2, 4)
        return y.reshape(P, 16, 16, 32)

    a = timed("proj1 block-diag folded G=4", jax.jit(c1_fold), x1)
    err = float(jnp.abs(a.astype(jnp.float32) - x2.astype(jnp.float32)).max())
    print(f"    max abs err vs proj1: {err:.3e}")


if __name__ == "__main__":
    main()
