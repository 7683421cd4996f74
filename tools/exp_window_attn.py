"""Experiment: windowed-attention kernel variants at the bench operating
point (N = batch4 x 2dirs x K8 = 64 images of 64x64x128, bf16).

Usage: python tools/exp_window_attn.py
"""

import sys
import time

sys.path.insert(0, ".")
from stitchax.utils.platform import setup_cli_jax  # noqa: E402

setup_cli_jax()

import jax                       # noqa: E402
import jax.numpy as jnp          # noqa: E402
import numpy as np               # noqa: E402

from stitchax.ops.pallas.window_attention import (  # noqa: E402
    window_attention_pallas, window_attention_ref)


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
    N, H, W, C, heads, ws = 64, 64, 64, 128, 8, 7
    T = ws * ws
    dt = jnp.bfloat16
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), dt)
    qx, kx, vx = mk(N, H, W, C), mk(N, H, W, C), mk(N, H, W, C)
    qb, kb, vb = mk(T, C), mk(T, C), mk(1, C)

    ref = jax.jit(lambda *a: window_attention_ref(*a, heads=heads, ws=ws))

    def kern(sb, wb):
        return jax.jit(lambda *a: window_attention_pallas(
            *a, heads=heads, ws=ws, block_strips=sb, win_block=wb))

    def partition_only(q, k, v):
        """Just the XLA-side layout work of the ref: pad+partition 3 streams
        + merge one — isolates transpose cost from attention cost."""
        B, H, W, C = q.shape
        ph, pw = (ws - H % ws) % ws, (ws - W % ws) % ws
        pad = ((0, 0), (0, ph), (0, pw), (0, 0))
        Hp, Wp = H + ph, W + pw

        def part(t):
            t = jnp.pad(t, pad).reshape(B, Hp // ws, ws, Wp // ws, ws, C)
            return t.transpose(0, 1, 3, 2, 4, 5).reshape(B, -1, T, C)

        qw, kw, vw = part(q), part(k), part(v)
        o = (qw + kw + vw).reshape(B, Hp // ws, Wp // ws, ws, ws, C)
        o = o.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
        return o[:, :H, :W]

    po = jax.jit(partition_only)

    args = (qx, kx, vx, qb, kb, vb)
    a = timed("XLA ref (64,64,64,128)", ref, *args)
    timed("XLA partition+merge only", po, qx, kx, vx)
    for sb, wb in [(1, 1), (2, 1), (5, 1), (1, 5), (2, 5), (5, 5),
                   (2, 10), (5, 10), (10, 10)]:
        try:
            d = timed(f"pallas sb={sb} wb={wb}", kern(sb, wb), *args)
            err = float(jnp.abs(a.astype(jnp.float32)
                                - d.astype(jnp.float32)).max())
            print(f"    max abs err: {err:.3e}")
        except Exception as e:  # noqa: BLE001 — record compile failures
            print(f"pallas sb={sb} wb={wb} FAILED: {str(e)[:120]}")


if __name__ == "__main__":
    main()
