"""Experiment: windowed-attention formulations at the bench operating
point (N = batch4 x 2dirs x K8 = 64 images of 64x64x128, bf16).

History (v5e, remote compile):
  round 2: single-window-per-matmul Pallas strip kernel: 28 ms vs
           12.99 ms XLA head-split (640-program grid overhead).
  round 3: restructured kernel (block_strips rows/program, win_block
           windows per fused matmul pair, static slices): 16.0-16.5 ms
           across (sb, wb) in {1,2,5,10}x{5,10} — still LOSES to XLA
           head-split at 12.87 ms, so the kernel was RETIRED from the
           product tree (it lives only here now). sb=10,wb=10 OOMed the
           remote compiler (SIGKILL).
  The production choice between the XLA head-split and head-stack
  formulations lives in stitchax/ops/window_attention.py. Measured:
  head-split 12.83 ms, head-stack 14.16 ms, retired kernel (sb2/wb5)
  23.96 ms — head-split stays the default.

Usage: python tools/exp_window_attn.py
"""

import functools
import sys
import time

sys.path.insert(0, ".")
from stitchax.utils.platform import setup_cli_jax  # noqa: E402

setup_cli_jax()

import jax                       # noqa: E402
import jax.numpy as jnp          # noqa: E402
import numpy as np               # noqa: E402
from jax.experimental import pallas as pl              # noqa: E402
from jax.experimental.pallas import tpu as pltpu       # noqa: E402

from stitchax.ops.window_attention import (  # noqa: E402
    window_attention_headstack, window_attention_split)


# --------------------------------------------------------------------------
# Retired Pallas strip kernel (kept here as the measured record): one
# program covers `n_strips` window rows, `win_block` adjacent windows share
# each pair of fused matmuls, heads ride channel masks on full-width rows.
# All slices static — the fori_loop + pl.ds variant failed Mosaic's
# 8-sublane alignment proof at ws=7 offsets.
# --------------------------------------------------------------------------

def _kernel(qx_ref, kx_ref, vx_ref, qb_ref, kb_ref, vb_ref, out_ref, *,
            ws: int, heads: int, n_win: int, n_strips: int = 1,
            win_block: int = 1):
    C = qx_ref.shape[-1]
    d = C // heads
    T = ws * ws
    scale = d ** -0.5

    qb = qb_ref[:, :].astype(jnp.float32)          # (T, C)
    kb = kb_ref[:, :].astype(jnp.float32)
    vb = vb_ref[:, :].astype(jnp.float32)          # (1, C)

    ch = jax.lax.broadcasted_iota(jnp.int32, (heads, 1, 1, C), 3)
    hid = jax.lax.broadcasted_iota(jnp.int32, (heads, 1, 1, C), 0)
    hmask = (ch // d == hid).astype(jnp.float32)   # (h, 1, 1, C)

    for s in range(n_strips):
        rows = slice(s * ws, (s + 1) * ws)
        for j0 in range(0, n_win, win_block):
            W = min(win_block, n_win - j0)
            cols = slice(j0 * ws, (j0 + W) * ws)

            def win(ref, bias):
                t = ref[0, rows, cols, :].astype(jnp.float32)
                t = t.reshape(ws, W, ws, C).transpose(1, 0, 2, 3)
                return t.reshape(W, T, C) + bias[None]

            q = win(qx_ref, qb)
            k = win(kx_ref, kb)
            v = win(vx_ref, vb)

            qs = (q[None] * hmask * scale).reshape(heads * W, T, C)
            kb_ = jnp.broadcast_to(k[None], (heads, W, T, C)).reshape(
                heads * W, T, C)
            logits = jax.lax.dot_general(
                qs, kb_, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)   # (h·W, T, T)
            attn = jax.nn.softmax(logits, axis=-1)
            vs = (v[None] * hmask).reshape(heads * W, T, C)
            outs = jax.lax.dot_general(
                attn, vs, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)   # (h·W, T, C)
            out = jnp.sum(outs.reshape(heads, W, T, C), axis=0)
            out = out.reshape(W, ws, ws, C).transpose(1, 0, 2, 3)
            out_ref[0, rows, cols, :] = out.reshape(
                ws, W * ws, C).astype(out_ref.dtype)


def window_attention_pallas(qx, kx, vx, q_bias, k_bias, v_bias, *,
                            heads: int, ws: int, block_strips: int = 1,
                            win_block: int = 1, interpret: bool = False):
    B, H, W, C = qx.shape
    ph = (ws - H % ws) % ws
    pw = (ws - W % ws) % ws
    if ph or pw:
        pad = ((0, 0), (0, ph), (0, pw), (0, 0))
        qx, kx, vx = jnp.pad(qx, pad), jnp.pad(kx, pad), jnp.pad(vx, pad)
    Hp, Wp = H + ph, W + pw
    n_strips, n_win = Hp // ws, Wp // ws
    T = ws * ws

    sb = max(s for s in range(1, min(block_strips, n_strips) + 1)
             if n_strips % s == 0)
    kernel = functools.partial(_kernel, ws=ws, heads=heads, n_win=n_win,
                               n_strips=sb, win_block=win_block)
    strip = pl.BlockSpec((1, sb * ws, Wp, C), lambda n, s: (n, s, 0, 0),
                         memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda n, s: (0, 0),
                                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_strips // sb),
        in_specs=[strip, strip, strip, full((T, C)), full((T, C)),
                  full((1, C))],
        out_specs=strip,
        out_shape=jax.ShapeDtypeStruct((B, Hp, Wp, C), qx.dtype),
        interpret=interpret,
    )(qx, kx, vx, q_bias.reshape(T, C), k_bias.reshape(T, C),
      v_bias.reshape(1, C))
    return out[:, :H, :W]


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
    args = (qx, kx, vx, qb, kb, vb)

    split = jax.jit(lambda *a: window_attention_split(*a, heads=heads, ws=ws))
    stack = jax.jit(lambda *a: window_attention_headstack(*a, heads=heads,
                                                          ws=ws))
    a = timed("XLA head-split (shipped r2)", split, *args)
    b = timed("XLA head-stack (dense K=128)", stack, *args)
    err = float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max())
    print(f"    head-stack max abs err: {err:.3e}")

    for sb, wb in [(2, 5)]:
        try:
            kern = jax.jit(lambda *a: window_attention_pallas(
                *a, heads=heads, ws=ws, block_strips=sb, win_block=wb))
            d = timed(f"pallas (retired) sb={sb} wb={wb}", kern, *args)
            err = float(jnp.abs(a.astype(jnp.float32)
                                - d.astype(jnp.float32)).max())
            print(f"    max abs err: {err:.3e}")
        except Exception as e:  # noqa: BLE001 — record compile failures
            print(f"pallas sb={sb} wb={wb} FAILED: {str(e)[:120]}")


if __name__ == "__main__":
    main()
