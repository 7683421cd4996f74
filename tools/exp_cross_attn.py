"""Experiment: 8-query/64-key cross-attention formulations at the
perceiver input layer shape (P=32768, C=128, 8 heads).

  a) vpu broadcast-mult-reduce (current)
  b) head-stack full-width batched matmul: Q_stack (P, h·Tq, C) against
     k (P, Tk, C) — MXU contraction 128 wide, logits materialized once

Usage: python tools/exp_cross_attn.py
"""

import sys
import time

sys.path.insert(0, ".")
from stitchax.utils.platform import setup_cli_jax  # noqa: E402

setup_cli_jax()

import jax                       # noqa: E402
import jax.numpy as jnp          # noqa: E402
import numpy as np               # noqa: E402

from stitchax.models.layers import tiny_token_attention  # noqa: E402


def attn_stack(q, k, v, heads):
    P, Tq, C = q.shape
    Tk = k.shape[1]
    d = C // heads
    scale = d ** -0.5
    ch = jax.lax.broadcasted_iota(jnp.int32, (heads, 1, C), 2)
    hid = jax.lax.broadcasted_iota(jnp.int32, (heads, 1, C), 0)
    hmask = (ch // d == hid).astype(q.dtype)       # (h, 1, C)
    qs = (q[:, None] * hmask[None]).reshape(P, heads * Tq, C) * scale
    logits = jax.lax.dot_general(
        qs, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)        # (P, h*Tq, Tk)
    attn = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out_stack = jax.lax.dot_general(
        attn, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)        # (P, h*Tq, C)
    hm4 = hmask.reshape(1, heads, 1, C).astype(jnp.float32)
    out = (out_stack.reshape(P, heads, Tq, C) * hm4).sum(1)
    return out.astype(q.dtype)


def timed(name, fn, *args, iters=10):
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
    P, C, heads, Tq, Tk = 32768, 128, 8, 8, 64
    dt = jnp.bfloat16
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), dt)
    q, k, v = mk(P, Tq, C), mk(P, Tk, C), mk(P, Tk, C)
    a = timed("vpu mult-reduce (current)",
              jax.jit(lambda *x: tiny_token_attention(*x, heads=heads)),
              q, k, v)
    b = timed("head-stack batched matmul",
              jax.jit(lambda *x: attn_stack(*x, heads=heads)), q, k, v)
    err = float(jnp.abs(a.astype(jnp.float32)
                        - b.astype(jnp.float32)).max())
    print(f"max abs err: {err:.3e}")


if __name__ == "__main__":
    main()
