"""Experiment: tiny-token attention formulations.

The perceiver/decoder attend over T=8 latent tokens (or 1 query) with
16-dim heads across 32768-element batches — per-batch (8,16)x(16,8)
matmuls that strand the MXU. Candidates:
  a) einsum batched-matmul (current multi_head_attention)
  b) broadcast multiply + reduce (VPU; no matmul at all)

Shapes: latent self (32768,8->8), input cross (32768,8->64),
decoder cross (32768,1->8).

Usage: python tools/exp_tiny_attn.py
"""

import sys
import time

sys.path.insert(0, ".")
from stitchax.utils.platform import setup_cli_jax  # noqa: E402

setup_cli_jax()

import jax                       # noqa: E402
import jax.numpy as jnp          # noqa: E402
import numpy as np               # noqa: E402

from stitchax.models.layers import multi_head_attention  # noqa: E402


def attn_vpu(q, k, v, heads):
    """Same math as multi_head_attention, lowered as broadcast-mult-reduce
    so the contraction (d=16) rides the VPU instead of 8-wide MXU passes."""
    P, Tq, C = q.shape
    Tk = k.shape[1]
    d = C // heads
    scale = d ** -0.5
    qh = q.reshape(P, Tq, 1, heads, d)
    kh = k.reshape(P, 1, Tk, heads, d)
    vh = v.reshape(P, 1, Tk, heads, d)
    logits = (qh * kh).sum(-1) * scale          # (P, Tq, Tk, heads)
    attn = jax.nn.softmax(logits, axis=2)
    out = (attn[..., None] * vh).sum(2)         # (P, Tq, heads, d)
    return out.reshape(P, Tq, C)


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
    P, C, heads = 32768, 128, 8
    dt = jnp.bfloat16
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), dt)

    for name, Tq, Tk in [("latent-self", 8, 8), ("input-cross", 8, 64),
                         ("decoder-cross", 1, 8)]:
        q, k, v = mk(P, Tq, C), mk(P, Tk, C), mk(P, Tk, C)
        a = timed(f"{name} einsum ({Tq}->{Tk})",
                  jax.jit(lambda q_, k_, v_: multi_head_attention(
                      q_, k_, v_, heads)), q, k, v)
        b = timed(f"{name} vpu mult-reduce",
                  jax.jit(lambda q_, k_, v_: attn_vpu(q_, k_, v_, heads)),
                  q, k, v)
        err = float(jnp.abs(a.astype(jnp.float32)
                            - b.astype(jnp.float32)).max())
        print(f"  max abs err: {err:.3e}")


if __name__ == "__main__":
    main()
