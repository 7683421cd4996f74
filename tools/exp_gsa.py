"""Experiment: GSA attention core — Pallas vs XLA einsum at the vertical
(64,4096,256kv,128) and encoder (8,16384,256kv,128) operating points.

Usage: python tools/exp_gsa.py
"""

import sys
import time

sys.path.insert(0, ".")
from stitchax.utils.platform import setup_cli_jax  # noqa: E402

setup_cli_jax()

import jax                       # noqa: E402
import jax.numpy as jnp          # noqa: E402
import numpy as np               # noqa: E402

from stitchax.ops.pallas.gsa_attention import (gsa_attention_pallas,  # noqa: E402
                                               gsa_attention_ref)


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
    dt = jnp.bfloat16
    for B, N, M, C, heads in [(64, 4096, 256, 128, 8),
                              (8, 16384, 256, 128, 4)]:
        mk = lambda *s: jnp.asarray(rng.standard_normal(s), dt)
        q, k, v = mk(B, N, C), mk(B, M, C), mk(B, M, C)
        a = timed(f"xla einsum ({B},{N},{M},{C})",
                  jax.jit(lambda q_, k_, v_: gsa_attention_ref(
                      q_, k_, v_, heads=heads)), q, k, v)
        b = timed(f"pallas gsa ({B},{N},{M},{C})",
                  jax.jit(lambda q_, k_, v_: gsa_attention_pallas(
                      q_, k_, v_, heads=heads)), q, k, v)
        err = float(jnp.abs(a.astype(jnp.float32)
                            - b.astype(jnp.float32)).max())
        print(f"  max abs err: {err:.3e}")


if __name__ == "__main__":
    main()
