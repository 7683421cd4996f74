"""Synced breakdown of CostPerceiverEncoder internals at the bench
operating point (batch 4 pairs bidirectional => B=8 in the perceiver,
B*H1*W1 = 32768 token batches, B*K = 64 vertical images).

Usage: python tools/profile_perceiver.py
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
    from stitchax.models.flowformer import (CostMapPatchEmbed,
                                            CostPerceiverEncoder,
                                            FlowFormerConfig,
                                            LatentCrossAttention,
                                            LatentSelfAttention,
                                            VerticalSelfAttention)

    cfg = FlowFormerConfig()
    B, H1, W1 = 8, 64, 64
    K, D = cfg.cost_latent_token_num, cfg.cost_latent_dim
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    k = jax.random.PRNGKey(0)

    cost = jnp.asarray(rng.standard_normal((B, H1, W1, H1, W1, 1)), dt)
    ctx = jnp.asarray(rng.standard_normal((B, H1, W1, 256)), dt)

    perc = CostPerceiverEncoder(cfg)
    pp = jax.jit(perc.init)(k, cost, ctx)
    timed("CostPerceiverEncoder total (B=8)",
          jax.jit(lambda p, c, x: perc.apply(p, c, x)), pp, cost, ctx)

    cm = cost.reshape(B * H1 * W1, H1, W1, 1)
    pe = CostMapPatchEmbed(cfg)
    pe_p = jax.jit(pe.init)(k, cm)
    timed("patch_embed (32768,64,64,1)",
          jax.jit(lambda p, c: pe.apply(p, c)), pe_p, cm)

    patches = jnp.asarray(rng.standard_normal((B * H1 * W1, 64, 128)), dt)
    latent = jnp.asarray(rng.standard_normal((1, K, D)), dt)
    xa = LatentCrossAttention(cfg)
    xa_p = jax.jit(xa.init)(k, latent, patches)
    timed("input cross-attn (32768 x 64 -> 8)",
          jax.jit(lambda p, l, t: xa.apply(p, l, t)), xa_p, latent, patches)

    tok = jnp.asarray(rng.standard_normal((B * H1 * W1, K, D)), dt)
    ls = LatentSelfAttention(cfg)
    ls_p = jax.jit(ls.init)(k, tok)
    timed("latent self-attn (32768,8,128)",
          jax.jit(lambda p, t: ls.apply(p, t)), ls_p, tok)

    x = jnp.asarray(rng.standard_normal((B * K, H1, W1, D)), dt)
    vert = VerticalSelfAttention(cfg)
    vp = jax.jit(vert.init)(k, x, ctx)
    timed("vertical layer (64,64,64,128)",
          jax.jit(lambda p, a, c: vert.apply(p, a, c)), vp, x, ctx)


if __name__ == "__main__":
    main()
