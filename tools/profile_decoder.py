"""Synced breakdown of one MemoryDecoder iteration at the bench operating
point (2B=8 images, 64x64 grid, bf16): cost lookup, decoder cross-attn,
GMA aggregate, motion encoder + GRU + heads, convex upsample.

Usage: python tools/profile_decoder.py
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
    from stitchax.models.flowformer import (DecoderCrossAttention,
                                            FlowFormerConfig, GmaAggregate,
                                            GMAUpdateBlock,
                                            encode_flow_token)
    from stitchax.ops.flow import convex_upsample_flow_b

    cfg = FlowFormerConfig()
    B, H1, W1 = 8, 64, 64
    P = B * H1 * W1
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    k = jax.random.PRNGKey(0)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), dt)

    cost_maps = mk(B, H1, W1, H1, W1, 1)
    coords = jnp.asarray(rng.uniform(5, 58, (B, H1, W1, 2)), jnp.float32)
    timed("encode_flow_token (12x amortized)",
          jax.jit(lambda c, x: encode_flow_token(c, x, r=cfg.lookup_radius)),
          cost_maps, coords)

    q = mk(P, 1, cfg.query_latent_dim)
    key = mk(P, 8, cfg.query_latent_dim)
    val = mk(P, 8, cfg.query_latent_dim)
    ce = mk(P, 1, cfg.query_latent_dim)
    xa = DecoderCrossAttention(cfg)
    xp = jax.jit(xa.init)(k, q, key, val, None, ce)
    timed("decoder cross-attn (per iter)",
          jax.jit(lambda p, a, b, c, e: xa.apply(p, a, b, c, None, e)[0]),
          xp, q, key, val, ce)

    attn = mk(B, H1 * W1, H1 * W1)
    fmap = mk(B, H1, W1, 128)
    agg = GmaAggregate()
    ap = jax.jit(agg.init)(k, attn, fmap)
    timed("GMA aggregate (per iter)",
          jax.jit(lambda p, a, f: agg.apply(p, a, f)), ap, attn, fmap)

    net = mk(B, H1, W1, 128)
    inp = mk(B, H1, W1, 128)
    corr = mk(B, H1, W1, 81 + cfg.query_latent_dim)
    flow = jnp.asarray(rng.standard_normal((B, H1, W1, 2)), jnp.float32)
    ub = GMAUpdateBlock(cfg)
    up = jax.jit(ub.init)(k, net, inp, corr, flow, attn)
    timed("update block (motion+GMA+GRU+flow head)",
          jax.jit(lambda p, *a: ub.apply(p, *a)), up, net, inp, corr, flow,
          attn)

    from stitchax.models.flowformer import MaskHead
    mh = MaskHead()
    mp = jax.jit(mh.init)(k, net)
    timed("mask head (once per fwd at inference)",
          jax.jit(lambda p, n: mh.apply(p, n)), mp, net)

    mask = mk(B, H1, W1, 64 * 9)
    timed("convex upsample (final only now)",
          jax.jit(convex_upsample_flow_b), flow, mask)


if __name__ == "__main__":
    main()
