"""Synced breakdown of the bidirectional FlowFormer align path at the
bench operating point (batch 4 pairs, 512², bf16): context encoder,
memory encoder (twins feats + cost volume + perceiver), decoder.

Usage: python tools/profile_flow_model.py [batch]
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
    print(f"{name:36s} {dt * 1000:9.2f} ms", flush=True)
    return out


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    S = 512
    from stitchax.models import FlowFormer, FlowFormerConfig

    cfg = FlowFormerConfig()
    ff = FlowFormer(cfg)
    k = jax.random.PRNGKey(0)
    img0 = jnp.zeros((1, S, S, 3), jnp.float32)
    fp = jax.jit(ff.init)(k, img0, img0)
    fp = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, fp)

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    i1 = jnp.asarray(rng.uniform(-1, 1, (B, S, S, 3)), dt)
    i2 = jnp.asarray(rng.uniform(-1, 1, (B, S, S, 3)), dt)
    both = jnp.concatenate([i1, i2], axis=0)

    ctx_fn = jax.jit(lambda p, x: ff.apply(
        p, x, method=lambda m, y: m.context_encoder(y)))
    ctx_both = timed(f"context_encoder (2B={2*B})", ctx_fn, fp, both)[0]
    ctx1, ctx2 = ctx_both[:B], ctx_both[B:]

    feat_fn = jax.jit(lambda p, x: ff.apply(
        p, x, method=lambda m, y: m.memory_encoder.feat_encoder(y)))
    timed(f"feat_encoder (2B={2*B})", feat_fn, fp, both)

    cost_fn = jax.jit(lambda p, a, b: ff.apply(
        p, a, b, method=lambda m, x, y: m.memory_encoder._cost_volume(
            m.memory_encoder.feat_encoder(x)[0],
            m.memory_encoder.feat_encoder(y)[0])))
    timed("feats + cost volume", cost_fn, fp, i1, i2)

    enc_fn = jax.jit(lambda p, a, b, c1, c2: ff.apply(
        p, a, b, c1, c2,
        method=lambda m, x, y, u, v: m.memory_encoder.bidirectional(
            x, y, u, v)))
    enc_out = timed("memory_encoder.bidirectional", enc_fn, fp, i1, i2,
                    ctx1, ctx2)
    (_, _), (_, _), (ctx_cat, cost_cat, mem_cat), h3w3 = enc_out

    dec_fn = jax.jit(lambda p, m_, c_, cm_: ff.apply(
        p, m_, c_, cm_, (64, 64),
        method=lambda m, a, b, c, hw: m.memory_decoder(a, b, c, hw)))
    timed("memory_decoder (12 iters, 2B)", dec_fn, fp, mem_cat, ctx_cat,
          cost_cat)

    full = jax.jit(lambda p, a, b: ff.apply(
        p, a, b, method=FlowFormer.bidirectional)[0][0][-1])
    timed("bidirectional full", full, fp, i1, i2)


if __name__ == "__main__":
    main()
