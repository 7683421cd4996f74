"""Synced micro-profile of the flow model's hot sub-blocks + the warp
gathers (run on the TPU). Targets the round-2 perf levers:

  * vertical twins attention (LSA ws=7 / GSA sr=4 RPE-context blocks)
  * latent self/cross attention
  * the two bilinear image-warp gathers (H-warp, flow-warp)
  * GMA similarity map

Usage: PYTHONPATH=. python tools/profile_flow_parts.py
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
    print(f"{name:40s} {dt * 1000:9.2f} ms", flush=True)
    return dt


def main():
    from stitchax.models.flowformer import (FlowFormerConfig,
                                            GmaAttention,
                                            LatentSelfAttention,
                                            VerticalSelfAttention)
    from stitchax.models.twins import TwinsBlockRPEContext
    from stitchax import ops

    cfg = FlowFormerConfig()
    K, D = cfg.cost_latent_token_num, cfg.cost_latent_dim
    H1 = W1 = 64
    B = 1          # per direction, matching the round-1 component table
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    x = jnp.asarray(rng.normal(0, 1, (B * K, H1, W1, D)), dt)
    ctx = jnp.asarray(rng.normal(0, 1, (B, H1, W1, 256)), dt)
    ctx_rep = jnp.repeat(ctx, K, axis=0)

    k = jax.random.PRNGKey(0)

    lsa = TwinsBlockRPEContext(D, 8, ws=7, sr_ratio=4, vert_c_dim=64)
    lsa_p = jax.jit(lsa.init)(k, x, ctx_rep)
    timed("LSA block ws=7 (8,64,64,128)",
          jax.jit(lambda p, a, c: lsa.apply(p, a, c)), lsa_p, x, ctx_rep)

    gsa = TwinsBlockRPEContext(D, 8, ws=1, sr_ratio=4, vert_c_dim=64)
    gsa_p = jax.jit(gsa.init)(k, x, ctx_rep)
    timed("GSA block sr=4 (8,64,64,128)",
          jax.jit(lambda p, a, c: gsa.apply(p, a, c)), gsa_p, x, ctx_rep)

    vert = VerticalSelfAttention(cfg)
    vert_p = jax.jit(vert.init)(k, x, ctx)
    timed("vertical layer (LSA+GSA)",
          jax.jit(lambda p, a, c: vert.apply(p, a, c)), vert_p, x, ctx)

    tok = jnp.asarray(rng.normal(0, 1, (B * H1 * W1, K, D)), dt)
    lsa2 = LatentSelfAttention(cfg)
    lsa2_p = jax.jit(lsa2.init)(k, tok)
    timed("latent self-attn (4096,8,128)",
          jax.jit(lambda p, a: lsa2.apply(p, a)), lsa2_p, tok)

    gma = GmaAttention()
    fmap = jnp.asarray(rng.normal(0, 1, (B, H1, W1, 128)), dt)
    gma_p = jax.jit(gma.init)(k, fmap)
    timed("GMA similarity (1,4096,4096)",
          jax.jit(lambda p, a: gma.apply(p, a)), gma_p, fmap)

    # warp gathers at the align operating point (batch 4, fp32 geometry)
    Bw, S = 4, 512
    img = jnp.asarray(rng.uniform(0, 255, (Bw, S, S, 3)), jnp.float32)
    flow = jnp.asarray(rng.normal(0, 8, (Bw, S, S, 2)), jnp.float32)
    theta = jnp.asarray(
        np.eye(3, dtype=np.float32)[None].repeat(Bw, 0)
        + rng.normal(0, 0.01, (Bw, 3, 3)).astype(np.float32))
    timed("flow_warp_b (4,512,512,3)",
          jax.jit(ops.flow_warp_b), img, flow)
    timed("homography_warp_b (4,512,512,3)",
          jax.jit(lambda im, th: ops.homography_warp_b(im, th, S, S)),
          img, theta)
    fl2 = jnp.asarray(rng.normal(0, 8, (Bw, S, S, 2)), jnp.float32)
    timed("flow_warp_b on flow (4,512,512,2)",
          jax.jit(ops.flow_warp_b), fl2, flow)


if __name__ == "__main__":
    main()
