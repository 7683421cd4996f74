"""Experiment: vertical twins-block glue around the attention cores.

Round-3's campaign pinned the LSA/GSA attention cores at their measured op
floors (window head-split 12.8 ms, Pallas GSA 5.6 ms) — but a vertical
layer measures ~34 ms, so ~16 ms/layer is GLUE: the `[x, repeat(ctx)]`
concat feeding the q/k projections (a (64, 64, 64, 192) materialization,
~100 MB bf16, read twice), the (B,)->(B*K,) context repeat, layernorms,
and the projection/MLP chain (reference twins.py:229-392 does all of this
with dense concats too — the question is what XLA actually fuses).

Candidate (split-weights): since Dense([x, c]) == x @ W[:C] + c @ W[C:]
+ b exactly (one fp reassociation in bf16), compute the ctx part of the
q/k projections at the UNREPEATED batch B and broadcast the (B, H, W, C)
result to B*K — the concat buffer never exists and the ctx matmuls run at
1/K the FLOPs. Same param tree (q/kernel sliced), so the converter and
checkpoints are untouched.

Measures, at the bench operating point (B*K=64 maps of 64x64x128, ctx
B=8 256-ch, bf16):
  A. shipped TwinsBlockRPEContext local+global pair (the vertical layer)
  B. split-weights local+global pair built from the SAME params
  C. the isolated sub-stages of A (LN / qkv+concat / core / proj+mlp)

Usage: python tools/exp_vertical_glue.py
"""

import sys
import time

sys.path.insert(0, ".")
from stitchax.utils.platform import setup_cli_jax  # noqa: E402

setup_cli_jax()

import jax                       # noqa: E402
import jax.numpy as jnp          # noqa: E402
import numpy as np               # noqa: E402
from flax import linen as nn    # noqa: E402

from stitchax.models.layers import (  # noqa: E402
    Mlp, linear_position_embedding_sine, pad_to_multiple)
from stitchax.models.twins import TwinsBlockRPEContext  # noqa: E402
from stitchax.ops.pallas.gsa_attention import gsa_attention  # noqa: E402
from stitchax.ops.window_attention import window_attention  # noqa: E402


def timed(name, fn, *args, iters=10):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).sum())
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:52s} {dt * 1000:9.2f} ms", flush=True)
    return out


# ---------------------------------------------------------------- variant B

def split_local(params, x, context, *, dim=128, heads=8, ws=7,
                vert_c_dim=64):
    """LocallyGroupedAttnRPEContext with split q/k weights, same params."""
    p = params
    C = x.shape[-1]
    Cqk = C + vert_c_dim
    ctx = context @ p["context_proj"]["kernel"] + p["context_proj"]["bias"]
    rep = x.shape[0] // ctx.shape[0]

    gy, gx = jnp.meshgrid(jnp.arange(ws, dtype=x.dtype),
                          jnp.arange(ws, dtype=x.dtype), indexing="ij")
    enc = linear_position_embedding_sine(
        jnp.stack([gx, gy], -1), dim=Cqk)
    T = ws * ws

    Wq, bq = p["q"]["kernel"], p["q"]["bias"]
    Wk, bk = p["k"]["kernel"], p["k"]["bias"]
    Wv, bv = p["v"]["kernel"], p["v"]["bias"]
    q_bias = enc.reshape(T, Cqk) @ Wq + bq
    k_bias = enc.reshape(T, Cqk) @ Wk + bk

    # bias-free streams, ctx part at the unrepeated batch
    qc = jnp.repeat(ctx @ Wq[C:], rep, axis=0)
    kc = jnp.repeat(ctx @ Wk[C:], rep, axis=0)
    qx = x @ Wq[:C] + qc
    kx = x @ Wk[:C] + kc
    vx = x @ Wv
    out = window_attention(qx, kx, vx, q_bias, k_bias, bv[None],
                           heads=heads, ws=ws)
    return out @ p["proj"]["kernel"] + p["proj"]["bias"]


def split_global(params, x, context, *, dim=128, heads=8, sr_ratio=4,
                 vert_c_dim=64):
    """GlobalSubSampleAttnRPEContext with split q weights (the sr_key conv
    still consumes the concat — it is a strided conv over 192 channels, so
    only the full-res q projection benefits from splitting)."""
    p = params
    B, H, W, C = x.shape
    Cqk = C + vert_c_dim
    ctx = context @ p["context_proj"]["kernel"] + p["context_proj"]["bias"]
    rep = B // ctx.shape[0]
    x_p, (h0, w0) = pad_to_multiple(x, sr_ratio)
    Hp, Wp = x_p.shape[1], x_p.shape[2]

    gy, gx = jnp.meshgrid(jnp.arange(Hp, dtype=x.dtype),
                          jnp.arange(Wp, dtype=x.dtype), indexing="ij")
    enc_q = linear_position_embedding_sine(
        jnp.stack([gx, gy], -1), dim=Cqk)

    Wq, bq = p["q"]["kernel"], p["q"]["bias"]
    # q = Dense([x, ctx] + enc) = x@Wq[:C] + ctx@Wq[C:] + enc@Wq + b
    enc_term = enc_q.reshape(Hp, Wp, Cqk) @ Wq + bq        # (Hp, Wp, C)
    qc = jnp.repeat(ctx @ Wq[C:], rep, axis=0)
    q = x_p @ Wq[:C] + pad_to_multiple(qc, sr_ratio)[0] + enc_term[None]

    # kv path unchanged: strided convs over the concat (downsampled 16x,
    # cheap) — build the concat only at need
    ctx_r = jnp.repeat(ctx, rep, axis=0)
    x_qk = jnp.concatenate([x, ctx_r], axis=-1)
    x_qk, _ = pad_to_multiple(x_qk, sr_ratio)

    def sconv(t, w, b):
        return jax.lax.conv_general_dilated(
            t, w.astype(t.dtype), (sr_ratio, sr_ratio), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b.astype(t.dtype)

    xv = sconv(x_p, p["sr_value"]["kernel"], p["sr_value"]["bias"])
    xk = sconv(x_qk, p["sr_key"]["kernel"], p["sr_key"]["bias"])
    ln = p["norm"]

    def layernorm(t):
        mu = t.mean(-1, keepdims=True)
        var = ((t - mu) ** 2).mean(-1, keepdims=True)
        return ((t - mu) * jax.lax.rsqrt(var + 1e-5)
                * ln["scale"] + ln["bias"]).astype(t.dtype)

    xv = layernorm(xv)
    xk = layernorm(xk)
    hs, ws_ = Hp // sr_ratio, Wp // sr_ratio
    gy, gx = jnp.meshgrid(jnp.arange(hs, dtype=x.dtype),
                          jnp.arange(ws_, dtype=x.dtype), indexing="ij")
    enc_k = linear_position_embedding_sine(
        jnp.stack([gx, gy], -1) * sr_ratio, dim=C)
    k = (xk + enc_k[None]) @ p["k"]["kernel"] + p["k"]["bias"]
    v = xv @ p["v"]["kernel"] + p["v"]["bias"]

    out = gsa_attention(q.reshape(B, Hp * Wp, C).astype(x.dtype),
                        k.reshape(B, hs * ws_, C).astype(x.dtype),
                        v.reshape(B, hs * ws_, C).astype(x.dtype),
                        heads=heads)
    out = out.reshape(B, Hp, Wp, C)[:, :h0, :w0]
    return out @ p["proj"]["kernel"] + p["proj"]["bias"]


def split_block(params, x, context, kind):
    """Pre-norm block around the split attention (same param paths)."""
    p = params
    ln1, ln2 = p["norm1"], p["norm2"]

    def layernorm(t, ln):
        mu = t.astype(jnp.float32).mean(-1, keepdims=True)
        var = ((t.astype(jnp.float32) - mu) ** 2).mean(-1, keepdims=True)
        return ((t - mu.astype(t.dtype))
                * jax.lax.rsqrt(var + 1e-6).astype(t.dtype)
                * ln["scale"].astype(t.dtype) + ln["bias"].astype(t.dtype))

    fn = split_local if kind == "local" else split_global
    x = x + fn(p["attn"], layernorm(x, ln1), context)
    y = layernorm(x, ln2)
    mlp = p["mlp"]
    y = y @ mlp["fc1"]["kernel"] + mlp["fc1"]["bias"]
    y = nn.gelu(y, approximate=False)
    return x + (y @ mlp["fc2"]["kernel"] + mlp["fc2"]["bias"])


def main():
    # args: [B K S] (default = bench operating point; smaller for CPU
    # correctness checks)
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    S = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    C, Cc = 128, 256
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.normal(size=(B * K, S, S, C)), dt)
    ctx = jnp.asarray(rng.normal(size=(B, S, S, Cc)), dt)

    local = TwinsBlockRPEContext(C, 8, ws=7, sr_ratio=4, vert_c_dim=64)
    glob = TwinsBlockRPEContext(C, 8, ws=1, sr_ratio=4, vert_c_dim=64)
    pl_ = jax.jit(local.init)(jax.random.PRNGKey(0), x[:1], ctx[:1])
    pg = jax.jit(glob.init)(jax.random.PRNGKey(1), x[:1], ctx[:1])
    to16 = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, t)
    pl_, pg = to16(pl_), to16(pg)

    f_local = jax.jit(lambda p, a, c: local.apply(p, a, c))
    f_glob = jax.jit(lambda p, a, c: glob.apply(p, a, c))
    o_l = timed("A: shipped local block", f_local, pl_, x, ctx)
    o_g = timed("A: shipped global block", f_glob, pg, x, ctx)

    s_local = jax.jit(lambda p, a, c: split_block(p["params"], a, c,
                                                  "local"))
    s_glob = jax.jit(lambda p, a, c: split_block(p["params"], a, c,
                                                 "global"))
    o_ls = timed("B: split-weights local block", s_local, pl_, x, ctx)
    o_gs = timed("B: split-weights global block", s_glob, pg, x, ctx)

    for name, a, b in (("local", o_l, o_ls), ("global", o_g, o_gs)):
        err = float(jnp.abs(a.astype(jnp.float32)
                            - b.astype(jnp.float32)).max())
        scale = float(jnp.abs(a.astype(jnp.float32)).max())
        print(f"{name}: max|A-B| = {err:.4f} (scale {scale:.1f})")


if __name__ == "__main__":
    main()
