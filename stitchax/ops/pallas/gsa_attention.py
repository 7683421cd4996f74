"""Fused global-subsample attention (twins GSA core) Pallas kernel.

GSA attends every token to an sr-strided subsample (M = 256 keys at the
512² operating point) with 16-dim heads. The XLA lowering materializes
(B, heads, N, M) logits in HBM and runs thin (N,16)x(16,M) batched
matmuls; this kernel keeps each (token-tile x M) logits block in VMEM and
lifts the d=16 contraction to full channel width via per-head channel
masks — every matmul is (tile,128)x(128,M) / (tile,M)x(M,128), MXU-shaped
and relayout-free (contiguous row slices only). 8x redundant FLOPs, but
the op is bandwidth/overhead-bound, not FLOP-bound.

Used by the twins GSA blocks (stitchax/models/twins.py; reference
core/FlowFormer/PerCostFormer3/twins.py:306-392 and timm twins GSA).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int):
    C = q_ref.shape[-1]
    d = C // heads
    scale = d ** -0.5
    q = q_ref[0].astype(jnp.float32)       # (T, C)
    k = k_ref[0].astype(jnp.float32)       # (M, C)
    v = v_ref[0].astype(jnp.float32)

    ch = jax.lax.broadcasted_iota(jnp.int32, (heads, 1, C), 2)
    hid = jax.lax.broadcasted_iota(jnp.int32, (heads, 1, C), 0)
    hmask = (ch // d == hid).astype(jnp.float32)   # (heads, 1, C)

    out = jnp.zeros(q.shape, jnp.float32)
    for h in range(heads):
        qs = q * hmask[h] * scale
        logits = jax.lax.dot_general(
            qs, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)    # (T, M)
        attn = jax.nn.softmax(logits, axis=-1)
        out = out + jax.lax.dot_general(
            attn, v * hmask[h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # (T, C)
    o_ref[0] = out.astype(o_ref.dtype)


def gsa_attention_pallas(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                         heads: int, tile: int = 0,
                         interpret: bool = False) -> jnp.ndarray:
    """q (B, N, C), k/v (B, M, C) -> (B, N, C) multi-head attention with
    the reference scale convention ((C/heads)^-0.5 on the logits).

    tile=0 picks the largest token tile that fits VMEM: double-buffered
    in/out blocks (4 streams at the input dtype) plus the kernel's fp32
    q/qs/vs/out temps, against a conservative ~8 MB budget (the fp32
    C=256 eval config overflowed the 16 MB scoped limit at tile 2048)."""
    B, N, C = q.shape
    M = k.shape[1]
    if tile <= 0:
        bytes_per_row = C * (8 * q.dtype.itemsize + 16)
        tile = max(256, min(2048, (8 * 2 ** 20 // bytes_per_row) // 256 * 256))
    t = min(tile, N)
    pad = (-N) % t
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
    n_tiles = (N + pad) // t

    kernel = functools.partial(_kernel, heads=heads)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, t, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N + pad, C), q.dtype),
        interpret=interpret,
    )(q, k, v)
    return out[:, :N]


def gsa_attention_ref(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                      heads: int) -> jnp.ndarray:
    """Pure-XLA oracle (the einsum formulation)."""
    B, N, C = q.shape
    M = k.shape[1]
    d = C // heads
    scale = d ** -0.5
    qh = q.reshape(B, N, heads, d).transpose(0, 2, 1, 3)
    kh = k.reshape(B, M, heads, d).transpose(0, 2, 1, 3)
    vh = v.reshape(B, M, heads, d).transpose(0, 2, 1, 3)
    attn = jax.nn.softmax(jnp.einsum("bhid,bhjd->bhij", qh, kh) * scale, -1)
    out = jnp.einsum("bhij,bhjd->bhid", attn, vh)
    return out.transpose(0, 2, 1, 3).reshape(B, N, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _gsa_tpu(q, k, v, heads):
    return gsa_attention_pallas(q, k, v, heads=heads)


def _gsa_fwd(q, k, v, heads):
    return gsa_attention_pallas(q, k, v, heads=heads), (q, k, v)


def _gsa_bwd(heads, res, g):
    # pallas_call has no derived VJP; differentiate the mathematically
    # identical XLA oracle instead so jax.grad through the twins GSA
    # blocks works on TPU (advisor finding r2)
    q, k, v = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: gsa_attention_ref(q_, k_, v_, heads=heads),
        q, k, v)
    return vjp(g)


_gsa_tpu.defvjp(_gsa_fwd, _gsa_bwd)


def gsa_attention(q, k, v, *, heads):
    """Dispatch: Pallas on TPU (XLA-oracle VJP), XLA elsewhere."""
    if jax.default_backend() == "tpu":
        return _gsa_tpu(q, k, v, heads)
    return gsa_attention_ref(q, k, v, heads=heads)
