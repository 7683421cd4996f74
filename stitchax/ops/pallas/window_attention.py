"""Fused windowed multi-head attention Pallas kernel (twins LSA core).

The cost encoder's vertical attention runs a 7x7-window LSA block on
(B*K, H1, W1, 128) latents (reference: core/FlowFormer/PerCostFormer3/
twins.py:229-304, encoder.py:99-125). The XLA lowering of that block is
layout-bound, not compute-bound: pad-to-ws-multiple, a 6D window-partition
transpose on three streams, then 49-token/16-head-dim batched matmuls that
use ~2% of an MXU pass each — measured ~12 ms per block at (8, 64, 64, 128)
on v5e vs ~0.2 ms of actual math.

This kernel keeps the plain NHWC layout in HBM and does the window
restructuring in VMEM, one window-row strip per program:

  * The q/k/v projections stay in XLA (large MXU matmuls over the unpadded
    image — XLA's strength). The kernel receives the *bias-free* projected
    streams zero-padded to window multiples.
  * The reference adds the window-local sine RPE to the q/k inputs BEFORE
    the projections and zero-pads the token map, so a padded token's
    projections are exactly q = W_q·enc + b_q, k = W_k·enc + b_k, v = b_v.
    Adding per-window-position biases (q_bias = W_q·enc + b_q, etc.) inside
    the kernel therefore reproduces the padded-window semantics exactly —
    no masks needed, matching timm/reference behavior of attending to
    padded tokens.
  * Heads (d = C/heads = 16) are too thin for the MXU as batched
    (T, 16)x(16, T) matmuls. Instead each head's q/v are channel-masked
    copies of the full-width row block, so logits and outputs become two
    (heads, T, C)-batched full-width dot_generals; disjoint masks make the
    head sum exact. 8x redundant FLOPs, but the FLOPs are ~free and every
    matmul is MXU-shaped.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(qx_ref, kx_ref, vx_ref, qb_ref, kb_ref, vb_ref, out_ref, *,
            ws: int, heads: int, n_win: int, n_strips: int = 1,
            win_block: int = 1):
    """One program covers `n_strips` window rows of `n_win` windows each,
    batching `win_block` adjacent windows into each pair of fused matmuls
    (the (h·T, C)x(C, T) shapes at T=49 leave most of the MXU pass idle —
    stacking W windows along the contraction's free rows amortizes it).
    All slices are static: the earlier fori_loop + pl.ds variant failed
    Mosaic's 8-sublane alignment proof at ws=7 offsets; a statically
    unrolled slice compiles (this file's r2 history)."""
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
            # (ws, W*ws, C) -> (W, T, C)
            def win(ref, bias):
                t = ref[0, rows, cols, :].astype(jnp.float32)
                t = t.reshape(ws, W, ws, C).transpose(1, 0, 2, 3)
                return t.reshape(W, T, C) + bias[None]

            q = win(qx_ref, qb)
            k = win(kx_ref, kb)
            v = win(vx_ref, vb)

            qs = q[None] * hmask * scale           # (h, W, T, C)
            qs = qs.reshape(heads * W, T, C)
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


def window_attention_pallas(qx: jnp.ndarray, kx: jnp.ndarray, vx: jnp.ndarray,
                            q_bias: jnp.ndarray, k_bias: jnp.ndarray,
                            v_bias: jnp.ndarray, *, heads: int, ws: int,
                            block_strips: int = 1, win_block: int = 1,
                            interpret: bool = False) -> jnp.ndarray:
    """Windowed MHA over (B, H, W, C) bias-free projected streams.

    qx/kx/vx: W_q·x_qk / W_k·x_qk / W_v·x WITHOUT the dense biases.
    q_bias/k_bias: (ws*ws, C) = Dense(enc) per window position (incl. bias).
    v_bias: (C,) dense v bias.
    block_strips: window rows per program (amortizes per-program overhead);
    win_block: adjacent windows batched into each fused matmul pair.
    Returns the (B, H, W, C) pre-proj attention output.
    """
    B, H, W, C = qx.shape
    ph = (ws - H % ws) % ws
    pw = (ws - W % ws) % ws
    if ph or pw:
        pad = ((0, 0), (0, ph), (0, pw), (0, 0))
        qx = jnp.pad(qx, pad)
        kx = jnp.pad(kx, pad)
        vx = jnp.pad(vx, pad)
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


def window_attention_ref(qx, kx, vx, q_bias, k_bias, v_bias, *, heads, ws):
    """Pure-XLA oracle with identical semantics (window partition form)."""
    B, H, W, C = qx.shape
    ph, pw = (ws - H % ws) % ws, (ws - W % ws) % ws
    pad = ((0, 0), (0, ph), (0, pw), (0, 0))
    qx, kx, vx = (jnp.pad(t, pad) for t in (qx, kx, vx))
    Hp, Wp = H + ph, W + pw
    T = ws * ws

    def part(t):  # (B, Hp, Wp, C) -> (B, nW, T, C)
        t = t.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
        return t.transpose(0, 1, 3, 2, 4, 5).reshape(B, -1, T, C)

    q = part(qx) + q_bias.reshape(1, 1, T, C)
    k = part(kx) + k_bias.reshape(1, 1, T, C)
    v = part(vx) + v_bias.reshape(1, 1, 1, C)
    d = C // heads

    def split(t):
        return t.reshape(B, -1, T, heads, d).transpose(0, 1, 3, 2, 4)

    qh, kh, vh = split(q), split(k), split(v)
    attn = jax.nn.softmax(
        jnp.einsum("bnhid,bnhjd->bnhij", qh, kh) * d ** -0.5, -1)
    o = jnp.einsum("bnhij,bnhjd->bnhid", attn, vh)
    o = o.transpose(0, 1, 3, 2, 4).reshape(B, -1, T, C)
    o = o.reshape(B, Hp // ws, Wp // ws, ws, ws, C)
    o = o.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
    return o[:, :H, :W]
