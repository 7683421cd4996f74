"""Windowed multi-head attention for the twins LSA blocks (pure XLA).

Two formulations with identical semantics (reference: timm twins
LocallyGroupedAttn / twins.py:229-304 RPE-context variant — window
partition, per-window MHA, merge):

* `window_attention_split` — the head-split einsum: batched matmuls of
  (T, d=16) x (d, T) per (window, head). Thin K=16 contractions.
* `window_attention_headstack` — heads stacked along the token axis with
  per-head channel masks: ONE (h*T, C) x (C, T) matmul pair per window.
  4x redundant FLOPs (each head contracts all C=128 channels) but dense
  MXU shapes; wins when the thin form is dispatch/utilization-bound.

The Pallas strip kernel lost to both at the production shape
(tools/exp_window_attn.py: 16.1 ms vs 12.9/~8 ms XLA at
(64, 64, 64, 128) bf16) and was retired from the product tree — the
kernel + measurements live in tools/exp_window_attn.py.

Inputs are bias-free projected streams: qx/kx/vx = W·x without the dense
biases; q_bias/k_bias (ws*ws, C) fold the RPE/positional embedding plus
dense bias per window position; v_bias (1, C). Zero-padded border tokens
thereby reduce exactly to the biases (the reference pads BEFORE the
projection), so no masks are needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pad_part(qx, kx, vx, ws):
    B, H, W, C = qx.shape
    ph, pw = (ws - H % ws) % ws, (ws - W % ws) % ws
    pad = ((0, 0), (0, ph), (0, pw), (0, 0))
    qx, kx, vx = (jnp.pad(t, pad) for t in (qx, kx, vx))
    Hp, Wp = H + ph, W + pw

    def part(t):  # (B, Hp, Wp, C) -> (B, nW, T, C)
        t = t.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
        return t.transpose(0, 1, 3, 2, 4, 5).reshape(B, -1, ws * ws, C)

    return part(qx), part(kx), part(vx), (Hp, Wp)


def _merge(o, B, Hp, Wp, ws, H, W, C):
    o = o.reshape(B, Hp // ws, Wp // ws, ws, ws, C)
    o = o.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
    return o[:, :H, :W]


def window_attention_split(qx, kx, vx, q_bias, k_bias, v_bias, *, heads, ws):
    """Head-split batched-einsum formulation (thin K = C/heads)."""
    B, H, W, C = qx.shape
    T = ws * ws
    q, k, v, (Hp, Wp) = _pad_part(qx, kx, vx, ws)
    q = q + q_bias.reshape(1, 1, T, C)
    k = k + k_bias.reshape(1, 1, T, C)
    v = v + v_bias.reshape(1, 1, 1, C)
    d = C // heads

    def split(t):
        return t.reshape(B, -1, T, heads, d).transpose(0, 1, 3, 2, 4)

    qh, kh, vh = split(q), split(k), split(v)
    attn = jax.nn.softmax(
        jnp.einsum("bnhid,bnhjd->bnhij", qh, kh) * d ** -0.5, -1)
    o = jnp.einsum("bnhij,bnhjd->bnhid", attn, vh)
    o = o.transpose(0, 1, 3, 2, 4).reshape(B, -1, T, C)
    return _merge(o, B, Hp, Wp, ws, H, W, C)


def window_attention_headstack(qx, kx, vx, q_bias, k_bias, v_bias, *,
                               heads, ws):
    """Head-stack formulation: per-head channel masks on q and v turn the
    (window, head) batched thin matmuls into one dense (h*T, C) x (C, T)
    pair per window."""
    B, H, W, C = qx.shape
    T = ws * ws
    d = C // heads
    q, k, v, (Hp, Wp) = _pad_part(qx, kx, vx, ws)
    q = q + q_bias.reshape(1, 1, T, C)
    k = k + k_bias.reshape(1, 1, T, C)
    v = v + v_bias.reshape(1, 1, 1, C)
    nW = q.shape[1]

    ch = jax.lax.broadcasted_iota(jnp.int32, (heads, 1, C), 2)
    hid = jax.lax.broadcasted_iota(jnp.int32, (heads, 1, C), 0)
    hmask = (ch // d == hid).astype(q.dtype)       # (h, 1, C)

    # (B, nW, h, T, C): head h keeps only its channel slice of q
    qs = q[:, :, None] * hmask[None, None] * (d ** -0.5)
    qs = qs.reshape(B, nW, heads * T, C)
    logits = jnp.einsum("bnxc,bnjc->bnxj", qs, k)   # (B, nW, h*T, T)
    attn = jax.nn.softmax(logits, -1)
    # head h's output only keeps its own channel slice -> mask per head
    # and sum over heads to merge the disjoint slices
    o = jnp.einsum("bnxj,bnjc->bnxc", attn, v).reshape(B, nW, heads, T, C)
    o = jnp.sum(o * hmask[None, None], axis=2)  # (1,1,h,1,C) mask + merge
    return _merge(o, B, Hp, Wp, ws, H, W, C)


# production default: chosen by measurement on v5e at the bench operating
# point (tools/exp_window_attn.py)
window_attention = window_attention_split
