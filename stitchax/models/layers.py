"""Shared Flax building blocks for the stitchax model zoo.

Token layout is (B, N, C); image layout NHWC. Position encodings follow the
reference's LinearPositionEmbeddingSine exactly
(reference: core/FlowFormer/PerCostFormer3/attention.py:156-161).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def linear_position_embedding_sine(x: jnp.ndarray, dim: int = 128,
                                   normalize_factor: float = 1.0 / 200) -> jnp.ndarray:
    """x: (..., 2) coordinates -> (..., dim) sin/cos features.

    Reference: core/FlowFormer/PerCostFormer3/attention.py:156-161 (note the
    3.14 literal, kept for weight-level parity).
    """
    freqs = jnp.linspace(0.0, dim // 4 - 1, dim // 4, dtype=x.dtype)
    fx = 3.14 * x[..., -2:-1] * freqs * normalize_factor
    fy = 3.14 * x[..., -1:] * freqs * normalize_factor
    return jnp.concatenate(
        [jnp.sin(fx), jnp.cos(fx), jnp.sin(fy), jnp.cos(fy)], axis=-1)


def exp_position_embedding_sine(x: jnp.ndarray, dim: int = 128,
                                normalize_factor: float = 1.0 / 200) -> jnp.ndarray:
    """Reference: core/FlowFormer/PerCostFormer3/attention.py:163-167."""
    freqs = jnp.linspace(0.0, dim // 4 - 1, dim // 4, dtype=x.dtype)
    s = normalize_factor * 2.0 ** freqs
    fx = x[..., -2:-1] * s
    fy = x[..., -1:] * s
    return jnp.concatenate(
        [jnp.sin(fx), jnp.cos(fx), jnp.sin(fy), jnp.cos(fy)], axis=-1)


def tiny_token_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         heads: int) -> jnp.ndarray:
    """multi_head_attention math lowered as broadcast-multiply + reduce.

    For tiny token counts on huge batches (the perceiver's K=8 latents over
    32768 per-pixel batches), the einsum form lowers to per-batch
    (T,16)x(16,T) MXU dispatches that strand the systolic array; putting the
    d=16 contraction on the VPU instead runs 12.8 -> 4.8 ms for latent
    self-attention and 21 -> 14 ms for the 8->64 input cross-attention at
    the bench operating point (tools/exp_tiny_attn.py). Bit-for-bit the
    same math up to float reassociation."""
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


def stacked_token_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                            heads: int) -> jnp.ndarray:
    """multi_head_attention math with thin heads lifted to full channel
    width: each head's queries become a channel-masked copy of the
    full-width rows, so logits and outputs are two (h·Tq, C)-vs-(Tk, C)
    batched matmuls with a 128-wide MXU contraction, and the disjoint
    masks make the head fold exact. Wins over the VPU mult-reduce form
    once Tk is large enough to dominate the elementwise product (measured
    at the perceiver input layer, Tq=8 Tk=64: 14.6 -> 9.5 ms,
    tools/exp_cross_attn.py)."""
    P, Tq, C = q.shape
    Tk = k.shape[1]
    d = C // heads
    scale = d ** -0.5
    ch = jax.lax.broadcasted_iota(jnp.int32, (heads, 1, C), 2)
    hid = jax.lax.broadcasted_iota(jnp.int32, (heads, 1, C), 0)
    hmask = (ch // d == hid).astype(q.dtype)       # (h, 1, C)
    qs = (q[:, None] * hmask[None]).reshape(P, heads * Tq, C) * scale
    logits = jax.lax.dot_general(
        qs, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)        # (P, h·Tq, Tk)
    attn = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out_stack = jax.lax.dot_general(
        attn, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)        # (P, h·Tq, C)
    hm4 = hmask.reshape(1, heads, 1, C).astype(jnp.float32)
    out = (out_stack.reshape(P, heads, Tq, C) * hm4).sum(1)
    return out.astype(q.dtype)


def multi_head_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         heads: int) -> jnp.ndarray:
    """Plain softmax attention on (B, N, C) tokens with the reference's scale
    convention: scale = (dim/heads)^-0.5 applied to the logits
    (reference: core/FlowFormer/PerCostFormer3/attention.py:43-68)."""
    B, Nq, C = q.shape
    d = C // heads
    scale = d ** -0.5
    qh = q.reshape(B, Nq, heads, d).transpose(0, 2, 1, 3)
    kh = k.reshape(B, k.shape[1], heads, d).transpose(0, 2, 1, 3)
    vh = v.reshape(B, v.shape[1], heads, d).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhid,bhjd->bhij", qh, kh) * scale
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhij,bhjd->bhid", attn, vh)
    return out.transpose(0, 2, 1, 3).reshape(B, Nq, C)


class Mlp(nn.Module):
    """Transformer MLP: fc1 -> GELU -> fc2 (timm Mlp parity)."""
    hidden_dim: int
    out_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        out_dim = self.out_dim or x.shape[-1]
        x = nn.Dense(self.hidden_dim, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(out_dim, name="fc2")(x)
        return x


class TokenFfn(nn.Module):
    """The reference's dense->GELU->dense ffn used in its attention layers
    (e.g. core/FlowFormer/PerCostFormer3/encoder.py:148-154); hidden == dim."""
    dim: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, name="fc2")(x)
        return x


class Conv(nn.Module):
    """2D conv over NHWC with torch-style explicit padding."""
    features: int
    kernel: tuple
    stride: tuple = (1, 1)
    padding: tuple | str = "SAME"
    use_bias: bool = True
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, tuple):
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        return nn.Conv(self.features, self.kernel, strides=self.stride,
                       padding=pad, use_bias=self.use_bias,
                       feature_group_count=self.groups, name="conv")(x)


def window_partition(x: jnp.ndarray, ws: int):
    """(B, H, W, C) -> (B, nH*nW, ws*ws, C); H, W must divide ws (pad first)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, (H // ws) * (W // ws), ws * ws, C)


def window_merge(x: jnp.ndarray, ws: int, H: int, W: int):
    """Inverse of window_partition."""
    B = x.shape[0]
    C = x.shape[-1]
    x = x.reshape(B, H // ws, W // ws, ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


def pad_to_multiple(x: jnp.ndarray, m: int):
    """Pad (B, H, W, C) bottom/right to multiples of m; returns (x, (H, W))."""
    B, H, W, C = x.shape
    ph = (m - H % m) % m
    pw = (m - W % m) % m
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    return x, (H, W)
