"""Neighborhood-attention vertical layer (optional cost-encoder variant).

Rebuild of the reference's NATTEN-backed vertical attention
(reference: core/FlowFormer/PerCostFormer3/NA.py:64-127,
selfattentionlayer_nat, gated behind vertical_encoder_attn='NA' at
encoder.py:209-216). The reference JIT-compiles CUDA kernels that are absent
from its repo (SURVEY.md §2.4 item 1); this version runs on the TPU-native
neighborhood attention (stitchax.ops.neighborhood_attention):
context-augmented q/k over an 11x11 shifted window with a learned
relative-position bias, scale 16^-0.5, concat-projection back to the latent
dim, pre-norm ffn.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..ops.neighborhood_attention import neighborhood_attention
from .layers import TokenFfn


class NeighborhoodSelfAttentionLayer(nn.Module):
    """Drop-in alternative to VerticalSelfAttention (NHWC)."""
    cost_latent_dim: int = 128
    vert_c_dim: int = 64
    encoder_latent_dim: int = 256
    attn_dim: int = 128
    kernel_size: int = 11
    expand_factor: int = 4

    @nn.compact
    def __call__(self, x, context):
        # x: (B*K, H1, W1, D); context: (B, H1, W1, 256)
        Bk, H, W, D = x.shape
        heads = self.attn_dim // 16
        short_cut = x

        ctx = nn.LayerNorm(epsilon=1e-5, name="context_norm")(context)
        ctx = nn.Dense(self.vert_c_dim, name="context_proj")(ctx)
        ctx = jnp.repeat(ctx, Bk // ctx.shape[0], axis=0)

        qk = nn.LayerNorm(epsilon=1e-5, name="norm1")(
            jnp.concatenate([x, ctx], -1))
        v_in = nn.LayerNorm(epsilon=1e-5, name="norm1_v")(x)

        q = nn.Dense(self.attn_dim, name="q")(qk) * (16 ** -0.5)
        k = nn.Dense(self.attn_dim, name="k")(qk)
        v = nn.Dense(self.attn_dim, name="v")(v_in)
        to_heads = lambda t: t.reshape(Bk, H, W, heads, 16)
        rpb = self.param("rpb", nn.initializers.zeros,
                         (heads, 2 * self.kernel_size - 1,
                          2 * self.kernel_size - 1))
        # q pre-scaled like the reference; neutralize the helper's own scale
        out = neighborhood_attention(to_heads(q) * (16 ** 0.5), to_heads(k),
                                     to_heads(v), rpb, self.kernel_size)
        out = out.reshape(Bk, H, W, self.attn_dim)

        x = nn.Dense(self.cost_latent_dim, name="proj")(
            jnp.concatenate([out, short_cut], -1))
        x = short_cut + x
        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = nn.Dense(self.cost_latent_dim * self.expand_factor, name="ffn_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.cost_latent_dim, name="ffn_fc2")(y)
        return x + y
