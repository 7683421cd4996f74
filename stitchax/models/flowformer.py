"""FlowFormer++ (PerCostFormer3) optical-flow estimator in Flax.

TPU-native rebuild of the reference architecture
(reference: core/FlowFormer/PerCostFormer3/{transformer,encoder,decoder,
gru,gma,attention,crossattentionlayer}.py) with the shipped config
(configs/last_config.py `percostformer3`): twins cnet/fnet, cost_heads 1,
latent 8x128 tokens, encoder_depth 3 with twins vertical attention
(vert_c_dim 64), decoder_depth 12 with GMA, linear sine position encoding,
cross_attn='all', flow_or_pe='and'.

Pipeline: context encoder on img1 -> all-pairs cost volume from twins
features -> CostPerceiverEncoder compresses each source pixel's cost map to
K latent tokens -> MemoryDecoder runs RAFT-style recurrent refinement with
9x9 local cost lookups + cross-attention into the latent memory.

The decoder loop is a lax.scan over iterations (static depth) so the whole
model traces once; inputs are NHWC in [0, 255].
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.flow import convex_upsample_flow_b
from ..ops.grid import coords_grid
from ..ops.sampling import bilinear_sampler
from .layers import (Mlp, TokenFfn, linear_position_embedding_sine,
                     multi_head_attention, pad_to_multiple,
                     stacked_token_attention, tiny_token_attention)
from .twins import TwinsBlockRPEContext, TwinsSVT


@dataclass(frozen=True)
class FlowFormerConfig:
    """Shipped percostformer3 hyperparameters (configs/last_config.py)."""
    cost_heads_num: int = 1
    cost_latent_input_dim: int = 64
    cost_latent_token_num: int = 8
    cost_latent_dim: int = 128
    encoder_latent_dim: int = 256   # twins stage-2 channels
    query_latent_dim: int = 64
    encoder_depth: int = 3
    decoder_depth: int = 12
    patch_size: int = 8
    vert_c_dim: int = 64
    gma: str = "GMA"
    cost_encoder_res: bool = True
    flow_or_pe: str = "and"
    use_rpe: bool = False
    lookup_radius: int = 4
    vertical_encoder_attn: str = "twins"   # 'twins' | 'NA' (reference NA.py)
    # MAE pretrain hyperparameters (reference: configs/last_config.py
    # percostformer3.{mask_ratio,gt_r,query_num,no_border}; pic_size
    # offsets are 0 in the shipped [368,496,368,496] config)
    mask_ratio: float = 0.5
    gt_r: int = 15
    query_num: int = 30
    no_border: bool = True
    H_offset: int = 0
    W_offset: int = 0
    # lax.scan unroll factor for the decoder iteration loop: >1 lets XLA
    # schedule/fuse across iteration boundaries (fewer, bigger program
    # regions — the round-3 campaign's "fewer/bigger ops" lever) at the
    # cost of code size. Semantics identical for any value.
    scan_unroll: int = 1
    # Training needs all 12 convex-upsampled predictions (sequence loss);
    # inference consumes only the last, but the upsample sits inside the
    # scan where XLA cannot dead-code a per-iteration slice — False moves
    # the single upsample after the loop (reference semantics unchanged:
    # its intermediate predictions are unused at test time).
    upsample_all: bool = True


class CostMapPatchEmbed(nn.Module):
    """Patch-embed each source pixel's (H2, W2) cost map with a 3-conv stride-8
    stack, then append a linear sine embedding of patch-center coordinates and
    mix with a 1x1 ffn (reference: encoder.py:20-95, patch_embed='single')."""
    cfg: FlowFormerConfig

    @nn.compact
    def __call__(self, cost_maps, masks=None):  # (B*, H2, W2, heads)
        dim = self.cfg.cost_latent_input_dim
        p = self.cfg.patch_size
        # right/bottom pad to a patch multiple (reference: encoder.py:63-66)
        x, _ = pad_to_multiple(cost_maps, p)
        # kernel 6 stride 2 pad 2 three times (patch_size 8); a
        # polyphase (space-to-depth + 3x3) reformulation was measured
        # SLOWER here (29.8 -> 40.2 ms at the bench shape): the s2d
        # materialization outweighs the 4x-wider contraction
        for i, d in enumerate([dim // 4, dim // 2, dim]):
            # MAE pretrain zeroes masked tokens before each conv
            # (reference: encoder.py:68-73)
            if masks is not None and masks[i] is not None:
                x = x * (1.0 - masks[i])
            x = nn.Conv(d, (6, 6), strides=(2, 2), padding=((2, 2), (2, 2)),
                        name=f"proj{i}")(x)
            if i < 2:
                x = nn.relu(x)
        Bs, H3, W3, _ = x.shape
        # patch-center coordinates in input space
        grid = coords_grid(H3, W3, dtype=x.dtype) * self.cfg.patch_size + self.cfg.patch_size / 2
        enc = linear_position_embedding_sine(grid, dim=64)
        x = jnp.concatenate([x, jnp.broadcast_to(enc[None], (Bs, H3, W3, 64))], -1)
        x = nn.Conv(dim + 64, (1, 1), name="ffn1")(x)
        x = nn.relu(x)
        x = nn.Conv(dim + 64, (1, 1), name="ffn2")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x.reshape(Bs, H3 * W3, dim + 64))
        return x, (H3, W3)


class LatentCrossAttention(nn.Module):
    """Latent tokens cross-attend to cost patches (cross_attn='all';
    reference: crossattentionlayer.py:7-56). `ids_keep` gathers the
    unmasked target tokens first (MAE pretrain path,
    crossattentionlayer.py:42-43)."""
    cfg: FlowFormerConfig

    @nn.compact
    def __call__(self, latent, tgt, ids_keep=None):
        # latent (1, K, D) or (B, K, D); tgt (B, N, Dt)
        D = self.cfg.cost_latent_dim
        if ids_keep is not None:
            tgt = jnp.take_along_axis(tgt, ids_keep[..., None], axis=1)
        short_cut = latent
        q_in = nn.LayerNorm(epsilon=1e-5, name="norm1")(latent)
        q = nn.Dense(D, name="q")(q_in)
        k = nn.Dense(D, name="k")(tgt)
        v = nn.Dense(D, name="v")(tgt)
        if q.shape[0] == 1 and tgt.shape[0] != 1:
            q = jnp.broadcast_to(q, (tgt.shape[0],) + q.shape[1:])
        # Tk=64 patches: the head-stack matmul form wins over the VPU
        # mult-reduce here (tools/exp_cross_attn.py)
        x = stacked_token_attention(q, k, v, heads=8)
        x = nn.Dense(D, name="proj")(x)
        x = short_cut + x
        x = x + TokenFfn(D, name="ffn")(nn.LayerNorm(epsilon=1e-5, name="norm2")(x))
        return x


class LatentSelfAttention(nn.Module):
    """Per-source-pixel self-attention over the K latent tokens
    (reference: encoder.py:127-172)."""
    cfg: FlowFormerConfig

    @nn.compact
    def __call__(self, x):  # (B*, K, D)
        D = self.cfg.cost_latent_dim
        short_cut = x
        y = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        q = nn.Dense(D, name="q")(y)
        k = nn.Dense(D, name="k")(y)
        v = nn.Dense(D, name="v")(y)
        y = tiny_token_attention(q, k, v, heads=8)
        y = nn.Dense(D, name="proj")(y)
        x = short_cut + y
        x = x + TokenFfn(D, name="ffn")(nn.LayerNorm(epsilon=1e-5, name="norm2")(x))
        return x


class VerticalSelfAttention(nn.Module):
    """Attention across the H1 x W1 source-pixel grid per latent slot:
    twins local (ws=7) + global (sr=4) RPE-context blocks
    (reference: encoder.py:99-125)."""
    cfg: FlowFormerConfig

    @nn.compact
    def __call__(self, x, context):  # x (B*K, H1, W1, D); context (B, H1, W1, 256)
        c = self.cfg
        K = c.cost_latent_token_num
        # pass the unrepeated context: the blocks project it at B and
        # broadcast the small 64-ch result to B*K themselves
        x = TwinsBlockRPEContext(c.cost_latent_dim, 8, ws=7, sr_ratio=4,
                                 vert_c_dim=c.vert_c_dim,
                                 name="local_block")(x, context)
        x = TwinsBlockRPEContext(c.cost_latent_dim, 8, ws=1, sr_ratio=4,
                                 vert_c_dim=c.vert_c_dim,
                                 name="global_block")(x, context)
        return x


def random_masking(noise, H2: int, W2: int, patch_size: int,
                   mask_ratio: float):
    """MAE cost-map masking (reference: encoder.py:218-256).

    noise: (B, L) uniform scores, L = (H2p//8)*(W2p//8) with H2p/W2p the
    patch-padded cost-map dims — injected instead of drawn internally so
    the path is deterministic under jit (the reference accepts the same
    injection via its `mask` argument).
    Returns (ids_keep (B, len_keep), mask_for_keys (B, L),
    [mask1 (B, H2p, W2p, 1), mask2 (/2), mask3 (/4)]) with 1 = masked.
    """
    Hp = H2 + (-H2) % patch_size
    Wp = W2 + (-W2) % patch_size
    hd, wd = Hp // 8, Wp // 8
    L = hd * wd
    assert noise.shape[-1] == L, (noise.shape, L)
    len_keep = int(L * (1 - mask_ratio))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    ids_keep = ids_shuffle[:, :len_keep]
    mask = jnp.ones_like(noise).at[:, :len_keep].set(0.0)
    mask_for_keys = jnp.take_along_axis(mask, ids_restore, axis=1)

    def up(f):  # nearest f-times upsample of the (hd, wd) key mask
        m = mask_for_keys.reshape(-1, hd, wd)
        m = jnp.repeat(jnp.repeat(m, f, axis=1), f, axis=2)
        return m[..., None]

    return ids_keep, mask_for_keys, [up(8), up(4), up(2)]


class CostPerceiverEncoder(nn.Module):
    """Compress each source pixel's cost map into K latent tokens, then
    alternate latent self-attention with vertical (spatial) attention
    (reference: encoder.py:174-287). setup-style so the MAE `pretrain`
    forward (encoder.py:289-326) shares every submodule."""
    cfg: FlowFormerConfig

    def setup(self):
        c = self.cfg
        self.patch_embed = CostMapPatchEmbed(c, name="patch_embed")
        self.input_layer = LatentCrossAttention(c, name="input_layer")
        self.latent_tokens = self.param(
            "latent_tokens", nn.initializers.normal(1.0),
            (1, c.cost_latent_token_num, c.cost_latent_dim))
        self.encoder_layers = [
            LatentSelfAttention(c, name=f"encoder_layer{i}")
            for i in range(c.encoder_depth)]
        if c.vertical_encoder_attn == "NA":
            from .na_layer import NeighborhoodSelfAttentionLayer
            self.vertical_layers = [
                NeighborhoodSelfAttentionLayer(
                    c.cost_latent_dim, c.vert_c_dim, c.encoder_latent_dim,
                    name=f"vertical_layer{i}")
                for i in range(c.encoder_depth)]
        else:
            self.vertical_layers = [
                VerticalSelfAttention(c, name=f"vertical_layer{i}")
                for i in range(c.encoder_depth)]

    def _encode(self, cm, context, B, H1, W1, ids_keep=None, masks=None):
        """Shared body of forward and pretrain: patch embed (optionally
        masked) -> latent cross-attn (optionally gathered) -> depth x
        (self-attn + vertical attn) -> residual."""
        c = self.cfg
        K, D = c.cost_latent_token_num, c.cost_latent_dim
        x, (H3, W3) = self.patch_embed(cm, masks)
        cost_patches = x  # (B*H1*W1, H3*W3, input_dim+64)

        x = self.input_layer(self.latent_tokens, cost_patches,
                             ids_keep=ids_keep)

        short_cut = x
        for idx in range(c.encoder_depth):
            x = self.encoder_layers[idx](x)
            # (B*H1W1, K, D) -> (B*K, H1, W1, D)
            x = x.reshape(B, H1 * W1, K, D).transpose(0, 2, 1, 3)
            x = x.reshape(B * K, H1, W1, D)
            x = self.vertical_layers[idx](x, context)
            x = x.reshape(B, K, H1 * W1, D).transpose(0, 2, 1, 3)
            x = x.reshape(B * H1 * W1, K, D)
        if c.cost_encoder_res:
            x = x + short_cut

        cost_patches = cost_patches.reshape(B * H1 * W1, H3, W3, -1)
        return x, cost_patches, (H3, W3)

    def __call__(self, cost_maps, context):
        # cost_maps: (B, H1, W1, H2, W2, heads); context: (B, H1, W1, 256)
        B, H1, W1, H2, W2, heads = cost_maps.shape
        cm = cost_maps.reshape(B * H1 * W1, H2, W2, heads)
        return self._encode(cm, context, B, H1, W1)

    def pretrain(self, cost_volume_inner, context, noise):
        """MAE pretrain forward (reference: encoder.py:289-326): mask the
        INNER cost maps before embedding, cross-attend only to kept
        patches. noise: (B*H1*W1, L)."""
        c = self.cfg
        B, H1, W1, H2, W2, heads = cost_volume_inner.shape
        cm = cost_volume_inner.reshape(B * H1 * W1, H2, W2, heads)
        ids_keep, _, masks = random_masking(noise, H2, W2, c.patch_size,
                                            c.mask_ratio)
        return self._encode(cm, context, B, H1, W1,
                            ids_keep=ids_keep, masks=masks)


class MemoryEncoder(nn.Module):
    """Twins features on both images -> all-pairs cost volume -> perceiver
    (reference: encoder.py:328-410). The correlation einsum is the MXU hot
    spot; computed in the param dtype with fp32 accumulation.

    setup-style so `bidirectional` can share the feature extraction and
    compute the backward cost volume as the transpose of the forward one
    (corr_bwd[j, i] == corr_fwd[i, j]) — two of the four twins passes and
    one of the two all-pairs einsums per fwd+bwd pair drop out."""
    cfg: FlowFormerConfig

    def setup(self):
        self.feat_encoder = TwinsSVT()
        self.cost_perceiver = CostPerceiverEncoder(self.cfg)

    def _cost_volume(self, feat_s, feat_t):
        c = self.cfg
        B, H1, W1, Cdim = feat_s.shape
        heads = c.cost_heads_num
        d = Cdim // heads
        fs = feat_s.reshape(B, H1 * W1, heads, d).transpose(0, 2, 1, 3)
        ft = feat_t.reshape(B, H1 * W1, heads, d).transpose(0, 2, 1, 3)
        corr = jnp.einsum("bhid,bhjd->bhij", fs, ft,
                          preferred_element_type=jnp.float32)
        cost_volume = corr.reshape(B, heads, H1, W1, H1, W1)
        cost_volume = cost_volume.transpose(0, 2, 3, 4, 5, 1)
        return cost_volume.astype(feat_s.dtype)  # (B, H1, W1, H2, W2, heads)

    def __call__(self, img1, img2, context):
        feat_s, _ = self.feat_encoder(img1)  # (B, H1, W1, 256)
        feat_t, _ = self.feat_encoder(img2)
        cost_volume = self._cost_volume(feat_s, feat_t)
        x, cost_patches, h3w3 = self.cost_perceiver(cost_volume, context)
        return x, cost_patches, cost_volume, h3w3

    def pretrain(self, img1, img2, img1_inner, img2_inner, context, noise):
        """MAE pretrain forward (reference: encoder.py:412-428,
        crop_cost_volume=False): outer volume = corr(inner img1 feats,
        FULL img2 feats); inner volume = corr of the two inner feats; the
        perceiver embeds the masked INNER volume. Returns
        (latent memory, cost_volume_outer, cost_volume_inner)."""
        feat_t, _ = self.feat_encoder(img2)
        feat_s_inner, _ = self.feat_encoder(img1_inner)
        feat_t_inner, _ = self.feat_encoder(img2_inner)
        cv_outer = self._cost_volume(feat_s_inner, feat_t)
        cv_inner = self._cost_volume(feat_s_inner, feat_t_inner)
        x, _, _ = self.cost_perceiver.pretrain(cv_inner, context, noise)
        return x, cv_outer, cv_inner

    def bidirectional(self, img1, img2, ctx1, ctx2):
        feat_s, _ = self.feat_encoder(img1)
        feat_t, _ = self.feat_encoder(img2)
        cost_fwd = self._cost_volume(feat_s, feat_t)
        # backward cost volume is the exact transpose of the forward one
        cost_bwd = cost_fwd.transpose(0, 3, 4, 1, 2, 5)
        # both directions ride ONE batched perceiver call: the layer stack is
        # op-count/latency bound at these tensor sizes, so doubling the batch
        # beats two calls
        cost = jnp.concatenate([cost_fwd, cost_bwd], axis=0)
        ctx = jnp.concatenate([ctx1, ctx2], axis=0)
        x, _, h3w3 = self.cost_perceiver(cost, ctx)
        x_f, x_b = jnp.split(x.reshape(2, -1, *x.shape[1:]), 2, axis=0)
        return ((x_f[0], cost_fwd), (x_b[0], cost_bwd), (ctx, cost, x),
                h3w3)


# --------------------------- decoder ---------------------------------------


class GmaAttention(nn.Module):
    """Self-similarity attention over context features, 1 head
    (reference: gma.py:34-76). The (B, N, N) attention IS materialized —
    the decoder scan reuses it every iteration, and recomputing it
    flash-style per iteration measures 11.79 vs 8.61 ms for the reuse
    (tools/exp_gma.py) — but it is BUILT in query-row chunks so the fp32
    pre-softmax similarity never exists as a full (B, N, N) tensor:
    4.66 -> 3.18 ms one-time at the bench point. Non-multiple-of-1024
    token counts take full 1024-row chunks plus one remainder block
    (never a cascade of tiny chunks)."""
    dim: int = 128
    dim_head: int = 128

    @nn.compact
    def __call__(self, fmap):  # (B, H, W, C)
        B, H, W, C = fmap.shape
        N = H * W
        qk = nn.Conv(self.dim_head * 2, (1, 1), use_bias=False, name="to_qk")(fmap)
        q, k = jnp.split(qk, 2, axis=-1)
        q = (q * (self.dim_head ** -0.5)).reshape(B, N, self.dim_head)
        k = k.reshape(B, N, self.dim_head)

        def rows_softmax(qc):  # (B, rows, d) -> (B, rows, N)
            s = jnp.einsum("bcd,bmd->bcm", qc, k,
                           preferred_element_type=jnp.float32)
            return jax.nn.softmax(s, axis=-1).astype(fmap.dtype)

        chunk = 1024
        if N <= chunk:
            return rows_softmax(q)

        nfull = N // chunk
        qfull = q if N % chunk == 0 else q[:, :nfull * chunk]
        qb = qfull.reshape(B, nfull, chunk, self.dim_head).transpose(1, 0, 2, 3)
        attn = jax.lax.map(rows_softmax, qb)
        attn = attn.transpose(1, 0, 2, 3).reshape(B, nfull * chunk, N)
        if N % chunk:
            attn = jnp.concatenate(
                [attn, rows_softmax(q[:, nfull * chunk:])], axis=1)
        return attn


class GmaAggregate(nn.Module):
    """Attention-weighted aggregation with learned gamma gate
    (reference: gma.py:79-115)."""
    dim: int = 128
    dim_head: int = 128

    @nn.compact
    def __call__(self, attn, fmap):  # attn (B, N, N); fmap (B, H, W, C)
        B, H, W, C = fmap.shape
        v = nn.Conv(self.dim_head, (1, 1), use_bias=False, name="to_v")(fmap)
        v = v.reshape(B, H * W, self.dim_head)
        out = jnp.einsum("bij,bjd->bid", attn, v).reshape(B, H, W, self.dim_head)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return fmap + gamma * out


class BasicMotionEncoder(nn.Module):
    """Correlation + flow -> 128-d motion features (reference: gru.py:231-254)."""
    cfg: FlowFormerConfig

    @nn.compact
    def __call__(self, flow, corr):  # NHWC
        cor = nn.relu(nn.Conv(256, (1, 1), name="convc1")(corr))
        cor = nn.relu(nn.Conv(192, (3, 3), padding="SAME", name="convc2")(cor))
        flo = nn.relu(nn.Conv(128, (7, 7), padding="SAME", name="convf1")(flow))
        flo = nn.relu(nn.Conv(64, (3, 3), padding="SAME", name="convf2")(flo))
        out = nn.relu(nn.Conv(126, (3, 3), padding="SAME", name="conv")(
            jnp.concatenate([cor, flo], -1)))
        return jnp.concatenate([out, flow], -1)


class _ConvParams(nn.Module):
    """Declares nn.Conv-compatible params ({kernel, bias}, lecun-normal /
    zeros) without owning the computation, so a fused formulation can
    keep the reference-mapped param tree (convz1/... etc.) intact."""
    features: int
    ksize: Tuple[int, int]
    in_features: int

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            self.ksize + (self.in_features, self.features))
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.features,))


def _conv2d(x, kernel, pad):
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class SepConvGRU(nn.Module):
    """1x5 then 5x1 separable ConvGRU (reference: gru.py:32-59).

    TPU formulation: each gate conv over the concat [h, x] (or [r*h, x])
    is decomposed into a conv over the h-part plus a conv over the x-part
    (conv is linear in input channels), and the z/r gates share one fused
    conv — the (B, H, W, 512) concat buffers never materialize inside the
    decoder scan and the fused gate matmul runs at 256 output lanes.
    Param tree is identical to the plain-nn.Conv version (convz1/... with
    (kh, kw, h+x, hidden) kernels), so the reference converter is
    untouched."""
    hidden_dim: int = 128

    @nn.compact
    def __call__(self, h, x):
        hd, xd = h.shape[-1], x.shape[-1]
        for name, ker, pad in (("1", (1, 5), ((0, 0), (2, 2))),
                               ("2", (5, 1), ((2, 2), (0, 0)))):
            pz = _ConvParams(self.hidden_dim, ker, hd + xd,
                             name=f"convz{name}")
            pr = _ConvParams(self.hidden_dim, ker, hd + xd,
                             name=f"convr{name}")
            pq = _ConvParams(self.hidden_dim, ker, hd + xd,
                             name=f"convq{name}")
            # fused z|r over the h-part and the x-part separately
            kzr_h = jnp.concatenate([pz.kernel[:, :, :hd],
                                     pr.kernel[:, :, :hd]], -1)
            kzr_x = jnp.concatenate([pz.kernel[:, :, hd:],
                                     pr.kernel[:, :, hd:]], -1)
            bzr = jnp.concatenate([pz.bias, pr.bias])
            zr = (_conv2d(h, kzr_h, pad) + _conv2d(x, kzr_x, pad)
                  + bzr.astype(h.dtype))
            z = nn.sigmoid(zr[..., :self.hidden_dim])
            r = nn.sigmoid(zr[..., self.hidden_dim:])
            q = jnp.tanh(_conv2d(r * h, pq.kernel[:, :, :hd], pad)
                         + _conv2d(x, pq.kernel[:, :, hd:], pad)
                         + pq.bias.astype(h.dtype))
            h = (1 - z) * h + z * q
        return h


class FlowHead(nn.Module):
    """(reference: gru.py:5-13)."""
    hidden_dim: int = 256

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(self.hidden_dim, (3, 3), padding="SAME", name="conv1")(x))
        return nn.Conv(2, (3, 3), padding="SAME", name="conv2")(x)


class MaskHead(nn.Module):
    """Convex-upsample mask head on the GRU state (reference:
    gru.py:313-318 `self.mask`). Hoisted OUT of the decoder iteration:
    the mask only matters for iterations whose flow is upsampled, so
    inference computes it once on the final net (the reference pays it
    every iteration) and training applies it batched over all iteration
    nets after the scan instead of 12 small convs inside it."""

    @nn.compact
    def __call__(self, net):
        mask = nn.relu(nn.Conv(256, (3, 3), padding="SAME", name="mask1")(net))
        return 0.25 * nn.Conv(64 * 9, (1, 1), name="mask2")(mask)


class GMAUpdateBlock(nn.Module):
    """Motion enc + GMA aggregation -> GRU -> flow head
    (reference: gru.py:307-334; the upsample-mask branch lives in
    MaskHead at the decoder level)."""
    cfg: FlowFormerConfig

    @nn.compact
    def __call__(self, net, inp, corr, flow, attention):
        motion = BasicMotionEncoder(self.cfg, name="encoder")(flow, corr)
        motion_global = GmaAggregate(name="aggregator")(attention, motion)
        inp_cat = jnp.concatenate([inp, motion, motion_global], -1)
        net = SepConvGRU(name="gru")(net, inp_cat)
        delta_flow = FlowHead(name="flow_head")(net)
        return net, delta_flow


class DecoderCrossAttention(nn.Module):
    """Per-pixel query into the latent cost memory, keyed once
    (reference: decoder.py:30-136; flow_or_pe='and', pe='linear')."""
    cfg: FlowFormerConfig

    @nn.compact
    def __call__(self, query, key, value, memory, coord_enc):
        """query (B*, 1, Dq); memory (B*, K, Dm); coord_enc (B*, 1, Dq)."""
        c = self.cfg
        Dq = c.query_latent_dim
        if key is None:
            key = nn.Dense(Dq, name="k")(memory)
            value = nn.Dense(Dq, name="v")(memory)
        short_cut = query
        q_in = nn.LayerNorm(epsilon=1e-5, name="norm1")(query)
        if c.flow_or_pe == "and":
            q = nn.Dense(Dq, name="q")(q_in + coord_enc)
        elif c.flow_or_pe == "pe":
            q = nn.Dense(Dq, name="q")(coord_enc)
        else:
            q = nn.Dense(Dq, name="q")(q_in)
        x = tiny_token_attention(q, key, value, heads=8)
        x = nn.Dense(Dq, name="proj")(x)
        x = short_cut + x
        x = x + TokenFfn(Dq, name="ffn")(nn.LayerNorm(epsilon=1e-5, name="norm2")(x))
        return x, key, value


def encode_flow_token_gather(cost_maps, coords, r: int = 4):
    """Reference formulation: (2r+1)^2 independent bilinear taps via gather.
    Kept as the parity oracle for the windowed version below; inside the
    decoder scan this lowers to a pathologically slow gather (~28 ms/iter
    measured on v5e) and is not used on the hot path."""
    B, H1, W1, H2, W2, heads = cost_maps.shape
    win = 2 * r + 1
    lin = jnp.linspace(-r, r, win, dtype=coords.dtype)
    da, db = jnp.meshgrid(lin, lin, indexing="ij")
    delta = jnp.stack([da, db], -1)  # (win, win, 2): (+x, +y)

    cm = cost_maps.reshape(B * H1 * W1, H2, W2, heads)
    cen = coords.reshape(B * H1 * W1, 1, 1, 2)
    pts = cen + delta[None]  # (B*, win, win, 2)
    corr = jax.vmap(bilinear_sampler)(cm, pts)  # (B*, win, win, heads)
    return corr.reshape(B, H1, W1, win * win * heads)


def _bilinear_selector(center: jnp.ndarray, size: int, r: int) -> jnp.ndarray:
    """Sparse bilinear row-selector S (P, 2r+1, size):
    S[p, t, y] = (1-f)·[y == y0+t] + f·[y == y0+t+1], with y0 = floor(c)-r.
    Out-of-range indices simply never match => exact zeros-OOB semantics.
    """
    win = 2 * r + 1
    y0 = jnp.floor(center) - r                 # (P,)
    f = (center - jnp.floor(center))[:, None, None]
    ys = jax.lax.broadcasted_iota(jnp.float32, (1, 1, size), 2)
    base = y0[:, None, None] + jax.lax.broadcasted_iota(
        jnp.float32, (1, win, 1), 1)           # (P, win, 1)
    return ((ys == base) * (1.0 - f) + (ys == base + 1.0) * f)


def encode_flow_token_rowtake(cost_maps, coords, r: int = 4):
    """Row-gather + VPU vertical lerp + horizontal selector matmul.
    Bit-compatible with encode_flow_token (exact zero OOB semantics, same
    x-major channel order) but reads only the win+1 cost-map rows each
    pixel can touch instead of the full volume — ~6x less HBM traffic
    per decoder iteration. MEASURED SLOWER on v5e (7.27 vs 3.20 ms at
    the bench shape — the row gather costs more than the dense read,
    tools/exp_flow_token.py), so the decoder does not dispatch to it;
    kept parity-tested as the documented record."""
    B, H1, W1, H2, W2, heads = cost_maps.shape
    P = B * H1 * W1
    win = 2 * r + 1
    cm = cost_maps.reshape(P, H2, W2 * heads)
    cen = coords.reshape(P, 2)

    cy = cen[:, 1]
    y0 = jnp.floor(cy).astype(jnp.int32) - r          # first row of window
    t = jnp.arange(win + 1, dtype=jnp.int32)
    idx = y0[:, None] + t[None]                        # (P, win+1)
    valid = (idx >= 0) & (idx < H2)
    rows = jnp.take_along_axis(
        cm, jnp.clip(idx, 0, H2 - 1)[:, :, None], axis=1)  # (P, win+1, W2h)
    rows = rows * valid[:, :, None].astype(cm.dtype)

    fy = (cy - jnp.floor(cy)).astype(jnp.float32)[:, None, None]
    v = ((1.0 - fy) * rows[:, :win].astype(jnp.float32)
         + fy * rows[:, 1:].astype(jnp.float32)).astype(cm.dtype)

    Sx = _bilinear_selector(cen[:, 0], W2, r).astype(cm.dtype)
    v = v.reshape(P, win, W2, heads)
    s = jnp.einsum("pax,ptxh->ptah", Sx, v,
                   preferred_element_type=jnp.float32)
    s = s.transpose(0, 2, 1, 3).astype(coords.dtype)
    return s.reshape(B, H1, W1, win * win * heads)


def encode_flow_token(cost_maps, coords, r: int = 4):
    """Sample a (2r+1)^2 bilinear window of the cost map around per-pixel
    coords (reference: decoder.py:242-260). Channel order is x-major
    (k = a*win + b with a the x offset), matching the reference layout.

    TPU-native formulation: all taps of a pixel share one fractional offset,
    so the whole window is S_y @ map @ S_x^T with sparse bilinear selector
    matrices — two small batched matmuls on the MXU instead of 4·(2r+1)²
    scattered gathers (which lower pathologically inside the decoder scan:
    ~28 ms/iter measured on v5e vs <1 ms for this form).

    cost_maps: (B, H1, W1, H2, W2, heads); coords: (B, H1, W1, 2).
    Returns (B, H1, W1, (2r+1)^2 * heads).
    """
    B, H1, W1, H2, W2, heads = cost_maps.shape
    P = B * H1 * W1
    win = 2 * r + 1
    cm = cost_maps.reshape(P, H2, W2 * heads)

    cen = coords.reshape(P, 2)
    # selectors in the cost-map dtype: the fp32 upcast of the whole cost
    # volume cost ~2 ms/iteration in HBM traffic and halved the MXU rate
    # (the accumulate stays fp32 via preferred_element_type; bilinear
    # weights in bf16 carry ~0.4% error, in line with the bf16 model)
    Sy = _bilinear_selector(cen[:, 1], H2, r).astype(cm.dtype)  # (P, win, H2)
    Sx = _bilinear_selector(cen[:, 0], W2, r).astype(cm.dtype)  # (P, win, W2)

    rows = jnp.einsum("pty,pyx->ptx", Sy, cm,
                      preferred_element_type=jnp.float32).astype(cm.dtype)
    rows = rows.reshape(P, win, W2, heads)
    s = jnp.einsum("pax,ptxh->ptah", Sx, rows,
                   preferred_element_type=jnp.float32)  # (P, win_y, win_x, h)
    # reference channel order is x-major: transpose (y, x) -> (x, y)
    s = s.transpose(0, 2, 1, 3).astype(coords.dtype)
    return s.reshape(B, H1, W1, win * win * heads)


def _lookup_impl() -> str:
    """Cost-lookup formulation: 'selector' (XLA, default), 'pallas'
    (VPU barrel-select kernel; falls back off-TPU), or
    'pallas_interpret' (interpreter mode, for CPU tests)."""
    return os.environ.get("STITCHAX_COST_LOOKUP", "selector")


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def encode_flow_token_t(cm_t, coords, r=4, interpret=False):
    """encode_flow_token on pre-transposed (H2, P, W2) cost maps via the
    Pallas barrel-select kernel (ops/pallas/cost_lookup.py) — the decoder
    hoists the transpose out of its iteration scan. Bit-compatible with
    the selector form; gradients route through the XLA oracle."""
    from ..ops.pallas.cost_lookup import cost_lookup_transposed
    B, H1, W1, _ = coords.shape
    s = cost_lookup_transposed(cm_t, coords.reshape(B * H1 * W1, 2), r=r,
                               interpret=interpret)
    s = s.transpose(0, 2, 1).astype(coords.dtype)   # x-major channel order
    return s.reshape(B, H1, W1, -1)


def _eft_t_oracle(cm_t, coords, r):
    B, H1, W1, _ = coords.shape
    H2, P, W2 = cm_t.shape
    cm = cm_t.transpose(1, 0, 2).reshape(B, H1, W1, H2, W2, 1)
    return encode_flow_token(cm, coords, r=r)


def _eft_t_fwd(cm_t, coords, r, interpret):
    return encode_flow_token_t(cm_t, coords, r, interpret), (cm_t, coords)


def _eft_t_bwd(r, interpret, res, g):
    cm_t, coords = res
    _, vjp = jax.vjp(lambda c_, x_: _eft_t_oracle(c_, x_, r), cm_t, coords)
    return vjp(g)


encode_flow_token_t.defvjp(_eft_t_fwd, _eft_t_bwd)


class DecoderIteration(nn.Module):
    """One recurrent refinement step, shared-weight across iterations
    (reference: decoder.py:262-344 loop body). Structured for nn.scan:
    carry = (net, coords1); broadcast consts ride outside the scan axis."""
    cfg: FlowFormerConfig

    @nn.compact
    def __call__(self, carry, consts):
        c = self.cfg
        net, coords1 = carry
        inp, attention, cost_maps, key, value, coords0 = consts
        B, H1, W1, _ = coords1.shape

        coords1 = jax.lax.stop_gradient(coords1)
        if cost_maps.ndim == 3:      # pre-transposed for the Pallas kernel
            cost_forward = encode_flow_token_t(
                cost_maps, coords1, c.lookup_radius,
                _lookup_impl() == "pallas_interpret")
        else:
            cost_forward = encode_flow_token(cost_maps, coords1,
                                             r=c.lookup_radius)

        q = nn.Conv(c.query_latent_dim, (1, 1), name="flow_token_enc1")(cost_forward)
        q = nn.gelu(q, approximate=False)
        q = nn.Conv(c.query_latent_dim, (1, 1), name="flow_token_enc2")(q)
        query = q.reshape(B * H1 * W1, 1, c.query_latent_dim)

        query_coord = coords1 if not c.use_rpe else coords1 - coords0
        qc = query_coord.reshape(B * H1 * W1, 1, 2)
        coord_enc = linear_position_embedding_sine(qc, dim=c.query_latent_dim)

        cost_global, _, _ = DecoderCrossAttention(c, name="decoder_layer")(
            query, key, value, None, coord_enc)
        cost_global = cost_global.reshape(B, H1, W1, c.query_latent_dim)

        corr = jnp.concatenate([cost_global, cost_forward], -1)
        flow = coords1 - coords0
        net, delta_flow = GMAUpdateBlock(c, name="update_block")(
            net, inp, corr, flow, attention)
        coords1 = coords1 + delta_flow
        if c.upsample_all:
            # per-iteration (net, low-res flow); the mask head + convex
            # upsample run batched over all iterations AFTER the scan
            y = (net, coords1 - coords0)
        else:
            y = jnp.zeros((), coords1.dtype)
        return (net, coords1), y


class MemoryDecoder(nn.Module):
    """RAFT-style recurrent decoder over the latent cost memory
    (reference: decoder.py:138-344). The iteration loop is an nn.scan with
    broadcast weights, so the model traces/compiles the body once instead of
    decoder_depth times — the TPU-native answer to the reference's python
    loop."""
    cfg: FlowFormerConfig

    @nn.compact
    def __call__(self, cost_memory, context, cost_maps, h3w3):
        c = self.cfg
        B, H1, W1, _ = context.shape
        ctx = nn.Conv(256, (1, 1), name="proj")(context)
        net, inp = jnp.split(ctx, 2, axis=-1)
        net = jnp.tanh(net)
        inp = nn.relu(inp)
        attention = GmaAttention(name="att")(inp)

        grid = coords_grid(H1, W1, dtype=context.dtype)
        coords0 = jnp.broadcast_to(grid[None], (B, H1, W1, 2))

        # cost-memory keys/values are iteration-invariant: computed once
        # (the reference caches them on the first iteration, decoder.py:86-99)
        Dq = c.query_latent_dim
        key = nn.Dense(Dq, name="memory_k")(cost_memory)
        value = nn.Dense(Dq, name="memory_v")(cost_memory)

        impl = _lookup_impl()
        if (impl.startswith("pallas") and cost_maps.shape[-1] == 1
                and (jax.default_backend() == "tpu"
                     or impl == "pallas_interpret")):
            from ..ops.pallas.cost_lookup import transpose_cost_maps
            cost_maps = transpose_cost_maps(cost_maps)  # once, not 12x

        scan = nn.scan(DecoderIteration,
                       variable_broadcast="params",
                       split_rngs={"params": False},
                       in_axes=nn.broadcast, out_axes=0,
                       length=c.decoder_depth,
                       unroll=c.scan_unroll)
        consts = (inp, attention, cost_maps, key, value, coords0)
        (net, coords1), ys = scan(c, name="iteration")(
            (net, coords0), consts)
        mask_head = MaskHead(name="mask_head")
        if c.upsample_all:
            # ONE batched mask-head + convex-upsample pass over all
            # iterations (depth folds into the batch dim) instead of 12
            # small in-scan ops
            nets, flows_lr = ys           # (d, B, H1, W1, 128/2)
            d = c.decoder_depth
            up_mask = mask_head(nets.reshape((d * B, H1, W1, -1)))
            flows = convex_upsample_flow_b(
                flows_lr.reshape((d * B, H1, W1, 2)), up_mask)
            flows = flows.reshape((d, B) + flows.shape[1:])
            flow_predictions = [flows[i] for i in range(d)]
        else:
            # inference only upsamples the final flow, so only the final
            # net pays the mask head (the reference pays it every
            # iteration, gru.py:325-330)
            flow_predictions = [convex_upsample_flow_b(
                coords1 - coords0, mask_head(net))]
        return flow_predictions, coords1 - coords0


class _PretrainQueryBlock(nn.Module):
    """Query encode + cross-attention for one pretrain query, with the SAME
    param paths as the decoder scan body ('iteration/...') so a converted
    checkpoint loads into both the forward and pretrain models."""
    cfg: FlowFormerConfig

    @nn.compact
    def __call__(self, cost_forward, key, value, query_coord):
        c = self.cfg
        B, H1, W1, _ = cost_forward.shape
        q = nn.Conv(c.query_latent_dim, (1, 1),
                    name="flow_token_enc1")(cost_forward)
        q = nn.gelu(q, approximate=False)
        q = nn.Conv(c.query_latent_dim, (1, 1), name="flow_token_enc2")(q)
        query = q.reshape(B * H1 * W1, 1, c.query_latent_dim)
        qc = query_coord.reshape(B * H1 * W1, 1, 2)
        coord_enc = linear_position_embedding_sine(qc, dim=c.query_latent_dim)
        cost_global, _, _ = DecoderCrossAttention(c, name="decoder_layer")(
            query, key, value, None, coord_enc)
        return cost_global.reshape(B, H1, W1, c.query_latent_dim)


class MemoryDecoderPretrain(nn.Module):
    """MAE pretrain decoder (reference: decoder.py:346-439, gt_r>0 branch —
    the shipped recipe: gt_r=15, no_border=True, query_num=30): random
    query coordinates probe the latent memory; a conv head regresses the
    channel-normalized (2r+1)^2 window of the OUTER cost map at each query;
    loss is the summed per-query MSE."""
    cfg: FlowFormerConfig

    @nn.compact
    def __call__(self, cost_memory, cost_maps_outer, cost_maps_inner,
                 query_noise):
        """query_noise: (Q, B, H1, W1, 2) uniforms in [0,1) — injected so
        the path is deterministic under jit (the reference draws
        torch.rand inline, decoder.py:394)."""
        c = self.cfg
        Dq = c.query_latent_dim
        B, H1, W1, H2o, W2o, _ = cost_maps_outer.shape
        radius = (c.gt_r - 1) // 2
        cost_maps_outer = jax.lax.stop_gradient(cost_maps_outer)
        cost_maps_inner = jax.lax.stop_gradient(cost_maps_inner)

        key = nn.Dense(Dq, name="memory_k")(cost_memory)
        value = nn.Dense(Dq, name="memory_v")(cost_memory)
        block = _PretrainQueryBlock(c, name="iteration")
        head0 = nn.Conv(Dq * 2, (1, 1), name="pretrain_head0")
        head1 = nn.Conv(Dq * 2, (1, 1), name="pretrain_head1")
        head2 = nn.Conv(c.gt_r ** 2, (1, 1), name="pretrain_head2")

        offs = jnp.array([c.W_offset // 8, c.H_offset // 8], jnp.float32)
        loss = 0.0
        for i in range(query_noise.shape[0]):
            raw = query_noise[i]
            if c.no_border:
                co = jnp.stack([raw[..., 0] * (W2o - c.gt_r),
                                raw[..., 1] * (H2o - c.gt_r)], -1) + radius
            else:
                co = jnp.stack([raw[..., 0] * W2o, raw[..., 1] * H2o], -1)
            co = jax.lax.stop_gradient(co)
            ci = co - offs

            tgt = encode_flow_token(cost_maps_outer, co, r=radius)
            mean = tgt.mean(-1, keepdims=True)
            var = tgt.var(-1, keepdims=True, ddof=1)  # torch-unbiased
            tgt = (tgt - mean) / (var + 1e-6) ** 0.5

            cost_forward = encode_flow_token(cost_maps_inner, ci,
                                             r=c.lookup_radius)
            cost_global = block(cost_forward, key, value, ci)
            pred = head2(nn.gelu(head1(nn.gelu(head0(cost_global),
                                               approximate=False)),
                                 approximate=False))
            loss = loss + jnp.mean((pred - tgt) ** 2)
        return loss


class FlowFormerPretrain(nn.Module):
    """MAE pretraining model (reference: transformer.py:67-86). Shares its
    whole param tree with FlowFormer (identical module paths) plus the
    pretrain head, so one converted checkpoint loads into both; noise and
    query coordinates are explicit inputs for jit determinism."""
    cfg: FlowFormerConfig = FlowFormerConfig()

    def setup(self):
        self.context_encoder = TwinsSVT()
        self.memory_encoder = MemoryEncoder(self.cfg)
        self.memory_decoder = MemoryDecoderPretrain(self.cfg)

    def __call__(self, image1, image2, noise, query_noise):
        c = self.cfg
        image1 = 2 * (image1 / 255.0) - 1.0
        image2 = 2 * (image2 / 255.0) - 1.0
        # per-axis inner crop: slice each axis independently so a single
        # nonzero offset does not turn the other axis into `0:-0` (empty)
        Ho, Wo = c.H_offset, c.W_offset
        H, W = image1.shape[1], image1.shape[2]
        sl = (slice(None), slice(Ho, H - Ho), slice(Wo, W - Wo))
        image1_inner = image1[sl]
        image2_inner = image2[sl]

        context, _ = self.context_encoder(image1_inner)
        x, cv_outer, cv_inner = self.memory_encoder.pretrain(
            image1, image2, image1_inner, image2_inner, context, noise)
        return self.memory_decoder(x, cv_outer, cv_inner, query_noise)


class FlowFormer(nn.Module):
    """Top-level model (reference: transformer.py:16-65). Inputs NHWC uint8
    range [0,255]; returns (list of upsampled flows, low-res flow).

    `bidirectional` computes forward AND backward flow sharing the twins
    feature extraction and transposing the cost volume — the fb-consistency
    occlusion pass costs ~60% of two independent calls."""
    cfg: FlowFormerConfig = FlowFormerConfig()

    def setup(self):
        self.context_encoder = TwinsSVT()
        self.memory_encoder = MemoryEncoder(self.cfg)
        self.memory_decoder = MemoryDecoder(self.cfg)

    def __call__(self, image1, image2):
        image1 = 2 * (image1 / 255.0) - 1.0
        image2 = 2 * (image2 / 255.0) - 1.0

        context, _ = self.context_encoder(image1)
        cost_memory, cost_patches, cost_maps, h3w3 = self.memory_encoder(
            image1, image2, context)
        flow_predictions, flow_lr = self.memory_decoder(
            cost_memory, context, cost_maps, h3w3)
        return flow_predictions, flow_lr

    def bidirectional(self, image1, image2):
        """Returns ((fwd_preds, fwd_lr), (bwd_preds, bwd_lr))."""
        image1 = 2 * (image1 / 255.0) - 1.0
        image2 = 2 * (image2 / 255.0) - 1.0

        # one batched context pass + one batched perceiver + one batched
        # decoder: both directions share every program, halving the
        # op-dispatch overhead that dominates these small-tensor stages
        ctx_both, _ = self.context_encoder(
            jnp.concatenate([image1, image2], axis=0))
        B = image1.shape[0]
        ctx1, ctx2 = ctx_both[:B], ctx_both[B:]
        _, _, (ctx_cat, cost_cat, mem_cat), h3w3 = \
            self.memory_encoder.bidirectional(image1, image2, ctx1, ctx2)
        preds, lr = self.memory_decoder(mem_cat, ctx_cat, cost_cat, h3w3)
        preds_f = [p[:B] for p in preds]
        preds_b = [p[B:] for p in preds]
        return (preds_f, lr[:B]), (preds_b, lr[B:])
