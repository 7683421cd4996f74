"""TransRef: reference-guided transformer inpainting in Flax.

TPU-native rebuild of the vendored TransRef model
(reference: core/inference/mix_methods/utils/TransRef/models/TransRef.py and
models/RefPA/; SURVEY.md §2.8). Architecture (Tenc config,
TransRef.py:820-826): 4-stage SegFormer-style pyramid encoder with
embed_dims [64, 128, 320, 512], heads [1, 2, 4, 4], mlp_ratios [2, 2, 2, 2],
depths [2, 2, 2, 2], sr_ratios [4, 2, 2, 1]. Each stage patch-embeds the
(masked-input ⊕ inv-mask, 6ch) stream and the reference stream, aligns ref
features to input features with RefPA (deformable-conv alignment + SE-style
gating), runs a main self-attention chain in parallel with an "intra-patch"
cross-attention branch over mini-patch embeddings, and adds the branch into
the next stage (TransRef.py:172-283). A 1-block decoder at 1/64 (Tdec,
TransRef.py:744-793) and a conv-projection tail with skip fusion
(TransRef.py:836-894) produce a tanh image.

Departures (TPU-first): NHWC layout throughout; the mmcv CUDA DeformConv2d
becomes a gather+matmul kernel (stitchax.ops.deform); attention is plain
jnp einsum that XLA fuses onto the MXU.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.deform import deform_conv2d_b

EMBED_DIMS = (64, 128, 320, 512)
NUM_HEADS = (1, 2, 4, 4)
MLP_RATIOS = (2, 2, 2, 2)
DEPTHS = (2, 2, 2, 2)
SR_RATIOS = (4, 2, 2, 1)


class OverlapPatchEmbed(nn.Module):
    """Strided conv patch embedding + LayerNorm (TransRef.py:290-332)."""
    embed_dim: int
    patch: int = 7
    stride: int = 4

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        p = self.patch
        x = nn.Conv(self.embed_dim, (p, p), strides=(self.stride, self.stride),
                    padding=((p // 2, p // 2), (p // 2, p // 2)),
                    name="proj")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        return x


class DWConvMlp(nn.Module):
    """Mlp with a 3x3 depthwise conv between fc1 and GELU
    (TransRef.py:358-390)."""
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.Conv(self.hidden, (3, 3), padding="SAME",
                    feature_group_count=self.hidden, name="dwconv")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out, name="fc2")(x)
        return x


def _attend(q, k, v, heads):
    """Standard multi-head softmax attention over flattened tokens."""
    B, Nq, C = q.shape
    Nk = k.shape[1]
    d = C // heads
    q = q.reshape(B, Nq, heads, d).transpose(0, 2, 1, 3)
    k = k.reshape(B, Nk, heads, d).transpose(0, 2, 1, 3)
    v = v.reshape(B, Nk, heads, d).transpose(0, 2, 1, 3)
    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                      preferred_element_type=jnp.float32) * (d ** -0.5)
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    return out.transpose(0, 2, 1, 3).reshape(B, Nq, C)


class SRAttention(nn.Module):
    """Self-attention with spatial-reduction keys (TransRef.py:465-524).
    With `kv_source` it becomes cross-attention to the reference stream
    (Attention_Ref, TransRef.py:397-462)."""
    heads: int
    sr_ratio: int

    @nn.compact
    def __call__(self, x, kv_source=None):  # (B, H, W, C)
        B, H, W, C = x.shape
        kv_in = x if kv_source is None else kv_source
        q = nn.Dense(C, use_bias=True, name="q")(x).reshape(B, H * W, C)
        if self.sr_ratio > 1:
            s = self.sr_ratio
            kv_in = nn.Conv(C, (s, s), strides=(s, s), name="sr")(kv_in)
            kv_in = nn.LayerNorm(epsilon=1e-6, name="sr_norm")(kv_in)
        kv = nn.Dense(2 * C, use_bias=True, name="kv")(kv_in)
        kv = kv.reshape(B, -1, 2 * C)
        k, v = jnp.split(kv, 2, axis=-1)
        out = _attend(q, k, v, self.heads)
        out = nn.Dense(C, name="proj")(out)
        return out.reshape(B, H, W, C)


class Block(nn.Module):
    """Pre-norm attention + DWConv-Mlp (TransRef.py:640-675)."""
    heads: int
    mlp_ratio: int
    sr_ratio: int
    attention: str = "self"   # self | ref
    # (the reference's Attention_dec/task-query variant is dead code:
    #  Block_dec instantiates the plain Attention, TransRef.py:604-608)

    @nn.compact
    def __call__(self, x, ref=None):
        C = x.shape[-1]
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if self.attention == "ref":
            r = nn.LayerNorm(epsilon=1e-6, name="norm1_ref")(ref)
            y = SRAttention(self.heads, self.sr_ratio, name="attn")(y, r)
        else:
            y = SRAttention(self.heads, self.sr_ratio, name="attn")(y)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        x = x + DWConvMlp(C * self.mlp_ratio, C, name="mlp")(y)
        return x


# --------------------------- RefPA alignment --------------------------------


class NonLocal2D(nn.Module):
    """Embedded-gaussian non-local block with 2x2 subsampled phi/g
    (reference: .../RefPA/non_local_embedded_gaussian.py)."""
    channels: int

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        B, H, W, C = x.shape
        inter = max(self.channels // 2, 1)
        g = nn.Conv(inter, (1, 1), name="g")(x)
        phi = nn.Conv(inter, (1, 1), name="phi")(x)
        theta = nn.Conv(inter, (1, 1), name="theta")(x)
        g = nn.max_pool(g, (2, 2), strides=(2, 2)).reshape(B, -1, inter)
        phi = nn.max_pool(phi, (2, 2), strides=(2, 2)).reshape(B, -1, inter)
        theta = theta.reshape(B, H * W, inter)
        attn = jax.nn.softmax(
            jnp.einsum("bic,bjc->bij", theta, phi,
                       preferred_element_type=jnp.float32), -1).astype(x.dtype)
        y = jnp.einsum("bij,bjc->bic", attn, g).reshape(B, H, W, inter)
        # W conv initialised to zero in the reference (identity at init)
        y = nn.Conv(self.channels, (1, 1), kernel_init=nn.initializers.zeros,
                    name="w")(y)
        return y + x


class DynamicOffsetEstimator(nn.Module):
    """U-shaped offset feature net with non-local attention at each scale
    (reference: .../RefPA/Dynamic_offset_estimator.py:7-42)."""
    out_channels: int

    @nn.compact
    def __call__(self, x):  # (B, H, W, 2C)
        # paddings match torch Conv2d(k3,s2,p1) / ConvTranspose2d(k3,s2,p1,
        # output_padding=1) exactly (see stitchax/convert.py equivalences)
        down = lambda c, n: lambda t: nn.leaky_relu(
            nn.Conv(c, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    name=n)(t), 0.01)
        up = lambda c, n: lambda t: nn.leaky_relu(
            nn.ConvTranspose(c, (3, 3), strides=(2, 2),
                             padding=((1, 2), (1, 2)), name=n)(t), 0.01)
        h2 = down(64, "down1")(x)
        h4 = down(64, "down2")(h2)
        h8 = down(64, "down3")(h4)

        a8 = NonLocal2D(64, name="attn1")(h8) + h8
        u4 = up(64, "up1")(a8)
        a4 = NonLocal2D(64, name="attn2")(u4) + h4
        u2 = up(64, "up2")(a4)
        a2 = NonLocal2D(64, name="attn3")(u2) + h2
        u1 = up(64, "up3")(a2)
        return nn.Conv(self.out_channels, (3, 3), padding="SAME",
                       name="scale")(u1)


class PA(nn.Module):
    """Offset-estimated deformable alignment of ref features to the input
    (reference: .../RefPA/PA.py:8-25)."""
    channels: int

    @nn.compact
    def __call__(self, feat, ref):
        est = DynamicOffsetEstimator(self.channels, name="offset_estimator")(
            jnp.concatenate([feat, ref], -1))
        offsets = nn.Conv(18, (3, 3), padding="SAME", use_bias=False,
                          name="offset_conv")(est)
        w = self.param("deform_kernel", nn.initializers.he_normal(),
                       (9 * self.channels, self.channels))
        return deform_conv2d_b(ref, offsets, w)


class PH(nn.Module):
    """SE-style gated fusion of input + aligned ref
    (reference: .../RefPA/PH.py:7-45)."""
    channels: int
    reduction: int = 8

    @nn.compact
    def __call__(self, x, aligned):
        cat = jnp.concatenate([x, aligned], -1)
        y = nn.gelu(nn.Conv(self.channels // self.reduction, (1, 1),
                            name="fc1")(cat), approximate=False)
        y = nn.gelu(nn.Conv(self.channels * 2, (1, 1), name="fc2")(y),
                    approximate=False)
        res = cat * y
        return nn.gelu(nn.Conv(self.channels, (1, 1), name="reduc")(res),
                       approximate=False)


class RefPA(nn.Module):
    """(reference: .../RefPA/RefPA.py:8-21)."""
    channels: int

    @nn.compact
    def __call__(self, feat, ref):
        aligned = PA(self.channels, name="pa")(feat, ref)
        return PH(self.channels, name="ph")(feat, aligned)


# ------------------------------ encoder -------------------------------------


class Tenc(nn.Module):
    """4-stage encoder with RefPA fusion + intra-patch cross-attn branch
    (reference: TransRef.py:20-288,820-826)."""

    @nn.compact
    def __call__(self, x, ref) -> List[jnp.ndarray]:
        outs = []
        dims = EMBED_DIMS

        # stage 1
        x1 = OverlapPatchEmbed(dims[0], 7, 4, name="patch_embed1")(x)
        r1 = OverlapPatchEmbed(dims[0], 7, 4, name="patch_embed1_ref")(ref)
        a1 = RefPA(dims[0], name="refpa1")(x1, r1)
        x2 = OverlapPatchEmbed(dims[1], 3, 2, name="mini_patch_embed1")(a1)
        r2 = OverlapPatchEmbed(dims[1], 3, 2, name="mini_patch_embed1_ref")(r1)
        for i in range(DEPTHS[0]):
            x1 = Block(NUM_HEADS[0], MLP_RATIOS[0], SR_RATIOS[0],
                       name=f"block1_{i}")(x1)
        x1 = nn.LayerNorm(epsilon=1e-6, name="norm1")(x1)
        x2 = Block(NUM_HEADS[0], MLP_RATIOS[0], SR_RATIOS[0], attention="ref",
                   name="patch_block1_0")(x2, r2)
        x2 = nn.LayerNorm(epsilon=1e-6, name="pnorm1")(x2)
        outs.append(x1)

        # stage 2
        y = OverlapPatchEmbed(dims[1], 3, 2, name="patch_embed2")(x1)
        r1 = OverlapPatchEmbed(dims[1], 3, 2, name="patch_embed2_ref")(r1)
        y = y + x2
        a2 = RefPA(dims[1], name="refpa2")(y, r1)
        x2 = OverlapPatchEmbed(dims[2], 3, 2, name="mini_patch_embed2")(a2)
        r2 = OverlapPatchEmbed(dims[2], 3, 2, name="mini_patch_embed2_ref")(r1)
        for i in range(DEPTHS[1]):
            y = Block(NUM_HEADS[1], MLP_RATIOS[1], SR_RATIOS[1],
                      name=f"block2_{i}")(y)
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(y)
        outs.append(y)
        x2 = Block(NUM_HEADS[1], MLP_RATIOS[1], SR_RATIOS[1], attention="ref",
                   name="patch_block2_0")(x2, r2)
        x2 = nn.LayerNorm(epsilon=1e-6, name="pnorm2")(x2)

        # stage 3
        z = OverlapPatchEmbed(dims[2], 3, 2, name="patch_embed3")(y)
        r1 = OverlapPatchEmbed(dims[2], 3, 2, name="patch_embed3_ref")(r1)
        z = z + x2
        a3 = RefPA(dims[2], name="refpa3")(z, r1)
        x2 = OverlapPatchEmbed(dims[3], 3, 2, name="mini_patch_embed3")(a3)
        r2 = OverlapPatchEmbed(dims[3], 3, 2, name="mini_patch_embed3_ref")(r1)
        for i in range(DEPTHS[2]):
            z = Block(NUM_HEADS[2], MLP_RATIOS[2], SR_RATIOS[2],
                      name=f"block3_{i}")(z)
        z = nn.LayerNorm(epsilon=1e-6, name="norm3")(z)
        outs.append(z)
        # reference quirk: patch_block3 uses num_heads[1] (TransRef.py:120)
        x2 = Block(NUM_HEADS[1], MLP_RATIOS[2], SR_RATIOS[2], attention="ref",
                   name="patch_block3_0")(x2, r2)
        x2 = nn.LayerNorm(epsilon=1e-6, name="pnorm3")(x2)

        # stage 4 (no ref branch)
        w = OverlapPatchEmbed(dims[3], 3, 2, name="patch_embed4")(z)
        w = w + x2
        for i in range(DEPTHS[3]):
            w = Block(NUM_HEADS[3], MLP_RATIOS[3], SR_RATIOS[3],
                      name=f"block4_{i}")(w)
        w = nn.LayerNorm(epsilon=1e-6, name="norm4")(w)
        outs.append(w)
        return outs


class Tdec(nn.Module):
    """1-extra-downsample decoder: 3 plain self-attention Block_decs at 1/64
    (reference: TransRef.py:732-793,828-832; Block_dec uses the plain
    Attention — its task-query Attention_dec is never wired up)."""

    @nn.compact
    def __call__(self, feats):
        x = OverlapPatchEmbed(EMBED_DIMS[3], 3, 2, name="patch_embed1")(feats[3])
        for i in range(3):
            x = Block(8, 4, 1, name=f"block1_{i}")(x)
        return nn.LayerNorm(epsilon=1e-6, name="norm1")(x)


class ResidualBlock(nn.Module):
    """conv-relu-conv * 0.1 + skip (reference: base_networks.py:112-125)."""
    channels: int

    @nn.compact
    def __call__(self, x):
        y = nn.relu(nn.Conv(self.channels, (3, 3), padding="SAME",
                            name="conv1")(x))
        y = nn.Conv(self.channels, (3, 3), padding="SAME", name="conv2")(y)
        return x + 0.1 * y


class ConvProjection(nn.Module):
    """Upsampling tail with encoder skips (reference: TransRef.py:836-894).
    torch ConvTranspose2d(k4, s2, p1) doubles resolution exactly; the flax
    equivalent is padding k-1-p = (2, 2) (see stitchax/convert.py), so the
    reference's odd-size crop fixups are unnecessary with power-of-two
    inputs."""

    @nn.compact
    def __call__(self, feats, dec):
        up = lambda c, n: lambda t: nn.ConvTranspose(
            c, (4, 4), strides=(2, 2), padding=((2, 2), (2, 2)), name=n)(t)
        x = up(512, "convd32x")(dec)
        x = x + feats[3]
        x = up(320, "convd16x")(x)
        x = ResidualBlock(320, name="dense4")(x) + feats[2]
        x = up(128, "convd8x")(x)
        x = ResidualBlock(128, name="dense3")(x) + feats[1]
        x = up(64, "convd4x")(x)
        x = ResidualBlock(64, name="dense2")(x) + feats[0]
        x = up(16, "convd2x")(x)
        x = ResidualBlock(16, name="dense1")(x)
        x = up(8, "convd1x")(x)
        return x


class TransRefBase(nn.Module):
    """Full model (reference: TransRef.py:896-938). Inputs:
    detail (B, H, W, 3) in [-1, 1] with masked pixels pre-filled,
    mask (B, H, W, 1) (1 = hole), reference (B, H, W, 3) in [-1, 1].
    Returns tanh image (B, H, W, 3)."""

    @nn.compact
    def __call__(self, detail, mask, reference):
        inv_mask = 1.0 - mask
        x = jnp.concatenate([detail, jnp.broadcast_to(inv_mask,
                                                      detail.shape)], -1)
        feats = Tenc(name="tenc")(x, reference)
        dec = Tdec(name="tdec")(feats)
        tail = ConvProjection(name="convtail")(feats, dec)
        out = nn.Conv(3, (3, 3), padding="SAME", name="clean")(tail)
        return jnp.tanh(out)


def make_default_transref_apply(size: int = 512, seed: int = 0,
                                bf16: bool = True, ckpt: str = None):
    """Jitted apply closure; weights from `ckpt` when available.

    Weight resolution order: explicit `ckpt` arg, then the
    STITCHAX_TRANSREF_CKPT env var (the Stitcher constructs inpainters by
    name only — same pattern as STITCHAX_SD_CKPT), else random init. A
    checkpoint is the flax-serialization bytes of the param tree, written
    by `tools/train_transref_learns.py --save_ckpt` or by converting the
    reference's 400_Trans.pth (stitchax/convert.py convert_transref;
    the reference downloads it at transref_inpainter.py:19-28 — not
    shipped there either). Param shapes are resolution-independent, so a
    checkpoint trained at 256 loads into the 512 inpainting size.
    bf16=True runs the transformer in bfloat16 (the reference's inpainters
    run fp16), outputs cast back to fp32.
    """
    import os

    model = TransRefBase()
    d = jnp.zeros((1, size, size, 3), jnp.float32)
    m = jnp.zeros((1, size, size, 1), jnp.float32)
    # jitted init: eager init is pathological through the remote-TPU tunnel
    params = jax.jit(model.init)(jax.random.PRNGKey(seed), d, m, d)
    ckpt = ckpt or os.environ.get("STITCHAX_TRANSREF_CKPT") or None
    if not ckpt:
        # fall back to the committed trained snapshot, mirroring the
        # reference's fixed-path 400_Trans.pth load
        # (transref_inpainter.py:19-28); STITCHAX_TRANSREF_CKPT=none
        # forces random init explicitly
        default = os.path.join(os.path.dirname(__file__), "..", "..",
                               "results",
                               "transref_ckpt_r05_bf16.msgpack")
        if os.path.isfile(default):
            ckpt = default
    if ckpt and ckpt.lower() == "none":
        ckpt = None
    if ckpt:
        from flax import serialization
        with open(ckpt, "rb") as f:
            restored = serialization.from_bytes(params, f.read())
        # bf16 snapshots (results/transref_ckpt_r04_bf16.msgpack) restore
        # with stored dtypes; compute in the template's fp32 (bf16_apply
        # re-casts below when enabled)
        params = jax.tree_util.tree_map(
            lambda t, r: jnp.asarray(r, t.dtype), params, restored)
        print(f"[transref] loaded checkpoint {ckpt}")
    else:
        print("[transref] WARNING: no checkpoint — RANDOM-INIT inpainter "
              "(pass out.py --transref_ckpt "
              "results/transref_ckpt_r04_bf16.msgpack, set "
              "STITCHAX_TRANSREF_CKPT, or convert the reference's "
              "400_Trans.pth via stitchax/convert.py)")

    if bf16:
        from ..utils.precision import bf16_apply
        return bf16_apply(model.apply, params)

    def apply_fn(detail, mask, reference):
        return model.apply(params, detail, mask, reference)

    return apply_fn
