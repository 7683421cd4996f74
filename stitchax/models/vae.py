"""Stable-Diffusion AutoencoderKL (VAE) in Flax, NHWC.

The reference's diffusers pipeline encodes the masked image into latents and
decodes the denoised latents back to pixels
(reference: core/inference/mix_methods/utils/inpainter.py:12-26,96-105 via
StableDiffusionControlNetInpaintPipeline). Structure mirrors diffusers'
AutoencoderKL for SD-1.5 so checkpoints convert leaf-for-leaf:
encoder (128/256/512/512, 2 resnets per block, mid resnet-attn-resnet,
8-channel moments) + quant convs + decoder (mirrored, 3 resnets per block).
scaling_factor 0.18215.

Group/LayerNorm epsilons follow diffusers (1e-6 throughout the VAE).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

SD_VAE_SCALE = 0.18215


class VaeResBlock(nn.Module):
    out_ch: int
    groups: int = 32

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(self.groups, epsilon=1e-6, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", name="conv1")(h)
        h = nn.GroupNorm(self.groups, epsilon=1e-6, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="conv_shortcut")(x)
        return x + h


class VaeAttention(nn.Module):
    """Single-head self-attention over spatial positions (diffusers
    Attention with to_q/to_k/to_v/to_out, all biased)."""
    groups: int = 32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = nn.GroupNorm(self.groups, epsilon=1e-6, name="group_norm")(x)
        t = h.reshape(B, H * W, C)
        q = nn.Dense(C, name="to_q")(t)
        k = nn.Dense(C, name="to_k")(t)
        v = nn.Dense(C, name="to_v")(t)
        a = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k,
                       preferred_element_type=jnp.float32) * C ** -0.5,
            -1).astype(v.dtype)
        o = jnp.einsum("bqk,bkc->bqc", a, v)
        o = nn.Dense(C, name="to_out")(o).reshape(B, H, W, C)
        return x + o


class VaeMidBlock(nn.Module):
    ch: int
    groups: int = 32

    @nn.compact
    def __call__(self, x):
        x = VaeResBlock(self.ch, self.groups, name="res0")(x)
        x = VaeAttention(self.groups, name="attn")(x)
        return VaeResBlock(self.ch, self.groups, name="res1")(x)


class VaeEncoder(nn.Module):
    block_channels: Tuple[int, ...] = (128, 256, 512, 512)
    latent_channels: int = 4
    groups: int = 32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.block_channels[0], (3, 3), padding="SAME",
                    name="conv_in")(x)
        for i, ch in enumerate(self.block_channels):
            for j in range(2):
                x = VaeResBlock(ch, self.groups, name=f"down{i}_res{j}")(x)
            if i < len(self.block_channels) - 1:
                # diffusers pads (0,1,0,1) then convs stride 2 VALID
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID",
                            name=f"down{i}_down")(x)
        x = VaeMidBlock(self.block_channels[-1], self.groups,
                        name="mid")(x)
        x = nn.GroupNorm(self.groups, epsilon=1e-6,
                         name="conv_norm_out")(x)
        x = nn.silu(x)
        moments = nn.Conv(2 * self.latent_channels, (3, 3), padding="SAME",
                          name="conv_out")(x)
        return nn.Conv(2 * self.latent_channels, (1, 1),
                       name="quant_conv")(moments)


class VaeDecoder(nn.Module):
    block_channels: Tuple[int, ...] = (128, 256, 512, 512)
    latent_channels: int = 4
    groups: int = 32

    @nn.compact
    def __call__(self, z):
        z = nn.Conv(self.latent_channels, (1, 1), name="post_quant_conv")(z)
        x = nn.Conv(self.block_channels[-1], (3, 3), padding="SAME",
                    name="conv_in")(z)
        x = VaeMidBlock(self.block_channels[-1], self.groups,
                        name="mid")(x)
        # decoder up_blocks run top-channel first (512, 512, 256, 128),
        # 3 resnets each, upsample after all but the last block
        rev = tuple(reversed(self.block_channels))
        for i, ch in enumerate(rev):
            for j in range(3):
                x = VaeResBlock(ch, self.groups, name=f"up{i}_res{j}")(x)
            if i < len(rev) - 1:
                B, H, W, C = x.shape
                x = jax.image.resize(x, (B, 2 * H, 2 * W, C), "nearest")
                x = nn.Conv(ch, (3, 3), padding="SAME", name=f"up{i}_up")(x)
        x = nn.GroupNorm(self.groups, epsilon=1e-6,
                         name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(3, (3, 3), padding="SAME", name="conv_out")(x)


class AutoencoderKL(nn.Module):
    """encode -> (mean, logvar) moments; decode(latents) -> image [-1, 1]."""
    block_channels: Tuple[int, ...] = (128, 256, 512, 512)
    latent_channels: int = 4
    groups: int = 32

    def setup(self):
        self.encoder = VaeEncoder(self.block_channels, self.latent_channels,
                                  self.groups)
        self.decoder = VaeDecoder(self.block_channels, self.latent_channels,
                                  self.groups)

    def encode_moments(self, x):
        return self.encoder(x)

    def encode_mode(self, x):
        """Deterministic posterior mode (the mean) scaled for the UNet.
        The reference pipeline samples the posterior; the mode is the
        deterministic TPU-friendly choice and is standard for inpainting."""
        moments = self.encoder(x)
        mean = moments[..., : self.latent_channels]
        return mean * SD_VAE_SCALE

    def decode(self, latents):
        return self.decoder(latents / SD_VAE_SCALE)

    def __call__(self, x):
        return self.decode(self.encode_mode(x))


# ------------------------------ converter ------------------------------------


def convert_vae(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """diffusers AutoencoderKL state dict -> AutoencoderKL params.
    Key map: diffusers encoder/decoder down_blocks/up_blocks/mid_block with
    to_q/to_k/to_v/to_out.0 attention naming (diffusers >= 0.15)."""
    from ..convert import _convp, _lin, norm_params

    def res(p):
        out = {"norm1": norm_params(f"{p}.norm1", sd),
               "conv1": _convp(sd, f"{p}.conv1"),
               "norm2": norm_params(f"{p}.norm2", sd),
               "conv2": _convp(sd, f"{p}.conv2")}
        if f"{p}.conv_shortcut.weight" in sd:
            out["conv_shortcut"] = _convp(sd, f"{p}.conv_shortcut")
        return out

    def attn(p):
        return {"group_norm": norm_params(f"{p}.group_norm", sd),
                "to_q": _lin(sd, f"{p}.to_q"),
                "to_k": _lin(sd, f"{p}.to_k"),
                "to_v": _lin(sd, f"{p}.to_v"),
                "to_out": _lin(sd, f"{p}.to_out.0")}

    def mid(p):
        return {"res0": res(f"{p}.resnets.0"),
                "attn": attn(f"{p}.attentions.0"),
                "res1": res(f"{p}.resnets.1")}

    enc: Dict[str, Any] = {"conv_in": _convp(sd, "encoder.conv_in")}
    for i in range(4):
        for j in range(2):
            enc[f"down{i}_res{j}"] = res(f"encoder.down_blocks.{i}.resnets.{j}")
        if i < 3:
            enc[f"down{i}_down"] = _convp(
                sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")
    enc["mid"] = mid("encoder.mid_block")
    enc["conv_norm_out"] = norm_params("encoder.conv_norm_out", sd)
    enc["conv_out"] = _convp(sd, "encoder.conv_out")
    enc["quant_conv"] = _convp(sd, "quant_conv")

    dec: Dict[str, Any] = {"post_quant_conv": _convp(sd, "post_quant_conv"),
                           "conv_in": _convp(sd, "decoder.conv_in"),
                           "mid": mid("decoder.mid_block")}
    for i in range(4):
        for j in range(3):
            dec[f"up{i}_res{j}"] = res(f"decoder.up_blocks.{i}.resnets.{j}")
        if i < 3:
            dec[f"up{i}_up"] = _convp(
                sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")
    dec["conv_norm_out"] = norm_params("decoder.conv_norm_out", sd)
    dec["conv_out"] = _convp(sd, "decoder.conv_out")

    return {"params": {"encoder": enc, "decoder": dec}}
