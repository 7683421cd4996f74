"""Stable-Diffusion-style ControlNet inpainting in Flax: fixed-shape jitted
denoising loop.

TPU-native rebuild of the reference's diffusers pipeline
(reference: core/inference/mix_methods/utils/inpainter.py:12-105 —
StableDiffusionControlNetInpaintPipeline, SD-1.5 inpaint UNet + ControlNet
v11p, fp16, 50 steps, empty prompt, control image = init with masked px
= -1). The reference downloads CUDA checkpoints at import; this environment
is zero-egress, so the architecture + scheduler + jitted loop live here and
activate when converted weights are supplied.

Architecture (SD 1.5 UNet): 4 down blocks (320/640/1280/1280ch, 2 res
blocks each, self+cross attention at the three lower resolutions), mid
block, mirrored up path; GroupNorm(32) + SiLU; cross-attention context is
the CLIP text embedding (77, 768) — the empty-prompt embedding is a buffer.
The inpaint variant takes 9 latent channels (4 noisy + 1 mask + 4 masked
latents); ControlNet mirrors the down path and injects residuals.

The denoising loop is a lax.scan over a fixed step count with a DDIM
schedule — one compile, static shapes, bfloat16-friendly.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 9              # SD inpaint: 4 + 1 + 4
    out_channels: int = 4
    block_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    attention_resolutions: Tuple[int, ...] = (0, 1, 2)  # block indices
    context_dim: int = 768
    num_heads: int = 8
    num_train_timesteps: int = 1000


def timestep_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Sinusoidal embedding (SD convention: half sin, half cos)."""
    half = dim // 2
    freqs = jnp.exp(-jnp.log(10000.0) * jnp.arange(half, dtype=jnp.float32)
                    / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class ResBlock(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x, temb):
        h = nn.GroupNorm(32, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", name="conv1")(h)
        t = nn.Dense(self.out_ch, name="temb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]
        h = nn.GroupNorm(32, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="skip")(x)
        return x + h


class TransformerBlock(nn.Module):
    """Self-attn + cross-attn + GEGLU ffn (SD spatial transformer)."""
    heads: int
    context_dim: int

    @nn.compact
    def __call__(self, x, context):
        B, H, W, C = x.shape
        residual_long = x
        x = nn.GroupNorm(32, name="norm_in")(x)
        x = nn.Conv(C, (1, 1), name="proj_in")(x)
        tokens = x.reshape(B, H * W, C)

        def attn(q_in, kv_in, name):
            d = C // self.heads
            q = nn.Dense(C, use_bias=False, name=f"{name}_q")(q_in)
            k = nn.Dense(C, use_bias=False, name=f"{name}_k")(kv_in)
            v = nn.Dense(C, use_bias=False, name=f"{name}_v")(kv_in)
            q = q.reshape(B, -1, self.heads, d).transpose(0, 2, 1, 3)
            k = k.reshape(B, -1, self.heads, d).transpose(0, 2, 1, 3)
            v = v.reshape(B, -1, self.heads, d).transpose(0, 2, 1, 3)
            a = jax.nn.softmax(
                jnp.einsum("bhqd,bhkd->bhqk", q, k,
                           preferred_element_type=jnp.float32) * d ** -0.5,
                -1).astype(v.dtype)
            o = jnp.einsum("bhqk,bhkd->bhqd", a, v)
            o = o.transpose(0, 2, 1, 3).reshape(B, -1, C)
            return nn.Dense(C, name=f"{name}_out")(o)

        normed = nn.LayerNorm(name="norm1")(tokens)
        t = tokens + attn(normed, normed, "attn1")
        ctx = jnp.broadcast_to(context, (B,) + context.shape[-2:])
        t = t + attn(nn.LayerNorm(name="norm2")(t), ctx, "attn2")
        y = nn.LayerNorm(name="norm3")(t)
        a, g = jnp.split(nn.Dense(C * 8, name="geglu")(y), 2, -1)
        t = t + nn.Dense(C, name="ffn_out")(a * nn.gelu(g))
        x = t.reshape(B, H, W, C)
        x = nn.Conv(C, (1, 1), name="proj_out")(x)
        return x + residual_long


class DownBlock(nn.Module):
    out_ch: int
    layers: int
    use_attn: bool
    cfg: UNetConfig
    downsample: bool

    @nn.compact
    def __call__(self, x, temb, context):
        skips = []
        for i in range(self.layers):
            x = ResBlock(self.out_ch, name=f"res{i}")(x, temb)
            if self.use_attn:
                x = TransformerBlock(self.cfg.num_heads, self.cfg.context_dim,
                                     name=f"attn{i}")(x, context)
            skips.append(x)
        if self.downsample:
            x = nn.Conv(self.out_ch, (3, 3), strides=(2, 2), padding="SAME",
                        name="down")(x)
            skips.append(x)
        return x, skips


class UpBlock(nn.Module):
    out_ch: int
    layers: int
    use_attn: bool
    cfg: UNetConfig
    upsample: bool

    @nn.compact
    def __call__(self, x, skips, temb, context):
        for i in range(self.layers):
            x = jnp.concatenate([x, skips.pop()], -1)
            x = ResBlock(self.out_ch, name=f"res{i}")(x, temb)
            if self.use_attn:
                x = TransformerBlock(self.cfg.num_heads, self.cfg.context_dim,
                                     name=f"attn{i}")(x, context)
        if self.upsample:
            B, H, W, C = x.shape
            x = jax.image.resize(x, (B, H * 2, W * 2, C), "nearest")
            x = nn.Conv(self.out_ch, (3, 3), padding="SAME", name="up")(x)
        return x


class UNet2DCondition(nn.Module):
    """SD-1.5-shaped conditional UNet (NHWC)."""
    cfg: UNetConfig = UNetConfig()

    @nn.compact
    def __call__(self, latents, t, context,
                 control_residuals: Optional[List[jnp.ndarray]] = None,
                 control_mid: Optional[jnp.ndarray] = None):
        c = self.cfg
        ch0 = c.block_channels[0]
        temb = timestep_embedding(t, ch0)
        temb = nn.Dense(ch0 * 4, name="time1")(temb)
        temb = nn.Dense(ch0 * 4, name="time2")(nn.silu(temb))

        x = nn.Conv(ch0, (3, 3), padding="SAME", name="conv_in")(latents)
        skips = [x]
        for i, ch in enumerate(c.block_channels):
            x, s = DownBlock(ch, c.layers_per_block,
                             i in c.attention_resolutions, c,
                             downsample=(i < len(c.block_channels) - 1),
                             name=f"down{i}")(x, temb, context)
            skips += s

        x = ResBlock(c.block_channels[-1], name="mid_res1")(x, temb)
        x = TransformerBlock(c.num_heads, c.context_dim,
                             name="mid_attn")(x, context)
        x = ResBlock(c.block_channels[-1], name="mid_res2")(x, temb)

        if control_mid is not None:
            x = x + control_mid
        if control_residuals is not None:
            skips = [s + r for s, r in zip(skips, control_residuals)]

        for i, ch in reversed(list(enumerate(c.block_channels))):
            x = UpBlock(ch, c.layers_per_block + 1,
                        i in c.attention_resolutions, c,
                        upsample=(i > 0), name=f"up{i}")(x, skips, temb,
                                                         context)

        x = nn.GroupNorm(32, name="norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(c.out_channels, (3, 3), padding="SAME",
                       name="conv_out")(x)


class ControlNet(nn.Module):
    """Mirrors the UNet down path; emits per-skip residuals + mid residual
    (ControlNet v11p inpaint in the reference)."""
    cfg: UNetConfig = UNetConfig()

    @nn.compact
    def __call__(self, latents, t, context, control_image):
        c = self.cfg
        ch0 = c.block_channels[0]
        temb = timestep_embedding(t, ch0)
        temb = nn.Dense(ch0 * 4, name="time1")(temb)
        temb = nn.Dense(ch0 * 4, name="time2")(nn.silu(temb))

        # control-image encoder (strided conv stack to latent res)
        h = control_image
        for i, ch in enumerate((16, 32, 96, 256)):
            h = nn.silu(nn.Conv(ch, (3, 3),
                                strides=(2, 2) if i else (1, 1),
                                padding="SAME", name=f"hint{i}")(h))
        hint = nn.Conv(ch0, (3, 3), padding="SAME",
                       kernel_init=nn.initializers.zeros, name="hint_out")(h)

        x = nn.Conv(ch0, (3, 3), padding="SAME", name="conv_in")(latents)
        x = x + hint
        residuals = [nn.Conv(x.shape[-1], (1, 1),
                             kernel_init=nn.initializers.zeros,
                             name="zero0")(x)]
        for i, ch in enumerate(c.block_channels):
            x, s = DownBlock(ch, c.layers_per_block,
                             i in c.attention_resolutions, c,
                             downsample=(i < len(c.block_channels) - 1),
                             name=f"down{i}")(x, temb, context)
            for j, sk in enumerate(s):
                residuals.append(nn.Conv(sk.shape[-1], (1, 1),
                                         kernel_init=nn.initializers.zeros,
                                         name=f"zero{i}_{j}")(sk))
        x = ResBlock(c.block_channels[-1], name="mid_res1")(x, temb)
        x = TransformerBlock(c.num_heads, c.context_dim,
                             name="mid_attn")(x, context)
        x = ResBlock(c.block_channels[-1], name="mid_res2")(x, temb)
        mid = nn.Conv(x.shape[-1], (1, 1), kernel_init=nn.initializers.zeros,
                      name="zero_mid")(x)
        return residuals, mid


# ------------------------------ DDIM loop ------------------------------------


def ddim_schedule(num_train_steps: int, num_steps: int
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Timesteps + alphas_cumprod for the SD linear beta schedule."""
    betas = jnp.linspace(0.00085 ** 0.5, 0.012 ** 0.5, num_train_steps) ** 2
    alphas_cumprod = jnp.cumprod(1.0 - betas)
    step = num_train_steps // num_steps
    ts = (jnp.arange(num_steps) * step)[::-1]
    return ts, alphas_cumprod


def make_inpaint_denoiser(unet_apply, controlnet_apply, context,
                          num_steps: int = 50,
                          num_train_steps: int = 1000):
    """Returns a jittable denoise(latents0, mask_latent, masked_latents,
    control_image, noise) -> denoised latents, running the full DDIM loop as
    one lax.scan (fixed shapes, one compile)."""
    ts, acp = ddim_schedule(num_train_steps, num_steps)

    def denoise(mask_latent, masked_latents, control_image, noise):
        def body(lat, i):
            t = ts[i]
            a_t = acp[t]
            prev_t = jnp.maximum(t - num_train_steps // num_steps, 0)
            a_prev = jnp.where(t > 0, acp[prev_t], 1.0)

            inp = jnp.concatenate([lat, mask_latent, masked_latents], -1)
            tb = jnp.full((lat.shape[0],), t, jnp.float32)
            res, mid = controlnet_apply(inp, tb, context, control_image)
            eps = unet_apply(inp, tb, context, res, mid)

            x0 = (lat - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
            lat_prev = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1 - a_prev) * eps
            return lat_prev, None

        lat, _ = jax.lax.scan(body, noise, jnp.arange(num_steps))
        return lat

    return denoise
