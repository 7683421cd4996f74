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
    norm_groups: int = 32             # GroupNorm groups (32 in SD)


def timestep_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Sinusoidal embedding (SD convention: half sin, half cos)."""
    half = dim // 2
    freqs = jnp.exp(-jnp.log(10000.0) * jnp.arange(half, dtype=jnp.float32)
                    / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class ResBlock(nn.Module):
    out_ch: int
    groups: int = 32

    @nn.compact
    def __call__(self, x, temb):
        h = nn.GroupNorm(self.groups, epsilon=1e-5, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", name="conv1")(h)
        t = nn.Dense(self.out_ch, name="temb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]
        h = nn.GroupNorm(self.groups, epsilon=1e-5, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="skip")(x)
        return x + h


class TransformerBlock(nn.Module):
    """Self-attn + cross-attn + GEGLU ffn (SD spatial transformer)."""
    heads: int
    context_dim: int
    groups: int = 32

    @nn.compact
    def __call__(self, x, context):
        B, H, W, C = x.shape
        residual_long = x
        x = nn.GroupNorm(self.groups, epsilon=1e-6, name="norm_in")(x)
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

        normed = nn.LayerNorm(epsilon=1e-5, name="norm1")(tokens)
        t = tokens + attn(normed, normed, "attn1")
        ctx = jnp.broadcast_to(context, (B,) + context.shape[-2:])
        t = t + attn(nn.LayerNorm(epsilon=1e-5, name="norm2")(t), ctx, "attn2")
        y = nn.LayerNorm(epsilon=1e-5, name="norm3")(t)
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
            x = ResBlock(self.out_ch, self.cfg.norm_groups,
                         name=f"res{i}")(x, temb)
            if self.use_attn:
                x = TransformerBlock(self.cfg.num_heads, self.cfg.context_dim,
                                     self.cfg.norm_groups,
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
            x = ResBlock(self.out_ch, self.cfg.norm_groups,
                         name=f"res{i}")(x, temb)
            if self.use_attn:
                x = TransformerBlock(self.cfg.num_heads, self.cfg.context_dim,
                                     self.cfg.norm_groups,
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

        x = ResBlock(c.block_channels[-1], c.norm_groups,
                     name="mid_res1")(x, temb)
        x = TransformerBlock(c.num_heads, c.context_dim, c.norm_groups,
                             name="mid_attn")(x, context)
        x = ResBlock(c.block_channels[-1], c.norm_groups,
                     name="mid_res2")(x, temb)

        if control_mid is not None:
            x = x + control_mid
        if control_residuals is not None:
            skips = [s + r for s, r in zip(skips, control_residuals)]

        for i, ch in reversed(list(enumerate(c.block_channels))):
            x = UpBlock(ch, c.layers_per_block + 1,
                        i in c.attention_resolutions, c,
                        upsample=(i > 0), name=f"up{i}")(x, skips, temb,
                                                         context)

        x = nn.GroupNorm(c.norm_groups, epsilon=1e-5, name="norm_out")(x)
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

        # control-image encoder: conv_in + 6 blocks (stride 2 on the odd
        # ones) + zero conv_out — exactly diffusers'
        # ControlNetConditioningEmbedding so checkpoints convert 1:1
        h = nn.silu(nn.Conv(16, (3, 3), padding="SAME",
                            name="hint_in")(control_image))
        for i, ch in enumerate((16, 32, 32, 96, 96, 256)):
            h = nn.silu(nn.Conv(ch, (3, 3),
                                strides=(2, 2) if i % 2 else (1, 1),
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
        x = ResBlock(c.block_channels[-1], c.norm_groups,
                     name="mid_res1")(x, temb)
        x = TransformerBlock(c.num_heads, c.context_dim, c.norm_groups,
                             name="mid_attn")(x, context)
        x = ResBlock(c.block_channels[-1], c.norm_groups,
                     name="mid_res2")(x, temb)
        mid = nn.Conv(x.shape[-1], (1, 1), kernel_init=nn.initializers.zeros,
                      name="zero_mid")(x)
        return residuals, mid


# ------------------------------ DDIM loop ------------------------------------


def ddim_schedule(num_train_steps: int, num_steps: int
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Timesteps + alphas_cumprod for the SD-1.5 scheduler constants.

    Pinned to the published runwayml/stable-diffusion-inpainting scheduler
    config (the checkpoint the reference loads,
    core/inference/mix_methods/utils/inpainter.py:12-19): beta_schedule
    'scaled_linear' with beta_start=0.00085, beta_end=0.012,
    num_train_timesteps=1000, i.e. betas = linspace(sqrt(b0), sqrt(b1), T)^2;
    timestep spacing is the 'leading' rule with steps_offset=1:
    t_i = i * (T // S) + 1, iterated high-to-low. Numerically asserted
    against float64 goldens in tests/test_sd_scheduler.py.
    """
    betas = jnp.linspace(0.00085 ** 0.5, 0.012 ** 0.5, num_train_steps) ** 2
    alphas_cumprod = jnp.cumprod(1.0 - betas)
    step = num_train_steps // num_steps
    ts = (jnp.arange(num_steps) * step)[::-1] + 1
    return ts, alphas_cumprod


def make_inpaint_denoiser(unet_apply, controlnet_apply, context,
                          num_steps: int = 50,
                          num_train_steps: int = 1000,
                          strength: float = 1.0):
    """Returns a jittable denoise(latents0, mask_latent, masked_latents,
    control_image, noise[, init_latents]) -> denoised latents, running the
    full DDIM loop as one lax.scan (fixed shapes, one compile).

    `strength` follows the diffusers inpaint-pipeline parameter of the
    same name (StableDiffusionControlNetInpaintPipeline.get_timesteps
    semantics): 1.0 (the reference's operating point) denoises all
    `num_steps` from pure noise; s < 1 noises `init_latents` to the
    schedule point floor((1-s)*num_steps) and denoises the remaining
    round(s*num_steps) steps — the SDEdit-style refinement arm the
    in-env-trained reduced checkpoints use (they refine a classical fill
    rather than hallucinate from scratch; measured +0.2..0.5 dB hole
    PSNR, tools/train_sd_inpaint_learns.py round-5 campaign)."""
    ts, acp = ddim_schedule(num_train_steps, num_steps)
    j0 = int(round((1.0 - float(strength)) * num_steps))
    j0 = max(0, min(j0, num_steps - 1))

    def denoise(mask_latent, masked_latents, control_image, noise,
                init_latents=None):
        def body(lat, i):
            t = ts[i]
            a_t = acp[t]
            # DDIMScheduler.step semantics: prev_timestep may go negative at
            # the last step; then alpha_prev = final_alpha_cumprod, which for
            # SD-1.5 (set_alpha_to_one=False) is alphas_cumprod[0], NOT 1.0.
            prev_t = t - num_train_steps // num_steps
            a_prev = jnp.where(prev_t >= 0, acp[jnp.maximum(prev_t, 0)],
                               acp[0])

            inp = jnp.concatenate([lat, mask_latent, masked_latents], -1)
            tb = jnp.full((lat.shape[0],), t, jnp.float32)
            # ControlNet sees the bare 4-channel latents — the 9-channel
            # concat feeds only the inpaint UNet (diffusers
            # StableDiffusionControlNetInpaintPipeline semantics)
            res, mid = controlnet_apply(lat, tb, context, control_image)
            eps = unet_apply(inp, tb, context, res, mid)

            x0 = (lat - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
            lat_prev = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1 - a_prev) * eps
            return lat_prev, None

        if j0 == 0 or init_latents is None:
            lat0 = noise
            lat, _ = jax.lax.scan(body, lat0, jnp.arange(num_steps))
        else:
            t0 = ts[j0]
            lat0 = (jnp.sqrt(acp[t0]) * init_latents
                    + jnp.sqrt(1.0 - acp[t0]) * noise)
            lat, _ = jax.lax.scan(body, lat0, jnp.arange(j0, num_steps))
        return lat

    return denoise


# ------------------------------ converters -----------------------------------


def _sd_res(sd, p):
    from ..convert import _convp, _lin, norm_params
    out = {"norm1": norm_params(f"{p}.norm1", sd),
           "conv1": _convp(sd, f"{p}.conv1"),
           "temb_proj": _lin(sd, f"{p}.time_emb_proj"),
           "norm2": norm_params(f"{p}.norm2", sd),
           "conv2": _convp(sd, f"{p}.conv2")}
    if f"{p}.conv_shortcut.weight" in sd:
        out["skip"] = _convp(sd, f"{p}.conv_shortcut")
    return out


def _sd_attn(sd, p):
    from ..convert import _convp, _lin, norm_params
    tb = f"{p}.transformer_blocks.0"
    out = {"norm_in": norm_params(f"{p}.norm", sd),
           "proj_in": _convp(sd, f"{p}.proj_in"),
           "proj_out": _convp(sd, f"{p}.proj_out"),
           "norm1": norm_params(f"{tb}.norm1", sd),
           "norm2": norm_params(f"{tb}.norm2", sd),
           "norm3": norm_params(f"{tb}.norm3", sd),
           "geglu": _lin(sd, f"{tb}.ff.net.0.proj"),
           "ffn_out": _lin(sd, f"{tb}.ff.net.2")}
    for a in ("attn1", "attn2"):
        out[f"{a}_q"] = _lin(sd, f"{tb}.{a}.to_q")
        out[f"{a}_k"] = _lin(sd, f"{tb}.{a}.to_k")
        out[f"{a}_v"] = _lin(sd, f"{tb}.{a}.to_v")
        out[f"{a}_out"] = _lin(sd, f"{tb}.{a}.to_out.0")
    return out


def _sd_backbone(sd, params, cfg: UNetConfig):
    """Shared conv_in/time/down/mid mapping (UNet and ControlNet)."""
    from ..convert import _convp, _lin, norm_params
    params["conv_in"] = _convp(sd, "conv_in")
    params["time1"] = _lin(sd, "time_embedding.linear_1")
    params["time2"] = _lin(sd, "time_embedding.linear_2")
    n = len(cfg.block_channels)
    for i in range(n):
        blk: dict = {}
        for j in range(cfg.layers_per_block):
            blk[f"res{j}"] = _sd_res(sd, f"down_blocks.{i}.resnets.{j}")
            if i in cfg.attention_resolutions:
                blk[f"attn{j}"] = _sd_attn(sd,
                                           f"down_blocks.{i}.attentions.{j}")
        if i < n - 1:
            blk["down"] = _convp(sd, f"down_blocks.{i}.downsamplers.0.conv")
        params[f"down{i}"] = blk
    params["mid_res1"] = _sd_res(sd, "mid_block.resnets.0")
    params["mid_attn"] = _sd_attn(sd, "mid_block.attentions.0")
    params["mid_res2"] = _sd_res(sd, "mid_block.resnets.1")


def convert_sd_unet(sd, cfg: UNetConfig = UNetConfig()):
    """diffusers UNet2DConditionModel (SD-1.5 inpaint) state dict ->
    UNet2DCondition params. diffusers up_blocks.k maps to our up{n-1-k}
    (our index tracks block_channels position; diffusers' tracks order of
    execution)."""
    from ..convert import _convp, norm_params
    params: dict = {}
    _sd_backbone(sd, params, cfg)
    n = len(cfg.block_channels)
    for k in range(n):
        i = n - 1 - k
        blk: dict = {}
        for j in range(cfg.layers_per_block + 1):
            blk[f"res{j}"] = _sd_res(sd, f"up_blocks.{k}.resnets.{j}")
            if i in cfg.attention_resolutions:
                blk[f"attn{j}"] = _sd_attn(sd,
                                           f"up_blocks.{k}.attentions.{j}")
        if i > 0:
            blk["up"] = _convp(sd, f"up_blocks.{k}.upsamplers.0.conv")
        params[f"up{i}"] = blk
    params["norm_out"] = norm_params("conv_norm_out", sd)
    params["conv_out"] = _convp(sd, "conv_out")
    return {"params": params}


def convert_controlnet(sd, cfg: UNetConfig = UNetConfig()):
    """diffusers ControlNetModel (v11p inpaint) state dict -> ControlNet
    params. controlnet_down_blocks.{0..11} are the per-skip zero convs in
    walk order (conv_in, then each down block's layers + downsampler)."""
    from ..convert import _convp
    params: dict = {}
    _sd_backbone(sd, params, cfg)
    params["hint_in"] = _convp(sd, "controlnet_cond_embedding.conv_in")
    for i in range(6):
        params[f"hint{i}"] = _convp(sd,
                                    f"controlnet_cond_embedding.blocks.{i}")
    params["hint_out"] = _convp(sd, "controlnet_cond_embedding.conv_out")

    params["zero0"] = _convp(sd, "controlnet_down_blocks.0")
    flat = 1
    n = len(cfg.block_channels)
    for i in range(n):
        per = cfg.layers_per_block + (1 if i < n - 1 else 0)
        for j in range(per):
            params[f"zero{i}_{j}"] = _convp(
                sd, f"controlnet_down_blocks.{flat}")
            flat += 1
    params["zero_mid"] = _convp(sd, "controlnet_mid_block")
    return {"params": params}
