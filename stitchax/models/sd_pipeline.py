"""End-to-end SD + ControlNet inpainting pipeline assembly.

Mirrors the reference's StableDiffusionControlNetInpaintPipeline call
(reference: core/inference/mix_methods/utils/inpainter.py:12-105) as pure
jax: CLIP empty-prompt context -> VAE-encode the masked image -> DDIM
lax.scan over UNet+ControlNet -> VAE-decode -> overlay outside the mask.

Notes on fidelity:
- prompt is "" in the reference, so classifier-free guidance is an exact
  no-op (eps_uncond == eps_cond) and a single conditional forward suffices;
- the posterior mode replaces posterior sampling (deterministic);
- the initial noise uses a fixed PRNG seed (the reference uses torch's
  unseeded global generator).

Checkpoint container: a torch.save'd dict with diffusers state dicts under
keys {"unet", "controlnet", "vae", "clip"} (zero-egress env — the
reference's runwayml/lllyasviel downloads must be converted offline into
this container; see tools/pack_sd_checkpoint.py). An optional "configs"
entry ({"unet": UNetConfig kwargs, "vae": AutoencoderKL kwargs, "clip":
ClipTextEncoder kwargs}) sizes the models to whatever was packed; absent,
the SD-1.5 defaults apply. tools/make_random_sd_checkpoint.py uses this to
drive the REAL UNet+ControlNet+VAE DDIM plugin path at reduced scale
in-environment (no weights ship with the reference either).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from .clip_text import (ClipTextEncoder, convert_clip_text,
                        empty_prompt_tokens)
from .diffusion import (ControlNet, UNetConfig, UNet2DCondition,
                        convert_controlnet, convert_sd_unet,
                        make_inpaint_denoiser)
from .vae import AutoencoderKL, convert_vae


def make_sd_inpaint_fn(unet_vars: Any, controlnet_vars: Any, vae_vars: Any,
                       context: jnp.ndarray,
                       cfg: UNetConfig = UNetConfig(),
                       vae: Optional[AutoencoderKL] = None,
                       num_steps: int = 50, seed: int = 0,
                       strength: float = 1.0) -> Callable:
    """Returns inpaint_fn(image [0,255] HWC, mask HW1, num_steps_unused)
    -> image [0,255], fully traceable (runs inside the stitcher's jitted
    TPS/mix stage as one program).

    `strength` is the diffusers inpaint-pipeline parameter (1.0 = the
    reference's from-pure-noise operating point). With s < 1 the DDIM
    trajectory starts from the classical push-pull fill of the hole,
    noised to the matching schedule point, and the model refines it —
    the recommended mode for the reduced-scale in-env-trained
    checkpoints (see make_inpaint_denoiser)."""
    unet = UNet2DCondition(cfg)
    cnet = ControlNet(cfg)
    vae = vae or AutoencoderKL()

    unet_apply = lambda lat, t, ctx, res, mid: unet.apply(
        unet_vars, lat, t, ctx, res, mid)
    cnet_apply = lambda lat, t, ctx, ctrl: cnet.apply(
        controlnet_vars, lat, t, ctx, ctrl)
    denoise = make_inpaint_denoiser(unet_apply, cnet_apply, context,
                                    num_steps=num_steps,
                                    num_train_steps=cfg.num_train_timesteps,
                                    strength=strength)
    key = jax.random.PRNGKey(seed)

    def inpaint_fn(image, mask, _num_steps_unused=None):
        H, W, _ = image.shape
        hole = (mask[..., :1] > 0.5).astype(image.dtype)
        init = image / 127.5 - 1.0                      # [-1, 1]
        masked = init * (1.0 - hole)
        lat_masked = vae.apply(vae_vars, masked[None],
                               method=AutoencoderKL.encode_mode)
        h8, w8 = lat_masked.shape[1], lat_masked.shape[2]
        mask_lat = jax.image.resize(hole, (h8, w8, 1), "nearest")[None]
        # control = [0,1] image with holes set to -1
        # (reference make_inpaint_condition, inpainter.py:27-36)
        control = (image / 255.0) * (1.0 - hole) + (-1.0) * hole
        noise = jax.random.normal(key, lat_masked.shape, lat_masked.dtype)
        init_lat = None
        if strength < 1.0:
            from ..compose.inpainters import push_pull_inpaint
            filled = push_pull_inpaint(image, hole) / 127.5 - 1.0
            init_lat = vae.apply(vae_vars, filled[None],
                                 method=AutoencoderKL.encode_mode)
        lat = denoise(mask_lat, lat_masked, control[None], noise, init_lat)
        out = vae.apply(vae_vars, lat, method=AutoencoderKL.decode)[0]
        out = jnp.clip((out + 1.0) * 127.5, 0.0, 255.0)
        # apply_overlay: original pixels outside the mask
        # (reference inpainter.py:38-72)
        return image * (1.0 - hole) + out * hole

    return inpaint_fn


def load_sd_checkpoint(path: str, cfg: Optional[UNetConfig] = None,
                       num_steps: int = 50, seed: int = 0,
                       strength: Optional[float] = None) -> Callable:
    """Convert a packed torch checkpoint into a ready inpaint_fn.

    Model sizes come from the blob's optional "configs" entry (see module
    docstring); an explicit `cfg` argument overrides the packed UNet config.
    `strength=None` defers to the checkpoint's "preferred_strength" entry
    (the operating point measured best at train time; 1.0 — the reference's
    from-pure-noise mode — when the blob carries none).
    """
    import torch

    blobs = torch.load(path, map_location="cpu", weights_only=False)
    configs = blobs.get("configs", {})
    if strength is None:
        strength = float(blobs.get("preferred_strength", 1.0))
    if blobs.get("format") == "stitchax_jax":
        # natively-trained stitchax params (train/sd_inpaint_trainer.py
        # save_jax_sd_checkpoint): no diffusers conversion; the empty-prompt
        # CLIP context is a constant and ships precomputed
        if cfg is None:
            cfg = UNetConfig(**configs.get("unet", {}))
        vae = AutoencoderKL(**configs.get("vae", {}))
        as_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
        return make_sd_inpaint_fn(
            as_jnp(blobs["unet_vars"]), as_jnp(blobs["controlnet_vars"]),
            as_jnp(blobs["vae_vars"]), jnp.asarray(blobs["context"]),
            cfg=cfg, vae=vae, num_steps=num_steps, seed=seed,
            strength=strength)
    if cfg is None:
        cfg = UNetConfig(**configs.get("unet", {}))
    vae = AutoencoderKL(**configs.get("vae", {}))
    clip = ClipTextEncoder(**configs.get("clip", {}))
    as_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    unet_vars = as_jnp(convert_sd_unet(blobs["unet"], cfg))
    cnet_vars = as_jnp(convert_controlnet(blobs["controlnet"], cfg))
    vae_vars = as_jnp(convert_vae(blobs["vae"]))
    clip_vars = as_jnp(convert_clip_text(blobs["clip"]))
    context = clip.apply(clip_vars, empty_prompt_tokens())
    return make_sd_inpaint_fn(unet_vars, cnet_vars, vae_vars, context,
                              cfg=cfg, vae=vae, num_steps=num_steps,
                              seed=seed, strength=strength)
