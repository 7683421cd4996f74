"""Training steps for the reduced-scale SD inpainting stack.

The reference never trains its diffusion inpainter — it downloads
runwayml/stable-diffusion-inpainting + ControlNet weights at import
(reference: core/inference/mix_methods/utils/inpainter.py:12-24). This
environment is zero-egress, so stitchax trains a reduced-scale stack
in-env instead (VERDICT r4 #3): first the VAE as a plain autoencoder,
then UNet+ControlNet with the standard epsilon-prediction denoising
objective on synthetic-hole inpainting tasks, using the exact input
recipe the inference pipeline feeds them (models/sd_pipeline.py):
9-channel UNet input = [noisy latents | hole mask latent | masked-image
latents], ControlNet conditioned on the [0,1] image with holes = -1.

Scheduler constants are the pinned SD-1.5 DDIM set (models/diffusion.py
ddim_schedule), so train-time q(z_t | z_0) matches the inference loop.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.diffusion import UNetConfig
from ..models.vae import AutoencoderKL


def sd_alphas_cumprod(num_train_steps: int = 1000) -> jnp.ndarray:
    """The pinned SD-1.5 scaled-linear schedule (tests/test_sd_scheduler)."""
    betas = jnp.linspace(0.00085 ** 0.5, 0.012 ** 0.5, num_train_steps) ** 2
    return jnp.cumprod(1.0 - betas)


def make_vae_train_step(vae: AutoencoderKL, tx: optax.GradientTransformation
                        ) -> Callable:
    """Deterministic autoencoder objective: L1 + MSE reconstruction of
    [-1, 1] images through encode_mode/decode (the inference path uses the
    posterior mode, so that is the path trained)."""

    def loss_fn(params, x):
        recon = vae.apply(params, x)
        l1 = jnp.abs(recon - x).mean()
        l2 = jnp.square(recon - x).mean()
        return l1 + l2, {"l1": l1, "l2": l2}

    def step(params, opt_state, x):
        (total, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, x)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["total"] = total
        return params, opt_state, metrics

    return step


def inpaint_model_inputs(vae: AutoencoderKL, vae_params: Any,
                         image01: jnp.ndarray, hole: jnp.ndarray
                         ) -> Tuple[jnp.ndarray, ...]:
    """The exact conditioning the inference pipeline builds
    (models/sd_pipeline.py make_sd_inpaint_fn): image01 in [0, 1],
    hole (B, H, W, 1) with 1 = hole. Returns (z0, masked_latents,
    mask_latent, control)."""
    init = image01 * 2.0 - 1.0
    masked = init * (1.0 - hole)
    z0 = vae.apply(vae_params, init, method=AutoencoderKL.encode_mode)
    z_masked = vae.apply(vae_params, masked,
                         method=AutoencoderKL.encode_mode)
    B, h8, w8, _ = z0.shape
    mask_lat = jax.image.resize(hole, (B, h8, w8, 1), "nearest")
    control = image01 * (1.0 - hole) + (-1.0) * hole
    return z0, z_masked, mask_lat, control


def make_diffusion_train_step(unet, cnet, vae: AutoencoderKL,
                              tx: optax.GradientTransformation,
                              context: jnp.ndarray,
                              num_train_steps: int = 1000) -> Callable:
    """Epsilon-prediction MSE over UNet+ControlNet jointly, VAE frozen.

    step(params={'unet', 'controlnet'}, opt_state, vae_params,
         image01 (B,H,W,3), hole (B,H,W,1), rng) -> (params, opt_state,
    metrics). The timestep and noise are drawn from `rng` per call."""
    acp = sd_alphas_cumprod(num_train_steps)

    def loss_fn(params, vae_params, image01, hole, rng):
        z0, z_masked, mask_lat, control = inpaint_model_inputs(
            vae, vae_params, image01, hole)
        z0 = jax.lax.stop_gradient(z0)
        z_masked = jax.lax.stop_gradient(z_masked)
        B = z0.shape[0]
        k_t, k_eps = jax.random.split(rng)
        t = jax.random.randint(k_t, (B,), 1, num_train_steps)
        eps = jax.random.normal(k_eps, z0.shape, z0.dtype)
        a_t = acp[t][:, None, None, None]
        lat_t = jnp.sqrt(a_t) * z0 + jnp.sqrt(1.0 - a_t) * eps

        inp = jnp.concatenate([lat_t, mask_lat, z_masked], -1)
        tb = t.astype(jnp.float32)
        ctx = jnp.broadcast_to(context, (B,) + context.shape[1:])
        res, mid = cnet.apply(params["controlnet"], lat_t, tb, ctx, control)
        eps_hat = unet.apply(params["unet"], inp, tb, ctx, res, mid)
        mse = jnp.square(eps_hat - eps).mean()
        return mse, {"mse": mse}

    def step(params, opt_state, vae_params, image01, hole, rng):
        (total, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, vae_params, image01, hole, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["total"] = total
        return params, opt_state, metrics

    return step


def save_jax_sd_checkpoint(path: str, unet_vars: Any, cnet_vars: Any,
                           vae_vars: Any, context: Any,
                           unet_kw: Dict, vae_kw: Dict,
                           preferred_strength: float = None) -> None:
    """Pack natively-trained JAX params into the checkpoint container
    (models/sd_pipeline.load_sd_checkpoint detects format='stitchax_jax'
    and skips the diffusers converters; the text context is stored
    directly — the empty prompt makes CLIP a constant).

    `preferred_strength` records the diffusers-style strength this
    checkpoint measured best at; load_sd_checkpoint adopts it when the
    caller doesn't pin one."""
    import numpy as np
    import torch

    to_np = lambda t: jax.tree_util.tree_map(
        lambda x: np.asarray(jax.device_get(x)), t)
    blob = {
        "format": "stitchax_jax",
        "configs": {"unet": dict(unet_kw), "vae": dict(vae_kw)},
        "unet_vars": to_np(unet_vars),
        "controlnet_vars": to_np(cnet_vars),
        "vae_vars": to_np(vae_vars),
        "context": np.asarray(jax.device_get(context)),
    }
    if preferred_strength is not None:
        blob["preferred_strength"] = float(preferred_strength)
    torch.save(blob, path)
