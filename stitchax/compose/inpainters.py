"""Inpainter plugins: classical push-pull, TransRef, diffusion.

Rebuilt from the reference's inpainter singletons
(reference: core/inference/mix_methods/utils/{cv_inpainter, transref_inpainter,
inpainter}.py, resolved by module name at out.py:341-347). Here each inpainter
is a small object with `.name` and `.inpaint(image, mask, control=None)`;
`get_inpainter(name)` resolves from the INPAINTERS registry.

Shapes are unbatched HWC float32 in [0, 255]; mask (H, W, 1) with 1 = hole.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..utils.registry import INPAINTERS


def _down2(img: jnp.ndarray) -> jnp.ndarray:
    """2x2 average downsample (H, W, C) -> (ceil(H/2), ceil(W/2), C)."""
    H, W, C = img.shape
    ph, pw = H % 2, W % 2
    x = jnp.pad(img, ((0, ph), (0, pw), (0, 0)))
    h2, w2 = x.shape[0] // 2, x.shape[1] // 2
    return x.reshape(h2, 2, w2, 2, C).mean((1, 3))


def push_pull_inpaint(image: jnp.ndarray, mask: jnp.ndarray,
                      smooth_iters: int = 2) -> jnp.ndarray:
    """Classical hole filling by pyramid push-pull + masked Jacobi smoothing.

    TPU-native replacement for the reference's debug-only cv2.inpaint TELEA
    (reference: core/inference/mix_methods/utils/cv_inpainter.py:27): fully
    jittable, fixed pyramid depth from static shape. Holes are filled with a
    weighted multiscale average of valid pixels, then relaxed with a few
    3x3 Jacobi iterations restricted to the hole.
    """
    H, W, C = image.shape
    hole = (mask[..., 0:1] > 0.5).astype(image.dtype)
    w = 1.0 - hole
    img = image * w

    # push: valid-weighted pyramid
    levels = [(img, w)]
    while min(levels[-1][0].shape[:2]) > 2:
        li, lw = levels[-1]
        levels.append((_down2(li), _down2(lw)))

    # pull: fill unknowns from coarser level
    li, lw = levels[-1]
    filled = li / jnp.maximum(lw, 1e-8)
    for i in range(len(levels) - 2, -1, -1):
        li, lw = levels[i]
        Hh, Ww, _ = li.shape
        up = jax.image.resize(filled, (Hh, Ww, C), method="bilinear")
        known = (lw > 1e-8).astype(image.dtype)
        filled = li / jnp.maximum(lw, 1e-8) * known + up * (1 - known)

    out = image * (1 - hole) + filled * hole
    # masked Jacobi relaxation for seam smoothness
    k = jnp.array([[0.0, 1.0, 0.0], [1.0, 0.0, 1.0], [0.0, 1.0, 0.0]],
                  image.dtype)[:, :, None, None] / 4.0
    for _ in range(smooth_iters):
        nb = jax.lax.conv_general_dilated(
            out.transpose(2, 0, 1)[..., None], k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., 0].transpose(1, 2, 0)
        out = out * (1 - hole) + nb * hole
    return out


class Inpainter:
    """Base protocol. `.inpaint(image, mask, control_image=None) -> image`."""
    name = "base"

    def inpaint(self, image, mask, control_image=None):
        raise NotImplementedError


@INPAINTERS.register("cv_inpainter")
class DiffusionJacobiInpainter(Inpainter):
    """Classical fallback, jit-compiled per shape (reference role:
    cv_inpainter.py — debug / no-weights operation)."""
    name = "cv_inpainter"

    def __init__(self):
        self._fn = jax.jit(push_pull_inpaint)

    def inpaint(self, image, mask, control_image=None):
        return self._fn(jnp.asarray(image), jnp.asarray(mask))


@INPAINTERS.register("transref_inpainter")
class TransRefInpainter(Inpainter):
    """Reference-guided transformer inpainting at fixed 512x512
    (reference: transref_inpainter.py:37-70): resize inputs to 512, normalize
    to [-1, 1], masked pixels -> per-image mean color, run TransRef with the
    control image as reference, composite `out*mask + detail*(1-mask)`,
    resize back.

    `apply_fn(detail, mask, reference) -> out` is the jitted model closure;
    without converted weights, construction requires an explicit apply_fn
    (weights ship separately — reference downloads 400_Trans.pth).
    """
    name = "transref_inpainter"

    def __init__(self, apply_fn: Optional[Callable] = None, size: int = 512):
        if apply_fn is None:
            from ..models.transref import make_default_transref_apply
            apply_fn = make_default_transref_apply()
        self.apply_fn = apply_fn
        self.size = size
        self._fn = jax.jit(self._run)

    def _run(self, image, mask, control):
        S = self.size
        H, W, _ = image.shape
        img = jax.image.resize(image, (S, S, 3), "bilinear")
        ref = jax.image.resize(control, (S, S, 3), "bilinear")
        m = (jax.image.resize(mask.astype(image.dtype), (S, S, 1),
                              "nearest") > 0.5).astype(image.dtype)
        img_n = img / 127.5 - 1.0
        ref_n = ref / 127.5 - 1.0
        mean = (img_n * (1 - m)).sum((0, 1)) / jnp.maximum(
            (1 - m).sum((0, 1)), 1.0)
        detail = img_n * (1 - m) + mean[None, None] * m
        out = self.apply_fn(detail[None], m[None], ref_n[None])[0]
        comp = out * m + detail * (1 - m)
        comp = (comp + 1.0) * 127.5
        comp = jax.image.resize(comp, (H, W, 3), "bilinear")
        return jnp.clip(comp, 0, 255)

    def inpaint(self, image, mask, control_image=None):
        control = image if control_image is None else control_image
        return self._fn(jnp.asarray(image), jnp.asarray(mask),
                        jnp.asarray(control))


@INPAINTERS.register("inpainter")
class StableDiffusionInpainter(Inpainter):
    """SD-1.5 + ControlNet inpainting (reference: inpainter.py:12-105).

    The full TPU path (stitchax.models.{vae,clip_text,diffusion,
    sd_pipeline}) activates when a packed checkpoint is supplied — via
    `ckpt=`, or the STITCHAX_SD_CKPT env var (the Stitcher constructs
    inpainters by name only). The reference downloads runwayml/lllyasviel
    CUDA weights at import (inpainter.py:13-25); this environment is
    zero-egress, so without a checkpoint construction falls back to the
    classical filler with a loud warning, keeping
    `out.py --inf_cfg *_diffusion` runnable.
    """
    name = "inpainter"

    def __init__(self, denoise_fn: Optional[Callable] = None,
                 ckpt: Optional[str] = None,
                 num_steps: int = 50,
                 strength: Optional[float] = None,
                 resize_to_area_limit: int = 750 * 750):
        import os
        self.num_steps = num_steps
        self.resize_to_area_limit = resize_to_area_limit
        ckpt = ckpt or os.environ.get("STITCHAX_SD_CKPT")
        if not ckpt:
            # fall back to the committed in-env-trained snapshot, mirroring
            # the reference's fixed-path runwayml/lllyasviel load
            # (inpainter.py:13-25) and the TransRef default
            # (models/transref.py make_default_transref_apply);
            # STITCHAX_SD_CKPT=none forces the classical fallback.
            default = os.path.join(os.path.dirname(__file__), "..", "..",
                                   "results", "sd_ckpt_r05.pt")
            if os.path.isfile(default):
                ckpt = default
        if ckpt and ckpt.lower() == "none":
            ckpt = None
        # diffusers' `strength` (1.0 = reference default, from pure
        # noise); the in-env-trained reduced checkpoints measure best
        # refining the classical fill at s<1. Resolution order:
        # explicit kwarg > STITCHAX_SD_STRENGTH > the checkpoint's own
        # preferred_strength > 1.0 (load_sd_checkpoint resolves the
        # last two when strength is None).
        env_s = os.environ.get("STITCHAX_SD_STRENGTH")
        if strength is None and env_s is not None:
            strength = float(env_s)
        self.strength = strength
        if denoise_fn is None and ckpt and os.path.isfile(ckpt):
            from ..models.sd_pipeline import load_sd_checkpoint
            denoise_fn = load_sd_checkpoint(ckpt, num_steps=num_steps,
                                            strength=strength)
            print(f"[StableDiffusionInpainter] loaded SD checkpoint {ckpt}"
                  f" (strength="
                  f"{'ckpt-preferred' if strength is None else strength})")
        self.denoise_fn = denoise_fn
        if denoise_fn is None:
            import warnings
            warnings.warn(
                "No SD checkpoint provided (pass ckpt= or set "
                "STITCHAX_SD_CKPT); the diffusion inpainter falls back to "
                "classical push-pull filling.")
            self._fallback = DiffusionJacobiInpainter()

    def inpaint(self, image, mask, control_image=None):
        if self.denoise_fn is None:
            return self._fallback.inpaint(image, mask)
        img = jnp.asarray(image)
        msk = jnp.asarray(mask)
        H, W, _ = img.shape
        # area-limit resize before denoising, then back
        # (reference: inpainter.py:85-100, inf_configs/*.py:54)
        if H * W > self.resize_to_area_limit:
            s = (self.resize_to_area_limit / (H * W)) ** 0.5
            nh = max(int(H * s) // 8 * 8, 8)
            nw = max(int(W * s) // 8 * 8, 8)
            small = jax.image.resize(img, (nh, nw, 3), "bilinear")
            msk_s = (jax.image.resize(msk, (nh, nw, 1), "nearest") > 0.5
                     ).astype(img.dtype)
            out = self.denoise_fn(small, msk_s, self.num_steps)
            out = jax.image.resize(out, (H, W, 3), "bilinear")
            return img * (1 - msk) + out * msk
        return self.denoise_fn(img, msk, self.num_steps)


def get_inpainter(name: str, **kwargs) -> Inpainter:
    cls = INPAINTERS.get(name)
    return cls(**kwargs)
