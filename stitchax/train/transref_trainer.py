"""TransRef training harness (reference-guided inpainting).

Rebuild of the vendored TransRef train loop (reference:
.../TransRef/{train.py, models/TransRef.py:1015-1045, options/base_options.py}):
objective = 1·L1 + 0.04·VGG-perceptual + 250·style-Gram on the raw model
output vs the ground-truth image, Adam, masked-input preparation via
`set_input` semantics (masked pixels -> per-image mean color; the 6-channel
input is image ⊕ inverted mask; reference TransRef.py:1006-1012).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.transref import TransRefBase
from ..models.vgg import transref_total_loss


@dataclass(frozen=True)
class TransRefLossConfig:
    lambda_l1: float = 1.0
    lambda_perceptual: float = 0.04
    lambda_style: float = 250.0


def random_rect_masks(rng: jax.Array, batch: int, size: int,
                      num_rects: int = 3, max_frac: float = 0.5
                      ) -> jnp.ndarray:
    """Random rectangular hole masks (B, S, S, 1), 1 = hole. The reference
    trains on an irregular-mask dataset plus a random 64x64 local crop
    (TransRef.py:992-994); rectangles are the self-contained stand-in."""
    keys = jax.random.split(rng, 4)
    max_side = int(size * max_frac)
    x0 = jax.random.randint(keys[0], (batch, num_rects), 0, size - 8)
    y0 = jax.random.randint(keys[1], (batch, num_rects), 0, size - 8)
    w = jax.random.randint(keys[2], (batch, num_rects), 8, max_side)
    h = jax.random.randint(keys[3], (batch, num_rects), 8, max_side)
    xs = jnp.arange(size)
    mask = jnp.zeros((batch, size, size), jnp.float32)
    for r in range(num_rects):
        in_x = ((xs[None, None, :] >= x0[:, r, None, None])
                & (xs[None, None, :] < (x0 + w)[:, r, None, None]))
        in_y = ((xs[None, :, None] >= y0[:, r, None, None])
                & (xs[None, :, None] < (y0 + h)[:, r, None, None]))
        mask = jnp.maximum(mask, (in_x & in_y).astype(jnp.float32))
    return mask[..., None]


def prepare_inputs(gt: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """set_input semantics: masked pixels replaced by the per-image mean of
    the visible region (reference: TransRef.py:1006-1012). gt in [-1, 1]."""
    vis = 1.0 - mask
    mean = (gt * vis).sum((1, 2)) / jnp.maximum(vis.sum((1, 2)), 1.0)
    return gt * vis + mean[:, None, None, :] * mask


def make_transref_train_step(model: TransRefBase, vgg_apply: Callable,
                             tx: optax.GradientTransformation,
                             cfg: TransRefLossConfig = TransRefLossConfig(),
                             total_loss: Callable = transref_total_loss):
    """Returns train_step(params, opt_state, gt, ref, mask) ->
    (params, opt_state, metrics). gt/ref in [-1, 1] NHWC; mask (B,S,S,1).

    `total_loss(feats_apply, pred, target, mask, ...)` defaults to the
    reference-pinned VGG objective; pass models.vgg.feature_total_loss
    (with a twins feats_apply) for the trained-feature variant."""

    def loss_fn(params, gt, ref, mask):
        detail = prepare_inputs(gt, mask)
        out = model.apply(params, detail, mask, ref)
        losses = total_loss(vgg_apply, out, gt, mask,
                            l1_weight=cfg.lambda_l1,
                            perc_weight=cfg.lambda_perceptual,
                            style_weight=cfg.lambda_style)
        return losses["total"], losses

    def train_step(params, opt_state, gt, ref, mask):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, gt, ref, mask)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return train_step
