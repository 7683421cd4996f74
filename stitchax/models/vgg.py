"""VGG16 feature extractor + perceptual/style losses (for TransRef training).

Rebuild of reference .../TransRef/models/loss.py:5-192: torchvision vgg16
features sliced at every reluX_Y activation, L1 perceptual loss over
relu{1..5}_1 and L1 style loss over Gram matrices of relu2_2/3_3/4_3/5_2.
Weights convert from torchvision's `features` Sequential via
stitchax.convert.conv_kernel (indices below mirror the torch slicing).
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
from flax import linen as nn

# (name, out_channels, pool_before) mirroring torchvision vgg16.features.
# conv5_2/conv5_3 are deliberately ABSENT: the reference's sliced VGG
# reuses its relu5_1 block (pool + conv5_1 + relu) for relu5_2 and
# relu5_3 (an upstream bug at loss.py:96-97 — `self.relu5_1(relu5_1)`),
# so the torchvision conv5_2/conv5_3 weights are dead in its executed
# loss. The forward below reproduces that exactly.
VGG16_LAYOUT = [
    ("conv1_1", 64, False), ("conv1_2", 64, False),
    ("conv2_1", 128, True), ("conv2_2", 128, False),
    ("conv3_1", 256, True), ("conv3_2", 256, False), ("conv3_3", 256, False),
    ("conv4_1", 512, True), ("conv4_2", 512, False), ("conv4_3", 512, False),
    ("conv5_1", 512, True),
]


class VGG16Features(nn.Module):
    """Returns the dict of reluX_Y activations (NHWC). The reference feeds
    its loss VGG the raw [-1, 1] model outputs with NO ImageNet
    normalization (TransRef.py:1023-1024 -> loss.py:79); callers should do
    the same for parity."""

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        feats = {}
        conv5_1 = None
        for name, ch, pool in VGG16_LAYOUT:
            conv = nn.Conv(ch, (3, 3), padding="SAME", name=name)
            if name == "conv5_1":
                conv5_1 = conv
            if pool:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.relu(conv(x))
            feats["relu" + name[4:]] = x
        # reference quirk (loss.py:96-97): relu5_2/relu5_3 re-apply the
        # relu5_1 block (pool + conv5_1 + relu) instead of conv5_2/conv5_3
        block5_1 = lambda t: nn.relu(
            conv5_1(nn.max_pool(t, (2, 2), strides=(2, 2))))
        feats["relu5_2"] = block5_1(feats["relu5_1"])
        feats["relu5_3"] = block5_1(feats["relu5_2"])
        return feats


def gram_matrix(f: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, C, C) normalized Gram (reference: loss.py:133-139)."""
    B, H, W, C = f.shape
    m = f.reshape(B, H * W, C)
    return jnp.einsum("bnc,bnd->bcd", m, m) / (H * W * C)


def perceptual_loss(feats_x: Dict, feats_y: Dict,
                    weights: List[float] = (1.0,) * 5) -> jnp.ndarray:
    """(reference: loss.py:155-180)."""
    total = 0.0
    for w, layer in zip(weights, ("relu1_1", "relu2_1", "relu3_1",
                                  "relu4_1", "relu5_1")):
        total += w * jnp.abs(feats_x[layer] - feats_y[layer]).mean()
    return total


def style_loss(feats_x: Dict, feats_y: Dict) -> jnp.ndarray:
    """(reference: loss.py:121-152)."""
    total = 0.0
    for layer in ("relu2_2", "relu3_3", "relu4_3", "relu5_2"):
        total += jnp.abs(gram_matrix(feats_x[layer])
                         - gram_matrix(feats_y[layer])).mean()
    return total


def transref_total_loss(vgg_apply, pred, target, mask,
                        l1_weight: float = 1.0, perc_weight: float = 0.1,
                        style_weight: float = 250.0):
    """TransRef training objective: L1 + VGG perceptual + style Gram
    (reference: TransRef.py:1021-1026). pred/target in [-1, 1] NHWC —
    fed to the VGG RAW, with no [0,1] rescale or ImageNet normalization,
    exactly as the reference does (loss.py:79,144)."""
    l1 = jnp.abs(pred - target).mean()
    fx = vgg_apply(pred)
    fy = vgg_apply(target)
    perc = perceptual_loss(fx, fy)
    style = style_loss(fx, fy)
    total = l1_weight * l1 + perc_weight * perc + style_weight * style
    return dict(total=total, l1=l1, perceptual=perc, style=style)


def feature_total_loss(feats_apply, pred, target, mask,
                       l1_weight: float = 1.0, perc_weight: float = 0.04,
                       style_weight: float = 250.0):
    """transref_total_loss with a GENERIC multi-scale feature extractor
    (`feats_apply(x) -> list of NHWC maps`) in place of the VGG stack.

    The reference trains with pretrained-VGG perceptual+style terms
    (reference: TransRef/models/loss.py:6-192); no torchvision weights
    exist in this env, so the round-4 weights were trained against a
    random-init VGG. This variant swaps in a TRAINED in-env feature
    network (the flagship twins encoder) as the training-grade perceptual
    signal (VERDICT r4 #4). The reference-pinned VGG objective above stays
    for the parity tests; this is a documented training-time deviation."""
    l1 = jnp.abs(pred - target).mean()
    fx = feats_apply(pred)
    fy = feats_apply(target)
    perc = sum(jnp.abs(a - b).mean() for a, b in zip(fx, fy))
    style = sum(jnp.abs(gram_matrix(a) - gram_matrix(b)).mean()
                for a, b in zip(fx, fy))
    total = l1_weight * l1 + perc_weight * perc + style_weight * style
    return dict(total=total, l1=l1, perceptual=perc, style=style)


def convert_vgg16_features(sd) -> Dict:
    """torchvision vgg16 `features.*` state dict -> VGG16Features params.
    Conv indices in the torch Sequential: 0,2,5,7,10,12,14,17,19,21,24
    (reference slicing at loss.py:31-69); features.26/28 (conv5_2/5_3)
    are dead in the reference's executed loss (see VGG16_LAYOUT note) and
    are not converted."""
    from ..convert import conv_kernel, _np
    idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    params = {}
    for (name, _, _), i in zip(VGG16_LAYOUT, idx):
        params[name] = {
            "kernel": conv_kernel(sd[f"features.{i}.weight"]),
            "bias": _np(sd[f"features.{i}.bias"]),
        }
    return {"params": params}
