"""ResNet-50 feature stages in Flax (NHWC).

The UDIS2 homography backbone uses torchvision resnet50 through layer2 as
"stage1" (1/8 res, 512 ch) and layer3 as "stage2" (1/16 res, 1024 ch)
(reference: core/UDIS2/Homography/network.py:103-118).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class Bottleneck(nn.Module):
    """torchvision Bottleneck: 1x1 -> 3x3(stride) -> 1x1(x4) + downsample."""
    features: int
    stride: int = 1
    use_projection: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(use_running_average=not train,
                                         momentum=0.9, epsilon=1e-5, name=name)
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(norm("bn1")(y))
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False, name="conv2")(y)
        y = nn.relu(norm("bn2")(y))
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, name="conv3")(y)
        y = norm("bn3")(y)
        if self.use_projection:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, name="downsample_conv")(x)
            residual = norm("downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet50Stages(nn.Module):
    """Stem + layer1..layerN of resnet50; returns the outputs of the last two
    requested layers (stage1=through layer2 at 1/8, stage2=layer3 at 1/16)."""
    layers: Sequence[int] = (3, 4, 6)       # layer1, layer2, layer3
    features: Sequence[int] = (64, 128, 256)

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(use_running_average=not train,
                                         momentum=0.9, epsilon=1e-5, name=name)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, name="conv1")(x)
        x = nn.relu(norm("bn1")(x))
        # torch maxpool k3 s2 p1
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        outs = []
        for li, (n_blocks, feats) in enumerate(zip(self.layers, self.features)):
            stride = 1 if li == 0 else 2
            for b in range(n_blocks):
                x = Bottleneck(feats, stride=stride if b == 0 else 1,
                               use_projection=(b == 0),
                               name=f"layer{li + 1}_block{b}")(x, train)
            outs.append(x)
        return outs
