"""torchvision.transforms stand-in: only Resize on tensors, bilinear
without antialias (the pre-0.13 tensor behavior the reference era used;
stitchax ops/sampling.resize_image_b matches the same formulation)."""

import torch.nn as nn
import torch.nn.functional as F

from . import functional  # noqa: F401  (reference uses transforms.functional.crop)


class Resize(nn.Module):
    def __init__(self, size, **kwargs):
        super().__init__()
        self.size = tuple(size) if not isinstance(size, int) else (size, size)

    def forward(self, x):
        squeeze = x.ndim == 3
        if squeeze:
            x = x[None]
        out = F.interpolate(x, size=self.size, mode="bilinear",
                            align_corners=False)
        return out[0] if squeeze else out
