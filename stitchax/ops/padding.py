"""Input padding + host-side forward flow interpolation.

Rebuild of reference core/utils/utils.py:7-60 for NHWC arrays.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np


class InputPadder:
    """Pads NHWC images so H/W are divisible by 8
    (reference: core/utils/utils.py:7-30)."""

    def __init__(self, shape: Tuple[int, ...], mode: str = "sintel",
                 multiple: int = 8):
        self.ht, self.wd = shape[-3], shape[-2]
        m = multiple
        pad_ht = (((self.ht // m) + 1) * m - self.ht) % m
        pad_wd = (((self.wd // m) + 1) * m - self.wd) % m
        self.mode = mode
        if mode == "sintel":
            self._pad = (pad_wd // 2, pad_wd - pad_wd // 2,
                         pad_ht // 2, pad_ht - pad_ht // 2)
        elif mode == "downzero":
            self._pad = (0, pad_wd, 0, pad_ht)
        else:
            self._pad = (pad_wd // 2, pad_wd - pad_wd // 2, 0, pad_ht)

    def pad(self, *inputs) -> List[jnp.ndarray]:
        l, r, t, b = self._pad
        pads = ((0, 0), (t, b), (l, r), (0, 0))
        mode = "constant" if self.mode == "downzero" else "edge"
        return [jnp.pad(x, pads, mode=mode) for x in inputs]

    def unpad(self, x: jnp.ndarray) -> jnp.ndarray:
        l, r, t, b = self._pad
        ht, wd = x.shape[-3], x.shape[-2]
        return x[..., t:ht - b, l:wd - r, :]


def forward_interpolate(flow: np.ndarray) -> np.ndarray:
    """Host-side forward-splat of a flow field onto the next frame's grid by
    scattered interpolation (reference: core/utils/utils.py:32-59; used for
    warm-start flow initialization between video frames). flow: (H, W, 2)."""
    from scipy import interpolate as sinterp

    dx, dy = flow[..., 0], flow[..., 1]
    ht, wd = dx.shape
    x0, y0 = np.meshgrid(np.arange(wd), np.arange(ht))
    x1 = (x0 + dx).reshape(-1)
    y1 = (y0 + dy).reshape(-1)
    dxf = dx.reshape(-1)
    dyf = dy.reshape(-1)

    valid = (x1 > 0) & (x1 < wd) & (y1 > 0) & (y1 < ht)
    x1, y1, dxf, dyf = x1[valid], y1[valid], dxf[valid], dyf[valid]

    fx = sinterp.griddata((x1, y1), dxf, (x0, y0), method="nearest",
                          fill_value=0)
    fy = sinterp.griddata((x1, y1), dyf, (x0, y0), method="nearest",
                          fill_value=0)
    return np.stack([fx, fy], -1).astype(np.float32)
