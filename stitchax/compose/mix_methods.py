"""Mix methods: combine TPS/flow warps and drive the inpainter.

Rebuilt from the reference plugins
(reference: core/inference/mix_methods/all_img1_with_inpaint.py:8-114 and
inpaint_all_area.py:8-74). All mask algebra is jittable; the single
inpainter call is the only externally-supplied function, mirroring the
reference's inpaint_fn closure (out.py:235-236).

Shapes are unbatched HWC: images (H, W, 3), masks (H, W, 1).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax.numpy as jnp

from ..ops.morphology import dilate_binary, dilate_thin_area
from ..utils.registry import MIX_METHODS

InpaintFn = Callable[..., jnp.ndarray]  # (image, mask, control=None) -> image


@dataclass
class MixResult:
    """Mirrors the reference mix_fn's 5-tuple return."""
    tps_final_warp: jnp.ndarray
    tps_final_warp_mask: jnp.ndarray
    inpaint_img: jnp.ndarray
    inpaint_img_mask: jnp.ndarray
    inpaint_area_mask: jnp.ndarray


def _use_inpaint_if_nonzero(inpaint_img, inpaint_img_mask, fallback_img,
                            fallback_mask):
    """The reference skips the inpaint result when it is all-zero
    (all_img1_with_inpaint.py:108-112) — a failure guard, kept jittable."""
    nonzero = (jnp.abs(inpaint_img).sum() > 0).astype(inpaint_img.dtype)
    img = inpaint_img * nonzero + fallback_img * (1 - nonzero)
    msk = inpaint_img_mask * nonzero + fallback_mask * (1 - nonzero)
    return img, msk


@MIX_METHODS.register("all_img1_with_inpaint")
def all_img1_with_inpaint(tps_h_warp: jnp.ndarray,
                          tps_h_warp_mask: jnp.ndarray,
                          output1: jnp.ndarray, mask1: jnp.ndarray,
                          final_warp: jnp.ndarray,
                          occlusion_mask: jnp.ndarray,
                          inpaint: Optional[InpaintFn] = None,
                          inpainter_name: str = "",
                          ) -> MixResult:
    """Fill most holes from img1; model-inpaint only a thin border ring
    (reference: all_img1_with_inpaint.py:8-114).

    Hole algebra, in order:
      1. holes inside img1's footprint filled from output1 (img1 canvas warp)
      2. a thin border ring (difference between the thin-dilated hole mask
         and its 7x7 dilation) goes to the model inpainter
    """
    dtype = tps_h_warp.dtype
    inv_mask1 = 1.0 - (mask1 > 0.5).astype(dtype)

    tps_final_warp = (final_warp * occlusion_mask * mask1
                      + tps_h_warp * inv_mask1)
    tps_final_warp_mask = (occlusion_mask * mask1
                           + tps_h_warp_mask * inv_mask1)

    # holes inside img1's region (all_img1_with_inpaint.py:51-58)
    hole = (1.0 - tps_final_warp_mask) * mask1
    hole = dilate_thin_area(hole)
    hole_dilated = (dilate_binary(hole, 7) > 0).astype(dtype)
    mask1_border = jnp.abs(hole - hole_dilated)
    inpaint_area_mask = hole_dilated

    inpaint_by_img1 = (1.0 - mask1_border) * inpaint_area_mask * mask1
    inpaint_img = (tps_final_warp * (1 - inpaint_by_img1)
                   + output1 * inpaint_by_img1)
    inpaint_img_mask = ((tps_final_warp_mask * (1 - inpaint_by_img1)
                         + mask1 * inpaint_by_img1) > 0.5).astype(dtype)
    img1_filled = inpaint_img

    # thin ring for the model inpainter (all_img1_with_inpaint.py:74-85)
    inpaint_by_other = (1.0 - inpaint_by_img1) * mask1_border
    inpaint_by_other = dilate_thin_area(inpaint_by_other,
                                        thickening_kernel_size=8)
    inpaint_by_other = (inpaint_by_other > 0.05).astype(dtype)
    inpaint_img = inpaint_img * (1 - inpaint_by_other)

    if inpaint is not None:
        if inpainter_name == "transref":
            # TransRef uses the img1-filled composite as both input and
            # reference (all_img1_with_inpaint.py:84-87)
            control = jnp.clip(img1_filled, 0, 255)
            inpaint_img = inpaint(control, inpaint_by_other, control)
        else:
            inpaint_img = inpaint(inpaint_img, inpaint_by_other)

    inpaint_img_mask = tps_h_warp_mask
    inpaint_img = inpaint_img * inpaint_img_mask

    tps_final_warp, tps_final_warp_mask = _use_inpaint_if_nonzero(
        inpaint_img, inpaint_img_mask, tps_final_warp, tps_final_warp_mask)

    area = jnp.concatenate([img1_filled, inpaint_by_other[..., 0:1]], -1)
    return MixResult(tps_final_warp, tps_final_warp_mask,
                     inpaint_img, inpaint_img_mask, area)


@MIX_METHODS.register("inpaint_all_area")
def inpaint_all_area(tps_h_warp: jnp.ndarray, tps_h_warp_mask: jnp.ndarray,
                     output1: jnp.ndarray, mask1: jnp.ndarray,
                     final_warp: jnp.ndarray, occlusion_mask: jnp.ndarray,
                     inpaint: Optional[InpaintFn] = None,
                     inpainter_name: str = "",
                     ) -> MixResult:
    """Send every remaining hole to the inpainter
    (reference: inpaint_all_area.py:8-74)."""
    dtype = tps_h_warp.dtype
    inv_mask1 = 1.0 - mask1

    tps_final_warp = final_warp * occlusion_mask + tps_h_warp * inv_mask1
    tps_final_warp_mask = occlusion_mask + tps_h_warp_mask * inv_mask1

    inpaint_area_mask = ((1.0 - tps_final_warp_mask) * mask1
                         * tps_h_warp_mask)
    inpaint_area_mask = dilate_thin_area(inpaint_area_mask,
                                         thickening_kernel_size=16)

    inpaint_img = tps_final_warp
    if inpaint is not None:
        if inpainter_name == "transref":
            control = jnp.clip(output1, 0, 255)
            inpaint_img = inpaint(tps_final_warp, inpaint_area_mask, control)
        else:
            inpaint_img = inpaint(tps_final_warp, inpaint_area_mask)
    inpaint_img_mask = tps_h_warp_mask

    tps_final_warp, tps_final_warp_mask = _use_inpaint_if_nonzero(
        inpaint_img, inpaint_img_mask, tps_final_warp, tps_final_warp_mask)
    return MixResult(tps_final_warp, tps_final_warp_mask,
                     inpaint_img, inpaint_img_mask, inpaint_area_mask)
