"""The breaking pipeline: preprocess flow -> sample control points -> TPS
warp -> mask cleanup -> mix with the flow warp -> blend.

TPU-native rebuild of `tps_H_warp` (reference: core/inference/tps_pipline.py:
20-205). The whole stage is one jittable function per (image-shape, canvas-
bucket): dynamic point filters became validity masks, cv2 morphology became
reduce_window pooling, and the OpenCV TPS became a batched solve + MXU
matmul (stitchax.tps.solve). Only the optional inpaint plugin runs outside.

Replicated reference quirks that affect per-pixel output (SURVEY.md §7.3):
  * flow negation for backward use (tps_pipline.py:238-239)
  * `final_warp_mask = (final_warp >= 3)` intensity threshold (:152)
  * the 11x11 open on the *inverted* TPS mask (:141-147)
  * avg-pool smoothing with kernel min(grid)//2*2-1 (:223-230)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.morphology import avg_pool_same, morph_open
from . import points as P
from . import solve as S


@dataclass(frozen=True)
class TPSConfig:
    """Mirrors the reference TPS_PIPELINE_CONFIG (inf_configs/*.py:3-56)."""
    grid_h: int = 12
    grid_w: int = 12
    pad_num: int = 4
    get_pt_method: str = "advanced_uniform_multi"
    tps_method: str = "stitchax"   # unified backend (opencv-kernel math)
    kernel_variant: str = "opencv"
    flow_limit: float = -1.0
    add_corner: bool = False
    use_boundary_limit: bool = False
    residual_flow_use_forward: bool = False
    do_avg_pooling: bool = True
    use_occ_filter: bool = True
    use_border_points_mask: bool = True
    use_valid_on_flow: bool = False
    affine_scale: float = 1.0
    kernel_scale: float = 1.0
    output2_is_only_tps: bool = True
    mask_open_kernel: int = 11
    solve_reg: float = 1e-6


def preprocess_flow(residual_flow: jnp.ndarray, valid: Optional[jnp.ndarray],
                    cfg: TPSConfig) -> jnp.ndarray:
    """Smooth + orient the residual flow (reference: tps_pipline.py:213-244).

    residual_flow: (H, W, 2). The reference's final F.interpolate back to the
    original size is an identity (stride-1 pool preserves shape) and is
    omitted.
    """
    flow = residual_flow
    if cfg.do_avg_pooling:
        k = min(cfg.grid_h, cfg.grid_w) // 2 * 2 - 1
        if k >= 2:
            flow = avg_pool_same(flow[None], k)[0]
    if not cfg.residual_flow_use_forward:
        flow = -flow
    if valid is not None:
        flow = flow * valid
    return flow


def sample_control_points(h_warp_cropped: jnp.ndarray, flow: jnp.ndarray,
                          width_min: jnp.ndarray, height_min: jnp.ndarray,
                          border_points_mask: Optional[jnp.ndarray],
                          out_h: int, out_w: int, cfg: TPSConfig
                          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Control pairs in canvas coordinates + validity.

    h_warp_cropped: (H, W, 3) — the H-warp cropped back to the original image
    window (reference crops with torchvision at tps_pipline.py:289-292);
    flow: (H, W, 2) preprocessed; border_points_mask: (out_h, out_w) or None.
    Returns (points_src (N, 2), points_dst (N, 2), valid (N,)).
    """
    H, W, _ = h_warp_cropped.shape
    if cfg.get_pt_method == "advanced_uniform":
        grad = P.gradient_magnitude_l1(h_warp_cropped)
        step = max(H, W) // min(cfg.grid_h, cfg.grid_w)
        border = P.sample_border_points(grad, step, cfg.pad_num)
    elif cfg.get_pt_method == "advanced_uniform_multi":
        border = P.multi_level_border_points(h_warp_cropped, cfg.grid_h,
                                             cfg.grid_w, cfg.pad_num)
    else:
        raise NotImplementedError(cfg.get_pt_method)

    src, dst, valid = P.point_pairs(border, flow, cfg.flow_limit)
    src = P.shift_points(src, width_min, height_min)
    dst = P.shift_points(dst, width_min, height_min)

    if cfg.use_boundary_limit:
        valid &= P.boundary_validity(src, dst, out_h, out_w)
    if border_points_mask is not None:
        valid &= P.mask_lookup_validity(src, border_points_mask)

    if cfg.add_corner:
        corners = jnp.array([[0, 0], [0, out_h - 1], [out_w - 1, 0],
                             [out_w - 1, out_h - 1]], src.dtype)
        src = jnp.concatenate([src, corners], 0)
        dst = jnp.concatenate([dst, corners], 0)
        valid = jnp.concatenate([valid, jnp.ones((4,), bool)], 0)
    return src, dst, valid


def mix_tps_with_flow_warp(tps_h_warp: jnp.ndarray, tps_mask_raw: jnp.ndarray,
                           output1: jnp.ndarray, mask1: jnp.ndarray,
                           final_warp: jnp.ndarray, cfg: TPSConfig
                           ) -> Dict[str, Any]:
    """Back half of the breaking stage: TPS-mask threshold + 11x11 open on
    the inverted mask, mix with the flow warp, blend
    (reference: core/inference/tps_pipline.py:137-205).

    tps_h_warp: (out_h, out_w, 3) raw TPS-warped image (pre mask-multiply);
    tps_mask_raw: (out_h, out_w, 1) raw warped mask, pre-threshold.
    Factored out of tps_break_warp so it can be reference-pinned in
    isolation by injecting identical warp output into both sides
    (tests/test_parity_tps_backhalf.py).
    """
    dtype = tps_h_warp.dtype
    tps_mask = (tps_mask_raw >= 0.5).astype(dtype)

    # mask cleanup: 11x11 open on the INVERTED mask (tps_pipline.py:141-147)
    k = (cfg.mask_open_kernel, cfg.mask_open_kernel)
    inv = morph_open(1.0 - tps_mask, k)
    tps_mask = 1.0 - inv
    tps_h_warp = tps_h_warp * tps_mask

    # mix with the flow warp (tps_pipline.py:151-158)
    fw_mask = ((final_warp >= 3).astype(dtype).mean(-1, keepdims=True)
               >= 0.5).astype(dtype)
    inv_mask1 = ((1.0 - mask1) >= 0.5).astype(dtype)
    tps_final_warp = final_warp * fw_mask + tps_h_warp * (1 - fw_mask) * inv_mask1
    tps_final_warp_mask = fw_mask + (1 - fw_mask) * tps_mask * inv_mask1

    output2 = tps_final_warp * tps_final_warp_mask
    mask2 = tps_final_warp_mask
    denom = jnp.maximum(mask1 + mask2, 1e-6)
    blend = jnp.clip((output1 * mask1 + output2 * mask2) / denom, 0, 255)

    out = dict(
        new_blend_image=blend,
        mix_tps_flow_warp=output2,
        mix_tps_flow_warp_mask=mask2,
        tps_output=tps_h_warp,
        tps_mask=tps_mask,
        output2=output2,
        mask2=mask2,
    )
    if cfg.output2_is_only_tps:
        out["output2"] = tps_h_warp  # already mask-multiplied
        out["mask2"] = tps_mask
    return out


def tps_break_warp(output1: jnp.ndarray, mask1: jnp.ndarray,
                   h_warp: jnp.ndarray, h_warp_mask: jnp.ndarray,
                   final_warp: jnp.ndarray, residual_flow: jnp.ndarray,
                   width_min: jnp.ndarray, height_min: jnp.ndarray,
                   cfg: TPSConfig,
                   occlusion_mask: Optional[jnp.ndarray] = None,
                   valid_flow_mask: Optional[jnp.ndarray] = None,
                   ) -> Dict[str, Any]:
    """Full breaking stage for ONE pair (the reference runs B=1:
    tps_pipline.py:118-119 asserts it).

    Shapes (all unbatched, NHWC-minus-N):
      output1, h_warp, final_warp: (out_h, out_w, 3) canvas images
      mask1, h_warp_mask:          (out_h, out_w, 1)
      residual_flow:               (img_h, img_w, 2) original-res flow
      occlusion_mask:              (out_h, out_w, 1) (border-point filter)
      width_min/height_min:        traced scalars (<= 0, canvas origin)

    Returns the stage-output dict; `new_blend_image` is the headline
    artifact (ave_fusion.jpg). Inpainting plugs in downstream
    (stitchax.compose) exactly where the reference calls inpaint_fn.
    """
    out_h, out_w, _ = h_warp.shape
    img_h, img_w, _ = residual_flow.shape
    dtype = h_warp.dtype

    flow = preprocess_flow(residual_flow, valid_flow_mask, cfg)

    # crop the H-warp back to the original image window (traced origin)
    top = jnp.abs(height_min).astype(jnp.int32)
    left = jnp.abs(width_min).astype(jnp.int32)
    h_warp_cropped = jax.lax.dynamic_slice(
        h_warp, (top, left, 0), (img_h, img_w, 3))

    bpm = None
    if cfg.use_border_points_mask and occlusion_mask is not None:
        bpm = ((occlusion_mask[..., 0] if cfg.use_occ_filter
                else h_warp_mask[..., 0]) > 0.5).astype(dtype)
    src, dst, valid = sample_control_points(
        h_warp_cropped, flow, width_min, height_min, bpm, out_h, out_w, cfg)

    # TPS backward warp of image + mask together
    stacked = jnp.concatenate([h_warp, h_warp_mask], -1)
    warped = S.tps_warp_image(stacked, src, dst, valid,
                              variant=cfg.kernel_variant,
                              kernel_scale=cfg.kernel_scale,
                              affine_scale=cfg.affine_scale,
                              reg=cfg.solve_reg)
    out = mix_tps_with_flow_warp(warped[..., 0:3], warped[..., 3:4],
                                 output1, mask1, final_warp, cfg)
    out.update(control_src=src, control_dst=dst, control_valid=valid)
    return out
