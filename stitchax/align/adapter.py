"""Alignment core: homography + residual-flow composition (L2).

TPU-native rebuild of FlowHomoAdpater (reference: core/flowHomoAdpater.py).
Two paths:

  * `train_eval_forward` — fixed-resolution forward used for training and
    PSNR/SSIM eval (reference: flowHomoAdpater.py:83-191).
  * `stitch_forward` — the full-canvas stitching forward
    (reference: flowHomoAdpater.py:197-377). The reference's data-dependent
    canvas (mesh extrema -> out_width/out_height) breaks static shapes, so
    the canvas is **bucketed**: the model step returns exact bounds, the host
    rounds the canvas up to a bucket multiple, and a canvas-size-specialized
    jitted kernel renders into the padded canvas; true bounds ride along as
    crop metadata. Everything else (translations) stays traced, so each
    bucket size compiles exactly once.

All tensors NHWC in [0, 255]; masks (B, H, W, 1)-style stacked as channels.

Retired reference branch: `use_forward=True` (forward-splat composition,
reference: flowHomoAdpater.py:107-134) is deliberately NOT wired. The
reference branch is unrunnable — `final_flow = H_flow + residual_flow`
(:128) reads `H_flow`/`residual_flow` before either is bound, so enabling
it raises NameError; the shipped config keeps it off (`use_foward: False`,
sic). The forward-splat op itself lives in ops/splat.py (tested) for the
augmentor and any future wiring. Decision recorded in STATUS.md §2.9.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .. import ops


@dataclass(frozen=True)
class AlignConfig:
    use_fb_consistency_mask: bool = True
    occlusion_estimation: str = "wang"
    occlusion_kernel: Tuple[int, int] = (19, 19)
    model_size: int = 512            # homo/flow run at this fixed resolution
    canvas_bucket: int = 256         # canvas dims round up to this multiple
    max_canvas: int = 4096


def predict_homography_matrix(homo_offsets: jnp.ndarray, img_h: int, img_w: int,
                              scale_div: float = 1.0) -> jnp.ndarray:
    """Corner offsets (B, 8) -> pixel homography (B, 3, 3) solved at
    coords/scale_div (reference divides by 8 on the train path:
    flowHomoAdpater.py:96)."""
    H_motion = homo_offsets.reshape(-1, 4, 2)
    B = H_motion.shape[0]
    src = jnp.array([[0.0, 0.0], [img_w, 0.0], [0.0, img_h], [img_w, img_h]],
                    homo_offsets.dtype)
    src = jnp.broadcast_to(src[None], (B, 4, 2))
    dst = src + H_motion
    return ops.dlt_solve(src / scale_div, dst / scale_div)


def _normalized(H: jnp.ndarray, h: float, w: float) -> jnp.ndarray:
    """M^-1 @ H @ M for a square (h, w) frame on both sides
    (reference: flowHomoAdpater.py:98-108)."""
    M = ops.scale_matrix(h, w, dtype=H.dtype)
    return jnp.linalg.inv(M) @ H @ M


def train_eval_forward(homo_fn: Callable, flow_fn: Callable,
                       input1: jnp.ndarray, input2: jnp.ndarray,
                       cfg: AlignConfig) -> Dict[str, Any]:
    """Fixed-resolution alignment forward (reference: flowHomoAdpater.py:83-191,
    shipped branch: use_combine_h_flow=False, use_fb_consistency_mask=True).

    homo_fn(img1_norm, img2_norm) -> (B, 8) corner offsets ([-1,1] inputs)
    flow_fn(img1, img2) -> (list of flows (B, H, W, 2), flow_lr)  ([0,255] inputs)
    """
    B, img_h, img_w, _ = input1.shape

    offsets = homo_fn(input1 / 127.5 - 1.0, input2 / 127.5 - 1.0)
    H = predict_homography_matrix(offsets, img_h, img_w, scale_div=8.0)
    H_mat = jax.vmap(lambda h: _normalized(h, img_h / 8.0, img_w / 8.0))(H)
    H_inv_mat = jax.vmap(lambda h: _normalized(jnp.linalg.inv(h),
                                               img_h / 8.0, img_w / 8.0))(H)

    ones3 = jnp.ones_like(input2)
    output_H = ops.homography_warp_b(
        jnp.concatenate([input2, ones3], -1), H_mat, img_h, img_w)
    output_H_inv = ops.homography_warp_b(
        jnp.concatenate([input1, ones3], -1), H_inv_mat, img_h, img_w)

    warp2 = output_H[..., 0:3]
    flow_predictions, _ = flow_fn(input1, warp2)
    final_flow = flow_predictions[-1]

    final_warp_output = ops.flow_warp_b(output_H, final_flow)
    overlap = final_warp_output[..., 3:6].mean(-1)
    overlap = jnp.where(overlap < 0.9, 1.0, 0.0)

    out = dict(output_H=output_H, output_H_inv=output_H_inv,
               flow_predictions=flow_predictions, H=H)

    if cfg.use_fb_consistency_mask:
        back_predictions, _ = flow_fn(warp2, input1)
        flow_ji = jax.lax.stop_gradient(back_predictions[-1])
        occ = ops.compute_occlusion_b(final_flow, flow_ji,
                                      cfg.occlusion_estimation,
                                      occlusion_are_zeros=True,
                                      boundaries_occluded=True)
        occ = jnp.where(occ >= 0.5, 1.0, 0.0)
        final_warp_output = final_warp_output * occ
        out["origin_occlusion_mask"] = occ[..., 0]

    out.update(final_warp_output=final_warp_output, overlap=overlap)
    return out


# ----------------------------- stitching path ------------------------------


def stitch_model_step(homo_fn: Callable, flow_fn: Callable,
                      input1: jnp.ndarray, input2: jnp.ndarray,
                      cfg: AlignConfig,
                      flow_pair_fn: Optional[Callable] = None
                      ) -> Dict[str, Any]:
    """Device step 1 of the stitch: run homo+flow at `model_size`, compute the
    full-res homography and canvas bounds (reference: flowHomoAdpater.py:197-271).

    Returns a dict of device arrays incl. scalar canvas bounds; shape-static
    so it compiles once for a given input resolution.
    """
    B, img_h, img_w, _ = input1.shape
    S = cfg.model_size
    in1_512 = ops.resize_image_b(input1, S, S)
    in2_512 = ops.resize_image_b(input2, S, S)

    offsets = homo_fn(in1_512 / 127.5 - 1.0, in2_512 / 127.5 - 1.0)
    H_motion_512 = offsets.reshape(-1, 4, 2)
    H_512 = predict_homography_matrix(offsets, S, S, scale_div=1.0)
    H_mat = jax.vmap(lambda h: _normalized(h, S, S))(H_512)

    ones3 = jnp.ones_like(in2_512)
    output_H = ops.homography_warp_b(
        jnp.concatenate([in2_512, ones3], -1), H_mat, S, S)
    warp2_512 = output_H[..., 0:3]
    warp2_mask_512 = (output_H[..., 3:6].mean(-1, keepdims=True) > 0.5).astype(
        input1.dtype)

    back_preds_512 = None
    if flow_pair_fn is not None and cfg.use_fb_consistency_mask:
        # one bidirectional call shares features + transposes the cost
        # volume (FlowFormer.bidirectional): ~40% cheaper than two calls
        (flow_preds_512, _), (back_preds_512, _) = flow_pair_fn(
            in1_512, warp2_512)
    else:
        flow_preds_512, _ = flow_fn(in1_512, warp2_512)
    flow_512 = flow_preds_512[-1]

    # native-res flow + homography
    flow = ops.resize_flow_b(flow_512, img_h, img_w)
    H_motion = jnp.stack([H_motion_512[..., 0] * img_w / S,
                          H_motion_512[..., 1] * img_h / S], -1)
    src = jnp.array([[0.0, 0.0], [img_w, 0.0], [0.0, img_h], [img_w, img_h]],
                    input1.dtype)
    src = jnp.broadcast_to(src[None], (B, 4, 2))
    H = ops.dlt_solve(src, src + H_motion)

    # canvas bounds from the H-projected full-res mesh extrema
    mesh = ops.get_rigid_mesh(img_h, img_w, grid_h=63, grid_w=63,
                              dtype=input1.dtype)
    # NOTE: the reference uses a 512x512-vertex mesh (warp_utils.py:10); the
    # extrema of a projective map over a rectangle lie at its corners/edges,
    # so a 64x64 mesh gives identical bounds at far lower cost.
    mesh_p = jax.vmap(lambda h: ops.h2mesh(h, mesh))(H)
    # reference truncates toward zero (tensor.int()); mins are <= 0 and maxes
    # >= img dims, so trunc matches its semantics exactly.
    # Bounds are PER PAIR (reduce over mesh vertices only): a batched model
    # step must not couple one pair's canvas to another's — the reference
    # always runs this path at batch 1 (out.py:200), so per-pair boxes are
    # its exact per-sample semantics.
    width_max = jnp.trunc(jnp.maximum(mesh_p[..., 0].max(axis=(1, 2)), img_w))
    width_min = jnp.trunc(jnp.minimum(mesh_p[..., 0].min(axis=(1, 2)), 0.0))
    height_max = jnp.trunc(jnp.maximum(mesh_p[..., 1].max(axis=(1, 2)), img_h))
    height_min = jnp.trunc(jnp.minimum(mesh_p[..., 1].min(axis=(1, 2)), 0.0))

    out = dict(H=H, flow=flow, warp2_mask_512=warp2_mask_512,
               warp2_512=warp2_512, in1_512=in1_512,
               width_min=width_min, height_min=height_min,
               width_max=width_max, height_max=height_max,
               # one stacked (B, 4) leaf so the host canvas-bucket decision
               # costs a single relay fetch instead of four
               canvas_box=jnp.stack([width_min, height_min,
                                     width_max, height_max], axis=-1))

    if cfg.use_fb_consistency_mask:
        if back_preds_512 is None:
            back_preds_512, _ = flow_fn(warp2_512, in1_512)
        back_flow = ops.resize_flow_b(back_preds_512[-1], img_h, img_w)
        occ = ops.compute_occlusion_b(flow, back_flow,
                                      cfg.occlusion_estimation,
                                      occlusion_are_zeros=True,
                                      boundaries_occluded=True)
        occ = ops.preprocess_occlusion_mask(occ, cfg.occlusion_kernel)
        out["origin_occlusion_mask"] = occ
    return out


def stitch_render(input1: jnp.ndarray, input2: jnp.ndarray,
                  H: jnp.ndarray, flow: jnp.ndarray,
                  origin_occlusion_mask: Optional[jnp.ndarray],
                  width_min: jnp.ndarray, height_min: jnp.ndarray,
                  out_h: int, out_w: int,
                  cfg: AlignConfig) -> Dict[str, Any]:
    """Device step 2: render warps into the (out_h, out_w) bucketed canvas
    (reference: flowHomoAdpater.py:273-360). `out_h/out_w` are static; the
    canvas-origin translation (width_min, height_min) is traced."""
    B, img_h, img_w, _ = input1.shape
    dtype = input1.dtype

    M = ops.scale_matrix(float(out_h), float(out_w), dtype=dtype)
    N = ops.scale_matrix(float(img_h), float(img_w), dtype=dtype)
    N_inv = jnp.linalg.inv(N)

    def translation(wm, hm):
        return jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]],
                         dtype).at[0, 2].set(wm).at[1, 2].set(hm)

    # width_min/height_min may be scalars (single pair) or (B,) per-pair
    # canvas origins (batched align step)
    wm = jnp.broadcast_to(jnp.asarray(width_min, dtype), (B,))
    hm = jnp.broadcast_to(jnp.asarray(height_min, dtype), (B,))
    I_ = jax.vmap(translation)(wm, hm)          # (B, 3, 3)
    I_mat = jax.vmap(lambda t: N_inv @ t @ M)(I_)

    ones3 = jnp.ones_like(input1)
    homo_output = ops.homography_warp_b(
        jnp.concatenate([input1, ones3], -1), I_mat, out_h, out_w)

    # H warp of img2 into the canvas
    H_canvas = jax.vmap(lambda h, t: N_inv @ (h @ t) @ M)(H, I_)
    homo_output2 = ops.homography_warp_b(
        jnp.concatenate([input2, ones3], -1), H_canvas, out_h, out_w)

    # residual flow re-rendered into the canvas + mask channel
    flow_mask = jnp.ones(flow.shape[:-1] + (1,), dtype)
    flow_canvas = ops.homography_warp_b(
        jnp.concatenate([flow, flow_mask], -1), I_mat, out_h, out_w)
    residual_flow_c, flow_mask_c = flow_canvas[..., 0:2], flow_canvas[..., 2:3]

    final_warp_output = ops.flow_warp_b(homo_output2, residual_flow_c)
    final_warp_output = final_warp_output * flow_mask_c

    occlusion_mask = None
    if origin_occlusion_mask is not None:
        occ_c = ops.homography_warp_b(
            origin_occlusion_mask, I_mat, out_h, out_w)
        occ_c = ops.preprocess_occlusion_mask(occ_c, cfg.occlusion_kernel)
        final_warp_output = final_warp_output * occ_c
        occlusion_mask = occ_c

    output1, mask1 = homo_output[..., 0:3], homo_output[..., 3:6]
    output2, mask2 = final_warp_output[..., 0:3], final_warp_output[..., 3:6]

    if origin_occlusion_mask is not None:
        non_overlap = 1.0 - mask1
        output2 = (homo_output2[..., 0:3] * (1 - mask2) * non_overlap
                   + output2 * mask2)
        mask2 = (homo_output2[..., 3:6] * (1 - mask2) * non_overlap
                 + mask2 * mask2)
    else:
        output2 = homo_output2[..., 0:3] * (1 - mask2) + output2 * mask2
        mask2 = homo_output2[..., 3:6] * (1 - mask2) + mask2 * mask2

    denom = mask1 + mask2
    blend = (output1 * mask1 + output2 * mask2) / jnp.maximum(denom, 1e-6)
    blend = jnp.clip(blend, 0, 255)

    mask1 = jnp.clip(mask1.mean(-1, keepdims=True), 0, 1)
    mask2 = jnp.clip(mask2.mean(-1, keepdims=True), 0, 1)

    return dict(
        H_warp=homo_output2[..., 0:3],
        H_warp_mask=homo_output2[..., 3:6].mean(-1, keepdims=True),
        final_warp=final_warp_output[..., 0:3],
        output1=output1, output2=output2,
        mask1=mask1, mask2=mask2,
        blend_image=blend,
        residual_flow=residual_flow_c,
        occlusion_mask=occlusion_mask,
    )


def bucket_canvas(extent: float, bucket: int, max_canvas: int) -> int:
    b = int(-(-int(extent) // bucket) * bucket)
    return min(max(b, bucket), max_canvas)
