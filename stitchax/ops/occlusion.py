"""Occlusion estimation: forward-backward consistency + range maps.

Reference semantics: core/warp_utils.py:84-221. All arrays NHWC/xy-last;
masks come back as (..., H, W, 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .flow import flow_to_warp, flow_warp


def mask_invalid(coords: jnp.ndarray, pad_h: float = 0.0, pad_w: float = 0.0) -> jnp.ndarray:
    """Valid-coordinate mask (H, W, 1). Note the reference's quirk of using
    shape[-3]-1 as max height *on the xy-last coords layout*, which in its
    BHW2 layout makes max_height = H-1 and max_width = W-1
    (reference: core/warp_utils.py:84-111). Here coords are (H, W, 2)."""
    H, W, _ = coords.shape
    x, y = coords[..., 0], coords[..., 1]
    mask = ((x >= pad_w) & (x <= W - 1) & (y >= pad_h) & (y <= H - 1))
    return mask.astype(coords.dtype)[..., None]


def _splat_selector(center: jnp.ndarray, size: int) -> jnp.ndarray:
    """Sparse bilinear deposit matrix S (P, size):
    S[p, i] = (1-f)·[i == floor(c_p)] + f·[i == floor(c_p)+1].
    Out-of-range rows simply never match => OOB taps drop exactly."""
    f0 = jnp.floor(center)
    f = (center - f0)[:, None]
    idx = jax.lax.broadcasted_iota(jnp.float32, (1, size), 1)
    base = f0[:, None]
    return (idx == base) * (1.0 - f) + (idx == base + 1.0) * f


def compute_range_map(flow: jnp.ndarray) -> jnp.ndarray:
    """Forward-splat counting map of backward flow (H, W, 2) -> (H, W, 1).

    Bilinear scatter-add of 1 at each target location; out-of-bounds taps are
    dropped (reference: core/warp_utils.py:114-175). TPU-first formulation:
    the splat is the rank-1-sum Σ_p sy_p ⊗ sx_p = Sy^T @ Sx with sparse
    bilinear deposit selectors — one MXU matmul instead of an XLA scatter
    (measured ~4x faster at 512² on v5e; scatters serialize like gathers).
    """
    H, W, _ = flow.shape
    coords = flow_to_warp(flow).reshape(-1, 2)  # (P, 2)
    Sy = _splat_selector(coords[:, 1], H)       # (P, H)
    Sx = _splat_selector(coords[:, 0], W)       # (P, W)
    counts = jnp.einsum("ph,pw->hw", Sy, Sx,
                        preferred_element_type=jnp.float32)
    return counts.astype(flow.dtype).reshape(H, W, 1)


compute_range_map_b = jax.vmap(compute_range_map)


def compute_fb_consistency(flow_ij: jnp.ndarray, flow_ji: jnp.ndarray):
    """Forward/backward flow agreement; (H, W, 2) each
    (reference: core/warp_utils.py:177-183)."""
    flow_ji_in_i = flow_warp(flow_ji, flow_ij)
    fb_sq_diff = jnp.sum((flow_ij + flow_ji_in_i) ** 2, axis=-1, keepdims=True)
    fb_sum_sq = jnp.sum(flow_ij ** 2 + flow_ji_in_i ** 2, axis=-1, keepdims=True)
    return fb_sq_diff, fb_sum_sq


def compute_occlusion(flow_ij: jnp.ndarray, flow_ji: jnp.ndarray,
                      occlusion_estimation: str = "wang",
                      occlusion_are_zeros: bool = False,
                      boundaries_occluded: bool = True) -> jnp.ndarray:
    """Occlusion mask (H, W, 1); 1 = occluded unless occlusion_are_zeros flips
    it (reference: core/warp_utils.py:185-221)."""
    fb_sq_diff, fb_sum_sq = compute_fb_consistency(flow_ij, flow_ji)

    if occlusion_estimation == "none":
        occ = jnp.zeros_like(flow_ij[..., :1])
    elif occlusion_estimation == "brox":
        occ = (fb_sq_diff > 0.01 * fb_sum_sq + 0.5).astype(flow_ij.dtype)
    elif occlusion_estimation == "fb_abs":
        occ = (fb_sq_diff ** 0.5 > 1.5).astype(flow_ij.dtype)
    elif occlusion_estimation == "wang":
        range_map = compute_range_map(flow_ji)
        occ = 1.0 - jnp.clip(range_map, 0.0, 1.0)
    else:
        raise ValueError(f"unknown occlusion_estimation {occlusion_estimation}")

    if not boundaries_occluded:
        occ = jnp.minimum(occ, mask_invalid(flow_to_warp(flow_ij)))
    if occlusion_are_zeros:
        occ = 1.0 - occ
    return occ


def compute_occlusion_b(flow_ij, flow_ji, occlusion_estimation="wang",
                        occlusion_are_zeros=False, boundaries_occluded=True):
    return jax.vmap(
        lambda a, b: compute_occlusion(a, b, occlusion_estimation,
                                       occlusion_are_zeros, boundaries_occluded)
    )(flow_ij, flow_ji)
