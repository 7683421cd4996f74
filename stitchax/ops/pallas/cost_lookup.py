"""Fused decoder cost-lookup Pallas kernel.

The MemoryDecoder samples a (2r+1)^2 bilinear window of each pixel's
(H2, W2) cost map at that pixel's current flow coords every iteration
(reference: decoder.py:242-260). The shipped XLA formulation
(flowformer.encode_flow_token) contracts the full map against sparse
bilinear selector matrices — two batched (9, 64) @ (64, 64) matmuls per
pixel. Those matmuls are MXU-hostile: M=9 wastes >90% of the systolic
rows, and the measured rate is ~5x below the HBM roofline of the dense
cost-volume read it performs.

This kernel replaces the per-pixel matmuls with a VPU barrel-select:

  * layout (H2, P, W2): pixels ride the SUBLANE axis, so per-pixel
    window bases become per-sublane mask selects (native VPU form);
    the caller hoists the one-time (P, H2, W2) -> (H2, P, W2)
    transpose out of the decoder scan (12 iterations amortize it);
  * radix-8 two-level select: level 1 picks the aligned 24-row slab
    containing the window from ~(H2+15)/8 static-slice candidates,
    level 2 picks the 10-row window at the fine offset r in [0, 8);
    out-of-range rows come from statically concatenated zero pads, so
    the exact zeros-OOB semantics of the selector form are preserved;
  * bilinear weights are applied exactly as the XLA form does —
    bf16-rounded weights, fp32 accumulation, rows cast back to the
    cost dtype between the vertical and horizontal passes — so the
    result is bit-compatible with encode_flow_token.

HBM traffic per call is the same dense cost-volume read (the 2.4%-sparse
window gather cannot beat per-pixel DMA overheads), but the compute is
lane-parallel selects instead of padded matmuls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# window pad: >= win+1 rows of zeros on each side make every clipped
# window base read real data or explicit zeros, never clamped rows
_PAD = 12


def _slab(data, lo, hi, size, axis):
    """data[lo:hi] along `axis` with static zero padding outside [0, size)."""
    lo_c, hi_c = max(lo, 0), min(hi, size)
    idx = [slice(None)] * data.ndim
    idx[axis] = slice(lo_c, hi_c)
    mid = data[tuple(idx)]
    parts = []
    if lo < 0:
        shape = list(data.shape)
        shape[axis] = -lo
        parts.append(jnp.zeros(shape, data.dtype))
    parts.append(mid)
    if hi > size:
        shape = list(data.shape)
        shape[axis] = hi - size
        parts.append(jnp.zeros(shape, data.dtype))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis)


def _kernel(cm_ref, coords_ref, out_ref, *, H2: int, W2: int, Pt: int,
            r: int):
    win = 2 * r + 1
    cm = cm_ref[...]                       # (H2, Pt, W2)
    dt = cm.dtype
    cx = coords_ref[:, 0]                  # (Pt,) f32
    cy = coords_ref[:, 1]

    def base(c, size):
        f0 = jnp.floor(c)
        b = f0.astype(jnp.int32) - r + _PAD          # padded window base
        # upper clamp size+_PAD is one past the last data row: every
        # window clamped there reads only zero padding, matching the
        # all-taps-OOB zeros the true (further) base would produce
        b = jnp.clip(b, 0, size + _PAD)
        return (b // 8).reshape(1, -1, 1), (b % 8).reshape(1, -1, 1), c - f0

    qy, ry, fy = base(cy, H2)
    qx, rx, fx = base(cx, W2)

    def lerp(w10, f, axis):
        # bf16-rounded weights, fp32 accumulate — exactly the XLA
        # selector path's numerics (bf16 Sy/Sx, preferred fp32)
        a = (1.0 - f).astype(dt).astype(jnp.float32).reshape(1, -1, 1)
        b = f.astype(dt).astype(jnp.float32).reshape(1, -1, 1)
        idx_a = [slice(None)] * 3
        idx_b = [slice(None)] * 3
        idx_a[axis] = slice(0, win)
        idx_b[axis] = slice(1, win + 1)
        return (w10[tuple(idx_a)].astype(jnp.float32) * a
                + w10[tuple(idx_b)].astype(jnp.float32) * b)

    def select(data, q, rr, size, axis):
        nq = (size + _PAD) // 8 + 1
        shape = list(data.shape)
        shape[axis] = 24
        acc = jnp.zeros(shape, dt)
        for qq in range(nq):
            lo = 8 * qq - _PAD
            acc = jnp.where(q == qq, _slab(data, lo, lo + 24, size, axis),
                            acc)
        shape[axis] = win + 1
        fine = jnp.zeros(shape, dt)
        for ro in range(8):
            idx = [slice(None)] * 3
            idx[axis] = slice(ro, ro + win + 1)
            fine = jnp.where(rr == ro, acc[tuple(idx)], fine)
        return fine

    w10 = select(cm, qy, ry, H2, axis=0)            # (win+1, Pt, W2)
    v = lerp(w10, fy, axis=0).astype(dt)            # (win, Pt, W2)
    w10x = select(v, qx, rx, W2, axis=2)            # (win, Pt, win+1)
    out_ref[...] = lerp(w10x, fx, axis=2).astype(out_ref.dtype)


def cost_lookup_transposed(cm_t: jnp.ndarray, coords: jnp.ndarray,
                           r: int = 4, block_p: int = 128,
                           interpret: bool = False) -> jnp.ndarray:
    """cm_t (H2, P, W2) cost maps (pixel axis second), coords (P, 2)
    xy-last pixel coords -> (P, win, win) window samples laid out
    [y-offset, x-offset] in coords.dtype."""
    H2, P, W2 = cm_t.shape
    win = 2 * r + 1
    pad = -P % block_p
    if pad:
        cm_t = jnp.pad(cm_t, ((0, 0), (0, pad), (0, 0)))
        coords = jnp.pad(coords, ((0, pad), (0, 0)))
    Pp = P + pad
    kernel = functools.partial(_kernel, H2=H2, W2=W2, Pt=block_p, r=r)
    out = pl.pallas_call(
        kernel,
        grid=(Pp // block_p,),
        in_specs=[
            pl.BlockSpec((H2, block_p, W2), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_p, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((win, block_p, win), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((win, Pp, win), coords.dtype),
        interpret=interpret,
    )(cm_t, coords.astype(jnp.float32))
    return out.transpose(1, 0, 2)[:P]               # (P, win_y, win_x)


def transpose_cost_maps(cost_maps: jnp.ndarray) -> jnp.ndarray:
    """(B, H1, W1, H2, W2, 1) -> (H2, B*H1*W1, W2), hoisted once per
    forward so the decoder scan reads the kernel's native layout."""
    B, H1, W1, H2, W2, heads = cost_maps.shape
    assert heads == 1, "pallas cost lookup supports heads=1"
    cm = cost_maps.reshape(B * H1 * W1, H2, W2)
    return cm.transpose(1, 0, 2)


def encode_flow_token_pallas(cost_maps: jnp.ndarray, coords: jnp.ndarray,
                             r: int = 4, interpret: bool = False,
                             cm_t: jnp.ndarray | None = None) -> jnp.ndarray:
    """Drop-in for flowformer.encode_flow_token (heads=1): same x-major
    channel order, zeros-OOB semantics, and bf16/fp32 numerics.

    Pass `cm_t` (from transpose_cost_maps) to skip the per-call
    transpose — the decoder hoists it out of its 12-iteration scan.
    """
    B, H1, W1, H2, W2, heads = cost_maps.shape
    if cm_t is None:
        cm_t = transpose_cost_maps(cost_maps)
    win = 2 * r + 1
    cen = coords.reshape(B * H1 * W1, 2)
    s = cost_lookup_transposed(cm_t, cen, r=r, interpret=interpret)
    # reference channel order is x-major: (P, t, a) -> (P, a, t)
    s = s.transpose(0, 2, 1).astype(coords.dtype)
    return s.reshape(B, H1, W1, win * win * heads)
