"""Neighborhood attention (NATTEN semantics) for TPU.

The reference's optional vertical-attention variant loads JIT-compiled
NATTEN CUDA kernels that are absent from its repo
(reference: core/FlowFormer/PerCostFormer3/NA.py:9-20; SURVEY.md §2.4
item 1). This is the TPU equivalent: each query attends to a k x k
neighborhood whose window is *shifted* (not zero-padded) at borders, with a
learned relative-position bias, exactly NATTEN's definition:

  start_i = clamp(i - k//2, 0, H - k)
  attn    = softmax(q · k_nbr * scale + rpb[rel_i, rel_j])
  out     = attn @ v_nbr

Formulated as k² row/column `take` permutations feeding one batched einsum —
fully static, fuses under XLA, and maps the contraction onto the MXU. The
window gathers are data-independent permutations, which XLA lowers to cheap
dynamic-slices rather than scatter/gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _window_starts(n: int, k: int) -> jnp.ndarray:
    return jnp.clip(jnp.arange(n) - k // 2, 0, n - k)


def neighborhood_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           rpb: jnp.ndarray, kernel_size: int = 7
                           ) -> jnp.ndarray:
    """q/k/v: (B, H, W, heads, d); rpb: (heads, 2k-1, 2k-1).
    Returns (B, H, W, heads, d).

    On maps smaller than the kernel, the effective window shrinks to the
    (odd) map extent per axis — attention covers the whole axis, with the
    relative-position bias still indexed by true offsets. (NATTEN itself
    requires dim >= kernel_size; small cost maps occur here whenever the
    flow model runs below 8*kernel_size input resolution.)"""
    B, H, W, heads, d = q.shape
    ks = kernel_size
    ks_h = min(ks, H if H % 2 == 1 else H - 1)
    ks_w = min(ks, W if W % 2 == 1 else W - 1)
    scale = d ** -0.5

    si = _window_starts(H, ks_h)         # (H,)
    sj = _window_starts(W, ks_w)         # (W,)
    rows = jnp.arange(H)
    cols = jnp.arange(W)

    logits = []
    values = []
    for a in range(ks_h):
        ri = si + a                       # neighbor row per query row
        rel_i = ri - rows + ks - 1        # rpb row index, (H,)
        k_rows = jnp.take(k, ri, axis=1)
        v_rows = jnp.take(v, ri, axis=1)
        for b in range(ks_w):
            cj = sj + b
            rel_j = cj - cols + ks - 1
            k_n = jnp.take(k_rows, cj, axis=2)   # (B, H, W, heads, d)
            v_n = jnp.take(v_rows, cj, axis=2)
            logit = (q * k_n).sum(-1) * scale    # (B, H, W, heads)
            bias = rpb[:, rel_i[:, None], rel_j[None, :]]  # (heads, H, W)
            logits.append(logit + bias.transpose(1, 2, 0)[None])
            values.append(v_n)

    logits = jnp.stack(logits, axis=-1)          # (B, H, W, heads, k²)
    attn = jax.nn.softmax(logits, axis=-1)
    vals = jnp.stack(values, axis=-1)            # (B, H, W, heads, d, k²)
    out = jnp.einsum("bhwna,bhwnda->bhwnd", attn, vals)
    return out
