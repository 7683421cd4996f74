"""Experiment: decoder cost-lookup formulations at the bench operating
point (P = 8*64*64 pixels, 64x64 cost maps, bf16).

The shipped selector-matmul form (encode_flow_token) contracts the FULL
per-pixel cost map against sparse bilinear selectors: it reads all
268 MB of the cost volume every decoder iteration (12x per forward).
The row-take candidate gathers only the win+1 rows each pixel can
touch (~42 MB) and interpolates vertically on the VPU, keeping the
horizontal tap as a small selector matmul.

MEASURED (v5e, 2026-08-17): selector 3.20 ms, row-take 7.27 ms — the
(P, 10)-row gather lowering costs more than the dense matmul's full
volume read. Selector stays the production default; the row-take code
path is kept in flowformer.py (cfg.lookup_impl) as the documented
loser, parity-tested.

Usage: python tools/exp_flow_token.py
"""

import sys
import time

sys.path.insert(0, ".")
from stitchax.utils.platform import setup_cli_jax  # noqa: E402

setup_cli_jax()

import jax                       # noqa: E402
import jax.numpy as jnp          # noqa: E402
import numpy as np               # noqa: E402

from stitchax.models.flowformer import (  # noqa: E402
    _bilinear_selector, encode_flow_token)


def encode_flow_token_rowtake(cost_maps, coords, r: int = 4):
    """Row-gather + VPU vertical lerp + horizontal selector matmul.
    Bit-compatible OOB semantics with the selector form (exact zeros)."""
    B, H1, W1, H2, W2, heads = cost_maps.shape
    P = B * H1 * W1
    win = 2 * r + 1
    cm = cost_maps.reshape(P, H2, W2 * heads)
    cen = coords.reshape(P, 2)

    cy = cen[:, 1]
    y0 = jnp.floor(cy).astype(jnp.int32) - r          # first row of window
    t = jnp.arange(win + 1, dtype=jnp.int32)
    idx = y0[:, None] + t[None]                        # (P, win+1)
    valid = (idx >= 0) & (idx < H2)
    rows = jnp.take_along_axis(
        cm, jnp.clip(idx, 0, H2 - 1)[:, :, None], axis=1)  # (P, win+1, W2h)
    rows = rows * valid[:, :, None].astype(cm.dtype)

    fy = (cy - jnp.floor(cy)).astype(jnp.float32)[:, None, None]
    v = ((1.0 - fy) * rows[:, :win].astype(jnp.float32)
         + fy * rows[:, 1:].astype(jnp.float32)).astype(cm.dtype)

    Sx = _bilinear_selector(cen[:, 0], W2, r).astype(cm.dtype)
    v = v.reshape(P, win, W2, heads)
    s = jnp.einsum("pax,ptxh->ptah", Sx, v,
                   preferred_element_type=jnp.float32)
    s = s.transpose(0, 2, 1, 3).astype(coords.dtype)
    return s.reshape(B, H1, W1, win * win * heads)


def timed(name, fn, *args, iters=20):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).sum())
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt * 1000:9.2f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    B, H1, W1 = 8, 64, 64
    dt = jnp.bfloat16
    cost_maps = jnp.asarray(rng.standard_normal((B, H1, W1, H1, W1, 1)), dt)
    # include near-border centers so the OOB path is exercised
    coords = jnp.asarray(rng.uniform(-2, 66, (B, H1, W1, 2)), jnp.float32)

    sel = jax.jit(lambda c, x: encode_flow_token(c, x, r=4))
    rt = jax.jit(lambda c, x: encode_flow_token_rowtake(c, x, r=4))

    a = timed("selector matmul (shipped)", sel, cost_maps, coords)
    b = timed("row-take + lerp + Sx", rt, cost_maps, coords)
    err = float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max())
    print(f"max abs err: {err:.3e}")


if __name__ == "__main__":
    main()
