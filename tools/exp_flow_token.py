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
volume read. Selector stays the production path; the row-take
formulation is kept in flowformer.py as a parity-tested documented
loser (not dispatched by the decoder).

MEASURED (v5e, 2026-08-19, round 5): pallas barrel-select
(ops/pallas/cost_lookup.py) at block_p=128: **4.30 ms, bit-exact vs
selector (max err 0.0)** — LOSES to the 3.29 ms selector matmul; the
per-sublane barrel selects cost more VPU time than the padded-matmul
MXU waste they remove. block_p in {256, 512} cannot be measured in-env:
the remote compile helper dies (HTTP 500, subprocess exit 1 — the same
VMEM-ceiling failure BASELINE.md records for large-grid Pallas
compiles). Selector stays; the kernel is kept parity-tested
(tests/test_pallas_kernels.py, interpret mode) as the third documented
loser, and the STITCHAX_COST_LOOKUP env knob can dispatch it for
future-hardware re-measurement.

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
    encode_flow_token, encode_flow_token_rowtake)


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

    # round-5 candidate: VPU barrel-select Pallas kernel on pre-transposed
    # (H2, P, W2) maps — the transpose is hoisted once per forward in the
    # decoder (12 iterations amortize it), so time both pieces separately
    from stitchax.ops.pallas.cost_lookup import (cost_lookup_transposed,
                                                 transpose_cost_maps)
    tr = jax.jit(transpose_cost_maps)
    cm_t = timed("transpose (ONCE per fwd, not per iter)", tr, cost_maps)
    cen = coords.reshape(-1, 2)
    for bp in (128, 256, 512):
        pk = jax.jit(lambda c, x, bp=bp: cost_lookup_transposed(
            c, x, r=4, block_p=bp))
        try:
            c = timed(f"pallas barrel-select (block_p={bp})", pk, cm_t, cen)
        except Exception as e:  # noqa: BLE001
            print(f"pallas block_p={bp} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}")
            continue
        c = c.transpose(0, 2, 1).reshape(a.shape)
        err = float(jnp.abs(a.astype(jnp.float32)
                            - c.astype(jnp.float32)).max())
        print(f"  max abs err vs selector: {err:.3e}")


if __name__ == "__main__":
    main()
