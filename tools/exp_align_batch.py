"""Experiment: align-step batch scaling at 512^2 bf16.

Round-2 probe: b8 = 15.7 pairs/s vs b4 = 17.7 (HBM pressure; the GMA
attention + cost volume double). Re-probed after the round-3 decoder
restructure (mask head out of the scan, fused GRU) cut per-iteration
HBM traffic.

MEASURED (v5e, 2026-08-17, concurrent CPU load — relative only):
b4 18.09 / b6 15.40 / b8 16.11 pairs/s. Scaling past b4 is still
sub-linear — the O(B*N^2) cost volume + GMA attention dominate HBM at
512^2 — so batch 4 stays the operating point.

Usage: python tools/exp_align_batch.py [batches...]
"""

import sys
import time

sys.path.insert(0, ".")
from stitchax.utils.platform import setup_cli_jax  # noqa: E402

setup_cli_jax()

import jax                       # noqa: E402
import jax.numpy as jnp          # noqa: E402
import numpy as np               # noqa: E402


def main():
    from stitchax.align.adapter import AlignConfig, stitch_model_step
    from stitchax.models import (FlowFormer, FlowFormerConfig,
                                 UDIS2HomographyNet)
    from stitchax.utils.precision import bf16_apply

    S = 512
    batches = [int(b) for b in sys.argv[1:]] or [4, 6, 8]

    flow_model = FlowFormer(FlowFormerConfig(upsample_all=False))
    homo_model = UDIS2HomographyNet()
    k = jax.random.PRNGKey(0)
    img = jnp.zeros((1, S, S, 3), jnp.float32)
    flow_params = jax.jit(flow_model.init)(k, img, img)
    homo_params = jax.jit(homo_model.init)(k, img, img)

    homo_fn = lambda a, b: bf16_apply(homo_model.apply, homo_params)(a, b)
    flow_fn = lambda a, b: bf16_apply(flow_model.apply, flow_params)(a, b)
    flow_pair_fn = lambda a, b: bf16_apply(
        lambda p, x, y: flow_model.apply(p, x, y,
                                         method=FlowFormer.bidirectional),
        flow_params)(a, b)
    cfg = AlignConfig()

    @jax.jit
    def step(img1, img2):
        out = stitch_model_step(homo_fn, flow_fn, img1, img2, cfg,
                                flow_pair_fn=flow_pair_fn)
        return out["flow"], out["H"], out["origin_occlusion_mask"]

    rng = np.random.default_rng(0)
    for B in batches:
        img1 = jnp.asarray(rng.uniform(0, 255, (B, S, S, 3)), jnp.float32)
        img2 = jnp.asarray(rng.uniform(0, 255, (B, S, S, 3)), jnp.float32)
        out = step(img1, img2)
        _ = float(out[0].sum())
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(img1, img2)
        _ = float(out[0].sum())
        dt = time.perf_counter() - t0
        print(f"b{B}: {iters * B / dt:7.2f} pairs/s "
              f"({dt / iters * 1000:6.1f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
