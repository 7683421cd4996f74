"""Headline benchmark: full-stitch pairs/sec/chip (the BASELINE.md north
star), plus the align-step device throughput as an extra metric.

Full stitch = Stitcher.stitch on the demo pair resolution (384x448):
align (homo + FlowFormer fwd+bwd at 512² bf16) -> canvas render -> TPS
breaking -> mix with the classical inpainter, host syncs included —
exactly what `out.py` runs per pair, minus composition (weights-dependent)
and file IO. The align-step metric (512², batch 4) is kept for continuity
with round 1 (BENCH_r01: 12.6 pairs/s). Prints ONE JSON line.

`vs_baseline` is value / REFERENCE_PAIRS_PER_SEC. The reference publishes no
numbers (BASELINE.md), so REFERENCE_PAIRS_PER_SEC = 1.0 pairs/s stands in as
the nominal reference rate for its CUDA pipeline at the same operating point;
replace with a measured value when reference checkpoints are available.
"""

import json
import time

REFERENCE_PAIRS_PER_SEC = 1.0


def bench_full_stitch(flow_model, flow_params, homo_model, homo_params):
    """Stitched pairs/sec through the real per-pair pipeline."""
    import numpy as np
    from stitchax.align.adapter import AlignConfig
    from stitchax.run.stitcher import StitchModels, Stitcher, load_image
    from stitchax.tps.pipeline import TPSConfig

    models = StitchModels(flow_model, flow_params, homo_model, homo_params)
    stitcher = Stitcher(models, {"swap_image": False},
                        AlignConfig(), TPSConfig(),
                        inpainter_name="cv_inpainter",
                        mix_method="all_img1_with_inpaint")

    img1 = load_image("demo_data/demo1/input1.jpg")
    img2 = load_image("demo_data/demo1/input2.jpg")

    stitcher.stitch(img1, img2)  # compile all stages for this shape
    # compile the grouped (batch-2) align program stitch_many uses, then
    # settle the tunnel after compile traffic
    list(stitcher.stitch_many([(img1, img2)] * 2))
    # pipelined sweep throughput: stitch_many overlaps pair k's output
    # transfer with pair k+1's device stages — the sweep rate out.py
    # achieves. The relay link carries ±50% latency jitter and slow
    # recovery after compile traffic (BASELINE.md), so measure several
    # windows and report the MEDIAN: robust to one bad tunnel stall
    # without the upward bias a best-of would introduce (round ≤2
    # numbers were single 15-pair windows — comparable to the median,
    # not to a max).
    windows, iters = 3, 7
    rates = []
    for _ in range(windows):
        t0 = time.perf_counter()
        n = sum(1 for _ in stitcher.stitch_many([(img1, img2)] * iters))
        dt = time.perf_counter() - t0
        assert n == iters
        rates.append(iters / dt)
    return sorted(rates)[len(rates) // 2]


def main():
    import jax
    from stitchax.utils.platform import setup_cli_jax
    setup_cli_jax()
    import jax.numpy as jnp

    from stitchax.align.adapter import AlignConfig, stitch_model_step
    from stitchax.models import FlowFormer, FlowFormerConfig, UDIS2HomographyNet

    backend = jax.default_backend()
    B, S = 4, 512  # batched serving point; eval protocol itself uses batch 12

    flow_model = FlowFormer(FlowFormerConfig(upsample_all=False))
    homo_model = UDIS2HomographyNet()

    k = jax.random.PRNGKey(0)
    img = jnp.zeros((1, S, S, 3), jnp.float32)
    flow_params = jax.jit(flow_model.init)(k, img, img)
    homo_params = jax.jit(homo_model.init)(k, img, img)

    # bf16 backbones (reference runs mixed precision); geometry stays fp32
    from stitchax.models import FlowFormer as FF
    from stitchax.utils.precision import bf16_apply
    homo_fn = lambda a, b: bf16_apply(homo_model.apply, homo_params)(a, b)
    flow_fn = lambda a, b: bf16_apply(flow_model.apply, flow_params)(a, b)
    flow_pair_fn = lambda a, b: bf16_apply(
        lambda p, x, y: flow_model.apply(p, x, y,
                                         method=FF.bidirectional),
        flow_params)(a, b)
    cfg = AlignConfig()

    @jax.jit
    def step(img1, img2):
        out = stitch_model_step(homo_fn, flow_fn, img1, img2, cfg,
                                flow_pair_fn=flow_pair_fn)
        return out["flow"], out["H"], out["origin_occlusion_mask"]

    import numpy as np
    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.uniform(0, 255, (B, S, S, 3)), jnp.float32)
    img2 = jnp.asarray(rng.uniform(0, 255, (B, S, S, 3)), jnp.float32)

    # warmup/compile; sync via host fetch — block_until_ready is async
    # through the remote-TPU relay and enqueue backpressure overcounts
    # (CLAUDE.md benchmarking caveat)
    out = step(img1, img2)
    _ = float(out[0].sum())

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(img1, img2)
    _ = float(out[0].sum())  # device executes in order: syncs the chain
    dt = time.perf_counter() - t0

    align_pairs_per_sec = iters * B / dt

    stitch_pairs_per_sec = bench_full_stitch(flow_model, flow_params,
                                             homo_model, homo_params)

    print(json.dumps({
        "metric": f"full_stitch_pairs_per_sec_per_chip_384x448 ({backend})",
        "value": round(stitch_pairs_per_sec, 4),
        "unit": "pairs/s",
        "vs_baseline": round(stitch_pairs_per_sec / REFERENCE_PAIRS_PER_SEC,
                             4),
        "extra": {
            f"align_pairs_per_sec_per_chip_512_b{B}":
                round(align_pairs_per_sec, 4),
        },
    }))


if __name__ == "__main__":
    main()
