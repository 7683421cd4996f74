"""Time the REFERENCE implementation on the hardware this environment has.

BASELINE.md's standing caveat (and VERDICT r2 weak #7) is that
`vs_baseline` divides by a nominal 1.0 pairs/s because the reference
publishes no numbers and no CUDA GPU exists here. What CAN be measured
honestly is the reference's per-pair align compute on this host's CPU —
the actual torch modules (via tests/refstubs), random weights, eval mode —
against stitchax's equivalent align step on the SAME CPU. That yields a
same-hardware speed ratio (architecture + XLA vs torch eager) that is
meaningful on its own, independent of the TPU numbers.

Per reference pair (test_out path, core/flowHomoAdpater.py):
  1 homography forward (UDIS2Network, 512²)            :236 region
  2 FlowFormer forwards (fwd + bwd flow, 512²)         :236, :326

stitchax equivalent: stitch_model_step with the bidirectional flow method
(homo + shared-feature fwd+bwd flow + occlusion chain), jitted, fp32 on
CPU for both sides (CPU bf16 is emulated — unfair to both).

Run on an otherwise-idle host:
  python tools/bench_reference.py [--iters 3] [--size 512]

Prints one JSON line; numbers recorded in BASELINE.md.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def ref_cfg(size):
    """The shipped percostformer3 sub-config (reference:
    configs/last_config.py) minus wandb/paths."""
    from types import SimpleNamespace
    f = size // 8
    return SimpleNamespace(
        pe="linear", gma="GMA", cnet="twins", fnet="twins",
        gt_r=15, r_16=-1, no_sc=False, fix_pe=False, dropout=0.0,
        use_rpe=False, H_offset=0, W_offset=0, attn_dim=128, droppath=0.0,
        pic_size=[f, f, f, f], pretrain=False, no_border=True,
        query_num=30, use_patch=False, cross_attn="all", del_layers=True,
        flow_or_pe="and", mask_ratio=0.5, patch_size=8, vert_c_dim=64,
        patch_embed="single", detach_local=False,
        decoder_depth=12, encoder_depth=3,
        expand_factor=4, pretrain_mode=False, quater_refine=False,
        use_convertor=False, cost_heads_num=1, cost_latent_dim=128,
        cost_encoder_res=True, query_latent_dim=64, encoder_latent_dim=256,
        cost_latent_input_dim=64, cost_latent_token_num=8,
        vertical_encoder_attn="twins")


def time_reference(size, iters):
    import numpy as np
    import torch
    from ref_loader import import_ref

    torch.manual_seed(0)
    tf = import_ref("core.FlowFormer.PerCostFormer3.transformer")
    hn = import_ref("core.UDIS2.Homography.network")
    flow = tf.FlowFormer(ref_cfg(size)).eval()
    homo = hn.UDIS2Network(only_homo=True).eval()

    rng = np.random.default_rng(0)
    i1 = torch.from_numpy(
        rng.uniform(0, 255, (1, 3, size, size)).astype(np.float32))
    i2 = torch.from_numpy(
        rng.uniform(0, 255, (1, 3, size, size)).astype(np.float32))
    # homography net takes both inputs in [-1, 1] (UDIS2 convention)
    i1n = 2 * (i1 / 255.0) - 1.0
    i2n = 2 * (i2 / 255.0) - 1.0

    def pair_forward():
        with torch.no_grad():
            homo(i1n, i2n)          # 1 homography pass
            flow(i1, i2)            # fwd flow
            flow(i2, i1)            # bwd flow
    pair_forward()  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        pair_forward()
    dt = (time.perf_counter() - t0) / iters
    return dt, torch.get_num_threads()


def time_stitchax_cpu(size, iters):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from stitchax.align.adapter import AlignConfig, stitch_model_step
    from stitchax.models import (FlowFormer, FlowFormerConfig,
                                 UDIS2HomographyNet)

    flow_model = FlowFormer(FlowFormerConfig(upsample_all=False))
    homo_model = UDIS2HomographyNet()
    k = jax.random.PRNGKey(0)
    img0 = jnp.zeros((1, size, size, 3), jnp.float32)
    flow_params = jax.jit(flow_model.init)(k, img0, img0)
    homo_params = jax.jit(homo_model.init)(k, img0, img0)

    homo_fn = lambda a, b: homo_model.apply(homo_params, a, b)
    flow_fn = lambda a, b: flow_model.apply(flow_params, a, b)
    flow_pair_fn = lambda a, b: flow_model.apply(
        flow_params, a, b, method=FlowFormer.bidirectional)
    cfg = AlignConfig()

    @jax.jit
    def step(img1, img2):
        out = stitch_model_step(homo_fn, flow_fn, img1, img2, cfg,
                                flow_pair_fn=flow_pair_fn)
        return out["flow"], out["H"], out["origin_occlusion_mask"]

    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.uniform(0, 255, (1, size, size, 3)), jnp.float32)
    i2 = jnp.asarray(rng.uniform(0, 255, (1, size, size, 3)), jnp.float32)
    out = step(i1, i2)
    jax.block_until_ready(out)  # local CPU: honest sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(i1, i2)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--size", type=int, default=512)
    args = p.parse_args()

    ref_s, threads = time_reference(args.size, args.iters)
    ours_s = time_stitchax_cpu(args.size, args.iters)
    print(json.dumps({
        "metric": f"align_per_pair_seconds_host_cpu_{args.size}",
        "reference_torch_eager_s": round(ref_s, 3),
        "stitchax_xla_cpu_s": round(ours_s, 3),
        "same_hardware_speedup": round(ref_s / ours_s, 2),
        "torch_threads": threads,
        "note": "1 homo + 2 flow forwards per pair, batch 1, fp32, "
                "random weights, eval mode, same host CPU",
    }))


if __name__ == "__main__":
    main()
