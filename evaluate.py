"""Eval CLI — preserved public API of the reference's evaluate.py.

Batch PSNR/SSIM over the UDIS-D testing split with the bucketed report
(top-30% / 30-60% / 60-100% of the sorted per-pair scores; cut indices are
fractions of the dataset size rather than the reference's hardcoded 331/663
for its 1106-pair split — identical buckets on the full set)
(reference: evaluate.py:23-152).

TPU-native: the fixed-512 alignment forward is one jitted function over the
batch; metrics run in the native C++ kernel (stitchax/native) instead of
skimage threads.
"""

import argparse
import json
import os


def get_args():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_path", type=str, default="./checkpoints/final_ckpt")
    p.add_argument("--model_config_name", type=str, default="last_config")
    p.add_argument("--data_dir", type=str, default="./UDIS-D/")
    p.add_argument("--batch_size", type=int, default=12)
    p.add_argument("--gpu", type=str, default="0", help="compat flag")
    p.add_argument("--max_pairs", type=int, default=-1,
                   help="evaluate only the first N pairs (quick subset)")
    p.add_argument("--image_size", type=int, default=None,
                   help="override cfg.image_size (square); the reference "
                        "protocol is 512")
    return p.parse_args()


def make_eval_step(stitch_models, align_cfg):
    """Jitted eval forward with the {flow, homo} param trees as ARGUMENTS
    (not trace-time closure constants): one compile per input shape, and
    every weight swap — e.g. tools/eval_trajectory.py walking a training
    run's checkpoints — reuses the same executable instead of paying a
    fresh ~5-min remote compile per checkpoint (CLAUDE.md)."""
    import jax

    from stitchax.align.adapter import train_eval_forward

    @jax.jit
    def eval_step(flow_params, homo_params, img1, img2):
        homo_fn = lambda a, b: stitch_models.homo_model.apply(
            homo_params, a, b)
        flow_fn = lambda a, b: stitch_models.flow_model.apply(
            flow_params, a, b)
        out = train_eval_forward(homo_fn, flow_fn, img1, img2, align_cfg)
        warped = out["final_warp_output"][..., 0:3]
        valid = out["final_warp_output"][..., 3:6].mean(-1, keepdims=True)
        return warped, valid

    return eval_step


def validate_with_model(cfg, loader, stitch_models, align_cfg,
                        eval_step=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stitchax.metrics import psnr_batch, ssim_batch

    if eval_step is None:
        eval_step = make_eval_step(stitch_models, align_cfg)

    # data-parallel across every visible chip: batch-shard inputs, XLA
    # partitions the replicated-model forward (SURVEY.md §2.10 rebuild)
    n_dev = jax.device_count()
    mesh = sharding = None
    if n_dev > 1:
        from stitchax.parallel import batch_sharding, make_mesh
        mesh = make_mesh()
        sharding = batch_sharding(mesh)

    psnr_list, ssim_list, names = [], [], []
    seen = 0
    for batch in loader:
        img1 = jnp.asarray(batch["image1"])
        img2 = jnp.asarray(batch["image2"])
        true_n = img1.shape[0]
        if sharding is not None:
            # pad the batch to a device multiple (padded rows computed then
            # dropped) so sharding engages at every batch size
            pad = -true_n % n_dev
            if pad:
                img1 = jnp.concatenate([img1, img1[-1:].repeat(pad, 0)], 0)
                img2 = jnp.concatenate([img2, img2[-1:].repeat(pad, 0)], 0)
            img1 = jax.device_put(img1, sharding)
            img2 = jax.device_put(img2, sharding)
        warped, valid = eval_step(stitch_models.flow_params,
                                  stitch_models.homo_params, img1, img2)
        warped, valid = warped[:true_n], valid[:true_n]

        i1 = np.clip(np.asarray(img1)[:true_n], 0, 255).astype(np.uint8)
        w = np.clip(np.asarray(warped), 0, 255).astype(np.uint8)
        m = np.asarray(valid).astype(np.uint8)   # binary mask (quantized
        # exactly like the reference's .to(torch.uint8), evaluate.py:55-57)
        a = i1 * m
        b = w * m
        psnr_list += list(psnr_batch(a, b, 255.0))
        ssim_list += list(ssim_batch(a, b, 7, 255.0))
        names += list(batch["name"])
        seen += i1.shape[0]
        print(f"evaluated {seen} pairs; last psnr "
              f"{psnr_list[-1]:.4f} ssim {ssim_list[-1]:.4f}", flush=True)

    n = len(psnr_list)
    c30, c60 = int(round(0.3 * n)), int(round(0.6 * n))

    def bucket(vals):
        import numpy as np
        s = sorted(vals, reverse=True)
        return (float(np.mean(s[:c30])) if c30 else 0.0,
                float(np.mean(s[c30:c60])) if c60 > c30 else 0.0,
                float(np.mean(s[c60:])) if n > c60 else 0.0,
                float(np.mean(s)))

    p30, p60, p100, pavg = bucket(psnr_list)
    s30, s60, s100, savg = bucket(ssim_list)
    print("=================== Analysis ==================")
    print(f"Number of Test {n}")
    print(f"[psnr] top 30%: {p30:.6f}  30~60%: {p60:.6f}  "
          f"60~100%: {p100:.6f}  average: {pavg:.6f}")
    print(f"[ssim] top 30%: {s30:.6f}  30~60%: {s60:.6f}  "
          f"60~100%: {s100:.6f}  average: {savg:.6f}")
    return {
        "avg_psnr": pavg, "avg_ssim": savg,
        "easy_psnr": p30, "mid_psnr": p60, "hard_psnr": p100,
        "easy_ssim": s30, "mid_ssim": s60, "hard_ssim": s100,
        "num_pairs": n,
    }



def _setup_jax_cache():
    from stitchax.utils.platform import setup_cli_jax
    setup_cli_jax()


def main():
    args = get_args()
    _setup_jax_cache()

    from stitchax.align.adapter import AlignConfig
    from stitchax.data import UDISDataset, PrefetchLoader
    from stitchax.run import StitchModels
    from stitchax.run.config import build_eval_config

    cfg = build_eval_config(args)
    if args.image_size:
        cfg.image_size = [args.image_size, args.image_size]
    size = tuple(cfg.get("image_size", [512, 512]))
    ds = UDISDataset(args.data_dir, phase="testing", size=size)
    if args.max_pairs > 0:
        ds.pairs = ds.pairs[:args.max_pairs]
    loader = PrefetchLoader(ds, batch_size=args.batch_size, shuffle=False,
                            num_workers=12)

    # init at the eval resolution: the UDIS2 regression head's fc1 shape
    # depends on input size (the reference pins everything to 512 via
    # resize_to_512 for the same reason) — a checkpoint restores only
    # into a tree built at its own training image_size
    models = StitchModels.build(cfg, use_composition=False,
                                init_size=size[0])
    align_cfg = AlignConfig(
        use_fb_consistency_mask=cfg.get("use_fb_consistency_mask", True))
    result = validate_with_model(cfg, loader, models, align_cfg)
    with open("eval_result.json", "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
