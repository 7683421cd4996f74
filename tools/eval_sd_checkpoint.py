#!/usr/bin/env python
"""Standalone held-out eval of a trained SD-inpaint checkpoint.

Re-runs the train_sd_inpaint_learns.py eval protocol (same seed => same
held-out crops + holes) on a saved stitchax_jax checkpoint WITHOUT
retraining, so checkpoints can be compared across DDIM step counts.
Motivation: the reference inpainter's DDIM default is 50 steps
(reference: core/inference/mix_methods/utils/inpainter.py:96-99 /
StableDiffusionControlNetInpaintPipeline defaults), while the trainer's
in-loop eval used 20 — a trained epsilon-model is usually better at the
step count the scheduler family was designed around.

Usage (TPU): python tools/eval_sd_checkpoint.py \
    --ckpt /tmp/sd_r05/sd_ckpt.pt --ddim_steps 50 [--out result.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def get_args():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--ddim_steps", type=int, default=50)
    p.add_argument("--strength", type=float, default=None,
                   help="diffusers strength; default = the checkpoint's "
                        "preferred_strength (1.0 if it carries none)")
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--n_eval", type=int, default=8)
    p.add_argument("--n_train_advance", type=int, default=64,
                   help="how many train crops the training run drew before "
                        "the eval split (--n_train there); must match it to "
                        "reproduce that run's exact held-out crops")
    p.add_argument("--seed", type=int, default=0,
                   help="must match the training run for a held-out eval")
    p.add_argument("--pool", choices=("all", "scenes", "noise"),
                   default="all",
                   help="'all' reproduces the trainer's mixed held-out "
                        "split exactly; 'scenes'/'noise' restrict the crop "
                        "pool to demo_scenes/demo_data (fresh crops, same "
                        "hole protocol) — on the noise pool the "
                        "PSNR-optimal fill IS smooth interpolation, so "
                        "push-pull is a near-ceiling there; the scenes "
                        "split is where inpainting quality is observable")
    p.add_argument("--out", default=None, help="optional result JSON path")
    p.add_argument("--panel", default=None, help="optional panel PNG path")
    return p.parse_args()


def main():
    args = get_args()
    from stitchax.utils.platform import setup_cli_jax
    setup_cli_jax()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    from stitchax.compose.inpainters import push_pull_inpaint
    from stitchax.models.diffusion import UNetConfig
    from stitchax.models.sd_pipeline import make_sd_inpaint_fn
    from stitchax.models.vae import AutoencoderKL
    from stitchax.train.transref_trainer import random_rect_masks
    from train_sd_inpaint_learns import hole_psnr255, make_crops

    blob = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    assert blob.get("format") == "stitchax_jax", args.ckpt
    cfg = UNetConfig(**blob["configs"]["unet"])
    vae = AutoencoderKL(**blob["configs"]["vae"])
    context = jnp.asarray(blob["context"])

    # identical split construction to the trainer: train crops/holes are
    # drawn first from the same streams, eval second
    rng = np.random.default_rng(args.seed)
    k = jax.random.PRNGKey(args.seed)
    _, _, k_trmask, k_evmask, _ = jax.random.split(k, 5)
    del k_trmask                                       # train masks: keyed, not streamed
    if args.pool == "all":
        _ = make_crops(args.size, args.n_train_advance, rng)  # advance
        eval_imgs = make_crops(args.size, args.n_eval, rng)
    else:
        import glob as _glob
        from PIL import Image
        base = os.path.join(os.path.dirname(__file__), "..",
                            "demo_scenes" if args.pool == "scenes"
                            else "demo_data")
        pool = [np.asarray(Image.open(f).convert("RGB").resize(
                    (2 * args.size, 2 * args.size), Image.BILINEAR),
                    np.float32)
                for f in sorted(_glob.glob(
                    os.path.join(base, "*", "input*.jpg")))]
        assert pool, base
        eval_imgs = make_crops(args.size, args.n_eval, rng, pool)
    eval_holes = np.asarray(
        random_rect_masks(k_evmask, args.n_eval, args.size))

    strength = (args.strength if args.strength is not None
                else float(blob.get("preferred_strength", 1.0)))
    fn = jax.jit(make_sd_inpaint_fn(
        blob["unet_vars"], blob["controlnet_vars"], blob["vae_vars"],
        context, cfg=cfg, vae=vae, num_steps=args.ddim_steps,
        seed=args.seed, strength=strength))
    outs = np.stack([np.asarray(fn(jnp.asarray(eval_imgs[i]),
                                   jnp.asarray(eval_holes[i])))
                     for i in range(args.n_eval)])
    psnr = hole_psnr255(outs, eval_imgs, eval_holes)

    pp = jax.jit(push_pull_inpaint)
    pp_outs = np.stack([np.asarray(pp(jnp.asarray(eval_imgs[i]),
                                      jnp.asarray(eval_holes[i])))
                        for i in range(args.n_eval)])
    psnr_pp = hole_psnr255(pp_outs, eval_imgs, eval_holes)

    result = dict(ckpt=args.ckpt, ddim_steps=args.ddim_steps,
                  strength=strength,
                  n_eval=args.n_eval, seed=args.seed, pool=args.pool,
                  hole_psnr=round(psnr, 2),
                  push_pull_psnr=round(psnr_pp, 2),
                  beats_push_pull=psnr > psnr_pp)
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    if args.panel:
        from PIL import Image
        holed = eval_imgs[0] * (1 - eval_holes[0])
        row = np.concatenate([holed, pp_outs[0], outs[0], eval_imgs[0]],
                             axis=1)
        Image.fromarray(np.clip(row, 0, 255).astype(np.uint8)).save(
            args.panel)


if __name__ == "__main__":
    main()
