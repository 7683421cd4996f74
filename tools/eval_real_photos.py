#!/usr/bin/env python
"""Quantitative metrics on the REAL photo pairs bundled with the reference
(VERDICT r4 #2): every other quality number in this repo lives on
self-generated synthetic data; this tool anchors the trained weights on
real photography with committed NUMBERS (imagery stays uncommitted — the
pairs are reference-derived).

Two measurements over /root/reference/demo/ (two 512x512 parking-lot
pairs, read-only):

1. evaluate-protocol masked overlap PSNR/SSIM (the reference's metric
   definition, evaluate.py:58-59: uint8-quantized warped image2 vs
   image1 over the fb-consistency validity mask) — trained checkpoint
   vs random init, per pair + mean;
2. composition ghost/seam scores (tools/eval_composition_outputs.py) on
   full out.py sweeps of the same pairs — optional via --composition,
   runs 2 CLI sweeps.

Writes results/real_photo_metrics_r05.json (or --out).

Usage (TPU): python tools/eval_real_photos.py \
    --ckpt_path results/ckpt_r05_bf16.npz [--composition]
"""

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DEMO_ROOT = "/root/reference/demo"


def get_args():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_path", required=True,
                   help="trained npz (StitchModels.restore_npz format)")
    p.add_argument("--demo_root", default=DEMO_ROOT)
    p.add_argument("--out", default=None)
    p.add_argument("--composition", action="store_true",
                   help="also run 2 out.py sweeps (fast_cv_g8_comp) and "
                        "score ghost/seam on both arms")
    p.add_argument("--tag", default="r05")
    return p.parse_args()


def load_pairs(root):
    import numpy as np
    from PIL import Image
    pairs = []
    for d in sorted(os.listdir(root)):
        p1 = os.path.join(root, d, "input1.jpg")
        p2 = os.path.join(root, d, "input2.jpg")
        if os.path.isfile(p1) and os.path.isfile(p2):
            pairs.append((d,
                          np.asarray(Image.open(p1).convert("RGB"),
                                     np.float32),
                          np.asarray(Image.open(p2).convert("RGB"),
                                     np.float32)))
    assert pairs, f"no pairs under {root}"
    return pairs


def overlap_metrics(models, pairs, align_cfg):
    """The evaluate.py protocol verbatim: uint8-quantized masked overlap
    PSNR/SSIM per pair (reference: evaluate.py:53-59)."""
    import jax.numpy as jnp
    import numpy as np

    from evaluate import make_eval_step
    from stitchax.metrics import psnr_batch, ssim_batch

    step = make_eval_step(models, align_cfg)
    out = {}
    for name, i1, i2 in pairs:
        warped, valid = step(models.flow_params, models.homo_params,
                             jnp.asarray(i1)[None], jnp.asarray(i2)[None])
        a = (np.clip(np.asarray(i1)[None], 0, 255).astype(np.uint8)
             * np.asarray(valid).astype(np.uint8))
        b = (np.clip(np.asarray(warped), 0, 255).astype(np.uint8)
             * np.asarray(valid).astype(np.uint8))
        out[name] = dict(psnr=round(float(psnr_batch(a, b, 255.0)[0]), 3),
                         ssim=round(float(ssim_batch(a, b, 7, 255.0)[0]),
                                    4))
    vals = list(out.values())
    out["mean"] = dict(
        psnr=round(sum(v["psnr"] for v in vals) / len(vals), 3),
        ssim=round(sum(v["ssim"] for v in vals) / len(vals), 4))
    return out


def composition_scores(ckpt, demo_root, tag):
    """Drive out.py (fast_cv_g8_comp) for trained + random arms and score
    ghost/seam (tools/eval_composition_outputs.py score_sweep)."""
    sys.path.insert(0, os.path.dirname(__file__))
    from eval_composition_outputs import score_sweep

    scores = {}
    for arm, extra in (("trained", ["--ckpt_path", ckpt]),
                       ("random_init", [])):
        root = f"/tmp/real_photo_comp_{tag}_{arm}"
        cmd = [sys.executable, "out.py", "--data_root_path",
               demo_root + "/", "--txt_file", "demo.txt", "--inf_cfg",
               "fast_cv_g8_comp", "--result_dir", root] + extra
        print("running:", " ".join(cmd), flush=True)
        r = subprocess.run(cmd, capture_output=True, text=True,
                           cwd=os.path.join(os.path.dirname(__file__),
                                            ".."))
        if r.returncode != 0:
            print(r.stdout[-1500:], r.stderr[-1500:])
            scores[arm] = {"error": f"out.py rc={r.returncode}"}
            continue
        # out.py nests the sweep under {result_dir}/{cfg}_g{..}_{tps}/
        import glob as _glob
        sweeps = [d for d in _glob.glob(os.path.join(root, "*"))
                  if os.path.isdir(d)]
        s = score_sweep(sweeps[0]) if sweeps else None
        scores[arm] = (s["aggregate"] if s else
                       {"error": "no scorable dirs"})
    return scores


def main():
    args = get_args()
    from stitchax.utils.platform import setup_cli_jax
    setup_cli_jax()

    from stitchax.align.adapter import AlignConfig
    from stitchax.run.stitcher import StitchModels

    pairs = load_pairs(args.demo_root)
    align_cfg = AlignConfig()
    cfg = {"model_config_name": "last_config"}

    models = StitchModels.build(cfg, rng_seed=0, use_composition=False,
                                init_size=512)
    random_arm = overlap_metrics(models, pairs, align_cfg)
    print("random init:", json.dumps(random_arm), flush=True)

    models.restore_npz(os.path.abspath(args.ckpt_path))
    trained_arm = overlap_metrics(models, pairs, align_cfg)
    print("trained:", json.dumps(trained_arm), flush=True)

    result = dict(
        protocol="evaluate.py masked-overlap PSNR/SSIM "
                 "(reference evaluate.py:53-59, uint8-quantized), real "
                 "pairs from /root/reference/demo (imagery not committed)",
        ckpt=args.ckpt_path, pairs=[p[0] for p in pairs],
        trained=trained_arm, random_init=random_arm)

    if args.composition:
        result["composition"] = composition_scores(
            os.path.abspath(args.ckpt_path), args.demo_root, args.tag)

    out = args.out or os.path.join(
        os.path.dirname(__file__), "..", "results",
        f"real_photo_metrics_{args.tag}.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
