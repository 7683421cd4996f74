"""Eval trajectory over a training run's checkpoints (VERDICT r3 item 3).

Loads each `step_NNNNNNNN` orbax checkpoint a train.py run saved, extracts
its {flow, homo} params, and runs the evaluate.py protocol (bucketed
PSNR/SSIM on the testing split) in ONE process — the jitted eval step
compiles once and every checkpoint reuses it, so a 10-point trajectory
costs one compile + 10 cheap sweeps instead of 10 CLI cold starts.

  python tools/eval_trajectory.py --ckpt_dir /tmp/train_r04 \
      --data_dir /tmp/udis_synth --every 3000 --out results/train_r04/

Writes {out}/trajectory.json: [{step, avg_psnr, avg_ssim, ...}, ...].
"""

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_dir", type=str, required=True)
    p.add_argument("--data_dir", type=str, required=True)
    p.add_argument("--every", type=int, default=3000,
                   help="evaluate checkpoints whose step is a multiple of "
                        "this (the last checkpoint is always included)")
    p.add_argument("--batch_size", type=int, default=12)
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--max_pairs", type=int, default=-1)
    p.add_argument("--include_init", action="store_true",
                   help="also evaluate the random-init (step 0) params")
    p.add_argument("--out", type=str, default="results/train_r04")
    args = p.parse_args()

    from stitchax.utils.platform import setup_cli_jax
    setup_cli_jax()

    import orbax.checkpoint as ocp

    from evaluate import make_eval_step, validate_with_model
    from stitchax.align.adapter import AlignConfig
    from stitchax.data import PrefetchLoader, UDISDataset
    from stitchax.run import StitchModels
    from stitchax.run.config import CfgNode, _load_module_attr

    steps = []
    for name in os.listdir(args.ckpt_dir):
        m = re.fullmatch(r"step_(\d+)", name)
        if m:
            steps.append(int(m.group(1)))
    steps.sort()
    assert steps, f"no step_* checkpoints under {args.ckpt_dir}"
    chosen = [s for s in steps if s % args.every == 0]
    if steps[-1] not in chosen:
        chosen.append(steps[-1])
    print(f"evaluating checkpoints: {chosen}")

    cfg = CfgNode(_load_module_attr("configs.last_config", "config_dict"))
    cfg.image_size = [args.image_size, args.image_size]
    size = (args.image_size, args.image_size)
    ds = UDISDataset(args.data_dir, phase="testing", size=size)
    if args.max_pairs > 0:
        ds.pairs = ds.pairs[:args.max_pairs]
    loader = list(PrefetchLoader(ds, batch_size=args.batch_size,
                                 shuffle=False, num_workers=4))

    models = StitchModels.build(cfg, use_composition=False,
                                init_size=size[0])
    align_cfg = AlignConfig(
        use_fb_consistency_mask=cfg.get("use_fb_consistency_mask", True))

    ckpt = ocp.StandardCheckpointer()
    rows = []
    # ONE jitted step shared by every checkpoint (params are arguments,
    # not closure constants — see evaluate.make_eval_step)
    eval_step = make_eval_step(models, align_cfg)

    def eval_at(step_label):
        r = validate_with_model(cfg, loader, models, align_cfg,
                                eval_step=eval_step)
        r["step"] = step_label
        rows.append(r)
        print(f"[step {step_label}] avg_psnr={r['avg_psnr']:.4f} "
              f"avg_ssim={r['avg_ssim']:.4f}", flush=True)

    if args.include_init:
        eval_at(0)

    for s in chosen:
        restored = ckpt.restore(
            os.path.abspath(os.path.join(args.ckpt_dir, f"step_{s:08d}")))
        params = restored["params"]
        models.flow_params = params["flow"]
        models.homo_params = params["homo"]
        eval_at(s)

    os.makedirs(args.out, exist_ok=True)
    out_path = os.path.join(args.out, "trajectory.json")
    with open(out_path, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
