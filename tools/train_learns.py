"""Prove the reconstructed trainer LEARNS (VERDICT r2 item 3).

Builds a synthetic supervised task from the demo images — img2 is img1
resampled through a random known homography plus a smooth random residual
flow — then drives the REAL training stack (stitchax.train.make_train_step,
the shipped loss weights, OneCycle AdamW, mesh data-parallel) for a few
hundred steps and measures on held-out synthetic pairs:

  * training loss trajectory (must decrease),
  * overlap PSNR of the fully-aligned output vs img1 (must improve
    materially over the step-0 value),
  * overlap PSNR of the homography-only warp (the final aligned PSNR must
    beat it — the residual flow has to earn its keep).

Run (CPU mesh):
  STITCHAX_PLATFORM=cpu XLA_FLAGS=--xla_force_host_platform_device_count=2 \
    python tools/train_learns.py --steps 300 --size 128 --batch 2

Writes {out}/result.json + loss curve + figure dashboards; prints a
PASS/FAIL verdict line per criterion. Numbers recorded in STATUS.md.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def get_args():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--n_train", type=int, default=24)
    p.add_argument("--n_eval", type=int, default=4)
    p.add_argument("--lr", type=float, default=2e-4,
                   help="demo OneCycle peak lr (the shipped 3.1e-6 is "
                        "sized for 31k steps; a few hundred need more)")
    p.add_argument("--eval_every", type=int, default=50)
    p.add_argument("--corner_px", type=float, default=10.0)
    p.add_argument("--resid_px", type=float, default=3.0)
    p.add_argument("--out", type=str, default="/tmp/train_learns")
    p.add_argument("--save_ckpt", action="store_true", default=False,
                   help="also export {out}/final_ckpt in the eval/stitch "
                        "checkpoint format (StitchModels.restore)")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def make_synthetic_pairs(size, n, corner_px, resid_px, rng):
    """img2(p) = img1(H(p) + r(p)) with known random H and smooth r."""
    import numpy as np
    from PIL import Image
    import jax
    import jax.numpy as jnp
    from stitchax import ops

    demos = []
    root = os.path.join(os.path.dirname(__file__), "..", "demo_data")
    for d in sorted(os.listdir(root)):
        p = os.path.join(root, d, "input1.jpg")
        q = os.path.join(root, d, "input2.jpg")
        for f in (p, q):
            if os.path.isfile(f):
                demos.append(np.asarray(
                    Image.open(f).convert("RGB").resize(
                        (size, size), Image.BILINEAR), np.float32))
    assert demos, "no demo images found"

    S = float(size)
    src = np.array([[0, 0], [S, 0], [0, S], [S, S]], np.float32)
    pairs = []
    for i in range(n):
        base = demos[i % len(demos)]
        # photometric variety: random flips + brightness jitter
        if rng.random() < 0.5:
            base = base[:, ::-1]
        if rng.random() < 0.5:
            base = base[::-1]
        base = np.clip(base * rng.uniform(0.7, 1.3), 0, 255)

        offs = rng.uniform(-corner_px, corner_px, (4, 2)).astype(np.float32)
        H = np.asarray(ops.dlt_solve(jnp.asarray(src[None]),
                                     jnp.asarray((src + offs)[None])))[0]
        # smooth residual: low-frequency field upsampled from 4x4 knots
        knots = rng.uniform(-resid_px, resid_px, (4, 4, 2)).astype(np.float32)
        r = np.asarray(Image.fromarray(knots[..., 0]).resize(
            (size, size), Image.BICUBIC))
        r2 = np.asarray(Image.fromarray(knots[..., 1]).resize(
            (size, size), Image.BICUBIC))
        resid = np.stack([r, r2], -1)

        grid = np.asarray(ops.coords_grid(size, size))
        pts = grid.reshape(-1, 2)
        warped = np.asarray(ops.apply_homography_to_points(
            jnp.asarray(H), jnp.asarray(pts))).reshape(size, size, 2)
        sample_at = warped + resid
        img2 = np.asarray(ops.bilinear_sampler(
            jnp.asarray(base), jnp.asarray(sample_at)))
        pairs.append((base.astype(np.float32), img2.astype(np.float32)))
    return pairs


def main():
    args = get_args()
    os.makedirs(args.out, exist_ok=True)
    from stitchax.utils.platform import setup_cli_jax
    setup_cli_jax()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from stitchax.align.adapter import AlignConfig
    from stitchax.models import (FlowFormer, FlowFormerConfig,
                                 UDIS2HomographyNet)
    from stitchax.parallel import (make_mesh, make_parallel_train_step,
                                   shard_batch)
    from stitchax.train import (LossConfig, OptimConfig, create_train_state,
                                make_train_step)
    from stitchax.train.trainer import align_train_forward

    rng = np.random.default_rng(args.seed)
    train_pairs = make_synthetic_pairs(args.size, args.n_train,
                                       args.corner_px, args.resid_px, rng)
    eval_pairs = make_synthetic_pairs(args.size, args.n_eval,
                                      args.corner_px, args.resid_px, rng)

    flow_model = FlowFormer(FlowFormerConfig())
    homo_model = UDIS2HomographyNet()
    k = jax.random.PRNGKey(args.seed)
    img = jnp.zeros((1, args.size, args.size, 3), jnp.float32)
    params = {"homo": jax.jit(homo_model.init)(k, img, img),
              "flow": jax.jit(flow_model.init)(k, img, img)}

    optim_cfg = OptimConfig(canonical_lr=args.lr, num_steps=args.steps,
                            batch_scale=1)
    state, tx = create_train_state(params, optim_cfg)
    align_cfg = AlignConfig(use_fb_consistency_mask=True)
    loss_cfg = LossConfig()
    homo_apply = lambda p, a, b: homo_model.apply(p, a, b)
    flow_apply = lambda p, a, b: flow_model.apply(p, a, b)
    step_fn = make_train_step(homo_apply, flow_apply, tx, align_cfg,
                              loss_cfg, use_fb_consistency_mask=True)
    mesh = make_mesh()
    pstep = make_parallel_train_step(step_fn, mesh)
    state = jax.device_put(state, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()))

    e1 = jnp.asarray(np.stack([p[0] for p in eval_pairs]))
    e2 = jnp.asarray(np.stack([p[1] for p in eval_pairs]))

    @jax.jit
    def eval_fwd(params, img1, img2):
        fwd = align_train_forward(homo_apply, flow_apply, params,
                                  img1, img2, align_cfg)
        from stitchax import ops as _ops
        warped = _ops.flow_warp_b(fwd["output_H"],
                                  fwd["flow_predictions"][-1])
        return fwd["output_H"], warped

    def masked_psnr(a, b, mask):
        m = mask.astype(np.float64)
        mse = (((a - b) ** 2) * m).sum() / max(m.sum() * a.shape[-1], 1.0)
        return float(10 * np.log10(255.0 ** 2 / max(mse, 1e-12)))

    def eval_psnrs(state):
        oh, fw = eval_fwd(state.params, e1, e2)
        oh, fw = np.asarray(oh), np.asarray(fw)
        e1n = np.asarray(e1)
        p_h, p_f = [], []
        for i in range(oh.shape[0]):
            mh = (oh[i, ..., 3:6].mean(-1) > 0.5)[..., None]
            mf = (fw[i, ..., 3:6].mean(-1) > 0.5)[..., None]
            p_h.append(masked_psnr(e1n[i], oh[i, ..., 0:3], mh))
            p_f.append(masked_psnr(e1n[i], fw[i, ..., 0:3], mf))
        return float(np.mean(p_h)), float(np.mean(p_f))

    history = []
    psnr_h0, psnr_f0 = eval_psnrs(state)
    print(f"[step 0] homo-only PSNR {psnr_h0:.2f}  aligned PSNR {psnr_f0:.2f}",
          flush=True)

    step, losses = 0, []
    order = np.arange(len(train_pairs))
    while step < args.steps:
        rng.shuffle(order)
        for i0 in range(0, len(order) - args.batch + 1, args.batch):
            if step >= args.steps:
                break
            sel = order[i0:i0 + args.batch]
            b1 = jnp.asarray(np.stack([train_pairs[i][0] for i in sel]))
            b2 = jnp.asarray(np.stack([train_pairs[i][1] for i in sel]))
            b1, b2 = shard_batch((b1, b2), mesh)
            state, metrics = pstep(state, b1, b2)
            step += 1
            losses.append(float(metrics["total"]))
            if step % args.eval_every == 0 or step == args.steps:
                ph, pf = eval_psnrs(state)
                history.append(dict(step=step, loss=losses[-1],
                                    psnr_homo=ph, psnr_aligned=pf))
                print(f"[step {step}] loss {losses[-1]:.4f}  homo-only "
                      f"PSNR {ph:.2f}  aligned PSNR {pf:.2f}", flush=True)

    # dashboards (reference logger.py plot_the_results panels).
    # MUST be jitted: an eager model forward dispatches thousands of ops
    # through the remote-TPU tunnel at ~1s each (CLAUDE.md)
    try:
        from stitchax.utils.logger import save_train_dashboard

        @jax.jit
        def flow_of(params, a, b):
            fwd = align_train_forward(homo_apply, flow_apply, params,
                                      a, b, align_cfg)
            return fwd["flow_predictions"][-1]

        flow1 = np.asarray(flow_of(state.params, e1[:1], e2[:1]))
        save_train_dashboard(os.path.join(args.out, "panel_final.png"),
                             np.asarray(e1[0]), np.asarray(e2[0]),
                             flow1[0])
    except Exception as e:  # noqa: BLE001
        print(f"dashboard skipped: {e}")

    first = float(np.mean(losses[:20]))
    last = float(np.mean(losses[-20:]))
    ph_end, pf_end = history[-1]["psnr_homo"], history[-1]["psnr_aligned"]
    checks = {
        "loss_decreases": last < 0.8 * first,
        "aligned_psnr_improves_over_init": pf_end > psnr_f0 + 2.0,
        "aligned_beats_homo_only": pf_end > ph_end + 0.5,
    }
    result = dict(steps=args.steps, size=args.size, batch=args.batch,
                  lr=args.lr, loss_first20=first, loss_last20=last,
                  psnr_homo_init=psnr_h0, psnr_aligned_init=psnr_f0,
                  psnr_homo_final=ph_end, psnr_aligned_final=pf_end,
                  history=history, checks=checks)
    with open(os.path.join(args.out, "result.json"), "w") as f:
        json.dump(result, f, indent=2)
    if args.save_ckpt:
        # eval/stitch-format {flow, homo} tree (same contract as
        # train.py's final_ckpt export) so the learned weights can drive
        # evaluate.py / out.py --ckpt_path afterwards
        import orbax.checkpoint as ocp
        final = os.path.abspath(os.path.join(args.out, "final_ckpt"))
        host_params = jax.device_get(state.params)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(final, {"flow": host_params["flow"],
                           "homo": host_params["homo"]}, force=True)
        ckptr.wait_until_finished()
        print(f"saved eval-format checkpoint {final}")
    for name, ok in checks.items():
        print(f"[{'PASS' if ok else 'FAIL'}] {name}")
    print(json.dumps({k: v for k, v in result.items() if k != "history"}))


if __name__ == "__main__":
    main()
