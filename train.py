"""Train CLI — reconstruction of the reference's unshipped training loop.

The reference ships a full trainer config but no train.py (SURVEY.md §3.3);
this rebuilds it from the surviving pieces: configs/last_config.py trainer
block (AdamW + OneCycleLR, 31323 steps, batch 1, seq-loss gamma 0.8),
fetch_dataloader's 'udis' stage, the train_eval forward, and the Logger.

TPU-native: one jitted train step, data-parallel over the device mesh,
orbax checkpoints with mid-run save/resume (which the reference lacked).
"""

import argparse
import os


def get_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model_config_name", type=str, default="last_config")
    p.add_argument("--data_dir", type=str, default=None,
                   help="overrides udis_dataset.data_dir from the config")
    p.add_argument("--num_steps", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--ckpt_dir", type=str, default="./checkpoints/train")
    p.add_argument("--save_every", type=int, default=5000)
    p.add_argument("--log_every", type=int, default=100)
    p.add_argument("--panel_every", type=int, default=5000,
                   help="emit a figure dashboard (inputs/flow/warp/blend) "
                        "every N steps; 0 disables")
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--init_npz", type=str, default=None,
                   help="warm-start params from a {flow, homo} bf16 npz "
                        "snapshot (convert.save_params_npz) — optimizer "
                        "state and step count start fresh; use to EXTEND a "
                        "run whose fp32 orbax original is gone (pair with "
                        "--lr for a lower warm-restart peak)")
    p.add_argument("--lr", type=float, default=None,
                   help="override trainer.canonical_lr")
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--image_size", type=int, default=None,
                   help="override cfg.image_size (square)")
    p.add_argument("--remat", action="store_true", default=False,
                   help="rematerialize backbones in backward (less HBM)")
    return p.parse_args()



def _setup_jax_cache():
    from stitchax.utils.platform import setup_cli_jax
    setup_cli_jax()


def main():
    args = get_args()
    _setup_jax_cache()

    import jax
    import jax.numpy as jnp

    from stitchax.align.adapter import AlignConfig
    from stitchax.data import fetch_dataloader
    from stitchax.models import (FlowFormer, FlowFormerConfig,
                                 UDIS2HomographyNet)
    from stitchax.parallel import make_mesh, make_parallel_train_step, shard_batch
    from stitchax.run.config import build_eval_config
    from stitchax.train import (LossConfig, OptimConfig, create_train_state,
                                make_train_step, restore_checkpoint,
                                save_checkpoint)
    from stitchax.utils.logger import Logger

    cfg = build_eval_config(args)
    if args.data_dir:
        cfg.udis_dataset.data_dir = args.data_dir
    if args.batch_size:
        cfg.batch_size = args.batch_size
    if args.image_size:
        cfg.image_size = [args.image_size, args.image_size]
    trainer = cfg.trainer
    num_steps = args.num_steps or trainer.num_steps

    S = cfg.image_size[0]
    ff = cfg.percostformer3
    flow_cfg = FlowFormerConfig(
        cost_heads_num=ff.cost_heads_num,
        cost_latent_input_dim=ff.cost_latent_input_dim,
        cost_latent_token_num=ff.cost_latent_token_num,
        cost_latent_dim=ff.cost_latent_dim,
        encoder_latent_dim=ff.encoder_latent_dim,
        query_latent_dim=ff.query_latent_dim,
        encoder_depth=ff.encoder_depth, decoder_depth=ff.decoder_depth,
        patch_size=ff.patch_size, vert_c_dim=ff.vert_c_dim, gma=ff.gma)
    flow_model = FlowFormer(flow_cfg)
    homo_model = UDIS2HomographyNet()

    k = jax.random.PRNGKey(args.seed)
    img = jnp.zeros((1, S, S, 3), jnp.float32)
    params = {"homo": jax.jit(homo_model.init)(k, img, img),
              "flow": jax.jit(flow_model.init)(k, img, img)}
    if args.init_npz:
        from stitchax import convert
        params.update(convert.load_params_npz(
            os.path.abspath(args.init_npz),
            {"flow": params["flow"], "homo": params["homo"]}))
        print(f"warm-started params from {args.init_npz}")

    optim_cfg = OptimConfig(
        canonical_lr=(args.lr if args.lr is not None
                      else trainer.canonical_lr), num_steps=num_steps,
        adamw_decay=trainer.adamw_decay, epsilon=trainer.epsilon,
        clip=trainer.clip, anneal_strategy=trainer.anneal_strategy,
        batch_scale=cfg.batch_size)
    state, tx = create_train_state(params, optim_cfg)
    if args.resume:
        state = restore_checkpoint(os.path.abspath(args.resume), state)
        print(f"resumed from {args.resume} at step {int(state.step)}")

    align_cfg = AlignConfig(
        use_fb_consistency_mask=cfg.get("use_fb_consistency_mask", True))
    loss_cfg = LossConfig(
        gamma=cfg.gamma,
        rigid_motion_weight=cfg.get("rigid_motion_loss_weight", 0.3),
        border_weight=cfg.get("border_loss_weight", 0.5),
        max_flow=cfg.get("max_flow", 500))

    homo_apply = lambda p, a, b: homo_model.apply(p, a, b)
    flow_apply = lambda p, a, b: flow_model.apply(p, a, b)
    step_fn = make_train_step(
        homo_apply, flow_apply, tx, align_cfg, loss_cfg,
        use_fb_consistency_mask=cfg.get("use_fb_consistency_mask", True),
        remat=args.remat)

    # relay-friendly wrapper: accept uint8 batches (4x less host->device
    # traffic on the ~13 MB/s tunnel, CLAUDE.md) and stack the metric
    # scalars into ONE vector so the per-step log costs a single fetch
    # instead of one ~33 ms round-trip per metric
    metric_names = []

    def step_packed(state, img1, img2):
        state, metrics = step_fn(state, img1.astype(jnp.float32),
                                 img2.astype(jnp.float32))
        names = sorted(metrics)
        if not metric_names:        # filled at trace time
            metric_names.extend(names)
        return state, jnp.stack(
            [metrics[k].astype(jnp.float32) for k in names])

    mesh = make_mesh()
    pstep = make_parallel_train_step(step_packed, mesh)
    state = jax.device_put(state, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()))

    logger = Logger(log_dir=args.ckpt_dir, name="train",
                    sum_freq=args.log_every)
    loader = fetch_dataloader(cfg, phase="training")
    logger.info(f"training {num_steps} steps, batch {cfg.batch_size}, "
                f"{len(loader.ds)} pairs, {len(mesh.devices)} devices")

    import numpy as np

    # graceful stop: first SIGTERM/SIGINT finishes the in-flight step,
    # saves a resumable checkpoint AND the eval-format final_ckpt, then
    # exits cleanly (a long run killed by a scheduler/timeout keeps its
    # work); a second signal falls back to the default handler
    import signal
    stop_requested = []

    def _request_stop(signum, frame):
        stop_requested.append(signum)
        signal.signal(signal.SIGTERM, signal.SIG_DFL)
        signal.signal(signal.SIGINT, signal.default_int_handler)
        logger.info(f"signal {signum}: stopping after the current step "
                    "(next signal kills immediately)")

    signal.signal(signal.SIGTERM, _request_stop)
    signal.signal(signal.SIGINT, _request_stop)

    step = int(state.step)
    rng = np.random.default_rng(args.seed)
    while step < num_steps and not stop_requested:
        for batch in loader:
            if step >= num_steps or stop_requested:
                break
            img1, img2 = batch["image1"], batch["image2"]
            if cfg.get("random_img12", True) and rng.random() < 0.5:
                img1, img2 = img2, img1   # reference random_img12 swap
            # uint8 upload: lossless vs the on-disk JPEGs modulo the <0.5
            # gray-level resize rounding; cast back to f32 inside the step
            img1, img2 = shard_batch(
                (jnp.asarray(np.asarray(img1, np.uint8)),
                 jnp.asarray(np.asarray(img2, np.uint8))), mesh)
            state, mvec = pstep(state, img1, img2)
            step += 1
            logger.push(dict(zip(metric_names, np.asarray(mvec))), step=step)
            if args.panel_every and (step % args.panel_every == 0
                                     or step == num_steps):
                # figure dashboard (reference logger.py plot_the_results)
                from stitchax.utils.logger import save_train_dashboard
                flow_fn = jax.jit(lambda p, a, b: flow_apply(
                    p, a.astype(jnp.float32), b.astype(jnp.float32))[0][-1])
                pred = flow_fn(state.params["flow"], img1[:1], img2[:1])
                path = os.path.join(args.ckpt_dir,
                                    f"panel_{step:08d}.png")
                save_train_dashboard(
                    path, np.asarray(img1[0]), np.asarray(img2[0]),
                    np.asarray(pred[0]))
                logger.info(f"saved dashboard {path}")
            if (step % args.save_every == 0 or step == num_steps
                    or stop_requested):
                path = os.path.abspath(os.path.join(
                    args.ckpt_dir, f"step_{step:08d}"))
                save_checkpoint(path, jax.device_get(state))
                logger.info(f"saved checkpoint {path}")

    if stop_requested:
        logger.info(f"stopped early at step {step} on signal "
                    f"{stop_requested[0]}")

    # export the stitch/eval-format checkpoint under the reference's
    # `final_ckpt` name (evaluate.py/out.py default --ckpt_path): plain
    # {flow, homo} param trees loadable by StitchModels.restore
    import orbax.checkpoint as ocp
    final = os.path.abspath(os.path.join(args.ckpt_dir, "final_ckpt"))
    host_params = jax.device_get(state.params)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(final, {"flow": host_params["flow"],
                      "homo": host_params["homo"]}, force=True)
    ckpt.wait_until_finished()
    logger.info(f"exported eval-format checkpoint {final}")
    logger.info("training complete")


if __name__ == "__main__":
    main()
