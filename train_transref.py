"""TransRef inpainter training CLI.

The reference vendors TransRef's own training entry
(reference: core/inference/mix_methods/utils/TransRef/train.py — objective
1·L1 + 0.04·VGG-perceptual + 250·style-Gram, Adam 1e-4, masked input via
set_input mean-fill, 512² crops) but never wires it into the stitching
repo. This CLI rebuilds it TPU-first: one jitted train step, data-parallel
over the device mesh, orbax checkpointing.

Training triples come from a UDIS-D-layout folder: input1/* is the
ground-truth target, input2/* the reference image (the aligned counterpart
— matching how the stitcher consumes TransRef), and holes are random
rectangles standing in for the reference's irregular-mask dataset
(TransRef.py:992-994). `--ref_from self` trains single-image inpainting.

Smoke run:
  STITCHAX_PLATFORM=cpu python train_transref.py --data_dir /tmp/udis_mini \
      --num_steps 2 --batch_size 1 --image_size 256
"""

import argparse
import os


def get_args():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", type=str, required=True,
                   help="UDIS-D-layout root ({training|testing}/input{1,2})")
    p.add_argument("--num_steps", type=int, default=100000)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--image_size", type=int, default=512,
                   help="square crop/resize; reference trains at 512")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--ckpt_dir", type=str, default="./checkpoints/transref")
    p.add_argument("--save_every", type=int, default=5000)
    p.add_argument("--log_every", type=int, default=100)
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--vgg_ckpt", type=str, default=None,
                   help="torchvision vgg16 state dict (.pth) for the "
                        "perceptual/style loss; random VGG if absent")
    p.add_argument("--ref_from", choices=["pair", "self"], default="pair")
    p.add_argument("--seed", type=int, default=1234)
    return p.parse_args()


def main():
    args = get_args()
    from stitchax.utils.platform import setup_cli_jax
    setup_cli_jax()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from stitchax.data.udis import PrefetchLoader, UDISDataset
    from stitchax.models.transref import TransRefBase
    from stitchax.models.vgg import VGG16Features, convert_vgg16_features
    from stitchax.parallel import (batch_sharding, make_mesh,
                                   replicated_sharding, shard_batch)
    from stitchax.train.transref_trainer import (TransRefLossConfig,
                                                 make_transref_train_step,
                                                 random_rect_masks)
    from stitchax.utils.logger import Logger

    S = args.image_size
    k = jax.random.PRNGKey(args.seed)
    model = TransRefBase()
    img0 = jnp.zeros((1, S, S, 3), jnp.float32)
    mask0 = jnp.zeros((1, S, S, 1), jnp.float32)
    params = jax.jit(model.init)(k, img0, mask0, img0)

    vgg = VGG16Features()
    if args.vgg_ckpt:
        import torch
        sd = torch.load(args.vgg_ckpt, map_location="cpu")
        vgg_params = {"params": convert_vgg16_features(sd)}
        print(f"loaded VGG16 features from {args.vgg_ckpt}")
    else:
        vgg_params = jax.jit(vgg.init)(k, img0)
        print("WARNING: random-init VGG16 — perceptual/style terms are "
              "untrained-feature losses (supply --vgg_ckpt for the "
              "reference objective)")
    vgg_apply = lambda x: vgg.apply(vgg_params, x)

    tx = optax.adam(args.lr)  # reference: Adam(lr=1e-4) TransRef.py:977
    opt_state = tx.init(params)
    step0 = 0
    if args.resume:
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(
            os.path.abspath(args.resume),
            {"params": params, "opt_state": opt_state, "step": 0})
        params, opt_state = restored["params"], restored["opt_state"]
        step0 = int(restored["step"])
        print(f"resumed from {args.resume} at step {step0}")

    train_step = make_transref_train_step(model, vgg_apply, tx,
                                          TransRefLossConfig())
    mesh = make_mesh()
    repl, data = replicated_sharding(mesh), batch_sharding(mesh)
    pstep = jax.jit(train_step,
                    in_shardings=(repl, repl, data, data, data),
                    out_shardings=(repl, repl, repl),
                    donate_argnums=(0, 1))
    params = jax.device_put(params, repl)
    opt_state = jax.device_put(opt_state, repl)

    ds = UDISDataset(args.data_dir, phase="training", is_test=True,
                     size=(S, S))
    loader = PrefetchLoader(ds, batch_size=args.batch_size, shuffle=True,
                            num_workers=8, drop_last=True, seed=args.seed)
    logger = Logger(log_dir=args.ckpt_dir, name="transref",
                    sum_freq=args.log_every)
    logger.info(f"TransRef training: {args.num_steps} steps, batch "
                f"{args.batch_size} at {S}², {len(ds)} pairs, "
                f"{len(mesh.devices)} devices")

    def save(step):
        import orbax.checkpoint as ocp
        path = os.path.abspath(os.path.join(args.ckpt_dir,
                                            f"step_{step:08d}"))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, {"params": jax.device_get(params),
                          "opt_state": jax.device_get(opt_state),
                          "step": step}, force=True)
        ckptr.wait_until_finished()
        logger.info(f"saved checkpoint {path}")

    # graceful stop (same contract as train.py): first SIGTERM/SIGINT
    # finishes the in-flight step and saves; a second one kills
    import signal
    stop_requested = []

    def _request_stop(signum, frame):
        stop_requested.append(signum)
        signal.signal(signal.SIGTERM, signal.SIG_DFL)
        signal.signal(signal.SIGINT, signal.default_int_handler)
        logger.info(f"signal {signum}: stopping after the current step")

    signal.signal(signal.SIGTERM, _request_stop)
    signal.signal(signal.SIGINT, _request_stop)

    step = step0
    mask_key = jax.random.PRNGKey(args.seed + 1)
    while step < args.num_steps and not stop_requested:
        for batch in loader:
            if step >= args.num_steps or stop_requested:
                break
            gt = jnp.asarray(batch["image1"]) / 127.5 - 1.0
            ref = (gt if args.ref_from == "self"
                   else jnp.asarray(batch["image2"]) / 127.5 - 1.0)
            mask_key, sub = jax.random.split(mask_key)
            mask = random_rect_masks(sub, gt.shape[0], S)
            gt, ref, mask = shard_batch((gt, ref, mask), mesh)
            params, opt_state, metrics = pstep(params, opt_state, gt, ref,
                                               mask)
            step += 1
            logger.push({k: float(v) for k, v in metrics.items()},
                        step=step)
            if (step % args.save_every == 0 or step == args.num_steps
                    or stop_requested):
                save(step)
    if stop_requested:
        logger.info(f"stopped early at step {step} on signal "
                    f"{stop_requested[0]}")
    logger.info("training complete")


if __name__ == "__main__":
    main()
