#!/usr/bin/env python
"""Train the reduced-scale SD inpainting stack on synthetic holes and
prove it learns (VERDICT r4 #3).

The reference's diffusion inpainter runs downloaded SD-1.5 + ControlNet
weights (reference: core/inference/mix_methods/utils/inpainter.py:12-24);
none exist in this zero-egress environment, so the plugin's real quality
path was unreachable. This tool trains the whole reduced stack in-env:

  phase 1: VAE as a deterministic autoencoder (L1+MSE recon);
  phase 2: UNet+ControlNet with the SD epsilon-prediction objective on
           synthetic rectangle holes over the demo image pool, using the
           exact conditioning recipe of the inference pipeline;
  eval:    full DDIM inpainting (models/sd_pipeline.make_sd_inpaint_fn)
           on held-out crops+holes, vs (a) the random-init stack and
           (b) the classical push-pull fallback the plugin used to hide
           behind (compose/inpainters.push_pull_inpaint).

Learns-checks: diffusion loss falls, trained hole PSNR beats BOTH arms.
--save_ckpt packs weights via save_jax_sd_checkpoint; drive the CLI with
    STITCHAX_SD_CKPT=<ckpt> python out.py --inf_cfg \
        inpaint_all_area_g12_diffusion ...

Usage (TPU, ~40 min): python tools/train_sd_inpaint_learns.py \
    --steps 6000 --save_ckpt
CPU smoke: STITCHAX_PLATFORM=cpu python tools/train_sd_inpaint_learns.py \
    --size 64 --width 16 --steps_vae 3 --steps 3 --n_train 8 --n_eval 2 \
    --eval_ddim_steps 2
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def get_args():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/sd_train")
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--width", type=int, default=48,
                   help="UNet base channels (SD-1.5: 320)")
    p.add_argument("--steps_vae", type=int, default=1500)
    p.add_argument("--steps", type=int, default=6000)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr_vae", type=float, default=3e-4)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--n_train", type=int, default=64)
    p.add_argument("--n_eval", type=int, default=8)
    p.add_argument("--eval_every", type=int, default=1000)
    p.add_argument("--eval_ddim_steps", type=int, default=20)
    p.add_argument("--eval_strength", type=float, default=0.35,
                   help="second eval arm: diffusers strength (DDIM starts "
                        "from the noised classical fill; the deployable "
                        "operating point via STITCHAX_SD_STRENGTH)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save_ckpt", action="store_true")
    p.add_argument("--init_ckpt", type=str, default=None,
                   help="resume unet/controlnet/vae/context from a saved "
                        "stitchax_jax container (save_jax_sd_checkpoint); "
                        "configs must match --width; --steps_vae 0 skips "
                        "re-training the restored VAE")
    return p.parse_args()


def make_crops(size, n, rng, pool=None):
    """Random crops + flips + brightness jitter over `pool` (default: the
    bundled demo pool), float32 [0, 255] (B, size, size, 3)."""
    import numpy as np
    if pool is None:
        sys.path.insert(0, os.path.dirname(__file__))
        from train_transref_learns import load_demo_images
        pool = load_demo_images(2 * size)
    crops = []
    for i in range(n):
        img = pool[i % len(pool)]
        y = rng.integers(0, img.shape[0] - size + 1)
        x = rng.integers(0, img.shape[1] - size + 1)
        c = img[y:y + size, x:x + size]
        if rng.random() < 0.5:
            c = c[:, ::-1]
        c = np.clip(c * rng.uniform(0.85, 1.15), 0, 255)
        crops.append(c.astype(np.float32))
    return np.stack(crops)


def hole_psnr255(out, gt, mask):
    import numpy as np
    a, b = np.asarray(out, np.float64), np.asarray(gt, np.float64)
    m = np.asarray(mask, np.float64)
    mse = (((a - b) ** 2) * m).sum() / max(m.sum() * a.shape[-1], 1.0)
    return float(10 * np.log10(255.0 ** 2 / max(mse, 1e-12)))


def main():
    args = get_args()
    os.makedirs(args.out, exist_ok=True)
    from stitchax.utils.platform import setup_cli_jax
    setup_cli_jax()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from stitchax.compose.inpainters import push_pull_inpaint
    from stitchax.models.diffusion import (ControlNet, UNetConfig,
                                           UNet2DCondition)
    from stitchax.models.sd_pipeline import make_sd_inpaint_fn
    from stitchax.models.vae import AutoencoderKL
    from stitchax.train.sd_inpaint_trainer import (
        make_diffusion_train_step, make_vae_train_step,
        save_jax_sd_checkpoint)
    from stitchax.train.transref_trainer import random_rect_masks

    w, S = args.width, args.size
    unet_kw = dict(in_channels=9, out_channels=4,
                   block_channels=(w, 2 * w), layers_per_block=1,
                   attention_resolutions=(0, 1), context_dim=2 * w,
                   num_heads=4, num_train_timesteps=1000, norm_groups=8)
    vae_kw = dict(block_channels=(w, w, 2 * w, 2 * w), latent_channels=4,
                  groups=8)
    cfg = UNetConfig(**unet_kw)
    unet, cnet, vae = UNet2DCondition(cfg), ControlNet(cfg), AutoencoderKL(
        **vae_kw)

    rng = np.random.default_rng(args.seed)
    k = jax.random.PRNGKey(args.seed)
    k_init, k_ctx, k_trmask, k_evmask, k_noise = jax.random.split(k, 5)
    train_imgs = make_crops(S, args.n_train, rng)
    eval_imgs = make_crops(S, args.n_eval, rng)       # held-out crops
    train_holes = np.asarray(random_rect_masks(k_trmask, args.n_train, S))
    eval_holes = np.asarray(random_rect_masks(k_evmask, args.n_eval, S))

    # the empty-prompt CLIP context is a constant; a fixed random context
    # plays its role and ships inside the checkpoint
    context = jax.random.normal(k_ctx, (1, 77, unet_kw["context_dim"]),
                                jnp.float32)

    img0 = jnp.zeros((1, S, S, 3), jnp.float32)
    lat0 = jnp.zeros((1, S // 8, S // 8, 4), jnp.float32)
    t0 = jnp.zeros((1,), jnp.float32)
    vae_params = jax.jit(vae.init)(k_init, img0)
    cnet_params = jax.jit(cnet.init)(k_init, lat0, t0, context, img0)
    res0, mid0 = jax.jit(cnet.apply)(cnet_params, lat0, t0, context, img0)
    inp0 = jnp.zeros((1, S // 8, S // 8, 9), jnp.float32)
    unet_params = jax.jit(unet.init)(k_init, inp0, t0, context, res0, mid0)
    n_par = sum(x.size for x in jax.tree_util.tree_leaves(
        (vae_params, unet_params, cnet_params)))
    print(f"params: {n_par / 1e6:.2f} M (vae+unet+controlnet)", flush=True)

    if args.init_ckpt:
        import torch
        blob = torch.load(args.init_ckpt, map_location="cpu",
                          weights_only=False)
        assert blob.get("format") == "stitchax_jax", args.init_ckpt
        cast = lambda tmpl, src: jax.tree_util.tree_map(
            lambda t, s: jnp.asarray(s, t.dtype), tmpl, src)
        unet_params = cast(unet_params, blob["unet_vars"])
        cnet_params = cast(cnet_params, blob["controlnet_vars"])
        vae_params = cast(vae_params, blob["vae_vars"])
        context = jnp.asarray(blob["context"])
        print(f"resumed from {args.init_ckpt}", flush=True)

    # ---------------- phase 1: VAE autoencoder ----------------
    tx_v = optax.adam(args.lr_vae)
    opt_v = tx_v.init(vae_params)
    vstep = jax.jit(make_vae_train_step(vae, tx_v), donate_argnums=(0, 1))
    t_start = time.time()
    for step in range(1, args.steps_vae + 1):
        sel = rng.integers(0, args.n_train, args.batch)
        x = jnp.asarray(train_imgs[sel] / 127.5 - 1.0)
        vae_params, opt_v, vm = vstep(vae_params, opt_v, x)
        if step % 250 == 0 or step == args.steps_vae:
            print(f"[vae {step}] l1={float(vm['l1']):.4f} "
                  f"l2={float(vm['l2']):.4f}", flush=True)
    ev = jnp.asarray(eval_imgs / 127.5 - 1.0)
    recon = jax.jit(vae.apply)(vae_params, ev)
    vae_psnr = hole_psnr255((np.asarray(recon) + 1) * 127.5, eval_imgs,
                            np.ones_like(eval_holes))
    print(f"VAE recon PSNR (held-out): {vae_psnr:.2f} dB "
          f"({time.time() - t_start:.0f}s)", flush=True)

    # ---------------- eval pipeline (shared by all arms) ----------------
    # params enter as jit ARGUMENTS (not closure constants) so every eval
    # point reuses ONE compiled program — each re-jit costs ~5 min through
    # the remote compile service (CLAUDE.md), which dominated the round-5
    # first training campaign's wall clock.
    @jax.jit
    def _eval_step(uv, cv, vv, img, hole):
        fn = make_sd_inpaint_fn(uv, cv, vv, context, cfg=cfg, vae=vae,
                                num_steps=args.eval_ddim_steps,
                                seed=args.seed)
        return fn(img, hole)

    @jax.jit
    def _eval_step_refine(uv, cv, vv, img, hole):
        fn = make_sd_inpaint_fn(uv, cv, vv, context, cfg=cfg, vae=vae,
                                num_steps=args.eval_ddim_steps,
                                seed=args.seed, strength=args.eval_strength)
        return fn(img, hole)

    def pipeline_psnr(uv, cv, vv, step_fn=None):
        step_fn = step_fn or _eval_step
        outs = [np.asarray(step_fn(uv, cv, vv,
                                   jnp.asarray(eval_imgs[i]),
                                   jnp.asarray(eval_holes[i])))
                for i in range(args.n_eval)]
        return hole_psnr255(np.stack(outs), eval_imgs, eval_holes)

    psnr_init = pipeline_psnr(unet_params, cnet_params, vae_params)
    pp = jax.jit(push_pull_inpaint)
    pp_outs = np.stack([np.asarray(pp(jnp.asarray(eval_imgs[i]),
                                      jnp.asarray(eval_holes[i])))
                        for i in range(args.n_eval)])
    psnr_pushpull = hole_psnr255(pp_outs, eval_imgs, eval_holes)
    init_label = "resumed-stack" if args.init_ckpt else "random-stack"
    print(f"[step 0] {init_label} hole PSNR {psnr_init:.2f}  "
          f"push-pull baseline {psnr_pushpull:.2f}", flush=True)

    # ---------------- phase 2: diffusion on holes ----------------
    params = {"unet": unet_params, "controlnet": cnet_params}
    tx = optax.adam(args.lr)
    opt = tx.init(params)
    dstep = jax.jit(make_diffusion_train_step(unet, cnet, vae, tx, context),
                    donate_argnums=(0, 1))
    key = k_noise
    losses, history = [], []
    best_refine = -1.0
    for step in range(1, args.steps + 1):
        sel = rng.integers(0, args.n_train, args.batch)
        key, sub = jax.random.split(key)
        params, opt, dm = dstep(params, opt, vae_params,
                                jnp.asarray(train_imgs[sel] / 255.0),
                                jnp.asarray(train_holes[sel]), sub)
        losses.append(float(dm["mse"]))
        if step % args.eval_every == 0 or step == args.steps:
            p = pipeline_psnr(params["unet"], params["controlnet"],
                              vae_params)
            pr = pipeline_psnr(params["unet"], params["controlnet"],
                               vae_params, _eval_step_refine)
            history.append(dict(step=step, mse=losses[-1], hole_psnr=p,
                                hole_psnr_refine=pr))
            print(f"[step {step}] mse {losses[-1]:.4f}  "
                  f"hole PSNR {p:.2f}  refine(s={args.eval_strength}) "
                  f"{pr:.2f}", flush=True)
            if args.save_ckpt:
                # each snapshot records its measured-best operating point
                # (load_sd_checkpoint adopts it when strength is unset)
                save_jax_sd_checkpoint(
                    os.path.join(args.out, "sd_ckpt.pt"), params["unet"],
                    params["controlnet"], vae_params, context, unet_kw,
                    vae_kw,
                    preferred_strength=args.eval_strength if pr > p else 1.0)
                if pr > best_refine:
                    best_refine = pr
                    save_jax_sd_checkpoint(
                        os.path.join(args.out, "sd_ckpt_best.pt"),
                        params["unet"], params["controlnet"], vae_params,
                        context, unet_kw, vae_kw,
                        preferred_strength=args.eval_strength)

    p_end = history[-1]["hole_psnr"]
    p_refine_best = max(h["hole_psnr_refine"] for h in history)
    first = float(np.mean(losses[:50]))
    last = float(np.mean(losses[-50:]))
    checks = {
        "diffusion_loss_decreases": last < 0.8 * first,
        # step-0 is the trained restored stack when --init_ckpt is given —
        # the random-pack margin check only applies to from-scratch runs
        "beats_random_pack": (p_end > psnr_init + 2.0
                              if not args.init_ckpt else None),
        "beats_push_pull_fallback": p_end > psnr_pushpull,
        "refine_beats_push_pull": p_refine_best > psnr_pushpull,
    }

    try:  # before/after panel on the first eval image
        from PIL import Image
        holed = eval_imgs[0] * (1 - eval_holes[0])
        out = np.asarray(_eval_step(params["unet"], params["controlnet"],
                                    vae_params,
                                    jnp.asarray(eval_imgs[0]),
                                    jnp.asarray(eval_holes[0])))
        row = np.concatenate([holed, pp_outs[0], out, eval_imgs[0]], axis=1)
        Image.fromarray(np.clip(row, 0, 255).astype(np.uint8)).save(
            os.path.join(args.out, "panel_final.png"))
    except Exception as e:  # noqa: BLE001
        print(f"panel skipped: {e}")

    result = dict(steps=args.steps, steps_vae=args.steps_vae, size=S,
                  width=w, batch=args.batch, lr=args.lr,
                  params_m=round(n_par / 1e6, 2),
                  vae_recon_psnr=round(vae_psnr, 2),
                  mse_first50=round(first, 4), mse_last50=round(last, 4),
                  psnr_step0=round(psnr_init, 2),
                  init_is_resumed=bool(args.init_ckpt),
                  psnr_push_pull=round(psnr_pushpull, 2),
                  psnr_trained=round(p_end, 2),
                  psnr_refine_best=round(p_refine_best, 2),
                  eval_strength=args.eval_strength,
                  eval_ddim_steps=args.eval_ddim_steps,
                  history=history, checks=checks,
                  cli=" ".join(sys.argv))
    with open(os.path.join(args.out, "result.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(checks))
    print(f"wrote {os.path.join(args.out, 'result.json')}")


if __name__ == "__main__":
    main()
