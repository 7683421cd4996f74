"""Prove the CompositionNet (learned seam) LEARNS, and train usable weights.

The reference vendors only the UDIS2 composition NETWORK
(core/UDIS2/Composition/network.py) and downloads its trained
epoch050_model.pth from Google Drive (README.md:8) — no training code is
shipped and no weights exist in this environment, so (like train.py for the
warp model and tools/train_transref_learns.py for the inpainter) this tool
RECONSTRUCTS the training: the seam-driven objective of the UDIS2 paper
("Parallax-Tolerant Unsupervised Deep Image Stitching": the learned seam
should cross regions where the two warps AGREE, and the blend must anchor to
warp1/warp2 at the overlap boundaries adjacent to each image's exclusive
region), implemented TPU-first on the repo's own CompositionNet +
compose_seam (stitchax/models/udis2.py).

Synthetic task (mirrors what the Stitcher feeds the composition stage —
two canvas-resolution warps with valid masks, residual parallax, and
exposure mismatch):

  * base panorama B (S x 1.25S) from the bundled demo pools,
  * view1 = left window of B, view2 = right window (fixed overlap band),
    each placed on an S x S canvas through a small random homography
    (jittered corners) -> warp1/warp2 + valid masks,
  * view2 additionally sampled through a smooth random flow field
    (upsampled coarse noise, ±parallax_px) -> real local misalignment the
    seam must route around,
  * independent exposure gain/bias per view.

Losses (weights chosen so both terms matter at init):
  * seam term: sum(|grad learned_mask1| * D) / sum(|grad learned_mask1|)
    with D = overlap-masked squared difference of the two warps — the
    transition band must live where the images agree,
  * boundary term: inside the overlap, the seam mask must approach 1 next
    to img1's exclusive region and 0 next to img2's (dilated exclusive
    regions as targets) — kills the trivial constant-mask solutions.

Checks on held-out tuples:
  * training loss decreases,
  * seam cost (the seam term, an honest energy: gradient-mass-normalized)
    drops materially vs the random-init net,
  * ghosting beats average fusion: mean over high-difference overlap pixels
    of min(|stitched-warp1|, |stitched-warp2|) must be lower than the 0.5/0.5
    average blend's — the learned seam must commit to one side where the
    warps disagree instead of mixing them.

Run (CPU mesh smoke):
  STITCHAX_PLATFORM=cpu XLA_FLAGS=--xla_force_host_platform_device_count=2 \
    python tools/train_composition_learns.py --steps 20 --batch 2 --size 512

Real run (TPU): python tools/train_composition_learns.py --steps 3000 \
    --batch 4 --save_ckpt --merge_npz results/ckpt_r04_bf16.npz \
    --out /tmp/comp_r04

--save_ckpt writes {out}/comp_ckpt.npz ({comp: params} in the
convert.save_params_npz bf16 container); --merge_npz additionally writes
{out}/ckpt_merged_bf16.npz = the given flagship npz plus the trained comp
subtree, loadable by every CLI via --ckpt_path (StitchModels.restore_npz
picks up the optional comp tree automatically).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def get_args():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--size", type=int, default=512,
                   help="canvas size; CompositionNet's dilated stack needs "
                        ">=~448 (reference quirk, see models/udis2.py)")
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--n_train", type=int, default=48)
    p.add_argument("--n_eval", type=int, default=6)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--eval_every", type=int, default=50)
    p.add_argument("--corner_px", type=float, default=12.0)
    p.add_argument("--parallax_px", type=float, default=10.0)
    p.add_argument("--seam_w", type=float, default=1.0)
    p.add_argument("--boundary_w", type=float, default=1.0)
    p.add_argument("--out", type=str, default="/tmp/train_composition_learns")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save_ckpt", action="store_true",
                   help="write {out}/comp_ckpt.npz ({comp: params}, bf16 "
                        "npz container); overwritten at every eval point "
                        "so a killed run costs <= eval_every steps")
    p.add_argument("--init_ckpt", type=str, default=None,
                   help="resume from a comp_ckpt.npz")
    p.add_argument("--merge_npz", type=str, default=None,
                   help="existing flagship npz ({flow, homo}) to merge the "
                        "trained comp subtree into -> "
                        "{out}/ckpt_merged_bf16.npz")
    return p.parse_args()


def load_demo_images(h, w):
    import numpy as np
    from PIL import Image

    demos = []
    base = os.path.join(os.path.dirname(__file__), "..")
    for pool in ("demo_data", "demo_scenes"):
        root = os.path.join(base, pool)
        if not os.path.isdir(root):
            continue
        for d in sorted(os.listdir(root)):
            for name in ("input1.jpg", "input2.jpg"):
                f = os.path.join(root, d, name)
                if os.path.isfile(f):
                    demos.append(np.asarray(
                        Image.open(f).convert("RGB").resize(
                            (w, h), Image.BILINEAR), np.float32))
    assert demos, "no demo images found"
    return demos


def make_warp_tuples(size, n, corner_px, parallax_px, rng):
    """(warp1, warp2, mask1, mask2) on an S x S canvas, [0,255]/{0,1}.

    Two windows of a wider base panorama, each placed through a jittered
    homography; view2 carries an extra smooth parallax flow + exposure
    mismatch. All device work is batched into a handful of dispatches
    (the remote-TPU tunnel costs ~1s per eager op — CLAUDE.md)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from stitchax import ops

    S = size
    BW = int(S * 1.25)                      # base width
    VW = int(S * 0.85)                      # view window width
    x2 = BW - VW                            # view2 window origin
    demos = load_demo_images(S, BW)

    # per-sample augmented bases
    bases = np.zeros((n, S, BW, 3), np.float32)
    for i in range(n):
        b = demos[i % len(demos)]
        if rng.random() < 0.5:
            b = b[:, ::-1]
        bases[i] = np.clip(b * rng.uniform(0.85, 1.15), 0, 255)

    # canvas-quad -> base-window homographies (batched DLT, one dispatch)
    # canvas quad: the window footprint translated onto the canvas with
    # jittered corners; view1 sits left (x in [0, VW]), view2 right.
    def quads(x_canvas, x_base):
        dst = np.array([[x_base, 0], [x_base + VW, 0],
                        [x_base, S], [x_base + VW, S]], np.float32)
        src = np.array([[x_canvas, 0], [x_canvas + VW, 0],
                        [x_canvas, S], [x_canvas + VW, S]], np.float32)
        srcs = (src[None] + rng.uniform(-corner_px, corner_px,
                                        (n, 4, 2))).astype(np.float32)
        return srcs, np.broadcast_to(dst, (n, 4, 2)).astype(np.float32)

    src1, dst1 = quads(0, 0)
    src2, dst2 = quads(S - VW, x2)
    H1 = ops.dlt_solve(jnp.asarray(src1), jnp.asarray(dst1))
    H2 = ops.dlt_solve(jnp.asarray(src2), jnp.asarray(dst2))

    grid = ops.coords_grid(S, S).reshape(-1, 2)          # (S*S, 2)
    pts1 = jax.vmap(ops.apply_homography_to_points, (0, None))(H1, grid)
    pts2 = jax.vmap(ops.apply_homography_to_points, (0, None))(H2, grid)
    pts1 = pts1.reshape(n, S, S, 2)
    pts2 = pts2.reshape(n, S, S, 2)

    # smooth parallax on view2: coarse noise upsampled to the canvas
    coarse = rng.uniform(-parallax_px, parallax_px,
                         (n, 5, 5, 2)).astype(np.float32)
    flow = jax.image.resize(jnp.asarray(coarse), (n, S, S, 2), "cubic")
    pts2 = pts2 + flow

    # sample warps + masks in four batched dispatches; the mask source is
    # a ones image with a zero border outside the view window so the
    # sampler's zero padding carves the footprint
    ones1 = np.zeros((n, S, BW, 1), np.float32)
    ones1[:, :, :VW] = 1.0
    ones2 = np.zeros((n, S, BW, 1), np.float32)
    ones2[:, :, x2:] = 1.0
    samp = jax.vmap(ops.bilinear_sampler)
    w1 = np.asarray(samp(jnp.asarray(bases), pts1))
    w2 = np.asarray(samp(jnp.asarray(bases), pts2))
    m1 = (np.asarray(samp(jnp.asarray(ones1), pts1)) > 0.5).astype(
        np.float32)
    m2 = (np.asarray(samp(jnp.asarray(ones2), pts2)) > 0.5).astype(
        np.float32)

    # independent exposure mismatch per view (the seam must bridge it)
    g1 = rng.uniform(0.9, 1.1, (n, 1, 1, 1)).astype(np.float32)
    g2 = rng.uniform(0.9, 1.1, (n, 1, 1, 1)).astype(np.float32)
    b1 = rng.uniform(-8, 8, (n, 1, 1, 1)).astype(np.float32)
    b2 = rng.uniform(-8, 8, (n, 1, 1, 1)).astype(np.float32)
    w1 = np.clip(w1 * g1 + b1, 0, 255) * m1
    w2 = np.clip(w2 * g2 + b2, 0, 255) * m2
    return (w1.astype(np.uint8), w2.astype(np.uint8),
            m1.astype(np.uint8), m2.astype(np.uint8))


def main():
    args = get_args()
    os.makedirs(args.out, exist_ok=True)
    from stitchax.utils.platform import setup_cli_jax
    setup_cli_jax()

    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from stitchax import convert, ops
    from stitchax.models.udis2 import CompositionNet, compose_seam
    from stitchax.parallel import (batch_sharding, make_mesh,
                                   replicated_sharding, shard_batch)

    rng = np.random.default_rng(args.seed)
    S = args.size
    # ONE generation call for train+eval: two calls with different n would
    # compile two whole program sets through the ~5-min-per-program remote
    # compile tunnel (CLAUDE.md) for identical math
    aw = make_warp_tuples(S, args.n_train + args.n_eval, args.corner_px,
                          args.parallax_px, rng)
    w1, w2, m1, m2 = (a[:args.n_train] for a in aw)
    ew1, ew2, em1, em2 = (a[args.n_train:] for a in aw)

    model = CompositionNet()
    z3 = jnp.zeros((1, S, S, 3), jnp.float32)
    z1 = jnp.zeros((1, S, S, 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(args.seed), z3, z3,
                                 z1, z1)
    if args.init_ckpt:
        params = convert.load_params_npz(args.init_ckpt,
                                         {"comp": params})["comp"]
        print(f"resumed from {args.init_ckpt}", flush=True)

    eps = 1e-6

    def seam_terms(out, nw1, nw2, fm1, fm2):
        """(seam cost, boundary loss, blend dict). Inputs [-1,1]/{0,1}."""
        blend = compose_seam(out, nw1, nw2, fm1, fm2)
        lm1 = blend["learned_mask1"]
        ov = fm1 * fm2
        D = (((nw1 - nw2) ** 2).mean(-1, keepdims=True)) * ov
        gx = jnp.abs(lm1[:, :, 1:] - lm1[:, :, :-1])
        gy = jnp.abs(lm1[:, 1:] - lm1[:, :-1])
        Dx = 0.5 * (D[:, :, 1:] + D[:, :, :-1])
        Dy = 0.5 * (D[:, 1:] + D[:, :-1])
        # only transitions inside the overlap count as "the seam" — the
        # footprint edges (mask1/mask2 borders) are fixed geometry
        ovx = jnp.minimum(ov[:, :, 1:], ov[:, :, :-1])
        ovy = jnp.minimum(ov[:, 1:], ov[:, :-1])
        gm = (gx * ovx).sum() + (gy * ovy).sum()
        seam = ((gx * ovx * Dx).sum() + (gy * ovy * Dy).sum()) / (gm + eps)
        # boundary anchoring: next to each image's exclusive region the
        # seam mask must hand the overlap to that image
        ex1 = fm1 * (1.0 - fm2)
        ex2 = fm2 * (1.0 - fm1)
        t1 = ops.dilate(ex1, (9, 9)) * ov
        t2 = ops.dilate(ex2, (9, 9)) * ov
        bnd = ((t1 * (1.0 - out)).sum() / (t1.sum() + eps)
               + (t2 * out).sum() / (t2.sum() + eps))
        return seam, bnd, blend, D

    def loss_fn(params, bw1, bw2, bm1, bm2):
        nw1 = bw1 / 127.5 - 1.0
        nw2 = bw2 / 127.5 - 1.0
        out = model.apply(params, nw1, nw2, bm1, bm2)
        seam, bnd, _, _ = seam_terms(out, nw1, nw2, bm1, bm2)
        total = args.seam_w * seam + args.boundary_w * bnd
        return total, dict(total=total, seam=seam, boundary=bnd)

    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    def train_step(params, opt_state, bw1, bw2, bm1, bm2):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, bw1, bw2, bm1, bm2)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, metrics

    mesh = make_mesh()
    repl, data = replicated_sharding(mesh), batch_sharding(mesh)
    pstep = jax.jit(train_step,
                    in_shardings=(repl, repl, data, data, data, data),
                    out_shardings=(repl, repl, repl),
                    donate_argnums=(0, 1))
    params = jax.device_put(params, repl)
    opt_state = jax.device_put(opt_state, repl)

    ej = [jnp.asarray(a, jnp.float32) for a in (ew1, ew2, em1, em2)]

    @jax.jit
    def eval_metrics(params):
        nw1, nw2 = ej[0] / 127.5 - 1.0, ej[1] / 127.5 - 1.0
        fm1, fm2 = ej[2], ej[3]
        out = model.apply(params, nw1, nw2, fm1, fm2)
        seam, bnd, blend, D = seam_terms(out, nw1, nw2, fm1, fm2)
        ov = fm1 * fm2
        hot = (D > 0.01) * ov                      # disagreement pixels
        st = blend["stitched_image"]
        ghost = jnp.minimum(jnp.abs(st - nw1).mean(-1, keepdims=True),
                            jnp.abs(st - nw2).mean(-1, keepdims=True))
        ghost = (ghost * hot).sum() / (hot.sum() + eps)
        ave = 0.5 * (nw1 + nw2)                    # average fusion in ov
        ghost_ave = jnp.minimum(jnp.abs(ave - nw1).mean(-1, keepdims=True),
                                jnp.abs(ave - nw2).mean(-1, keepdims=True))
        ghost_ave = (ghost_ave * hot).sum() / (hot.sum() + eps)
        return dict(seam_cost=seam, boundary=bnd, ghost=ghost,
                    ghost_ave_fusion=ghost_ave), out, blend

    def save_ckpt(params):
        path = os.path.join(args.out, "comp_ckpt.npz")
        convert.save_params_npz(path, {"comp": jax.device_get(params)})
        return path

    m0, out0, blend0 = eval_metrics(params)
    m0 = {k: float(v) for k, v in m0.items()}
    print(f"[step 0] seam_cost {m0['seam_cost']:.5f}  boundary "
          f"{m0['boundary']:.4f}  ghost {m0['ghost']:.4f} "
          f"(ave-fusion {m0['ghost_ave_fusion']:.4f})", flush=True)

    history, losses = [], []
    step = 0
    order = np.arange(args.n_train)
    while step < args.steps:
        rng.shuffle(order)
        for i0 in range(0, len(order) - args.batch + 1, args.batch):
            if step >= args.steps:
                break
            sel = order[i0:i0 + args.batch]
            batch = [jnp.asarray(a[sel], jnp.float32)
                     for a in (w1, w2, m1, m2)]
            batch = shard_batch(tuple(batch), mesh)
            params, opt_state, metrics = pstep(params, opt_state, *batch)
            step += 1
            losses.append(float(metrics["total"]))
            if step % args.eval_every == 0 or step == args.steps:
                em, _, _ = eval_metrics(params)
                em = {k: float(v) for k, v in em.items()}
                history.append(dict(step=step, loss=losses[-1], **em))
                print(f"[step {step}] loss {losses[-1]:.5f}  seam_cost "
                      f"{em['seam_cost']:.5f}  ghost {em['ghost']:.4f}",
                      flush=True)
                if args.save_ckpt:
                    save_ckpt(params)

    # panel: warp1 | warp2 | ave fusion | learned composite | seam mask
    try:
        from PIL import Image
        _, out, blend = eval_metrics(params)
        i = 0
        a1, a2 = np.asarray(ej[0][i]), np.asarray(ej[1][i])
        am1, am2 = np.asarray(ej[2][i]), np.asarray(ej[3][i])
        ave = (a1 * am1 + a2 * am2) / np.maximum(am1 + am2, 1.0)
        st = np.asarray((blend["stitched_image"][i] + 1.0) * 127.5)
        lm = np.repeat(np.asarray(blend["learned_mask1"][i]) * 255.0, 3, -1)
        row = np.concatenate([np.asarray(ej[0][i]), np.asarray(ej[1][i]),
                              ave, st, lm], axis=1)
        Image.fromarray(np.clip(row, 0, 255).astype(np.uint8)).save(
            os.path.join(args.out, "panel_final.png"))
    except Exception as e:  # noqa: BLE001
        print(f"panel skipped: {e}")

    first = float(np.mean(losses[:20]))
    last = float(np.mean(losses[-20:]))
    mf = history[-1]
    checks = {
        "loss_decreases": last < 0.8 * first,
        "seam_cost_drops": mf["seam_cost"] < 0.5 * m0["seam_cost"],
        "beats_average_fusion_ghosting": (mf["ghost"]
                                          < mf["ghost_ave_fusion"]),
    }
    if args.save_ckpt:
        path = save_ckpt(params)
        print(f"saved {path} ({os.path.getsize(path) / 1e6:.1f} MB)")
    if args.merge_npz:
        dst = os.path.join(args.out, "ckpt_merged_bf16.npz")
        base = dict(np.load(args.merge_npz))
        base = {k: v for k, v in base.items()
                if not k.split(":", 1)[-1].startswith("['comp']")}
        import ml_dtypes
        for kp, leaf in jax.tree_util.tree_flatten_with_path(
                {"comp": jax.device_get(params)})[0]:
            key = jax.tree_util.keystr(kp)
            arr = np.asarray(leaf)
            if arr.dtype == np.float32:
                arr = arr.astype(ml_dtypes.bfloat16).view(np.uint16)
                key = "bf16:" + key
            base[key] = arr
        np.savez_compressed(dst, **base)
        print(f"wrote {dst} ({os.path.getsize(dst) / 1e6:.1f} MB): "
              f"flow+homo from {args.merge_npz} + trained comp")

    result = dict(steps=args.steps, size=S, batch=args.batch, lr=args.lr,
                  n_train=args.n_train, parallax_px=args.parallax_px,
                  loss_first20=first, loss_last20=last, init=m0,
                  final=mf, history=history, checks=checks)
    with open(os.path.join(args.out, "result.json"), "w") as f:
        json.dump(result, f, indent=2)
    for name, ok in checks.items():
        print(f"[{'PASS' if ok else 'FAIL'}] {name}")
    print(json.dumps({k: v for k, v in result.items() if k != "history"}))


if __name__ == "__main__":
    main()
