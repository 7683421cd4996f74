"""Score the learned seam composition from out.py's SAVED artifacts.

End-to-end check that the trained CompositionNet improves the real
pipeline's outputs (not just the trainer's synthetic tuples): run out.py
over held-out pairs twice — once with the flagship npz (trained comp
subtree) and once with a flow+homo-only snapshot (comp stays random init)
— then point this tool at each sweep root. It reads the per-pair JPEGs the
CLI writes (warp1/2, mask1/2, ave_fusion, composition, learned_mask1;
reference save list: /root/reference/out.py:266-308) and computes, in the
trainer's own metric definitions (tools/train_composition_learns.py):

  * ghost        — mean over high-disagreement overlap pixels of
                   min(|composition - warp1|, |composition - warp2|); a
                   committed seam picks ONE side where the warps disagree,
                   average fusion mixes them (ghosting)
  * ghost_ave    — the same metric on ave_fusion.jpg (the 50/50 baseline
                   the learned seam must beat)
  * seam_cost    — gradient-mass-normalized seam energy of learned_mask1:
                   transition pixels weighted by the warps' squared
                   disagreement (the seam should cross where they agree)

Pure numpy over saved files — no device work; JPEG quantization affects
both runs identically.

  python tools/eval_composition_outputs.py --runs trained=/tmp/comp_eval/trained \
      init=/tmp/comp_eval/init --out results/comp_r04/pipeline_eval.json
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

EPS = 1e-6


def _load(path, gray=False):
    from PIL import Image
    im = Image.open(path)
    a = np.asarray(im.convert("L" if gray else "RGB"), np.float32)
    return a[..., None] if gray else a


def score_pair(result_dir):
    """Metrics for one out.py result directory, or None if artifacts are
    missing (e.g. the composition stage was off)."""
    need = ["warp1.jpg", "warp2.jpg", "mask1.jpg", "mask2.jpg",
            "ave_fusion.jpg", "composition.jpg", "learned_mask1.jpg"]
    paths = {n: os.path.join(result_dir, n) for n in need}
    if not all(os.path.isfile(p) for p in paths.values()):
        return None
    w1 = _load(paths["warp1.jpg"]) / 127.5 - 1.0
    w2 = _load(paths["warp2.jpg"]) / 127.5 - 1.0
    m1 = (_load(paths["mask1.jpg"], gray=True) > 127).astype(np.float32)
    m2 = (_load(paths["mask2.jpg"], gray=True) > 127).astype(np.float32)
    ave = _load(paths["ave_fusion.jpg"]) / 127.5 - 1.0
    comp = _load(paths["composition.jpg"]) / 127.5 - 1.0
    lm1 = _load(paths["learned_mask1.jpg"], gray=True) / 255.0

    # composition may have run at an upsized resolution (out.py:280-284
    # rule, canvas < 512); bring everything to the composition grid
    if comp.shape[:2] != w1.shape[:2]:
        from PIL import Image
        h, w = comp.shape[:2]
        rs = lambda a: np.asarray(Image.fromarray(
            np.clip((a + 1.0) * 127.5, 0, 255).astype(np.uint8)).resize(
                (w, h), Image.BILINEAR), np.float32) / 127.5 - 1.0
        rsm = lambda a: (np.asarray(Image.fromarray(
            (a[..., 0] * 255).astype(np.uint8)).resize(
                (w, h), Image.BILINEAR), np.float32)[..., None] > 127
        ).astype(np.float32)
        w1, w2, ave = rs(w1), rs(w2), rs(ave)
        m1, m2 = rsm(m1), rsm(m2)
    if lm1.shape[:2] != comp.shape[:2]:
        from PIL import Image
        h, w = comp.shape[:2]
        lm1 = np.asarray(Image.fromarray(
            (lm1[..., 0] * 255).astype(np.uint8)).resize(
                (w, h), Image.BILINEAR), np.float32)[..., None] / 255.0

    ov = m1 * m2
    if ov.sum() < 100:
        return None
    D = ((w1 - w2) ** 2).mean(-1, keepdims=True) * ov
    hot = (D > 0.01) * ov

    def ghost(img):
        g = np.minimum(np.abs(img - w1).mean(-1, keepdims=True),
                       np.abs(img - w2).mean(-1, keepdims=True))
        return float((g * hot).sum() / (hot.sum() + EPS))

    gx = np.abs(lm1[:, 1:] - lm1[:, :-1])
    gy = np.abs(lm1[1:] - lm1[:-1])
    Dx = 0.5 * (D[:, 1:] + D[:, :-1])
    Dy = 0.5 * (D[1:] + D[:-1])
    ovx = np.minimum(ov[:, 1:], ov[:, :-1])
    ovy = np.minimum(ov[1:], ov[:-1])
    gm = (gx * ovx).sum() + (gy * ovy).sum()
    seam = float(((gx * ovx * Dx).sum() + (gy * ovy * Dy).sum())
                 / (gm + EPS))
    return dict(ghost=ghost(comp), ghost_ave_fusion=ghost(ave),
                seam_cost=seam, hot_px=int(hot.sum()),
                overlap_px=int(ov.sum()))


def score_sweep(root):
    rows = {}
    for d in sorted(os.listdir(root)):
        rd = os.path.join(root, d)
        if os.path.isdir(rd):
            s = score_pair(rd)
            if s is not None:
                rows[d] = s
    if not rows:
        return None
    agg = {k: float(np.mean([r[k] for r in rows.values()]))
           for k in ("ghost", "ghost_ave_fusion", "seam_cost")}
    agg["n_pairs"] = len(rows)
    return dict(aggregate=agg, pairs=rows)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--runs", nargs="+", required=True,
                   help="name=sweep_root entries (out.py output roots)")
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()

    report = {}
    for entry in args.runs:
        name, root = entry.split("=", 1)
        scored = score_sweep(root)
        if scored is None:
            print(f"[{name}] WARNING: no scorable result dirs under {root}"
                  " — skipped")
            continue
        report[name] = scored
        a = report[name]["aggregate"]
        print(f"[{name}] n={a['n_pairs']}  ghost {a['ghost']:.4f}  "
              f"ave-fusion ghost {a['ghost_ave_fusion']:.4f}  "
              f"seam_cost {a['seam_cost']:.4f}")
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
