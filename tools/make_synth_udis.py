"""Generate a synthetic UDIS-D-format dataset for train/eval demonstrations.

No real UDIS-D data exists in this environment (the reference downloads it
from Google Drive, reference README.md:8). This builds stitchable pairs with
the same layout ({root}/{training,testing}/input{1,2}/NNNNNN.jpg) from
procedural scenes: a wide smooth-noise scene with added box/gradient
structure, input1 = left crop, input2 = a homography-displaced crop
(translation `shift` plus per-corner perspective jitter) with mild
photometric jitter — the same recipe as the round-2 ad-hoc eval set
(seed 7, 480x640, shift 80), now committed and reproducible.

  python tools/make_synth_udis.py --root /tmp/udis_synth \
      --train_pairs 200 --test_pairs 24
"""

import argparse
import os

import numpy as np
from PIL import Image


def make_scene(rng, H, W, cell=8):
    """Smooth noise base + random soft boxes + a directional gradient."""
    base = rng.uniform(30, 225, (H // cell, W // cell, 3))
    scene = np.asarray(Image.fromarray(base.astype(np.uint8)).resize(
        (W, H), Image.BILINEAR), np.float32)
    for _ in range(rng.integers(6, 14)):
        h = int(rng.integers(H // 12, H // 3))
        w = int(rng.integers(W // 12, W // 3))
        y = int(rng.integers(0, H - h))
        x = int(rng.integers(0, W - w))
        color = rng.uniform(0, 255, (3,))
        alpha = rng.uniform(0.35, 0.8)
        scene[y:y + h, x:x + w] = (1 - alpha) * scene[y:y + h, x:x + w] \
            + alpha * color
    gx = np.linspace(-1, 1, W)[None, :, None]
    scene = scene + rng.uniform(-20, 20) * gx
    return np.clip(scene, 0, 255)


def warp_crop(scene, x0, W_out, H_out, jitter, rng):
    """Crop [x0, x0+W_out) through a perspective jitter of the 4 corners."""
    src = np.array([[x0, 0], [x0 + W_out, 0],
                    [x0, H_out], [x0 + W_out, H_out]], np.float32)
    dst = src + rng.uniform(-jitter, jitter, (4, 2)).astype(np.float32)
    # PIL QUAD maps output corners to the given source quad (ul, ll, lr, ur)
    quad = (dst[0, 0], dst[0, 1], dst[2, 0], dst[2, 1],
            dst[3, 0], dst[3, 1], dst[1, 0], dst[1, 1])
    im = Image.fromarray(scene.astype(np.uint8))
    out = im.transform((W_out, H_out), Image.QUAD, quad, Image.BILINEAR)
    return np.asarray(out, np.float32)


def make_pair(rng, H=480, W=640, shift=80, jitter=12.0, cell=8):
    scene = make_scene(rng, H, W + shift, cell=cell)
    img1 = scene[:, :W].copy()
    img2 = warp_crop(scene, shift, W, H, jitter, rng)
    # photometric jitter on input2 (exposure mismatch between shots)
    img2 = np.clip(img2 * rng.uniform(0.9, 1.1) + rng.uniform(-8, 8), 0, 255)
    return img1, img2


def write_split(root, phase, n, seed, **kw):
    d1 = os.path.join(root, phase, "input1")
    d2 = os.path.join(root, phase, "input2")
    os.makedirs(d1, exist_ok=True)
    os.makedirs(d2, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        img1, img2 = make_pair(rng, **kw)
        Image.fromarray(img1.astype(np.uint8)).save(
            os.path.join(d1, f"{i:06d}.jpg"), quality=95)
        Image.fromarray(img2.astype(np.uint8)).save(
            os.path.join(d2, f"{i:06d}.jpg"), quality=95)
    print(f"{phase}: {n} pairs at {root}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", type=str, default="/tmp/udis_synth")
    p.add_argument("--train_pairs", type=int, default=200)
    p.add_argument("--test_pairs", type=int, default=24)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--shift", type=int, default=80)
    p.add_argument("--cell", type=int, default=8,
                   help="noise-base cell size in px; larger = smoother, "
                        "more photo-like low-frequency scenes")
    args = p.parse_args()
    kw = dict(H=args.height, W=args.width, shift=args.shift,
              cell=args.cell)
    write_split(args.root, "training", args.train_pairs, seed=1, **kw)
    write_split(args.root, "testing", args.test_pairs, seed=7, **kw)


if __name__ == "__main__":
    main()
