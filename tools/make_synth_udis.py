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


def make_scene_rich(rng, H, W):
    """Domain-randomized scene: multi-scale (fractal-ish) noise base +
    boxes/ellipses/stripes/thin lines/checker patches — statistics much
    closer to real photos (fine texture, hard edges, repeated structure)
    than the smooth-noise `make_scene`. Round-5 addition for closing the
    synthetic->real gap measured by tools/eval_real_photos.py."""
    from PIL import ImageDraw

    scene = np.zeros((H, W, 3), np.float32)
    total = 0.0
    for cell, amp in ((64, 1.0), (16, 0.5), (4, 0.25)):
        base = rng.uniform(0, 255, (max(H // cell, 1), max(W // cell, 1), 3))
        layer = np.asarray(Image.fromarray(base.astype(np.uint8)).resize(
            (W, H), Image.BILINEAR), np.float32)
        scene += amp * layer
        total += amp
    scene /= total

    im = Image.fromarray(np.clip(scene, 0, 255).astype(np.uint8))
    draw = ImageDraw.Draw(im, "RGBA")

    def rgba():
        c = rng.uniform(0, 255, (3,)).astype(int)
        return (int(c[0]), int(c[1]), int(c[2]),
                int(rng.uniform(90, 220)))

    for _ in range(int(rng.integers(4, 10))):  # boxes (building-ish)
        w = int(rng.integers(W // 14, W // 3))
        h = int(rng.integers(H // 14, H // 3))
        x = int(rng.integers(0, W - w))
        y = int(rng.integers(0, H - h))
        draw.rectangle([x, y, x + w, y + h], fill=rgba())
    for _ in range(int(rng.integers(2, 6))):  # ellipses
        w = int(rng.integers(W // 16, W // 4))
        h = int(rng.integers(H // 16, H // 4))
        x = int(rng.integers(0, W - w))
        y = int(rng.integers(0, H - h))
        draw.ellipse([x, y, x + w, y + h], fill=rgba())
    for _ in range(int(rng.integers(6, 16))):  # thin hard lines
        x0, x1 = rng.integers(0, W, 2)
        y0, y1 = rng.integers(0, H, 2)
        draw.line([int(x0), int(y0), int(x1), int(y1)], fill=rgba(),
                  width=int(rng.integers(1, 4)))
    if rng.uniform() < 0.5:  # a checker patch (facade/tile texture)
        cs = int(rng.integers(8, 24))
        px = int(rng.integers(0, max(W - 8 * cs, 1)))
        py = int(rng.integers(0, max(H - 8 * cs, 1)))
        c1, c2 = rgba(), rgba()
        for iy in range(8):
            for ix in range(8):
                draw.rectangle(
                    [px + ix * cs, py + iy * cs,
                     px + (ix + 1) * cs, py + (iy + 1) * cs],
                    fill=c1 if (ix + iy) % 2 == 0 else c2)
    scene = np.asarray(im, np.float32)
    # fine-grain sensor-like noise
    scene = scene + rng.normal(0, rng.uniform(1.0, 5.0), scene.shape)
    return np.clip(scene, 0, 255)


def photometric_rich(img, rng):
    """Stronger exposure mismatch: per-channel gain, gamma, offset, and an
    occasional slight blur (defocus/motion between shots)."""
    gain = rng.uniform(0.85, 1.15, (3,))
    gamma = rng.uniform(0.85, 1.2)
    off = rng.uniform(-12, 12)
    out = 255.0 * (np.clip(img / 255.0, 0, 1) ** gamma)
    out = np.clip(out * gain[None, None, :] + off, 0, 255)
    if rng.uniform() < 0.3:
        from PIL import ImageFilter
        out = np.asarray(Image.fromarray(out.astype(np.uint8)).filter(
            ImageFilter.GaussianBlur(rng.uniform(0.4, 1.2))), np.float32)
    return out


def make_pair_rich(rng, H=480, W=640, shift=80, jitter=12.0, cell=8):
    """Rich-recipe pair: varied shift/jitter + the rich scene + stronger
    photometrics. `cell` is accepted for signature parity (unused)."""
    del cell
    s = int(shift * rng.uniform(0.6, 1.25))
    j = jitter * rng.uniform(0.6, 1.5)
    scene = make_scene_rich(rng, H, W + s)
    img1 = scene[:, :W].copy()
    img2 = warp_crop(scene, s, W, H, j, rng)
    img2 = photometric_rich(img2, rng)
    return img1, img2


RECIPES = {"classic": make_pair, "rich": make_pair_rich}


def write_split(root, phase, n, seed, recipe="classic", **kw):
    d1 = os.path.join(root, phase, "input1")
    d2 = os.path.join(root, phase, "input2")
    os.makedirs(d1, exist_ok=True)
    os.makedirs(d2, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        if recipe == "mixed":  # alternate recipes pair by pair
            fn = make_pair_rich if i % 2 else make_pair
        else:
            fn = RECIPES[recipe]
        img1, img2 = fn(rng, **kw)
        q = int(rng.integers(70, 96)) if recipe != "classic" else 95
        Image.fromarray(img1.astype(np.uint8)).save(
            os.path.join(d1, f"{i:06d}.jpg"), quality=q)
        Image.fromarray(img2.astype(np.uint8)).save(
            os.path.join(d2, f"{i:06d}.jpg"), quality=q)
    print(f"{phase}: {n} pairs at {root} (recipe={recipe})")


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
    p.add_argument("--recipe", choices=("classic", "rich", "mixed"),
                   default="classic",
                   help="classic = the committed round-2 recipe (keeps "
                        "existing artifacts reproducible); rich = domain-"
                        "randomized scenes (multi-scale texture, hard "
                        "edges, stronger photometrics); mixed = alternate")
    args = p.parse_args()
    kw = dict(H=args.height, W=args.width, shift=args.shift,
              cell=args.cell, recipe=args.recipe)
    write_split(args.root, "training", args.train_pairs, seed=1, **kw)
    write_split(args.root, "testing", args.test_pairs, seed=7, **kw)


if __name__ == "__main__":
    main()
