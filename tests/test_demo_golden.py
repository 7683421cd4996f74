"""Demo-pair end-to-end golden test (SURVEY.md §4 test-pyramid item (d)).

The reference's de facto smoke test is `out.py` over its bundled demo pairs
producing inspectable JPEGs (reference out.py:266-308). This pins that path
numerically: the REAL random-init model stack (FlowFormer + UDIS2 homography,
seed 0) stitches the bundled demo_data/demo1 JPEGs at reduced resolution on
CPU, and the result must match a committed golden canvas within a PSNR
tolerance. Legitimate low-order numeric drift (op reformulations at 1e-3
level) passes; geometry/orchestration regressions (wrong warp, mask, canvas,
or mix arithmetic) fail loudly.

NOTE on the random-init golden's content: at seed-0 random init the
fb-consistency occlusion mask erodes to all-zero under the 19x19 double
open, so img2 contributes NOTHING to this golden's canvas (warp2/mask2 are
all-zero — faithful to the reference's algebra at random init, but
degenerate). It still pins the model-driven canvas box, warp1 placement and
the mix fallback guard. The companion STUB golden below pins the same
pipeline with non-degenerate geometry so every stage executes on real
content; tests/test_demo_golden_transref.py does the same through the
default transref config.

Regenerate the goldens after an INTENTIONAL pipeline-semantics change with:
    python tests/test_demo_golden.py --regen
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from stub_backbones import stub_flow_fn, stub_homo_fn  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "demo1_seed0_fastcv.npz")
GOLDEN_STUB = os.path.join(os.path.dirname(__file__), "golden",
                           "demo1_stub_fastcv.npz")
DEMO = os.path.join(os.path.dirname(__file__), "..", "demo_data", "demo1")


class _Cfg(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)


def _load_demo_pair(size=(224, 192)):
    from PIL import Image
    out = []
    for name in ("input1.jpg", "input2.jpg"):
        im = Image.open(os.path.join(DEMO, name)).convert("RGB")
        out.append(np.asarray(im.resize(size, Image.BILINEAR), np.float32))
    return out


def _stitch_demo():
    from stitchax.align.adapter import AlignConfig
    from stitchax.run.stitcher import StitchModels, Stitcher
    from stitchax.tps.pipeline import TPSConfig

    img1, img2 = _load_demo_pair()
    cfg = _Cfg(swap_image=False)
    models = StitchModels.build(cfg, rng_seed=0, use_composition=False,
                                init_size=128)
    st = Stitcher(models, cfg,
                  AlignConfig(model_size=128, canvas_bucket=64),
                  TPSConfig(grid_h=8, grid_w=8),
                  inpainter_name="cv_inpainter",
                  mix_method="all_img1_with_inpaint")
    # goldens pin STITCH semantics; the pack codec has its own bound
    # tests (test_pack_yuv.py) — use the exact rgb pack here so the
    # yuv420 default's chroma subsampling can't blur a real regression
    st.pack_mode = "rgb"
    return st.stitch(img1, img2)


def _stitch_demo_stub():
    from stitchax.align.adapter import AlignConfig
    from stitchax.run.stitcher import Stitcher
    from stitchax.tps.pipeline import TPSConfig

    img1, img2 = _load_demo_pair()
    st = Stitcher(None, _Cfg(swap_image=False),
                  AlignConfig(model_size=128, canvas_bucket=64),
                  TPSConfig(grid_h=8, grid_w=8),
                  inpainter_name="cv_inpainter",
                  mix_method="all_img1_with_inpaint",
                  homo_fn=stub_homo_fn, flow_fn=stub_flow_fn)
    st.pack_mode = "rgb"        # see _stitch_demo
    return st.stitch(img1, img2)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return np.inf
    return 10.0 * np.log10(255.0 ** 2 / mse)


def test_demo1_matches_golden():
    assert os.path.isfile(GOLDEN), (
        "golden missing — run: python tests/test_demo_golden.py --regen")
    want = np.load(GOLDEN)
    out = _stitch_demo()

    # the canvas footprint is part of the contract: random-init homography
    # (seed 0) must keep producing the same bucketed canvas
    got_ave = np.clip(out["ave_fusion"], 0, 255).astype(np.uint8)
    assert got_ave.shape == want["ave_fusion"].shape, (
        f"canvas changed: {got_ave.shape} vs {want['ave_fusion'].shape}")

    for key in ("ave_fusion", "warp1", "warp2"):
        got = np.clip(out[key], 0, 255).astype(np.uint8)
        p = _psnr(got, want[key])
        assert p > 30.0, f"{key}: PSNR vs golden {p:.2f} dB"

    for key in ("mask1", "mask2"):
        got = (np.asarray(out[key])[..., 0] > 0.5)
        ref = want[key] > 127
        agree = float((got == ref).mean())
        assert agree > 0.99, f"{key}: mask agreement {agree:.4f}"


def test_demo1_stub_geometry_matches_golden():
    """Non-degenerate companion: deterministic stub backbones give a real
    overlap + hole ring, so warp2/mask2/TPS/mix/cv-inpaint all execute on
    content (the random-init golden above cannot pin them — see module
    docstring)."""
    assert os.path.isfile(GOLDEN_STUB), (
        "golden missing — run: python tests/test_demo_golden.py --regen")
    want = np.load(GOLDEN_STUB)
    out = _stitch_demo_stub()

    got_ave = np.clip(out["ave_fusion"], 0, 255).astype(np.uint8)
    assert got_ave.shape == want["ave_fusion"].shape, (
        f"canvas changed: {got_ave.shape} vs {want['ave_fusion'].shape}")
    # img2 must contribute real content
    assert float(np.asarray(out["mask2"]).mean()) > 0.05

    for key in ("ave_fusion", "warp1", "warp2"):
        got = np.clip(out[key], 0, 255).astype(np.uint8)
        p = _psnr(got, want[key])
        assert p > 30.0, f"{key}: PSNR vs golden {p:.2f} dB"

    for key in ("mask1", "mask2"):
        got = (np.asarray(out[key])[..., 0] > 0.5)
        ref = want[key] > 127
        agree = float((got == ref).mean())
        assert agree > 0.99, f"{key}: mask agreement {agree:.4f}"


def _save_golden(path, out):
    np.savez_compressed(
        path,
        ave_fusion=np.clip(out["ave_fusion"], 0, 255).astype(np.uint8),
        warp1=np.clip(out["warp1"], 0, 255).astype(np.uint8),
        warp2=np.clip(out["warp2"], 0, 255).astype(np.uint8),
        mask1=(np.asarray(out["mask1"])[..., 0] * 255).astype(np.uint8),
        mask2=(np.asarray(out["mask2"])[..., 0] * 255).astype(np.uint8),
    )
    print(f"wrote {path}: ave_fusion {out['ave_fusion'].shape}")


def _regen():
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    stub_out = _stitch_demo_stub()
    if float(np.asarray(stub_out["mask2"]).mean()) <= 0.05:
        raise SystemExit("refusing to write a DEGENERATE stub golden "
                         "(mask2 is (near-)zero)")
    _save_golden(GOLDEN_STUB, stub_out)
    _save_golden(GOLDEN, _stitch_demo())


if __name__ == "__main__":
    import sys

    import jax

    jax.config.update("jax_platforms", "cpu")
    if "--regen" in sys.argv:
        _regen()
    else:
        print("use --regen to regenerate the golden")
