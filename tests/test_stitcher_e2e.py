"""End-to-end stitcher test with stub backbones: a known translation between
the two inputs must produce an expanded canvas with img2 content placed at
the right offset (validates align -> render -> TPS -> mix geometry without
trained weights).

Convention (reference: core/flowHomoAdpater.py:197-271 + warp_utils H2Mesh):
H is the backward map out(p) = img2(H(p)) aligning warped img2 to img1;
the canvas footprint is H^{-1}(image frame).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from stitchax.align.adapter import AlignConfig
from stitchax.run.stitcher import Stitcher
from stitchax.tps.pipeline import TPSConfig


class _Cfg(dict):
    def __getattr__(self, k):
        return self[k]


def make_pair(rng, H=128, W=160, shift=24):
    """scene is W+shift wide; img1 = left crop, img2 = right crop.
    True backward map: img2(p - shift) == scene(p) == img1(p)."""
    base = rng.uniform(40, 215, (H // 8, (W + shift) // 8, 3))
    from PIL import Image
    scene = np.asarray(Image.fromarray(base.astype(np.uint8)).resize(
        (W + shift, H), Image.BILINEAR), np.float32)
    img1 = scene[:, :W].copy()
    img2 = scene[:, shift:].copy()
    return img1, img2, scene


class TestStitcherE2E:
    def test_translation_pair(self, rng):
        H, W, shift = 128, 160, 24
        img1, img2, scene = make_pair(rng, H, W, shift)
        S = 512  # model resolution (AlignConfig default)

        def homo_fn(a, b):
            # backward map at model res: H(p) = p - shift*(S/W)
            dx = -shift * (S / W)
            off = jnp.array([[dx, 0, dx, 0, dx, 0, dx, 0]], jnp.float32)
            return jnp.broadcast_to(off, (a.shape[0], 8))

        def flow_fn(a, b):
            zero = jnp.zeros(a.shape[:3] + (2,), a.dtype)
            return [zero], zero[:, ::8, ::8]

        cfg = _Cfg(swap_image=False)
        st = Stitcher(None, cfg,
                      AlignConfig(use_fb_consistency_mask=False,
                                  canvas_bucket=64),
                      TPSConfig(grid_h=8, grid_w=8),
                      inpainter_name="cv_inpainter",
                      homo_fn=homo_fn, flow_fn=flow_fn)
        out = st.stitch(img1, img2)

        # canvas footprint: H^{-1} maps [0,W] -> [shift, W+shift]
        assert out["width_min"] == pytest.approx(0.0, abs=1.5)
        assert out["out_w"] == pytest.approx(W + shift, abs=2)
        assert out["out_h"] == pytest.approx(H, abs=2)

        w1, w2 = out["warp1"], out["warp2"]
        m1, m2 = out["mask1"], out["mask2"]

        def err_at(canvas_img, sl_canvas, scene_x0):
            h0, h1 = 8, H - 8
            width = sl_canvas.stop - sl_canvas.start
            return np.abs(canvas_img[h0:h1, sl_canvas]
                          - scene[h0:h1, scene_x0:scene_x0 + width]).mean()

        # warp1 = img1 at the canvas origin (bilinear softening from the
        # model-res homography round-trip gives a few gray levels of blur,
        # same as the reference's resampled outputs)
        assert err_at(w1, np.s_[4:W - 4], 4) < 6.0
        # placement specificity: content 8 px off must fit far worse
        assert err_at(w1, np.s_[4:W - 4], 12) > 2.5 * err_at(w1, np.s_[4:W - 4], 4)

        # warp2 covers canvas [shift, W+shift] with scene content
        core = np.s_[shift + 8:W + shift - 8]
        assert m2[8:-8, core].mean() > 0.9
        assert err_at(w2, core, shift + 8) < 6.0
        assert err_at(w2, core, shift) > 2.5 * err_at(w2, core, shift + 8)

        # seamless blend over the whole true canvas core
        assert err_at(out["ave_fusion"], np.s_[8:W + shift - 8], 8) < 6.0

    def test_stitch_many_matches_stitch(self, rng):
        """The pipelined generator must yield, in order, exactly what the
        one-shot path produces."""
        H, W, shift = 128, 160, 24
        img1, img2, _ = make_pair(rng, H, W, shift)
        img1b, img2b, _ = make_pair(rng, H, W, 16)
        S = 512

        def homo_fn(a, b):
            dx = -shift * (S / W)
            off = jnp.array([[dx, 0, dx, 0, dx, 0, dx, 0]], jnp.float32)
            return jnp.broadcast_to(off, (a.shape[0], 8))

        def flow_fn(a, b):
            zero = jnp.zeros(a.shape[:3] + (2,), a.dtype)
            return [zero], zero[:, ::8, ::8]

        st = Stitcher(None, _Cfg(swap_image=False),
                      AlignConfig(use_fb_consistency_mask=False,
                                  canvas_bucket=64),
                      TPSConfig(grid_h=8, grid_w=8),
                      inpainter_name="cv_inpainter",
                      homo_fn=homo_fn, flow_fn=flow_fn)
        one = [st.stitch(img1, img2), st.stitch(img1b, img2b)]
        many = list(st.stitch_many([(img1, img2), (img1b, img2b)]))
        assert len(many) == 2
        for a, b in zip(one, many):
            assert a["out_w"] == b["out_w"] and a["out_h"] == b["out_h"]
            np.testing.assert_allclose(a["ave_fusion"], b["ave_fusion"],
                                       atol=1e-5)

    def test_stitch_deterministic(self, rng):
        """Two stitches of the same pair must be bit-identical (the whole
        pipeline is jitted with no RNG on the inference path — the TPU
        analog of the reference pinning seeds at entry, out.py:7-8)."""
        img1, img2, _ = make_pair(rng, 128, 160, 24)
        S = 512

        def homo_fn(a, b):
            dx = -24 * (S / 160)
            off = jnp.array([[dx, 0, dx, 0, dx, 0, dx, 0]], jnp.float32)
            return jnp.broadcast_to(off, (a.shape[0], 8))

        def flow_fn(a, b):
            zero = jnp.zeros(a.shape[:3] + (2,), a.dtype)
            return [zero], zero[:, ::8, ::8]

        st = Stitcher(None, _Cfg(swap_image=False),
                      AlignConfig(use_fb_consistency_mask=False,
                                  canvas_bucket=64),
                      TPSConfig(grid_h=8, grid_w=8),
                      inpainter_name="cv_inpainter",
                      homo_fn=homo_fn, flow_fn=flow_fn)
        a = st.stitch(img1, img2)
        b = st.stitch(img1, img2)
        for k in ("ave_fusion", "warp1", "warp2", "mask1", "mask2"):
            np.testing.assert_array_equal(a[k], b[k])

    def test_diagonal_pair(self, rng):
        """Both canvas axes must expand: img2 is shifted right AND down, so
        height_min/height_max and the vertical render path get exercised
        (the translation case only grows the width)."""
        H, W, sx, sy = 128, 160, 24, 16
        base = rng.uniform(40, 215, ((H + sy) // 8, (W + sx) // 8, 3))
        from PIL import Image
        scene = np.asarray(Image.fromarray(base.astype(np.uint8)).resize(
            (W + sx, H + sy), Image.BILINEAR), np.float32)
        img1 = scene[:H, :W].copy()
        img2 = scene[sy:, sx:].copy()
        S = 512

        def homo_fn(a, b):
            dx, dy = -sx * (S / W), -sy * (S / H)
            off = jnp.array([[dx, dy] * 4], jnp.float32)
            return jnp.broadcast_to(off, (a.shape[0], 8))

        def flow_fn(a, b):
            zero = jnp.zeros(a.shape[:3] + (2,), a.dtype)
            return [zero], zero[:, ::8, ::8]

        st = Stitcher(None, _Cfg(swap_image=False),
                      AlignConfig(use_fb_consistency_mask=False,
                                  canvas_bucket=64),
                      TPSConfig(grid_h=8, grid_w=8),
                      inpainter_name="cv_inpainter",
                      homo_fn=homo_fn, flow_fn=flow_fn)
        out = st.stitch(img1, img2)

        assert out["out_w"] == pytest.approx(W + sx, abs=2)
        assert out["out_h"] == pytest.approx(H + sy, abs=2)

        def err2d(canvas_img, sl_y, sl_x, y0, x0):
            h = sl_y.stop - sl_y.start
            w = sl_x.stop - sl_x.start
            return np.abs(canvas_img[sl_y, sl_x]
                          - scene[y0:y0 + h, x0:x0 + w]).mean()

        # warp1 = img1 at the canvas origin
        assert err2d(out["warp1"], np.s_[8:H - 8], np.s_[8:W - 8], 8, 8) < 6.0
        # warp2 core sits at (sy, sx) with scene content under a live mask
        cy, cx = np.s_[sy + 8:H + sy - 8], np.s_[sx + 8:W + sx - 8]
        assert out["mask2"][cy, cx].mean() > 0.9
        good = err2d(out["warp2"], cy, cx, sy + 8, sx + 8)
        assert good < 6.0
        # placement specificity along BOTH axes
        assert err2d(out["warp2"], cy, cx, sy + 16, sx + 8) > 2.5 * good
        assert err2d(out["warp2"], cy, cx, sy + 8, sx + 16) > 2.5 * good
