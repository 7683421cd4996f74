"""TPS solve/eval/warp + breaking-pipeline tests.

Ground truths are independent numpy derivations of the classic TPS
interpolation properties (exact interpolation at control points, exact
reproduction of affine maps), the behaviours the reference relies on from
OpenCV/kornia (reference: core/inference/tps_methods/).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stitchax import tps
from stitchax.tps.pipeline import TPSConfig


def rand_points(rng, n, lo=0.1, hi=0.9):
    return rng.uniform(lo, hi, size=(n, 2)).astype(np.float32)


class TestSolve:
    def test_exact_interpolation(self, rng):
        """g(ctrl_i) == target_i at every valid control point."""
        ctrl = rand_points(rng, 24)
        target = ctrl + 0.05 * rng.standard_normal((24, 2)).astype(np.float32)
        kw, aw = tps.tps_fit(jnp.asarray(ctrl), jnp.asarray(target), reg=0.0)
        got = tps.tps_eval_points(jnp.asarray(ctrl), jnp.asarray(ctrl), kw, aw)
        np.testing.assert_allclose(np.asarray(got), target, atol=2e-4)

    def test_affine_map_reproduced(self, rng):
        """An affine displacement field is fit with ~zero bending energy and
        reproduced exactly everywhere, not just at control points."""
        ctrl = rand_points(rng, 16)
        A = np.array([[1.05, 0.02], [-0.03, 0.97]], np.float32)
        b = np.array([0.01, -0.02], np.float32)
        target = ctrl @ A.T + b
        kw, aw = tps.tps_fit(jnp.asarray(ctrl), jnp.asarray(target), reg=0.0)
        assert np.abs(np.asarray(kw)).max() < 1e-3
        probe = rand_points(rng, 50)
        got = tps.tps_eval_points(jnp.asarray(probe), jnp.asarray(ctrl), kw, aw)
        np.testing.assert_allclose(np.asarray(got), probe @ A.T + b, atol=1e-3)

    def test_invalid_points_ignored(self, rng):
        """Masked control points must not influence the fit at all."""
        ctrl = rand_points(rng, 12)
        target = ctrl + 0.03 * rng.standard_normal((12, 2)).astype(np.float32)
        kw_ref, aw_ref = tps.tps_fit(jnp.asarray(ctrl), jnp.asarray(target))

        junk_c = np.concatenate([ctrl, rng.uniform(size=(6, 2)).astype(np.float32)])
        junk_t = np.concatenate([target, 100 * np.ones((6, 2), np.float32)])
        valid = jnp.asarray(np.array([True] * 12 + [False] * 6))
        kw, aw = tps.tps_fit(jnp.asarray(junk_c), jnp.asarray(junk_t), valid)

        probe = jnp.asarray(rand_points(rng, 40))
        a = tps.tps_eval_points(probe, jnp.asarray(ctrl), kw_ref, aw_ref)
        b = tps.tps_eval_points(probe, jnp.asarray(junk_c), kw, aw, valid)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
        # masked kernel weights are exactly zero
        assert np.abs(np.asarray(kw)[12:]).max() == 0.0

    def test_kernel_variants_same_interpolant(self, rng):
        """opencv (r^2 log r^2) and kornia (0.5 r^2 log r^2) kernels differ by
        a constant factor absorbed into the weights -> same map."""
        ctrl = rand_points(rng, 10)
        target = ctrl + 0.04 * rng.standard_normal((10, 2)).astype(np.float32)
        probe = jnp.asarray(rand_points(rng, 30))
        outs = []
        for variant in ("opencv", "kornia"):
            kw, aw = tps.tps_fit(jnp.asarray(ctrl), jnp.asarray(target),
                                 variant=variant, reg=0.0)
            outs.append(np.asarray(tps.tps_eval_points(
                probe, jnp.asarray(ctrl), kw, aw, variant=variant)))
        np.testing.assert_allclose(outs[0], outs[1], atol=2e-4)

    def test_duplicate_points_survive(self, rng):
        """The multi-pad sampler can emit coincident control points; the
        regularized solve must stay finite (reference relies on pinverse)."""
        ctrl = rand_points(rng, 8)
        ctrl = np.concatenate([ctrl, ctrl[:3]])  # duplicates
        target = ctrl + 0.02
        kw, aw = tps.tps_fit(jnp.asarray(ctrl), jnp.asarray(target))
        assert np.isfinite(np.asarray(kw)).all()
        assert np.isfinite(np.asarray(aw)).all()


class TestWarpImage:
    def test_identity_pairs_identity_warp(self, rng):
        img = rng.uniform(0, 255, (40, 48, 3)).astype(np.float32)
        pts = (rand_points(rng, 12) * np.array([48, 40])).astype(np.float32)
        out = tps.tps_warp_image(jnp.asarray(img), jnp.asarray(pts),
                                 jnp.asarray(pts))
        np.testing.assert_allclose(np.asarray(out), img, atol=1e-2)

    def test_translation(self, rng):
        """Pure-translation control pairs -> translated image content."""
        img = np.zeros((64, 64, 3), np.float32)
        img[20:28, 24:32] = 200.0
        src = np.array([[10, 10], [50, 10], [10, 50], [50, 50],
                        [30, 10], [10, 30], [50, 30], [30, 50]], np.float32)
        dst = src + np.array([6.0, 4.0], np.float32)
        out = np.asarray(tps.tps_warp_image(
            jnp.asarray(img), jnp.asarray(src), jnp.asarray(dst)))
        np.testing.assert_allclose(out[24:32, 30:38], img[20:28, 24:32],
                                   atol=0.5)


class TestPoints:
    def test_border_segments_static(self):
        anchors, segs = tps.border_segments(96, 128, step=8, pad=4)
        assert anchors.shape[1] == 2 and segs.shape[1] == 4
        # all anchors on the inset border
        on_border = ((anchors[:, 0] == 4) | (anchors[:, 0] == 123)
                     | (anchors[:, 1] == 4) | (anchors[:, 1] == 91))
        assert on_border.all()

    def test_sample_border_points_picks_gradient(self):
        """A single high-gradient pixel inside a segment window wins the
        argmax for that segment."""
        grad = np.zeros((64, 64), np.float32)
        grad[4, 17] = 10.0  # top border, inside some segment window
        pts = np.asarray(tps.sample_border_points(jnp.asarray(grad), 8, 4))
        assert (pts == np.array([17, 4])).all(axis=1).any()

    def test_point_pairs_flow_limit(self, rng):
        flow = np.zeros((64, 64, 2), np.float32)
        flow[10, 10] = [3.0, -2.0]
        flow[20, 20] = [50.0, 0.0]   # exceeds auto limit (64+64)/2//8 = 8
        pts = jnp.asarray(np.array([[10, 10], [20, 20]], np.int32))
        src, dst, valid = tps.point_pairs(pts, jnp.asarray(flow), -1.0)
        assert bool(valid[0]) and not bool(valid[1])
        np.testing.assert_allclose(np.asarray(dst[0]), [13.0, 8.0])

    def test_multi_level_count_static(self, rng):
        img = rng.uniform(0, 255, (96, 96, 3)).astype(np.float32)
        pts1 = tps.multi_level_border_points(jnp.asarray(img), 12, 12, 4)
        pts2 = tps.multi_level_border_points(
            jnp.asarray(rng.uniform(0, 255, (96, 96, 3)).astype(np.float32)),
            12, 12, 4)
        assert pts1.shape == pts2.shape  # static N for fixed dims


class TestPipeline:
    def test_break_warp_smoke(self, rng):
        """End-to-end breaking stage on a synthetic pair: shapes, masks, and
        the blend staying in range; also jit-compiles."""
        out_h, out_w, img_h, img_w = 96, 128, 64, 96
        output1 = rng.uniform(0, 255, (out_h, out_w, 3)).astype(np.float32)
        mask1 = np.zeros((out_h, out_w, 1), np.float32)
        mask1[8:72, 16:112] = 1.0
        h_warp = rng.uniform(0, 255, (out_h, out_w, 3)).astype(np.float32)
        h_warp_mask = np.ones((out_h, out_w, 1), np.float32)
        final_warp = rng.uniform(0, 255, (out_h, out_w, 3)).astype(np.float32)
        flow = rng.uniform(-2, 2, (img_h, img_w, 2)).astype(np.float32)
        occ = np.ones((out_h, out_w, 1), np.float32)
        cfg = TPSConfig(grid_h=8, grid_w=8)

        fn = jax.jit(lambda *a: tps.tps_break_warp(*a, cfg=cfg,
                                                   occlusion_mask=jnp.asarray(occ)))
        out = fn(jnp.asarray(output1), jnp.asarray(mask1), jnp.asarray(h_warp),
                 jnp.asarray(h_warp_mask), jnp.asarray(final_warp),
                 jnp.asarray(flow), jnp.asarray(-16.0), jnp.asarray(-8.0))
        blend = np.asarray(out["new_blend_image"])
        assert blend.shape == (out_h, out_w, 3)
        assert np.isfinite(blend).all()
        assert blend.min() >= 0 and blend.max() <= 255
        m2 = np.asarray(out["mask2"])
        assert set(np.unique(m2)).issubset({0.0, 1.0})
