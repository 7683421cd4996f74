"""TPS breaking-pipeline front-half parity vs the ACTUAL reference code:
flow preprocess (core/inference/tps_pipline.py:213-244), gradient-guided
border sampling (core/inference/sample_point_methods.py:5-128), point-pair
building + shifting (core/inference/utils.py:61-101).

The cv2 TPS solver itself stays property-tested — this cv2 build ships
without the shape module (cv2.createThinPlateSplineShapeTransformer absent,
verified), so the reference's default backend cannot execute here.

stitchax keeps fixed-N points + validity masks instead of dynamic filters,
so pair comparisons filter ours by the mask and compare to the reference's
dynamically-shrunk arrays; border-point comparisons are per-level set
equality (the reference runs torch.unique, which also sorts).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ref_loader import import_ref, requires_reference

from stitchax.tps import points as P
from stitchax.tps.pipeline import TPSConfig, preprocess_flow

pytestmark = requires_reference


@pytest.fixture(scope="module")
def refs():
    return {
        "spm": import_ref("core.inference.sample_point_methods"),
        "utils": import_ref("core.inference.utils"),
        "pip": import_ref("core.inference.tps_pipline"),
    }


def _pointset(a) -> set:
    return {tuple(map(int, p)) for p in np.asarray(a).reshape(-1, 2)}


class TestPreprocess:
    @pytest.mark.parametrize("pool,fwd", [(True, False), (False, False),
                                          (True, True)])
    def test_preprocess_flow(self, refs, rng, pool, fwd):
        H, W = 40, 56
        flow = rng.normal(0, 6, (1, 2, H, W)).astype(np.float32)
        valid = (rng.uniform(0, 1, (1, 1, H, W)) > 0.3).astype(np.float32)
        with torch.no_grad():
            want = refs["pip"].preprocess(
                torch.from_numpy(flow), torch.from_numpy(valid),
                do_avg_pooling=pool, residual_flow_use_forward=fwd,
                grid_h=12, grid_w=12).numpy()
        cfg = TPSConfig(grid_h=12, grid_w=12, do_avg_pooling=pool,
                        residual_flow_use_forward=fwd)
        got = preprocess_flow(jnp.asarray(flow[0].transpose(1, 2, 0)),
                              jnp.asarray(valid[0, 0][..., None]), cfg)
        np.testing.assert_allclose(np.asarray(got),
                                   want[0].transpose(1, 2, 0),
                                   rtol=1e-4, atol=1e-5)


class TestBorderSampling:
    @pytest.mark.parametrize("H,W,step,pad", [(48, 64, 5, 4), (60, 44, 7, 6),
                                              (64, 64, 5, 10)])
    def test_advanced_uniform(self, refs, rng, H, W, step, pad):
        img = rng.uniform(0, 255, (1, 3, H, W)).astype(np.float32)
        with torch.no_grad():
            want = refs["spm"].advanced_uniform_sample_border_points(
                torch.from_numpy(img), step=step, pad_num=pad).numpy()
        grad = P.gradient_magnitude_l1(
            jnp.asarray(img[0].transpose(1, 2, 0)))
        got = P.sample_border_points(grad, step, pad)
        assert _pointset(got) == _pointset(want)

    def test_multi_level_pads_match_pipeline_rule(self, refs):
        """The 'multi' schedule (tps_pipline.py:294-311): base pad, then
        step, 2*step, ... while <= max(H,W)//4."""
        H, W, step, base = 200, 160, 16, 4
        want = [base]
        p = step
        while p <= max(H, W) // 4:
            want.append(p)
            p *= 2
        assert P.multi_level_pads(H, W, step, base) == want


class TestPointPairs:
    def test_get_point_pairs_with_limit(self, refs, rng):
        H, W, N = 40, 48, 37
        pts = np.stack([rng.integers(0, W, N), rng.integers(0, H, N)],
                       -1).astype(np.int64)
        pts = np.unique(pts, axis=0)
        flow = rng.normal(0, 4, (1, 2, H, W)).astype(np.float32)
        with torch.no_grad():
            w_src, w_tgt = refs["utils"].get_point_pairs(
                torch.from_numpy(pts), torch.from_numpy(flow),
                flow_limit=5.0)
        src, tgt, valid = P.point_pairs(jnp.asarray(pts),
                                        jnp.asarray(flow[0].transpose(1, 2, 0)),
                                        flow_limit=5.0)
        valid = np.asarray(valid)
        np.testing.assert_allclose(np.asarray(src)[valid],
                                   w_src.numpy()[0], atol=1e-5)
        np.testing.assert_allclose(np.asarray(tgt)[valid],
                                   w_tgt.numpy()[0], rtol=1e-5, atol=1e-4)

    def test_get_point_pairs_auto_limit(self, refs, rng):
        """flow_limit=-1 resolves to ((H+W)//2)//8 (utils.py:70-73)."""
        H, W, N = 64, 32, 25
        pts = np.unique(np.stack([rng.integers(0, W, N),
                                  rng.integers(0, H, N)], -1), axis=0)
        flow = rng.normal(0, 4, (1, 2, H, W)).astype(np.float32)
        with torch.no_grad():
            w_src, w_tgt = refs["utils"].get_point_pairs(
                torch.from_numpy(pts), torch.from_numpy(flow), flow_limit=-1)
        src, tgt, valid = P.point_pairs(
            jnp.asarray(pts), jnp.asarray(flow[0].transpose(1, 2, 0)),
            flow_limit=-1)
        valid = np.asarray(valid)
        np.testing.assert_allclose(np.asarray(src)[valid], w_src.numpy()[0],
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(tgt)[valid], w_tgt.numpy()[0],
                                   rtol=1e-5, atol=1e-4)

    def test_shift_points(self, refs, rng):
        H, W = 100, 120
        pts = rng.uniform(0, 100, (1, 9, 2)).astype(np.float32)
        wmin, wmax, hmin, hmax = -33.0, 150.0, -12.0, 131.0
        with torch.no_grad():
            want = refs["utils"].shift_points(
                torch.from_numpy(pts), wmin, wmax, hmin, hmax, H, W,
                pad_num=4).numpy()
        got = P.shift_points(jnp.asarray(pts[0]),
                             jnp.asarray(wmin), jnp.asarray(hmin))
        np.testing.assert_allclose(np.asarray(got), want[0],
                                   rtol=1e-6, atol=1e-5)
