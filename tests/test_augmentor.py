"""Flow augmentor tests (dense + sparse).

The sparse path mirrors reference core/utils/augmentor.py:165-303: valid
flow vectors are splatted (not interpolated) under resize, inputs smaller
than the crop get padded, and validity masks ride along through every
transform.
"""

import numpy as np

from stitchax.data.augmentor import (AugmentorConfig, FlowAugmentor,
                                     SparseFlowAugmentor)


def _pair(rng, h=200, w=300):
    img1 = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
    img2 = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
    flow = rng.uniform(-30, 30, (h, w, 2)).astype(np.float32)
    return img1, img2, flow


class TestDenseAugmentor:
    def test_shapes_and_range(self, rng):
        cfg = AugmentorConfig(crop_size=(96, 128))
        aug = FlowAugmentor(cfg, seed=0)
        img1, img2, flow = _pair(rng)
        o1, o2, of = aug(img1, img2, flow)
        assert o1.shape == (96, 128, 3) and o2.shape == (96, 128, 3)
        assert of.shape == (96, 128, 2)
        assert o1.min() >= 0 and o1.max() <= 255

    def test_deterministic_given_seed(self, rng):
        img1, img2, flow = _pair(rng)
        a = FlowAugmentor(AugmentorConfig(crop_size=(96, 128)), seed=3)
        b = FlowAugmentor(AugmentorConfig(crop_size=(96, 128)), seed=3)
        oa = a(img1.copy(), img2.copy(), flow.copy())
        ob = b(img1.copy(), img2.copy(), flow.copy())
        for x, y in zip(oa, ob):
            np.testing.assert_array_equal(x, y)


class TestSparseAugmentor:
    def test_resize_sparse_flow_map_splats_scaled_vectors(self):
        aug = SparseFlowAugmentor(AugmentorConfig(crop_size=(64, 64)))
        h, w = 40, 60
        flow = np.zeros((h, w, 2), np.float32)
        valid = np.zeros((h, w), np.float32)
        flow[10, 20] = (8.0, -4.0)
        valid[10, 20] = 1.0
        f2, v2 = aug.resize_sparse_flow_map(flow, valid, sx=2.0, sy=2.0)
        assert f2.shape == (80, 120, 2) and v2.shape == (80, 120)
        assert v2.sum() == 1
        np.testing.assert_allclose(f2[20, 40], (16.0, -8.0))
        # splat semantics: everywhere else is zero/invalid, no interpolation
        assert f2[19, 40].sum() == 0 and v2[21, 40] == 0

    def test_call_shapes_validity_and_padding(self, rng):
        # input smaller than the crop along height -> padded, like KITTI
        cfg = AugmentorConfig(crop_size=(160, 192), do_flip=True,
                              spatial_aug_prob=0.8)
        aug = SparseFlowAugmentor(cfg, seed=0)
        h, w = 120, 400
        img1 = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
        img2 = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
        flow = rng.uniform(-20, 20, (h, w, 2)).astype(np.float32)
        valid = (rng.random((h, w)) < 0.3).astype(np.float32)
        for _ in range(4):  # several draws to cover aug/no-aug branches
            o1, o2, of, ov = aug(img1.copy(), img2.copy(), flow.copy(),
                                 valid.copy())
            assert o1.shape == (160, 192, 3) and o2.shape == (160, 192, 3)
            assert of.shape == (160, 192, 2) and ov.shape == (160, 192)
            assert set(np.unique(ov)).issubset({0.0, 1.0})
            # flow only where valid
            assert np.all(of[ov == 0] == 0) or valid.sum() == 0

    def test_flip_negates_x_flow(self, rng):
        cfg = AugmentorConfig(crop_size=(100, 100), do_flip=True,
                              spatial_aug_prob=0.0, eraser_aug_prob=0.0)
        h = w = 120
        flow = np.zeros((h, w, 2), np.float32)
        flow[:, :, 0] = 5.0
        valid = np.ones((h, w), np.float32)
        img = np.zeros((h, w, 3), np.float32)
        # seeds until the h-flip branch triggers
        for seed in range(10):
            aug = SparseFlowAugmentor(cfg, seed=seed)
            r = np.random.default_rng(seed)
            _, _, of, ov = aug(img.copy(), img.copy(), flow.copy(),
                               valid.copy())
            if of[ov == 1][..., 0].mean() < 0:
                assert np.allclose(of[ov == 1][..., 0], -5.0)
                return
        raise AssertionError("h-flip never triggered in 10 seeds")
