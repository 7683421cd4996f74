"""Range-map / occlusion / morphology / splat / convex-upsample parity tests."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from stitchax import ops


def torch_range_map(flow_hw2):
    """Re-derivation of compute_range_map (reference: core/warp_utils.py:114-175)."""
    H, W, _ = flow_hw2.shape
    gx, gy = np.meshgrid(np.arange(W), np.arange(H))
    coords = np.stack([gx + flow_hw2[..., 0], gy + flow_hw2[..., 1]], -1)
    floor = np.floor(coords)
    off = coords - floor
    counts = np.zeros(H * W, np.float64)
    fi = floor[..., 0].astype(int).ravel()
    fj = floor[..., 1].astype(int).ravel()
    ox = off[..., 0].ravel()
    oy = off[..., 1].ravel()
    for di in range(2):
        for dj in range(2):
            ix = fi + di
            iy = fj + dj
            valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
            w = (((1 - di) - (-1) ** di * ox) * ((1 - dj) - (-1) ** dj * oy))
            np.add.at(counts, (iy[valid] * W + ix[valid]), w[valid])
    return counts.reshape(H, W, 1).astype(np.float32)


class TestRangeMap:
    def test_zero_flow(self):
        flow = np.zeros((6, 7, 2), np.float32)
        rm = np.asarray(ops.compute_range_map(jnp.asarray(flow)))
        np.testing.assert_allclose(rm, np.ones((6, 7, 1)), atol=1e-5)

    def test_random_flow(self, rng):
        flow = (2.5 * rng.standard_normal((12, 10, 2))).astype(np.float32)
        got = np.asarray(ops.compute_range_map(jnp.asarray(flow)))
        want = torch_range_map(flow)
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestOcclusion:
    def test_consistent_flow_unoccluded(self):
        # constant forward flow +5x, backward -5x: perfectly consistent
        f = np.zeros((16, 16, 2), np.float32)
        f[..., 0] = 3
        b = -f
        occ = np.asarray(ops.compute_occlusion(jnp.asarray(f), jnp.asarray(b),
                                               "brox", occlusion_are_zeros=True))
        # interior must be unoccluded (=1 with occlusion_are_zeros)
        assert occ[4:-4, 4:-4].min() == 1.0

    def test_wang_matches_rangemap(self, rng):
        fij = rng.standard_normal((10, 10, 2)).astype(np.float32)
        fji = rng.standard_normal((10, 10, 2)).astype(np.float32)
        occ = np.asarray(ops.compute_occlusion(jnp.asarray(fij), jnp.asarray(fji), "wang"))
        want = 1 - np.clip(torch_range_map(fji), 0, 1)
        np.testing.assert_allclose(occ, want, atol=1e-4)


class TestMorphology:
    def test_open_vs_reference_conv_impl(self, rng):
        """vs the reference conv-based open (core/flowHomoAdpater.py:18-35)."""
        mask = (rng.uniform(size=(1, 40, 40, 1)) > 0.4).astype(np.float32)
        got = np.asarray(ops.preprocess_occlusion_mask(jnp.asarray(mask), (9, 9)))

        t = torch.from_numpy(mask).permute(0, 3, 1, 2)
        k = torch.ones((1, 1, 9, 9))
        ero = F.conv2d((t >= 0.5).float(), k, padding=(4, 4))
        ero = (ero == 81).float()
        dil = F.conv2d(ero, k, padding=(4, 4))
        dil = (dil >= 1).float()
        want = (dil >= 0.5).float().permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want)

    def test_dilate_erode_basic(self):
        m = np.zeros((7, 7, 1), np.float32)
        m[3, 3] = 1
        d = np.asarray(ops.dilate(jnp.asarray(m), (3, 3)))
        assert d.sum() == 9
        e = np.asarray(ops.erode(jnp.asarray(d), (3, 3)))
        assert e.sum() == 1 and e[3, 3] == 1

    def test_avg_pool_same(self, rng):
        x = rng.standard_normal((1, 12, 12, 2)).astype(np.float32)
        got = np.asarray(ops.avg_pool_same(jnp.asarray(x), 5))
        t = torch.from_numpy(x).permute(0, 3, 1, 2)
        want = F.avg_pool2d(t, 5, stride=1, padding=2).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestSplat:
    def test_identity_splat(self, rng):
        img = rng.uniform(0, 1, (8, 9, 3)).astype(np.float32)
        flow = np.zeros((8, 9, 2), np.float32)
        out, w = ops.forward_warp_with_flow(jnp.asarray(img), jnp.asarray(flow), 8, 9)
        np.testing.assert_allclose(np.asarray(out), img, atol=1e-5)
        np.testing.assert_allclose(np.asarray(w), np.ones((8, 9, 1)), atol=1e-5)

    def test_shift_splat(self):
        img = np.zeros((6, 6, 1), np.float32)
        img[2, 2] = 1
        flow = np.full((6, 6, 2), 2.0, np.float32)
        out, _ = ops.forward_warp_with_flow(jnp.asarray(img), jnp.asarray(flow), 6, 6)
        assert np.asarray(out)[4, 4, 0] == 1.0


class TestConvexUpsample:
    def test_vs_torch(self, rng):
        H, W = 4, 5
        flow = rng.standard_normal((H, W, 2)).astype(np.float32)
        mask = rng.standard_normal((H, W, 64 * 9)).astype(np.float32)
        got = np.asarray(ops.convex_upsample_flow(jnp.asarray(flow), jnp.asarray(mask)))

        # reference: core/FlowFormer/PerCostFormer3/decoder.py:214-225
        tflow = torch.from_numpy(flow).permute(2, 0, 1)[None]
        tmask = torch.from_numpy(mask).permute(2, 0, 1)[None]
        m = tmask.view(1, 1, 9, 8, 8, H, W)
        m = torch.softmax(m, dim=2)
        up = F.unfold(8 * tflow, [3, 3], padding=1)
        up = up.view(1, 2, 9, 1, 1, H, W)
        up = torch.sum(m * up, dim=2)
        up = up.permute(0, 1, 4, 2, 5, 3)
        want = up.reshape(1, 2, 8 * H, 8 * W)[0].permute(1, 2, 0).numpy()
        np.testing.assert_allclose(got, want, atol=1e-4)
