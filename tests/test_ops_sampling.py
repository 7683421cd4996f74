"""Parity tests: stitchax.ops samplers vs torch reference semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from stitchax import ops


def torch_grid_sample(img_hwc, grid_hw2, mode="bilinear", align_corners=True):
    t_img = torch.from_numpy(img_hwc).permute(2, 0, 1)[None]
    t_grid = torch.from_numpy(grid_hw2)[None]
    out = F.grid_sample(t_img, t_grid, mode=mode, align_corners=align_corners)
    return out[0].permute(1, 2, 0).numpy()


class TestGridSample:
    def test_bilinear_inside(self, rng):
        img = rng.standard_normal((13, 17, 3)).astype(np.float32)
        grid = rng.uniform(-0.95, 0.95, (9, 11, 2)).astype(np.float32)
        got = np.asarray(ops.grid_sample(jnp.asarray(img), jnp.asarray(grid)))
        want = torch_grid_sample(img, grid)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_bilinear_out_of_bounds_zeros(self, rng):
        img = rng.standard_normal((8, 8, 2)).astype(np.float32)
        grid = rng.uniform(-1.8, 1.8, (6, 6, 2)).astype(np.float32)
        got = np.asarray(ops.grid_sample(jnp.asarray(img), jnp.asarray(grid)))
        want = torch_grid_sample(img, grid)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_identity_grid(self, rng):
        img = rng.standard_normal((10, 12, 1)).astype(np.float32)
        grid = np.asarray(ops.normalized_grid(10, 12))
        got = np.asarray(ops.grid_sample(jnp.asarray(img), jnp.asarray(grid)))
        np.testing.assert_allclose(got, img, atol=1e-5)


class TestBilinearSampler:
    def test_pixel_coords(self, rng):
        img = rng.standard_normal((16, 16, 4)).astype(np.float32)
        coords = rng.uniform(-2, 18, (5, 7, 2)).astype(np.float32)
        got = np.asarray(ops.bilinear_sampler(jnp.asarray(img), jnp.asarray(coords)))
        # reference formula (core/utils/utils.py:62-76)
        H, W = 16, 16
        gx = 2 * coords[..., 0] / (W - 1) - 1
        gy = 2 * coords[..., 1] / (H - 1) - 1
        want = torch_grid_sample(img, np.stack([gx, gy], -1))
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestFlowWarp:
    def test_vs_torch(self, rng):
        H, W = 14, 18
        img = rng.standard_normal((H, W, 3)).astype(np.float32)
        flow = (3 * rng.standard_normal((H, W, 2))).astype(np.float32)
        got = np.asarray(ops.flow_warp(jnp.asarray(img), jnp.asarray(flow)))
        # reference: core/warp_utils.py:71-80
        gx, gy = np.meshgrid(np.arange(W), np.arange(H))
        vx = gx + flow[..., 0]
        vy = gy + flow[..., 1]
        ngrid = np.stack([2 * vx / (W - 1) - 1, 2 * vy / (H - 1) - 1], -1).astype(np.float32)
        want = torch_grid_sample(img, ngrid)
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestResizeFlow:
    def test_vs_torch(self, rng):
        flow = rng.standard_normal((12, 16, 2)).astype(np.float32)
        got = np.asarray(ops.resize_flow(jnp.asarray(flow), 30, 40))
        t = torch.from_numpy(flow).permute(2, 0, 1)[None]
        out = F.interpolate(t, (30, 40), mode="bilinear", align_corners=True)
        out[:, 0] /= 16 / 40.0
        out[:, 1] /= 12 / 30.0
        want = out[0].permute(1, 2, 0).numpy()
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestInterpolate:
    @pytest.mark.parametrize("align", [True, False])
    def test_vs_torch(self, rng, align):
        img = rng.standard_normal((9, 13, 3)).astype(np.float32)
        got = np.asarray(ops.interpolate_bilinear(jnp.asarray(img), 21, 17, align))
        t = torch.from_numpy(img).permute(2, 0, 1)[None]
        want = F.interpolate(t, (21, 17), mode="bilinear", align_corners=align)
        want = want[0].permute(1, 2, 0).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestHomographyWarp:
    def _reference_transformer(self, img_hwc, theta, out_size):
        """Re-derivation of the UDIS2 sampler formula in numpy
        (reference: core/udis_utils/torch_homo_transform.py)."""
        H, W, C = img_hwc.shape
        oh, ow = out_size
        xs = np.linspace(-1, 1, ow, dtype=np.float32)
        ys = np.linspace(-1, 1, oh, dtype=np.float32)
        gx, gy = np.meshgrid(xs, ys)
        g = np.stack([gx, gy, np.ones_like(gx)], -1)
        T = g @ theta.T
        t = T[..., 2]
        t = t + 1e-6 * (1 - (np.abs(t) >= 1e-7))
        x = (T[..., 0] / t + 1) * W / 2
        y = (T[..., 1] / t + 1) * H / 2
        x0 = np.clip(np.floor(x).astype(int), 0, W - 1)
        x1 = np.clip(np.floor(x).astype(int) + 1, 0, W - 1)
        y0 = np.clip(np.floor(y).astype(int), 0, H - 1)
        y1 = np.clip(np.floor(y).astype(int) + 1, 0, H - 1)
        Ia, Ib = img_hwc[y0, x0], img_hwc[y1, x0]
        Ic, Id = img_hwc[y0, x1], img_hwc[y1, x1]
        wa = ((x1 - x) * (y1 - y))[..., None]
        wb = ((x1 - x) * (y - y0))[..., None]
        wc = ((x - x0) * (y1 - y))[..., None]
        wd = ((x - x0) * (y - y0))[..., None]
        return wa * Ia + wb * Ib + wc * Ic + wd * Id

    def test_identity(self, rng):
        img = rng.uniform(0, 255, (16, 16, 3)).astype(np.float32)
        theta = np.eye(3, dtype=np.float32)
        got = np.asarray(ops.homography_warp(jnp.asarray(img), jnp.asarray(theta), 16, 16))
        want = self._reference_transformer(img, theta, (16, 16))
        np.testing.assert_allclose(got, want, atol=1e-3)

    def test_random_homography_and_mask_zeroing(self, rng):
        img = rng.uniform(0, 255, (20, 24, 3)).astype(np.float32)
        # small perspective perturbation of identity
        theta = np.eye(3, dtype=np.float32)
        theta[0, 1] = 0.15
        theta[1, 0] = -0.08
        theta[0, 2] = 0.3
        theta[2, 0] = 0.05
        got = np.asarray(ops.homography_warp(jnp.asarray(img), jnp.asarray(theta), 20, 24))
        want = self._reference_transformer(img, theta, (20, 24))
        np.testing.assert_allclose(got, want, atol=1e-3)

        # all-ones mask channel must be exactly 0 well outside the source
        mask = np.ones((20, 24, 1), np.float32)
        theta_shift = np.eye(3, dtype=np.float32)
        theta_shift[0, 2] = 3.0  # shift far off-image
        m = np.asarray(ops.homography_warp(jnp.asarray(mask), jnp.asarray(theta_shift), 20, 24))
        assert np.abs(m[:, 12:, 0]).max() < 1e-4
