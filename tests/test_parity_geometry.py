"""Activation parity vs the ACTUAL reference torch geometry modules.

Unlike the synthetic oracles in tests/test_ops_*.py, these import the
reference implementation itself (via tests/ref_loader.py + refstubs) and
assert stitchax ops reproduce its outputs numerically:

  core/udis_utils/torch_DLT.py        -> ops/homography.dlt_solve
  core/udis_utils/torch_homo_transform -> ops/sampling.homography_warp
  core/warp_utils.py                  -> ops/{grid,flow,occlusion}
  core/utils/utils.py                 -> ops/{sampling,flow}
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ref_loader import import_ref, requires_reference

from stitchax import ops

pytestmark = requires_reference


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


@pytest.fixture(scope="module")
def refs():
    return {
        "dlt": import_ref("core.udis_utils.torch_DLT"),
        "homo": import_ref("core.udis_utils.torch_homo_transform"),
        "warp": import_ref("core.warp_utils"),
        "utils": import_ref("core.utils.utils"),
    }


class TestDLT:
    def test_tensor_dlt(self, refs, rng):
        # well-spread correspondences: unit square corners +- jitter,
        # scaled to pixels
        B = 6
        base = np.array([[0, 0], [128, 0], [0, 128], [128, 128]], np.float32)
        src = base[None] + rng.uniform(-8, 8, (B, 4, 2)).astype(np.float32)
        dst = base[None] + rng.uniform(-8, 8, (B, 4, 2)).astype(np.float32)

        want = refs["dlt"].tensor_DLT(_t(src), _t(dst)).numpy()
        got = np.asarray(ops.dlt_solve(jnp.asarray(src), jnp.asarray(dst)))

        want = want / want[:, 2:, 2:]
        got = got / got[:, 2:, 2:]
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


class TestHomoTransform:
    def test_transformer(self, refs, rng):
        B, C, H, W = 2, 3, 24, 32
        oh, ow = 30, 40
        img = rng.uniform(0, 255, (B, C, H, W)).astype(np.float32)
        theta = (np.eye(3, dtype=np.float32)[None].repeat(B, 0)
                 + rng.uniform(-0.15, 0.15, (B, 3, 3)).astype(np.float32)
                 * np.array([[0.5, 0.5, 1.0],
                             [0.5, 0.5, 1.0],
                             [0.1, 0.1, 0.0]], np.float32))

        want = refs["homo"].transformer(_t(img), _t(theta), (oh, ow)).numpy()
        got = np.asarray(ops.homography_warp_b(
            jnp.asarray(img.transpose(0, 2, 3, 1)), jnp.asarray(theta),
            oh, ow)).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-2)


class TestWarpUtils:
    def test_rigid_mesh_and_h2mesh(self, refs, rng):
        H_img, W_img, gh, gw = 96, 128, 12, 12
        want_mesh = refs["warp"].get_rigid_mesh(2, H_img, W_img, gh,
                                                gw).numpy()
        got_mesh = np.asarray(ops.get_rigid_mesh(H_img, W_img, gh, gw))
        np.testing.assert_allclose(got_mesh, want_mesh[0], atol=1e-4)

        Hm = np.eye(3, dtype=np.float32)[None].repeat(2, 0)
        Hm += rng.uniform(-0.05, 0.05, Hm.shape).astype(np.float32)
        Hm[:, 2, 2] = 1.0
        want = refs["warp"].H2Mesh(_t(Hm), _t(want_mesh), gh, gw).numpy()
        got = np.stack([np.asarray(
            ops.h2mesh(jnp.asarray(Hm[i]), jnp.asarray(got_mesh)))
            for i in range(2)])
        np.testing.assert_allclose(got, want.reshape(got.shape),
                                   rtol=1e-3, atol=5e-3)

    def test_flow_warp(self, refs, rng):
        B, C, H, W = 2, 3, 20, 28
        x = rng.uniform(0, 1, (B, C, H, W)).astype(np.float32)
        flo = rng.normal(0, 3, (B, 2, H, W)).astype(np.float32)
        want = refs["warp"].warp(_t(x), _t(flo)).numpy()
        got = np.asarray(ops.flow_warp_b(
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(flo.transpose(0, 2, 3, 1)))).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_resize_flow(self, refs, rng):
        flow = rng.normal(0, 5, (1, 2, 16, 24)).astype(np.float32)
        want = refs["warp"].resize_flow(_t(flow).clone(), (32, 40)).numpy()
        got = np.asarray(ops.resize_flow(
            jnp.asarray(flow[0].transpose(1, 2, 0)), 32, 40))
        np.testing.assert_allclose(got.transpose(2, 0, 1), want[0],
                                   rtol=1e-4, atol=1e-4)

    def test_range_map_and_occlusion(self, refs, rng):
        H, W = 18, 22
        fij = rng.normal(0, 2.5, (1, 2, H, W)).astype(np.float32)
        fji = rng.normal(0, 2.5, (1, 2, H, W)).astype(np.float32)

        want_rm = refs["warp"].compute_range_map(_t(fji)).numpy()
        got_rm = np.asarray(ops.compute_range_map(
            jnp.asarray(fji[0].transpose(1, 2, 0))))
        np.testing.assert_allclose(got_rm[..., 0], want_rm[0, 0],
                                   rtol=1e-4, atol=1e-4)

        for est in ("wang", "brox", "fb_abs"):
            for boundaries in (True, False):
                want = refs["warp"].compute_occlusion(
                    _t(fij), _t(fji), est,
                    boundaries_occluded=boundaries).numpy()
                got = np.asarray(ops.compute_occlusion(
                    jnp.asarray(fij[0].transpose(1, 2, 0)),
                    jnp.asarray(fji[0].transpose(1, 2, 0)), est,
                    boundaries_occluded=boundaries))
                np.testing.assert_allclose(
                    got[..., 0], want[0, 0], atol=1e-4,
                    err_msg=f"est={est} boundaries={boundaries}")

    def test_mask_invalid(self, refs, rng):
        coords = rng.uniform(-4, 30, (1, 14, 20, 2)).astype(np.float32)
        want = refs["warp"].mask_invalid(_t(coords), 1, 2).numpy()
        got = np.asarray(ops.mask_invalid(jnp.asarray(coords[0]), 1.0, 2.0))
        np.testing.assert_array_equal(got[..., 0], want[0, 0])


class TestCoreUtils:
    def test_bilinear_sampler(self, refs, rng):
        H, W = 12, 16
        img = rng.uniform(0, 1, (1, 3, H, W)).astype(np.float32)
        coords = np.stack(np.meshgrid(np.arange(W), np.arange(H)),
                          -1).astype(np.float32)[None]
        coords += rng.normal(0, 2, coords.shape).astype(np.float32)
        want = refs["utils"].bilinear_sampler(_t(img), _t(coords)).numpy()
        got = np.asarray(ops.bilinear_sampler(
            jnp.asarray(img[0].transpose(1, 2, 0)), jnp.asarray(coords[0])))
        np.testing.assert_allclose(got.transpose(2, 0, 1), want[0],
                                   rtol=1e-4, atol=1e-5)

    def test_upflow8(self, refs, rng):
        flow = rng.normal(0, 2, (1, 2, 6, 8)).astype(np.float32)
        want = refs["utils"].upflow8(_t(flow)).numpy()
        got = np.asarray(ops.upflow8(jnp.asarray(flow[0].transpose(1, 2, 0))))
        np.testing.assert_allclose(got.transpose(2, 0, 1), want[0],
                                   rtol=1e-4, atol=1e-4)

    def test_coords_grid(self, refs):
        want = refs["utils"].coords_grid(1, 7, 9).numpy()
        got = np.asarray(ops.coords_grid(7, 9))
        np.testing.assert_array_equal(got.transpose(2, 0, 1), want[0])
