"""DLT and mesh parity tests vs the reference formulation."""

import numpy as np
import torch

import jax.numpy as jnp

from stitchax import ops


def torch_tensor_dlt(src_p, dst_p):
    """Re-derivation of the 8x8 DLT system in torch, run in float64 so it is
    an accurate ground truth (reference: core/udis_utils/torch_DLT.py:17-45)."""
    src = torch.from_numpy(src_p).double()
    dst = torch.from_numpy(dst_p).double()
    bs = src.shape[0]
    ones = torch.ones(bs, 4, 1, dtype=torch.float64)
    xy1 = torch.cat((src, ones), 2)
    zeros = torch.zeros_like(xy1)
    xyu, xyd = torch.cat((xy1, zeros), 2), torch.cat((zeros, xy1), 2)
    M1 = torch.cat((xyu, xyd), 2).reshape(bs, -1, 6)
    M2 = torch.matmul(dst.reshape(-1, 2, 1), src.reshape(-1, 1, 2)).reshape(bs, -1, 2)
    A = torch.cat((M1, -M2), 2)
    b = dst.reshape(bs, -1, 1)
    Ainv = torch.inverse(A)
    h8 = torch.matmul(Ainv, b).reshape(bs, 8)
    H = torch.cat((h8, ones[:, 0, :]), 1).reshape(bs, 3, 3)
    return H.numpy()


class TestDLT:
    def test_identity(self):
        src = np.array([[[0, 0], [512, 0], [0, 512], [512, 512]]], np.float32)
        H = np.asarray(ops.dlt_solve(jnp.asarray(src), jnp.asarray(src)))
        np.testing.assert_allclose(H[0], np.eye(3), atol=1e-4)

    def test_vs_reference(self, rng):
        src = np.array([[[0, 0], [512, 0], [0, 512], [512, 512]]], np.float32)
        src = np.repeat(src, 5, axis=0)
        dst = src + 30 * rng.standard_normal((5, 4, 2)).astype(np.float32)
        got = np.asarray(ops.dlt_solve(jnp.asarray(src), jnp.asarray(dst)))
        want = torch_tensor_dlt(src, dst)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_maps_corners(self, rng):
        src = np.array([[[0, 0], [100, 0], [0, 80], [100, 80]]], np.float32)
        dst = src + 8 * rng.standard_normal((1, 4, 2)).astype(np.float32)
        H = np.asarray(ops.dlt_solve(jnp.asarray(src), jnp.asarray(dst)))[0]
        proj = np.asarray(ops.apply_homography_to_points(jnp.asarray(H), jnp.asarray(src[0])))
        np.testing.assert_allclose(proj, dst[0], atol=1e-2)


class TestMesh:
    def test_rigid_mesh(self):
        m = np.asarray(ops.get_rigid_mesh(100, 200, grid_h=4, grid_w=5))
        assert m.shape == (5, 6, 2)
        np.testing.assert_allclose(m[0, 0], [0, 0])
        np.testing.assert_allclose(m[-1, -1], [200, 100])
        np.testing.assert_allclose(m[0, 3, 0], 200 * 3 / 5)

    def test_h2mesh_identity(self):
        m = ops.get_rigid_mesh(64, 64, grid_h=7, grid_w=7)
        out = np.asarray(ops.h2mesh(jnp.eye(3), m))
        np.testing.assert_allclose(out, np.asarray(m), atol=1e-4)

    def test_h2mesh_translation(self):
        # H maps src->dst; mesh through H^-1 gives the source locations
        H = jnp.asarray(np.array([[1, 0, 10], [0, 1, -5], [0, 0, 1]], np.float32))
        m = ops.get_rigid_mesh(64, 64, grid_h=3, grid_w=3)
        out = np.asarray(ops.h2mesh(H, m))
        np.testing.assert_allclose(out[..., 0], np.asarray(m)[..., 0] - 10, atol=1e-4)
        np.testing.assert_allclose(out[..., 1], np.asarray(m)[..., 1] + 5, atol=1e-4)


class TestNormalizedHomography:
    def test_roundtrip(self, rng):
        """theta = M^-1 H M reproduces pixel-space warp in normalized space."""
        h = w = 32
        src = np.array([[[0, 0], [w, 0], [0, h], [w, h]]], np.float32)
        dst = src + 3 * rng.standard_normal((1, 4, 2)).astype(np.float32)
        H = ops.dlt_solve(jnp.asarray(src), jnp.asarray(dst))[0]
        theta = ops.to_normalized_homography(H, (h, w), (h, w))
        # a pixel p_norm in dst space -> theta @ p_norm should equal
        # normalized H @ p_pix
        p_pix = np.array([10.0, 20.0], np.float32)
        p_norm = p_pix / np.array([w / 2, h / 2]) - 1
        q_norm = np.asarray(ops.apply_homography_to_points(theta, jnp.asarray(p_norm)))
        q_pix = np.asarray(ops.apply_homography_to_points(H, jnp.asarray(p_pix)))
        q_norm_want = q_pix / np.array([w / 2, h / 2]) - 1
        np.testing.assert_allclose(q_norm, q_norm_want, atol=1e-3)
