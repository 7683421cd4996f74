"""Deformable conv vs a naive loop oracle; forward splat sanity."""

import numpy as np
import jax.numpy as jnp
import pytest

from stitchax.ops.deform import deform_conv2d


def naive_deform(x, offsets, weights, K=3):
    """Direct loop implementing mmcv deform_conv semantics (zero padding,
    (dy, dx) offset pairs per tap, taps row-major)."""
    H, W, C = x.shape
    Cout = weights.shape[1]
    r = K // 2
    out = np.zeros((H, W, Cout), np.float64)

    def sample(yy, xx):
        y0, x0 = int(np.floor(yy)), int(np.floor(xx))
        fy, fx = yy - y0, xx - x0
        acc = np.zeros(C, np.float64)
        for (yi, xi, w) in ((y0, x0, (1 - fy) * (1 - fx)),
                            (y0, x0 + 1, (1 - fy) * fx),
                            (y0 + 1, x0, fy * (1 - fx)),
                            (y0 + 1, x0 + 1, fy * fx)):
            if 0 <= yi < H and 0 <= xi < W:
                acc += w * x[yi, xi]
        return acc

    for i in range(H):
        for j in range(W):
            taps = []
            for a in range(K):
                for b in range(K):
                    k = a * K + b
                    dy = offsets[i, j, 2 * k]
                    dx = offsets[i, j, 2 * k + 1]
                    taps.append(sample(i + (a - r) + dy, j + (b - r) + dx))
            taps = np.concatenate(taps)          # (K*K*C,)
            out[i, j] = taps @ weights
    return out


class TestDeformConv:
    def test_matches_naive(self, rng):
        H, W, C, Cout = 7, 8, 3, 4
        x = rng.standard_normal((H, W, C)).astype(np.float32)
        offsets = (rng.standard_normal((H, W, 18)) * 1.5).astype(np.float32)
        weights = rng.standard_normal((9 * C, Cout)).astype(np.float32)
        want = naive_deform(x, offsets, weights)
        got = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(offsets),
                                       jnp.asarray(weights)))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_zero_offsets_equal_conv(self, rng):
        """With zero offsets, deform conv == plain 3x3 conv (zero padding)."""
        import jax
        from flax import linen as nn
        H, W, C, Cout = 10, 12, 4, 5
        x = rng.standard_normal((H, W, C)).astype(np.float32)
        w = rng.standard_normal((3, 3, C, Cout)).astype(np.float32)
        conv = nn.Conv(Cout, (3, 3), padding=((1, 1), (1, 1)), use_bias=False)
        ref = conv.apply({"params": {"kernel": jnp.asarray(w)}},
                         jnp.asarray(x)[None])[0]
        wm = w.reshape(9 * C, Cout)  # (a, b, c) row-major == tap-major
        got = deform_conv2d(jnp.asarray(x),
                            jnp.zeros((H, W, 18), jnp.float32),
                            jnp.asarray(wm))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4)


class TestSplat:
    def test_identity_flow_roundtrip(self, rng):
        from stitchax.ops.splat import forward_warp_with_flow
        img = rng.uniform(0, 255, (12, 14, 3)).astype(np.float32)
        zero = jnp.zeros((12, 14, 2), jnp.float32)
        out, w = forward_warp_with_flow(jnp.asarray(img), zero, 12, 14)
        np.testing.assert_allclose(np.asarray(out), img, atol=1e-3)
        np.testing.assert_allclose(np.asarray(w), np.ones((12, 14, 1)),
                                   atol=1e-5)

    def test_integer_translation(self, rng):
        from stitchax.ops.splat import forward_warp_with_flow
        img = rng.uniform(0, 255, (10, 10, 3)).astype(np.float32)
        flow = jnp.full((10, 10, 2), 3.0, jnp.float32)
        out, w = forward_warp_with_flow(jnp.asarray(img), flow, 16, 16)
        np.testing.assert_allclose(np.asarray(out)[3:13, 3:13], img,
                                   atol=1e-3)
        assert float(w[:3].sum()) == 0.0

    def test_fractional_splat_conserves_mass(self, rng):
        from stitchax.ops.splat import bilinear_splat
        vals = rng.uniform(1, 2, (8, 8, 1)).astype(np.float32)
        coords = jnp.asarray(
            np.stack(np.meshgrid(np.arange(8), np.arange(8))[:2], -1)
            .astype(np.float32) + 0.5)  # half-pixel shift, inside canvas
        out, w = bilinear_splat(jnp.asarray(vals), coords, 12, 12)
        # total splatted weight equals number of source pixels
        assert abs(float((np.asarray(out) * np.asarray(w)).sum())
                   - float(vals.sum())) / float(vals.sum()) < 1e-3
