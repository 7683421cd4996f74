"""Shape/sanity tests for the model zoo at tiny resolutions."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stitchax.models import (CompositionNet, FlowFormer, FlowFormerConfig,
                             TwinsSVT, UDIS2HomographyNet, compose_seam)


class TestTwins:
    def test_shapes(self, rng):
        model = TwinsSVT()
        x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x)
        feat, feat_q = model.apply(params, x)
        assert feat.shape == (1, 8, 8, 256)
        assert feat_q.shape == (1, 16, 16, 128)


class TestFlowFormer:
    def test_forward_shapes(self, rng):
        cfg = FlowFormerConfig(decoder_depth=2, encoder_depth=1)
        model = FlowFormer(cfg)
        img = jnp.asarray(rng.uniform(0, 255, (1, 64, 64, 3)), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), img, img)
        preds, flow_lr = model.apply(params, img, img)
        assert len(preds) == 2
        assert preds[-1].shape == (1, 64, 64, 2)
        assert flow_lr.shape == (1, 8, 8, 2)
        assert np.isfinite(np.asarray(preds[-1])).all()


class TestUDIS2:
    def test_homography_net(self, rng):
        # 128 is the smallest input whose 1/16-res CCL grid survives the
        # regression head's three stride-2 pools (real input is 512).
        model = UDIS2HomographyNet()
        x = jnp.asarray(rng.standard_normal((1, 128, 128, 3)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x, x)
        offsets = model.apply(variables, x, x)
        assert offsets.shape == (1, 8)
        assert np.isfinite(np.asarray(offsets)).all()

    def test_composition_net(self, rng):
        # the reference's dilated convs keep padding=1, shrinking feature
        # maps by 2*(d-1) per conv; 512 is the operating resolution at which
        # the deepest (d=5) stage still has positive extent
        S = 512
        model = CompositionNet()
        w1 = jnp.asarray(rng.uniform(-1, 1, (1, S, S, 3)), jnp.float32)
        w2 = jnp.asarray(rng.uniform(-1, 1, (1, S, S, 3)), jnp.float32)
        m1 = jnp.ones((1, S, S, 1), jnp.float32)
        m2 = jnp.ones((1, S, S, 1), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), w1, w2, m1, m2)
        out = model.apply(params, w1, w2, m1, m2)
        assert out.shape == (1, S, S, 1)
        assert (np.asarray(out) >= 0).all() and (np.asarray(out) <= 1).all()
        blend = compose_seam(out, w1, w2, m1, m2)
        assert blend["stitched_image"].shape == (1, S, S, 3)


class TestBidirectional:
    def test_matches_independent_calls(self, rng):
        """bidirectional() must produce exactly the same flows as two
        independent forward calls (shared features + transposed cost
        volume are mathematically identical)."""
        cfg = FlowFormerConfig(decoder_depth=2, encoder_depth=1)
        model = FlowFormer(cfg)
        i1 = jnp.asarray(rng.uniform(0, 255, (1, 64, 64, 3)), jnp.float32)
        i2 = jnp.asarray(rng.uniform(0, 255, (1, 64, 64, 3)), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), i1, i2)

        fwd_ref, _ = model.apply(params, i1, i2)
        bwd_ref, _ = model.apply(params, i2, i1)
        (fwd, _), (bwd, _) = model.apply(params, i1, i2,
                                         method=FlowFormer.bidirectional)
        np.testing.assert_allclose(np.asarray(fwd[-1]),
                                   np.asarray(fwd_ref[-1]), atol=2e-3)
        np.testing.assert_allclose(np.asarray(bwd[-1]),
                                   np.asarray(bwd_ref[-1]), atol=2e-3)

