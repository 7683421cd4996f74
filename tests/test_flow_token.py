"""Parity: windowed encode_flow_token (and the row-take variant) vs the
gather-based oracle."""

import numpy as np
import jax.numpy as jnp

from stitchax.models.flowformer import (encode_flow_token,
                                        encode_flow_token_gather,
                                        encode_flow_token_rowtake)


def test_windowed_matches_gather(rng):
    B, H1, W1, H2, W2, heads = 1, 6, 7, 16, 18, 2
    cm = jnp.asarray(rng.standard_normal((B, H1, W1, H2, W2, heads)),
                     jnp.float32)
    # coords include in-range, near-border, and far out-of-range points
    coords = jnp.asarray(rng.uniform(-12, 28, (B, H1, W1, 2)), jnp.float32)
    a = np.asarray(encode_flow_token_gather(cm, coords, r=4))
    b = np.asarray(encode_flow_token(cm, coords, r=4))
    np.testing.assert_allclose(b, a, atol=2e-5)
    c = np.asarray(encode_flow_token_rowtake(cm, coords, r=4))
    np.testing.assert_allclose(c, a, atol=2e-5)


def test_windowed_matches_gather_r1(rng):
    cm = jnp.asarray(rng.standard_normal((2, 3, 3, 8, 8, 1)), jnp.float32)
    coords = jnp.asarray(rng.uniform(-3, 10, (2, 3, 3, 2)), jnp.float32)
    a = np.asarray(encode_flow_token_gather(cm, coords, r=1))
    b = np.asarray(encode_flow_token(cm, coords, r=1))
    np.testing.assert_allclose(b, a, atol=2e-5)
