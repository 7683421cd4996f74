"""Activation parity vs the ACTUAL reference UDIS2 torch networks
(core/UDIS2/{Homography,Composition}/network.py), through the real
checkpoint converters (convert_udis2_homography / convert_composition).

The homography net runs at its operating 512 resolution (the torch
regression head's 4096-wide FC hard-codes it); the composition net at 448,
the smallest size its dilated-conv shrink quirk survives.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ref_loader import import_ref, requires_reference

from stitchax import convert
from stitchax.models import CompositionNet, UDIS2HomographyNet, compose_seam

pytestmark = requires_reference


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def _nhwc(x):
    return np.asarray(x).transpose(0, 2, 3, 1)


class TestComposition:
    def test_network_and_blend(self, rng):
        refmod = import_ref("core.UDIS2.Composition.network")
        torch.manual_seed(1)
        ref = refmod.Network().eval()
        variables = jax.tree_util.tree_map(
            jnp.asarray, convert.convert_composition(ref.state_dict()))

        S = 448
        w1 = rng.uniform(-1, 1, (1, 3, S, S)).astype(np.float32)
        w2 = rng.uniform(-1, 1, (1, 3, S, S)).astype(np.float32)
        m1 = (rng.random((1, 1, S, S)) < 0.7).astype(np.float32)
        m2 = (rng.random((1, 1, S, S)) < 0.7).astype(np.float32)

        with torch.no_grad():
            want = refmod.build_model(ref, _t(w1), _t(w2), _t(m1), _t(m2))

        net = CompositionNet()
        args = [jnp.asarray(_nhwc(a)) for a in (w1, w2, m1, m2)]
        out = jax.jit(net.apply)(variables, *args)
        got = compose_seam(out, *args)

        for k in ("learned_mask1", "learned_mask2", "stitched_image"):
            np.testing.assert_allclose(
                _nhwc(want[k].numpy()), np.asarray(got[k]),
                rtol=1e-3, atol=5e-4, err_msg=k)


class TestHomography:
    def test_offsets(self, rng):
        refmod = import_ref("core.UDIS2.Homography.network")
        torch.manual_seed(2)
        ref = refmod.UDIS2Network(only_homo=True).eval()
        variables = jax.tree_util.tree_map(
            jnp.asarray, convert.convert_udis2_homography(ref.state_dict()))

        S = 512
        i1 = rng.uniform(-1, 1, (1, 3, S, S)).astype(np.float32)
        i2 = rng.uniform(-1, 1, (1, 3, S, S)).astype(np.float32)
        with torch.no_grad():
            want, _ = ref(_t(i1), _t(i2))

        net = UDIS2HomographyNet()
        got = jax.jit(lambda v, a, b: net.apply(v, a, b))(
            variables, jnp.asarray(_nhwc(i1)), jnp.asarray(_nhwc(i2)))
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   rtol=1e-3, atol=2e-3)
