"""Activation parity of the twins-SVT feature encoder vs the ACTUAL
reference implementation.

The reference's encoders.twins_svt_large wraps timm's model as `self.svt`
(core/FlowFormer/encoders.py:7-40); our refstub timm.create_model returns
the reference's own Twins class (core/FlowFormer/PerCostFormer3/twins.py —
the same architecture the timm weights load into), so this exercises the
real checkpoint key layout (`....svt.patch_embeds...`) end to end through
convert.convert_twins_svt.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ref_loader import import_ref, requires_reference

from stitchax import convert
from stitchax.models.twins import TwinsSVT

pytestmark = requires_reference


def test_twins_svt_large_stages12(rng):
    torch.manual_seed(3)
    enc = import_ref("core.FlowFormer.encoders")
    ref = enc.twins_svt_large(pretrained=False, del_layers=True).eval()

    sd = {f"enc.{k}": v for k, v in ref.state_dict().items()}
    assert "enc.svt.patch_embeds.0.proj.weight" in sd  # real nesting
    params = jax.tree_util.tree_map(
        jnp.asarray, convert.convert_twins_svt(sd, "enc"))

    S = 112
    x = rng.normal(0, 1, (1, 3, S, S)).astype(np.float32)
    with torch.no_grad():
        w_map, w_16 = ref(torch.from_numpy(x))
    # both returns are NCHW maps (the loop reshapes before the layer-2
    # break, encoders.py:32-40)
    want = w_map.numpy().transpose(0, 2, 3, 1)
    want16 = w_16.numpy().transpose(0, 2, 3, 1)

    got, got16 = TwinsSVT().apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got16), want16,
                               rtol=1e-3, atol=1e-4)
