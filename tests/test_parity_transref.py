"""Activation parity vs the ACTUAL vendored TransRef torch model
(core/inference/mix_methods/utils/TransRef/models/): the full
TransRef_Base forward through convert.convert_transref, plus the VGG16
perceptual-feature extractor through convert_vgg16_features.

mmcv's CUDA DeformConv2d is stubbed with a pure-torch implementation of the
same semantics (tests/refstubs/mmcv/) since mmcv is not installed.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ref_loader import import_transref, requires_reference

from stitchax import convert
from stitchax.models.transref import TransRefBase
from stitchax.models.vgg import VGG16Features, convert_vgg16_features

pytestmark = requires_reference


def test_transref_base_full_forward(rng):
    torch.manual_seed(4)
    trmod = import_transref("models.TransRef")
    ref = trmod.TransRef_Base().eval()
    params = jax.tree_util.tree_map(
        jnp.asarray, convert.convert_transref(ref.state_dict()))

    S = 256
    detail = rng.uniform(-1, 1, (1, 3, S, S)).astype(np.float32)
    refimg = rng.uniform(-1, 1, (1, 3, S, S)).astype(np.float32)
    mask = (rng.random((1, 1, S, S)) < 0.3).astype(np.float32)

    x = np.concatenate([detail, np.broadcast_to(1.0 - mask,
                                                detail.shape)], 1)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(refimg)).numpy()

    got = jax.jit(TransRefBase().apply)(
        params,
        jnp.asarray(detail.transpose(0, 2, 3, 1)),
        jnp.asarray(mask.transpose(0, 2, 3, 1)),
        jnp.asarray(refimg.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-3, atol=2e-3)


def test_vgg16_feature_parity(rng):
    torch.manual_seed(5)
    loss_mod = import_transref("models.loss")
    ref = loss_mod.VGG16().eval()

    # rebuild the underlying torchvision `features.*` dict from the sliced
    # blocks (each submodule keeps the original Sequential indices)
    sd = {}
    for blk in ref.children():
        for idx, m in blk.named_children():
            for pname, p in m.state_dict().items():
                sd[f"features.{idx}.{pname}"] = p
    variables = jax.tree_util.tree_map(jnp.asarray,
                                       convert_vgg16_features(sd))

    x = rng.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x))
    got = VGG16Features().apply(variables,
                                jnp.asarray(x.transpose(0, 2, 3, 1)))
    # relu5_2/relu5_3 included: the reference reuses its relu5_1 block
    # for them (loss.py:96-97, an upstream bug) and StyleLoss consumes
    # relu5_2 — VGG16Features reproduces the quirk exactly
    for layer in ("relu1_1", "relu1_2", "relu2_1", "relu2_2", "relu3_1",
                  "relu3_2", "relu3_3", "relu4_1", "relu4_2", "relu4_3",
                  "relu5_1", "relu5_2", "relu5_3"):
        np.testing.assert_allclose(
            np.asarray(got[layer]).transpose(0, 3, 1, 2),
            want[layer].numpy(), rtol=1e-4, atol=1e-4, err_msg=layer)


def test_loss_value_parity(rng):
    """Executed loss VALUES vs the reference PerceptualLoss/StyleLoss
    classes (loss.py:122-180), same random VGG weights both sides —
    pins the Gram normalization, the layer selection (incl. the buggy
    relu5_2), and the raw [-1,1] input convention."""
    torch.manual_seed(6)
    loss_mod = import_transref("models.loss")
    # the reference classes call .cuda() in __init__ (loss.py:131,165);
    # no-op it on this CPU-only host
    import torch.nn as tnn
    orig_cuda = tnn.Module.cuda
    tnn.Module.cuda = lambda self, *a, **k: self
    try:
        ref_style = loss_mod.StyleLoss().eval()
        ref_perc = loss_mod.PerceptualLoss().eval()
    finally:
        tnn.Module.cuda = orig_cuda

    def to_variables(vgg_module):
        sd = {}
        for blk in vgg_module.children():
            for idx, m in blk.named_children():
                for pname, p in m.state_dict().items():
                    sd[f"features.{idx}.{pname}"] = p
        return jax.tree_util.tree_map(jnp.asarray,
                                      convert_vgg16_features(sd))

    x = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want_style = float(ref_style(torch.from_numpy(x),
                                     torch.from_numpy(y)))
        want_perc = float(ref_perc(torch.from_numpy(x),
                                   torch.from_numpy(y)))

    from stitchax.models import perceptual_loss, style_loss

    model = VGG16Features()
    variables = to_variables(ref_style.vgg)
    fx = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    variables_p = to_variables(ref_perc.vgg)
    fy = model.apply(variables, jnp.asarray(y.transpose(0, 2, 3, 1)))
    got_style = float(style_loss(fx, fy))
    fxp = model.apply(variables_p, jnp.asarray(x.transpose(0, 2, 3, 1)))
    fyp = model.apply(variables_p, jnp.asarray(y.transpose(0, 2, 3, 1)))
    got_perc = float(perceptual_loss(fxp, fyp))

    np.testing.assert_allclose(got_style, want_style, rtol=1e-4)
    np.testing.assert_allclose(got_perc, want_perc, rtol=1e-4)
