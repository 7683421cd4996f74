"""Activation parity vs the ACTUAL reference FlowFormer (PerCostFormer3)
torch modules: gru.py / gma.py / attention.py / decoder.encode_flow_token.

Each test random-inits the reference module, converts its state dict with
the same stitchax/convert.py helpers the checkpoint converter uses, and
asserts our flax module reproduces the torch outputs — the activation-level
converter check that synthetic-dict structure tests can't provide
(SURVEY.md §7.3 item 5).
"""

from types import SimpleNamespace

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ref_loader import import_ref, requires_reference

from stitchax import convert
from stitchax.models import flowformer as ffm
from stitchax.models import layers as ffl

pytestmark = requires_reference

ARGS = SimpleNamespace(r_16=-1, cost_heads_num=1, query_latent_dim=64)


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def _nchw(x):
    return np.asarray(x).transpose(0, 3, 1, 2)


def _nhwc(x):
    return _t(x).permute(0, 2, 3, 1).numpy()


@pytest.fixture(scope="module")
def refs():
    torch.manual_seed(0)
    return {
        "gru": import_ref("core.FlowFormer.PerCostFormer3.gru"),
        "gma": import_ref("core.FlowFormer.PerCostFormer3.gma"),
        "att": import_ref("core.FlowFormer.PerCostFormer3.attention"),
        "dec": import_ref("core.FlowFormer.PerCostFormer3.decoder"),
    }


def _prefixed(module, prefix):
    return {f"{prefix}.{k}": v for k, v in module.state_dict().items()}


class TestGRU:
    def test_sepconv_gru(self, refs, rng):
        ref = refs["gru"].SepConvGRU(hidden_dim=128,
                                     input_dim=128 + 128 + 128).eval()
        sd = _prefixed(ref, "g")
        params = {n: convert._convp(sd, f"g.{n}")
                  for n in ("convz1", "convr1", "convq1",
                            "convz2", "convr2", "convq2")}

        h = rng.normal(0, 1, (2, 128, 10, 12)).astype(np.float32)
        x = rng.normal(0, 1, (2, 384, 10, 12)).astype(np.float32)
        with torch.no_grad():
            want = ref(_t(h), _t(x)).numpy()
        got = ffm.SepConvGRU().apply({"params": params},
                                     jnp.asarray(_nhwc(h)),
                                     jnp.asarray(_nhwc(x)))
        np.testing.assert_allclose(_nchw(got), want, rtol=1e-4, atol=1e-5)

    def test_flow_head(self, refs, rng):
        ref = refs["gru"].FlowHead(input_dim=128, hidden_dim=256).eval()
        sd = _prefixed(ref, "f")
        params = {"conv1": convert._convp(sd, "f.conv1"),
                  "conv2": convert._convp(sd, "f.conv2")}
        x = rng.normal(0, 1, (2, 128, 9, 11)).astype(np.float32)
        with torch.no_grad():
            want = ref(_t(x)).numpy()
        got = ffm.FlowHead().apply({"params": params},
                                   jnp.asarray(_nhwc(x)))
        np.testing.assert_allclose(_nchw(got), want, rtol=1e-4, atol=1e-5)

    def test_basic_motion_encoder(self, refs, rng):
        ref = refs["gru"].BasicMotionEncoder(ARGS).eval()
        sd = _prefixed(ref, "e")
        params = {n: convert._convp(sd, f"e.{n}")
                  for n in ("convc1", "convc2", "convf1", "convf2", "conv")}
        corr_ch = 81 * ARGS.cost_heads_num + ARGS.query_latent_dim
        flow = rng.normal(0, 2, (2, 2, 8, 10)).astype(np.float32)
        corr = rng.normal(0, 1, (2, corr_ch, 8, 10)).astype(np.float32)
        with torch.no_grad():
            want = ref(_t(flow), _t(corr)).numpy()
        got = ffm.BasicMotionEncoder(ffm.FlowFormerConfig()).apply(
            {"params": params}, jnp.asarray(_nhwc(flow)),
            jnp.asarray(_nhwc(corr)))
        np.testing.assert_allclose(_nchw(got), want, rtol=1e-4, atol=1e-5)


class TestGMA:
    # 8x9 = 72 tokens takes GmaAttention's dense path; 32x64 = 2048 the
    # blocked build with exact 1024-row chunks; 40x40 = 1600 the blocked
    # build's chunks-plus-remainder path
    @pytest.mark.parametrize("shape", [(2, 128, 8, 9), (1, 128, 32, 64),
                                       (1, 128, 40, 40)])
    def test_attention(self, refs, rng, shape):
        ref = refs["gma"].Attention(args=ARGS, dim=128, max_pos_size=64,
                                    heads=1, dim_head=128).eval()
        sd = _prefixed(ref, "a")
        params = {"to_qk": convert._convp(sd, "a.to_qk")}
        fmap = rng.normal(0, 1, shape).astype(np.float32)
        with torch.no_grad():
            want = ref(_t(fmap)).numpy()  # (B, 1, N, N)
        got = ffm.GmaAttention().apply({"params": params},
                                       jnp.asarray(_nhwc(fmap)))
        np.testing.assert_allclose(np.asarray(got), want[:, 0],
                                   rtol=1e-4, atol=1e-5)

    def test_aggregate(self, refs, rng):
        ref = refs["gma"].Aggregate(args=ARGS, dim=128, heads=1,
                                    dim_head=128).eval()
        with torch.no_grad():
            ref.gamma += 0.37  # nonzero gate so the path is exercised
        sd = _prefixed(ref, "a")
        params = {"to_v": convert._convp(sd, "a.to_v"),
                  "gamma": convert._np(sd["a.gamma"])}
        fmap = rng.normal(0, 1, (2, 128, 8, 9)).astype(np.float32)
        attn = rng.uniform(0, 1, (2, 1, 72, 72)).astype(np.float32)
        attn /= attn.sum(-1, keepdims=True)
        with torch.no_grad():
            want = ref(_t(attn), _t(fmap)).numpy()
        got = ffm.GmaAggregate().apply({"params": params},
                                       jnp.asarray(attn[:, 0]),
                                       jnp.asarray(_nhwc(fmap)))
        np.testing.assert_allclose(_nchw(got), want, rtol=1e-4, atol=1e-5)

    def test_gma_update_block(self, refs, rng):
        ref = refs["gru"].GMAUpdateBlock(ARGS, hidden_dim=128).eval()
        with torch.no_grad():
            ref.aggregator.gamma += 0.25
        sd = _prefixed(ref, "u")
        params = {
            "encoder": {n: convert._convp(sd, f"u.encoder.{n}")
                        for n in ("convc1", "convc2", "convf1", "convf2",
                                  "conv")},
            "gru": {n: convert._convp(sd, f"u.gru.{n}")
                    for n in ("convz1", "convr1", "convq1",
                              "convz2", "convr2", "convq2")},
            "flow_head": {n: convert._convp(sd, f"u.flow_head.{n}")
                          for n in ("conv1", "conv2")},
            "aggregator": {
                "to_v": convert._convp(sd, "u.aggregator.to_v"),
                "gamma": convert._np(sd["u.aggregator.gamma"]),
            },
        }
        mask_params = {"mask1": convert._convp(sd, "u.mask.0"),
                       "mask2": convert._convp(sd, "u.mask.2")}
        H, W = 8, 10
        corr_ch = 81 + 64
        net = rng.normal(0, 1, (1, 128, H, W)).astype(np.float32)
        inp = rng.normal(0, 1, (1, 128, H, W)).astype(np.float32)
        corr = rng.normal(0, 1, (1, corr_ch, H, W)).astype(np.float32)
        flow = rng.normal(0, 2, (1, 2, H, W)).astype(np.float32)
        attn = rng.uniform(0, 1, (1, 1, H * W, H * W)).astype(np.float32)
        attn /= attn.sum(-1, keepdims=True)
        with torch.no_grad():
            w_net, w_mask, w_flow = ref(_t(net), _t(inp), _t(corr),
                                        _t(flow), _t(attn))
        g_net, g_flow = ffm.GMAUpdateBlock(
            ffm.FlowFormerConfig()).apply(
            {"params": params}, jnp.asarray(_nhwc(net)),
            jnp.asarray(_nhwc(inp)), jnp.asarray(_nhwc(corr)),
            jnp.asarray(_nhwc(flow)), jnp.asarray(attn[:, 0]))
        # the upsample-mask branch lives in MaskHead at the decoder level
        g_mask = ffm.MaskHead().apply({"params": mask_params}, g_net)
        np.testing.assert_allclose(_nchw(g_net), w_net.numpy(),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(_nchw(g_mask), w_mask.numpy(),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(_nchw(g_flow), w_flow.numpy(),
                                   rtol=1e-4, atol=1e-4)


class TestAttention:
    def test_multi_head_attention(self, refs, rng):
        ref = refs["att"].MultiHeadAttention(dim=128, heads=8).eval()
        q = rng.normal(0, 1, (3, 5, 128)).astype(np.float32)
        k = rng.normal(0, 1, (3, 17, 128)).astype(np.float32)
        v = rng.normal(0, 1, (3, 17, 128)).astype(np.float32)
        with torch.no_grad():
            want = ref(_t(q), _t(k), _t(v)).numpy()
        got = ffl.multi_head_attention(jnp.asarray(q), jnp.asarray(k),
                                       jnp.asarray(v), heads=8)
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-4, atol=1e-5)

    def test_linear_position_embedding_sine(self, refs, rng):
        x = rng.normal(0, 10, (2, 7, 2)).astype(np.float32)
        want = refs["att"].LinearPositionEmbeddingSine(_t(x), dim=128).numpy()
        got = ffl.linear_position_embedding_sine(jnp.asarray(x), dim=128)
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-4, atol=1e-5)

    def test_exp_position_embedding_sine(self, refs, rng):
        x = rng.normal(0, 3, (2, 7, 2)).astype(np.float32)
        want = refs["att"].ExpPositionEmbeddingSine(_t(x), dim=128).numpy()
        got = ffl.exp_position_embedding_sine(jnp.asarray(x), dim=128)
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-4, atol=1e-5)


class TestDecoderLookup:
    def test_encode_flow_token(self, refs, rng):
        """Reference method vs both our gather oracle and the selector-
        matmul hot path (decoder.py:242-260). The method reads no self
        state, so call it unbound."""
        B, H1, W1, H2, W2 = 1, 5, 6, 14, 16
        cm = rng.normal(0, 1, (B * H1 * W1, 1, H2, W2)).astype(np.float32)
        coords = rng.uniform(2, 11, (B, 2, H1, W1)).astype(np.float32)

        with torch.no_grad():
            want = refs["dec"].MemoryDecoder.encode_flow_token(
                None, _t(cm), _t(coords), r=4).numpy()  # (B, 81, H1, W1)

        cm_ours = jnp.asarray(
            cm.reshape(B, H1, W1, 1, H2, W2).transpose(0, 1, 2, 4, 5, 3))
        coords_ours = jnp.asarray(coords.transpose(0, 2, 3, 1))
        got_fast = ffm.encode_flow_token(cm_ours, coords_ours, r=4)
        got_gather = ffm.encode_flow_token_gather(cm_ours, coords_ours, r=4)
        for got in (got_fast, got_gather):
            np.testing.assert_allclose(
                np.asarray(got).transpose(0, 3, 1, 2), want,
                rtol=1e-4, atol=1e-5)
