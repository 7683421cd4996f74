"""Activation parity of the COST ENCODER vs the ACTUAL reference torch
modules — the most perf-rewritten module family in the repo (bias-decomposed
windows, Pallas GSA, VPU tiny-token attention, head-stack cross-attn), each
previously tested only against its own XLA twin.

Covers (reference: core/FlowFormer/PerCostFormer3/):
  - PatchEmbed (encoder.py:20-95, patch_embed='single')
  - CrossAttentionLayer 'all' (crossattentionlayer.py:7-56)
  - SelfAttentionLayer (encoder.py:127-172)
  - VerticalSelfAttentionLayer with the RPE-context twins blocks
    (encoder.py:99-125, twins.py:229-392)
  - MemoryEncoder.corr (encoder.py:359-369)
  - full CostPerceiverEncoder.forward (encoder.py:258-287)
  - full FlowFormer.forward end-to-end (transformer.py:47-65)

All weights flow through the production converters
(convert.convert_cost_perceiver / convert.convert_flowformer).
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

pytestmark = requires_reference


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def _ref_cfg(encoder_depth=2, decoder_depth=12):
    """The shipped percostformer3 sub-config (reference:
    configs/last_config.py) as an attribute namespace, minus wandb/paths."""
    return SimpleNamespace(
        pe="linear", gma="GMA", cnet="twins", fnet="twins",
        gt_r=15, r_16=-1, no_sc=False, fix_pe=False, dropout=0.0,
        use_rpe=False, H_offset=0, W_offset=0, attn_dim=128, droppath=0.0,
        pic_size=[64, 64, 64, 64], pretrain=False, no_border=True,
        query_num=30, use_patch=False, cross_attn="all", del_layers=True,
        flow_or_pe="and", mask_ratio=0.5, patch_size=8, vert_c_dim=64,
        patch_embed="single", detach_local=False,
        decoder_depth=decoder_depth, encoder_depth=encoder_depth,
        expand_factor=4, pretrain_mode=False, quater_refine=False,
        use_convertor=False, cost_heads_num=1, cost_latent_dim=128,
        cost_encoder_res=True, query_latent_dim=64, encoder_latent_dim=256,
        cost_latent_input_dim=64, cost_latent_token_num=8,
        vertical_encoder_attn="twins")


@pytest.fixture(scope="module")
def refs():
    torch.manual_seed(0)
    return {
        "enc": import_ref("core.FlowFormer.PerCostFormer3.encoder"),
        "cal": import_ref("core.FlowFormer.PerCostFormer3.crossattentionlayer"),
        "tfm": import_ref("core.FlowFormer.PerCostFormer3.transformer"),
    }


def _prefixed(module, prefix):
    return {f"{prefix}.{k}": v for k, v in module.state_dict().items()}


class TestPatchEmbed:
    def test_patch_embed_single(self, refs, rng):
        cfg = _ref_cfg()
        ref = refs["enc"].PatchEmbed(patch_size=8, in_chans=1, embed_dim=64,
                                     pe="linear", cfg=cfg).eval()
        sd = _prefixed(ref, "p")
        params = {
            "proj0": convert._convp(sd, "p.proj.0"),
            "proj1": convert._convp(sd, "p.proj.2"),
            "proj2": convert._convp(sd, "p.proj.4"),
            "ffn1": convert._convp(sd, "p.ffn_with_coord.0"),
            "ffn2": convert._convp(sd, "p.ffn_with_coord.2"),
            "norm": convert.norm_params("p.norm", sd),
        }
        # B* = 6 cost maps of 24x16 (multiple of 8) and 21x14 (odd: pad path)
        for H2, W2 in ((24, 16), (21, 14)):
            cm = rng.normal(0, 1, (6, 1, H2, W2)).astype(np.float32)
            with torch.no_grad():
                want, size = ref(_t(cm))
            got, (h3, w3) = ffm.CostMapPatchEmbed(
                ffm.FlowFormerConfig()).apply(
                {"params": params}, jnp.asarray(cm.transpose(0, 2, 3, 1)))
            assert (h3, w3) == tuple(size)
            np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                       rtol=1e-4, atol=1e-5)


class TestAttentionLayers:
    def test_cross_attention_layer_all(self, refs, rng):
        # qk_dim = v_dim = cost_latent_dim = 128; tgt = input_dim*2 = 128
        ref = refs["cal"].CrossAttentionLayer(128, 128, 128, 128,
                                              dropout=0.0).eval()
        sd = _prefixed(ref, "c")
        params = convert._attention_layer(sd, "c")
        latent = rng.normal(0, 1, (1, 8, 128)).astype(np.float32)
        tgt = rng.normal(0, 1, (12, 64, 128)).astype(np.float32)
        with torch.no_grad():
            want = ref(_t(latent), _t(tgt)).numpy()
        got = ffm.LatentCrossAttention(ffm.FlowFormerConfig()).apply(
            {"params": params}, jnp.asarray(latent), jnp.asarray(tgt))
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-4, atol=1e-5)

    def test_self_attention_layer(self, refs, rng):
        cfg = _ref_cfg()
        ref = refs["enc"].SelfAttentionLayer(128, cfg, dropout=0.0).eval()
        sd = _prefixed(ref, "s")
        params = convert._attention_layer(sd, "s")
        x = rng.normal(0, 1, (12, 8, 128)).astype(np.float32)
        with torch.no_grad():
            want = ref(_t(x)).numpy()
        got = ffm.LatentSelfAttention(ffm.FlowFormerConfig()).apply(
            {"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-4, atol=1e-5)


class TestVerticalAttention:
    def test_vertical_layer_rpe_context(self, refs, rng):
        """Covers LocallyGroupedAttnRPEContext (ws=7) AND
        GlobalSubSampleAttnRPEContext (ws=1, sr=4) through the real
        converter — the bias-decomposed window formulation and the
        channel-masked GSA math vs the reference's padded 6D partition.

        B=1: the reference's context `.repeat` TILES the batch, scrambling
        the (sample, latent) pairing at B>1 — see the quirk note in
        stitchax/models/twins.py; B=1 (its training batch size) is where
        the two semantics agree."""
        torch.manual_seed(1)
        cfg = _ref_cfg()
        ref = refs["enc"].VerticalSelfAttentionLayer(128, cfg).eval()
        sd = _prefixed(ref, "v")
        params = {
            "local_block": convert._rpe_context_block(sd, "v.local_block",
                                                      False),
            "global_block": convert._rpe_context_block(sd, "v.global_block",
                                                       True),
        }
        B, K, H1, W1 = 1, 4, 10, 9   # not ws- or sr-multiples: pad paths
        x = rng.normal(0, 1, (B * K, H1 * W1, 128)).astype(np.float32)
        ctx = rng.normal(0, 1, (B, 256, H1, W1)).astype(np.float32)
        with torch.no_grad():
            want = ref(_t(x), (H1, W1), _t(ctx)).numpy()
        got = ffm.VerticalSelfAttention(ffm.FlowFormerConfig()).apply(
            {"params": params},
            jnp.asarray(x.reshape(B * K, H1, W1, 128)),
            jnp.asarray(ctx.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(got).reshape(B * K, H1 * W1, 128), want,
            rtol=1e-3, atol=1e-4)


class TestMemoryEncoder:
    def test_corr(self, refs, rng):
        """MemoryEncoder.corr (encoder.py:359-369) vs the MXU einsum
        formulation; method reads only self.cfg, so call it unbound."""
        cfg = _ref_cfg()
        B, C, H, W = 2, 32, 5, 6
        f1 = rng.normal(0, 1, (B, C, H, W)).astype(np.float32)
        f2 = rng.normal(0, 1, (B, C, H, W)).astype(np.float32)
        stub = SimpleNamespace(cfg=cfg)
        with torch.no_grad():
            want = refs["enc"].MemoryEncoder.corr(stub, _t(f1), _t(f2))
        want = want.numpy()  # (B, heads, H, W, H, W)

        me_stub = SimpleNamespace(cfg=ffm.FlowFormerConfig())
        got = ffm.MemoryEncoder._cost_volume(
            me_stub, jnp.asarray(f1.transpose(0, 2, 3, 1)),
            jnp.asarray(f2.transpose(0, 2, 3, 1)))
        # ours: (B, H1, W1, H2, W2, heads)
        got = np.asarray(got).transpose(0, 5, 1, 2, 3, 4)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_cost_perceiver_encoder_full(self, refs, rng):
        """Whole CostPerceiverEncoder forward (encoder.py:258-287) through
        convert.convert_cost_perceiver."""
        torch.manual_seed(2)
        E = 2
        cfg = _ref_cfg(encoder_depth=E)
        ref = refs["enc"].CostPerceiverEncoder(cfg).eval()
        sd = _prefixed(ref, "cpe")
        params = convert.convert_cost_perceiver(sd, "cpe", encoder_depth=E)

        B, H1, W1, H2, W2 = 1, 4, 5, 16, 16
        cv = rng.normal(0, 1, (B, 1, H1, W1, H2, W2)).astype(np.float32)
        ctx = rng.normal(0, 1, (B, 256, H1, W1)).astype(np.float32)
        data = {}
        with torch.no_grad():
            want_x, want_patches = ref(_t(cv), data, _t(ctx))

        ours_cfg = ffm.FlowFormerConfig(encoder_depth=E)
        cv_ours = jnp.asarray(cv.transpose(0, 2, 3, 4, 5, 1))
        got_x, got_patches, (h3, w3) = ffm.CostPerceiverEncoder(
            ours_cfg).apply({"params": params}, cv_ours,
                            jnp.asarray(ctx.transpose(0, 2, 3, 1)))
        assert (h3, w3) == tuple(data["H3W3"])
        np.testing.assert_allclose(np.asarray(got_x), want_x.numpy(),
                                   rtol=1e-3, atol=1e-4)
        # ref patches: (B*, C, H3, W3); ours (B*, H3, W3, C)
        np.testing.assert_allclose(
            np.asarray(got_patches).transpose(0, 3, 1, 2),
            want_patches.numpy(), rtol=1e-3, atol=1e-4)


class TestFullFlowFormer:
    def test_full_forward(self, refs, rng):
        """End-to-end FlowFormer.forward diff (transformer.py:47-65) at
        64x64 with converted random weights and the full shipped depths
        (encoder 3, decoder 12)."""
        torch.manual_seed(4)
        cfg = _ref_cfg(encoder_depth=3, decoder_depth=12)
        ref = refs["tfm"].FlowFormer(cfg).eval()
        sd = ref.state_dict()
        params = convert.convert_flowformer(sd, encoder_depth=3)
        params = jax.tree_util.tree_map(jnp.asarray, params)

        img1 = rng.uniform(0, 255, (1, 3, 64, 64)).astype(np.float32)
        img2 = rng.uniform(0, 255, (1, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            want_up, want_lr = ref(_t(img1), _t(img2))

        model = ffm.FlowFormer(ffm.FlowFormerConfig())
        preds, lr = model.apply(
            params, jnp.asarray(img1.transpose(0, 2, 3, 1)),
            jnp.asarray(img2.transpose(0, 2, 3, 1)))
        got_up = np.asarray(preds[-1]).transpose(0, 3, 1, 2)
        got_lr = np.asarray(lr).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got_lr, want_lr.numpy(),
                                   rtol=1e-3, atol=2e-3)
        np.testing.assert_allclose(got_up, want_up.numpy(),
                                   rtol=1e-3, atol=2e-3)
