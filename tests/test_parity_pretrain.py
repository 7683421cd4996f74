"""MAE pretrain-path activation parity vs the ACTUAL reference modules:
random_masking (encoder.py:218-256), CostPerceiverEncoder.pretrain_forward
(encoder.py:289-326), the full FlowFormer.pretrain_forward loss
(transformer.py:67-86 + decoder.py:346-439 gt_r branch), and the
GroupAttnRPEContext shifted-group attention (twins.py:64-151).

Randomness is injected on both sides: the reference accepts masking noise
via its `mask` argument, and its inline torch.rand query draws are
monkeypatched to pop pre-drawn arrays.
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
from stitchax.models import twins as tw

pytestmark = requires_reference


def _pretrain_cfg(**over):
    from test_parity_perceiver import _ref_cfg
    cfg = _ref_cfg(encoder_depth=over.pop("encoder_depth", 3))
    cfg.pretrain_mode = True
    cfg.crop_cost_volume = False
    cfg.pic_size = [128, 128, 128, 128]
    cfg.query_num = over.pop("query_num", 2)
    for k, v in over.items():
        setattr(cfg, k, v)
    return cfg


def _our_cfg(cfg):
    return ffm.FlowFormerConfig(
        encoder_depth=cfg.encoder_depth, decoder_depth=cfg.decoder_depth,
        mask_ratio=cfg.mask_ratio, gt_r=cfg.gt_r, query_num=cfg.query_num,
        no_border=cfg.no_border)


@pytest.fixture(scope="module")
def refs():
    torch.manual_seed(0)
    return {
        "enc": import_ref("core.FlowFormer.PerCostFormer3.encoder"),
        "twn": import_ref("core.FlowFormer.PerCostFormer3.twins"),
        "tfm": import_ref("core.FlowFormer.PerCostFormer3.transformer"),
    }


def _prefixed(module, prefix):
    return {f"{prefix}.{k}": v for k, v in module.state_dict().items()}


class TestRandomMasking:
    def test_masks_and_ids(self, refs, rng):
        cfg = _pretrain_cfg()
        cpe = refs["enc"].CostPerceiverEncoder(cfg).eval()
        B, H2, W2 = 6, 16, 16
        L = (H2 // 8) * (W2 // 8)
        noise = rng.uniform(0, 1, (B, L)).astype(np.float32)
        x = torch.zeros(B, 1, H2, W2)
        with torch.no_grad():
            (ids_keep, mask_keys, m1, m2, m3, ids_restore) = \
                cpe.random_masking(x, cfg.mask_ratio,
                                   mask=torch.from_numpy(noise))
        g_keep, g_keys, (g1, g2, g3) = ffm.random_masking(
            jnp.asarray(noise), H2, W2, 8, cfg.mask_ratio)
        np.testing.assert_array_equal(np.asarray(g_keep), ids_keep.numpy())
        np.testing.assert_array_equal(np.asarray(g_keys), mask_keys.numpy())
        for got, want in ((g1, m1), (g2, m2), (g3, m3)):
            np.testing.assert_array_equal(
                np.asarray(got)[..., 0], want.numpy()[:, 0])


class TestGroupAttn:
    def test_group_attn_rpe_context(self, refs, rng):
        """Dead code in the reference (no Block(groupattention=True) call
        site; its own K%5 assert fails under the shipped K=8) — rebuilt
        and pinned standalone. B0=1 avoids the context tile-vs-repeat
        quirk (see stitchax/models/twins.py)."""
        torch.manual_seed(5)
        cfg = SimpleNamespace(cost_latent_token_num=5)
        ref = refs["twn"].GroupAttnRPEContext(
            128, 8, 0.0, 0.0, 7, cfg, 64).eval()
        sd = _prefixed(ref, "g")
        params = {n: convert._lin(sd, f"g.{n}")
                  for n in ("context_proj", "q", "k", "v", "proj")}
        B, H, W = 5, 10, 9
        x = rng.normal(0, 1, (B, H * W, 128)).astype(np.float32)
        ctx = rng.normal(0, 1, (1, 256, H, W)).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(x), (H, W),
                       torch.from_numpy(ctx)).numpy()
        got = tw.GroupAttnRPEContext(128, 8, ws=7, vert_c_dim=64).apply(
            {"params": params}, jnp.asarray(x.reshape(B, H, W, 128)),
            jnp.asarray(ctx.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(got).reshape(B, H * W, 128), want,
            rtol=1e-3, atol=1e-4)


class TestPerceiverPretrain:
    def test_cost_perceiver_pretrain_forward(self, refs, rng):
        torch.manual_seed(6)
        E = 2
        cfg = _pretrain_cfg(encoder_depth=E)
        ref = refs["enc"].CostPerceiverEncoder(cfg).eval()
        sd = _prefixed(ref, "cpe")
        params = convert.convert_cost_perceiver(sd, "cpe", encoder_depth=E)

        B, H1, W1, H2, W2 = 1, 4, 4, 16, 16
        cv_outer = rng.normal(0, 1, (B, 1, H1, W1, H2, W2)).astype(
            np.float32)
        cv_inner = rng.normal(0, 1, (B, 1, H1, W1, H2, W2)).astype(
            np.float32)
        ctx = rng.normal(0, 1, (B, 256, H1, W1)).astype(np.float32)
        L = (H2 // 8) * (W2 // 8)
        noise = rng.uniform(0, 1, (B * H1 * W1, L)).astype(np.float32)
        data = {}
        with torch.no_grad():
            want_x, want_patches = ref.pretrain_forward(
                torch.from_numpy(cv_outer), torch.from_numpy(cv_inner),
                data, torch.from_numpy(ctx),
                mask=torch.from_numpy(noise))

        ours = ffm.CostPerceiverEncoder(_our_cfg(cfg))
        got_x, got_patches, _ = ours.apply(
            {"params": params},
            jnp.asarray(cv_inner.transpose(0, 2, 3, 4, 5, 1)),
            jnp.asarray(ctx.transpose(0, 2, 3, 1)),
            jnp.asarray(noise), method=ffm.CostPerceiverEncoder.pretrain)
        np.testing.assert_allclose(np.asarray(got_x), want_x.numpy(),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(got_patches).transpose(0, 3, 1, 2),
            want_patches.numpy(), rtol=1e-3, atol=1e-4)


class TestFullPretrain:
    def test_pretrain_loss(self, refs, rng, monkeypatch):
        """Full pretrain loss diff at 128x128 (the smallest size where
        mask_ratio=0.5 keeps at least one cost patch per map)."""
        torch.manual_seed(7)
        cfg = _pretrain_cfg(query_num=2)
        ref = refs["tfm"].FlowFormer(cfg).eval()
        sd = ref.state_dict()
        params = jax.tree_util.tree_map(
            jnp.asarray, convert.convert_flowformer(sd, encoder_depth=3))

        S = 128
        img1 = rng.uniform(0, 255, (1, 3, S, S)).astype(np.float32)
        img2 = rng.uniform(0, 255, (1, 3, S, S)).astype(np.float32)
        H1 = W1 = S // 8
        L = ((S // 8) // 8) ** 2
        noise = rng.uniform(0, 1, (H1 * W1, L)).astype(np.float32)
        # pre-drawn query uniforms, popped by the torch.rand patch
        queries = [rng.uniform(0, 1, (1, 2, H1, W1)).astype(np.float32)
                   for _ in range(cfg.query_num)]
        queue = [torch.from_numpy(q) for q in queries]
        real_rand = torch.rand

        def fake_rand(*shape, **kw):
            if (len(shape) == 4 and shape[1] == 2
                    and shape[2:] == (H1, W1) and queue):
                return queue.pop(0)
            return real_rand(*shape, **kw)

        monkeypatch.setattr(torch, "rand", fake_rand)
        with torch.no_grad():
            want = ref(torch.from_numpy(img1), torch.from_numpy(img2),
                       mask=torch.from_numpy(noise))
        assert not queue, "reference consumed fewer queries than drawn"

        model = ffm.FlowFormerPretrain(_our_cfg(cfg))
        qn = jnp.asarray(np.stack(queries).transpose(0, 1, 3, 4, 2))
        got = model.apply(params, jnp.asarray(img1.transpose(0, 2, 3, 1)),
                          jnp.asarray(img2.transpose(0, 2, 3, 1)),
                          jnp.asarray(noise), qn)
        np.testing.assert_allclose(float(got), float(want),
                                   rtol=2e-3, atol=2e-3)
