"""Auxiliary model/op tests: TransRef, quater upsampler, VGG losses,
InputPadder, neighborhood-attention flax usage."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


class TestTransRef:
    def test_forward_shapes(self, rng):
        from stitchax.models import TransRefBase
        # 256 is the smallest size where the RefPA offset estimator's three
        # stride-2 downsamples survive at stage 3 (1/16 res)
        S = 256
        model = TransRefBase()
        d = jnp.asarray(rng.uniform(-1, 1, (1, S, S, 3)), jnp.float32)
        m = jnp.zeros((1, S, S, 1), jnp.float32).at[:, 80:160, 80:160].set(1.0)
        params = model.init(jax.random.PRNGKey(0), d, m, d)
        out = model.apply(params, d, m, d)
        assert out.shape == (1, S, S, 3)
        o = np.asarray(out)
        assert np.isfinite(o).all() and o.min() >= -1 and o.max() <= 1


class TestQuaterUpsampler:
    def test_shapes(self, rng):
        from stitchax.models import QuaterUpsampler
        B, H, W, C = 1, 64, 64, 32
        flow_lr = jnp.asarray(rng.standard_normal((B, H // 8, W // 8, 2)),
                              jnp.float32)
        f1 = jnp.asarray(rng.standard_normal((B, H // 4, W // 4, C)),
                         jnp.float32)
        f2 = jnp.asarray(rng.standard_normal((B, H // 4, W // 4, C)),
                         jnp.float32)
        model = QuaterUpsampler()
        params = model.init(jax.random.PRNGKey(0), flow_lr, f1, f2)
        out = model.apply(params, flow_lr, f1, f2)
        assert out.shape == (B, H, W, 2)


class TestVGGLosses:
    def test_losses_positive_and_zero_at_identity(self, rng):
        from stitchax.models import (VGG16Features, perceptual_loss,
                                     style_loss)
        model = VGG16Features()
        x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
        y = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x)
        fx = model.apply(params, x)
        fy = model.apply(params, y)
        assert float(perceptual_loss(fx, fx)) == 0.0
        assert float(style_loss(fx, fx)) == 0.0
        assert float(perceptual_loss(fx, fy)) > 0.0
        assert float(style_loss(fx, fy)) > 0.0
        assert set(fx) >= {"relu1_1", "relu2_2", "relu3_3", "relu4_3",
                           "relu5_2"}

    def test_vgg_converter_structure(self, rng):
        from stitchax.models import VGG16Features
        from stitchax.models.vgg import convert_vgg16_features, VGG16_LAYOUT
        sd = {}
        idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
        cin = 3
        for (name, ch, _), i in zip(VGG16_LAYOUT, idx):
            sd[f"features.{i}.weight"] = rng.standard_normal(
                (ch, cin, 3, 3)).astype(np.float32) * 0.05
            sd[f"features.{i}.bias"] = np.zeros(ch, np.float32)
            cin = ch
        variables = jax.tree_util.tree_map(jnp.asarray,
                                           convert_vgg16_features(sd))
        model = VGG16Features()
        ref = model.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 64, 64, 3), jnp.float32))
        ref_keys = {jax.tree_util.keystr(p): v.shape for p, v in
                    jax.tree_util.tree_leaves_with_path(ref)}
        got_keys = {jax.tree_util.keystr(p): v.shape for p, v in
                    jax.tree_util.tree_leaves_with_path(variables)}
        assert ref_keys == got_keys


class TestInputPadder:
    def test_pad_unpad_roundtrip(self, rng):
        from stitchax.ops.padding import InputPadder
        x = jnp.asarray(rng.standard_normal((1, 30, 45, 3)), jnp.float32)
        for mode in ("sintel", "downzero", "kitti"):
            p = InputPadder(x.shape, mode=mode)
            (xp,) = p.pad(x)
            assert xp.shape[1] % 8 == 0 and xp.shape[2] % 8 == 0
            np.testing.assert_array_equal(np.asarray(p.unpad(xp)),
                                          np.asarray(x))


class TestNAVariant:
    def test_flowformer_na_vertical(self, rng):
        import jax
        import jax.numpy as jnp
        from stitchax.models import FlowFormer, FlowFormerConfig
        cfg = FlowFormerConfig(decoder_depth=1, encoder_depth=1,
                               vertical_encoder_attn="NA")
        model = FlowFormer(cfg)
        img = jnp.asarray(rng.uniform(0, 255, (1, 64, 64, 3)), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), img, img)
        preds, _ = model.apply(params, img, img)
        assert preds[-1].shape == (1, 64, 64, 2)
        import numpy as np
        assert np.isfinite(np.asarray(preds[-1])).all()


class TestDiffusionUNet:
    def test_tiny_unet_and_controlnet(self, rng):
        """Regression: duplicate-sibling norm names made the SD UNet
        uninstantiable. Tiny config forward + full DDIM scan loop."""
        import jax
        import jax.numpy as jnp
        from stitchax.models.diffusion import (ControlNet, UNet2DCondition,
                                               UNetConfig,
                                               make_inpaint_denoiser)
        cfg = UNetConfig(block_channels=(32, 64), layers_per_block=1,
                         attention_resolutions=(1,), context_dim=16,
                         num_heads=2)
        unet = UNet2DCondition(cfg)
        ctrl = ControlNet(cfg)
        lat = jnp.zeros((1, 16, 16, 9), jnp.float32)
        t = jnp.zeros((1,), jnp.float32)
        ctx = jnp.zeros((1, 7, 16), jnp.float32)
        cimg = jnp.zeros((1, 128, 128, 3), jnp.float32)
        k = jax.random.PRNGKey(0)
        # the ControlNet sees bare 4-channel latents; the 9-channel concat
        # feeds only the inpaint UNet (diffusers pipeline semantics)
        cp = jax.jit(ctrl.init)(k, lat[..., :4], t, ctx, cimg)
        res, mid = ctrl.apply(cp, lat[..., :4], t, ctx, cimg)
        up = jax.jit(unet.init)(k, lat, t, ctx, res, mid)
        eps = unet.apply(up, lat, t, ctx, res, mid)
        assert eps.shape == (1, 16, 16, 4)
        assert np.isfinite(np.asarray(eps)).all()

        denoise = make_inpaint_denoiser(
            lambda l, tt, cc, r, m: unet.apply(up, l, tt, cc, r, m),
            lambda l, tt, cc, ci: ctrl.apply(cp, l, tt, cc, ci),
            ctx, num_steps=2)
        out = jax.jit(denoise)(lat[..., 4:5], lat[..., 5:9],
                               cimg, lat[..., 0:4])
        assert out.shape == (1, 16, 16, 4)
        assert np.isfinite(np.asarray(out)).all()


class TestTransRefTrainer:
    def test_masks_and_input_prep(self, rng):
        import jax
        import jax.numpy as jnp
        from stitchax.train.transref_trainer import (prepare_inputs,
                                                     random_rect_masks)
        mask = random_rect_masks(jax.random.PRNGKey(1), 2, 64)
        assert mask.shape == (2, 64, 64, 1)
        assert 0 < float(mask.mean()) < 0.8
        gt = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)), jnp.float32)
        detail = prepare_inputs(gt, mask)
        vis = np.asarray(1.0 - mask)
        np.testing.assert_allclose(np.asarray(detail) * vis,
                                   np.asarray(gt) * vis, atol=1e-6)
        # masked pixels hold the per-image visible mean
        m = np.asarray(mask)[0, ..., 0] > 0.5
        mean = (np.asarray(gt)[0] * vis[0]).sum((0, 1)) / vis[0].sum()
        np.testing.assert_allclose(np.asarray(detail)[0][m][0], mean,
                                   atol=1e-5)

    def test_loss_components(self, rng):
        """Objective weights match the reference (1 L1, 0.04 perceptual,
        250 style; base_options.py:33-35) and the loss is finite on a tiny
        VGG forward. The full grad step is exercised by the generic trainer
        machinery; TransRef's 256px backward is too heavy for CPU CI."""
        import jax
        import jax.numpy as jnp
        from stitchax.models import VGG16Features
        from stitchax.models.vgg import transref_total_loss
        vgg = VGG16Features()
        x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
        vp = jax.jit(vgg.init)(jax.random.PRNGKey(0), x)
        vgg_apply = lambda t: vgg.apply(vp, t)
        pred = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)), jnp.float32)
        gt = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)), jnp.float32)
        out = transref_total_loss(vgg_apply, pred, gt, None,
                                  l1_weight=1.0, perc_weight=0.04,
                                  style_weight=250.0)
        total = float(out["total"])
        expect = (float(out["l1"]) + 0.04 * float(out["perceptual"])
                  + 250.0 * float(out["style"]))
        assert abs(total - expect) < 1e-4 * max(abs(expect), 1.0)
