"""SD inpainting stack tests.

- CLIP text encoder: ACTIVATION parity vs transformers.CLIPTextModel
  (installed; random-init local config, no downloads).
- VAE / UNet / ControlNet converters: synthetic diffusers-layout state
  dicts at tiny sizes -> converted tree must match model.init structure.
- End-to-end: make_sd_inpaint_fn with tiny random models runs the real
  UNet+ControlNet DDIM loop (no fallback), preserves unmasked pixels, and
  is deterministic for a fixed seed.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stitchax.models import diffusion as sdm
from stitchax.models import vae as sdv
from stitchax.models.clip_text import (ClipTextEncoder, convert_clip_text,
                                       empty_prompt_tokens)
from stitchax.models.sd_pipeline import make_sd_inpaint_fn

TINY = sdm.UNetConfig(in_channels=9, out_channels=4,
                      block_channels=(8, 16), layers_per_block=1,
                      attention_resolutions=(0, 1), context_dim=8,
                      num_heads=2, num_train_timesteps=100, norm_groups=4)


def _assert_same_structure(converted, initialized):
    jc = jax.tree_util.tree_structure(converted)
    ji = jax.tree_util.tree_structure(initialized)
    assert jc == ji, f"\nconverted: {jc}\ninit:      {ji}"
    for c, i in zip(jax.tree_util.tree_leaves(converted),
                    jax.tree_util.tree_leaves(initialized)):
        assert np.shape(c) == i.shape


# --------------------- synthetic diffusers state dicts -----------------------


def _fake_sd(entries, rng):
    sd = {}
    for name, shape in entries:
        sd[name] = np.asarray(rng.standard_normal(shape), np.float32) * 0.02
    import torch
    return {k: torch.from_numpy(v) for k, v in sd.items()}


def _resnet_keys(p, cin, cout, temb):
    ks = [(f"{p}.norm1.weight", (cin,)), (f"{p}.norm1.bias", (cin,)),
          (f"{p}.conv1.weight", (cout, cin, 3, 3)), (f"{p}.conv1.bias", (cout,)),
          (f"{p}.time_emb_proj.weight", (cout, temb)),
          (f"{p}.time_emb_proj.bias", (cout,)),
          (f"{p}.norm2.weight", (cout,)), (f"{p}.norm2.bias", (cout,)),
          (f"{p}.conv2.weight", (cout, cout, 3, 3)), (f"{p}.conv2.bias", (cout,))]
    if cin != cout:
        ks += [(f"{p}.conv_shortcut.weight", (cout, cin, 1, 1)),
               (f"{p}.conv_shortcut.bias", (cout,))]
    return ks


def _attn_keys(p, c, ctx):
    tb = f"{p}.transformer_blocks.0"
    ks = [(f"{p}.norm.weight", (c,)), (f"{p}.norm.bias", (c,)),
          (f"{p}.proj_in.weight", (c, c, 1, 1)), (f"{p}.proj_in.bias", (c,)),
          (f"{p}.proj_out.weight", (c, c, 1, 1)), (f"{p}.proj_out.bias", (c,))]
    for n in ("norm1", "norm2", "norm3"):
        ks += [(f"{tb}.{n}.weight", (c,)), (f"{tb}.{n}.bias", (c,))]
    for a, kvdim in (("attn1", c), ("attn2", ctx)):
        ks += [(f"{tb}.{a}.to_q.weight", (c, c)),
               (f"{tb}.{a}.to_k.weight", (c, kvdim)),
               (f"{tb}.{a}.to_v.weight", (c, kvdim)),
               (f"{tb}.{a}.to_out.0.weight", (c, c)),
               (f"{tb}.{a}.to_out.0.bias", (c,))]
    ks += [(f"{tb}.ff.net.0.proj.weight", (8 * c, c)),
           (f"{tb}.ff.net.0.proj.bias", (8 * c,)),
           (f"{tb}.ff.net.2.weight", (c, 4 * c)),
           (f"{tb}.ff.net.2.bias", (c,))]
    return ks


def _backbone_keys(cfg, in_ch):
    ch = cfg.block_channels
    temb = 4 * ch[0]
    ks = [("conv_in.weight", (ch[0], in_ch, 3, 3)), ("conv_in.bias", (ch[0],)),
          ("time_embedding.linear_1.weight", (temb, ch[0])),
          ("time_embedding.linear_1.bias", (temb,)),
          ("time_embedding.linear_2.weight", (temb, temb)),
          ("time_embedding.linear_2.bias", (temb,))]
    cin = ch[0]
    for i, c in enumerate(ch):
        for j in range(cfg.layers_per_block):
            ks += _resnet_keys(f"down_blocks.{i}.resnets.{j}",
                               cin if j == 0 else c, c, temb)
            if i in cfg.attention_resolutions:
                ks += _attn_keys(f"down_blocks.{i}.attentions.{j}", c,
                                 cfg.context_dim)
        if i < len(ch) - 1:
            ks += [(f"down_blocks.{i}.downsamplers.0.conv.weight",
                    (c, c, 3, 3)),
                   (f"down_blocks.{i}.downsamplers.0.conv.bias", (c,))]
        cin = c
    ks += _resnet_keys("mid_block.resnets.0", ch[-1], ch[-1], temb)
    ks += _attn_keys("mid_block.attentions.0", ch[-1], cfg.context_dim)
    ks += _resnet_keys("mid_block.resnets.1", ch[-1], ch[-1], temb)
    return ks


def _unet_keys(cfg):
    ch = cfg.block_channels
    temb = 4 * ch[0]
    ks = _backbone_keys(cfg, cfg.in_channels)
    # skip stack as the forward builds it
    skips = [ch[0]]
    for i, c in enumerate(ch):
        skips += [c] * cfg.layers_per_block
        if i < len(ch) - 1:
            skips.append(c)
    x_ch = ch[-1]
    for k in range(len(ch)):
        i = len(ch) - 1 - k
        c = ch[i]
        for j in range(cfg.layers_per_block + 1):
            cin = x_ch + skips.pop()
            ks += _resnet_keys(f"up_blocks.{k}.resnets.{j}", cin, c, temb)
            x_ch = c
            if i in cfg.attention_resolutions:
                ks += _attn_keys(f"up_blocks.{k}.attentions.{j}", c,
                                 cfg.context_dim)
        if i > 0:
            ks += [(f"up_blocks.{k}.upsamplers.0.conv.weight", (c, c, 3, 3)),
                   (f"up_blocks.{k}.upsamplers.0.conv.bias", (c,))]
    ks += [("conv_norm_out.weight", (ch[0],)), ("conv_norm_out.bias", (ch[0],)),
           ("conv_out.weight", (cfg.out_channels, ch[0], 3, 3)),
           ("conv_out.bias", (cfg.out_channels,))]
    return ks


def _controlnet_keys(cfg):
    ch = cfg.block_channels
    ks = _backbone_keys(cfg, 4)   # controlnet sees bare latents
    hint = (16, 16, 32, 32, 96, 96, 256)
    ks += [("controlnet_cond_embedding.conv_in.weight", (16, 3, 3, 3)),
           ("controlnet_cond_embedding.conv_in.bias", (16,))]
    for i in range(6):
        ks += [(f"controlnet_cond_embedding.blocks.{i}.weight",
                (hint[i + 1], hint[i], 3, 3)),
               (f"controlnet_cond_embedding.blocks.{i}.bias", (hint[i + 1],))]
    ks += [("controlnet_cond_embedding.conv_out.weight", (ch[0], 256, 3, 3)),
           ("controlnet_cond_embedding.conv_out.bias", (ch[0],))]
    flat_ch = [ch[0]]
    for i, c in enumerate(ch):
        flat_ch += [c] * cfg.layers_per_block
        if i < len(ch) - 1:
            flat_ch.append(c)
    for f, c in enumerate(flat_ch):
        ks += [(f"controlnet_down_blocks.{f}.weight", (c, c, 1, 1)),
               (f"controlnet_down_blocks.{f}.bias", (c,))]
    ks += [("controlnet_mid_block.weight", (ch[-1], ch[-1], 1, 1)),
           ("controlnet_mid_block.bias", (ch[-1],))]
    return ks


def _vae_keys(chs=(8, 8, 8, 8), lat=4):
    def res(p, cin, cout):
        ks = [(f"{p}.norm1.weight", (cin,)), (f"{p}.norm1.bias", (cin,)),
              (f"{p}.conv1.weight", (cout, cin, 3, 3)),
              (f"{p}.conv1.bias", (cout,)),
              (f"{p}.norm2.weight", (cout,)), (f"{p}.norm2.bias", (cout,)),
              (f"{p}.conv2.weight", (cout, cout, 3, 3)),
              (f"{p}.conv2.bias", (cout,))]
        if cin != cout:
            ks += [(f"{p}.conv_shortcut.weight", (cout, cin, 1, 1)),
                   (f"{p}.conv_shortcut.bias", (cout,))]
        return ks

    def attn(p, c):
        ks = [(f"{p}.group_norm.weight", (c,)), (f"{p}.group_norm.bias", (c,))]
        for n in ("to_q", "to_k", "to_v"):
            ks += [(f"{p}.{n}.weight", (c, c)), (f"{p}.{n}.bias", (c,))]
        ks += [(f"{p}.to_out.0.weight", (c, c)), (f"{p}.to_out.0.bias", (c,))]
        return ks

    ks = [("encoder.conv_in.weight", (chs[0], 3, 3, 3)),
          ("encoder.conv_in.bias", (chs[0],))]
    cin = chs[0]
    for i, c in enumerate(chs):
        for j in range(2):
            ks += res(f"encoder.down_blocks.{i}.resnets.{j}",
                      cin if j == 0 else c, c)
        if i < 3:
            ks += [(f"encoder.down_blocks.{i}.downsamplers.0.conv.weight",
                    (c, c, 3, 3)),
                   (f"encoder.down_blocks.{i}.downsamplers.0.conv.bias",
                    (c,))]
        cin = c
    ks += res("encoder.mid_block.resnets.0", chs[-1], chs[-1])
    ks += attn("encoder.mid_block.attentions.0", chs[-1])
    ks += res("encoder.mid_block.resnets.1", chs[-1], chs[-1])
    ks += [("encoder.conv_norm_out.weight", (chs[-1],)),
           ("encoder.conv_norm_out.bias", (chs[-1],)),
           ("encoder.conv_out.weight", (2 * lat, chs[-1], 3, 3)),
           ("encoder.conv_out.bias", (2 * lat,)),
           ("quant_conv.weight", (2 * lat, 2 * lat, 1, 1)),
           ("quant_conv.bias", (2 * lat,)),
           ("post_quant_conv.weight", (lat, lat, 1, 1)),
           ("post_quant_conv.bias", (lat,)),
           ("decoder.conv_in.weight", (chs[-1], lat, 3, 3)),
           ("decoder.conv_in.bias", (chs[-1],))]
    ks += res("decoder.mid_block.resnets.0", chs[-1], chs[-1])
    ks += attn("decoder.mid_block.attentions.0", chs[-1])
    ks += res("decoder.mid_block.resnets.1", chs[-1], chs[-1])
    rev = tuple(reversed(chs))
    cin = chs[-1]
    for i, c in enumerate(rev):
        for j in range(3):
            ks += res(f"decoder.up_blocks.{i}.resnets.{j}",
                      cin if j == 0 else c, c)
        if i < 3:
            ks += [(f"decoder.up_blocks.{i}.upsamplers.0.conv.weight",
                    (c, c, 3, 3)),
                   (f"decoder.up_blocks.{i}.upsamplers.0.conv.bias", (c,))]
        cin = c
    ks += [("decoder.conv_norm_out.weight", (chs[0],)),
           ("decoder.conv_norm_out.bias", (chs[0],)),
           ("decoder.conv_out.weight", (3, chs[0], 3, 3)),
           ("decoder.conv_out.bias", (3,))]
    return ks


# ------------------------------- tests ---------------------------------------


class TestConverterStructure:
    def test_unet(self, rng):
        sd = _fake_sd(_unet_keys(TINY), rng)
        conv = sdm.convert_sd_unet(sd, TINY)
        model = sdm.UNet2DCondition(TINY)
        lat = jnp.zeros((1, 16, 16, 9))
        ctx = jnp.zeros((1, 5, TINY.context_dim))
        init = model.init(jax.random.PRNGKey(0), lat,
                          jnp.zeros((1,)), ctx)
        _assert_same_structure(conv, init)
        out = model.apply(jax.tree_util.tree_map(jnp.asarray, conv), lat,
                          jnp.zeros((1,)), ctx)
        assert out.shape == (1, 16, 16, 4)

    def test_controlnet(self, rng):
        sd = _fake_sd(_controlnet_keys(TINY), rng)
        conv = sdm.convert_controlnet(sd, TINY)
        model = sdm.ControlNet(TINY)
        lat = jnp.zeros((1, 16, 16, 4))
        ctx = jnp.zeros((1, 5, TINY.context_dim))
        ctrl = jnp.zeros((1, 128, 128, 3))
        init = model.init(jax.random.PRNGKey(0), lat, jnp.zeros((1,)),
                          ctx, ctrl)
        _assert_same_structure(conv, init)
        res, mid = model.apply(jax.tree_util.tree_map(jnp.asarray, conv),
                               lat, jnp.zeros((1,)), ctx, ctrl)
        assert len(res) == 4  # conv_in + l_per_block + down per block walk
        assert mid.shape[-1] == TINY.block_channels[-1]

    def test_vae(self, rng):
        chs = (8, 8, 8, 8)
        sd = _fake_sd(_vae_keys(chs), rng)
        conv = sdv.convert_vae(sd)
        model = sdv.AutoencoderKL(chs, groups=4)
        img = jnp.zeros((1, 32, 32, 3))
        init = model.init(jax.random.PRNGKey(0), img)
        _assert_same_structure(conv, init)
        z = model.apply(jax.tree_util.tree_map(jnp.asarray, conv), img,
                        method=sdv.AutoencoderKL.encode_mode)
        assert z.shape == (1, 4, 4, 4)
        out = model.apply(jax.tree_util.tree_map(jnp.asarray, conv), z,
                          method=sdv.AutoencoderKL.decode)
        assert out.shape == (1, 32, 32, 3)


class TestClipParity:
    def test_vs_transformers(self, rng):
        import torch
        from transformers import CLIPTextConfig, CLIPTextModel
        torch.manual_seed(7)
        cfg = CLIPTextConfig(vocab_size=99, hidden_size=32,
                             intermediate_size=128, num_hidden_layers=3,
                             num_attention_heads=4,
                             max_position_embeddings=16,
                             hidden_act="quick_gelu")
        ref = CLIPTextModel(cfg).eval()
        variables = jax.tree_util.tree_map(
            jnp.asarray, convert_clip_text(ref.state_dict()))

        ids = rng.integers(0, 99, (2, 16)).astype(np.int32)
        with torch.no_grad():
            want = ref(torch.from_numpy(ids.astype(np.int64))
                       ).last_hidden_state.numpy()
        model = ClipTextEncoder(vocab_size=99, width=32, layers=3, heads=4,
                                max_tokens=16)
        got = model.apply(variables, jnp.asarray(ids))
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-4, atol=1e-5)

    def test_empty_prompt_tokens(self):
        ids = np.asarray(empty_prompt_tokens(2))
        assert ids.shape == (2, 77)
        assert (ids[:, 0] == 49406).all() and (ids[:, 1:] == 49407).all()


class TestEndToEnd:
    def test_inpaint_fn_runs_real_loop(self, rng):
        k = jax.random.PRNGKey(0)
        unet = sdm.UNet2DCondition(TINY)
        cnet = sdm.ControlNet(TINY)
        vae = sdv.AutoencoderKL((8, 8, 8, 8), groups=4)
        lat = jnp.zeros((1, 8, 8, 9))
        ctx = jnp.zeros((1, 5, TINY.context_dim))
        uv = jax.jit(unet.init)(k, lat, jnp.zeros((1,)), ctx)
        cv = jax.jit(cnet.init)(k, lat[..., :4], jnp.zeros((1,)), ctx,
                                jnp.zeros((1, 64, 64, 3)))
        vv = jax.jit(vae.init)(k, jnp.zeros((1, 64, 64, 3)))

        fn = make_sd_inpaint_fn(uv, cv, vv, ctx, cfg=TINY, vae=vae,
                                num_steps=2, seed=0)
        img = jnp.asarray(rng.uniform(0, 255, (64, 64, 3)), jnp.float32)
        mask = jnp.zeros((64, 64, 1)).at[16:32, 16:32].set(1.0)

        out = jax.jit(fn)(img, mask)
        assert out.shape == (64, 64, 3)
        assert bool(jnp.isfinite(out).all())
        # overlay: pixels outside the hole are the originals
        np.testing.assert_allclose(np.asarray(out)[:8, :8],
                                   np.asarray(img)[:8, :8])
        # hole content actually came from the decoder (not the original)
        assert float(jnp.abs(out[16:32, 16:32] -
                             img[16:32, 16:32]).mean()) > 1.0
        # fixed seed -> deterministic
        out2 = jax.jit(fn)(img, mask)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))

    def test_strength_refinement_path(self, rng):
        """strength<1 (the diffusers pipeline parameter): the DDIM
        trajectory starts from the noised push-pull fill and runs only
        round(s*num_steps) steps; the overlay contract is unchanged and
        the result differs from the strength=1 trajectory."""
        k = jax.random.PRNGKey(0)
        unet = sdm.UNet2DCondition(TINY)
        cnet = sdm.ControlNet(TINY)
        vae = sdv.AutoencoderKL((8, 8, 8, 8), groups=4)
        lat = jnp.zeros((1, 8, 8, 9))
        ctx = jnp.zeros((1, 5, TINY.context_dim))
        uv = jax.jit(unet.init)(k, lat, jnp.zeros((1,)), ctx)
        cv = jax.jit(cnet.init)(k, lat[..., :4], jnp.zeros((1,)), ctx,
                                jnp.zeros((1, 64, 64, 3)))
        vv = jax.jit(vae.init)(k, jnp.zeros((1, 64, 64, 3)))
        img = jnp.asarray(rng.uniform(0, 255, (64, 64, 3)), jnp.float32)
        mask = jnp.zeros((64, 64, 1)).at[16:32, 16:32].set(1.0)

        full = jax.jit(make_sd_inpaint_fn(
            uv, cv, vv, ctx, cfg=TINY, vae=vae, num_steps=4, seed=0))(
                img, mask)
        half = jax.jit(make_sd_inpaint_fn(
            uv, cv, vv, ctx, cfg=TINY, vae=vae, num_steps=4, seed=0,
            strength=0.5))(img, mask)
        assert half.shape == (64, 64, 3)
        assert bool(jnp.isfinite(half).all())
        np.testing.assert_allclose(np.asarray(half)[:8, :8],
                                   np.asarray(img)[:8, :8])
        # a different trajectory start must change the hole content
        assert float(jnp.abs(half[16:32, 16:32]
                             - full[16:32, 16:32]).mean()) > 1e-3
        # strength=1 with an explicit default stays bit-identical to the
        # reference operating point (regression guard for the default)
        again = jax.jit(make_sd_inpaint_fn(
            uv, cv, vv, ctx, cfg=TINY, vae=vae, num_steps=4, seed=0,
            strength=1.0))(img, mask)
        np.testing.assert_array_equal(np.asarray(full), np.asarray(again))

    def test_load_sd_checkpoint_sizes_from_configs(self, rng, tmp_path):
        """The packed blob's 'configs' entry must size UNet/VAE/CLIP
        (tools/make_random_sd_checkpoint.py writes reduced-scale packs so
        the real DDIM plugin path can run in this zero-egress env)."""
        import subprocess
        import sys as _sys

        from stitchax.models.sd_pipeline import load_sd_checkpoint

        pack = tmp_path / "sd_rand_tiny.pt"
        r = subprocess.run(
            [_sys.executable, "tools/make_random_sd_checkpoint.py",
             "--out", str(pack), "--width", "8"],
            capture_output=True, text=True,
            cwd=os.path.join(os.path.dirname(__file__), ".."))
        assert r.returncode == 0, r.stderr[-2000:]

        fn = load_sd_checkpoint(str(pack), num_steps=2)
        img = jnp.asarray(rng.uniform(0, 255, (64, 64, 3)), jnp.float32)
        mask = jnp.zeros((64, 64, 1)).at[16:32, 16:32].set(1.0)
        out = jax.jit(fn)(img, mask)
        assert out.shape == (64, 64, 3)
        assert bool(jnp.isfinite(out).all())
        np.testing.assert_allclose(np.asarray(out)[:8, :8],
                                   np.asarray(img)[:8, :8])
        assert float(jnp.abs(out[16:32, 16:32]
                             - img[16:32, 16:32]).mean()) > 1.0

    def test_inpainter_uses_real_loop_when_given_denoise_fn(self, rng):
        from stitchax.compose.inpainters import StableDiffusionInpainter
        calls = []

        def fake_denoise(img, msk, steps):
            calls.append(steps)
            return img * 0 + 7.0

        ip = StableDiffusionInpainter(denoise_fn=fake_denoise)
        assert not hasattr(ip, "_fallback")
        out = ip.inpaint(jnp.zeros((32, 32, 3)), jnp.zeros((32, 32, 1)))
        assert calls and float(out[0, 0, 0]) == 7.0


class TestNativeJaxContainer:
    """save_jax_sd_checkpoint (train/sd_inpaint_trainer.py) round-trips
    through load_sd_checkpoint without diffusers converters — the
    container format the in-env-trained diffusion inpainter ships in."""

    def test_roundtrip_and_overlay(self, rng, tmp_path):
        import optax

        from stitchax.models.diffusion import (ControlNet, UNetConfig,
                                               UNet2DCondition)
        from stitchax.models.sd_pipeline import load_sd_checkpoint
        from stitchax.models.vae import AutoencoderKL
        from stitchax.train.sd_inpaint_trainer import (
            make_diffusion_train_step, save_jax_sd_checkpoint)

        w, S = 8, 32
        unet_kw = dict(in_channels=9, out_channels=4,
                       block_channels=(w, 2 * w), layers_per_block=1,
                       attention_resolutions=(0, 1), context_dim=2 * w,
                       num_heads=2, num_train_timesteps=1000, norm_groups=4)
        vae_kw = dict(block_channels=(w, w, w, w), latent_channels=4,
                      groups=4)
        cfg = UNetConfig(**unet_kw)
        unet, cnet, vae = (UNet2DCondition(cfg), ControlNet(cfg),
                           AutoencoderKL(**vae_kw))
        k = jax.random.PRNGKey(0)
        ctx = jax.random.normal(k, (1, 77, unet_kw["context_dim"]))
        img0 = jnp.zeros((1, S, S, 3), jnp.float32)
        lat0 = jnp.zeros((1, S // 8, S // 8, 4), jnp.float32)
        t0 = jnp.zeros((1,), jnp.float32)
        vp = vae.init(k, img0)
        cp = cnet.init(k, lat0, t0, ctx, img0)
        res0, mid0 = cnet.apply(cp, lat0, t0, ctx, img0)
        up = unet.init(k, jnp.zeros((1, S // 8, S // 8, 9)), t0, ctx,
                       res0, mid0)

        # one train step runs and yields finite loss
        tx = optax.adam(1e-4)
        params = {"unet": up, "controlnet": cp}
        step = make_diffusion_train_step(unet, cnet, vae, tx, ctx)
        img01 = jnp.asarray(rng.uniform(0, 1, (2, S, S, 3)), jnp.float32)
        hole = jnp.zeros((2, S, S, 1)).at[:, 8:20, 8:20].set(1.0)
        params, _, m = step(params, tx.init(params), vp, img01, hole,
                            jax.random.PRNGKey(1))
        assert np.isfinite(float(m["mse"]))

        path = tmp_path / "sd_jax.pt"
        save_jax_sd_checkpoint(str(path), params["unet"],
                               params["controlnet"], vp, ctx, unet_kw,
                               vae_kw)
        fn = load_sd_checkpoint(str(path), num_steps=2)
        img = jnp.asarray(rng.uniform(0, 255, (S, S, 3)), jnp.float32)
        mask = jnp.zeros((S, S, 1)).at[8:20, 8:20].set(1.0)
        out = jax.jit(fn)(img, mask)
        assert out.shape == (S, S, 3)
        assert bool(jnp.isfinite(out).all())
        # overlay: untouched outside the hole, rewritten inside
        np.testing.assert_allclose(np.asarray(out)[:8, :8],
                                   np.asarray(img)[:8, :8])
        assert float(jnp.abs(out[8:20, 8:20] - img[8:20, 8:20]).mean()) > 1.0

        # preferred_strength round-trip: a blob that records its measured
        # operating point is adopted when the caller leaves strength unset,
        # and an explicit strength still overrides it
        path_s = tmp_path / "sd_jax_s.pt"
        save_jax_sd_checkpoint(str(path_s), params["unet"],
                               params["controlnet"], vp, ctx, unet_kw,
                               vae_kw, preferred_strength=0.5)
        fn_pref = load_sd_checkpoint(str(path_s), num_steps=4)
        fn_half = load_sd_checkpoint(str(path_s), num_steps=4, strength=0.5)
        fn_full = load_sd_checkpoint(str(path_s), num_steps=4, strength=1.0)
        o_pref = jax.jit(fn_pref)(img, mask)
        o_half = jax.jit(fn_half)(img, mask)
        o_full = jax.jit(fn_full)(img, mask)
        np.testing.assert_array_equal(np.asarray(o_pref), np.asarray(o_half))
        assert float(jnp.abs(o_pref[8:20, 8:20]
                             - o_full[8:20, 8:20]).mean()) > 1e-3
