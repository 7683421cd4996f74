"""FlowFormer converter structure test: a synthetic state dict with the
reference's exact key layout (derived from core/FlowFormer/PerCostFormer3/*)
must convert into a tree that matches the flax init exactly and runs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stitchax import convert
from stitchax.models import FlowFormer, FlowFormerConfig


def _fake_twins_sd(sd, prefix, rng, in_ch=3, dims=(128, 256), srs=(8, 4),
                   patch=(4, 2), depths=(2, 2)):
    def t(name, *shape):
        sd[f"{prefix}.{name}"] = rng.standard_normal(shape).astype(
            np.float32) * 0.02

    cin = in_ch
    for s, C in enumerate(dims):
        t(f"patch_embeds.{s}.proj.weight", C, cin, patch[s], patch[s])
        t(f"patch_embeds.{s}.proj.bias", C)
        t(f"patch_embeds.{s}.norm.weight", C)
        t(f"patch_embeds.{s}.norm.bias", C)
        t(f"pos_block.{s}.proj.0.weight", C, 1, 3, 3)
        t(f"pos_block.{s}.proj.0.bias", C)
        for j in range(depths[s]):
            b = f"blocks.{s}.{j}"
            for n in ("norm1", "norm2"):
                t(f"{b}.{n}.weight", C)
                t(f"{b}.{n}.bias", C)
            if j % 2 == 0:
                t(f"{b}.attn.qkv.weight", 3 * C, C)
                t(f"{b}.attn.qkv.bias", 3 * C)
            else:
                t(f"{b}.attn.q.weight", C, C)
                t(f"{b}.attn.q.bias", C)
                t(f"{b}.attn.kv.weight", 2 * C, C)
                t(f"{b}.attn.kv.bias", 2 * C)
                t(f"{b}.attn.sr.weight", C, C, srs[s], srs[s])
                t(f"{b}.attn.sr.bias", C)
                t(f"{b}.attn.norm.weight", C)
                t(f"{b}.attn.norm.bias", C)
            t(f"{b}.attn.proj.weight", C, C)
            t(f"{b}.attn.proj.bias", C)
            t(f"{b}.mlp.fc1.weight", 4 * C, C)
            t(f"{b}.mlp.fc1.bias", 4 * C)
            t(f"{b}.mlp.fc2.weight", C, 4 * C)
            t(f"{b}.mlp.fc2.bias", C)
        cin = C


def _attn_layer(sd, p, rng, dim=128, kv_dim=None):
    kv_dim = kv_dim or dim

    def t(name, *shape):
        sd[f"{p}.{name}"] = rng.standard_normal(shape).astype(np.float32) * .02

    for n in ("norm1", "norm2"):
        t(f"{n}.weight", dim)
        t(f"{n}.bias", dim)
    t("q.weight", dim, dim)
    t("q.bias", dim)
    t("k.weight", dim, kv_dim)
    t("k.bias", dim)
    t("v.weight", dim, kv_dim)
    t("v.bias", dim)
    t("proj.weight", dim, dim)
    t("proj.bias", dim)
    t("ffn.0.weight", dim, dim)
    t("ffn.0.bias", dim)
    t("ffn.3.weight", dim, dim)
    t("ffn.3.bias", dim)


def _rpe_block(sd, p, rng, dim=128, vc=64, ctx=256, is_global=False, sr=4):
    def t(name, *shape):
        sd[f"{p}.{name}"] = rng.standard_normal(shape).astype(np.float32) * .02

    for n in ("norm1", "norm2"):
        t(f"{n}.weight", dim)
        t(f"{n}.bias", dim)
    t("attn.context_proj.weight", vc, ctx)
    t("attn.context_proj.bias", vc)
    t("attn.q.weight", dim, dim + vc)
    t("attn.q.bias", dim)
    k_in = dim if is_global else dim + vc
    t("attn.k.weight", dim, k_in)
    t("attn.k.bias", dim)
    t("attn.v.weight", dim, dim)
    t("attn.v.bias", dim)
    t("attn.proj.weight", dim, dim)
    t("attn.proj.bias", dim)
    if is_global:
        t("attn.sr_key.weight", dim, dim + vc, sr, sr)
        t("attn.sr_key.bias", dim)
        t("attn.sr_value.weight", dim, dim, sr, sr)
        t("attn.sr_value.bias", dim)
        t("attn.norm.weight", dim)
        t("attn.norm.bias", dim)
    t("mlp.fc1.weight", 4 * dim, dim)
    t("mlp.fc1.bias", 4 * dim)
    t("mlp.fc2.weight", dim, 4 * dim)
    t("mlp.fc2.bias", dim)


def _fake_flowformer_sd(rng, encoder_depth=3):
    sd = {}

    def t(name, *shape):
        sd[name] = rng.standard_normal(shape).astype(np.float32) * 0.02

    # real checkpoints nest the timm model under `.svt`
    # (encoders.py:10: self.svt = timm.create_model(...))
    _fake_twins_sd(sd, "context_encoder.svt", rng)
    _fake_twins_sd(sd, "memory_encoder.feat_encoder.svt", rng)

    cpe = "memory_encoder.cost_perceiver_encoder"
    t(f"{cpe}.latent_tokens", 1, 8, 128)
    for i, (o, c) in enumerate([(16, 1), (32, 16), (64, 32)]):
        t(f"{cpe}.patch_embed.proj.{i * 2}.weight", o, c, 6, 6)
        t(f"{cpe}.patch_embed.proj.{i * 2}.bias", o)
    for i in (0, 2):
        t(f"{cpe}.patch_embed.ffn_with_coord.{i}.weight", 128, 128, 1, 1)
        t(f"{cpe}.patch_embed.ffn_with_coord.{i}.bias", 128)
    t(f"{cpe}.patch_embed.norm.weight", 128)
    t(f"{cpe}.patch_embed.norm.bias", 128)
    _attn_layer(sd, f"{cpe}.input_layer", rng, 128)
    for i in range(encoder_depth):
        _attn_layer(sd, f"{cpe}.encoder_layers.{i}", rng, 128)
        _rpe_block(sd, f"{cpe}.vertical_encoder_layers.{i}.local_block", rng)
        _rpe_block(sd, f"{cpe}.vertical_encoder_layers.{i}.global_block", rng,
                   is_global=True)

    md = "memory_decoder"
    t(f"{md}.flow_token_encoder.0.weight", 64, 81, 1, 1)
    t(f"{md}.flow_token_encoder.0.bias", 64)
    t(f"{md}.flow_token_encoder.2.weight", 64, 64, 1, 1)
    t(f"{md}.flow_token_encoder.2.bias", 64)
    t(f"{md}.proj.weight", 256, 256, 1, 1)
    t(f"{md}.proj.bias", 256)
    t(f"{md}.att.to_qk.weight", 256, 128, 1, 1)
    ca = f"{md}.decoder_layer.cross_attend"
    _attn_layer(sd, ca, rng, 64, kv_dim=128)
    ub = f"{md}.update_block"
    for n, (o, c, k) in {"convc1": (256, 145, 1), "convc2": (192, 256, 3),
                         "convf1": (128, 2, 7), "convf2": (64, 128, 3),
                         "conv": (126, 256, 3)}.items():
        t(f"{ub}.encoder.{n}.weight", o, c, k, k)
        t(f"{ub}.encoder.{n}.bias", o)
    for n in ("convz1", "convr1", "convq1"):
        t(f"{ub}.gru.{n}.weight", 128, 512, 1, 5)
        t(f"{ub}.gru.{n}.bias", 128)
    for n in ("convz2", "convr2", "convq2"):
        t(f"{ub}.gru.{n}.weight", 128, 512, 5, 1)
        t(f"{ub}.gru.{n}.bias", 128)
    t(f"{ub}.flow_head.conv1.weight", 256, 128, 3, 3)
    t(f"{ub}.flow_head.conv1.bias", 256)
    t(f"{ub}.flow_head.conv2.weight", 2, 256, 3, 3)
    t(f"{ub}.flow_head.conv2.bias", 2)
    t(f"{ub}.mask.0.weight", 256, 128, 3, 3)
    t(f"{ub}.mask.0.bias", 256)
    t(f"{ub}.mask.2.weight", 576, 256, 1, 1)
    t(f"{ub}.mask.2.bias", 576)
    t(f"{ub}.aggregator.to_v.weight", 128, 128, 1, 1)
    t(f"{ub}.aggregator.gamma", 1)
    return sd


class TestFlowFormerConverter:
    def test_structure_and_forward(self, rng):
        sd = {"module.flow_backbone." + k: v
              for k, v in _fake_flowformer_sd(rng).items()}
        variables = jax.tree_util.tree_map(
            jnp.asarray, convert.convert_flowformer(sd))

        cfg = FlowFormerConfig(decoder_depth=2)  # params shared across iters
        model = FlowFormer(cfg)
        img = jnp.zeros((1, 64, 64, 3), jnp.float32)
        ref = model.init(jax.random.PRNGKey(0), img, img)

        ref_keys = {jax.tree_util.keystr(p): v.shape for p, v in
                    jax.tree_util.tree_leaves_with_path(ref)}
        got_keys = {jax.tree_util.keystr(p): v.shape for p, v in
                    jax.tree_util.tree_leaves_with_path(variables)}
        missing = sorted(set(ref_keys) - set(got_keys))
        extra = sorted(set(got_keys) - set(ref_keys))
        assert not missing, f"missing {len(missing)}: {missing[:6]}"
        assert not extra, f"extra {len(extra)}: {extra[:6]}"
        mismatched = [k for k in ref_keys if ref_keys[k] != got_keys[k]]
        assert not mismatched, (
            [(k, ref_keys[k], got_keys[k]) for k in mismatched[:6]])

        preds, flow_lr = model.apply(variables, img, img)
        assert np.isfinite(np.asarray(preds[-1])).all()
