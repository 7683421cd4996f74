"""TransRef converter structure test (synthetic reference-layout state
dict -> flax tree must match init leaf-for-leaf and run)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stitchax import convert
from stitchax.models import TransRefBase

DIMS = (64, 128, 320, 512)
SRS = (4, 2, 2, 1)


def _t(sd, rng, name, *shape):
    sd[name] = rng.standard_normal(shape).astype(np.float32) * 0.02


def _norm(sd, rng, p, c):
    _t(sd, rng, f"{p}.weight", c)
    _t(sd, rng, f"{p}.bias", c)


def _conv(sd, rng, p, o, i, k, bias=True):
    _t(sd, rng, f"{p}.weight", o, i, k, k)
    if bias:
        _t(sd, rng, f"{p}.bias", o)


def _lin(sd, rng, p, o, i):
    _t(sd, rng, f"{p}.weight", o, i)
    _t(sd, rng, f"{p}.bias", o)


def _pe(sd, rng, p, o, i, k):
    _conv(sd, rng, f"{p}.proj", o, i, k)
    _norm(sd, rng, f"{p}.norm", o)


def _block(sd, rng, p, c, sr, mlp=2, ref=False, task=False):
    _norm(sd, rng, f"{p}.norm1", c)
    _norm(sd, rng, f"{p}.norm2", c)
    if ref:
        _norm(sd, rng, f"{p}.norm1_Ref", c)
    _lin(sd, rng, f"{p}.attn.q", c, c)
    _lin(sd, rng, f"{p}.attn.kv", 2 * c, c)
    _lin(sd, rng, f"{p}.attn.proj", c, c)
    if sr > 1:
        _conv(sd, rng, f"{p}.attn.sr", c, c, sr)
        _norm(sd, rng, f"{p}.attn.norm", c)
    if task:
        _t(sd, rng, f"{p}.attn.task_query", 1, 48, c)
    _lin(sd, rng, f"{p}.mlp.fc1", mlp * c, c)
    _conv(sd, rng, f"{p}.mlp.dwconv.dwconv", mlp * c, 1, 3)
    _lin(sd, rng, f"{p}.mlp.fc2", c, mlp * c)


def _nonlocal(sd, rng, p, c=64):
    inter = c // 2
    _conv(sd, rng, f"{p}.g.0", inter, c, 1)
    _conv(sd, rng, f"{p}.phi.0", inter, c, 1)
    _conv(sd, rng, f"{p}.theta", inter, c, 1)
    _conv(sd, rng, f"{p}.W.0", c, inter, 1)
    _norm(sd, rng, f"{p}.W.1", c)
    _t(sd, rng, f"{p}.W.1.running_mean", c)
    sd[f"{p}.W.1.running_var"] = np.abs(
        rng.standard_normal(c).astype(np.float32)) + 0.5


def _refpa(sd, rng, p, c):
    doe = f"{p}.PA.offset_estimator"
    _conv(sd, rng, f"{doe}.downblock1.0", 64, 2 * c, 3)
    _conv(sd, rng, f"{doe}.downblock2.0", 64, 64, 3)
    _conv(sd, rng, f"{doe}.downblock3.0", 64, 64, 3)
    for i in (1, 2, 3):
        _nonlocal(sd, rng, f"{doe}.attentionblock{i}")
        # ConvTranspose2d(64, 64, 3, 2, 1, output_padding=1): (I, O, k, k)
        _t(sd, rng, f"{doe}.upblock{i}.0.weight", 64, 64, 3, 3)
        _t(sd, rng, f"{doe}.upblock{i}.0.bias", 64)
    _conv(sd, rng, f"{doe}.channelscaling_block", c, 64, 3)
    _conv(sd, rng, f"{p}.PA.offset_conv", 18, c, 3, bias=False)
    _t(sd, rng, f"{p}.PA.deformconv.weight", c, c, 3, 3)
    _conv(sd, rng, f"{p}.PH.fc.0", c // 8, 2 * c, 1)
    _conv(sd, rng, f"{p}.PH.fc.2", 2 * c, c // 8, 1)
    _conv(sd, rng, f"{p}.PH.reduc.0", c, 2 * c, 1)


def _fake_transref_sd(rng):
    sd = {}
    # Tenc
    _pe(sd, rng, "Tenc.patch_embed1", DIMS[0], 6, 7)
    _pe(sd, rng, "Tenc.patch_embed1_ref", DIMS[0], 3, 7)
    for i in (2, 3, 4):
        _pe(sd, rng, f"Tenc.patch_embed{i}", DIMS[i - 1], DIMS[i - 2], 3)
        if i < 4:
            _pe(sd, rng, f"Tenc.patch_embed{i}_ref", DIMS[i - 1],
                DIMS[i - 2], 3)
    for i in (1, 2, 3):
        _pe(sd, rng, f"Tenc.mini_patch_embed{i}", DIMS[i], DIMS[i - 1], 3)
        _pe(sd, rng, f"Tenc.mini_patch_embed{i}_ref", DIMS[i], DIMS[i - 1], 3)
        _refpa(sd, rng, f"Tenc.RefPA{i}", DIMS[i - 1])
        _norm(sd, rng, f"Tenc.pnorm{i}", DIMS[i])
        _block(sd, rng, f"Tenc.patch_block{i}.0", DIMS[i], SRS[i - 1],
               ref=True)
    for i in (1, 2, 3, 4):
        _norm(sd, rng, f"Tenc.norm{i}", DIMS[i - 1])
        for j in range(2):
            _block(sd, rng, f"Tenc.block{i}.{j}", DIMS[i - 1], SRS[i - 1])
    # Tdec
    _pe(sd, rng, "Tdec.patch_embed1", 512, 512, 3)
    _norm(sd, rng, "Tdec.norm1", 512)
    for j in range(3):
        _block(sd, rng, f"Tdec.block1.{j}", 512, 1, mlp=4, task=True)
    # convtail (ConvTranspose2d (I, O, 4, 4))
    for name, (i, o) in (("convd32x", (512, 512)), ("convd16x", (512, 320)),
                         ("convd8x", (320, 128)), ("convd4x", (128, 64)),
                         ("convd2x", (64, 16)), ("convd1x", (16, 8))):
        _t(sd, rng, f"convtail.{name}.conv2d.weight", i, o, 4, 4)
        _t(sd, rng, f"convtail.{name}.conv2d.bias", o)
    for name, c in (("dense_4", 320), ("dense_3", 128), ("dense_2", 64),
                    ("dense_1", 16)):
        _conv(sd, rng, f"convtail.{name}.0.conv1.conv2d", c, c, 3)
        _conv(sd, rng, f"convtail.{name}.0.conv2.conv2d", c, c, 3)
    _conv(sd, rng, "clean.conv2d", 3, 8, 3)
    return sd


class TestTransRefConverter:
    def test_structure_and_forward(self, rng):
        sd = _fake_transref_sd(rng)
        variables = jax.tree_util.tree_map(jnp.asarray,
                                           convert.convert_transref(sd))

        model = TransRefBase()
        S = 256
        d = jnp.zeros((1, S, S, 3), jnp.float32)
        m = jnp.zeros((1, S, S, 1), jnp.float32)
        ref = model.init(jax.random.PRNGKey(0), d, m, d)

        ref_keys = {jax.tree_util.keystr(p): v.shape for p, v in
                    jax.tree_util.tree_leaves_with_path(ref)}
        got_keys = {jax.tree_util.keystr(p): v.shape for p, v in
                    jax.tree_util.tree_leaves_with_path(variables)}
        missing = sorted(set(ref_keys) - set(got_keys))
        extra = sorted(set(got_keys) - set(ref_keys))
        assert not missing, f"missing {len(missing)}: {missing[:8]}"
        assert not extra, f"extra {len(extra)}: {extra[:8]}"
        mismatched = [k for k in ref_keys if ref_keys[k] != got_keys[k]]
        assert not mismatched, (
            [(k, ref_keys[k], got_keys[k]) for k in mismatched[:8]])

        out = model.apply(variables, d, m, d)
        assert np.isfinite(np.asarray(out)).all()
