"""Weight-converter tests.

1. Op-level numerics: torch functional ops vs flax layers with converted
   weights must agree (conv, depthwise conv, linear, convtranspose, bn).
2. Model-level structure: a synthetic torch state dict with the reference's
   exact key layout converts into a tree that loads into the flax model and
   round-trips values.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
from flax import linen as nn

from stitchax import convert


class TestOpConversions:
    def test_conv2d(self, rng):
        x = rng.standard_normal((1, 9, 11, 4)).astype(np.float32)
        w = rng.standard_normal((6, 4, 3, 3)).astype(np.float32)
        b = rng.standard_normal(6).astype(np.float32)
        t = torch.nn.functional.conv2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w),
            torch.from_numpy(b), padding=1).numpy().transpose(0, 2, 3, 1)
        mod = nn.Conv(6, (3, 3), padding=((1, 1), (1, 1)))
        out = mod.apply({"params": {"kernel": jnp.asarray(
            convert.conv_kernel(w)), "bias": jnp.asarray(b)}}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), t, atol=1e-4)

    def test_depthwise(self, rng):
        x = rng.standard_normal((1, 8, 8, 6)).astype(np.float32)
        w = rng.standard_normal((6, 1, 3, 3)).astype(np.float32)
        t = torch.nn.functional.conv2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w),
            padding=1, groups=6).numpy().transpose(0, 2, 3, 1)
        mod = nn.Conv(6, (3, 3), padding=((1, 1), (1, 1)),
                      feature_group_count=6, use_bias=False)
        out = mod.apply({"params": {"kernel": jnp.asarray(
            convert.depthwise_conv_kernel(w))}}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), t, atol=1e-4)

    def test_linear(self, rng):
        x = rng.standard_normal((5, 7)).astype(np.float32)
        w = rng.standard_normal((3, 7)).astype(np.float32)
        b = rng.standard_normal(3).astype(np.float32)
        t = (torch.from_numpy(x) @ torch.from_numpy(w).T
             + torch.from_numpy(b)).numpy()
        mod = nn.Dense(3)
        out = mod.apply({"params": {"kernel": jnp.asarray(
            convert.linear_kernel(w)), "bias": jnp.asarray(b)}},
            jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), t, atol=1e-5)

    def test_conv_transpose(self, rng):
        x = rng.standard_normal((1, 6, 6, 4)).astype(np.float32)
        w = rng.standard_normal((4, 5, 4, 4)).astype(np.float32)  # (I,O,kH,kW)
        t = torch.nn.functional.conv_transpose2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w),
            stride=2, padding=1).numpy().transpose(0, 2, 3, 1)
        # flax equivalent of torch ConvTranspose2d(k, s, p): padding k-1-p
        mod = nn.ConvTranspose(5, (4, 4), strides=(2, 2),
                               padding=((2, 2), (2, 2)), use_bias=False)
        out = mod.apply({"params": {"kernel": jnp.asarray(
            convert.conv_transpose_kernel(w))}}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), t, atol=1e-4)

    def test_batchnorm(self, rng):
        x = rng.standard_normal((2, 5, 5, 3)).astype(np.float32)
        weight = rng.uniform(0.5, 1.5, 3).astype(np.float32)
        bias = rng.standard_normal(3).astype(np.float32)
        mean = rng.standard_normal(3).astype(np.float32)
        var = rng.uniform(0.5, 2.0, 3).astype(np.float32)
        t = torch.nn.functional.batch_norm(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(mean), torch.from_numpy(var),
            torch.from_numpy(weight), torch.from_numpy(bias),
            training=False, eps=1e-5).numpy().transpose(0, 2, 3, 1)
        sd = {"n.weight": weight, "n.bias": bias,
              "n.running_mean": mean, "n.running_var": var}
        p, s = convert.batchnorm("n", sd)
        mod = nn.BatchNorm(use_running_average=True, epsilon=1e-5)
        out = mod.apply({"params": p, "batch_stats": s}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), t, atol=1e-5)


def _fake_resnet_sd(rng):
    """Synthetic torchvision-resnet50-in-Sequentials state dict with the
    reference's exact key layout (Homography/network.py:103-118)."""
    sd = {}

    def conv(name, o, i, k):
        sd[name + ".weight"] = rng.standard_normal((o, i, k, k)).astype(
            np.float32) * 0.05

    def bn(name, c):
        sd[name + ".weight"] = np.ones(c, np.float32)
        sd[name + ".bias"] = np.zeros(c, np.float32)
        sd[name + ".running_mean"] = np.zeros(c, np.float32)
        sd[name + ".running_var"] = np.ones(c, np.float32)

    conv("feature_extractor_stage1.0", 64, 3, 7)
    bn("feature_extractor_stage1.1", 64)
    specs = [("feature_extractor_stage1.4", 3, 64, 64),
             ("feature_extractor_stage1.5", 4, 256, 128),
             ("feature_extractor_stage2.0", 6, 512, 256)]
    for src, n, cin, f in specs:
        for b in range(n):
            i = cin if b == 0 else f * 4
            conv(f"{src}.{b}.conv1", f, i, 1)
            bn(f"{src}.{b}.bn1", f)
            conv(f"{src}.{b}.conv2", f, f, 3)
            bn(f"{src}.{b}.bn2", f)
            conv(f"{src}.{b}.conv3", f * 4, f, 1)
            bn(f"{src}.{b}.bn3", f * 4)
            if b == 0:
                conv(f"{src}.{b}.downsample.0", f * 4, i, 1)
                bn(f"{src}.{b}.downsample.1", f * 4)

    for i, (o, c) in zip((0, 2, 5, 7, 10, 12),
                         [(64, 2), (64, 64), (128, 64), (128, 128),
                          (256, 128), (256, 256)]):
        conv(f"regressNet1_part1.{i}", o, c, 3)
    for i, (o, c) in zip((0, 2, 4), [(4096, 4096), (1024, 4096), (8, 1024)]):
        sd[f"regressNet1_part2.{i}.weight"] = rng.standard_normal(
            (o, c)).astype(np.float32) * 0.01
        sd[f"regressNet1_part2.{i}.bias"] = np.zeros(o, np.float32)
    return sd


class TestModelConverters:
    def test_homography_structure(self, rng):
        from stitchax.models import UDIS2HomographyNet
        sd = {"module." + k: v for k, v in _fake_resnet_sd(rng).items()}
        variables = convert.convert_udis2_homography(sd)
        variables = jax.tree_util.tree_map(jnp.asarray, variables)

        # init at the operating 512 resolution so the flattened fc1 input is
        # the real 4096 (CCL 32x32 -> three pools -> 4x4x256)
        model = UDIS2HomographyNet()
        x = jnp.zeros((1, 512, 512, 3), jnp.float32)
        ref = model.init(jax.random.PRNGKey(0), x, x)

        # trees must agree in structure and leaf shapes
        ref_flat = jax.tree_util.tree_leaves_with_path(ref)
        got_flat = {jax.tree_util.keystr(p): v.shape for p, v in
                    jax.tree_util.tree_leaves_with_path(variables)}
        for p, v in ref_flat:
            key = jax.tree_util.keystr(p)
            assert key in got_flat, f"missing converted leaf {key}"
            assert got_flat[key] == v.shape, (key, got_flat[key], v.shape)
        assert len(got_flat) == len(ref_flat)

        # and the converted variables must actually run
        out = model.apply(variables, x, x)
        assert out.shape == (1, 8)
        assert np.isfinite(np.asarray(out)).all()

    def test_composition_structure(self, rng):
        from stitchax.models import CompositionNet
        sd = {}

        def conv(name, o, i):
            sd[name + ".weight"] = rng.standard_normal(
                (o, i, 3, 3)).astype(np.float32) * 0.05
            sd[name + ".bias"] = np.zeros(o, np.float32)

        chans = [(3, 32), (32, 64), (64, 128), (128, 256), (256, 512)]
        for idx, (i, o) in enumerate(chans, 1):
            off = 0 if idx == 1 else 1
            conv(f"down{idx}.layer.{off}", o, i)
            conv(f"down{idx}.layer.{off + 2}", o, o)
        up = [(512, 256), (256, 128), (128, 64), (64, 32)]
        for idx, (i, o) in enumerate(up, 1):
            conv(f"up{idx}.halfChanelConv.0", o, i)
            conv(f"up{idx}.conv.0", o, i)
            conv(f"up{idx}.conv.2", o, o)
        sd["out.0.weight"] = rng.standard_normal((1, 32, 1, 1)).astype(
            np.float32) * 0.05
        sd["out.0.bias"] = np.zeros(1, np.float32)

        variables = jax.tree_util.tree_map(jnp.asarray,
                                           convert.convert_composition(sd))
        from stitchax.models import CompositionNet
        model = CompositionNet()
        w = jnp.zeros((1, 512, 512, 3), jnp.float32)
        m = jnp.ones((1, 512, 512, 1), jnp.float32)
        ref = model.init(jax.random.PRNGKey(0), w, w, m, m)
        ref_keys = {jax.tree_util.keystr(p): v.shape for p, v in
                    jax.tree_util.tree_leaves_with_path(ref)}
        got_keys = {jax.tree_util.keystr(p): v.shape for p, v in
                    jax.tree_util.tree_leaves_with_path(variables)}
        assert ref_keys == got_keys


def test_npz_param_snapshot_roundtrip(tmp_path):
    """save_params_npz/load_params_npz: bf16-stored float leaves round-trip
    to bf16 precision, non-float leaves exactly; path mismatches raise."""
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from stitchax import convert

    rng = np.random.default_rng(0)
    tree = {
        "flow": {"params": {"dense": {
            "kernel": rng.normal(size=(4, 8)).astype(np.float32),
            "bias": rng.normal(size=(8,)).astype(np.float32)}}},
        "homo": {"params": {"step": np.asarray(7, np.int32)}},
    }
    path = str(tmp_path / "snap.npz")
    convert.save_params_npz(path, tree)

    target = jax.tree_util.tree_map(
        lambda a: jnp.zeros(np.shape(a), np.asarray(a).dtype), tree)
    out = convert.load_params_npz(path, target)
    k = np.asarray(out["flow"]["params"]["dense"]["kernel"])
    ref = tree["flow"]["params"]["dense"]["kernel"]
    bf16 = ref.astype(jnp.bfloat16).astype(np.float32)
    np.testing.assert_array_equal(k, bf16)          # exactly the bf16 cast
    assert np.abs(k - ref).max() < 0.01
    assert int(out["homo"]["params"]["step"]) == 7  # int stored exactly
    assert convert.npz_has_subtree(path, "flow")
    assert not convert.npz_has_subtree(path, "comp")

    bad = {"flow": target["flow"]}                  # structure mismatch
    out2 = convert.load_params_npz(path, bad)       # subtree-only is fine
    assert np.asarray(out2["flow"]["params"]["dense"]["bias"]).shape == (8,)
    with pytest.raises(KeyError):
        convert.load_params_npz(path, {"nope": np.zeros(3, np.float32)})
