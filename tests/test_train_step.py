"""Train-step unit test with stub backbones (the full-model path is covered
by __graft_entry__.dryrun_multichip; this keeps a fast version in the suite)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stitchax.align.adapter import AlignConfig
from stitchax.train import (LossConfig, OptimConfig, create_train_state,
                            make_train_step, restore_checkpoint,
                            save_checkpoint)


def _stub_fns():
    def homo_apply(p, a, b):
        # differentiable stub: scale param times image statistics
        return p["w"] * (a.mean((1, 2, 3)) - b.mean((1, 2, 3)))[:, None]

    def flow_apply(p, a, b):
        f = (a[..., :2] - b[..., :2]) * p["s"]
        return [f, f * 0.5], f[:, ::8, ::8]

    params = {"homo": {"w": jnp.ones((1, 8))},
              "flow": {"s": jnp.asarray(0.01)}}
    return homo_apply, flow_apply, params


class TestTrainStep:
    def test_two_steps_and_checkpoint(self, rng, tmp_path):
        homo_apply, flow_apply, params = _stub_fns()
        state, tx = create_train_state(params, OptimConfig(num_steps=10,
                                                           canonical_lr=1e-3))
        step = jax.jit(make_train_step(homo_apply, flow_apply, tx,
                                       AlignConfig(), LossConfig(),
                                       use_fb_consistency_mask=True))
        i1 = jnp.asarray(rng.uniform(0, 255, (2, 64, 64, 3)), jnp.float32)
        i2 = jnp.asarray(rng.uniform(0, 255, (2, 64, 64, 3)), jnp.float32)
        s1, m1 = step(state, i1, i2)
        s2, m2 = step(s1, i1, i2)
        assert int(s2.step) == 2
        assert np.isfinite(float(m2["total"]))
        # params actually moved
        moved = float(jnp.abs(s2.params["flow"]["s"] - 0.01))
        assert moved > 0

        # orbax round-trip
        path = str(tmp_path / "ckpt")
        save_checkpoint(path, jax.device_get(s2))
        restored = restore_checkpoint(path, s1)
        assert int(restored.step) == 2
        np.testing.assert_allclose(
            np.asarray(restored.params["flow"]["s"]),
            np.asarray(s2.params["flow"]["s"]))

    def test_remat_matches(self, rng):
        homo_apply, flow_apply, params = _stub_fns()
        state, tx = create_train_state(params, OptimConfig(num_steps=10))
        mk = lambda remat: jax.jit(make_train_step(
            homo_apply, flow_apply, tx, AlignConfig(), LossConfig(),
            use_fb_consistency_mask=False, remat=remat))
        i1 = jnp.asarray(rng.uniform(0, 255, (1, 64, 64, 3)), jnp.float32)
        i2 = jnp.asarray(rng.uniform(0, 255, (1, 64, 64, 3)), jnp.float32)
        _, m_a = mk(False)(state, i1, i2)
        _, m_b = mk(True)(state, i1, i2)
        np.testing.assert_allclose(float(m_a["total"]), float(m_b["total"]),
                                   rtol=1e-5)
