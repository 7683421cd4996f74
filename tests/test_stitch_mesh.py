"""Mesh-sharded stitch path (SURVEY.md §2.10 deployment story).

The reference scatters the pair batch across GPUs with nn.DataParallel
(reference: out.py:80). TPU-native equivalent: stitch_model_step sharded
over the data mesh with make_parallel_stitch_step — per-pair outputs must
match the single-device path exactly (the step is per-pair independent:
canvas boxes reduce over mesh vertices only)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stitchax.align.adapter import AlignConfig, stitch_model_step
from stitchax.parallel import (make_mesh, make_parallel_stitch_step,
                               shard_batch)


def _per_pair_homo(a, b):
    # per-pair-distinct corner offsets (derived from image content) so
    # every pair lands in a DIFFERENT canvas box — a sharded step that
    # coupled pairs would show it
    from tests.stub_backbones import OFFSETS
    scale = 0.5 + 3.0 * a[:, 0, 0, 0][:, None] / 255.0
    return jnp.asarray(OFFSETS)[None] * scale


def _flow(a, b):
    from tests.stub_backbones import stub_flow_fn
    return stub_flow_fn(a, b)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
class TestStitchMesh:
    def test_sharded_matches_single_device(self, rng):
        S, B = 64, 8
        cfg = AlignConfig(model_size=S, use_fb_consistency_mask=True)
        img1 = jnp.asarray(rng.uniform(0, 255, (B, S, S, 3)), jnp.float32)
        img2 = jnp.asarray(rng.uniform(0, 255, (B, S, S, 3)), jnp.float32)

        step = lambda i1, i2: stitch_model_step(
            _per_pair_homo, _flow, i1, i2, cfg)

        ref = jax.jit(step)(jax.device_put(img1, jax.devices()[0]),
                            jax.device_put(img2, jax.devices()[0]))

        mesh = make_mesh(8)
        pstep = make_parallel_stitch_step(step, mesh)
        s1, s2 = shard_batch((img1, img2), mesh)
        out = pstep(s1, s2)

        # canvas boxes genuinely differ per pair (the independence probe)
        boxes = np.asarray(out["canvas_box"])
        assert len({tuple(b) for b in boxes}) > 1

        for key in ref:
            # partitioned vs single-device compiles vectorize fp math
            # slightly differently; 5e-3 on a [0,255] image scale is
            # far below a quantization level
            np.testing.assert_allclose(
                np.asarray(ref[key], np.float32),
                np.asarray(out[key], np.float32),
                rtol=2e-4, atol=5e-3, err_msg=key)

    def test_outputs_sharded_on_pair_axis(self, rng):
        S, B = 64, 8
        cfg = AlignConfig(model_size=S, use_fb_consistency_mask=False)
        img1 = jnp.asarray(rng.uniform(0, 255, (B, S, S, 3)), jnp.float32)
        img2 = jnp.asarray(rng.uniform(0, 255, (B, S, S, 3)), jnp.float32)
        mesh = make_mesh(8)
        pstep = make_parallel_stitch_step(
            lambda i1, i2: stitch_model_step(_per_pair_homo, _flow,
                                             i1, i2, cfg), mesh)
        out = pstep(*shard_batch((img1, img2), mesh))
        flow_sh = out["flow"].sharding
        # the pair axis stays sharded across the mesh on the way out
        assert flow_sh.spec[0] == "data", flow_sh
