"""Stitcher param re-binding: loading new weights after the first stitch
must take effect without manually clearing the jit cache.

Round-1 footgun (VERDICT weak #7): params are baked into jitted stages at
first trace; the fix keys the stage cache on StitchModels.version, bumped by
every restore()/restore_torch()/load_torch_init(). Reference behavior being
modeled: out.py reloads checkpoints freely between sweeps.
"""

import numpy as np
import jax.numpy as jnp

from stitchax.align.adapter import AlignConfig
from stitchax.run.stitcher import StitchModels, Stitcher
from stitchax.tps.pipeline import TPSConfig

from test_stitcher_e2e import _Cfg, make_pair


class _FakeModels:
    """Duck-typed StitchModels: just version + a 'weight' the stub
    backbones close over (read at trace time, like the real params)."""

    def __init__(self):
        self.version = 0
        self.flow_bias = 0.0
        self.comp_model = None

    def restore_like(self, flow_bias: float):
        self.flow_bias = flow_bias
        self.version += 1


def test_restore_after_first_stitch_takes_effect(rng):
    H, W, shift = 128, 160, 24
    img1, img2, _ = make_pair(rng, H, W, shift)
    S = 512
    models = _FakeModels()

    def homo_fn(a, b):
        dx = -shift * (S / W)
        off = jnp.array([[dx, 0, dx, 0, dx, 0, dx, 0]], jnp.float32)
        return jnp.broadcast_to(off, (a.shape[0], 8))

    def flow_fn(a, b):
        # closes over models.flow_bias exactly like the real closures
        # close over models.flow_params
        zero = jnp.zeros(a.shape[:3] + (2,), a.dtype) + models.flow_bias
        return [zero], zero[:, ::8, ::8]

    st = Stitcher(models, _Cfg(swap_image=False),
                  AlignConfig(use_fb_consistency_mask=False,
                              canvas_bucket=64),
                  TPSConfig(grid_h=8, grid_w=8),
                  inpainter_name="cv_inpainter",
                  homo_fn=homo_fn, flow_fn=flow_fn)

    out_a = st.stitch(img1, img2)
    models.restore_like(flow_bias=4.0)  # "load new weights"
    out_b = st.stitch(img1, img2)

    # a 4-px flow bias must shift the flow warp: outputs differ materially
    diff = np.abs(out_a["flow_warp"].astype(np.float64)
                  - out_b["flow_warp"][:out_a["flow_warp"].shape[0],
                                       :out_a["flow_warp"].shape[1]]).mean()
    assert diff > 1.0, "restore() after first stitch was silently ignored"


def test_stitchmodels_restore_bumps_version(tmp_path):
    m = StitchModels(flow_model=None, flow_params={"w": np.ones(3)},
                     homo_model=None, homo_params={"b": np.zeros(2)})
    assert m.version == 0
    m.save(str(tmp_path / "ckpt"))
    m.restore(str(tmp_path / "ckpt"))
    assert m.version == 1
