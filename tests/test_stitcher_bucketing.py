"""Input-resolution bucketing: a mixed-resolution sweep must reuse a few
compiled programs instead of compiling one set per distinct input shape
(each distinct program costs ~5 min through the remote-compile tunnel).
"""

import numpy as np
import jax.numpy as jnp

from stitchax.align.adapter import AlignConfig
from stitchax.run.stitcher import Stitcher
from stitchax.tps.pipeline import TPSConfig

from test_stitcher_e2e import _Cfg, make_pair


def _make_stitcher(input_bucket):
    S = 512
    shift = 24

    def homo_fn(a, b):
        dx = -shift * (S / 160)
        off = jnp.array([[dx, 0, dx, 0, dx, 0, dx, 0]], jnp.float32)
        return jnp.broadcast_to(off, (a.shape[0], 8))

    def flow_fn(a, b):
        zero = jnp.zeros(a.shape[:3] + (2,), a.dtype)
        return [zero], zero[:, ::8, ::8]

    return Stitcher(None, _Cfg(swap_image=False),
                    AlignConfig(use_fb_consistency_mask=False,
                                canvas_bucket=64),
                    TPSConfig(grid_h=8, grid_w=8),
                    inpainter_name="cv_inpainter",
                    homo_fn=homo_fn, flow_fn=flow_fn,
                    input_bucket=input_bucket)


def test_mixed_resolution_sweep_compiles_few_programs(rng):
    st = _make_stitcher(input_bucket=64)
    shapes = [(120, 150), (125, 155), (128, 158), (118, 160)]
    for H, W in shapes:
        img1 = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
        img2 = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
        out = st.stitch(img1, img2)
        assert out["ave_fusion"].ndim == 3
    # all four shapes bucket to (128, 192): one program per stage
    # (model / render / tps / output-pack)
    stages = {k[0] for k in st.compile_events}
    assert len(st.compile_events) <= len(stages) <= 4, st.compile_events


def test_native_res_when_bucketing_off(rng):
    st = _make_stitcher(input_bucket=0)
    H, W = 128, 160
    img1, img2, _ = make_pair(rng, H, W, 24)
    out = st.stitch(img1, img2)
    # no resize: canvas extent reflects the native input width + shift
    assert abs(out["out_w"] - (W + 24)) <= 2
