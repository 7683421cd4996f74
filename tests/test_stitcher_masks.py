"""Regression: soft learned_mask1/2 must survive the packed-uint8 fetch.

Round-2 advisor finding: composition outputs were stored in result at
[0,255] scale, but the device-side uint8 pack classifies any (H,W,1)
canvas array as a mask and packs it via clip(m,0,1)*255 — binarizing a
[0,255]-scaled soft mask at a 1/255 threshold. The bug only triggered
when the canvas was >=512 in both dims (no composition resize branch),
which no prior e2e test covered.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stitchax.align.adapter import AlignConfig
from stitchax.models import CompositionNet
from stitchax.run.stitcher import Stitcher
from stitchax.tps.pipeline import TPSConfig


class _Cfg(dict):
    def __getattr__(self, k):
        return self[k]


class _CompOnlyModels:
    """Stand-in for StitchModels when only the composition net is needed
    (homo/flow are stubbed via Stitcher's homo_fn/flow_fn overrides)."""

    def __init__(self, size=512):
        self.comp_model = CompositionNet()
        k = jax.random.PRNGKey(0)
        img = jnp.zeros((1, size, size, 3), jnp.float32)
        m = jnp.zeros((1, size, size, 1), jnp.float32)
        self.comp_params = jax.jit(self.comp_model.init)(k, img, img, m, m)
        self.version = 0


@pytest.mark.slow
def test_learned_masks_stay_soft_at_large_canvas(rng):
    H, W, shift = 512, 512, 24
    base = rng.uniform(40, 215, (H // 16, (W + shift) // 16, 3))
    from PIL import Image
    scene = np.asarray(Image.fromarray(base.astype(np.uint8)).resize(
        (W + shift, H), Image.BILINEAR), np.float32)
    img1 = scene[:, :W].copy()
    img2 = scene[:, shift:].copy()
    S = 512

    def homo_fn(a, b):
        dx = -shift * (S / W)
        off = jnp.array([[dx, 0, dx, 0, dx, 0, dx, 0]], jnp.float32)
        return jnp.broadcast_to(off, (a.shape[0], 8))

    def flow_fn(a, b):
        zero = jnp.zeros(a.shape[:3] + (2,), a.dtype)
        return [zero], zero[:, ::8, ::8]

    st = Stitcher(_CompOnlyModels(), _Cfg(swap_image=False),
                  AlignConfig(use_fb_consistency_mask=False,
                              canvas_bucket=64),
                  TPSConfig(grid_h=8, grid_w=8),
                  inpainter_name="cv_inpainter",
                  homo_fn=homo_fn, flow_fn=flow_fn)
    out = st.stitch(img1, img2)

    # canvas is >= 512 on both axes -> no composition resize branch; the
    # learned masks went through the uint8 mask-pack path
    assert out["out_h"] >= 512 and out["out_w"] >= 512
    for k in ("learned_mask1", "learned_mask2"):
        m = np.asarray(out[k])
        assert m.min() >= 0.0 and m.max() <= 1.0
        # random-init sigmoid seam masks are soft: a binarized (all ~0 or
        # ~1) mask means the pack path rescaled/clipped it again
        frac_mid = ((m > 0.02) & (m < 0.98)).mean()
        assert frac_mid > 0.2, f"{k} was binarized (frac_mid={frac_mid})"


@pytest.mark.slow
def test_small_canvas_composition_rides_second_pack(rng):
    """Advisor r4 #2: when the canvas is < 512 the composition runs at
    UPSIZED resolution (reference out.py:280-284) and used to be fetched
    as raw float32 via `other` — larger than the whole packed buffer on
    the ~13 MB/s relay. It must now ride a second uint8 pack at its own
    resolution."""
    H, W, shift = 256, 256, 24
    base = rng.uniform(40, 215, (H // 16, (W + shift) // 16, 3))
    from PIL import Image
    scene = np.asarray(Image.fromarray(base.astype(np.uint8)).resize(
        (W + shift, H), Image.BILINEAR), np.float32)
    img1 = scene[:, :W].copy()
    img2 = scene[:, shift:].copy()

    def homo_fn(a, b):
        dx = -shift * (512 / W)
        off = jnp.array([[dx, 0, dx, 0, dx, 0, dx, 0]], jnp.float32)
        return jnp.broadcast_to(off, (a.shape[0], 8))

    def flow_fn(a, b):
        zero = jnp.zeros(a.shape[:3] + (2,), a.dtype)
        return [zero], zero[:, ::8, ::8]

    st = Stitcher(_CompOnlyModels(), _Cfg(swap_image=False),
                  AlignConfig(use_fb_consistency_mask=False,
                              canvas_bucket=64),
                  TPSConfig(grid_h=8, grid_w=8),
                  inpainter_name="cv_inpainter",
                  homo_fn=homo_fn, flow_fn=flow_fn)
    out = st.stitch(img1, img2)

    assert out["out_h"] < 512 or out["out_w"] < 512
    comp = np.asarray(out["composition"])
    # upsized to min side 512 (the reference resize rule)
    assert min(comp.shape[:2]) >= 512
    assert np.isfinite(comp).all() and comp.max() <= 255.0
    for k in ("learned_mask1", "learned_mask2"):
        m = np.asarray(out[k])
        assert m.shape[:2] == comp.shape[:2]
        assert m.min() >= 0.0 and m.max() <= 1.0
        frac_mid = ((m > 0.02) & (m < 0.98)).mean()
        assert frac_mid > 0.2, f"{k} was binarized (frac_mid={frac_mid})"
    # the second pack engaged (no raw-float32 `other` fetch): its compile
    # event is keyed by the upsized dims with 1 image + 2 masks
    assert any(k[0] == "pack" and k[3:5] == (1, 2)
               for k in st.compile_events), st.compile_events
