"""Host-side reconstruction of warp1/mask1/ave_fusion vs the full device
fetch.

warp1/mask1 are a translation-only canvas warp of img1 and ave_fusion is
the closed-form blend of packed outputs, so the production stitcher skips
fetching them through the relay link (41% fewer packed bytes — the
per-pair bottleneck) and rebuilds them on the host
(stitcher.host_translation_warp + the _tps_step blend formula verbatim).
These tests pin the reconstruction against the device values:
warp1/mask1 to float32-ulp/uint8-LSB tolerance, ave_fusion to the uint8
quantization of its inputs.
"""

import numpy as np
import jax.numpy as jnp

from stitchax.align.adapter import AlignConfig
from stitchax.run.stitcher import Stitcher, host_translation_warp
from stitchax.tps.pipeline import TPSConfig


class _Cfg(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)


def _stitcher(host_reconstruct, shift=24, W=160):
    S = 512

    def homo_fn(a, b):
        dx = -shift * (S / W)
        off = jnp.array([[dx, 0, dx, 0, dx, 0, dx, 0]], jnp.float32)
        return jnp.broadcast_to(off, (a.shape[0], 8))

    def flow_fn(a, b):
        zero = jnp.zeros(a.shape[:3] + (2,), a.dtype)
        return [zero], zero[:, ::8, ::8]

    st = Stitcher(None, _Cfg(swap_image=False),
                  AlignConfig(use_fb_consistency_mask=False,
                              canvas_bucket=64),
                  TPSConfig(grid_h=8, grid_w=8),
                  inpainter_name="cv_inpainter",
                  homo_fn=homo_fn, flow_fn=flow_fn,
                  host_reconstruct=host_reconstruct)
    # these tests pin the host-RECONSTRUCTION math against exact device
    # values; the yuv420 pack codec has its own bound tests
    # (test_pack_yuv.py) and would blur the comparison on noise content
    st.pack_mode = "rgb"
    return st


def _pair(rng, H=128, W=160, shift=24):
    scene = rng.uniform(20, 235, (H, W + shift, 3)).astype(np.float32)
    return scene[:, :W].copy(), scene[:, shift:].copy()


def test_reconstruction_matches_device_fetch(rng):
    img1, img2 = _pair(rng)
    full = _stitcher(host_reconstruct=False).stitch(img1, img2)
    rec = _stitcher(host_reconstruct=True).stitch(img1, img2)

    assert set(full.keys()) == set(rec.keys())
    for k in ("flow_warp", "warp2", "mask2"):
        np.testing.assert_array_equal(
            full[k], rec[k], err_msg=f"packed key {k} changed")

    # homography warp of img2: same float32 math, XLA-fusion ulps only
    d_hw = np.abs(full["H_warp"] - rec["H_warp"])
    assert d_hw.max() <= 1.0 + 1e-6
    assert (d_hw > 0).mean() < 0.01

    # translation warp: float32 reassociation ulps -> at most 1 uint8 LSB
    # on pixels whose value lands exactly on a rounding boundary
    d_w1 = np.abs(full["warp1"] - rec["warp1"])
    assert d_w1.max() <= 1.0 + 1e-6
    assert (d_w1 > 0).mean() < 0.01
    d_m1 = np.abs(full["mask1"] - rec["mask1"])
    assert d_m1.max() <= 1.0 / 255.0 + 1e-6

    # blend: same formula, uint8-quantized o2/m2 inputs on the host side
    d_ave = np.abs(full["ave_fusion"] - rec["ave_fusion"])
    assert d_ave.max() <= 3.0
    assert d_ave.mean() < 0.2


def test_host_translation_warp_semantics(rng):
    """Direct pin of the numpy replica against the device op it mirrors
    (ops.homography_warp with I_mat = N^-1 T M, interior-rule weights)."""
    from stitchax import ops

    H, W = 96, 112
    out_h, out_w = 192, 256
    img = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    wm, hm = -37.25, -21.75

    w1, m1 = host_translation_warp(img, wm, hm, out_h, out_w)

    M = ops.scale_matrix(float(out_h), float(out_w))
    N = ops.scale_matrix(float(H), float(W))
    T = jnp.eye(3).at[0, 2].set(wm).at[1, 2].set(hm)
    I_mat = jnp.linalg.inv(N) @ T @ M
    dev = ops.homography_warp(
        jnp.asarray(np.concatenate([img, np.ones_like(img)], -1)),
        I_mat, out_h, out_w)
    dev = np.asarray(dev)

    np.testing.assert_allclose(w1, dev[..., 0:3], atol=1e-2)
    np.testing.assert_allclose(
        m1, np.clip(dev[..., 3:6].mean(-1, keepdims=True), 0, 1), atol=1e-5)
    # coverage mask is exactly 0 outside / 1 strictly inside
    assert m1.max() == 1.0 and m1.min() == 0.0


def test_composition_reconstruction_matches_device_fetch(rng):
    """With the composition stage on and the canvas >= 512 (no upsize,
    out.py:280-284 rule), composition/learned_mask2 never cross the link:
    the host rebuilds them from packed lm1/warp2/mask2 + its own warp1.
    Pinned against the full device fetch to the pack quantization (~1
    intensity level from lm1's 1/255 step)."""
    import jax
    from stitchax.run.stitcher import StitchModels
    from stitchax.models.udis2 import CompositionNet

    H, W, shift = 512, 560, 48
    comp_model = CompositionNet()
    k = jax.random.PRNGKey(0)
    z3 = jnp.zeros((1, H, W, 3), jnp.float32)
    z1 = jnp.zeros((1, H, W, 1), jnp.float32)
    comp_params = jax.jit(comp_model.init)(k, z3, z3, z1, z1)
    models = StitchModels(None, None, None, None,
                          comp_model=comp_model, comp_params=comp_params)

    def build(host_reconstruct):
        s = _stitcher(host_reconstruct, shift=shift, W=W)
        s.models = models
        return s

    img1, img2 = _pair(rng, H=H, W=W, shift=shift)
    full = build(False).stitch(img1, img2)
    rec = build(True).stitch(img1, img2)

    assert min(full["composition"].shape[:2]) >= 448  # canvas-res comp ran
    np.testing.assert_array_equal(full["learned_mask1"],
                                  rec["learned_mask1"])
    d_lm2 = np.abs(full["learned_mask2"] - rec["learned_mask2"])
    assert d_lm2.max() <= 2.0 / 255.0 + 1e-6
    d_c = np.abs(full["composition"] - rec["composition"])
    assert d_c.max() <= 3.0
    assert d_c.mean() < 0.2
