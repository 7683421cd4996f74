"""Adapter-level activation parity: the ACTUAL reference FlowHomoAdpater
(core/flowHomoAdpater.py) with tiny deterministic stub backbones vs
stitchax's train_eval_forward / stitch_model_step + stitch_render.

This pins the quirk chain to executing reference code instead of docstring
citations: DLT-at-/8 (ref :96), H2Mesh canvas bounds + int() truncation
(:258-271), translation-only img1 warp (:274-292), residual-flow re-render
+ flow-mask multiply (:312-317), double occlusion open at two resolutions
(:332-336), the non-overlap composition and mask2 squaring (:343-351), and
the mean/clip/3-channel mask outputs (:359-360).

The stub backbones are parameter-free pointwise functions implemented
identically in torch and jax, so any divergence is in the adapters.
"""

from types import SimpleNamespace

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ref_loader import import_ref, requires_reference

from stitchax.align import adapter as ad

pytestmark = requires_reference

# fixed tiny mixing matrix for the flow stub
W_FLOW = np.array([[0.9, -0.4], [-0.3, 0.7], [0.2, 0.5]], np.float32)
# generic non-axis-aligned corner offsets (px at the homo input resolution)
OFFSETS = np.array([-14.0, -9.0, 11.0, -6.0, -12.0, 7.0, 9.0, 13.0],
                   np.float32)


class _HomoStub(torch.nn.Module):
    def __init__(self, scale):
        super().__init__()
        self.off = torch.from_numpy(OFFSETS * scale)

    def forward(self, i1, i2):
        return self.off[None].expand(i1.shape[0], -1), None


class _FlowStub(torch.nn.Module):
    """flow = tanh(((i1-i2)/255) @ W) * 5 — pointwise, direction-sensitive,
    identical math to the jax stub below."""

    def forward(self, i1, i2, data=None):
        d = (i1 - i2).permute(0, 2, 3, 1) / 255.0
        f = torch.tanh(d @ torch.from_numpy(W_FLOW)) * 5.0
        f = f.permute(0, 3, 1, 2)
        if self.training:
            return [f]
        return (f, None)


def _jax_homo_fn(scale):
    def fn(a, b):
        return jnp.broadcast_to(jnp.asarray(OFFSETS * scale)[None],
                                (a.shape[0], 8))
    return fn


def _jax_flow_fn(a, b):
    d = (a - b) / 255.0
    f = jnp.tanh(d @ jnp.asarray(W_FLOW)) * 5.0
    return [f], None


def _ref_adapter(refs, scale):
    cfg = SimpleNamespace(
        detach_H=False, detach_flow=False, use_forward=False,
        only_homo=False, use_combine_h_flow=False,
        use_fb_consistency_mask=True, test_not_use_combine_h_flow=True)
    m = refs.FlowHomoAdpater(_HomoStub(scale), _FlowStub(), cfg).eval()
    return m


def _nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


@pytest.fixture(scope="module")
def refs():
    return import_ref("core.flowHomoAdpater")


class TestTrainEval:
    def test_train_eval_forward(self, refs, rng):
        H, W = 64, 80
        img1 = rng.uniform(0, 255, (1, 3, H, W)).astype(np.float32)
        img2 = rng.uniform(0, 255, (1, 3, H, W)).astype(np.float32)
        # offsets sized for the 64x80 frame
        m = _ref_adapter(refs, scale=0.5)
        with torch.no_grad():
            want = m.train_eval_foward(torch.from_numpy(img1),
                                       torch.from_numpy(img2))

        got = jax.jit(lambda a, b: ad.train_eval_forward(
            _jax_homo_fn(0.5), _jax_flow_fn, a, b,
            ad.AlignConfig(use_fb_consistency_mask=True)))(
            jnp.asarray(img1.transpose(0, 2, 3, 1)),
            jnp.asarray(img2.transpose(0, 2, 3, 1)))

        np.testing.assert_allclose(np.asarray(got["H"]),
                                   want["H"].numpy(), rtol=1e-4, atol=1e-4)
        for k in ("output_H", "output_H_inv", "final_warp_output"):
            np.testing.assert_allclose(np.asarray(got[k]), _nhwc(want[k]),
                                       rtol=1e-3, atol=0.05, err_msg=k)
        np.testing.assert_allclose(
            np.asarray(got["flow_predictions"][-1]),
            _nhwc(want["flow_predictions"][-1]), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got["overlap"]),
                                   want["overlap"].numpy(), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(got["origin_occlusion_mask"]),
            want["origin_occlusion_mask"].numpy(), atol=1e-5)


class TestStitchOut:
    def test_test_out_forward(self, refs, rng, monkeypatch):
        # flowHomoAdpater.py:260 calls .cuda() unconditionally inside the
        # canvas-bounds computation; neutralize it for CPU execution
        monkeypatch.setattr(torch.Tensor, "cuda",
                            lambda self, *a, **k: self)
        H, W = 200, 160
        img1 = rng.uniform(0, 255, (1, 3, H, W)).astype(np.float32)
        img2 = rng.uniform(0, 255, (1, 3, H, W)).astype(np.float32)
        m = _ref_adapter(refs, scale=1.0)  # offsets at the 512 model res
        with torch.no_grad():
            want = m.test_out_forward(torch.from_numpy(img1),
                                      torch.from_numpy(img2))

        cfg = ad.AlignConfig(use_fb_consistency_mask=True)
        i1 = jnp.asarray(img1.transpose(0, 2, 3, 1))
        i2 = jnp.asarray(img2.transpose(0, 2, 3, 1))
        step = jax.jit(lambda a, b: ad.stitch_model_step(
            _jax_homo_fn(1.0), _jax_flow_fn, a, b, cfg))
        out = step(i1, i2)

        # per-pair canvas bounds: (B,) arrays since the batched align step
        assert int(out["width_min"][0]) == want["width_min"]
        assert int(out["height_min"][0]) == want["height_min"]
        out_h, out_w = want["out_height"], want["out_width"]

        render = jax.jit(lambda *a: ad.stitch_render(
            *a, out_h=out_h, out_w=out_w, cfg=cfg))
        r = render(i1, i2, out["H"], out["flow"],
                   out["origin_occlusion_mask"],
                   out["width_min"], out["height_min"])

        np.testing.assert_allclose(
            np.asarray(out["origin_occlusion_mask"])[..., 0],
            want["origin_occlusion_mask"].numpy()[:, 0], atol=1e-5)
        np.testing.assert_allclose(np.asarray(r["occlusion_mask"])[..., 0],
                                   want["occlusion_mask"].numpy()[:, 0],
                                   atol=1e-5)
        # reference residual_flow is the native-res forward flow (:312)
        np.testing.assert_allclose(np.asarray(out["flow"]),
                                   _nhwc(want["residual_flow"]),
                                   rtol=1e-3, atol=1e-3)
        for ours, theirs in (("H_warp", "H_warp"),
                             ("final_warp", "final_warp"),
                             ("output1", "output1"),
                             ("output2", "output2")):
            np.testing.assert_allclose(np.asarray(r[ours]),
                                       _nhwc(want[theirs]),
                                       rtol=1e-3, atol=0.1, err_msg=ours)
        # reference masks are mean->clip->3-channel repeats (:359-360)
        for k in ("mask1", "mask2"):
            np.testing.assert_allclose(np.asarray(r[k])[..., 0],
                                       want[k].numpy()[:, 0],
                                       rtol=1e-3, atol=1e-3, err_msg=k)
        # reference blend is uint8-cast after clip (:356) — a truncation,
        # so ours can sit up to ~1 gray level above it
        np.testing.assert_allclose(np.asarray(r["blend_image"]),
                                   _nhwc(want["blend_image"]).astype(
                                       np.float32),
                                   atol=1.1)
