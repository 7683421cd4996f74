"""TPS breaking-pipeline BACK-half parity vs the ACTUAL reference code
(VERDICT r3 weak #2 / ask #2): warp_by_tps -> 11x11 open mask cleanup ->
final_warp mixing -> blend (core/inference/tps_pipline.py:137-205), the
mix plugins' hole algebra (core/inference/mix_methods/
all_img1_with_inpaint.py:8-114, inpaint_all_area.py:8-74) and
dilate_thin_area (core/inference/utils.py:124-160).

Three pinning layers:
  1. dilate_thin_area / mix_fn: direct execution of the reference plugins
     on identical inputs with a deterministic fake inpainter -> exact.
  2. Back half in isolation: the reference's TPS backend is monkeypatched
     to return the SAME warped tensors stitchax's warp produces, so the
     mask open + mix + blend algebra is compared per-pixel exact.
  3. End-to-end tps_H_warp with tps_method='other' (the numpy TPS backend;
     needs only cv2.remap, present in this cv2 build) vs tps_break_warp ->
     tolerance diffs (the backends legitimately differ sub-pixel: uint8
     INTER_CUBIC remap on an i/(W-1) grid vs float bilinear on i/W).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ref_loader import import_ref, requires_reference

from stitchax.ops import morphology as M
from stitchax.tps.pipeline import (TPSConfig, mix_tps_with_flow_warp,
                                   tps_break_warp)

pytestmark = requires_reference

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def refs():
    return {
        "pip": import_ref("core.inference.tps_pipline"),
        "utils": import_ref("core.inference.utils"),
        "mix_img1": import_ref(
            "core.inference.mix_methods.all_img1_with_inpaint"),
        "mix_all": import_ref("core.inference.mix_methods.inpaint_all_area"),
    }


# ------------------------------------------------------------ input builders

def smooth_img(rng, h, w, c=3, grid=(5, 6), lo=4.0, hi=251.0):
    """Integer-valued smooth image so the reference's uint8 round-trips are
    lossless. Values >= 4 keep the `final_warp >= 3` quirk well-defined."""
    small = rng.uniform(lo, hi, (grid[0], grid[1], c)).astype(np.float32)
    big = cv2.resize(small, (w, h), interpolation=cv2.INTER_LINEAR)
    return np.rint(big.reshape(h, w, c)).astype(np.float32)


def quad_mask(h, w, quad):
    """Filled convex quad (vertices xy, consistent winding) -> (h, w) {0,1}."""
    yy, xx = np.mgrid[0:h, 0:w]
    quad = np.asarray(quad, np.float32)
    m = np.ones((h, w), bool)
    for i in range(4):
        a, b = quad[i], quad[(i + 1) % 4]
        cross = ((b[0] - a[0]) * (yy - a[1]) - (b[1] - a[1]) * (xx - a[0]))
        m &= cross >= 0
    return m.astype(np.float32)


def nchw(x):
    """(H, W, C) numpy -> (1, C, H, W) torch."""
    return torch.from_numpy(np.ascontiguousarray(x.transpose(2, 0, 1)))[None]


def make_geometry(seed, img_hw=(96, 120), pads=(18, 22, 14, 16)):
    """Structurally-valid breaking-stage inputs mirroring what the adapter
    emits (reference assembly: out.py:195-260). Returns a dict of numpy
    HWC arrays plus canvas metadata."""
    rng = np.random.default_rng(seed)
    img_h, img_w = img_hw
    l, r, t, b = pads
    out_h, out_w = img_h + t + b, img_w + l + r
    width_min, height_min = float(-l), float(-t)

    output1 = np.zeros((out_h, out_w, 3), np.float32)
    output1[t:t + img_h, l:l + img_w] = smooth_img(rng, img_h, img_w)
    mask1 = np.zeros((out_h, out_w, 1), np.float32)
    mask1[t:t + img_h, l:l + img_w] = 1.0

    jx, jy = rng.integers(-6, 7, 2)
    hq = [(l + 10 + jx, t - 8 + jy), (l + img_w + 14 + jx, t + 2 + jy),
          (l + img_w + 6 + jx, t + img_h + 10 + jy),
          (l + 2 + jx, t + img_h - 2 + jy)]
    h_warp_mask = quad_mask(out_h, out_w, hq)[..., None]
    h_warp = smooth_img(rng, out_h, out_w) * h_warp_mask

    fq = [(q[0] + 4, q[1] + 3) for q in hq]
    fw_mask = quad_mask(out_h, out_w, fq)[..., None]
    final_warp = smooth_img(rng, out_h, out_w) * fw_mask

    # occlusion: mostly ones with a blob hole -> filters some border points
    occ = np.ones((out_h, out_w, 1), np.float32)
    cy, cx = rng.integers(t, t + img_h), rng.integers(l, l + img_w)
    yy, xx = np.mgrid[0:out_h, 0:out_w]
    occ[((yy - cy) ** 2 + (xx - cx) ** 2) < 18 ** 2] = 0.0

    # smooth flow below the auto flow_limit ((img_h+img_w)/2//8 = 13),
    # plus a spiky corner patch above it to exercise the pair filter
    flow = smooth_img(rng, img_h, img_w, c=2, grid=(4, 5), lo=-6, hi=6)
    flow[:14, :18] += rng.uniform(20, 40, (14, 18, 2)).astype(np.float32)

    return dict(output1=output1, mask1=mask1, h_warp=h_warp,
                h_warp_mask=h_warp_mask, final_warp=final_warp,
                occlusion=occ, flow=flow, width_min=width_min,
                height_min=height_min, out_h=out_h, out_w=out_w,
                img_h=img_h, img_w=img_w, pads=pads)


def ref_tps_config(**overrides):
    """The shipped TPS_PIPELINE_CONFIG key surface
    (inf_configs/all_img1_with_inpaint_g12_transRef.py:4-57)."""
    from types import SimpleNamespace
    d = dict(grid_h=12, grid_w=12, pad_num=4,
             get_pt_methods=["advanced_uniform_multi"], tps_method="other",
             flow_limit=-1, add_corner=False, add_meshgrid=False,
             affine_scale=1.0, kernel_scale=1.0, use_boundary_limit=False,
             residual_flow_use_forward=False, use_occ_filter=True,
             use_border_points_mask=True, do_avg_pooling=True,
             output2_is_only_tps=True, use_valid_on_flow=False)
    d.update(overrides)
    return SimpleNamespace(**d)


def run_reference(refs, g, cfg, monkeypatch=None, fake_warps=None):
    """Drive the reference tps_H_warp end-to-end (inputs assembled exactly
    like out.py:238-261). fake_warps=(mask_t, img_t) monkeypatches the TPS
    backend to inject those warped tensors (call order: mask then image,
    tps_pipline.py:415-418)."""
    from types import SimpleNamespace
    inputs = SimpleNamespace(
        output1=nchw(g["output1"]),
        mask1=nchw(np.repeat(g["mask1"], 3, -1)),
        H_warp=nchw(g["h_warp"]),
        H_warp_mask=nchw(np.repeat(g["h_warp_mask"], 3, -1)),
        final_warp=nchw(g["final_warp"]),
        mask2=nchw(np.repeat(g["h_warp_mask"], 3, -1)),
        residual_flow=nchw(g["flow"]),
        valid=None,
        occlusion_mask=nchw(g["occlusion"]),
        border_points_mask=nchw(g["occlusion"]),  # use_occ_filter=True
    )
    image_limit = SimpleNamespace(width_min=g["width_min"],
                                  height_min=g["height_min"],
                                  out_height=g["out_h"],
                                  out_width=g["out_w"])
    if fake_warps is not None:
        calls = []

        def fake(img_tensor, c_src, c_dst, dshape=None):
            calls.append(img_tensor.shape)
            out = fake_warps[0] if len(calls) == 1 else fake_warps[1]
            return out.clone()

        monkeypatch.setattr(refs["pip"], "tensor2_warp_image_cv", fake)
    with torch.no_grad():
        return refs["pip"].tps_H_warp(inputs, image_limit, cfg,
                                      inpaint_fn=None)


def run_stitchax(g, cfg):
    return {k: np.asarray(v) for k, v in tps_break_warp(
        jnp.asarray(g["output1"]), jnp.asarray(g["mask1"]),
        jnp.asarray(g["h_warp"]), jnp.asarray(g["h_warp_mask"]),
        jnp.asarray(g["final_warp"]), jnp.asarray(g["flow"]),
        jnp.asarray(g["width_min"]), jnp.asarray(g["height_min"]),
        cfg, occlusion_mask=jnp.asarray(g["occlusion"]),
    ).items()}


def chw0(t):
    """Reference (1, C, H, W) tensor -> (H, W, C) numpy."""
    return t[0].detach().cpu().float().numpy().transpose(1, 2, 0)


# ----------------------------------------------------- dilate_thin_area


class TestDilateThinArea:
    @pytest.mark.parametrize("dks,tks,seed", [(8, 8, 0), (8, 16, 1),
                                              (8, 8, 2), (6, 10, 3)])
    def test_matches_reference(self, refs, dks, tks, seed):
        rng = np.random.default_rng(seed)
        h, w = 72, 88
        # blobs + a thin sliver: exercises both the thick and thin paths
        m = (smooth_img(rng, h, w, c=1, grid=(6, 7), lo=0, hi=1)
             > 0.55).astype(np.float32)
        m[30:32, 5:80] = 1.0  # 2px-thin sliver
        m3 = np.repeat(m, 3, -1)
        with torch.no_grad():
            want = refs["utils"].dilate_thin_area(
                nchw(m3), dilation_kernel_size=dks,
                thickening_kernel_size=tks, is_plot=False).numpy()
        got = np.asarray(M.dilate_thin_area(
            jnp.asarray(m3), dilation_kernel_size=dks,
            thickening_kernel_size=tks))
        np.testing.assert_allclose(got, want[0].transpose(1, 2, 0), atol=1e-6)


# ------------------------------------------- back half exact (injected warp)


class TestBackHalfExact:
    @pytest.mark.parametrize("seed", [10, 11])
    def test_mask_cleanup_mix_blend(self, refs, monkeypatch, seed):
        g = make_geometry(seed)
        rng = np.random.default_rng(seed + 100)
        out_h, out_w = g["out_h"], g["out_w"]

        # synthetic "TPS-warped" image+mask, with speckles the 11x11 open
        # must remove and pinholes it must NOT close (open ≠ close)
        inj_img = smooth_img(rng, out_h, out_w)
        inj_mask = quad_mask(out_h, out_w,
                             [(28, 6), (out_w - 14, 18),
                              (out_w - 22, out_h - 10), (20, out_h - 18)])
        for _ in range(6):  # isolated speckles (eroded away by the open)
            y, x = rng.integers(0, out_h - 4), rng.integers(0, out_w - 4)
            inj_mask[y:y + 3, x:x + 3] = 1.0 - inj_mask[y, x]
        inj_mask = inj_mask[..., None]

        cfg_ref = ref_tps_config()
        ref_out = run_reference(
            refs, g, cfg_ref, monkeypatch,
            fake_warps=(nchw(np.repeat(inj_mask, 3, -1)).to(torch.uint8),
                        nchw(inj_img).to(torch.uint8)))

        got = {k: np.asarray(v) for k, v in mix_tps_with_flow_warp(
            jnp.asarray(inj_img), jnp.asarray(inj_mask),
            jnp.asarray(g["output1"]), jnp.asarray(g["mask1"]),
            jnp.asarray(g["final_warp"]), TPSConfig()).items()}

        np.testing.assert_allclose(got["tps_output"], chw0(ref_out["tps_output"]),
                                   atol=1e-3)
        np.testing.assert_allclose(got["mix_tps_flow_warp"],
                                   chw0(ref_out["mix_tps_flow_warp"]), atol=1e-3)
        np.testing.assert_allclose(got["mix_tps_flow_warp_mask"],
                                   chw0(ref_out["mix_tps_flow_warp_mask"]),
                                   atol=1e-6)
        np.testing.assert_allclose(got["output2"], chw0(ref_out["output2"]),
                                   atol=1e-3)
        np.testing.assert_allclose(got["mask2"], chw0(ref_out["mask2"]),
                                   atol=1e-6)

        # blend: reference divides 0/0 -> nan outside both masks, then
        # truncates to uint8; compare only where the union mask covers
        want_blend = chw0(ref_out["new_blend_image"])
        denom = (g["mask1"] + got["mix_tps_flow_warp_mask"])[..., 0] > 0
        diff = np.abs(got["new_blend_image"] - want_blend)[denom]
        assert diff.max() <= 1.0 + 1e-3  # uint8 truncation of x.999.. floats
        assert (diff <= 0.5).mean() > 0.995


# --------------------------------------------- e2e with the 'other' backend


E2E_SEEDS = [0, 1, 2]


class TestEndToEndOtherBackend:
    @pytest.mark.parametrize("seed", E2E_SEEDS)
    def test_full_pipeline_tolerance(self, refs, seed):
        g = make_geometry(seed)
        ref_out = run_reference(refs, g, ref_tps_config())
        got = run_stitchax(g, TPSConfig())

        # TPS mask after cleanup: sub-pixel backend differences live in a
        # thin band at the warped border
        want_mask = chw0(ref_out["mask2"])[..., 0]
        got_mask = got["mask2"][..., 0]
        agree = (want_mask == got_mask).mean()
        assert agree > 0.97, f"tps mask agreement {agree:.4f}"

        # final mixed warp where both sides agree the pixel is covered
        want_m2 = chw0(ref_out["mix_tps_flow_warp_mask"])[..., 0]
        got_m2 = got["mix_tps_flow_warp_mask"][..., 0]
        assert (want_m2 == got_m2).mean() > 0.97

        both = (want_m2 * got_m2) > 0
        want_img = chw0(ref_out["mix_tps_flow_warp"])
        diff = np.abs(got["mix_tps_flow_warp"] - want_img)[both]
        assert np.median(diff) <= 2.0, f"median {np.median(diff):.2f}"
        assert (diff <= 12).mean() > 0.95, f"p95 {np.quantile(diff, 0.95):.1f}"

        # headline blend artifact (uint8 on the reference side)
        want_blend = chw0(ref_out["new_blend_image"])
        denom = ((g["mask1"][..., 0] + got_m2) > 0) & \
                ((g["mask1"][..., 0] + want_m2) > 0)
        bdiff = np.abs(got["new_blend_image"] - want_blend)[denom]
        assert np.median(bdiff) <= 2.0
        assert (bdiff <= 12).mean() > 0.95


# ------------------------------------------------------------- mix plugins


class FakeTorchInpainter:
    """Deterministic stand-in for the reference's inpainter module object
    (duck-typed: .name + .inpaint, see mix plugins' importlib contract)."""

    def __init__(self, name, pattern):
        self.name = name
        self.pattern = torch.from_numpy(
            np.ascontiguousarray(pattern.transpose(2, 0, 1)))[None]

    def inpaint(self, img, mask, control_image_tensor=None,
                resize_to_area_limit_before_inpaint=False):
        base = (control_image_tensor if control_image_tensor is not None
                else img)
        return base * (1 - mask) + self.pattern.to(base.dtype) * mask


class TestMixPlugins:
    def _inputs(self, seed):
        g = make_geometry(seed)
        rng = np.random.default_rng(seed + 500)
        out_h, out_w = g["out_h"], g["out_w"]
        # a plausible post-TPS state: binary mask, image masked by it
        tps_mask = quad_mask(out_h, out_w,
                             [(24, 4), (out_w - 10, 14),
                              (out_w - 18, out_h - 8), (16, out_h - 14)])
        tps_mask = tps_mask[..., None]
        tps_img = smooth_img(rng, out_h, out_w) * tps_mask
        pattern = smooth_img(rng, out_h, out_w)
        occ = (g["occlusion"] * g["h_warp_mask"])
        return g, tps_img, tps_mask, occ, pattern

    @pytest.mark.parametrize("plugin,ref_key", [
        ("all_img1_with_inpaint", "mix_img1"),
        ("inpaint_all_area", "mix_all"),
    ])
    @pytest.mark.parametrize("inpainter_name", ["cv_inpainter",
                                                "transref_inpainter"])
    def test_mix_fn_parity(self, refs, plugin, ref_key, inpainter_name):
        import stitchax.compose.mix_methods  # noqa: F401 (registers plugins)
        from stitchax.utils.registry import MIX_METHODS
        g, tps_img, tps_mask, occ, pattern = self._inputs(42)
        l, r, t, b = g["pads"]

        with torch.no_grad():
            ref5 = refs[ref_key].mix_fn(
                tps_H_warp=nchw(tps_img),
                tps_H_warp_mask=nchw(np.repeat(tps_mask, 3, -1)),
                output1=nchw(g["output1"]),
                mask1=nchw(np.repeat(g["mask1"], 3, -1)),
                final_warp=nchw(g["final_warp"]),
                occlusion_mask=nchw(occ),
                padding=(l, r, t, b),
                residual_flow=nchw(g["flow"]),
                inpainter=FakeTorchInpainter(inpainter_name, pattern))

        pat = jnp.asarray(pattern)

        def inpaint(img, mask, control=None):
            base = control if control is not None else img
            return base * (1 - mask) + pat * mask

        mine = MIX_METHODS.get(plugin)(
            jnp.asarray(tps_img), jnp.asarray(tps_mask),
            jnp.asarray(g["output1"]), jnp.asarray(g["mask1"]),
            jnp.asarray(g["final_warp"]), jnp.asarray(occ),
            inpaint=inpaint,
            inpainter_name=("transref" if inpainter_name ==
                            "transref_inpainter" else inpainter_name))

        names = ["tps_final_warp", "tps_final_warp_mask", "inpaint_img",
                 "inpaint_img_mask", "inpaint_area_mask"]
        for name, want_t in zip(names, ref5):
            want = chw0(want_t)
            got = np.asarray(getattr(mine, name))
            # reference masks ride 3 channels; compare the leading C we keep
            want = want[..., :got.shape[-1]]
            np.testing.assert_allclose(
                got, want, atol=1e-3,
                err_msg=f"{plugin}/{inpainter_name}/{name}")
