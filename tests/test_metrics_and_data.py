"""Metrics parity (native C++ vs numpy reference), flow IO round-trips,
dataset/loader mechanics, flow visualization."""

import os

import numpy as np
import pytest


class TestMetrics:
    def test_native_matches_numpy(self, rng):
        from stitchax.metrics import (psnr_batch, ssim_batch, psnr_np,
                                      ssim_np)
        a = rng.integers(0, 256, (2, 48, 56, 3)).astype(np.uint8)
        b = np.clip(a.astype(int) + rng.integers(-25, 25, a.shape),
                    0, 255).astype(np.uint8)
        p = psnr_batch(a, b)
        s = ssim_batch(a, b)
        for i in range(2):
            assert abs(p[i] - psnr_np(a[i], b[i])) < 1e-8
            assert abs(s[i] - ssim_np(a[i], b[i])) < 1e-8

    def test_identical_images(self, rng):
        from stitchax.metrics import psnr_batch, ssim_batch
        a = rng.integers(0, 256, (1, 32, 32, 3)).astype(np.uint8)
        assert psnr_batch(a, a)[0] == float("inf")
        assert abs(ssim_batch(a, a)[0] - 1.0) < 1e-12


class TestFlowIO:
    def test_flo_roundtrip(self, rng, tmp_path):
        from stitchax.data import read_flo, write_flo
        flow = rng.standard_normal((20, 30, 2)).astype(np.float32)
        p = str(tmp_path / "f.flo")
        write_flo(p, flow)
        np.testing.assert_array_equal(read_flo(p), flow)

    def test_pfm_roundtrip(self, rng, tmp_path):
        from stitchax.data import read_pfm, write_pfm
        img = rng.standard_normal((15, 17, 3)).astype(np.float32)
        p = str(tmp_path / "f.pfm")
        write_pfm(p, img)
        np.testing.assert_allclose(read_pfm(p), img, rtol=1e-6)


class TestFlowViz:
    def test_flow_to_image(self, rng):
        from stitchax.data import flow_to_image
        flow = rng.standard_normal((16, 16, 2)).astype(np.float32) * 5
        img = flow_to_image(flow)
        assert img.shape == (16, 16, 3) and img.dtype == np.uint8
        # zero flow maps into the wheel's center region (unsaturated)
        center = flow_to_image(np.zeros((4, 4, 2), np.float32))
        assert center.min() > 200  # near-white


class TestDataset:
    def _make_split(self, tmp_path, n=5, hw=(32, 40)):
        from PIL import Image
        rng = np.random.default_rng(0)
        for sub in ("input1", "input2"):
            os.makedirs(tmp_path / "testing" / sub, exist_ok=True)
        for i in range(n):
            for sub in ("input1", "input2"):
                arr = rng.integers(0, 256, hw + (3,)).astype(np.uint8)
                Image.fromarray(arr).save(
                    tmp_path / "testing" / sub / f"{i:06d}.jpg")
        return str(tmp_path)

    def test_loader_batches(self, tmp_path):
        from stitchax.data import UDISDataset, PrefetchLoader
        root = self._make_split(tmp_path)
        ds = UDISDataset(root, phase="testing")
        assert len(ds) == 5
        loader = PrefetchLoader(ds, batch_size=2, num_workers=2)
        batches = list(loader)
        assert len(batches) == 3
        assert batches[0]["image1"].shape == (2, 32, 40, 3)
        assert batches[-1]["image1"].shape == (1, 32, 40, 3)
        names = [n for b in batches for n in b["name"]]
        assert names == sorted(names)

    def test_train_mode_zero_flow(self, tmp_path):
        from stitchax.data import UDISDataset
        root = self._make_split(tmp_path)
        os.rename(os.path.join(root, "testing"),
                  os.path.join(root, "training"))
        ds = UDISDataset(root, phase="training")
        item = ds[0]
        assert item["flow"].shape == (32, 40, 2)
        assert (item["flow"] == 0).all()

    def test_return_depth(self, tmp_path):
        """depth2 channel loading (reference: core/datasets.py:330,353-368,
        437-448): RGB depth render -> channel-mean (H, W, 1)."""
        from PIL import Image
        from stitchax.data import UDISDataset
        root = self._make_split(tmp_path)
        os.rename(os.path.join(root, "testing"),
                  os.path.join(root, "training"))
        ddir = os.path.join(root, "training", "depth2")
        os.makedirs(ddir)
        rng = np.random.default_rng(1)
        for i in range(5):
            arr = rng.integers(0, 256, (32, 40, 3)).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(ddir, f"{i:06d}.jpg"))

        ds = UDISDataset(root, phase="training", return_depth=True)
        item = ds[0]
        assert item["depth2"].shape == (32, 40, 1)
        # channel mean of the saved RGB render
        saved = np.asarray(Image.open(
            os.path.join(ddir, "000000.jpg")).convert("RGB"), np.float32)
        np.testing.assert_allclose(item["depth2"][..., 0],
                                   saved.mean(-1), atol=1e-4)
        # test mode omits it; clip_num_data truncates
        assert "depth2" not in UDISDataset(root, phase="training",
                                           is_test=True,
                                           return_depth=True)[0]
        assert len(UDISDataset(root, phase="training", return_depth=True,
                               clip_num_data=3)) == 3
        # missing depth dir is a loud error
        import shutil
        shutil.rmtree(ddir)
        with pytest.raises(FileNotFoundError):
            UDISDataset(root, phase="training", return_depth=True)


class TestMixMethods:
    def test_all_img1_shapes(self, rng):
        import jax.numpy as jnp
        from stitchax.compose import all_img1_with_inpaint
        H, W = 64, 80
        img = lambda: jnp.asarray(
            rng.uniform(0, 255, (H, W, 3)).astype(np.float32))
        msk = lambda v: jnp.full((H, W, 1), v, jnp.float32)
        res = all_img1_with_inpaint(img(), msk(1), img(), msk(1), img(),
                                    msk(1), inpaint=None)
        assert res.tps_final_warp.shape == (H, W, 3)
        assert res.tps_final_warp_mask.shape == (H, W, 1)
        assert np.isfinite(np.asarray(res.tps_final_warp)).all()

    def test_push_pull_fills_holes(self, rng):
        import jax.numpy as jnp
        from stitchax.compose.inpainters import push_pull_inpaint
        img = np.full((32, 32, 3), 128.0, np.float32)
        img[10:20, 10:20] = 0.0
        mask = np.zeros((32, 32, 1), np.float32)
        mask[10:20, 10:20] = 1.0
        out = np.asarray(push_pull_inpaint(jnp.asarray(img),
                                           jnp.asarray(mask)))
        assert abs(out[14, 14].mean() - 128.0) < 2.0


def _ref_dilate_thin_area_torch(mask, dil_k=8, thick_k=8):
    """Verbatim reference semantics (core/inference/utils.py:124-160)."""
    import torch
    import torch.nn.functional as F
    _, _, H, W = mask.shape
    m = mask[:, 0:1]
    ker = torch.ones((1, 1, dil_k, dil_k), dtype=m.dtype)
    er = F.conv2d(m, ker, padding=(dil_k // 2, dil_k // 2))
    er = (er == ker.numel()).float()
    di = F.conv2d(er, ker, padding=(dil_k // 2, dil_k // 2))
    di = (di >= 1).float()[:, :, :H, :W]
    thick = (m * di).clamp(0, 1)
    thin = m * (1 - thick)
    ker2 = torch.ones((1, 1, thick_k, thick_k), dtype=m.dtype)
    d = F.conv2d(thin, ker2, padding=(thick_k // 2, thick_k // 2))
    d = (d >= 1).float()[:, :, :H, :W]
    return (thick + d).clamp(0, 1)


class TestDilateThinArea:
    def test_parity_vs_reference_torch(self, rng):
        """Pixel-exact vs the reference's conv-based implementation on blob,
        line, and mixed masks (regression: a wrong min-pool identity made
        the whole mask 'thin' and dilated everything)."""
        import torch
        import jax.numpy as jnp
        from stitchax.ops.morphology import dilate_thin_area
        cases = []
        blob = np.zeros((64, 64, 1), np.float32); blob[20:40, 20:40] = 1.0
        line = np.zeros((64, 64, 1), np.float32); line[30, 10:50] = 1.0
        mixed = blob.copy(); mixed[45, 2:60] = 1.0
        for m in (blob, line, mixed):
            ref = _ref_dilate_thin_area_torch(
                torch.from_numpy(m.transpose(2, 0, 1)).unsqueeze(0))
            got = np.asarray(dilate_thin_area(jnp.asarray(m)))
            np.testing.assert_array_equal(got, ref[0].numpy().transpose(1, 2, 0))


class TestChromatic:
    def test_transforms_stay_in_range(self, rng):
        from stitchax.data.augmentor import chromatic_transform, pca_lighting
        nprng = np.random.default_rng(0)
        a = rng.uniform(0, 255, (32, 32, 3)).astype(np.float32)
        b = rng.uniform(0, 255, (32, 32, 3)).astype(np.float32)
        a2, b2 = chromatic_transform(nprng, a, b)
        assert a2.min() >= 0 and a2.max() <= 255 and a2.shape == a.shape
        c = pca_lighting(nprng, a)
        assert c.min() >= 0 and c.max() <= 255


class TestFigureHelpers:
    def test_flow_quiver_and_panel_write_pngs(self, rng, tmp_path):
        """Headless figure helpers (reference vis_utils.plot_quiver +
        logger.plot_the_results rebuilds) must write valid non-empty PNGs."""
        import os

        from stitchax.utils.logger import save_flow_panel, save_flow_quiver

        flow = rng.normal(size=(64, 80, 2)).astype("float32")
        img = rng.uniform(0, 255, (64, 80, 3)).astype("float32")
        q = save_flow_quiver(str(tmp_path / "q.png"), flow, step=16)
        save_flow_panel(str(tmp_path / "p.png"), img, img, flow)
        for f in (q, str(tmp_path / "p.png")):
            assert os.path.getsize(f) > 1000
            with open(f, "rb") as fh:
                assert fh.read(8) == b"\x89PNG\r\n\x1a\n"
