"""evaluate.py-equivalent metric test on a small synthetic UDIS-D subset
(SURVEY.md §4 test-pyramid item (c); reference: evaluate.py:22-107).

Drives the importable core of the eval CLI — UDISDataset + PrefetchLoader +
validate_with_model — over a tiny generated testing split with deterministic
stub backbones (zero corner offsets -> identity homography, zero flow), so
the masked warp equals input2 and the per-pair PSNR is controlled exactly by
the noise injected between input1 and input2. Checks the bucketed report
(top-30% / 30-60% / 60-100% fractional cuts, reference evaluate.py:93-107)
and the multi-device batch-padding shard path (8 virtual CPU devices, batch
sizes that do NOT divide the device count)."""

import os

import numpy as np
import pytest
from PIL import Image


class _StubModule:
    def __init__(self, fn):
        self._fn = fn

    def apply(self, params, a, b):
        return self._fn(a, b)


class _StubModels:
    """Duck-typed StitchModels: identity homography + zero flow."""

    def __init__(self):
        import jax.numpy as jnp

        self.homo_model = _StubModule(
            lambda a, b: jnp.zeros((a.shape[0], 8), a.dtype))
        self.homo_params = None
        self.flow_model = _StubModule(
            lambda a, b: ([jnp.zeros(a.shape[:3] + (2,), a.dtype)], None))
        self.flow_params = None


def _write_split(root, sizes_noise):
    """Create {root}/testing/input{1,2}/NNNNNN.jpg pairs; input2 = input1 +
    per-pair uniform noise of the given amplitude (higher -> lower PSNR)."""
    d1 = os.path.join(root, "testing", "input1")
    d2 = os.path.join(root, "testing", "input2")
    os.makedirs(d1)
    os.makedirs(d2)
    rng = np.random.default_rng(7)
    for i, amp in enumerate(sizes_noise):
        base = rng.uniform(40, 215, (96, 96, 3)).astype(np.float32)
        noisy = np.clip(base + rng.uniform(-amp, amp, base.shape), 0, 255)
        for d, arr in ((d1, base), (d2, noisy)):
            Image.fromarray(arr.astype(np.uint8)).save(
                os.path.join(d, f"{i:06d}.jpg"), quality=95)


@pytest.mark.parametrize("batch_size", [2])
def test_bucketed_report_and_shard_padding(tmp_path, batch_size):
    import jax

    from evaluate import validate_with_model
    from stitchax.align.adapter import AlignConfig
    from stitchax.data import PrefetchLoader, UDISDataset

    # 5 pairs, noise amplitudes spread so bucket means must strictly order
    _write_split(str(tmp_path), [2, 4, 8, 16, 32])

    ds = UDISDataset(str(tmp_path), phase="testing", size=(128, 128))
    assert len(ds) == 5
    # batch 2 over 5 pairs -> batches of 2/2/1; with 8 virtual devices each
    # batch is padded to 8 and the pad rows dropped (evaluate.py:66-76)
    loader = PrefetchLoader(ds, batch_size=batch_size, shuffle=False,
                            num_workers=1)
    align_cfg = AlignConfig(use_fb_consistency_mask=False)
    result = validate_with_model({}, loader, _StubModels(), align_cfg)

    assert result["num_pairs"] == 5
    for k in ("avg_psnr", "avg_ssim", "easy_psnr", "mid_psnr", "hard_psnr",
              "easy_ssim", "mid_ssim", "hard_ssim"):
        assert np.isfinite(result[k]), k
    # stub warp == input2, so PSNR is the per-pair noise level: the sorted
    # buckets must strictly order and stay in a plausible range
    assert result["easy_psnr"] > result["mid_psnr"] > result["hard_psnr"]
    assert result["easy_ssim"] >= result["mid_ssim"] >= result["hard_ssim"]
    assert 15.0 < result["avg_psnr"] < 60.0
    assert 0.3 < result["avg_ssim"] <= 1.0
    # the fractional 30/60 cuts at n=5 -> 2/2/1 split (ref 331/663 scaled)
    n = result["num_pairs"]
    assert (int(round(0.3 * n)), int(round(0.6 * n))) == (2, 3)
    assert jax.device_count() > 1  # the padding/shard path actually engaged
