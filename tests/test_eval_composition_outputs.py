"""tools/eval_composition_outputs scorer: a committed seam must score near-
zero ghost while the 50/50 average of disagreeing warps scores high."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from eval_composition_outputs import score_pair, score_sweep  # noqa: E402


def _write(d, name, arr):
    from PIL import Image
    a = np.clip(arr, 0, 255).astype(np.uint8)
    if a.ndim == 3 and a.shape[2] == 1:
        a = a[..., 0]
    Image.fromarray(a).save(os.path.join(d, name), quality=95)


@pytest.fixture
def fake_result(tmp_path):
    """Canvas 512x512 (no <512 upsize): warp1 left 2/3, warp2 right 2/3,
    disagreeing textures in the overlap middle third; composition takes
    warp1 wholesale (a perfectly committed seam at the overlap's right
    edge), ave_fusion is the 50/50 blend."""
    rng = np.random.default_rng(0)
    S = 512
    w1 = np.zeros((S, S, 3), np.float32)
    w2 = np.zeros((S, S, 3), np.float32)
    m1 = np.zeros((S, S, 1), np.float32)
    m2 = np.zeros((S, S, 1), np.float32)
    t1 = rng.uniform(40, 215, (S, S, 3)).astype(np.float32)
    t2 = rng.uniform(40, 215, (S, S, 3)).astype(np.float32)
    m1[:, : 2 * S // 3] = 1.0
    m2[:, S // 3:] = 1.0
    w1[:] = t1 * m1
    w2[:] = t2 * m2
    ov = m1 * m2
    ave = (w1 * m1 + w2 * m2) / np.maximum(m1 + m2, 1.0)
    comp = np.where(m1 > 0, w1, w2)          # committed: img1 wherever valid
    lm1 = m1.copy()                          # seam = img1 footprint edge
    d = tmp_path / "pair"
    d.mkdir()
    _write(str(d), "warp1.jpg", w1)
    _write(str(d), "warp2.jpg", w2)
    _write(str(d), "mask1.jpg", m1 * 255)
    _write(str(d), "mask2.jpg", m2 * 255)
    _write(str(d), "ave_fusion.jpg", ave)
    _write(str(d), "composition.jpg", comp)
    _write(str(d), "learned_mask1.jpg", lm1 * 255)
    assert ov.sum() > 100
    return str(tmp_path), str(d)


def test_committed_seam_beats_average_fusion(fake_result):
    _, d = fake_result
    s = score_pair(d)
    assert s is not None
    # composition == warp1 on every overlap pixel -> ghost is only JPEG
    # noise; the 50/50 blend of independent textures is far away from both
    assert s["ghost"] < 0.05
    assert s["ghost_ave_fusion"] > 5 * s["ghost"]
    assert s["hot_px"] > 1000


def test_sweep_aggregates(fake_result):
    root, _ = fake_result
    rep = score_sweep(root)
    assert rep["aggregate"]["n_pairs"] == 1
    assert rep["aggregate"]["ghost"] < 0.05


def test_missing_artifacts_skipped(tmp_path):
    (tmp_path / "empty").mkdir()
    assert score_pair(str(tmp_path / "empty")) is None
