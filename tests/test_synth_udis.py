"""Property tests for the synthetic UDIS-D generator
(tools/make_synth_udis.py): layout, determinism, and the stitchability
contract (the two crops genuinely overlap, shifted by `shift`)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_pair_contract():
    from make_synth_udis import make_pair

    H, W, shift = 240, 320, 40
    rng = np.random.default_rng(3)
    img1, img2 = make_pair(rng, H=H, W=W, shift=shift, jitter=0.0, cell=16)
    assert img1.shape == (H, W, 3) and img2.shape == (H, W, 3)
    assert img1.min() >= 0 and img1.max() <= 255

    # zero jitter -> img2 is exactly the shifted crop up to the
    # photometric jitter (affine in intensity): the shifted overlap must
    # correlate far above any unshifted alignment
    a = img1[:, shift:].ravel().astype(np.float64)
    b = img2[:, :-shift].ravel().astype(np.float64)
    c_shifted = np.corrcoef(a[::31], b[::31])[0, 1]
    c_unshifted = np.corrcoef(img1[:, :-shift].ravel()[::31].astype(
        np.float64), b[::31])[0, 1]
    assert c_shifted > 0.95
    assert c_shifted > c_unshifted + 0.2


def test_split_layout_and_determinism(tmp_path):
    from make_synth_udis import write_split

    root = str(tmp_path / "d1")
    write_split(root, "testing", 3, seed=7, H=96, W=128, shift=16)
    d1 = os.path.join(root, "testing", "input1")
    d2 = os.path.join(root, "testing", "input2")
    assert sorted(os.listdir(d1)) == sorted(os.listdir(d2))
    assert len(os.listdir(d1)) == 3

    # same seed -> byte-identical split (reproducible eval sets)
    root2 = str(tmp_path / "d2")
    write_split(root2, "testing", 3, seed=7, H=96, W=128, shift=16)
    for name in os.listdir(d1):
        with open(os.path.join(d1, name), "rb") as f:
            want = f.read()
        with open(os.path.join(root2, "testing", "input1", name),
                  "rb") as f:
            assert f.read() == want
