"""tools/merge_npz_subtree.py: the flagship-npz subtree merge is bit-exact.

The flagship snapshot mixes subtrees trained by different runs (STATUS.md
round 4); the merge tool must carry every non-merged leaf over verbatim
(stored uint16 bf16 views copied, never decoded) and refuse accidental
overwrites.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from merge_npz_subtree import merge, subtree_of  # noqa: E402

from stitchax import convert  # noqa: E402


def _tree(seed, with_comp):
    rng = np.random.RandomState(seed)
    t = {"flow": {"enc": {"w": rng.randn(3, 4).astype(np.float32)},
                  "ids": np.arange(5, dtype=np.int32) + seed},
         "homo": {"b": rng.randn(7).astype(np.float32)}}
    if with_comp:
        t["comp"] = {"down": {"k": rng.randn(2, 2).astype(np.float32)}}
    return t


def test_merge_bit_exact_and_counts(tmp_path):
    base_p = str(tmp_path / "base.npz")
    donor_p = str(tmp_path / "donor.npz")
    out_p = str(tmp_path / "out.npz")
    convert.save_params_npz(base_p, _tree(0, with_comp=False))
    convert.save_params_npz(donor_p, _tree(1, with_comp=True))

    info = merge(base_p, donor_p, "comp", out_p)
    assert info["donor_leaves"] == 1 and info["replaced"] == 0
    assert info["subtree_counts"] == {"flow": 2, "homo": 1, "comp": 1}

    base, donor, out = (dict(np.load(p)) for p in (base_p, donor_p, out_p))
    # every base leaf carried over verbatim (stored bit patterns equal)
    for k, v in base.items():
        assert np.array_equal(out[k], v), k
    # the comp leaves are the donor's, bit-exact
    for k, v in donor.items():
        if subtree_of(k) == "comp":
            assert np.array_equal(out[k], v), k
    # non-comp donor leaves (different seed) did NOT leak into out
    donor_flow = [k for k in donor if subtree_of(k) == "flow"
                  and k.startswith("bf16:")]
    assert any(not np.array_equal(out[k], donor[k]) for k in donor_flow)

    # the merged container loads through the production loader
    target = _tree(9, with_comp=True)
    loaded = convert.load_params_npz(out_p, target)
    assert float(np.abs(np.asarray(loaded["comp"]["down"]["k"])).sum()) > 0


def test_merge_refuses_overwrite_without_replace(tmp_path):
    a = str(tmp_path / "a.npz")
    b = str(tmp_path / "b.npz")
    convert.save_params_npz(a, _tree(0, with_comp=True))
    convert.save_params_npz(b, _tree(1, with_comp=True))
    with pytest.raises(SystemExit):
        merge(a, b, "comp", str(tmp_path / "o.npz"))
    info = merge(a, b, "comp", str(tmp_path / "o.npz"), replace=True)
    assert info["replaced"] == 1


def test_merge_missing_subtree_errors(tmp_path):
    a = str(tmp_path / "a.npz")
    b = str(tmp_path / "b.npz")
    convert.save_params_npz(a, _tree(0, with_comp=True))
    convert.save_params_npz(b, _tree(1, with_comp=False))
    with pytest.raises(SystemExit):
        merge(a, b, "comp", str(tmp_path / "o.npz"), replace=True)
