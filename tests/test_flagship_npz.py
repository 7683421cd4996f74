"""Contract test for the committed flagship checkpoint snapshot.

results/ckpt_r0{4,5}_bf16.npz are the trained-in-repo weight bundles a CLI
loads via --ckpt_path (StitchModels.restore_npz). It must carry the flow,
homo, AND comp subtrees (the round-4 CompositionNet training merged comp
in), and every leaf must match the leaf paths + shapes of the models
StitchModels.build constructs — otherwise restore raises at CLI runtime.

Uses jax.eval_shape on the inits, so no model compute runs: the whole
check is tracing + npz key/shape comparison.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stitchax import convert
from stitchax.models import (CompositionNet, FlowFormer, FlowFormerConfig,
                             UDIS2HomographyNet)

NPZS = [os.path.join(os.path.dirname(__file__), "..", "results", f)
        for f in ("ckpt_r04_bf16.npz", "ckpt_r05_bf16.npz")]
NPZS = [p for p in NPZS if os.path.exists(p)]

pytestmark = pytest.mark.skipif(not NPZS,
                                reason="flagship npz not present")


def _stored_shapes(npz):
    data = np.load(npz)
    out = {}
    for k in data.files:
        key = k[len("bf16:"):] if k.startswith("bf16:") else k
        out[key] = data[k].shape
    return out


def _template_shapes():
    """Leaf path -> shape for the exact trees StitchModels.build makes
    (stitchax/run/stitcher.py:154-173), via eval_shape (no compute)."""
    k = jax.random.PRNGKey(0)
    img = jnp.zeros((1, 512, 512, 3), jnp.float32)
    m = jnp.zeros((1, 512, 512, 1), jnp.float32)
    flow = jax.eval_shape(FlowFormer(FlowFormerConfig()).init, k, img, img)
    homo = jax.eval_shape(UDIS2HomographyNet().init, k, img, img)
    comp = jax.eval_shape(CompositionNet().init, k, img, img, m, m)
    tree = {"flow": flow, "homo": homo, "comp": comp}
    paths, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {jax.tree_util.keystr(kp): leaf.shape for kp, leaf in paths}


@pytest.mark.parametrize("npz", NPZS, ids=os.path.basename)
def test_flagship_npz_carries_all_three_subtrees(npz):
    for name in ("flow", "homo", "comp"):
        assert convert.npz_has_subtree(npz, name), name


@pytest.mark.parametrize("npz", NPZS, ids=os.path.basename)
def test_flagship_npz_leaves_match_model_trees(npz):
    stored = _stored_shapes(npz)
    template = _template_shapes()
    missing = [k for k in template if k not in stored]
    extra = [k for k in stored if k not in template]
    assert not missing, f"npz missing {len(missing)} leaves: {missing[:5]}"
    assert not extra, f"npz has {len(extra)} unknown leaves: {extra[:5]}"
    bad = [k for k, s in template.items() if stored[k] != s]
    assert not bad, f"shape mismatches: {bad[:5]}"
