"""Deterministic stub backbones for end-to-end golden tests.

At random init the real model stack produces a DEGENERATE stitch: the
flow field is per-pixel noise, so the wang range map (forward splat of the
backward flow, ops/occlusion.py) is Poisson-sparse, the 19x19 full-window
erosion (ops.preprocess_occlusion_mask — reference flowHomoAdpater.py:18-35)
erodes the occlusion mask to ALL-ZERO, final_warp is multiplied away, the
occlusion border-point filter invalidates every TPS control point, and img2
contributes nothing to the canvas. These stubs give the goldens
well-conditioned geometry so the TPS break / hole algebra / inpainter
stages execute on non-trivial content:

- homography: fixed non-axis-aligned corner offsets (same flavor as
  tests/test_parity_adapter.py), sign chosen so the canvas genuinely
  GROWS under the reference's H2Mesh-via-H^-1 convention
- flow: tanh(blur31((a-b)/255) @ W) * 5 — direction-odd (so the backward
  call returns the negated field and fb-consistency holds) AND spatially
  smooth (the heavy blur is what keeps the wang range map dense; a
  content-noisy field fails the occlusion open exactly like random init).
"""

import numpy as np

OFFSETS = np.array([14.0, 9.0, -11.0, 6.0, 12.0, -7.0, -9.0, -13.0],
                   np.float32)
W_FLOW = np.array([[0.9, -0.4], [-0.3, 0.7], [0.2, 0.5]], np.float32)


def stub_homo_fn(a, b):
    import jax.numpy as jnp
    return jnp.broadcast_to(jnp.asarray(OFFSETS)[None], (a.shape[0], 8))


def stub_flow_fn(a, b):
    import jax.numpy as jnp

    from stitchax.ops.morphology import avg_pool_same

    d = (a - b) / 255.0
    d = avg_pool_same(d, 31)
    f = jnp.tanh(d @ jnp.asarray(W_FLOW)) * 5.0
    return [f], None
