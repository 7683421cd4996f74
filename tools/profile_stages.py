"""Synced per-stage profiler for the align step (run on the TPU).

`jax.block_until_ready` is async through the axon relay (CLAUDE.md), so this
harness times with forced host fetches and amortizes the ~0.2-0.3 ms
per-program overhead over long chains. Usage:

    PYTHONPATH=. python tools/profile_stages.py [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from stitchax.utils.platform import setup_cli_jax  # noqa: E402

setup_cli_jax()


def timed(name, fn, *args, iters=10):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].sum())  # true sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].sum())
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:32s} {dt * 1000:9.2f} ms", flush=True)
    return dt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    S = 512
    from stitchax.align.adapter import AlignConfig, stitch_model_step
    from stitchax.models import (FlowFormer, FlowFormerConfig,
                                 UDIS2HomographyNet)
    from stitchax.utils.precision import bf16_call

    ff = FlowFormer(FlowFormerConfig(upsample_all=False))
    homo = UDIS2HomographyNet()
    k = jax.random.PRNGKey(0)
    img = jnp.zeros((1, S, S, 3), jnp.float32)
    fp = jax.jit(ff.init)(k, img, img)
    hp = jax.jit(homo.init)(k, img, img)

    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.uniform(0, 255, (B, S, S, 3)), jnp.float32)
    i2 = jnp.asarray(rng.uniform(0, 255, (B, S, S, 3)), jnp.float32)

    homo_fn = lambda a, b: bf16_call(homo.apply, hp, a, b)
    flow_fn = lambda a, b: bf16_call(ff.apply, fp, a, b)
    pair_fn = lambda a, b: bf16_call(
        lambda p, x, y: ff.apply(p, x, y, method=FlowFormer.bidirectional),
        fp, a, b)
    cfg = AlignConfig()

    timed("homography_net", jax.jit(homo_fn), i1 / 127.5 - 1, i2 / 127.5 - 1)
    timed("flow_forward_only",
          jax.jit(lambda a, b: flow_fn(a, b)[0][-1]), i1, i2)
    timed("flow_bidirectional",
          jax.jit(lambda a, b: (pair_fn(a, b)[0][0][-1],
                                pair_fn(a, b)[1][0][-1])), i1, i2)
    timed("full_align_step",
          jax.jit(lambda a, b: stitch_model_step(
              homo_fn, flow_fn, a, b, cfg, flow_pair_fn=pair_fn)["flow"]),
          i1, i2)


if __name__ == "__main__":
    main()
