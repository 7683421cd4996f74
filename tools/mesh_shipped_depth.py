"""Shipped-depth training step on the 8-device virtual CPU mesh.

The driver's `dryrun_multichip` keeps a REDUCED model (decoder_depth=2,
encoder_depth=1, 128², fb-consistency off) so its signal stays ~minutes.
This tool runs the configuration the product actually ships — FlowFormer
PerCostFormer3 at encoder_depth=3 / decoder_depth=12
(/root/reference/configs/submissions.py defaults; configs/last_config.py)
with `use_fb_consistency_mask=True` (configs/last_config.py:16) at 256² —
through the SAME mesh train step, once per round, and records the loss.
That proves the full shipped compute graph (both flow directions, the
fb-consistency occlusion mask, all 12 decoder iterations and 3 encoder
layers) compiles and executes under the data-parallel sharding, not just
a thin stand-in.

Expect ~30-60 min cold on this 1-core host (the graph is ~6x the dryrun's).

  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/mesh_shipped_depth.py [n_devices]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(n_devices: int = 8) -> None:
    from __graft_entry__ import _force_virtual_cpu
    _force_virtual_cpu(n_devices)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from stitchax.align.adapter import AlignConfig
    from stitchax.models import (FlowFormer, FlowFormerConfig,
                                 UDIS2HomographyNet)
    from stitchax.parallel import (make_mesh, make_parallel_train_step,
                                   shard_batch)
    from stitchax.train import (LossConfig, OptimConfig, create_train_state,
                                make_train_step)

    S = 256
    B = n_devices  # one sample per device

    flow_cfg = FlowFormerConfig()  # shipped: encoder 3 / decoder 12
    assert flow_cfg.encoder_depth == 3 and flow_cfg.decoder_depth == 12
    flow_model = FlowFormer(flow_cfg)
    homo_model = UDIS2HomographyNet()

    t0 = time.time()
    k = jax.random.PRNGKey(0)
    img = jnp.zeros((1, S, S, 3), jnp.float32)
    params = {
        "homo": jax.jit(homo_model.init)(k, img, img),
        "flow": jax.jit(flow_model.init)(k, img, img),
    }
    t_init = time.time() - t0

    optim_cfg = OptimConfig(num_steps=100)
    state, tx = create_train_state(params, optim_cfg)

    step = make_train_step(
        lambda p, a, b: homo_model.apply(p, a, b),
        lambda p, a, b: flow_model.apply(p, a, b),
        tx, AlignConfig(), LossConfig(),
        use_fb_consistency_mask=True)  # the shipped flag, unlike the dryrun

    mesh = make_mesh(n_devices)
    pstep = make_parallel_train_step(step, mesh)

    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.uniform(0, 255, (B, S, S, 3)), jnp.float32)
    img2 = jnp.asarray(rng.uniform(0, 255, (B, S, S, 3)), jnp.float32)
    img1, img2 = shard_batch((img1, img2), mesh)
    state = jax.device_put(state, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()))

    t1 = time.time()
    state, metrics = pstep(state, img1, img2)
    losses = {key: float(val) for key, val in metrics.items()}
    t_step1 = time.time() - t1
    assert np.isfinite(losses["total"]), f"non-finite loss {losses}"

    # a second step through the compiled program (params actually updated)
    t2 = time.time()
    state, metrics2 = pstep(state, img1, img2)
    total2 = float(metrics2["total"])
    t_step2 = time.time() - t2
    assert np.isfinite(total2), f"non-finite second-step loss {total2}"

    record = {
        "n_devices": n_devices,
        "image_size": S,
        "batch": B,
        "encoder_depth": flow_cfg.encoder_depth,
        "decoder_depth": flow_cfg.decoder_depth,
        "use_fb_consistency_mask": True,
        "loss_step1": losses,
        "loss_total_step2": total2,
        "t_init_s": round(t_init, 1),
        "t_step1_s": round(t_step1, 1),   # includes compile
        "t_step2_s": round(t_step2, 1),
    }
    out = os.path.join(os.path.dirname(__file__), "..", "results",
                       "mesh_shipped_depth.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
