"""Mesh construction + data-parallel jit wrappers.

Scaling design (SURVEY.md §2.10): the stitching workload is embarrassingly
parallel over image pairs, and the models are small enough to replicate, so
the primary axis is **data** over ICI. Params/opt-state get replicated
shardings, batches get batch-axis shardings, and `jax.jit` with output
shardings makes XLA insert the psum for the gradient all-reduce.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    """1-D data mesh over the first n devices (all by default)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs).reshape(len(devs)), axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Put a host batch onto the mesh, split along the leading axis."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def make_parallel_train_step(train_step: Callable, mesh: Mesh,
                             axis: str = "data") -> Callable:
    """jit the train step with replicated state and batch-sharded inputs.
    XLA inserts the gradient all-reduce (psum over ICI) automatically
    because the output state sharding is replicated."""
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh, axis)
    return jax.jit(
        train_step,
        in_shardings=(repl, data, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_parallel_eval_step(eval_step: Callable, mesh: Mesh,
                            axis: str = "data") -> Callable:
    """jit an eval step: params replicated, batch + outputs sharded."""
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh, axis)
    return jax.jit(eval_step, in_shardings=(repl, data, data),
                   out_shardings=data)


def make_parallel_stitch_step(step_fn: Callable, mesh: Mesh,
                              axis: str = "data") -> Callable:
    """Batch-parallel inference-path stitch step over the mesh — the
    deployment analog of the reference's nn.DataParallel scatter
    (reference: out.py:80; SURVEY.md §2.10).

    `step_fn(img1, img2) -> dict of per-pair leaves` must be per-pair
    independent on its leading axis (stitch_model_step is: canvas boxes
    reduce over mesh vertices only). Params ride as closed-over
    constants and stay replicated; the pair axis is sharded on `axis`,
    so N chips stitch N pairs per call with no collectives on the
    forward path."""
    data = batch_sharding(mesh, axis)
    return jax.jit(step_fn, in_shardings=(data, data), out_shardings=data)
