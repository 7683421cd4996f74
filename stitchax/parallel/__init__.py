"""stitchax.parallel — device mesh + sharding (the distributed layer).

The reference's only parallelism is single-process nn.DataParallel over the
pair batch (reference: out.py:80, evaluate.py:119; SURVEY.md §2.10). The
TPU-native equivalent: replicated params + batch sharding over a
jax.sharding.Mesh, with XLA inserting the psum for gradient reduction —
no NCCL analog needed.
"""

from .mesh import (make_mesh, batch_sharding, replicated_sharding,
                   shard_batch, make_parallel_train_step,
                   make_parallel_eval_step, make_parallel_stitch_step)

__all__ = [k for k in dir() if not k.startswith("_")]
