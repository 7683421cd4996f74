"""stitchax.ops.pallas — custom TPU kernels (real `pl.pallas_call` only).

  * tps_kernel — fused TPS radial-basis evaluation over the output grid
    (never materializes the (pixels x centers) U matrix in HBM)

Neighborhood attention lives in stitchax.ops.neighborhood_attention: it is
a pure-XLA take/einsum formulation (fast on TPU), not a Pallas kernel.
"""

from .tps_kernel import tps_eval_grid, tps_eval_grid_pallas, tps_eval_grid_ref

__all__ = ["tps_eval_grid", "tps_eval_grid_pallas", "tps_eval_grid_ref"]
