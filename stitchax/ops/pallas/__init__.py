"""stitchax.ops.pallas — custom TPU kernels (real `pl.pallas_call` only).

  * tps_kernel — fused TPS radial-basis evaluation over the output grid
    (never materializes the (pixels x centers) U matrix in HBM)
  * window_attention — fused windowed MHA for the twins LSA blocks (window
    restructuring in VMEM, head-masked full-width MXU matmuls)

Neighborhood attention lives in stitchax.ops.neighborhood_attention: it is
a pure-XLA take/einsum formulation (fast on TPU), not a Pallas kernel.
"""

from .tps_kernel import tps_eval_grid, tps_eval_grid_pallas, tps_eval_grid_ref
from .window_attention import window_attention_pallas, window_attention_ref

__all__ = ["tps_eval_grid", "tps_eval_grid_pallas", "tps_eval_grid_ref",
           "window_attention_pallas", "window_attention_ref"]
