"""stitchax.ops.pallas — custom TPU kernels.

Hot ops with hand-written Pallas implementations + pure-XLA fallbacks:
  * tps_kernel — fused TPS radial-basis evaluation over the output grid
    (never materializes the (pixels x centers) U matrix in HBM)
  * neighborhood_attention — windowed attention with relative position bias
    (TPU replacement for the reference's missing NATTEN CUDA op,
    reference: core/FlowFormer/PerCostFormer3/NA.py)
"""

from .tps_kernel import tps_eval_grid, tps_eval_grid_pallas, tps_eval_grid_ref
from .neighborhood_attention import neighborhood_attention

__all__ = ["tps_eval_grid", "tps_eval_grid_pallas", "tps_eval_grid_ref",
           "neighborhood_attention"]
