"""stitchax.ops.pallas — custom TPU kernels (real `pl.pallas_call` only).

  * tps_kernel — fused TPS radial-basis evaluation over the output grid
    (never materializes the (pixels x centers) U matrix in HBM)
  * gsa_attention — fused subsampled global attention for the twins GSA
    blocks

Neighborhood attention lives in stitchax.ops.neighborhood_attention: it is
a pure-XLA take/einsum formulation (fast on TPU), not a Pallas kernel.
The windowed-LSA kernel was retired after losing to XLA at the production
shape (16.1 vs 12.9 ms at (64, 64, 64, 128) bf16 even with multi-window
batching per program); the kernel and its measurements live in
tools/exp_window_attn.py, and the production XLA formulations in
stitchax/ops/window_attention.py.
"""

from .tps_kernel import tps_eval_grid, tps_eval_grid_pallas, tps_eval_grid_ref

__all__ = ["tps_eval_grid", "tps_eval_grid_pallas", "tps_eval_grid_ref"]
