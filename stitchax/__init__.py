"""stitchax — TPU-native image-stitching framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
"Stitching Through Breaking: Rethinking Image Stitching for Optimal
Alignment" (reference: /root/reference). The pipeline:

  1. global homography (UDIS2-style CNN)           -> stitchax.models.udis2
  2. residual optical flow (FlowFormer++ PerCost)  -> stitchax.models.flowformer
  3. flow "breaking" + TPS extrapolation           -> stitchax.tps
  4. blending + hole inpainting plugins            -> stitchax.compose
  5. optional learned seam composition             -> stitchax.models.composition

Everything on the device path is jit-compiled with static shapes; batch
parallelism runs over a `jax.sharding.Mesh` (stitchax.parallel).

Conventions (differ from the torch reference by design):
  * images are NHWC float32 arrays in [0, 255]
  * flows are (B, H, W, 2) with last axis = (dx, dy) in pixels
  * masks are (B, H, W, 1) in [0, 1]
"""

__version__ = "0.1.0"
