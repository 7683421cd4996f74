"""stitchax.tps — the "breaking" pipeline (L3): flow -> border control points
-> thin-plate-spline extrapolation of the homography warp.

TPU-native rebuild of the reference inference pipeline
(reference: core/inference/{tps_pipline.py, sample_point_methods.py,
utils.py, tps_methods/}). Key design departures, per SURVEY.md §7:

  * The TPS solve + dense evaluation replaces OpenCV's C++
    ThinPlateSplineShapeTransformer with a batched JAX linear solve and an
    MXU matmul over the output grid — no PIL/OpenCV host round trips.
  * Dynamic point filtering (flow-limit, boundary, occlusion-mask) becomes
    fixed-N points + validity masks, so the whole stage jits.
  * cv2 morphological cleanup becomes reduce_window min/max pooling.
"""

from .solve import (tps_fit, tps_eval_points, tps_backward_warp,
                    tps_warp_image)
from .points import (border_segments, sample_border_points,
                     multi_level_border_points, point_pairs, shift_points,
                     boundary_validity, mask_lookup_validity,
                     gradient_magnitude_l1)
from .pipeline import TPSConfig, preprocess_flow, sample_control_points, tps_break_warp

__all__ = [k for k in dir() if not k.startswith("_")]
