"""stitchax.ops — pure-function geometry/image primitives (L0).

TPU-first rebuild of the reference's tensor/geometry layer
(reference: core/warp_utils.py, core/udis_utils/, core/utils/utils.py,
core/utils/warper.py). Everything is jit-safe, NHWC, xy-last.
"""

from .grid import (coords_grid, normalized_grid, get_rigid_mesh,
                   apply_homography_to_points, h2mesh)
from .sampling import (grid_sample, grid_sample_b, bilinear_sampler,
                       bilinear_sampler_b, interpolate_bilinear,
                       interpolate_bilinear_b, resize_image, resize_image_b,
                       homography_warp, homography_warp_b)
from .homography import (dlt_solve, scale_matrix, to_normalized_homography,
                         four_point_homography)
from .flow import (flow_to_warp, flow_warp, flow_warp_b, resize_flow,
                   resize_flow_b, upflow8, convex_upsample_flow,
                   convex_upsample_flow_b)
from .occlusion import (mask_invalid, compute_range_map, compute_range_map_b,
                        compute_fb_consistency, compute_occlusion,
                        compute_occlusion_b)
from .morphology import (dilate, erode, morph_open, morph_close,
                         preprocess_occlusion_mask, avg_pool_same,
                         dilate_thin_area, dilate_binary)
from .splat import bilinear_splat, bilinear_splat_b, forward_warp_with_flow
from .filters import sobel_magnitude, rgb_to_gray

__all__ = [k for k in dir() if not k.startswith("_")]
