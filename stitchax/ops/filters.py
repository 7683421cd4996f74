"""Image filters used by the breaking pipeline: Sobel gradients.

Reference: core/inference/sample_point_methods.py (gradient-magnitude guided
border-point selection uses conv2d with Sobel kernels).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# numpy constants: module import must not touch the device backend
SOBEL_X = np.array([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]],
                   np.float32)
SOBEL_Y = np.array([[-1.0, -2.0, -1.0], [0.0, 0.0, 0.0], [1.0, 2.0, 1.0]],
                   np.float32)


def _conv2d_same(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """img (H, W), kernel (kh, kw) -> (H, W), zero padding."""
    out = jax.lax.conv_general_dilated(
        img[None, :, :, None], kernel[:, :, None, None],
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out[0, :, :, 0]


def sobel_magnitude(gray: jnp.ndarray) -> jnp.ndarray:
    """Gradient magnitude of a (H, W) grayscale image."""
    gx = _conv2d_same(gray, SOBEL_X.astype(gray.dtype))
    gy = _conv2d_same(gray, SOBEL_Y.astype(gray.dtype))
    return jnp.sqrt(gx * gx + gy * gy)


def rgb_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) RGB -> (H, W) luminance (ITU-R BT.601, matches cv2)."""
    w = jnp.array([0.299, 0.587, 0.114], img.dtype)
    return img @ w
