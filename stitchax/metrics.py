"""PSNR/SSIM with skimage-identical semantics.

Metric contract from the reference (reference: evaluate.py:58-59):
uint8 inputs, data_range=255; SSIM with uniform 7x7 window, K1=0.01,
K2=0.03, unbiased covariance, symmetric padding, border crop, channel mean
(multichannel=True). Dispatches to the native C++ kernel
(native/metrics.cpp) with a numpy reference fallback; both paths are
parity-tested against each other.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .native import get_lib


# ------------------------------ numpy reference ------------------------------


def _uniform_filter(x: np.ndarray, win: int) -> np.ndarray:
    """Separable box filter with symmetric padding (scipy 'reflect')."""
    r = win // 2
    p = np.pad(x, ((r, r), (r, r)), mode="symmetric")
    c = np.cumsum(np.cumsum(p, axis=0), axis=1)
    c = np.pad(c, ((1, 0), (1, 0)))
    H, W = x.shape
    s = (c[win:win + H, win:win + W] - c[:H, win:win + W]
         - c[win:win + H, :W] + c[:H, :W])
    return s / (win * win)


def _ssim_channel_np(a: np.ndarray, b: np.ndarray, win: int,
                     data_range: float) -> float:
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    NP = win * win
    cov_norm = NP / (NP - 1)
    ux = _uniform_filter(a, win)
    uy = _uniform_filter(b, win)
    uxx = _uniform_filter(a * a, win)
    uyy = _uniform_filter(b * b, win)
    uxy = _uniform_filter(a * b, win)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2
    S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / (
        (ux ** 2 + uy ** 2 + C1) * (vx + vy + C2))
    pad = (win - 1) // 2
    return float(S[pad:-pad, pad:-pad].mean())


def psnr_np(img1: np.ndarray, img2: np.ndarray,
            data_range: float = 255.0) -> float:
    mse = np.mean((img1.astype(np.float64) - img2.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10 * np.log10(data_range ** 2 / mse))


def ssim_np(img1: np.ndarray, img2: np.ndarray, win: int = 7,
            data_range: float = 255.0) -> float:
    if img1.ndim == 2:
        return _ssim_channel_np(img1, img2, win, data_range)
    return float(np.mean([
        _ssim_channel_np(img1[..., c], img2[..., c], win, data_range)
        for c in range(img1.shape[-1])]))


# ------------------------------- dispatch -----------------------------------


def psnr_batch(img1: np.ndarray, img2: np.ndarray,
               data_range: float = 255.0) -> np.ndarray:
    """uint8 (B, H, W, C) pair -> (B,) PSNR."""
    img1 = np.ascontiguousarray(img1, np.uint8)
    img2 = np.ascontiguousarray(img2, np.uint8)
    B, H, W, C = img1.shape
    lib = get_lib()
    out = np.empty(B, np.float64)
    if lib is not None:
        lib.psnr_u8_batch(img1.ctypes.data, img2.ctypes.data, B, H, W, C,
                          float(data_range), out.ctypes.data)
        return out
    for b in range(B):
        out[b] = psnr_np(img1[b], img2[b], data_range)
    return out


def ssim_batch(img1: np.ndarray, img2: np.ndarray, win: int = 7,
               data_range: float = 255.0) -> np.ndarray:
    """uint8 (B, H, W, C) pair -> (B,) multichannel SSIM."""
    img1 = np.ascontiguousarray(img1, np.uint8)
    img2 = np.ascontiguousarray(img2, np.uint8)
    B, H, W, C = img1.shape
    lib = get_lib()
    out = np.empty(B, np.float64)
    if lib is not None:
        lib.ssim_u8_batch(img1.ctypes.data, img2.ctypes.data, B, H, W, C,
                          win, float(data_range), out.ctypes.data)
        return out
    for b in range(B):
        out[b] = ssim_np(img1[b], img2[b], win, data_range)
    return out
