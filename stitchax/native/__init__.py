"""stitchax.native — C++ runtime kernels (ctypes-bound).

Native components of the framework runtime (the compute path is JAX/XLA;
host-side hot loops are C++ per the reference's use of native libs):
  * metrics.cpp — PSNR/SSIM batch kernels with OpenMP
    (replaces skimage + ThreadPool, reference: evaluate.py:53-65)

The shared library builds lazily on first use with g++ and is cached next
to the sources; a pure-numpy fallback keeps everything runnable without a
toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libstitchax_metrics.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "metrics.cpp")

_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           _SRC_PATH, "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired) as e:
        print(f"[stitchax.native] build failed ({e}); using numpy fallback",
              file=sys.stderr)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native metrics library, or None."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not os.path.exists(_LIB_PATH) or (
            os.path.exists(_SRC_PATH)
            and os.path.getmtime(_SRC_PATH) > os.path.getmtime(_LIB_PATH)):
        if not _build():
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        print(f"[stitchax.native] load failed ({e}); using numpy fallback",
              file=sys.stderr)
        _build_failed = True
        return None
    lib.psnr_u8_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_void_p]
    lib.ssim_u8_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ctypes.c_void_p]
    _lib = lib
    return _lib
