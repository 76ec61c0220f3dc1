"""ctypes bindings for the native (C++) sample-preparation kernels.

Loads native/libpromptir_native.so (build with `make -C native`). All
entry points have pure-Python equivalents in this package; the native path
is an opt-in host-throughput optimization for the training loader (the
reference's analogue is its 16 DataLoader worker processes,
/root/reference/train.py:336-337).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib_path() -> str:
    env = os.environ.get("PROMPTIR_NATIVE_LIB")
    if env:
        return env
    here = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    return os.path.join(here, "native", "libpromptir_native.so")


def load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        # build on demand (g++ is a baseline tool on the target hosts)
        src_dir = os.path.dirname(path)
        if os.path.exists(os.path.join(src_dir, "Makefile")):
            import subprocess

            try:
                subprocess.run(
                    ["make", "-C", src_dir, "-s"],
                    check=True,
                    timeout=120,
                    capture_output=True,
                )
            except Exception:
                return None
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.prepare_denoise_sample.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_uint64,
        f32p, f32p,
    ]
    lib.prepare_denoise_sample.restype = None
    lib.prepare_paired_sample.argtypes = [
        u8p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, f32p, f32p,
    ]
    lib.prepare_paired_sample.restype = None
    _LIB = lib
    return _LIB


def available() -> bool:
    return load() is not None


def prepare_denoise_sample(
    img_u8: np.ndarray,
    ci: int,
    cj: int,
    patch: int,
    mode: int,
    sigma: float,
    seed: int,
) -> Tuple[np.ndarray, np.ndarray]:
    lib = load()
    assert lib is not None
    img = np.ascontiguousarray(img_u8)
    h, w = img.shape[:2]
    degraded = np.empty((patch, patch, 3), np.float32)
    clean = np.empty((patch, patch, 3), np.float32)
    lib.prepare_denoise_sample(
        img, h, w, ci, cj, patch, mode, float(sigma),
        np.uint64(seed), degraded, clean,
    )
    return degraded, clean


def prepare_paired_sample(
    degraded_u8: np.ndarray,
    clean_u8: np.ndarray,
    ci: int,
    cj: int,
    patch: int,
    mode: int,
) -> Tuple[np.ndarray, np.ndarray]:
    lib = load()
    assert lib is not None
    d = np.ascontiguousarray(degraded_u8)
    c = np.ascontiguousarray(clean_u8)
    h, w = d.shape[:2]
    degraded = np.empty((patch, patch, 3), np.float32)
    clean = np.empty((patch, patch, 3), np.float32)
    lib.prepare_paired_sample(
        d, c, h, w, ci, cj, patch, mode, degraded, clean
    )
    return degraded, clean
