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


def _make(src_dir: str) -> bool:
    if not os.path.exists(os.path.join(src_dir, "Makefile")):
        return False
    import subprocess

    try:
        subprocess.run(
            ["make", "-C", src_dir, "-s"],
            check=True,
            timeout=120,
            capture_output=True,
        )
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    # always (re)run make before the first dlopen: a fresh checkout builds
    # on demand, a stale gitignored .so picks up new sources/symbols, and
    # an up-to-date one makes this a no-op. Doing it pre-dlopen matters —
    # dlopen caches by path, so a post-load rebuild would be invisible.
    _make(os.path.dirname(path))
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
    if hasattr(lib, "promptir_png_decode_rgb"):
        lib.promptir_png_info.argtypes = [
            u8p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.promptir_png_info.restype = ctypes.c_int
        lib.promptir_png_decode_rgb.argtypes = [
            u8p, ctypes.c_int64, u8p, ctypes.c_int64,
        ]
        lib.promptir_png_decode_rgb.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def available() -> bool:
    return load() is not None


def decode_png_rgb(data: bytes) -> Optional[np.ndarray]:
    """Decode an in-memory PNG to HWC uint8 RGB with the native reader.

    Returns None when the native library is missing or the file is outside
    the decoder's scope (JPEG, 16-bit, interlaced, ...) — callers fall back
    to PIL. GIL is released during the C call, so thread-pool loaders get
    real decode parallelism (the reference needs 16 worker *processes* for
    the same effect, /root/reference/train.py:336-337).
    """
    lib = load()
    if lib is None or not hasattr(lib, "promptir_png_decode_rgb"):
        return None
    buf = np.frombuffer(data, np.uint8)
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    if lib.promptir_png_info(buf, buf.size, ctypes.byref(h),
                             ctypes.byref(w)) != 0:
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.promptir_png_decode_rgb(buf, buf.size, out.reshape(-1),
                                     out.size)
    if rc != 0:
        return None
    return out


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
