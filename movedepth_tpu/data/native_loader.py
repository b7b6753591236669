"""ctypes bindings for the native C++ loader core (native/loader.cpp).

Builds the shared library on first use (g++, libjpeg/libpng) and exposes
batch decode + chained-Lanczos-pyramid. Falls back cleanly when the
toolchain is unavailable -- callers check :func:`available`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libmdloader.so"))
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "libmdloader.so"],
            cwd=os.path.abspath(_NATIVE_DIR), check=True,
            capture_output=True,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        # make is a timestamp no-op when the .so is current; this also
        # rebuilds a stale library that predates newer ABI entry points
        # (md_jitter_batch). Keep a prebuilt .so usable without a
        # toolchain: only fail when the library file cannot be produced.
        if not _build() and not os.path.isfile(_LIB_PATH):
            _failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _failed = True
            return None
        lib.md_load_batch.restype = ctypes.c_int
        lib.md_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int,
        ]
        try:  # absent in a stale prebuilt .so without a toolchain
            lib.md_jitter_batch.restype = None
            lib.md_jitter_batch.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ]
        except AttributeError:
            pass
        lib.md_probe.restype = ctypes.c_int
        lib.md_probe.argtypes = [ctypes.c_char_p,
                                 ctypes.POINTER(ctypes.c_int),
                                 ctypes.POINTER(ctypes.c_int)]
        lib.md_decode.restype = ctypes.c_int
        lib.md_decode.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_float),
                                  ctypes.c_int, ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def load_batch(paths: Sequence[str], width: int, height: int,
               num_scales: int = 1, flips: Optional[Sequence[bool]] = None,
               num_threads: int = 8) -> List[np.ndarray]:
    """Decode+pyramid a batch of images in native threads.

    Returns [scale_0 (N, H, W, 3) float32, scale_1 (N, H/2, W/2, 3), ...].
    Failed decodes come back as zero images (the caller applies the
    reference's neighbor-duplication fallback at the sample level).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if flips is None:
        c_flips = None
    else:
        c_flips = (ctypes.c_uint8 * n)(*[1 if f else 0 for f in flips])
    outs = []
    c_outs = (ctypes.POINTER(ctypes.c_float) * num_scales)()
    for s in range(num_scales):
        arr = np.empty((n, height >> s, width >> s, 3), np.float32)
        outs.append(arr)
        c_outs[s] = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    lib.md_load_batch(c_paths, n, c_flips, width, height, num_scales,
                      c_outs, num_threads)
    return outs


def jitter_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "md_jitter_batch")


def jitter_batch(imgs: np.ndarray, params: Sequence[float],
                 order: Sequence[int], num_threads: int = 8) -> np.ndarray:
    """Apply the 4-op color jitter to (N, H, W, 3) float32 images in C++.

    ``params`` = (brightness, contrast, saturation, hue) factors and
    ``order`` the op permutation, exactly as drawn by
    data/kitti.py::color_jitter_np (whose numpy math this matches to float
    rounding; the hue op alone costs ~29 ms/frame in numpy). In-place on a
    C-contiguous input; returns the jittered array.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "md_jitter_batch"):
        raise RuntimeError("native jitter unavailable")
    imgs = np.ascontiguousarray(imgs, np.float32)
    n, h, w, c = imgs.shape
    assert c == 3
    c_params = (ctypes.c_float * 4)(*[float(p) for p in params])
    c_order = (ctypes.c_uint8 * 4)(*[int(o) for o in order])
    lib.md_jitter_batch(
        imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, h, w,
        c_params, c_order, num_threads)
    return imgs


def decode(path: str) -> Optional[np.ndarray]:
    """Decode one image at native resolution -> (H, W, 3) float32 or None."""
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.md_probe(path.encode(), ctypes.byref(w), ctypes.byref(h)):
        return None
    out = np.empty((h.value, w.value, 3), np.float32)
    if lib.md_decode(path.encode(),
                     out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                     w.value, h.value):
        return None
    return out
