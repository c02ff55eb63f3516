"""ctypes bindings for the native (C++) image loader.

Build on first use with g++ (baked into the image; libpng/libjpeg system
libraries). Falls back cleanly when unavailable — callers check
``available()``. Enabled in the data loaders via NEFES_NATIVE_LOADER=1 or
the ``native=True`` argument (box downsample is bit-compatible with
cv2.INTER_AREA at the integer ratios the configs use; parity gated in
tests/test_native_loader.py).
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import threading

import numpy as np

_HERE = osp.dirname(__file__)
_SRC = osp.join(_HERE, "loader.cpp")
_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_TRIED = False


def _so_path() -> str:
    cache = os.environ.get("NEFES_NATIVE_CACHE",
                           osp.join(_HERE, "_build"))
    os.makedirs(cache, exist_ok=True)
    return osp.join(cache, "libnefes_loader.so")


def _build() -> str | None:
    so = _so_path()
    if osp.exists(so) and osp.getmtime(so) >= osp.getmtime(_SRC):
        return so
    # compile to a temp name + atomic rename: an interrupted g++ must not
    # leave a corrupt .so that the mtime check would then cache forever
    tmp = so + f".tmp{os.getpid()}"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
           "-lpng", "-ljpeg", "-pthread", "-o", tmp]
    subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    os.replace(tmp, so)
    return so


def _load() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        try:
            so = _build()
            lib = ctypes.CDLL(so)
        except Exception as e:  # toolchain/libs/corrupt-.so -> fallback
            print(f"[native] loader unavailable ({e}); using PIL path")
            return None
        lib.nefes_load_images.restype = ctypes.c_int
        lib.nefes_load_images.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def load_images_native(paths: list[str], H: int, W: int,
                       n_threads: int = 0) -> np.ndarray:
    """Decode + resize to (N, H, W, 3) float32 [0,1] on C++ threads.
    Raises RuntimeError on decode failures or if the library is absent."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    out = np.empty((n, H, W, 3), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    fails = lib.nefes_load_images(
        arr, n, H, W, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads)
    if fails:
        raise RuntimeError(f"native loader failed on {fails}/{n} images")
    return out
