"""ctypes binding for the native batch image loader (depth_image_captioning_pub_tpu/native/fastimage.cpp).

Builds the shared library on first use with g++ (no pybind11 in this
environment; the C ABI + ctypes keeps the binding dependency-free) and
falls back to PIL transparently — per failed file (PNGs, corrupt JPEGs) or
wholesale if the toolchain/libjpeg is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

# The C++ source ships as package data (pyproject package-data) so a pip
# install can build it too; the .so lands next to the source when that
# directory is writable (checkout case), else in a per-user cache dir
# (read-only site-packages case). $DCAP_FASTIMAGE_LIB overrides.
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SRC = os.path.join(_NATIVE_DIR, "fastimage.cpp")


def _lib_path() -> str:
    if env := os.environ.get("DCAP_FASTIMAGE_LIB"):
        return env
    if os.access(_NATIVE_DIR, os.W_OK):
        return os.path.join(_NATIVE_DIR, "libfastimage.so")
    cache = os.path.join(os.path.expanduser("~"), ".cache",
                         "depth_image_captioning_pub_tpu")
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, "libfastimage.so")


_LIB = _lib_path()

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
           "-o", _LIB, "-ljpeg", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not os.path.exists(_LIB) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
            lib.fastimage_decode_batch.restype = ctypes.c_int
            lib.fastimage_decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
            _lib = lib
        except OSError:
            _failed = True
        return _lib


def available() -> bool:
    return _load() is not None


def decode_batch(paths: Sequence[str], hw: Tuple[int, int],
                 threads: int = 4, on_error: str = "raise",
                 failed: Optional[list] = None) -> np.ndarray:
    """Decode+resize a batch of image files -> [N, H, W, 3] uint8.

    JPEGs go through the native loader (DCT-scaled decode + threaded);
    anything it can't handle falls back to PIL per file.

    ``on_error``: "raise" (default — a file neither decoder can read
    raises, matching the reference's eval behavior) or "zero" — the row
    stays zeros and the index is appended to ``failed`` (batch tools
    caption the rest instead of dying on one truncated file).
    """
    if on_error not in ("raise", "zero"):
        raise ValueError(f"on_error must be 'raise' or 'zero': {on_error}")
    n = len(paths)
    h, w = hw
    out = np.zeros((n, h, w, 3), dtype=np.uint8)
    lib = _load()
    ok = np.zeros((n,), dtype=np.uint8)
    if lib is not None and n:
        c_paths = (ctypes.c_char_p * n)(
            *[p.encode() for p in paths])
        lib.fastimage_decode_batch(
            c_paths, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            h, w, ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), threads)
    for i in range(n):
        if not ok[i]:
            from PIL import Image
            try:
                img = Image.open(paths[i]).convert("RGB").resize(
                    (w, h), Image.BILINEAR)
                out[i] = np.asarray(img, dtype=np.uint8)
            except Exception:
                if on_error == "raise":
                    raise
                if failed is not None:
                    failed.append(i)
    return out
