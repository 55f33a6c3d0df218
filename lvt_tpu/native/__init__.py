"""ctypes bindings for the native IO kernels (lvt_io.cpp).

Compiled on demand with g++ (cached next to the source); every entry point
has a pure-Python fallback, so the framework runs without a toolchain.
"""

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "lvt_io.cpp")
_SO = os.path.join(_HERE, "liblvt_io.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build(force: bool = False) -> Optional[str]:
    try:
        src_mtime = os.path.getmtime(_SRC)
    except OSError:
        # source missing (e.g. a packaging that shipped only the .so):
        # use the binary if present, never rebuild
        return _SO if os.path.exists(_SO) else None
    if (not force and os.path.exists(_SO)
            and os.path.getmtime(_SO) >= src_mtime):
        return _SO
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO, "-lz"]
    try:
        subprocess.check_output(cmd, stderr=subprocess.STDOUT)
        return _SO
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        logger.warning(f"native lvt_io build failed ({e}); using Python fallbacks")
        return None


def _load(so: str):
    try:
        return ctypes.CDLL(so)
    except OSError as e:
        logger.warning(f"loading {so} failed ({e})")
        return None


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        lib = _load(so)
        if lib is None:
            # stale/incompatible binary (different-ABI checkout): rebuild
            # once, else fall back to the Python paths as documented
            so = _build(force=True)
            lib = _load(so) if so else None
            if lib is None:
                logger.warning("native lvt_io unusable; using Python fallbacks")
                return None
        lib.decode_png_file_rgb.restype = ctypes.c_int
        lib.decode_png_file_rgb.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.load_npy_i32_sequence.restype = ctypes.c_long
        lib.load_npy_i32_sequence.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_long]
        _lib = lib
        return _lib


def read_png_rgb(path: str) -> Optional[np.ndarray]:
    """Decode a PNG to (H, W, 3) uint8, or None if the native path can't."""
    lib = get_lib()
    if lib is None:
        return None
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    # dimension query
    rc = lib.decode_png_file_rgb(path.encode(), None, 0,
                                 ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.decode_png_file_rgb(path.encode(), out.ctypes.data, out.nbytes,
                                 ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        return None
    return out


def load_npy_sequence_i32(paths: List[str], per_file_shape) -> Optional[np.ndarray]:
    """Load N same-shape int npy files -> (N, *per_file_shape) int32,
    or None if the native path can't."""
    lib = get_lib()
    if lib is None:
        return None
    per = int(np.prod(per_file_shape))
    out = np.empty((len(paths), per), np.int32)
    joined = "\n".join(paths).encode()
    rc = lib.load_npy_i32_sequence(joined, len(paths), out.ctypes.data,
                                   out.size)
    if rc != per:
        return None
    return out.reshape((len(paths),) + tuple(per_file_shape))
