"""ctypes bindings for the native data-path (native/mvd_native.cpp).

Builds the shared library on first use (g++ -O3, links zlib + libpng) into
``native/build/``; every call degrades gracefully to the PIL path when the
toolchain or libraries are missing, so the framework never hard-depends on
the native build.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "mvd_native.cpp"))
_SO = os.path.abspath(os.path.join(_NATIVE_DIR, "build", "libmvd_native.so"))

_lock = threading.Lock()
_lib = None
_tried = False


def build_native(force: bool = False) -> Optional[str]:
    """Compile the shared library if needed; returns its path or None."""
    if os.path.exists(_SO) and not force and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
        "-o", _SO, "-lz", "-lpng",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True, timeout=120)
        return _SO
    except Exception as e:
        detail = getattr(e, "stderr", "") or str(e)
        logger.warning("native build failed (%s); falling back to PIL", detail[:500])
        return None


def get_lib():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so = build_native()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.mvd_load_view.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.mvd_load_view.restype = ctypes.c_int
        lib.mvd_read_entry.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_long),
        ]
        lib.mvd_read_entry.restype = ctypes.c_int
        lib.mvd_load_views_batch.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.mvd_load_views_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def load_view(zip_path: str, entry: str, size: int) -> np.ndarray:
    """(size, size, 3) float32 in [-1,1]; raises on failure."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    out = np.empty((size, size, 3), np.float32)
    rc = lib.mvd_load_view(
        zip_path.encode(), entry.encode(), size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise RuntimeError(f"mvd_load_view({zip_path}, {entry}) failed rc={rc}")
    return out


def read_entry(zip_path: str, entry: str, max_size: int = 1 << 20) -> bytes:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    buf = (ctypes.c_ubyte * max_size)()
    n = ctypes.c_long(max_size)
    rc = lib.mvd_read_entry(zip_path.encode(), entry.encode(), buf, ctypes.byref(n))
    if rc == -1:  # retry with the reported size
        buf = (ctypes.c_ubyte * n.value)()
        rc = lib.mvd_read_entry(zip_path.encode(), entry.encode(), buf, ctypes.byref(n))
    if rc != 0:
        raise RuntimeError(f"mvd_read_entry({zip_path}, {entry}) failed rc={rc}")
    return bytes(buf[: n.value])


def load_views_batch(zip_path: str, entries: List[str], size: int) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    out = np.empty((len(entries), size, size, 3), np.float32)
    packed = b"\0".join(e.encode() for e in entries) + b"\0"
    failures = lib.mvd_load_views_batch(
        zip_path.encode(), packed, len(entries), size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if failures:
        raise RuntimeError(f"{failures} views failed to decode in {zip_path}")
    return out
