"""Native (C++) host-side data-loading kernels with ctypes bindings.

Compiled on first use with the system ``g++`` (cached next to the
source); every entry point has a NumPy fallback so the package works
without a toolchain. See ``loader.cpp`` for the kernel inventory.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

__all__ = [
    "available",
    "u8_to_f32",
    "preprocess_u8",
    "reorder_patterns",
]

_HERE = Path(__file__).parent
_SO_PATH = _HERE / "_loader.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    src = _HERE / "loader.cpp"
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        str(src), "-o", str(_SO_PATH),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _get_lib():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _SO_PATH.exists() or _SO_PATH.stat().st_mtime < (
            _HERE / "loader.cpp"
        ).stat().st_mtime:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_SO_PATH))
        except OSError:
            return None
        lib.kp_u8_to_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.kp_preprocess_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            ctypes.c_float, ctypes.c_float,
        ]
        lib.kp_reorder_patterns.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    """Whether the native library is built and loadable."""
    return _get_lib() is not None


def u8_to_f32(src: np.ndarray) -> np.ndarray:
    """Bulk uint8 -> float32 conversion (threaded native, NumPy
    fallback)."""
    src = np.ascontiguousarray(src, dtype=np.uint8)
    lib = _get_lib()
    if lib is None:
        return src.astype(np.float32)
    out = np.empty(src.shape, dtype=np.float32)
    lib.kp_u8_to_f32(
        src.ctypes.data, out.ctypes.data, ctypes.c_int64(src.size)
    )
    return out


def preprocess_u8(
    patterns: np.ndarray,
    static_bg: np.ndarray,
    operation: str = "subtract",
    out_range: tuple[float, float] = (-1.0, 1.0),
) -> np.ndarray:
    """uint8 -> float32 static-background removal + per-pattern rescale
    on the host (threaded native; NumPy fallback). Mirrors
    ``ops.pattern.remove_static_background`` for staging streamed
    chunks before device upload."""
    patterns = np.ascontiguousarray(patterns, dtype=np.uint8)
    lead = patterns.shape[:-2]
    sy, sx = patterns.shape[-2:]
    n = int(np.prod(lead)) if lead else 1
    bg = np.ascontiguousarray(static_bg, dtype=np.float32).reshape(-1)
    if bg.size != sy * sx:
        raise ValueError(
            f"static background size {bg.size} != pattern size {sy * sx}"
        )
    op = {"subtract": 0, "divide": 1}[operation]
    lib = _get_lib()
    if lib is None:
        p = patterns.reshape(n, -1).astype(np.float32)
        p = p - bg if op == 0 else p / bg
        mn = p.min(axis=1, keepdims=True)
        mx = p.max(axis=1, keepdims=True)
        out = (p - mn) / (mx - mn) * (out_range[1] - out_range[0]) + out_range[0]
        return out.reshape(patterns.shape).astype(np.float32)
    out = np.empty(patterns.shape, dtype=np.float32)
    lib.kp_preprocess_u8(
        patterns.ctypes.data,
        bg.ctypes.data,
        out.ctypes.data,
        ctypes.c_int64(n),
        ctypes.c_int64(sy * sx),
        ctypes.c_int(op),
        ctypes.c_float(out_range[0]),
        ctypes.c_float(out_range[1]),
    )
    return out


def reorder_patterns(src: np.ndarray, order: np.ndarray) -> np.ndarray:
    """Gather-reorder patterns (first axis) by ``order`` (threaded
    native memcpy; NumPy fallback). Used for Oxford .ebsp files whose
    patterns are stored out of map order."""
    src = np.ascontiguousarray(src)
    order = np.ascontiguousarray(order, dtype=np.int64)
    lib = _get_lib()
    if lib is None:
        return src[order]
    out = np.empty((order.size,) + src.shape[1:], dtype=src.dtype)
    bytes_per = int(np.prod(src.shape[1:])) * src.dtype.itemsize
    lib.kp_reorder_patterns(
        src.ctypes.data,
        order.ctypes.data,
        out.ctypes.data,
        ctypes.c_int64(order.size),
        ctypes.c_int64(bytes_per),
    )
    return out
