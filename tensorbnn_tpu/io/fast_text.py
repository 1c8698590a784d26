"""ctypes loader for the native text parser, with a numpy fallback.

Compiles ``io/native/fast_text.cpp`` to a shared object on first use (g++ is
in the image; pybind11 is not, so the binding is a plain C ABI + ctypes).
Falls back to ``np.loadtxt`` when no compiler is available, so the package
stays pure-Python-runnable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_SRC = os.path.join(_NATIVE_DIR, "fast_text.cpp")
_SO = os.path.join(_NATIVE_DIR, "libfast_text.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC,
             "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        if not hasattr(lib, "tbnn_format_floats"):
            # stale .so from before the formatter existed (e.g. source
            # mtimes equal after a copy, so the rebuild check skipped):
            # rebuild once; if the symbol is still missing, fall back to
            # pure Python rather than AttributeError-ing callers
            if not _build():
                return None
            try:
                lib = ctypes.CDLL(_SO)
            except OSError:
                return None
            if not hasattr(lib, "tbnn_format_floats"):
                return None
        lib.tbnn_parse_floats.restype = ctypes.c_long
        lib.tbnn_parse_floats.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_long,
        ]
        lib.tbnn_count_floats.restype = ctypes.c_long
        lib.tbnn_count_floats.argtypes = [ctypes.c_char_p]
        lib.tbnn_format_floats.restype = ctypes.c_long
        lib.tbnn_format_floats.argtypes = [
            np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_long,
            ctypes.c_long,
            ctypes.c_char_p,
            ctypes.c_long,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def load_floats(path: str, dtype=np.float32) -> np.ndarray:
    """Parses all whitespace-separated floats in ``path`` into a flat array.

    Uses the native parser when available (~50-100x faster than np.loadtxt
    on large posterior files), numpy otherwise. Raises FileNotFoundError on
    a missing file either way.
    """
    if not os.path.exists(path):
        raise FileNotFoundError(f"{path} not found.")
    lib = _load()
    if lib is None:
        return np.loadtxt(path, dtype=dtype, ndmin=1).reshape(-1)

    # every value costs >= 2 bytes ("0\n"), so size/2+2 bounds the count
    cap = max(os.path.getsize(path) // 2 + 2, 8)
    out = np.empty(cap, np.float64)
    n = lib.tbnn_parse_floats(path.encode(), out, cap)
    if n == -2:  # capacity miss (pathological formatting); exact recount
        cap = lib.tbnn_count_floats(path.encode())
        out = np.empty(cap, np.float64)
        n = lib.tbnn_parse_floats(path.encode(), out, cap)
    if n < 0:
        raise IOError(f"native parser failed on {path} (code {n})")
    return out[:n].astype(dtype)


def format_floats(arr: np.ndarray) -> Optional[bytes]:
    """Formats an array exactly like ``np.savetxt``'s default ``%.18e``
    (1-D arrays one value per line, 2-D arrays one row per line), using
    the native formatter. Returns None when the native library is
    unavailable — callers fall back to np.savetxt.
    """
    lib = _load()
    if lib is None:
        return None
    a = np.ascontiguousarray(np.atleast_1d(np.asarray(arr)), np.float64)
    if a.ndim == 1:
        a = a[:, None]
    elif a.ndim > 2:
        a = a.reshape(a.shape[0], -1)
    n = a.size
    cols = a.shape[1] if n else 1
    # each "%.18e" value is <= 25 chars (sign + 1.18 digits + e+XXX for
    # 3-digit exponents) plus a separator
    cap = 32 * n + 16
    buf = ctypes.create_string_buffer(cap)
    wrote = lib.tbnn_format_floats(a.reshape(-1), n, cols, buf, cap)
    if wrote < 0:
        return None
    return buf.raw[:wrote]
