"""Native (C++) host-side batch packing — lazily built, numpy fallback.

`gather_rows(tab, rows, out)` is a threaded row gather (pack.cc) used by
BatchLoader._pack for the dominant feature-table copy. The shared library
compiles once per machine into `_build/` with plain `g++ -O3 -shared`
(no pybind11 — ctypes over an extern-C symbol); anything failing (no
compiler, readonly tree) degrades to the numpy path silently. Set
REGAT_NO_NATIVE=1 to force the fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    src = os.path.join(_HERE, "pack.cc")
    build_dir = os.path.join(_HERE, "_build")
    so = os.path.join(build_dir, "libregatpack.so")
    try:
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            os.makedirs(build_dir, exist_ok=True)
            # pid-unique tmp: concurrent processes (multi-process feeding,
            # parallel CLI runs) each compile their own file; os.replace is
            # atomic, so whichever finishes last wins and nobody ever dlopens
            # a half-written .so.
            tmp = f"{so}.{os.getpid()}.tmp"
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-pthread",
                 src, "-o", tmp],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp, so)
        lib = ctypes.CDLL(so)
        fn = lib.regat_gather_rows
        fn.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ]
        fn.restype = None
        return lib
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if os.environ.get("REGAT_NO_NATIVE"):
        return None
    with _LOCK:
        if not _TRIED:
            _LIB = _build_and_load()
            _TRIED = True
    return _LIB


def gather_rows(
    tab: np.ndarray, rows: np.ndarray, out: np.ndarray, n_threads: int = 0
) -> bool:
    """out[i] = tab[rows[i]] (zeros where rows[i] < 0), threaded.

    Returns False (caller must use the numpy path) when the native library
    is unavailable or the arrays are not plainly contiguous."""
    lib = get_lib()
    if lib is None:
        return False
    if not (
        tab.flags.c_contiguous and out.flags.c_contiguous
        and tab.dtype == out.dtype and tab.ndim == 2 and out.ndim == 2
        and tab.shape[1] == out.shape[1]
    ):
        return False
    rows = np.ascontiguousarray(rows, np.int64)
    # raw-memory utility: an out-of-range row would memcpy out of bounds in
    # C++ (the numpy fallback raises instead) — refuse rather than trust
    # future callers (negligible cost next to the copy itself)
    if len(rows) and int(rows.max()) >= tab.shape[0]:
        return False
    # the write side needs the same distrust: more rows than `out` holds
    # would memcpy past its buffer (an OOB WRITE — worse than the read)
    if len(rows) > out.shape[0]:
        return False
    if n_threads <= 0:
        n_threads = min(8, os.cpu_count() or 1)
    lib.regat_gather_rows(
        tab.ctypes.data, rows.ctypes.data, out.ctypes.data,
        len(rows), tab.shape[1] * tab.itemsize, n_threads,
    )
    return True
