"""Native (C++) host-side components, loaded via ctypes.

`seq_parser.cpp` is the fast path for parsing sasrec_format.csv into the
dense [U, L] arrays (data/dataset.py falls back to the vectorized Python
parser when the shared library can't be built — e.g. no compiler).

The library is compiled on demand with g++ into this package directory
and cached; `build()` can be called explicitly (e.g. from CI).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "seq_parser.cpp")
_LIB = os.path.join(_HERE, "_seq_parser.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def build(force: bool = False) -> str:
    """Compile the shared library; returns its path."""
    if force or not os.path.exists(_LIB) or (
        os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
    ):
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _LIB]
        subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def load() -> Optional[ctypes.CDLL]:
    """Build+load the library; returns None if unavailable."""
    global _lib, _failed
    if _lib is not None:
        return _lib
    if _failed:
        return None
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            path = build()
            lib = ctypes.CDLL(path)
            lib.mgr_count_rows.restype = ctypes.c_int64
            lib.mgr_count_rows.argtypes = [ctypes.c_char_p]
            lib.mgr_parse_sequences.restype = ctypes.c_int64
            i32p = ctypes.POINTER(ctypes.c_int32)
            i64p = ctypes.POINTER(ctypes.c_int64)
            lib.mgr_parse_sequences.argtypes = [
                ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int64,
                i32p, i32p, i32p, i32p, i32p, i32p, i32p, i64p,
            ]
            _lib = lib
        except (subprocess.CalledProcessError, OSError):
            _failed = True
    return _lib


def parse_sequences_native(
    path: str, max_len: int, ignore_last_n: int, chronological: bool
):
    """Parse a sequence CSV with the native parser; None if unavailable."""
    import numpy as np

    lib = load()
    if lib is None:
        return None
    u = lib.mgr_count_rows(path.encode())
    if u <= 0:
        return None
    L = max_len
    lengths = np.zeros(u, dtype=np.int32)
    ids = np.zeros((u, L), dtype=np.int32)
    ratings = np.zeros((u, L), dtype=np.int32)
    timestamps = np.zeros((u, L), dtype=np.int32)
    target_id = np.zeros(u, dtype=np.int32)
    target_rating = np.zeros(u, dtype=np.int32)
    target_ts = np.zeros(u, dtype=np.int32)
    user_ids = np.zeros(u, dtype=np.int64)

    def ptr(a, t):
        return a.ctypes.data_as(t)

    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    rows = lib.mgr_parse_sequences(
        path.encode(), L, ignore_last_n, int(chronological), u,
        ptr(lengths, i32p), ptr(ids, i32p), ptr(ratings, i32p),
        ptr(timestamps, i32p), ptr(target_id, i32p),
        ptr(target_rating, i32p), ptr(target_ts, i32p), ptr(user_ids, i64p),
    )
    if rows != u:
        return None
    return {
        "lengths": lengths,
        "ids": ids,
        "ratings": ratings,
        "timestamps": timestamps,
        "target_id": target_id,
        "target_rating": target_rating,
        "target_timestamp": target_ts,
        "user_ids": user_ids,
    }
