"""ctypes bindings for the native host kernels (native/biotpu.cpp).

The shared library is compiled on first use (g++ -O3, cached next to the
source) and every entry point has a pure-Python/numpy fallback, so the
framework works without a toolchain — just slower on index builds.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(os.path.dirname(_HERE), "native", "biotpu.cpp")
_LIB_PATH = os.path.join(os.path.dirname(_HERE), "native", "libbiotpu.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    if not os.path.exists(_SRC):
        return None
    if os.path.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC):
        return _LIB_PATH
    try:
        subprocess.run(
            [
                "g++", "-O3", "-march=native", "-shared", "-fPIC",
                "-o", _LIB_PATH, _SRC,
            ],
            check=True,
            capture_output=True,
        )
        return _LIB_PATH
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        i64p = ctypes.POINTER(ctypes.c_int64)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.sais_i64.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64, i64p]
        lib.sdpkpp_i64.argtypes = [
            i64p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, i64p, i64p, i64p,
        ]
        lib.sdpkpp_i64.restype = None
        lib.sais_i64.restype = None
        lib.myers_distance_u64.argtypes = [u8p, ctypes.c_int64, u8p, ctypes.c_int64]
        lib.myers_distance_u64.restype = ctypes.c_int64
        lib.hamming_u8.argtypes = [u8p, u8p, ctypes.c_int64]
        lib.hamming_u8.restype = ctypes.c_int64
        lib.bytecount_u8.argtypes = [u8p, ctypes.c_int64, ctypes.c_uint8]
        lib.bytecount_u8.restype = ctypes.c_int64
        lib.kmer_matches_i64.argtypes = [
            u8p, ctypes.c_int64, u8p, ctypes.c_int64, ctypes.c_int64,
            i64p, ctypes.c_int64,
        ]
        lib.kmer_matches_i64.restype = ctypes.c_int64
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.band_raster_i64.argtypes = [
            i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, i32p, i32p,
        ]
        lib.band_raster_i64.restype = None
        try:
            lib.sais_u8_i32.argtypes = [
                u8p, ctypes.c_int32, ctypes.c_int32, i32p,
            ]
            lib.sais_u8_i32.restype = None
            lib.sais_u8_i64.argtypes = [
                u8p, ctypes.c_int64, ctypes.c_int64, i64p,
            ]
            lib.sais_u8_i64.restype = None
        except AttributeError:
            pass  # stale .so without the genome-scale entry points
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def sais(transformed: np.ndarray, alphabet_size: int) -> Optional[np.ndarray]:
    """O(n) suffix array of an integer text, or None if native unavailable.

    Dispatches on text length and alphabet width like the reference
    (suffix_array.rs:270-281): byte-alphabet texts run the u8-text kernel
    (1 byte/symbol input) and texts under 2^31 symbols build into an i32
    SA (~7 bytes/symbol working set) upcast to int64 on return only below
    the genome-scale threshold — huge SAs stay i32 (numpy indexing is
    dtype-agnostic downstream)."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(transformed)
    u8_ok = alphabet_size <= 256 and hasattr(lib, "sais_u8_i32")
    if u8_ok and n < 2**31 - 1:
        t = np.ascontiguousarray(transformed, dtype=np.uint8)
        sa32 = np.empty(n, dtype=np.int32)
        lib.sais_u8_i32(
            t.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n,
            int(alphabet_size),
            sa32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        # small arrays keep the historical int64 dtype; genome-scale SAs
        # stay i32 to avoid an 8n transient
        return sa32 if n >= (1 << 27) else sa32.astype(np.int64)
    if u8_ok:
        t = np.ascontiguousarray(transformed, dtype=np.uint8)
        sa = np.empty(n, dtype=np.int64)
        lib.sais_u8_i64(
            t.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n,
            int(alphabet_size),
            sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return sa
    t = np.ascontiguousarray(transformed, dtype=np.int64)
    sa = np.empty(n, dtype=np.int64)
    lib.sais_i64(
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        int(alphabet_size),
        sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return sa


def levenshtein(a: bytes, b: bytes) -> Optional[int]:
    lib = get_lib()
    if lib is None:
        return None
    aa = np.frombuffer(a, dtype=np.uint8)
    bb = np.frombuffer(b, dtype=np.uint8)
    return int(
        lib.myers_distance_u64(
            aa.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(a),
            bb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(b),
        )
    )


def hamming(a: bytes, b: bytes) -> Optional[int]:
    lib = get_lib()
    if lib is None or len(a) != len(b):
        return None
    aa = np.frombuffer(a, dtype=np.uint8)
    bb = np.frombuffer(b, dtype=np.uint8)
    return int(
        lib.hamming_u8(
            aa.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            bb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            len(a),
        )
    )


def kmer_matches(x: bytes, y: bytes, k: int):
    """Sorted (i, j) k-mer match pairs of x vs y (sparse.rs:337 twin), or
    None when the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    xa = np.frombuffer(x, dtype=np.uint8)
    ya = np.frombuffer(y, dtype=np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    cap = max(len(x) + len(y), 64)
    while True:
        out = np.empty(2 * cap, dtype=np.int64)
        cnt = int(
            lib.kmer_matches_i64(
                xa.ctypes.data_as(u8p), len(x),
                ya.ctypes.data_as(u8p), len(y),
                int(k), out.ctypes.data_as(i64p), cap,
            )
        )
        if cnt <= cap:
            return out[: 2 * cnt].reshape(cnt, 2)
        cap = cnt


def band_raster(path_xy: np.ndarray, m: int, n: int, k: int, w: int, clips):
    """Per-column band [starts, ends) from a sdpkpp match path (byte twin
    of banded.py Band.create_from_match_path), or None if unavailable.

    ``path_xy``: (np, 2) int64 path matches in path order; ``clips``:
    (xcp, xcs, ycp, ycs)."""
    lib = get_lib()
    if lib is None:
        return None
    p = np.ascontiguousarray(path_xy, dtype=np.int64)
    starts = np.empty(n + 1, dtype=np.int32)
    ends = np.empty(n + 1, dtype=np.int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.band_raster_i64(
        p.ctypes.data_as(i64p), len(p), int(m), int(n), int(k), int(w),
        int(clips[0]), int(clips[1]), int(clips[2]), int(clips[3]),
        starts.ctypes.data_as(i32p), ends.ctypes.data_as(i32p),
    )
    return starts, ends


def sdpkpp_native(xs, ys, k, match_score, go_neg, ge_neg):
    """Native sdpkpp chaining: returns (dp_score, dp_prev, best_score,
    best_idx) or None when the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    import numpy as _np

    xs = _np.ascontiguousarray(xs, dtype=_np.int64)
    ys = _np.ascontiguousarray(ys, dtype=_np.int64)
    nm = len(xs)
    dp_score = _np.zeros(nm, dtype=_np.int64)
    dp_prev = _np.zeros(nm, dtype=_np.int64)
    best = _np.zeros(2, dtype=_np.int64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.sdpkpp_i64(
        xs.ctypes.data_as(i64p),
        ys.ctypes.data_as(i64p),
        ctypes.c_int64(nm),
        ctypes.c_int64(k),
        ctypes.c_int64(match_score),
        ctypes.c_int64(go_neg),
        ctypes.c_int64(ge_neg),
        dp_score.ctypes.data_as(i64p),
        dp_prev.ctypes.data_as(i64p),
        best.ctypes.data_as(i64p),
    )
    return dp_score, dp_prev, int(best[0]), int(best[1])
