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
    src_mtime = max(
        os.path.getmtime(os.path.join(os.path.dirname(_SRC), f))
        for f in ("biotpu.cpp", "sais.hpp", "banded_dp.hpp")
        if os.path.exists(os.path.join(os.path.dirname(_SRC), f))
    )
    if os.path.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= src_mtime:
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
        try:
            u32p = ctypes.POINTER(ctypes.c_uint32)
            lib.sais_u8_u32.argtypes = [
                u8p, ctypes.c_int64, ctypes.c_int64, u32p,
            ]
            lib.sais_u8_u32.restype = None
        except AttributeError:
            pass  # stale .so without the u32 human-genome entry point
        try:
            u16p = ctypes.POINTER(ctypes.c_uint16)
            lib.cigars_colrle.argtypes = [
                u16p, u16p, ctypes.c_int64, ctypes.c_int64,
                i32p, i32p, i32p, i32p, i32p, i32p, i32p,
                ctypes.c_int64, ctypes.c_char_p, i32p, ctypes.c_int64,
            ]
            lib.cigars_colrle.restype = None
        except AttributeError:
            pass  # stale .so without the CIGAR emitter
        try:
            u8pp = u8p
            lib.banded_batch.argtypes = [
                u8pp, i64p, ctypes.c_int64, u8pp, i64p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, i32p, i32p, u8pp, i32p, i32p,
            ]
            lib.banded_batch.restype = None
        except AttributeError:
            pass  # stale .so without the banded host batch
        try:
            lib.band_build_batch.argtypes = [
                u8p, i64p, ctypes.c_int64, u8p, i64p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, i32p, i32p, i64p, i64p, i64p, i64p,
            ]
            lib.band_build_batch.restype = None
        except AttributeError:
            pass  # stale .so without the batched band builder
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
    if u8_ok and n < 2**32 and hasattr(lib, "sais_u8_u32"):
        # full-human-genome envelope (3.1 Gbp): u32 SA storage at the top
        # level, i32 recursion — half the i64 path's working set
        t = np.ascontiguousarray(transformed, dtype=np.uint8)
        sa_u32 = np.empty(n, dtype=np.uint32)
        lib.sais_u8_u32(
            t.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n,
            int(alphabet_size),
            sa_u32.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        )
        return sa_u32
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


def sais_u32(transformed: np.ndarray, alphabet_size: int) -> Optional[np.ndarray]:
    """Force the u8-text/u32-SA top-level instantiation regardless of
    length (the >= 2^31 human-genome path; exposed so tests can property-
    check it against the i32 path on small texts)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "sais_u8_u32"):
        return None
    if alphabet_size > 256:
        return None
    n = len(transformed)
    t = np.ascontiguousarray(transformed, dtype=np.uint8)
    sa = np.empty(n, dtype=np.uint32)
    lib.sais_u8_u32(
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n,
        int(alphabet_size),
        sa.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
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


def band_build_batch(
    xb: np.ndarray, mlens: np.ndarray, yb: np.ndarray, nlens: np.ndarray,
    k: int, w: int, clips, match_score: int, go_neg: int, ge_neg: int,
    crop: bool, wcap: int, nthreads: int = 0,
):
    """Batched threaded band build (kmer matches -> sdpkpp -> raster per
    pair, all native) with CROPPED window outputs: returns (st_w, en_w
    (B, wcap+1) i32 band rows for columns [c0, c0+nle], c0 (B,) i64,
    nle (B,) i64 (-1 = window wider than wcap), cells (B,) i64 band
    sizes, jwin (B, 2) i64 first/last nonempty band column or -1/-1) or
    None when the library is unavailable.

    ``xb``/``yb``: (B, Mmax)/(B, Nmax) uint8 padded rows; ``clips``:
    (xcp, xcs, ycp, ycs).  One call replaces B x 3 per-pair ctypes round
    trips (~1 ms/pair -> ~30 us/pair at bench batch sizes), and window
    outputs avoid materializing (B, Nmax+1) arrays (~160 MB per
    1K x 20 kb batch)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "band_build_batch"):
        return None
    xb = np.ascontiguousarray(xb, dtype=np.uint8)
    yb = np.ascontiguousarray(yb, dtype=np.uint8)
    mlens = np.ascontiguousarray(mlens, dtype=np.int64)
    nlens = np.ascontiguousarray(nlens, dtype=np.int64)
    B, Mmax = xb.shape
    Nmax = yb.shape[1]
    st_w = np.empty((B, wcap + 1), dtype=np.int32)
    en_w = np.empty((B, wcap + 1), dtype=np.int32)
    c0 = np.empty(B, dtype=np.int64)
    nle = np.empty(B, dtype=np.int64)
    cells = np.empty(B, dtype=np.int64)
    jwin = np.empty((B, 2), dtype=np.int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.band_build_batch(
        xb.ctypes.data_as(u8p), mlens.ctypes.data_as(i64p),
        ctypes.c_int64(Mmax),
        yb.ctypes.data_as(u8p), nlens.ctypes.data_as(i64p),
        ctypes.c_int64(Nmax), ctypes.c_int64(B),
        ctypes.c_int64(k), ctypes.c_int64(w),
        ctypes.c_int64(clips[0]), ctypes.c_int64(clips[1]),
        ctypes.c_int64(clips[2]), ctypes.c_int64(clips[3]),
        ctypes.c_int64(match_score), ctypes.c_int64(go_neg),
        ctypes.c_int64(ge_neg), ctypes.c_int64(nthreads),
        ctypes.c_int64(1 if crop else 0), ctypes.c_int64(wcap),
        st_w.ctypes.data_as(i32p), en_w.ctypes.data_as(i32p),
        c0.ctypes.data_as(i64p), nle.ctypes.data_as(i64p),
        cells.ctypes.data_as(i64p), jwin.ctypes.data_as(i64p),
    )
    return st_w, en_w, c0, nle, cells, jwin


def cigars_colrle(
    ex: np.ndarray, cnt: np.ndarray, nlens, mlens, ins0, fix_exit,
    fix_ins, xstart, xend, nthreads: int = 0,
):
    """Threaded native column-RLE -> CIGAR strings: returns a list of B
    strings, or None when the library is unavailable or any row
    overflows the emit buffer (caller falls back to the numpy path).

    ``ex``/``cnt``: (B, N) row-major uint16 exit codes / ins runs."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "cigars_colrle"):
        return None
    ex = np.ascontiguousarray(ex, dtype=np.uint16)
    cnt = np.ascontiguousarray(cnt, dtype=np.uint16)
    B, N = ex.shape
    cap = 12 * N + 48
    out = np.empty(B * cap, dtype=np.uint8)
    out_len = np.empty(B, dtype=np.int32)
    a32 = lambda v: np.ascontiguousarray(v, dtype=np.int32)
    nlens, mlens, ins0 = a32(nlens), a32(mlens), a32(ins0)
    fix_exit, fix_ins = a32(fix_exit), a32(fix_ins)
    xstart, xend = a32(xstart), a32(xend)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.cigars_colrle(
        ex.ctypes.data_as(u16p), cnt.ctypes.data_as(u16p),
        ctypes.c_int64(B), ctypes.c_int64(N),
        nlens.ctypes.data_as(i32p), mlens.ctypes.data_as(i32p),
        ins0.ctypes.data_as(i32p), fix_exit.ctypes.data_as(i32p),
        fix_ins.ctypes.data_as(i32p), xstart.ctypes.data_as(i32p),
        xend.ctypes.data_as(i32p), ctypes.c_int64(cap),
        out.ctypes.data_as(ctypes.c_char_p), out_len.ctypes.data_as(i32p),
        ctypes.c_int64(nthreads),
    )
    if (out_len < 0).any():
        return None
    raw = out.tobytes()
    return [
        raw[b * cap : b * cap + int(out_len[b])].decode()
        for b in range(B)
    ]


def banded_batch(
    xb: np.ndarray, mlens: np.ndarray, yb: np.ndarray, nlens: np.ndarray,
    k: int, w: int, clips, match_score: int, mismatch_score: int,
    gap_open: int, gap_extend: int, nthreads: int = 0,
):
    """Threaded native banded-aligner batch (band build + banded DP +
    walk per pair, banded_dp.hpp): returns (scores (B,) i32, coords
    (B, 4) i32 xstart/ystart/xend/yend, ops_code (B, cap) u8, ops_len
    (B, cap) i32 start->end RLE entries, n_ops (B,) i32) or None when
    the library is unavailable.  n_ops -1 = band over MAX_CELLS (empty
    MIN_SCORE alignment); -2 = RLE overflow (retry that pair on the
    Python host path)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "banded_batch"):
        return None
    xb = np.ascontiguousarray(xb, dtype=np.uint8)
    yb = np.ascontiguousarray(yb, dtype=np.uint8)
    mlens = np.ascontiguousarray(mlens, dtype=np.int64)
    nlens = np.ascontiguousarray(nlens, dtype=np.int64)
    B, Mmax = xb.shape
    Nmax = yb.shape[1]
    cap = Mmax + Nmax + 8
    scores = np.empty(B, dtype=np.int32)
    coords = np.empty((B, 4), dtype=np.int32)
    ops_code = np.empty((B, cap), dtype=np.uint8)
    ops_len = np.empty((B, cap), dtype=np.int32)
    n_ops = np.empty(B, dtype=np.int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.banded_batch(
        xb.ctypes.data_as(u8p), mlens.ctypes.data_as(i64p),
        ctypes.c_int64(Mmax),
        yb.ctypes.data_as(u8p), nlens.ctypes.data_as(i64p),
        ctypes.c_int64(Nmax), ctypes.c_int64(B),
        ctypes.c_int64(k), ctypes.c_int64(w),
        ctypes.c_int64(clips[0]), ctypes.c_int64(clips[1]),
        ctypes.c_int64(clips[2]), ctypes.c_int64(clips[3]),
        ctypes.c_int64(match_score), ctypes.c_int64(mismatch_score),
        ctypes.c_int64(gap_open), ctypes.c_int64(gap_extend),
        ctypes.c_int64(nthreads), ctypes.c_int64(cap),
        scores.ctypes.data_as(i32p), coords.ctypes.data_as(i32p),
        ops_code.ctypes.data_as(u8p), ops_len.ctypes.data_as(i32p),
        n_ops.ctypes.data_as(i32p),
    )
    return scores, coords, ops_code, ops_len, n_ops


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
