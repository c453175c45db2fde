"""Native kernels vs Python oracles."""

import numpy as np
import pytest

from rust_bio_tpu import native
from rust_bio_tpu.alignment.distance import hamming, levenshtein
from rust_bio_tpu.data_structures.suffix_array import (
    _sa_prefix_doubling,
    _sentinel_count,
    suffix_array,
    transform_text,
)
from rust_bio_tpu.alphabets import Alphabet

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_native_sais_matches_doubling():
    rng = np.random.default_rng(0)
    for trial in range(25):
        n = int(rng.integers(2, 500))
        nseq = int(rng.integers(1, 4))
        parts = [
            rng.choice(list(b"ACGTN"), size=max(n // nseq, 1)).astype("uint8").tobytes()
            for _ in range(nseq)
        ]
        text = b"$".join(parts) + b"$"
        arr = np.frombuffer(text, dtype=np.uint8)
        alphabet = Alphabet(text)
        sc = _sentinel_count(arr)
        tr = transform_text(arr, alphabet, sc)
        want = _sa_prefix_doubling(tr)
        got = native.sais(tr, int(tr.max()) + 1)
        np.testing.assert_array_equal(got, want, err_msg=str(text))


def test_native_sais_golden():
    assert list(suffix_array(b"GCCTTAACATTATTACGCCTA$")) == [
        21, 20, 5, 6, 14, 11, 8, 7, 17, 1, 15, 18, 2, 16, 0, 19, 4, 13, 10, 3, 12, 9,
    ]


def test_native_levenshtein():
    rng = np.random.default_rng(1)
    for _ in range(40):
        a = rng.choice(list(b"ACGT"), size=int(rng.integers(1, 300))).astype("uint8").tobytes()
        b = rng.choice(list(b"ACGT"), size=int(rng.integers(1, 300))).astype("uint8").tobytes()
        assert native.levenshtein(a, b) == levenshtein(a, b)


def test_native_hamming():
    rng = np.random.default_rng(2)
    a = rng.choice(list(b"ACGT"), size=257).astype("uint8").tobytes()
    b = rng.choice(list(b"ACGT"), size=257).astype("uint8").tobytes()
    assert native.hamming(a, b) == hamming(a, b)


def test_native_sdpkpp_matches_python_oracle():
    """The C++ sdpkpp chaining must reproduce the pure-Python oracle's
    path, score and dp vector exactly."""
    import random

    from rust_bio_tpu.alignment import sparse
    from rust_bio_tpu import native

    if native.get_lib() is None:
        import pytest

        pytest.skip("native library unavailable")

    rng = random.Random(9)
    for _ in range(100):
        nm = rng.randint(1, 40)
        pts = sorted(
            set((rng.randint(0, 60), rng.randint(0, 60)) for _ in range(nm))
        )
        k = rng.randint(1, 6)
        ms = rng.randint(1, 4)
        go = -rng.randint(0, 8)
        ge = -rng.randint(0, 4)
        a = sparse.sdpkpp(pts, k, ms, go, ge)
        b = sparse._sdpkpp_py(pts, k, ms, go, ge)
        assert a.path == b.path
        assert a.score == b.score
        assert a.dp_vector == b.dp_vector


def test_sais_u8_i32_matches_i64():
    """Genome-scale dispatch: the (u8 text, i32 SA) kernel is
    position-identical to the all-int64 instantiation."""
    import ctypes

    from rust_bio_tpu import native

    lib = native.get_lib()
    if lib is None or not hasattr(lib, "sais_u8_i32"):
        import pytest

        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(77)
    for n in (1, 2, 500, 100_000):
        t = rng.integers(1, 5, size=n).astype(np.uint8)
        t[-1] = 0  # sentinel = unique minimum
        sa64 = np.empty(n, dtype=np.int64)
        lib.sais_u8_i64(
            t.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, 5,
            sa64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        sa32 = np.empty(n, dtype=np.int32)
        lib.sais_u8_i32(
            t.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, 5,
            sa32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        np.testing.assert_array_equal(sa64, sa32.astype(np.int64))
        ref = np.empty(n, dtype=np.int64)
        lib.sais_i64(
            t.astype(np.int64).ctypes.data_as(
                ctypes.POINTER(ctypes.c_int64)), n, 5,
            ref.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        np.testing.assert_array_equal(ref, sa64)
