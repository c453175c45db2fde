"""Parity + property tests for distances (reference: distance.rs tests)."""

import numpy as np
import pytest

from rust_bio_tpu.alignment.distance import (
    bounded_levenshtein,
    bounded_levenshtein_batch,
    hamming,
    hamming_batch,
    levenshtein,
    levenshtein_batch,
    simd,
)

X = b"GTCTGCATGCG"
Y = b"TTTAGCTAGCG"
LX = b"ACCGTGGAT"
LY = b"AAAAACCGTTGAT"


def test_hamming():
    assert hamming(X, Y) == 5
    assert simd.hamming(X, Y) == 5


def test_hamming_unequal_length_panics():
    with pytest.raises(AssertionError):
        hamming(b"ACGT", b"ACG")


def test_levenshtein():
    assert levenshtein(LX, LY) == 5
    assert levenshtein(LY, LX) == 5
    assert levenshtein(b"AAA", b"TTTT") == 4
    assert levenshtein(b"TTTT", b"AAA") == 4
    assert simd.levenshtein(LX, LY) == 5


def test_bounded_levenshtein():
    assert bounded_levenshtein(LX, LY, 2**31) == 5
    assert bounded_levenshtein(LX, LY, 5) == 5
    assert bounded_levenshtein(LX, LY, 4) is None
    assert bounded_levenshtein(LX, LY, 0) is None


def _dp_levenshtein(a, b):
    m, n = len(a), len(b)
    D = np.zeros((m + 1, n + 1), dtype=np.int32)
    D[:, 0] = np.arange(m + 1)
    D[0, :] = np.arange(n + 1)
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            D[i, j] = min(
                D[i - 1, j - 1] + (a[i - 1] != b[j - 1]),
                D[i - 1, j] + 1,
                D[i, j - 1] + 1,
            )
    return int(D[m, n])


def test_levenshtein_vs_dp_oracle():
    rng = np.random.default_rng(0)
    for _ in range(30):
        m = int(rng.integers(1, 70))
        n = int(rng.integers(1, 70))
        a = rng.choice(list(b"ACGT"), size=m).astype("uint8").tobytes()
        b = rng.choice(list(b"ACGT"), size=n).astype("uint8").tobytes()
        assert levenshtein(a, b) == _dp_levenshtein(a, b), (a, b)


def test_batched_matches_scalar():
    rng = np.random.default_rng(1)
    alphas, betas = [], []
    for _ in range(24):
        m = int(rng.integers(1, 80))
        n = int(rng.integers(1, 80))
        alphas.append(rng.choice(list(b"ACGT"), size=m).astype("uint8").tobytes())
        betas.append(rng.choice(list(b"ACGT"), size=n).astype("uint8").tobytes())
    got = levenshtein_batch(alphas, betas)
    for i in range(24):
        assert got[i] == levenshtein(alphas[i], betas[i]), i
    bl = bounded_levenshtein_batch(alphas, betas, 10)
    for i in range(24):
        assert bl[i] == bounded_levenshtein(alphas[i], betas[i], 10)


def test_hamming_batch():
    got = hamming_batch([X, X], [Y, X])
    assert got.tolist() == [5, 0]
