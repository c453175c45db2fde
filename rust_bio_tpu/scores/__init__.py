"""Amino-acid substitution matrices (reference parity: src/scores/).

The matrices are the standard BLOSUM30/45/62 and PAM40/120/200/250
substitution tables (public scientific data, same values as NCBI/SeqAn and
the reference's 27x27 tables). TPU-native layout: each matrix is a 27x27
int32 ndarray plus a (256,) uint8 ASCII->index LUT, so batched scoring is
two gathers (`LOOKUP[a], LOOKUP[b]` then `MAT[ia, ib]`) — or a single
(256,256) dense LUT via :func:`dense_matrix` for device-side use.

Index mapping (reference: scores/mod.rs:22-35): 'A'..'W' -> 0..22,
'Y' -> 23, 'Z' -> 24, 'X' -> 25, '*' -> 26.
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np

_DATA = np.load(os.path.join(os.path.dirname(__file__), "matrices.npz"))


def _build_lookup() -> np.ndarray:
    lut = np.zeros(256, dtype=np.uint8)
    for a in range(256):
        c = a
        if c == ord("Y"):
            lut[a] = 23
        elif c == ord("Z"):
            lut[a] = 24
        elif c == ord("X"):
            lut[a] = 25
        elif c == ord("*"):
            lut[a] = 26
        elif ord("A") <= c <= ord("X"):
            lut[a] = c - 65
        else:
            # Out-of-range symbols would panic in the reference; clamp to 0
            # here and let callers validate with Alphabet.is_word.
            lut[a] = 0
    return lut


LOOKUP: np.ndarray = _build_lookup()


def matrix(name: str) -> np.ndarray:
    """The raw 27x27 int32 substitution matrix."""
    return _DATA[name]


@lru_cache(maxsize=None)
def dense_matrix(name: str) -> np.ndarray:
    """(256, 256) int32 LUT: score = dense[a, b] for raw ASCII bytes.

    This is the device-feed layout: one gather per cell in the DP kernel.
    """
    mat = _DATA[name]
    return np.ascontiguousarray(mat[np.ix_(LOOKUP, LOOKUP)], dtype=np.int32)


def _scorer(name: str):
    mat = _DATA[name]

    def score(a: int, b: int) -> int:
        return int(mat[LOOKUP[a], LOOKUP[b]])

    score.__name__ = name
    score.matrix_name = name
    return score


blosum30 = _scorer("blosum30")
blosum45 = _scorer("blosum45")
blosum62 = _scorer("blosum62")
pam40 = _scorer("pam40")
pam120 = _scorer("pam120")
pam200 = _scorer("pam200")
pam250 = _scorer("pam250")

__all__ = [
    "blosum30",
    "blosum45",
    "blosum62",
    "pam40",
    "pam120",
    "pam200",
    "pam250",
    "matrix",
    "dense_matrix",
    "LOOKUP",
]
