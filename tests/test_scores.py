import numpy as np

from rust_bio_tpu.scores import (
    LOOKUP,
    blosum62,
    dense_matrix,
    matrix,
    pam250,
)


def test_blosum62_known_values():
    # standard BLOSUM62 values
    assert blosum62(ord("A"), ord("A")) == 4
    assert blosum62(ord("W"), ord("W")) == 11
    assert blosum62(ord("A"), ord("W")) == -3
    assert blosum62(ord("*"), ord("*")) == 1
    assert blosum62(ord("L"), ord("K")) == -2


def test_pam250_known_values():
    assert pam250(ord("W"), ord("W")) == 17
    assert pam250(ord("A"), ord("A")) == 2


def test_lookup_mapping():
    assert LOOKUP[ord("A")] == 0
    assert LOOKUP[ord("Y")] == 23
    assert LOOKUP[ord("Z")] == 24
    assert LOOKUP[ord("X")] == 25
    assert LOOKUP[ord("*")] == 26


def test_dense_matrix_consistency():
    dm = dense_matrix("blosum62")
    m = matrix("blosum62")
    for a in b"ARNDCEQGHILKMFPSTWYVBZX*":
        for b in b"ARNDCEQGHILKMFPSTWYVBZX*":
            assert dm[a, b] == m[LOOKUP[a], LOOKUP[b]]
    assert dm.dtype == np.int32


def test_symmetry():
    for name in ["blosum30", "blosum45", "blosum62", "pam40", "pam120", "pam200", "pam250"]:
        m = matrix(name)
        assert (m == m.T).all(), name
