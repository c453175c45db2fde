"""Parity suite for BWT/Occ/less (reference: bwt.rs tests)."""

import numpy as np

from rust_bio_tpu.alphabets import Alphabet, dna
from rust_bio_tpu.data_structures.bwt import Occ, bwt, bwtfind, invert_bwt, less
from rust_bio_tpu.data_structures.suffix_array import suffix_array


def test_bwt_doctest():
    text = b"GCCTTAACATTATTACGCCTA$"
    pos = suffix_array(text)
    assert bytes(bwt(text, pos)) == b"ATTATTCAGGACCC$CTTTCAA"


def test_bwtfind():
    text = b"cabca$"
    alphabet = Alphabet(b"abc$")
    pos = suffix_array(text)
    b = bwt(text, pos)
    assert list(bwtfind(b, alphabet)) == [5, 0, 3, 4, 1, 2]


def test_invert_bwt():
    text = b"cabca$"
    pos = suffix_array(text)
    b = bwt(text, pos)
    assert bytes(invert_bwt(b)) == text


def test_occ():
    b = np.array([1, 3, 3, 1, 2, 0], dtype=np.uint8)
    alphabet = Alphabet(bytes([0, 1, 2, 3]))
    occ = Occ(b, 3, alphabet)
    # reference stores per-symbol checkpoint vectors; ours is the transpose
    assert occ.occ[:, 0].tolist() == [0, 0]
    assert occ.occ[:, 1].tolist() == [1, 2]
    assert occ.occ[:, 2].tolist() == [0, 0]
    assert occ.occ[:, 3].tolist() == [0, 2]
    assert occ.get(b, 4, 2) == 1
    assert occ.get(b, 4, 3) == 2


def test_occ_vs_scan_oracle():
    rng = np.random.default_rng(1)
    b = rng.choice(list(b"ACGT$"), size=300).astype(np.uint8)
    alphabet = Alphabet(b"ACGT$")
    for k in (3, 32, 128):
        occ = Occ(b, k, alphabet)
        for a in b"ACGT$":
            for r in range(0, 300, 7):
                expect = int(np.count_nonzero(b[: r + 1] == a))
                assert occ.get(b, r, a) == expect, (k, a, r)


def test_less():
    text = b"GCCTTAACATTATTACGCCTA$"
    pos = suffix_array(text)
    b = bwt(text, pos)
    l = less(b, dna.n_alphabet())
    # sentinel occupies row 0; A starts at 1, C at 7, G at 13, T at 15
    assert l[ord("A")] == 1
    assert l[ord("C")] == 7
    assert l[ord("G")] == 13
    assert l[ord("T")] == 15
