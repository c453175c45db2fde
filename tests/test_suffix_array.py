"""Parity suite for suffix arrays (reference: suffix_array.rs tests)."""

import numpy as np
import pytest

from rust_bio_tpu.data_structures.bwt import Occ, bwt, less
from rust_bio_tpu.data_structures.suffix_array import (
    lcp,
    sample_suffix_array,
    shortest_unique_substrings,
    suffix_array,
    suffix_array_int,
)
from rust_bio_tpu.alphabets import dna


GOLDEN_SA = [21, 20, 5, 6, 14, 11, 8, 7, 17, 1, 15, 18, 2, 16, 0, 19, 4, 13, 10, 3, 12, 9]


def test_suffix_array_doctest():
    assert list(suffix_array(b"GCCTTAACATTATTACGCCTA$")) == GOLDEN_SA


def test_suffix_array_int():
    assert list(suffix_array_int([3, 2, 2, 4, 4, 1, 2, 1, 0])) == [
        8, 7, 5, 6, 1, 2, 0, 4, 3,
    ]


def test_issue10():
    assert list(suffix_array(b"TGTGTGTGTG$")) == [10, 9, 7, 5, 3, 1, 8, 6, 4, 2, 0]
    assert list(suffix_array(b"TGTGTGTG$")) == [8, 7, 5, 3, 1, 6, 4, 2, 0]


def test_lcp_doctest():
    text = b"GCCTTAACATTATTACGCCTA$"
    pos = suffix_array(text)
    l = lcp(text, pos)
    assert l.get(6) == 4
    assert l.decompress() == [
        -1, 0, 1, 1, 2, 1, 4, 0, 1, 3, 1, 1, 2, 0, 4, 0, 2, 2, 2, 1, 3, 3, -1,
    ]


def test_shortest_unique_substrings():
    text = b"GCTGCTA$"
    pos = suffix_array(text)
    l = lcp(text, pos)
    sus = shortest_unique_substrings(pos, l)
    assert sus == [4, 3, 2, 4, 3, 2, 1, 1]


def _str_from_pos(sa, text, i):
    return text[sa[i] :].split(b"$")[0] + b"$"


MULTI = (
    b"TACTCCGCTAGGGACACCTAAATAGATACTCGCAAAGGCGACTGATATATCCTTAGGTCGAAGAGATACCAGAGAAATAGTAGGTCTTAGGCTAGTCCTT$"
    b"AAGGACTAGCCTAAGACCTACTATTTCTCTGGTATCTCTTCGACCTAAGGATATATCAGTCGCCTTTGCGAGTATCTATTTAGGTGTCCCTAGCGGAGTA$"
    b"TAGGGACACCTAAATAGATACTCGCAAAGGCGACTGATATATCCTTAGGTCGAAGAGATACCAGAGAAATAGTAGGTCTTAGGCTAGTCCTTGTCCAGTA$"
    b"TACTGGACAAGGACTAGCCTAAGACCTACTATTTCTCTGGTATCTCTTCGACCTAAGGATATATCAGTCGCCTTTGCGAGTATCTATTTAGGTGTCCCTA$"
    b"ACGCACCCCGGCATTCGTCGACTCTACACTTAGTGGAACATACAAATTCGCTCGCAGGAGCGCCTCATACATTCTAACGCAGTGATCTTCGGCTGAGACT$"
    b"AGTCTCAGCCGAAGATCACTGCGTTAGAATGTATGAGGCGCTCCTGCGAGCGAATTTGTATGTTCCACTAAGTGTAGAGTCGACGAATGCCGGGGTGCGT$"
)

SORT_CASES = [
    b"A$C$G$T$",
    b"A$A$T$T$",
    b"AA$GA$CA$TA$TC$TG$GT$GC$",
    b"AGCCAT$CAGCC$",
    b"GTAG$GCCTAAT$TATAATCAG$",
    b"TGTGTGTGTG$",
    MULTI,
]


def _rand_seqs(rng, num_seqs, seq_len):
    alpha = b"ATCGN"
    seqs = []
    for _ in range(num_seqs):
        ln = rng.integers(max(seq_len // 2, 1), seq_len + 1)
        seqs.append(rng.choice(list(alpha), size=ln).astype('uint8').tobytes())
    return b"$".join(seqs) + b"$"


@pytest.mark.parametrize("text", SORT_CASES, ids=range(len(SORT_CASES)))
def test_sorts_lexically(text):
    pos = suffix_array(text)
    for i in range(len(pos) - 2):
        assert _str_from_pos(pos, text, i) <= _str_from_pos(pos, text, i + 1)


def test_sorts_lexically_random():
    rng = np.random.default_rng(0)
    for i in range(2, 40, 4):
        text = _rand_seqs(rng, 10, i * 10)
        pos = suffix_array(text)
        for j in range(len(pos) - 2):
            assert _str_from_pos(pos, text, j) <= _str_from_pos(pos, text, j + 1)


@pytest.mark.parametrize("text", SORT_CASES, ids=range(len(SORT_CASES)))
def test_sampled_matches(text):
    alphabet = dna.n_alphabet()
    sa = suffix_array(text)
    b = bwt(text, sa)
    l = less(b, alphabet)
    occ = Occ(b, 3, alphabet)
    for rate in (2, 3, 5, 16):
        sampled = sample_suffix_array(sa, text, b, l, occ, rate)
        for i in range(len(sa)):
            assert int(sa[i]) == sampled.get(i), (text, rate, i)


def test_sampled_doctest():
    text = b"ACGCGAT$"
    alphabet = dna.n_alphabet()
    sa = suffix_array(text)
    b = bwt(text, sa)
    l = less(b, alphabet)
    occ = Occ(b, 3, alphabet)
    sampled = sample_suffix_array(sa, text, b, l, occ, 2)
    for i in range(len(sa)):
        assert sampled.get(i) == int(sa[i])


def test_sais_u32_matches_default_path():
    """The u8/u32 top-level SAIS (the >= 2^31 human-genome instantiation,
    forced small here) matches the default builder on random, multi-
    sentinel, and periodic texts (native/sais.hpp sais_top_u8_u32;
    reference dtype dispatch: suffix_array.rs:270-281)."""
    from rust_bio_tpu import native
    from rust_bio_tpu.data_structures.suffix_array import (
        _sentinel_count,
        transform_text,
    )
    from rust_bio_tpu.alphabets import Alphabet
    from rust_bio_tpu.utils.text import to_array

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(0)
    for trial in range(60):
        kind = trial % 3
        if kind == 0:
            n = int(rng.integers(1, 400))
            text = (
                rng.choice(list(b"ACGT"), size=n).astype(np.uint8).tobytes()
                + b"$"
            )
        elif kind == 1:
            parts = []
            for _ in range(int(rng.integers(1, 4))):
                m = int(rng.integers(1, 120))
                parts.append(
                    rng.choice(list(b"ACGT"), size=m)
                    .astype(np.uint8)
                    .tobytes()
                    + b"$"
                )
            text = b"".join(parts)
        else:
            u = (
                rng.choice(list(b"ACGT"), size=int(rng.integers(1, 5)))
                .astype(np.uint8)
                .tobytes()
            )
            text = u * int(rng.integers(2, 60)) + b"$"
        arr = to_array(text)
        alphabet = Alphabet(arr.tobytes())
        tr = transform_text(arr, alphabet, _sentinel_count(arr))
        got = native.sais_u32(tr, int(tr.max()) + 1)
        ref = suffix_array(text)
        assert got is not None
        assert (got.astype(np.int64) == np.asarray(ref, np.int64)).all(), (
            text[:50]
        )
