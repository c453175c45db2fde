"""Parity suite for sparse alignment (reference: sparse.rs tests)."""

import numpy as np

from rust_bio_tpu.alignment.sparse import (
    expand_kmer_matches,
    find_kmer_matches,
    hash_kmers,
    lcskpp,
    sdpkpp,
    sdpkpp_union_lcskpp_path,
)

S1 = b"ACGTACGATAGATCCGTACGTAACAGTACAGTATATCAGTTATATGCGATA"
S2 = b"TTACGTACGATAGATCCGTACGTAACATTTTTGTACAGTATATCAGTTATATGCGA"


def test_find_kmer_matches():
    k = 8
    hits = find_kmer_matches(S1, S2, k)
    assert len(hits) == (25 - k + 1) + (24 - k + 1)


def test_lcskpp0():
    s1 = b"ACGTACGATAGGTA"
    s2 = b"TTACGTACGATAGGTATT"
    k = 8
    matches = find_kmer_matches(s1, s2, k)
    res = lcskpp(matches, k)
    match_path = [matches[i] for i in res.path]
    assert match_path == [(0, 2), (1, 3), (2, 4), (3, 5), (4, 6), (5, 7), (6, 8)]
    assert res.score == 14


def test_lcskpp1():
    matches = find_kmer_matches(S1, S2, 8)
    res = lcskpp(matches, 8)
    assert res.score == 25 + 24


def test_lcskpp2():
    s1 = b"ACGTACGATAGATCCGACGTACGTACGTTCAGTTATATGACGTACGTACGTAACATTTTTGTA"
    k = 5
    matches = find_kmer_matches(s1, s1, k)
    res = lcskpp(matches, k)
    assert res.score == len(s1)
    for i, pi in enumerate(res.path):
        assert matches[pi] == (i, i)


def _strict_compare(s1, s2, k=8):
    matches = find_kmer_matches(s1, s2, k)
    r1 = lcskpp(matches, k)
    r2 = sdpkpp(matches, k, 1, 0, 0)
    assert r1.path == r2.path
    assert r1.score == r2.score
    assert r1.dp_vector == r2.dp_vector


def test_sdp():
    _strict_compare(b"ACGTACGATAGGTA", b"TTACGTACGATAGGTATT")
    _strict_compare(S1, S2)
    s = b"ACGTACGATAGATCCGACGTACGTACGTTCAGTTATATGACGTACGTACGTAACATTTTTGTA"
    _strict_compare(s, s)


QUERY_REPEAT = (
    b"CCTCCCATCTCCACCCACCCTATCCAACCCTGGGGTGGCAGGTCATGAGTGA"
    b"CAGCCCCAAGGACACCAAGGGATGAAGCTTCTCCTGTGCTGAGATCCTTCTCGGACTTTCTGAGAGGCCACGCAGAACAGGAGGCCCCATCTCC"
    b"CGTTCTTACTCAGAAGCTGTCAGCAGGGCTGGGCTCAAGATGAACCCGTGGCCGGCCCCACTCCCCAGCTCTTGCTTCAGGGCCTCACGTTTCG"
    b"CCCCCTGAGGCCTGGGGGCTCCGTCCTCACGGCTGGAGGGGCTCTCAGAACATCTGGTG"
)

TARGET_REPEAT = (
    b"CCTCCCATCTCCACCCACCCTATCCAACCCTGGGGTGGCAG"
    b"GTCATGAGTGACAGCCCCAAGGACACCAAGGGATGAAGCTTCTCCTGTGCTGAGATCCTTCTCGGACTTTCTGAGAGGCCACGC"
    b"AGAACAGGAGGCCCCATCTCCCGTTCTTACTCAGAAGCTGTCAGCAGGGCTGGGCTCAAGATGAACCCGTGGCCGGCCCCACTC"
    b"CCCAGCTCTTGCTTCAGGGCCTCACGTTTCGCCCCCTGAGGCCTGGGGGCTCCGTCCTCACGGCTGGAGGGGCTCTCAGAACAT"
    b"CTGGTGGGCTCCGTCCTCACGGCTGGAGGGGCTCTCAGAACATCTGGTGGGCTCCGTCCTCACGGCTGGAGGGGCTCTCAGAAC"
    b"ATCTGGTGGGCTCCGTCCTCACGGCTGGAGGGGCTCTCAGAACATCTGGTGCACGGCTCCCAACTCTCTTCCGGCCAAGGATCC"
    b"CGTGTTCCTGAAATGTCTTTCTACCAAACACAGTTGCTGTGTAACCACTCATTTCATTTTCCTAATTTGTGTTGATCCAGGACA"
    b"CGGGAGGAGACCTGGGCAGCGGCGGACTCATTGCAGGTCGCTCTGCGGTGAGGACGCCACAGGCAC"
)


def test_lcskpp_tandem_repeat():
    matches = find_kmer_matches(QUERY_REPEAT, TARGET_REPEAT, 8)
    res = lcskpp(matches, 8)
    assert res.score == len(QUERY_REPEAT)


def test_sdpkpp_tandem_repeat():
    matches = find_kmer_matches(QUERY_REPEAT, TARGET_REPEAT, 8)
    res = sdpkpp(matches, 8, 1, -1, -1)
    assert res.score == len(QUERY_REPEAT)
    for i, pi in enumerate(res.path):
        assert matches[pi] == (i, i)


def test_sdpkpp_same():
    for x, y, exp_path, exp_score in [
        (b"ACGTACGTAC", b"ACGTACGTAC", [0], 10),
        (b"ACGTACGTACA", b"ACGTACGTACA", [0, 1], 11),
        (b"ACGTACGTACACGTACGTAC", b"ACGTACGTAC", [0], 10),
    ]:
        matches = find_kmer_matches(x, y, 10)
        res = sdpkpp(matches, 10, 1, -1, -1)
        assert res.path == exp_path
        assert res.score == exp_score
        res = lcskpp(matches, 10)
        assert res.path == exp_path
        assert res.score == exp_score


def test_union_path():
    matches = find_kmer_matches(S1, S2, 8)
    path = sdpkpp_union_lcskpp_path(matches, 8, 1, -1, -1)
    assert path  # non-empty, covers the sdp path
    sd = sdpkpp(matches, 8, 1, -1, -1)
    assert set(sd.path).issubset(set(path))


def test_expand_kmer_matches():
    x = b"GGGCAAAAAA"
    y = b"GGGGAAAAAA"
    k = 6
    matches = find_kmer_matches(x, y, k)
    expanded = expand_kmer_matches(x, y, k, matches, 1)
    # expansion adds positions along the diagonal tolerating one mismatch
    assert set(matches).issubset(set(expanded))
    assert len(expanded) >= len(matches)
    # all expanded matches are kmers with at most 1 mismatch
    for mx, my in expanded:
        mism = sum(
            1 for i in range(k) if x[mx + i] != y[my + i]
        )
        assert mism <= 1, (mx, my)


def test_hash_kmers():
    hk = hash_kmers(b"ACGTACGT", 4)
    assert hk[b"ACGT"] == [0, 4]
    assert hk[b"CGTA"] == [1]
