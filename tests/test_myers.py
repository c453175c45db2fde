"""Parity suite for Myers (reference: myers/common_tests.rs golden values)."""

import numpy as np

from rust_bio_tpu.alignment.types import (
    Alignment,
    AlignmentMode,
    Del,
    Ins,
    Match,
    Subst,
)
from rust_bio_tpu.pattern_matching.myers import Myers, MyersBuilder


def test_find_all_end():
    text = b"ACCGTGGATGAGCGCCATAG"
    patt = b"GATGAGCGT"
    myers = Myers(patt)
    assert list(myers.find_all_end(text, 1)) == [(13, 1), (14, 1)]


def test_find_all_end_doctest():
    text = b"CGGTCCTGAGGGATTAGCAC"
    patt = b"TCCTAGGGC"
    myers = Myers(patt)
    assert list(myers.find_all_end(text, 2)) == [(11, 2), (12, 2)]


def test_distance():
    text = b"TGAGCNTA"
    patt = b"TGAGCGT"
    assert Myers(patt).distance(text) == 1
    myers_wildcard = MyersBuilder().text_wildcard(b"N").build_64(patt)
    assert myers_wildcard.distance(text) == 0


def test_distance_long():
    text = b"ACCGTGGATGAGCGCCATAG"
    patt = b"CGTGGACCAGCGCCATA"
    myers = Myers(patt)
    assert myers.distance(text) == 2
    assert myers.find_best_end(text) == (18, 2)


def test_full_position():
    text = b"CAGACATCTT"
    patt = b"AGA"
    myers = Myers(patt)
    assert list(myers.find_all(text, 1)) == [(1, 3, 1), (1, 4, 0), (1, 5, 1), (3, 6, 1)]


def test_traceback_path():
    text = b"TCAGACATCTT"
    patt = b"TCGACGTGCT"
    myers = Myers(patt)
    matches = myers.find_all(text, 3)
    aln = []
    assert matches.next_path(aln) == (0, 10, 3)
    assert aln == [Match, Match, Del, Match, Match, Match, Subst, Match, Ins, Match, Match]


def test_traceback_path2():
    text = b"TCAGCAGATGGAGCTC"
    patt = b"TCAGAGCAG"
    myers = Myers(patt)
    matches = myers.find_all(text, 2)
    aln = []
    assert matches.next_path(aln) == (0, 7, 2)
    assert aln == [Match, Match, Match, Match, Ins, Ins, Match, Match, Match]


def test_alignment():
    text = b"GGTCCTGAGGGATTA"
    patt = b"TCCTAGGGA"
    myers = Myers(patt)
    expected = Alignment(
        score=1,
        xstart=0,
        xend=9,
        xlen=9,
        ystart=2,
        yend=12,
        ylen=15,
        operations=[Match, Match, Match, Match, Del, Match, Match, Match, Match, Match],
        mode=AlignmentMode.Semiglobal,
    )
    aln = Alignment(
        score=0, xstart=0, ystart=0, xend=0, yend=0, xlen=0, ylen=0,
        operations=[], mode=AlignmentMode.Semiglobal,
    )
    matches = myers.find_all(text, 1)
    assert matches.next_alignment(aln)
    assert aln == expected

    # lazy API
    end = expected.yend - 1
    lazy = myers.find_all_lazy(text, 1)
    assert not lazy.alignment_at(end, aln)
    assert lazy.next() == (end, expected.score)
    assert lazy.alignment_at(end, aln)
    assert aln == expected


def test_position_cmp():
    text = b"CAGACATCTT"
    patt = b"AGA"
    starts_exp = [1, 1, 1, 3]
    end_dist_exp = [(2, 1), (3, 0), (4, 1), (5, 1)]
    myers = Myers(patt)
    assert list(myers.find_all_end(text, 1)) == end_dist_exp
    full_hits = list(myers.find_all(text, 1))
    lazy = myers.find_all_lazy(text, 1)
    for (start, (end, dist)), (f_start, f_end, f_dist) in zip(
        zip(starts_exp, end_dist_exp), full_hits
    ):
        assert start == f_start
        assert dist == f_dist
        assert end + 1 == f_end
        lazy_end, lazy_dist = lazy.next()
        assert (end, dist) == (lazy_end, lazy_dist)
        assert lazy.hit_at(end) == (start, dist)
        assert lazy.dist_at(end) == dist
        assert lazy.hit_at(end + 1) is None
        assert lazy.dist_at(end + 1) is None


def test_lazy():
    text = b"CAGACATCTT"
    patt = b"AGA"
    myers = Myers(patt)
    matches = myers.find_all_lazy(text, 1)

    path = []
    assert matches.hit_at(2) is None
    assert matches.dist_at(2) is None
    assert matches.path_at(2, path) is None
    assert path == []

    assert matches.next() == (2, 1)
    assert matches.hit_at(2) == (1, 1)
    assert matches.dist_at(2) == 1
    assert matches.path_at(2, path) == (1, 1)
    assert path == [Match, Match, Ins]

    path.clear()
    assert matches.hit_at(3) is None
    assert matches.next() == (3, 0)
    assert matches.hit_at(3) == (1, 0)
    assert matches.path_at(3, path) == (1, 0)
    assert path == [Match, Match, Match]


def test_lazy_longer():
    text = b"ACCGTGGATGAGCGCCATAG"
    patt = b"CGTGGACCAGCGCCATA"
    myers = Myers(patt)
    _ = myers.distance(b"GTGGACCAGCGCCATAGTGGACCAGCGCCATAGTGGACCAGCGCCATA")
    matches = myers.find_all_lazy(text, 2)
    exp_path = [Match] * 6 + [Subst, Subst] + [Match] * 9
    path = []
    assert matches.hit_at(0) is None
    assert matches.next() == (18, 2)
    assert matches.next() is None
    assert matches.hit_at(18) == (2, 2)
    assert matches.dist_at(18) == 2
    assert matches.path_at(18, path) == (2, 2)
    assert path == exp_path


def test_shorter():
    text = b"ATG"
    patt = b"CATGC"
    myers = Myers(patt)
    matches = myers.find_all(text, 2)
    aln = []
    assert matches.next_path(aln) == (0, 3, 2)
    assert aln == [Ins, Match, Match, Match, Ins]


def test_long_shorter():
    text = b"CCACGCGTGGGTCCTGAGGGAGCTCGTCGGTGTGGGGTTCGGGGGGGTTTGT"
    patt = b"CGGGGTGTGCACGCGTGGGTCCTGAGGGAGCTCGTCGGTGTGGGGTTCGGGGGGGTTTGT"
    myers = Myers(patt)
    assert next(myers.find_all(text, 8)) == (0, 52, 8)


def test_ambig():
    patt = b"TRRRCGTR"
    text = b"TGATCRTR"
    myers = MyersBuilder().ambig(b"R", b"AG").build_64(patt)
    assert myers.distance(text) == 2
    myers = MyersBuilder().ambig(b"R", b"A").ambig(b"R", b"G").build_64(patt)
    assert myers.distance(text) == 2


def test_longest_possible():
    text = b"CCACGCGT"
    myers = Myers(text)
    assert next(myers.find_all(text, 0)) == (0, 8, 0)


def test_large_dist():
    pattern = b"T" * 64
    text = b"A" * 64
    myers = Myers(pattern)
    max_dist = max(d for _, d in myers.find_all_end(text, 64))
    assert max_dist == 64


def test_long_pattern_over_128():
    # unlimited-length support (reference long:: module)
    rng = np.random.default_rng(0)
    patt = rng.choice(list(b"ACGT"), size=300).astype("uint8").tobytes()
    text = patt[:100] + b"AC" + patt[100:]
    myers = Myers(patt)
    assert myers.distance(text) == 0 or myers.distance(text) <= 2
    assert min(d for _, d in myers.find_all_end(text, 5)) <= 2
