"""Pairwise aligner parity suite.

Golden values extracted from the reference's doctests and unit tests
(src/alignment/pairwise/mod.rs); property tests check the batched TPU path
against the exact scalar oracle.
"""

import random

import pytest

from rust_bio_tpu.alignment.pairwise import (
    Aligner,
    BatchAligner,
    MIN_SCORE,
    Scoring,
)
from rust_bio_tpu.alignment.types import (
    Del,
    Ins,
    Match,
    Subst,
    Xclip,
    Yclip,
)
from rust_bio_tpu.scores import blosum62

score_1m1 = lambda a, b: 1 if a == b else -1


class TestScalarGolden:
    def test_semiglobal_doctest(self):
        a = Aligner(-5, -1, score_1m1)
        al = a.semiglobal(b"ACCGTGGAT", b"AAAAACCGTTGAT")
        assert al.ystart == 4 and al.xstart == 0
        assert al.operations == [Match] * 5 + [Subst] + [Match] * 3

    def test_local_blosum62_doctest(self):
        a = Aligner(-10, -1, blosum62)
        al = a.local(b"LSPADKTNVKAA", b"PEEKSAV")
        assert (al.xstart, al.xend, al.ystart, al.yend) == (2, 9, 0, 7)
        assert al.score == 16
        assert al.operations == [Match, Subst, Subst, Match, Subst, Subst, Match]

    def test_global_and_local_score_doctest(self):
        a = Aligner(-5, -1, score_1m1)
        al = a.global_(b"ACCGTGGAT", b"AAAAACCGTTGAT")
        assert al.ystart == 0 and al.xstart == 0
        assert a.local(b"ACCGTGGAT", b"AAAAACCGTTGAT").score == 7

    def test_custom_semiglobal_clips(self):
        sc = Scoring.new(-5, -1, score_1m1).xclip(MIN_SCORE).yclip(0)
        al = Aligner.with_scoring(sc).custom(b"ACCGTGGAT", b"AAAAACCGTTGAT")
        assert al.ystart == 4 and al.xstart == 0
        assert al.operations == [Yclip(4)] + [Match] * 5 + [Subst] + [Match] * 3

    def test_custom_global_clips(self):
        sc = Scoring.from_scores(-5, -1, 1, -1).xclip(MIN_SCORE).yclip(MIN_SCORE)
        al = Aligner.with_scoring(sc).custom(b"ACCGTGGAT", b"AAAAACCGTTGAT")
        assert al.ystart == 0 and al.xstart == 0
        assert al.operations == [Del] * 4 + [Match] * 5 + [Subst] + [Match] * 3

    def test_custom_prefix_clip_example(self):
        sc = Scoring(
            gap_open=-5,
            gap_extend=-1,
            match_fn=lambda a, b: 1 if a == b else -3,
            match_scores=(1, -3),
            xclip_prefix=-10,
            xclip_suffix=MIN_SCORE,
            yclip_prefix=0,
            yclip_suffix=0,
        )
        al = Aligner.with_scoring(sc).custom(
            b"GGGGGGGGGACGTACGTACGT", b"AAAAACGTACGTACGTAAAA"
        )
        assert al.score == 2
        assert al.operations == [Yclip(4), Xclip(9)] + [Match] * 12 + [Yclip(4)]

    def test_cigar_semiglobal(self):
        a = Aligner(-5, -1, score_1m1)
        al = a.semiglobal(b"ACCGTGGAT", b"AAAAACCGTTGAT")
        assert al.cigar() == "5=1X3="


def rand_seq(rng, alpha, lo, hi):
    return bytes(rng.choice(alpha) for _ in range(rng.randint(lo, hi)))


class TestBatchedVsScalar:
    @pytest.mark.parametrize("mode", ["global_", "semiglobal", "local"])
    def test_modes_random(self, mode):
        rng = random.Random(7)
        sc = Scoring.new(-5, -1, score_1m1)
        sa = Aligner.with_scoring(sc)
        ba = BatchAligner(sc)
        xs = [rand_seq(rng, b"ACGT", 1, 24) for _ in range(12)]
        ys = [rand_seq(rng, b"ACGT", 1, 24) for _ in range(12)]
        got = getattr(ba, mode)(xs, ys)
        for k, (x, y) in enumerate(zip(xs, ys)):
            want = getattr(sa, mode)(x, y)
            g = got[k]
            assert g.score == want.score, (k, x, y)
            assert g.operations == want.operations, (k, x, y)
            assert (g.xstart, g.xend, g.ystart, g.yend) == (
                want.xstart,
                want.xend,
                want.ystart,
                want.yend,
            )

    @pytest.mark.slow
    def test_custom_random_clips(self):
        rng = random.Random(11)
        clip_choices = [MIN_SCORE, 0, -1, -7]
        for _ in range(3):
            go = rng.randint(-10, 0)
            ge = rng.randint(go, 0)
            clips = tuple(rng.choice(clip_choices) for _ in range(4))
            sc = Scoring(
                gap_open=go,
                gap_extend=ge,
                match_fn=score_1m1,
                xclip_prefix=clips[0],
                xclip_suffix=clips[1],
                yclip_prefix=clips[2],
                yclip_suffix=clips[3],
            )
            sa = Aligner.with_scoring(sc)
            ba = BatchAligner(sc)
            xs = [rand_seq(rng, b"ACGT", 0, 16) for _ in range(8)]
            ys = [rand_seq(rng, b"ACGT", 0, 16) for _ in range(8)]
            got = ba.custom(xs, ys)
            for k, (x, y) in enumerate(zip(xs, ys)):
                want = sa.custom(x, y)
                g = got[k]
                assert g.score == want.score, (go, ge, clips, x, y)
                assert g.operations == want.operations, (go, ge, clips, x, y)

    def test_batched_scores_only(self):
        rng = random.Random(3)
        sc = Scoring.new(-5, -1, score_1m1)
        ba = BatchAligner(sc)
        sa = Aligner.with_scoring(sc)
        xs = [rand_seq(rng, b"ACGT", 4, 20) for _ in range(8)]
        ys = [rand_seq(rng, b"ACGT", 4, 20) for _ in range(8)]
        scores = ba.scores(xs, ys, mode="global")
        for k, (x, y) in enumerate(zip(xs, ys)):
            assert int(scores[k]) == sa.global_(x, y).score
