"""Parity suite for the banded aligner (reference: banded.rs tests)."""

import numpy as np
import pytest

from rust_bio_tpu.alignment.pairwise.banded import Aligner as BandedAligner, Band
from rust_bio_tpu.alignment.pairwise.scalar import Aligner as FullAligner
from rust_bio_tpu.alignment.pairwise.scoring import Scoring
from rust_bio_tpu.alignment.sparse import hash_kmers
from rust_bio_tpu.alignment.types import Del, Ins, Match, Subst


def _score_pm1(a, b):
    return 1 if a == b else -1


def _banded(x, y, k=10, w=10, go=-5, ge=-1, fn=_score_pm1):
    return BandedAligner(Scoring.new(go, ge, fn), k, w)


def _full(go=-5, ge=-1, fn=_score_pm1):
    return FullAligner(go, ge, fn)


def _compare_all_modes(x, y):
    ba = _banded(x, y)
    fa = _full()
    for mode in ("local", "global_", "semiglobal"):
        got = getattr(ba, mode)(x, y)
        want = getattr(fa, mode)(x, y)
        assert got == want, (mode, x, y)
    # prehash path
    set_ = hash_kmers(y, 10)
    got = ba.semiglobal_with_prehash(x, y, set_)
    want = fa.semiglobal(x, y)
    assert got == want


def test_band_add_entry():
    band = Band(10, 10)
    band.add_entry((3, 3), 3)
    assert [(int(s), int(e)) for s, e in zip(band.starts, band.ends)] == [
        (0, 7)] * 7 + [(11, 0)] * 4
    band.add_entry((9, 9), 2)
    assert [(int(s), int(e)) for s, e in zip(band.starts, band.ends)] == [
        (0, 7)] * 7 + [(7, 11)] * 4
    band.add_entry((7, 5), 2)
    assert [(int(s), int(e)) for s, e in zip(band.starts, band.ends)][:8] == [
        (0, 7), (0, 7), (0, 7), (0, 10), (0, 10), (0, 10), (0, 10), (5, 11)]


def test_same():
    x = b"ACGTATCATAGACCCTAGATAGGGTTGTGTAGATGATCCACAGACGTATCATAGATTAGATAGGGTTGTGTAGATGATTCCACAG"
    _compare_all_modes(x, x)


def test_deletion():
    _compare_all_modes(
        b"AGCACACGTGTGCGCTATACAGTACACGTGTCACAGTTGTACTAGCATGAC",
        b"AGCACACGTGTGCGCTATACAGTAAAAAAAACACGTGTCACAGTTGTACTAGCATGAC",
    )


def test_insertion():
    _compare_all_modes(
        b"AGCACACGTGTGCGCTATACAGTAAGTAGTAGTACACGTGTCACAGTTGTACTAGCATGAC",
        b"AGCACACGTGTGCGCTATACAGTACACGTGTCACAGTTGTACTAGCATGAC",
    )


def test_substitutions():
    _compare_all_modes(
        b"AGCACACGTGTGCGCTATACAGTAAGTAGTAGTACACGTGTCACAGTTGTACTAGCATGAC",
        b"AGCACAAGTGTGCGCTATACAGGAAGTAGGAGTACACGTGTCACATTTGTACTAGCATGAC",
    )


def test_overhangs():
    cases = [
        (b"CGCTATACAGTAAGTAGTAGTACACGTGTCACAGTTGTACTAGCATGAC",
         b"AGCACAAGTGTGAGCACAAGTGTGCGCTATACAGGAAGTAGGAGTACACGTGTCACATTTGTACTAGCATGAC"),
        (b"GCACACGAGCACACGTAGCACACGTGTGCGCTATACAGTAAGTAGTAGTACACGTGTCACAGTTGTACTAGCATGAC",
         b"TATACAGGAAGTAGGAGTACACGTGTCACATTTGTACTAGCATGAC"),
        (b"AGCACACGTGTGCGCTATACAGTAAGTAGTAGTACACGTG",
         b"AGCACAAGTGTGCGCTATACAGGAAGTAGGAGTACACGTGTCACATTTGTACTAGCATGAC"),
        (b"AGCACACGTGTGCGCTATACAGTAAGTAGTAGTACACGTGTCACAGTTGTACTAGCATGACCAGTTGTACTAGCATGAC",
         b"AGCACAAGTGTGCGCTATACAGGAAGTAGGAGTACACGTGTCA"),
        (b"AGCACAAGTGTGCGCTATACAGGAAGTAGGAGTACACGTGTCA",
         b"CAGTTGTACTAGCATGACCAGTTGTACTAGCATGACAGCACACGTGTGCGCTATACAGTAAGTAGTAGTACACGTGTCACAGTTGTACTAGCATGACCAGTTGTACTAGCATGAC"),
    ]
    for x, y in cases:
        _compare_all_modes(x, y)


def test_band_placement():
    _compare_all_modes(
        b"AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAGGGGGGGGGGGGGGGGGGGG",
        b"TTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTGGGGGGGGGGGGGGGGGGGG",
    )
    _compare_all_modes(
        b"GGGGGGGGGGGGGGGGGGGGAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA",
        b"GGGGGGGGGGGGGGGGGGGGTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTT",
    )
    _compare_all_modes(
        b"AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAGGGGGGGGGGGGGGGGGGGGAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA",
        b"TTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTGGGGGGGGGGGGGGGGGGGGTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTT",
    )


def test_semiglobal():
    aln = _banded(b"ACCGTGGAT", b"AAAAACCGTTGAT").semiglobal(
        b"ACCGTGGAT", b"AAAAACCGTTGAT"
    )
    assert aln.ystart == 4
    assert aln.xstart == 0
    assert aln.operations == [
        Match, Match, Match, Match, Match, Subst, Match, Match, Match,
    ]


def test_semiglobal_gap_open_lt_mismatch():
    fn = lambda a, b: 1 if a == b else -5
    aln = _banded(b"", b"", go=-1, ge=-1, fn=fn).semiglobal(
        b"ACCGTGGAT", b"AAAAACCGTTGAT"
    )
    assert aln.ystart == 4
    assert aln.xstart == 0
    assert aln.operations == [
        Match, Match, Match, Match, Del, Match, Ins, Match, Match, Match,
    ]


def test_global_affine_ins():
    fn = lambda a, b: 1 if a == b else -3
    aln = _banded(b"", b"", fn=fn).global_(b"ACGAGAACA", b"ACGACA")
    assert aln.operations == [
        Match, Match, Match, Ins, Ins, Ins, Match, Match, Match,
    ]


def test_global_affine_ins2():
    aln = _banded(b"", b"").global_(
        b"AGATAGATAGATAGGGAGTTGTGTAGATGATCCACAGT", b"AGATAGATAGATGTAGATGATCCACAGT"
    )
    assert aln.operations == [Match] * 11 + [Ins] * 10 + [Match] * 17


def test_local_empty():
    fn = lambda a, b: 1 if a == b else -3
    x = b"N" * 69
    y = b"AACGTACGATACGTGGGTTGTCACACGTGTCGCGCGGCAACACATCAGACTCTAACAGCATCATCAGCACGTGACA"
    aln = _banded(x, y, fn=fn).local(x, y)
    assert aln.x_aln_len() == 0
    assert aln.y_aln_len() == 0


def test_local_affine_ins2():
    aln = _banded(b"", b"").local(
        b"ACGTATCATAGATAGATAGGGTTGTGTAGATGATCCACAG",
        b"CGTATCATAGATAGATGTAGATGATCCACAGT",
    )
    assert aln.xstart == 1
    assert aln.ystart == 0


def test_random_vs_full_metamorphic():
    """Fuzz-style: banded == full on mutated pairs (banded_aligner.rs oracle)."""
    rng = np.random.default_rng(11)
    for _ in range(10):
        n = int(rng.integers(40, 120))
        x = rng.choice(list(b"ACGT"), size=n).astype("uint8").tobytes()
        y = bytearray(x)
        for _ in range(int(rng.integers(0, 6))):
            p = int(rng.integers(0, len(y)))
            op = rng.integers(0, 3)
            if op == 0:
                y[p] = ord("ACGT"[rng.integers(0, 4)])
            elif op == 1 and len(y) > 10:
                del y[p]
            else:
                y.insert(p, ord("ACGT"[rng.integers(0, 4)]))
        y = bytes(y)
        _compare_all_modes(x, y)


def test_rescore_metamorphic_oracle():
    """Port of the fuzz target's self-validating re-scoring oracle."""
    from rust_bio_tpu.alignment.validate import validate_alignment_score

    rng = np.random.default_rng(21)
    scoring = Scoring.from_scores(-5, -1, 1, -1)
    for _ in range(8):
        n = int(rng.integers(50, 150))
        x = rng.choice(list(b"ACGT"), size=n).astype("uint8").tobytes()
        y = bytearray(x)
        for _ in range(int(rng.integers(0, 8))):
            p = int(rng.integers(0, len(y)))
            y[p] = ord("ACGT"[rng.integers(0, 4)])
        y = bytes(y)
        full = FullAligner.with_scoring(scoring)
        for mode in ("global_", "semiglobal", "local"):
            aln = getattr(full, mode)(x, y)
            # clip filtering removes mode-implied clips; re-score path core
            assert validate_alignment_score(aln, x, y, scoring), (mode, x, y)
        banded = BandedAligner(scoring.with_clips(0, 0, 0, 0), 10, 10)
        aln = banded.custom(x, y)
        assert validate_alignment_score(
            aln, x, y, scoring.with_clips(0, 0, 0, 0)
        )


def test_cpu_banded_twin_score_parity(tmp_path):
    """The -O3 C++ baseline twin (baselines/cpu_banded.cpp) must be
    score-exact vs the banded.py oracle on random semiglobal pairs
    (including the no-kmer-match full-matrix fallback): the
    `banded_long_vs_baseline` bench row divides by this twin."""
    import os
    import subprocess

    import numpy as np

    from rust_bio_tpu.alignment.pairwise.banded import Aligner as HostBanded
    from rust_bio_tpu.alignment.pairwise.scoring import Scoring

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(here, "baselines", "cpu_banded.cpp")
    exe = os.path.join(str(tmp_path), "cpu_banded")
    subprocess.run(["g++", "-O2", "-o", exe, src], check=True)

    rng = np.random.default_rng(101)
    pairs = []
    for _ in range(12):
        N = int(rng.integers(200, 1500))
        y = rng.choice(list(b"ACGT"), size=N).astype(np.uint8).tobytes()
        M = int(rng.integers(50, 160))
        s = int(rng.integers(0, N - M))
        x = bytearray(y[s : s + M])
        for _ in range(int(rng.integers(0, 6))):
            x[int(rng.integers(0, M))] = int(rng.choice(list(b"ACGT")))
        pairs.append((bytes(x), y))
    pairs.append(
        (
            rng.choice(list(b"ACGT"), size=40).astype(np.uint8).tobytes(),
            rng.choice(list(b"ACGT"), size=60).astype(np.uint8).tobytes(),
        )
    )

    inp = [str(len(pairs))]
    for x, y in pairs:
        inp += [x.decode(), y.decode()]
    out = subprocess.run(
        [exe, "check", "8", "8"],
        input="\n".join(inp),
        capture_output=True,
        text=True,
        check=True,
    )
    lines = out.stdout.strip().splitlines()
    host = HostBanded(Scoring.from_scores(-5, -1, 2, -2), 8, 8)
    for k, (x, y) in enumerate(pairs):
        a = host.semiglobal(x, y)
        sc = int(lines[k].split()[0])
        assert sc == a.score, (k, sc, a.score)
