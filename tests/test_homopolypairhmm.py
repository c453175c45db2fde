"""Parity suite for HomopolyPairHMM (reference: homopolypairhmm.rs tests)."""

import math

import pytest

from rust_bio_tpu.stats.pairhmm import (
    EmissionParameters,
    GapParameters,
    Global,
    Semiglobal,
    XYEmission,
)
from rust_bio_tpu.stats.pairhmm.homopolypairhmm import (
    Emission,
    HomopolyPairHMM,
    HopParameters,
)

PROB_ILLUMINA_INS = 2.8e-6
PROB_ILLUMINA_DEL = 5.1e-6
PROB_ILLUMINA_SUBST = 0.0021

PROB_SUBSTITUTION = -6.165_817_934_252_76
PROB_OPEN_GAP_Y = -12.785_891_140_783_116
PROB_OPEN_GAP_X = -12.186_270_018_233_994
EMIT_MATCH = -0.0021022080918701985
T_MATCH_TO_HOP = -11.512925464970229
T_HOP_TO_HOP = -2.3025850929940455
T_MATCH_TO_MATCH = -7.900_031_205_113_962e-6
T_MATCH_TO_GAP_Y = -12.785_891_140_783_116
T_MATCH_TO_GAP_X = -12.186_270_018_233_994
T_GAP_TO_GAP = -9.210340371976182

NEG_INF = float("-inf")


class EmParams(EmissionParameters, Emission):
    def __init__(self, x, y):
        self.x, self.y = x, y

    def prob_emit_xy(self, i, j):
        if self.x[i] == self.y[j]:
            return XYEmission.match_(math.log1p(-math.exp(PROB_SUBSTITUTION)))
        return XYEmission.mismatch(math.log(PROB_ILLUMINA_SUBST / 3.0))

    def prob_emit_x(self, i):
        return math.log1p(-math.exp(PROB_SUBSTITUTION))

    def prob_emit_y(self, j):
        return math.log1p(-math.exp(PROB_SUBSTITUTION))

    def len_x(self):
        return len(self.x)

    def len_y(self):
        return len(self.y)

    def emission_x(self, i):
        return self.x[i]

    def emission_y(self, j):
        return self.y[j]


class SingleGapParams(GapParameters):
    def prob_gap_x(self):
        return PROB_OPEN_GAP_Y

    def prob_gap_y(self):
        return PROB_OPEN_GAP_X

    def prob_gap_x_extend(self):
        return NEG_INF

    def prob_gap_y_extend(self):
        return NEG_INF


class NoGapParams(GapParameters):
    def prob_gap_x(self):
        return NEG_INF

    def prob_gap_y(self):
        return NEG_INF

    def prob_gap_x_extend(self):
        return NEG_INF

    def prob_gap_y_extend(self):
        return NEG_INF


class ExtendGapParams(GapParameters):
    def prob_gap_x(self):
        return math.log(PROB_ILLUMINA_INS)

    def prob_gap_y(self):
        return math.log(PROB_ILLUMINA_DEL)

    def prob_gap_x_extend(self):
        return T_GAP_TO_GAP

    def prob_gap_y_extend(self):
        return T_GAP_TO_GAP


class NoHopParams(HopParameters):
    def prob_hop_x(self):
        return NEG_INF

    def prob_hop_y(self):
        return NEG_INF

    def prob_hop_x_extend(self):
        return NEG_INF

    def prob_hop_y_extend(self):
        return NEG_INF


class WithHopParams(HopParameters):
    def prob_hop_x(self):
        return T_MATCH_TO_HOP

    def prob_hop_y(self):
        return T_MATCH_TO_HOP

    def prob_hop_x_extend(self):
        return T_HOP_TO_HOP

    def prob_hop_y_extend(self):
        return T_HOP_TO_HOP


SINGLE_GAPS_NO_HOPS = HomopolyPairHMM(SingleGapParams(), NoHopParams())
NO_GAPS_WITH_HOPS = HomopolyPairHMM(NoGapParams(), WithHopParams())
EXTEND_GAPS_NO_HOPS = HomopolyPairHMM(ExtendGapParams(), NoHopParams())


def test_impossible_global_alignment():
    p = SINGLE_GAPS_NO_HOPS.prob_related(
        EmParams(b"AAA", b"A"), Global(), None
    )
    assert p == NEG_INF


def test_homopolymer_run_in_y():
    for i in range(1, 5):
        x = b"ACGT"
        y = b"AC" + b"C" * i + b"GT"
        p = NO_GAPS_WITH_HOPS.prob_related(EmParams(x, y), Global(), None)
        p_hops = (
            EMIT_MATCH + T_MATCH_TO_MATCH + EMIT_MATCH + T_MATCH_TO_HOP
            + T_HOP_TO_HOP * (i - 1) + math.log(1.0 - 0.1)
            + EMIT_MATCH + T_MATCH_TO_MATCH + EMIT_MATCH
        )
        assert p <= 0.0
        assert p >= p_hops
        assert p < p_hops + 1.0


def test_homopolymer_run_in_x():
    for i in range(1, 5):
        x = b"AC" + b"C" * i + b"GT"
        y = b"ACGT"
        p = NO_GAPS_WITH_HOPS.prob_related(EmParams(x, y), Global(), None)
        p_hops = (
            EMIT_MATCH + T_MATCH_TO_MATCH + EMIT_MATCH + T_MATCH_TO_HOP
            + T_HOP_TO_HOP * (i - 1) + math.log(1.0 - 0.1)
            + EMIT_MATCH + T_MATCH_TO_MATCH + EMIT_MATCH
        )
        assert p <= 0.0
        assert p >= p_hops
        assert p < p_hops + 1.0


def test_interleave_gaps_x():
    p = SINGLE_GAPS_NO_HOPS.prob_related(
        EmParams(b"AGAGAG", b"ACGTACGTACGT"), Global(), None
    )
    n_m, n_i = 6.0, 6.0
    p_ml = (
        EMIT_MATCH * n_m + T_MATCH_TO_MATCH * (n_m - n_i) + EMIT_MATCH * n_i
        + T_MATCH_TO_GAP_X * n_i
        + math.log1p(-math.exp(PROB_OPEN_GAP_Y)) * n_i
    )
    p_max = T_MATCH_TO_GAP_X * n_i
    assert p <= 0.0
    assert p == pytest.approx(p_ml, abs=0.01)
    assert p == pytest.approx(p_max, abs=0.1)
    assert p <= p_max


def test_interleave_gaps_y():
    p = SINGLE_GAPS_NO_HOPS.prob_related(
        EmParams(b"ACGTACGTACGT", b"AGAGAG"), Global(), None
    )
    n_m, n_i = 6.0, 6.0
    p_ml = (
        EMIT_MATCH * n_m + T_MATCH_TO_MATCH * (n_m - n_i) + EMIT_MATCH * n_i
        + T_MATCH_TO_GAP_Y * n_i
        + math.log1p(-math.exp(PROB_OPEN_GAP_X)) * n_i
    )
    p_max = T_MATCH_TO_GAP_Y * n_i
    assert p <= 0.0
    assert p == pytest.approx(p_ml, abs=0.01)
    assert p == pytest.approx(p_max, abs=0.1)
    assert p <= p_max


def test_same():
    x = b"AGCTCGATCGATCGATC"
    p = SINGLE_GAPS_NO_HOPS.prob_related(EmParams(x, x), Global(), None)
    n = 17.0
    p_ml = EMIT_MATCH * n + T_MATCH_TO_MATCH * (n - 1.0)
    p_max = EMIT_MATCH * n
    assert p <= 0.0
    assert p == pytest.approx(p_ml, abs=0.001)
    assert p == pytest.approx(p_max, abs=0.001)
    assert p <= p_max


def test_gap_x():
    p = SINGLE_GAPS_NO_HOPS.prob_related(
        EmParams(b"AGCTCGATCGATCGATC", b"AGCTCGATCTGATCGATCT"),
        Global(), None,
    )
    n_m, n_i = 17.0, 2.0
    p_ml = (
        EMIT_MATCH * n_m + T_MATCH_TO_MATCH * (n_m - n_i) + EMIT_MATCH * n_i
        + T_MATCH_TO_GAP_X * n_i + math.log(1.0 - PROB_ILLUMINA_INS)
    )
    p_max = T_MATCH_TO_GAP_X * 2.0
    assert p <= 0.0
    assert p == pytest.approx(p_ml, abs=0.01)
    assert p == pytest.approx(p_max, abs=0.1)
    assert p <= p_max


def test_gap_y():
    p = SINGLE_GAPS_NO_HOPS.prob_related(
        EmParams(b"AGCTCGATCTGATCGATCT", b"AGCTCGATCGATCGATC"),
        Global(), None,
    )
    n_m, n_d = 17.0, 2.0
    p_ml = (
        EMIT_MATCH * n_m + T_MATCH_TO_MATCH * (n_m - n_d) + EMIT_MATCH * n_d
        + T_MATCH_TO_GAP_Y * n_d + math.log(1.0 - PROB_ILLUMINA_DEL)
    )
    p_max = T_MATCH_TO_GAP_Y * 2.0
    assert p <= 0.0
    assert p == pytest.approx(p_ml, abs=0.01)
    assert p == pytest.approx(p_max, abs=0.1)
    assert p <= p_max


def test_multigap_y():
    p = EXTEND_GAPS_NO_HOPS.prob_related(
        EmParams(b"AGCTCGATCTGATCGATCT", b"AGCTTCTGATCGATCT"),
        Global(), None,
    )
    n_m, n_cd = 16.0, 3.0
    p_ml = (
        EMIT_MATCH * n_m + T_MATCH_TO_MATCH * (n_m - n_cd) + PROB_OPEN_GAP_Y
        + EMIT_MATCH * n_cd + T_GAP_TO_GAP * (n_cd - 1.0)
        + math.log1p(-math.exp(T_GAP_TO_GAP))
    )
    assert p <= 0.0
    assert p == pytest.approx(p_ml, abs=0.01)


def test_mismatch():
    p = SINGLE_GAPS_NO_HOPS.prob_related(
        EmParams(b"AGCTCGAGCGATCGATC", b"TGCTCGATCGATCGATC"),
        Global(), None,
    )
    n = 17.0
    p_ml = (
        EMIT_MATCH * (n - 2.0) + T_MATCH_TO_MATCH * (n - 1.0)
        + math.log(PROB_ILLUMINA_SUBST / 3.0) * 2.0
    )
    p_max = math.log(PROB_ILLUMINA_SUBST / 3.0) * 2.0
    assert p <= 0.0
    assert p == pytest.approx(p_ml, abs=1e-2)
    assert p == pytest.approx(p_max, abs=1e-1)
    assert p <= p_max


def test_banded_matches_unbanded():
    x = (
        b"GATCACAGGTCTATCACCCTATTAACCACTCACGGGAGCTCTCCATGC"
        b"ATTTGGTATTTTCGTCTGGGGGGTATGCACGCGATAGCATTGCGAGACGCTGGAGCCGGAGCACCCTATGTCGCAGTAT"
    )
    y = b"GGGTATGCACGCGATAGCATTGCGAGATGCTGGAGCTGGAGCACCCTATGTCGC"
    em = EmParams(x, y)
    p = SINGLE_GAPS_NO_HOPS.prob_related(em, Semiglobal(), None)
    p_banded = SINGLE_GAPS_NO_HOPS.prob_related(em, Semiglobal(), 2)
    assert p == pytest.approx(p_banded, abs=1e-3)


# ---- device kernel vs scalar oracle ----

import numpy as np


def _emit_vec():
    p_match = math.log1p(-math.exp(PROB_SUBSTITUTION))
    p_mismatch = math.log(PROB_ILLUMINA_SUBST / 3.0)
    return [p_match, p_mismatch, p_match, p_match]


def _device(gp, hp, dtype=None):
    import jax.numpy as jnp

    from rust_bio_tpu.stats.pairhmm.homopoly_device import BatchHomopolyPairHMM

    return BatchHomopolyPairHMM(
        prob_gap_x=gp.prob_gap_x(),
        prob_gap_y=gp.prob_gap_y(),
        prob_gap_x_extend=gp.prob_gap_x_extend(),
        prob_gap_y_extend=gp.prob_gap_y_extend(),
        prob_hop_x=hp.prob_hop_x(),
        prob_hop_y=hp.prob_hop_y(),
        prob_hop_x_extend=hp.prob_hop_x_extend(),
        prob_hop_y_extend=hp.prob_hop_y_extend(),
        dtype=dtype or jnp.float32,
    )


@pytest.mark.parametrize("semiglobal", [False, True])
@pytest.mark.parametrize(
    "gp,hp,hmm",
    [
        (SingleGapParams(), NoHopParams(), SINGLE_GAPS_NO_HOPS),
        (NoGapParams(), WithHopParams(), NO_GAPS_WITH_HOPS),
        (ExtendGapParams(), NoHopParams(), EXTEND_GAPS_NO_HOPS),
    ],
    ids=["single-gaps", "hops", "extend-gaps"],
)
def test_device_matches_oracle(semiglobal, gp, hp, hmm):
    rng = np.random.default_rng(17)
    B = 6
    xs_list, ys_list = [], []
    for _ in range(B):
        m = int(rng.integers(2, 14))
        n = int(rng.integers(2, 18))
        x = rng.choice(list(b"ACGT"), size=m).astype("uint8")
        if rng.random() < 0.6 and n >= m:
            y = np.concatenate(
                [x, rng.choice(list(b"ACGT"), size=n - m).astype("uint8")]
            )
        else:
            y = rng.choice(list(b"ACGT"), size=n).astype("uint8")
        # sprinkle homopolymer runs to exercise hop states
        if rng.random() < 0.5:
            x[1:3] = x[0]
        xs_list.append(x)
        ys_list.append(y)

    M = max(len(x) for x in xs_list)
    N = max(len(y) for y in ys_list)
    xs = np.zeros((B, M), np.uint8)
    ys = np.zeros((B, N), np.uint8)
    xlens = np.array([len(x) for x in xs_list], np.int32)
    ylens = np.array([len(y) for y in ys_list], np.int32)
    for i in range(B):
        xs[i, : xlens[i]] = xs_list[i]
        ys[i, : ylens[i]] = ys_list[i]

    dev = _device(gp, hp)
    got = dev.prob_related_batch(
        xs, ys, _emit_vec(), semiglobal=semiglobal, xlens=xlens, ylens=ylens
    )

    mode = Semiglobal() if semiglobal else Global()
    for b in range(B):
        want = float(
            hmm.prob_related(
                EmParams(bytes(xs_list[b]), bytes(ys_list[b])), mode, None
            )
        )
        if want == float("-inf") or want < -80:
            assert got[b] < -75, (b, want, got[b])
        else:
            assert got[b] == pytest.approx(want, rel=2e-3, abs=2e-3), b


def test_cpu_homopoly_twin_parity(tmp_path):
    """The -O3 C++ baseline twin (baselines/cpu_homopoly.cpp) must match
    the host HomopolyPairHMM oracle to f64 rounding on the bench row's
    parameters: the `homopoly_vs_baseline` bench row divides by it."""
    import os
    import subprocess

    import numpy as np

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(here, "baselines", "cpu_homopoly.cpp")
    exe = os.path.join(str(tmp_path), "cpu_homopoly")
    subprocess.run(["g++", "-O2", "-o", exe, src], check=True)

    class BenchGaps(GapParameters):
        def prob_gap_x(self):
            return math.log(PROB_ILLUMINA_INS)

        def prob_gap_y(self):
            return math.log(PROB_ILLUMINA_DEL)

        def prob_gap_x_extend(self):
            return NEG_INF

        def prob_gap_y_extend(self):
            return NEG_INF

    class BenchHops(HopParameters):
        def prob_hop_x(self):
            return math.log(1e-4)

        def prob_hop_y(self):
            return math.log(1e-4)

        def prob_hop_x_extend(self):
            return math.log(0.5)

        def prob_hop_y_extend(self):
            return math.log(0.5)

    class BenchEmit(EmParams):
        def prob_emit_xy(self, i, j):
            if self.x[i] == self.y[j]:
                return XYEmission.match_(
                    math.log1p(-PROB_ILLUMINA_SUBST)
                )
            return XYEmission.mismatch(
                math.log(PROB_ILLUMINA_SUBST / 3.0)
            )

        def prob_emit_x(self, i):
            return math.log1p(-PROB_ILLUMINA_SUBST)

        def prob_emit_y(self, j):
            return math.log1p(-PROB_ILLUMINA_SUBST)

    hmm = HomopolyPairHMM(BenchGaps(), BenchHops())
    rng = np.random.default_rng(15)
    pairs = []
    for _ in range(5):
        M, N = 80, 30
        x = rng.choice(list(b"ACGT"), size=M).astype(np.uint8).tobytes()
        s = int(rng.integers(0, M - N))
        y = bytearray(x[s : s + N])
        for _ in range(int(rng.integers(0, 3))):
            y[int(rng.integers(0, N))] = int(rng.choice(list(b"ACGT")))
        pairs.append((x, bytes(y)))
    inp = [str(len(pairs))]
    for x, y in pairs:
        inp += [x.decode(), y.decode()]
    out = subprocess.run(
        [exe, "check"],
        input="\n".join(inp),
        capture_output=True,
        text=True,
        check=True,
    )
    got = [float(v) for v in out.stdout.split()]
    for k, (x, y) in enumerate(pairs):
        want = float(hmm.prob_related(BenchEmit(x, y), Semiglobal()))
        assert got[k] == pytest.approx(want, rel=1e-12, abs=1e-12), (
            k, got[k], want,
        )
