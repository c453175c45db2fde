"""Parity suite for PairHMM (reference: pairhmm.rs tests) + device kernel."""

import math

import numpy as np
import pytest

from rust_bio_tpu.stats.probs import LogProb, Prob
from rust_bio_tpu.stats.pairhmm import (
    EmissionParameters,
    GapParameters,
    Global,
    PairHMM,
    Semiglobal,
    XYEmission,
)
from rust_bio_tpu.stats.pairhmm.device import BatchPairHMM

PROB_ILLUMINA_INS = 2.8e-6
PROB_ILLUMINA_DEL = 5.1e-6
PROB_ILLUMINA_SUBST = 0.0021

EMIT_MATCH = -0.0021022080918701985
T_MATCH = -7.900_031_205_113_962e-6
T_GAP_X = -12.785891140783116
T_GAP_Y = -12.186270018233994


class TestEmissionParams(EmissionParameters):
    def __init__(self, x, y):
        self.x = x
        self.y = y

    def prob_emit_xy(self, i, j):
        if self.x[i] == self.y[j]:
            return XYEmission.match_(math.log(1.0 - PROB_ILLUMINA_SUBST))
        return XYEmission.mismatch(math.log(PROB_ILLUMINA_SUBST / 3.0))

    def prob_emit_x(self, i):
        return math.log(1.0 - PROB_ILLUMINA_SUBST)

    def prob_emit_y(self, j):
        return math.log(1.0 - PROB_ILLUMINA_SUBST)

    def len_x(self):
        return len(self.x)

    def len_y(self):
        return len(self.y)


class TestSingleGapParams(GapParameters):
    def prob_gap_x(self):
        return math.log(PROB_ILLUMINA_INS)

    def prob_gap_y(self):
        return math.log(PROB_ILLUMINA_DEL)

    def prob_gap_x_extend(self):
        return float("-inf")

    def prob_gap_y_extend(self):
        return float("-inf")


def _prob(x, y, mode=None, max_edit_dist=None):
    hmm = PairHMM(TestSingleGapParams())
    return hmm.prob_related(
        TestEmissionParams(x, y), mode or Global(), max_edit_dist
    )


def test_impossible_global_alignment():
    assert _prob(b"AAA", b"A") == float("-inf")


def test_interleave_gaps_y():
    p = _prob(b"ACGTACGTACGT", b"AGAGAG")
    n_matches, n_ins = 6.0, 6.0
    p_most_likely = (
        EMIT_MATCH * n_matches
        + T_MATCH * (n_matches - n_ins)
        + EMIT_MATCH * n_ins
        + T_GAP_Y * n_ins
        + math.log(1.0 - PROB_ILLUMINA_DEL) * n_ins
    )
    p_max = T_GAP_Y * n_ins
    assert p <= 0.0
    assert p == pytest.approx(p_most_likely, abs=0.01)
    assert p == pytest.approx(p_max, abs=0.1)
    assert p <= p_max


def test_interleave_gaps_x():
    p = _prob(b"AGAGAG", b"ACGTACGTACGT")
    n_matches, n_ins = 6.0, 6.0
    p_most_likely = (
        EMIT_MATCH * n_matches
        + T_MATCH * (n_matches - n_ins)
        + EMIT_MATCH * n_ins
        + T_GAP_X * n_ins
        + math.log(1.0 - PROB_ILLUMINA_INS) * n_ins
    )
    p_max = T_GAP_X * n_ins
    assert p <= 0.0
    assert p == pytest.approx(p_most_likely, abs=0.01)
    assert p == pytest.approx(p_max, abs=0.1)
    assert p <= p_max


def test_same():
    x = b"AGCTCGATCGATCGATC"
    p = _prob(x, x)
    n = float(len(x))
    p_most_likely = EMIT_MATCH * n + T_MATCH * (n - 1.0)
    p_max = EMIT_MATCH * n
    assert p <= 0.0
    assert p == pytest.approx(p_most_likely, abs=0.001)
    assert p == pytest.approx(p_max, abs=0.001)
    assert p <= p_max


def test_gap_x():
    p = _prob(b"AGCTCGATCGATCGATC", b"AGCTCGATCTGATCGATCT")
    n_matches, n_ins = 17.0, 2.0
    p_most_likely = (
        EMIT_MATCH * n_matches
        + T_MATCH * (n_matches - n_ins)
        + EMIT_MATCH * n_ins
        + T_GAP_X * n_ins
        + math.log(1.0 - PROB_ILLUMINA_INS)
    )
    p_max = T_GAP_X * 2.0
    assert p <= 0.0
    assert p == pytest.approx(p_most_likely, abs=0.01)
    assert p == pytest.approx(p_max, abs=0.1)
    assert p <= p_max


def test_gap_y():
    p = _prob(b"AGCTCGATCTGATCGATCT", b"AGCTCGATCGATCGATC")
    n_matches, n_del = 17.0, 2.0
    p_most_likely = (
        EMIT_MATCH * n_matches
        + T_MATCH * (n_matches - n_del)
        + EMIT_MATCH * n_del
        + T_GAP_Y * n_del
        + math.log(1.0 - PROB_ILLUMINA_DEL)
    )
    p_max = T_GAP_Y * 2.0
    assert p <= 0.0
    assert p == pytest.approx(p_most_likely, abs=0.01)
    assert p == pytest.approx(p_max, abs=0.1)
    assert p <= p_max


def test_mismatch():
    x = b"AGCTCGAGCGATCGATC"
    y = b"TGCTCGATCGATCGATC"
    p = _prob(x, y)
    n = float(len(x))
    p_most_likely = (
        EMIT_MATCH * (n - 2.0)
        + T_MATCH * (n - 1.0)
        + math.log(PROB_ILLUMINA_SUBST / 3.0) * 2.0
    )
    p_max = math.log(PROB_ILLUMINA_SUBST / 3.0) * 2.0
    assert p <= 0.0
    assert p == pytest.approx(p_most_likely, abs=1e-4)
    assert p == pytest.approx(p_max, abs=1e-1)
    assert p <= p_max


X_BANDED = (
    b"GATCACAGGTCTATCACCCTATTAACCACTCACGGGAGCTCTCCATGC"
    b"ATTTGGTATTTTCGTCTGGGGGGTATGCACGCGATAGCATTGCGAGACGCTGGAGCCGGAGCACCCTATGTCGCAGTAT"
    b"CTGTCTTTGATTCCTGCCTCATCCTATTATTTATCGCACCTACGTTCAATATTACAGGCGAACATACTTACTAAAGTGT"
)
Y_BANDED = b"GGGTATGCACGCGATAGCATTGCGAGATGCTGGAGCTGGAGCACCCTATGTCGC"


def test_banded():
    hmm = PairHMM(TestSingleGapParams())
    em = TestEmissionParams(X_BANDED, Y_BANDED)
    p = hmm.prob_related(em, Semiglobal(), None)
    p_banded = hmm.prob_related(em, Semiglobal(), 2)
    assert p == pytest.approx(p_banded, abs=1e-7)


# ---- device kernel vs scalar oracle ----

def _device_hmm():
    return BatchPairHMM(
        prob_gap_x=math.log(PROB_ILLUMINA_INS),
        prob_gap_y=math.log(PROB_ILLUMINA_DEL),
        prob_gap_x_extend=float("-inf"),
        prob_gap_y_extend=float("-inf"),
    )


EMIT = [
    math.log(1.0 - PROB_ILLUMINA_SUBST),
    math.log(PROB_ILLUMINA_SUBST / 3.0),
    math.log(1.0 - PROB_ILLUMINA_SUBST),
]


@pytest.mark.parametrize("semiglobal", [False, True])
def test_device_matches_oracle(semiglobal):
    rng = np.random.default_rng(5)
    B = 8
    xs_list, ys_list = [], []
    for _ in range(B):
        m = int(rng.integers(3, 30))
        n = int(rng.integers(3, 40))
        x = rng.choice(list(b"ACGT"), size=m).astype("uint8")
        if rng.random() < 0.5 and n >= m:
            y = np.concatenate([x, rng.choice(list(b"ACGT"), size=n - m).astype("uint8")])
        else:
            y = rng.choice(list(b"ACGT"), size=n).astype("uint8")
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

    dev = _device_hmm()
    got = dev.prob_related_batch(
        xs, ys, EMIT, semiglobal=semiglobal, xlens=xlens, ylens=ylens
    )

    mode = Semiglobal() if semiglobal else Global()
    for b in range(B):
        want = _prob(bytes(xs_list[b]), bytes(ys_list[b]), mode)
        if want == float("-inf"):
            assert got[b] < -80, b
        else:
            assert got[b] == pytest.approx(want, rel=1e-3, abs=1e-3), b


def test_device_f64_close_to_oracle():
    import jax

    with jax.enable_x64(True):
        import jax.numpy as jnp

        dev = BatchPairHMM(
            prob_gap_x=math.log(PROB_ILLUMINA_INS),
            prob_gap_y=math.log(PROB_ILLUMINA_DEL),
            prob_gap_x_extend=float("-inf"),
            prob_gap_y_extend=float("-inf"),
            dtype=jnp.float64,
        )
        x = b"AGCTCGATCGATCGATC"
        y = b"AGCTCGATCTGATCGATCT"
        xs = np.frombuffer(x, np.uint8)[None, :]
        ys = np.frombuffer(y, np.uint8)[None, :]
        got = dev.prob_related_batch(xs, ys, EMIT)[0]
        want = _prob(x, y, Global())
        # f64 device agrees with the f64 scalar oracle to near machine eps
        # (the oracle's fastexp approximation dominates the residual)
        assert got == pytest.approx(want, rel=1e-6)


@pytest.mark.parametrize("semiglobal", [False, True])
def test_linear_space_device_matches_oracle(semiglobal):
    from rust_bio_tpu.stats.pairhmm.device import BatchPairHMMLinear

    rng = np.random.default_rng(5)
    B = 8
    xs_list, ys_list = [], []
    for _ in range(B):
        m = int(rng.integers(3, 30))
        n = int(rng.integers(3, 40))
        x = rng.choice(list(b"ACGT"), size=m).astype("uint8")
        if rng.random() < 0.5 and n >= m:
            y = np.concatenate([x, rng.choice(list(b"ACGT"), size=n - m).astype("uint8")])
        else:
            y = rng.choice(list(b"ACGT"), size=n).astype("uint8")
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

    dev = BatchPairHMMLinear(
        prob_gap_x=math.log(PROB_ILLUMINA_INS),
        prob_gap_y=math.log(PROB_ILLUMINA_DEL),
        prob_gap_x_extend=float("-inf"),
        prob_gap_y_extend=float("-inf"),
    )
    got = dev.prob_related_batch(
        xs, ys, EMIT, semiglobal=semiglobal, xlens=xlens, ylens=ylens
    )
    mode = Semiglobal() if semiglobal else Global()
    for b in range(B):
        want = _prob(bytes(xs_list[b]), bytes(ys_list[b]), mode)
        if want == float("-inf"):
            assert got[b] < -75, b
        else:
            assert got[b] == pytest.approx(want, rel=2e-3, abs=2e-3), b
