"""Exactness suite for the oracle-order f64 device PairHMM
(stats/pairhmm/exact.py) vs the scalar oracle.

The device path replicates the oracle operation-for-operation; the only
divergence sources are log1p ULPs (XLA vs libm) and, on TPU, the
double-float f64 emulation.  Tolerances here are therefore ~1e-12 —
10 orders tighter than the f32 kernels' 1e-3 — and the integer banding
bookkeeping is asserted bit-for-bit.
"""

import math

import numpy as np
import pytest

import jax

from rust_bio_tpu.stats.pairhmm import (
    EmissionParameters,
    GapParameters,
    Global,
    PairHMM,
    Semiglobal,
    XYEmission,
)

PROB_ILLUMINA_INS = 2.8e-6
PROB_ILLUMINA_DEL = 5.1e-6
PROB_ILLUMINA_SUBST = 0.0021

# the reference's own benchmark workload (benches/pairhmm.rs:9-13):
# ~207 bp of hg38 chrMT vs a 54 bp exact substring
BENCH_TEXT = (
    b"GATCACAGGTCTATCACCCTATTAACCACTCACGGGAGCTCTCCATGC"
    b"ATTTGGTATTTTCGTCTGGGGGGTATGCACGCGATAGCATTGCGAGACGCTGGAGCCGGAGCACCCTATGTCGCAGTAT"
    b"CTGTCTTTGATTCCTGCCTCATCCTATTATTTATCGCACCTACGTTCAATATTACAGGCGAACATACTTACTAAAGTGT"
)
BENCH_PATTERN = b"GGGTATGCACGCGATAGCATTGCGAGACGCTGGAGCCGGAGCACCCTATGTCGC"

EMIT = np.array(
    [
        math.log(1.0 - PROB_ILLUMINA_SUBST),
        math.log(PROB_ILLUMINA_SUBST / 3.0),
        math.log(1.0 - PROB_ILLUMINA_SUBST),
    ]
)


class _Emit(EmissionParameters):
    def __init__(self, x, y):
        self.x, self.y = x, y

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


class _Gaps(GapParameters):
    def __init__(self, gxe=float("-inf"), gye=float("-inf")):
        self.gxe, self.gye = gxe, gye

    def prob_gap_x(self):
        return math.log(PROB_ILLUMINA_INS)

    def prob_gap_y(self):
        return math.log(PROB_ILLUMINA_DEL)

    def prob_gap_x_extend(self):
        return self.gxe

    def prob_gap_y_extend(self):
        return self.gye

    def _ctor_args(self):
        return dict(
            prob_gap_x=math.log(PROB_ILLUMINA_INS),
            prob_gap_y=math.log(PROB_ILLUMINA_DEL),
            prob_gap_x_extend=self.gxe,
            prob_gap_y_extend=self.gye,
        )


def _oracle(x, y, mode, med=None, gaps=None, skip_trace=None):
    hmm = PairHMM(gaps or _Gaps())
    return float(
        hmm.prob_related(_Emit(x, y), mode, med, skip_trace=skip_trace)
    )


def _device(xs_list, ys_list, semiglobal, med=None, gaps=None):
    from rust_bio_tpu.stats.pairhmm.exact import BatchPairHMMExact

    g = gaps or _Gaps()
    dev = BatchPairHMMExact(**g._ctor_args())
    B = len(xs_list)
    M = max(len(x) for x in xs_list)
    N = max(len(y) for y in ys_list)
    xs = np.zeros((B, M), np.uint8)
    ys = np.zeros((B, N), np.uint8)
    xl = np.zeros(B, np.int32)
    yl = np.zeros(B, np.int32)
    for i, (x, y) in enumerate(zip(xs_list, ys_list)):
        xs[i, : len(x)] = np.frombuffer(bytes(x), np.uint8)
        ys[i, : len(y)] = np.frombuffer(bytes(y), np.uint8)
        xl[i], yl[i] = len(x), len(y)
    return dev.prob_related_batch(
        xs, ys, EMIT, semiglobal=semiglobal, max_edit_dist=med,
        xlens=xl, ylens=yl,
    )


def _rand_pair(rng, lo=8, hi=40):
    x = bytes(rng.choice(list(b"ACGT"), size=int(rng.integers(lo, hi))))
    # y: mutated copy half the time, random otherwise
    if rng.random() < 0.5:
        y = bytearray(x)
        for _ in range(int(rng.integers(0, 4))):
            p = int(rng.integers(0, len(y)))
            y[p] = int(rng.choice(list(b"ACGT")))
        y = bytes(y)
    else:
        y = bytes(rng.choice(list(b"ACGT"), size=int(rng.integers(lo, hi))))
    return x, y


def test_exact_reference_bench_semiglobal_banded():
    """The reference bench workload: TEXT x PATTERN, semiglobal,
    max_edit_dist=4 (benches/pairhmm.rs:88-99)."""
    with jax.enable_x64(True):
        want = _oracle(BENCH_TEXT, BENCH_PATTERN, Semiglobal(), med=4)
        got = _device([BENCH_TEXT], [BENCH_PATTERN], True, med=4)[0]
        assert got == pytest.approx(want, rel=1e-12, abs=1e-12)
        # unbanded too
        want_u = _oracle(BENCH_TEXT, BENCH_PATTERN, Semiglobal())
        got_u = _device([BENCH_TEXT], [BENCH_PATTERN], True)[0]
        assert got_u == pytest.approx(want_u, rel=1e-12, abs=1e-12)


@pytest.mark.slow
def test_exact_global_random_batch():
    with jax.enable_x64(True):
        rng = np.random.default_rng(5)
        pairs = [_rand_pair(rng) for _ in range(12)]
        xs = [p[0] for p in pairs]
        ys = [p[1] for p in pairs]
        got = _device(xs, ys, False)
        for i, (x, y) in enumerate(pairs):
            want = _oracle(x, y, Global())
            assert got[i] == pytest.approx(want, rel=1e-12, abs=1e-12), i


@pytest.mark.slow
def test_exact_semiglobal_random_batch_banded():
    with jax.enable_x64(True):
        rng = np.random.default_rng(6)
        xs, ys = [], []
        for _ in range(10):
            x, _ = _rand_pair(rng, 20, 50)
            s = int(rng.integers(0, max(1, len(x) - 12)))
            y = bytearray(x[s : s + 12])
            for _ in range(int(rng.integers(0, 3))):
                p = int(rng.integers(0, len(y)))
                y[p] = int(rng.choice(list(b"ACGT")))
            xs.append(x)
            ys.append(bytes(y))
        for med in (None, 2, 4):
            got = _device(xs, ys, True, med=med)
            for i in range(len(xs)):
                want = _oracle(xs[i], ys[i], Semiglobal(), med=med)
                assert got[i] == pytest.approx(
                    want, rel=1e-12, abs=1e-12
                ), (i, med)


@pytest.mark.slow
def test_exact_extend_gaps_sequential_path():
    """Finite gap extends exercise the in-row sequential fy recurrence."""
    with jax.enable_x64(True):
        gaps = _Gaps(gxe=math.log(1e-3), gye=math.log(2e-3))
        rng = np.random.default_rng(7)
        pairs = [_rand_pair(rng) for _ in range(8)]
        xs = [p[0] for p in pairs]
        ys = [p[1] for p in pairs]
        for semiglobal, mode in ((False, Global()), (True, Semiglobal())):
            got = _device(xs, ys, semiglobal, gaps=gaps)
            for i in range(len(xs)):
                want = _oracle(xs[i], ys[i], mode, gaps=gaps)
                assert got[i] == pytest.approx(
                    want, rel=1e-12, abs=1e-12
                ), (i, semiglobal)


def test_exact_banding_skip_pattern_bitwise():
    """The integer med/skip bookkeeping must match the oracle's banded
    ``continue`` pattern EXACTLY (it is pure int arithmetic on every
    backend)."""
    from rust_bio_tpu.stats.pairhmm.exact import BatchPairHMMExact

    with jax.enable_x64(True):
        import jax.numpy as jnp

        rng = np.random.default_rng(8)
        g = _Gaps()
        dev = BatchPairHMMExact(**g._ctor_args())
        for trial in range(4):
            x, _ = _rand_pair(rng, 15, 30)
            y0 = bytearray(x[2 : 2 + 10])
            if trial % 2:
                y0[3] = int(rng.choice(list(b"ACGT")))
            y = bytes(y0)
            trace = []
            _oracle(x, y, Semiglobal(), med=2, skip_trace=trace)
            want = np.zeros((len(x), len(y)), bool)
            for i, j in trace:
                want[i, j] = True

            xs = np.frombuffer(x, np.uint8)[None, :]
            ys = np.frombuffer(y, np.uint8)[None, :]
            _, skips = dev._forward(
                jnp.asarray(xs),
                jnp.asarray(ys),
                jnp.asarray(np.array([len(x)], np.int32)),
                jnp.asarray(np.array([len(y)], np.int32)),
                jnp.asarray(EMIT),
                semiglobal=True,
                max_edit_dist=2,
                debug_skip=True,
            )
            got = np.asarray(skips)[:, 0, :]  # (M, B, N) -> (M, N)
            np.testing.assert_array_equal(got, want, err_msg=str(trial))


def test_exact_degenerate_lanes():
    """Absent overlap (ln_zero-ish), len-1 sequences, identical pair."""
    with jax.enable_x64(True):
        xs = [b"A", b"ACGTACGT", b"TTTT"]
        ys = [b"T", b"ACGTACGT", b"AAAA"]
        got = _device(xs, ys, False)
        for i in range(3):
            want = _oracle(xs[i], ys[i], Global())
            assert got[i] == pytest.approx(want, rel=1e-12, abs=1e-12), i


def test_cpu_pairhmm_twin_parity(tmp_path):
    """The -O3 C++ baseline twin (baselines/cpu_pairhmm.cpp) must match
    the host PairHMM oracle to f64 rounding on the reference bench
    geometry, banded and unbanded: the `pairhmm_exact_vs_baseline` bench
    row divides by this twin."""
    import os
    import subprocess

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(here, "baselines", "cpu_pairhmm.cpp")
    exe = os.path.join(str(tmp_path), "cpu_pairhmm")
    subprocess.run(["g++", "-O2", "-o", exe, src], check=True)

    rng = np.random.default_rng(77)
    pairs = [(BENCH_TEXT, BENCH_PATTERN)]
    for _ in range(6):
        M, N = 120, 40
        x = rng.choice(list(b"ACGT"), size=M).astype(np.uint8).tobytes()
        s = int(rng.integers(0, M - N))
        y = bytearray(x[s : s + N])
        for _ in range(2):
            y[int(rng.integers(0, N))] = int(rng.choice(list(b"ACGT")))
        pairs.append((x, bytes(y)))

    for band in (4, -1):
        inp = [str(len(pairs))]
        for x, y in pairs:
            inp += [x.decode(), y.decode()]
        out = subprocess.run(
            [exe, "check", str(band)],
            input="\n".join(inp),
            capture_output=True,
            text=True,
            check=True,
        )
        got = [float(v) for v in out.stdout.split()]
        for k, (x, y) in enumerate(pairs):
            want = _oracle(
                x, y, Semiglobal(), med=None if band < 0 else band
            )
            assert got[k] == pytest.approx(want, rel=1e-12, abs=1e-12), (
                band, k, got[k], want,
            )
