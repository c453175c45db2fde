"""Tests: probs substrate, CDF, adaptive integration, Bayesian,
combinatorics, seq_analysis (reference test values)."""

import math

import numpy as np
import pytest

from rust_bio_tpu.seq_analysis.gc import gc3_content, gc_content, gc_content_batch
from rust_bio_tpu.seq_analysis.orf import Finder, Orf
from rust_bio_tpu.stats.bayesian import (
    BayesFactor,
    KassRaftery,
    Likelihood,
    Model,
    Posterior,
    Prior,
    expected_fdr,
)
from rust_bio_tpu.stats.combinatorics import (
    combinations,
    combinations_with_repl,
    scaled_combinations,
)
from rust_bio_tpu.stats.probs import LogProb, PHREDProb, Prob
from rust_bio_tpu.stats.probs.adaptive_integration import ln_integrate_exp
from rust_bio_tpu.stats.probs.cdf import CDF, Entry


# ---- probs (probs/mod.rs doctests) ----

def test_prob_conversions():
    p = LogProb.from_prob(0.5)
    q = LogProb(math.log(0.2))
    o = LogProb.ln_one()
    assert Prob.from_logprob(LogProb(p.ln_add_exp(q) + o)) == pytest.approx(
        0.7, abs=1e-6
    )
    assert Prob.from_phred(PHREDProb.from_prob(0.5)) == pytest.approx(0.5)
    assert float(LogProb.from_phred(PHREDProb(10.0))) == pytest.approx(
        math.log(0.1), abs=1e-9
    )


def test_ln_sum_exp():
    probs = [math.log(0.1), math.log(0.2), math.log(0.3)]
    assert LogProb.ln_sum_exp(probs) == pytest.approx(math.log(0.6), abs=1e-4)  # fastexp approximation
    assert LogProb.ln_sum_exp([]) == float("-inf")
    assert LogProb.ln_sum_exp([float("-inf")] * 3) == float("-inf")


def test_ln_sub_one_minus():
    a = LogProb(math.log(0.5))
    assert a.ln_one_minus_exp() == pytest.approx(math.log(0.5), abs=1e-6)
    b = LogProb(math.log(0.7)).ln_sub_exp(math.log(0.2))
    assert b == pytest.approx(math.log(0.5), abs=1e-6)


def test_cap_numerical_overshoot():
    assert LogProb(1e-7).cap_numerical_overshoot(1e-5) == 0.0
    with pytest.raises(ValueError):
        LogProb(0.1).cap_numerical_overshoot(1e-5)


def test_integration():
    # integrate the uniform density exp(0)=1 over [0, 1] -> 1
    res = LogProb.ln_trapezoidal_integrate_exp(lambda i, v: 0.0, 0.0, 1.0, 11)
    assert res == pytest.approx(0.0, abs=1e-9)
    res = LogProb.ln_simpsons_integrate_exp(lambda i, v: 0.0, 0.0, 1.0, 11)
    assert res == pytest.approx(0.0, abs=1e-9)


# ---- CDF (cdf.rs test_cdf) ----

def test_cdf():
    pmf = [Entry.new(0.0, math.log(0.1))]
    for i in range(9):
        pmf.append(Entry.new(float(i), math.log(0.1)))
    cdf = CDF.from_pmf(list(pmf))
    for e in pmf[2:]:
        assert float(cdf.get_pmf(e.value)) == pytest.approx(
            float(e.prob), abs=3e-6
        )
    assert float(cdf.total_prob()) == pytest.approx(0.0, abs=1e-9)
    assert float(cdf.get(1.0)) == pytest.approx(math.log(0.3), abs=1e-8)
    lo, hi = cdf.credible_interval(0.95)
    assert lo == 0.0
    assert hi == 8.0
    assert cdf.map() == 0.0  # value 0 has mass 0.2, all others 0.1... max
    assert len(cdf) == 9


def test_cdf_moments():
    pmf = [Entry.new(float(v), math.log(0.25)) for v in [1, 2, 3, 4]]
    cdf = CDF.from_pmf(pmf)
    assert cdf.expected_value() == pytest.approx(2.5, abs=1e-6)
    assert cdf.variance() == pytest.approx(1.25, abs=1e-6)
    assert cdf.standard_deviation() == pytest.approx(math.sqrt(1.25), abs=1e-6)


# ---- adaptive integration (adaptive_integration.rs doctest) ----

def test_adaptive_integration():
    def gauss_pdf(x):
        return math.log(math.exp(-0.5 * x * x) / math.sqrt(2 * math.pi))

    integral = ln_integrate_exp(gauss_pdf, -1.0, 1.0, 0.01)
    assert math.exp(integral) == pytest.approx(0.682, abs=0.01)


# ---- Bayesian ----

def test_bayes_factor():
    bf = BayesFactor.new(math.log(0.5), math.log(0.1))
    assert float(bf) == pytest.approx(5.0)
    assert bf.evidence_kass_raftery() == KassRaftery.Positive
    assert BayesFactor(200.0).evidence_kass_raftery() == KassRaftery.VeryStrong
    assert BayesFactor(0.5).evidence_kass_raftery() == KassRaftery.Nothing


def test_expected_fdr():
    peps = [math.log(0.1), float("-inf"), math.log(0.25)]
    fdrs = expected_fdr(peps)
    assert fdrs[1] == float("-inf")
    assert float(fdrs[0]) == pytest.approx(math.log(0.05), abs=1e-9)
    assert float(fdrs[2]) == pytest.approx(math.log(0.35 / 3.0), abs=1e-6)


def test_bayesian_model():
    # coin bias inference over a tiny discrete universe
    class L(Likelihood):
        def compute(self, event, data, payload):
            heads, n = data
            return heads * math.log(event) + (n - heads) * math.log(1 - event)

    class P(Prior):
        def compute(self, event):
            return math.log(1.0 / 3.0)

    class Po(Posterior):
        def compute(self, event, data, joint_prob):
            return float(joint_prob(event, data))

    model = Model(L(), P(), Po())
    universe = [0.25, 0.5, 0.75]
    inst = model.compute(universe, (8, 10))
    assert inst.maximum_posterior() == 0.75
    total = LogProb.ln_sum_exp(
        [float(inst.posterior(e)) for e in universe]
    )
    assert float(total) == pytest.approx(0.0, abs=1e-6)


# ---- combinatorics (combinatorics.rs tests) ----

def test_combinatorics():
    assert combinations(10, 3) == pytest.approx(120.0)
    assert combinations_with_repl(10, 3) == pytest.approx(220.0)
    assert combinations(200, 10) == pytest.approx(22451004309013280.0)
    assert scaled_combinations(150, 80, 1e-5) == pytest.approx(
        6.664_393_816_347_938_4e38, rel=1e-12
    )
    assert combinations(3, 5) == 0.0


# ---- seq_analysis (orf.rs + gc.rs tests) ----

def _basic_finder():
    return Finder([b"ATG"], [b"TGA", b"TAG", b"TAA"], 5)


def test_no_orf():
    assert list(_basic_finder().find_all(b"ACGGCTAGAAAAGGCTAGAAAA")) == []


def test_one_orf_no_offset():
    assert list(_basic_finder().find_all(b"GGGATGGGGTGAGGG")) == [Orf(3, 12, 0)]


def test_one_orf_with_offset():
    assert list(_basic_finder().find_all(b"AGGGATGGGGTGAGGG")) == [Orf(4, 13, 1)]


def test_two_orfs_different_offsets():
    assert list(_basic_finder().find_all(b"ATGGGGTGAGGGGGATGGAAAAATAAG")) == [
        Orf(0, 9, 0),
        Orf(14, 26, 2),
    ]


def test_three_nested_and_offset_orfs():
    got = list(_basic_finder().find_all(b"ATGGGGATGGGGGGATGGAAAAATAAGTAG"))
    assert got == [Orf(14, 26, 2), Orf(0, 30, 0), Orf(6, 30, 0)]


def test_gc_content():
    assert gc_content(b"GATATACA") == pytest.approx(0.25)
    assert gc_content(b"ATAT") == 0.0
    assert gc_content(b"ATGC") == 0.5
    assert gc_content(b"GCGC") == 1.0
    assert gc3_content(b"GATATACA") == pytest.approx(2.0 / 3.0)


def test_gc_content_batch():
    seqs = np.zeros((2, 8), dtype=np.uint8)
    seqs[0, :8] = np.frombuffer(b"GATATACA", dtype=np.uint8)
    seqs[1, :4] = np.frombuffer(b"GCGC", dtype=np.uint8)
    out = gc_content_batch(seqs, np.array([8, 4], dtype=np.int32))
    np.testing.assert_allclose(out, [0.25, 1.0])
