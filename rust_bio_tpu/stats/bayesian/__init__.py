"""Bayesian statistical modelling utilities.

Reference parity: src/stats/bayesian/ — ``Model``/``ModelInstance`` trait
system (model.rs:21-262), ``BayesFactor`` with Kass-Raftery evidence scale
(bayes_factors.rs:39-60), ``expected_fdr`` (mod.rs:28-46).
"""

from __future__ import annotations

import math
from enum import Enum
from typing import Callable, Dict, Iterable, List, Optional, Sequence, Tuple

from rust_bio_tpu.stats.probs import LogProb

__all__ = [
    "Likelihood",
    "Prior",
    "Posterior",
    "Marginal",
    "Model",
    "ModelInstance",
    "BayesFactor",
    "KassRaftery",
    "expected_fdr",
]


class Likelihood:
    """Likelihood model interface (model.rs:21)."""

    def compute(self, event, data, payload) -> float:
        raise NotImplementedError


class Prior:
    """Prior model interface (model.rs:31)."""

    def compute(self, event) -> float:
        raise NotImplementedError


class Posterior:
    """Posterior model interface (model.rs:38).

    ``compute(event, data, joint_prob)`` receives a callable
    ``joint_prob(base_event, data) -> LogProb``.
    """

    def compute(self, event, data, joint_prob) -> float:
        raise NotImplementedError


class Marginal:
    """Marginal exploration interface (model.rs:191)."""

    def compute(self, data, joint_prob) -> float:
        raise NotImplementedError


class ModelInstance:
    """Computed posteriors/marginal for an event universe (model.rs:206)."""

    def __init__(self, joint_probs, posterior_probs, marginal) -> None:
        self.joint_probs: Dict = joint_probs
        self.posterior_probs: Dict = posterior_probs
        self._marginal = marginal

    def posterior(self, event) -> Optional[LogProb]:
        p = self.posterior_probs.get(event)
        if p is None:
            return None
        return LogProb(p - self._marginal)

    def marginal(self) -> LogProb:
        return LogProb(self._marginal)

    def maximum_posterior(self):
        if not self.joint_probs:
            return None
        return max(self.joint_probs.items(), key=lambda kv: kv[1])[0]

    def event_posteriors(self) -> List[Tuple[object, LogProb]]:
        return sorted(
            (
                (event, LogProb(p - self._marginal))
                for event, p in self.joint_probs.items()
            ),
            key=lambda kv: -kv[1],
        )

    def expected_value(self) -> float:
        return sum(float(e) * p for e, p in self.joint_probs.items())


class Model:
    """Bayesian model = likelihood + prior + posterior (model.rs:59)."""

    def __init__(
        self, likelihood: Likelihood, prior: Prior, posterior: Posterior,
        payload_factory: Callable[[], object] = dict,
    ) -> None:
        self.likelihood = likelihood
        self.prior = prior
        self.posterior = posterior
        self._payload_factory = payload_factory

    def joint_prob(self, event, data, payload) -> float:
        return float(self.prior.compute(event)) + float(
            self.likelihood.compute(event, data, payload)
        )

    def compute(self, universe: Iterable, data) -> ModelInstance:
        joint_probs: Dict = {}
        payload = self._payload_factory()

        def joint_prob(event, d):
            p = self.joint_prob(event, d, payload)
            joint_probs[event] = p
            return LogProb(p)

        posterior_probs = {
            event: float(self.posterior.compute(event, data, joint_prob))
            for event in universe
        }
        marginal = LogProb.ln_sum_exp(list(posterior_probs.values()))
        return ModelInstance(joint_probs, posterior_probs, float(marginal))

    def compute_from_marginal(self, marginal: Marginal, data) -> ModelInstance:
        joint_probs: Dict = {}
        posterior_probs: Dict = {}
        payload = self._payload_factory()

        def joint_prob(event, d):
            p = self.joint_prob(event, d, payload)
            joint_probs[event] = p
            return LogProb(p)

        def joint_prob_posterior(event, d):
            p = float(self.posterior.compute(event, d, joint_prob))
            posterior_probs[event] = p
            return LogProb(p)

        m = float(marginal.compute(data, joint_prob_posterior))
        return ModelInstance(joint_probs, posterior_probs, m)


class KassRaftery(Enum):
    """Evidence scale (Kass & Raftery 1995; bayes_factors.rs)."""

    Nothing = "none"
    Barely = "barely"
    Positive = "positive"
    Strong = "strong"
    VeryStrong = "very-strong"


class BayesFactor(float):
    """Bayes factor newtype (bayes_factors.rs:39)."""

    def __new__(cls, k: float = 0.0):
        return super().__new__(cls, k)

    @classmethod
    def new(cls, a: float, b: float) -> "BayesFactor":
        return cls(math.exp(float(a) - float(b)))

    def evidence_kass_raftery(self) -> KassRaftery:
        k = float(self)
        if k <= 1.0:
            return KassRaftery.Nothing
        if k <= 3.0:
            return KassRaftery.Barely
        if k <= 20.0:
            return KassRaftery.Positive
        if k <= 150.0:
            return KassRaftery.Strong
        return KassRaftery.VeryStrong


def expected_fdr(peps: Sequence[float]) -> List[LogProb]:
    """Expected FDR per PEP threshold (Müller et al. 2006; mod.rs:28)."""
    sorted_idx = sorted(range(len(peps)), key=lambda i: float(peps[i]))
    out = [LogProb.ln_zero()] * len(peps)
    for j, (expected_fp, i) in enumerate(
        zip(LogProb.ln_cumsum_exp(peps[i] for i in sorted_idx), sorted_idx)
    ):
        fdr = LogProb(float(expected_fp) - math.log(j + 1))
        out[i] = fdr if fdr <= 0.0 else LogProb.ln_one()
    return out
