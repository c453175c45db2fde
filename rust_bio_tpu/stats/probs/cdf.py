"""Log-space discrete cumulative distribution function.

Reference parity: src/stats/probs/cdf.rs — ``Entry`` (:133), ``from_pmf``
sort+cumsum with overshoot capping (:154), ``reduce`` (:195), ``sample``
(:215), ``iter_pmf`` (:242), ``get``/``get_pmf`` binary search (:262,282),
``total_prob`` (:308), ``map`` MAP estimate (:315), ``credible_interval``
(:336), ``expected_value``/``variance``/``standard_deviation`` (:383-404).
"""

from __future__ import annotations

import bisect
import math
from dataclasses import dataclass
from typing import Generic, Iterator, List, Optional, Tuple, TypeVar

from rust_bio_tpu.stats.probs import LogProb

T = TypeVar("T")


@dataclass
class Entry(Generic[T]):
    value: T
    prob: LogProb

    @classmethod
    def new(cls, value, prob) -> "Entry":
        return cls(value, LogProb(prob))


class CDF(Generic[T]):
    def __init__(self, inner: List[Entry]) -> None:
        self.inner = inner

    @classmethod
    def from_pmf(cls, entries: List[Entry]) -> "CDF":
        entries = sorted(entries, key=lambda e: e.value)
        inner: List[Entry] = []
        for e in entries:
            last = inner[-1].prob if inner else LogProb.ln_zero()
            p = LogProb(last).ln_add_exp(e.prob)
            if inner and inner[-1].value == e.value:
                inner[-1].prob = p
            else:
                inner.append(Entry(e.value, p))
        for e in inner:
            e.prob = LogProb(e.prob).cap_numerical_overshoot(0.00001)
        return cls(inner)

    @classmethod
    def from_cdf(cls, entries) -> "CDF":
        return cls(list(entries))

    def reduce(self) -> "CDF":
        inner: List[Entry] = []
        last = LogProb.ln_zero()
        for e in self.inner:
            if last != e.prob:
                last = e.prob
                inner.append(e)
        return CDF(inner)

    def sample(self, n: int) -> "CDF":
        assert n > 1
        if len(self.inner) <= n:
            return self
        s = len(self.inner) // (n - 1)
        last = self.inner[-1]
        inner = self.inner[:-1][::s]
        inner.append(last)
        return CDF(inner)

    def iter(self) -> Iterator[Entry]:
        return iter(self.inner)

    def __iter__(self) -> Iterator[Entry]:
        return iter(self.inner)

    def iter_pmf(self) -> Iterator[Entry]:
        last = LogProb.ln_zero()
        for e in self.inner:
            prob = LogProb(e.prob).ln_sub_exp(last)
            last = e.prob
            yield Entry(e.value, prob)

    def _values(self) -> List:
        return [e.value for e in self.inner]

    def get(self, value) -> Optional[LogProb]:
        if not self.inner:
            return None
        values = self._values()
        i = bisect.bisect_right(values, value)
        if i > 0 and values[i - 1] == value:
            return self.inner[i - 1].prob
        if i > 0:
            return self.inner[i - 1].prob
        return LogProb.ln_zero()

    def get_pmf(self, value) -> Optional[LogProb]:
        if not self.inner:
            return None
        values = self._values()
        i = bisect.bisect_left(values, value)
        if i < len(values) and values[i] == value:
            if i > 0:
                return LogProb(self.inner[i].prob).ln_sub_exp(
                    self.inner[i - 1].prob
                )
            return self.inner[0].prob
        if i > 0:
            return self.inner[i - 1].prob
        return LogProb.ln_zero()

    def total_prob(self) -> LogProb:
        return self.inner[-1].prob if self.inner else LogProb.ln_zero()

    def map(self) -> Optional[T]:
        best = None
        for e in self.iter_pmf():
            if best is None or e.prob >= best.prob:
                best = e
        return best.value if best is not None else None

    def credible_interval(self, width: float) -> Optional[Tuple[T, T]]:
        assert 0.0 <= width <= 1.0
        if not self.inner:
            return None
        margin = 1.0 - width
        p_lower = math.log(margin / 2.0) if margin > 0 else float("-inf")
        p_upper = (
            math.log(1.0 - margin / 2.0) if margin < 2.0 else 0.0
        )
        probs = [float(e.prob) for e in self.inner]
        lower = bisect.bisect_left(probs, p_lower)
        if lower >= len(probs) or probs[lower] != p_lower:
            lower = lower - 1 if lower > 0 else 0
        upper = bisect.bisect_left(probs, p_upper)
        if upper == len(self.inner):
            upper -= 1
        return self.inner[lower].value, self.inner[upper].value

    def __len__(self) -> int:
        return len(self.inner)

    def is_empty(self) -> bool:
        return not self.inner

    def expected_value(self) -> float:
        return sum(
            float(e.value) * math.exp(e.prob) for e in self.iter_pmf()
        )

    def variance(self) -> float:
        ev = self.expected_value()
        return sum(
            (float(e.value) - ev) ** 2 * math.exp(e.prob)
            for e in self.iter_pmf()
        )

    def standard_deviation(self) -> float:
        return math.sqrt(self.variance())
