"""Classical q-gram index.

Reference parity: src/data_structures/qgram_index.rs — prefix-sum bucket
table + position array (:55-112), ``qgram_matches`` (:119), ``matches``
diagonal count filter (:127), ``exact_matches`` interval merging (:166),
``with_max_count`` masking of over-frequent q-grams (:66).

TPU-native take: construction is vectorized numpy (bincount + argsort);
the address/pos layout is identical to the reference and device-ready
(both arrays are flat int arrays suitable for HBM residence + gather).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List

import numpy as np

from rust_bio_tpu.alphabets import Alphabet, RankTransform
from rust_bio_tpu.utils.text import to_array


@dataclass(frozen=True)
class Interval:
    """Half-open [start, stop) interval (qgram_index.rs:214)."""

    start: int
    stop: int

    def get(self, text) -> bytes:
        return bytes(to_array(text)[self.start : self.stop].tobytes())


@dataclass
class Match:
    """Pattern/text diagonal sharing >= min_count q-grams (qgram_index.rs:228)."""

    pattern: Interval
    text: Interval
    count: int


@dataclass
class ExactMatch:
    """An exact substring match of length >= q (qgram_index.rs:250)."""

    pattern: Interval
    text: Interval


class QGramIndex:
    def __init__(self, q: int, text, alphabet: Alphabet, max_count: int = None) -> None:
        if max_count is None:
            max_count = 1 << 62
        self.q = int(q)
        self.ranks = RankTransform(alphabet)
        arr = to_array(text)
        qgram_count = len(alphabet) ** self.q

        qgrams = self._qgram_codes(arr).astype(np.int64)
        counts = np.bincount(qgrams, minlength=qgram_count).astype(np.int64)
        counts[counts > max_count] = 0  # mask over-frequent q-grams

        address = np.zeros(qgram_count + 1, dtype=np.int64)
        np.cumsum(counts, out=address[1:])
        keep = counts[qgrams] > 0
        order = np.argsort(qgrams[keep], kind="stable")
        self.pos = np.nonzero(keep)[0][order].astype(np.int64)
        self.address = address

    @classmethod
    def new(cls, q: int, text, alphabet: Alphabet) -> "QGramIndex":
        return cls(q, text, alphabet)

    @classmethod
    def with_max_count(
        cls, q: int, text, alphabet: Alphabet, max_count: int
    ) -> "QGramIndex":
        return cls(q, text, alphabet, max_count)

    def _qgram_codes(self, arr: np.ndarray) -> np.ndarray:
        """Rolling bit-packed q-gram ranks (alphabets::RankTransform::qgrams)."""
        return self.ranks.qgrams(self.q, arr)

    def qgram_matches(self, qgram: int) -> np.ndarray:
        """Text positions of a q-gram code; O(1) (qgram_index.rs:119)."""
        return self.pos[self.address[qgram] : self.address[qgram + 1]]

    def matches(self, pattern, min_count: int) -> List[Match]:
        q = self.q
        arr = to_array(pattern)
        diagonals: Dict[int, Match] = {}
        for i, qgram in enumerate(self._qgram_codes(arr)):
            for p in self.qgram_matches(int(qgram)):
                p = int(p)
                d = p - i
                m = diagonals.get(d)
                if m is None:
                    diagonals[d] = Match(
                        Interval(i, i + q), Interval(p, p + q), 1
                    )
                else:
                    m.pattern = Interval(m.pattern.start, i + q)
                    m.text = Interval(m.text.start, p + q)
                    m.count += 1
        return [m for m in diagonals.values() if m.count >= min_count]

    def exact_matches(self, pattern) -> List[ExactMatch]:
        q = self.q
        arr = to_array(pattern)
        diagonals: Dict[int, ExactMatch] = {}
        out: List[ExactMatch] = []
        for i, qgram in enumerate(self._qgram_codes(arr)):
            for p in self.qgram_matches(int(qgram)):
                p = int(p)
                d = p - i
                m = diagonals.get(d)
                if m is None:
                    diagonals[d] = ExactMatch(
                        Interval(i, i + q), Interval(p, p + q)
                    )
                else:
                    if m.pattern.stop - q + 1 != i:
                        out.append(
                            ExactMatch(m.pattern, m.text)
                        )
                        m.pattern = Interval(i, i + q)
                        m.text = Interval(p, p + q)
                    else:
                        m.pattern = Interval(m.pattern.start, i + q)
                        m.text = Interval(m.text.start, p + q)
        out.extend(diagonals.values())
        return out
