"""Ukkonen's bounded column-pruned approximate matching, O(nk).

Reference parity: src/pattern_matching/ukkonen.rs — ``unit_cost`` (:35),
``Ukkonen::with_capacity`` (:55), ``find_all_end`` yielding (end, dist)
pairs with the lastk band maintenance (:65-146).
"""

from __future__ import annotations

from typing import Callable, Iterator, Tuple

from rust_bio_tpu.utils.text import to_bytes


def unit_cost(a: int, b: int) -> int:
    return int(a != b)


class Ukkonen:
    """Bounded Ukkonen matcher.

    >>> u = Ukkonen.with_capacity(10, unit_cost)
    >>> list(u.find_all_end(b"TGAGCGT", b"ACCGTGGATGAGCGCCATAG", 1))
    [(13, 1), (14, 1)]
    """

    def __init__(self, cost: Callable[[int, int], int] = unit_cost) -> None:
        self.cost = cost

    @classmethod
    def with_capacity(cls, m: int, cost: Callable[[int, int], int]) -> "Ukkonen":
        return cls(cost)

    def find_all_end(
        self, pattern, text, k: int
    ) -> Iterator[Tuple[int, int]]:
        p = to_bytes(pattern)
        t = to_bytes(text)
        m = len(p)
        cost = self.cost
        D = [[k + 1] * (m + 1), list(range(m + 1))]
        lastk = min(k, m)
        for i, c in enumerate(t):
            # columns alternate; D[1] holds the virtual column for i = -1
            col = i % 2
            prev = 1 - col
            D[col][0] = 0
            lastk = min(lastk + 1, m)
            for j in range(1, lastk + 1):
                D[col][j] = min(
                    D[prev][j] + 1,
                    D[col][j - 1] + 1,
                    D[prev][j - 1] + cost(p[j - 1], c),
                )
            while D[col][lastk] > k:
                lastk -= 1
            if lastk == m:
                yield i, D[col][m]
