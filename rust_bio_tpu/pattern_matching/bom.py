"""Backward Oracle Matching (factor-oracle automaton).

Reference parity: src/pattern_matching/bom.rs:30-143 — oracle built on the
reversed pattern, delta transitions in sparse per-state maps, window scan.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional

from rust_bio_tpu.utils.text import to_bytes


class BOM:
    """BOM matcher.

    >>> bom = BOM(b"GAAAA")
    >>> list(bom.find_all(b"ACGGCTAGGAAAAAGACTGAGGACTGAAAA"))
    [8, 25]
    """

    def __init__(self, pattern) -> None:
        p = to_bytes(pattern)
        assert len(p) > 0, "Expecting non-empty pattern."
        self.m = len(p)
        table: List[Dict[int, int]] = []
        suff: List[Optional[int]] = [None] * (self.m + 1)
        for j, a in enumerate(p[::-1]):
            i = j + 1
            delta: Dict[int, int] = {a: i}
            k = suff[i - 1]
            while k is not None:
                if a in table[k]:
                    break
                table[k][a] = i
                k = suff[k]
            suff[i] = table[k][a] if k is not None else 0
            table.append(delta)
        self.table = table

    def delta(self, q: int, a: int) -> Optional[int]:
        if q >= len(self.table):
            return None
        return self.table[q].get(a)

    def find_all(self, text) -> Iterator[int]:
        t = to_bytes(text)
        window = self.m
        n = len(t)
        while window <= n:
            q: Optional[int] = 0
            j = 1
            while j <= self.m:
                if q is None:
                    break
                q = self.delta(q, t[window - j])
                j += 1
            i = window - self.m
            window += self.m + 2 - j
            if q is not None:
                yield i
