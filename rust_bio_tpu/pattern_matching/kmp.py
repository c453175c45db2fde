"""Knuth-Morris-Pratt exact pattern matching.

Reference parity: src/pattern_matching/kmp.rs — lps failure function (:147
test values), ``delta`` automaton (:48-58), ``find_all`` start-position
iterator (:60-93).
"""

from __future__ import annotations

from typing import Iterator, List

from rust_bio_tpu.utils.text import to_bytes


def lps(pattern: bytes) -> List[int]:
    """Longest-proper-prefix-suffix failure function."""
    m = len(pattern)
    out = [0] * m
    k = 0
    for i in range(1, m):
        while k > 0 and pattern[i] != pattern[k]:
            k = out[k - 1]
        if pattern[i] == pattern[k]:
            k += 1
        out[i] = k
    return out


class KMP:
    """KMP matcher.

    >>> kmp = KMP(b"abbab")
    >>> list(kmp.find_all(b"aaaaabbabbbbbbbabbab"))
    [4, 15]
    """

    def __init__(self, pattern) -> None:
        self.pattern = to_bytes(pattern)
        self.m = len(self.pattern)
        self.lps = lps(self.pattern)

    def delta(self, q: int, a: int) -> int:
        while q == self.m or (self.pattern[q] != a and q > 0):
            q = self.lps[q - 1]
        if self.pattern[q] == a:
            q += 1
        return q

    def find_all(self, text) -> Iterator[int]:
        """Start positions of all (possibly overlapping) matches."""
        t = to_bytes(text)
        q = 0
        for i, a in enumerate(t):
            q = self.delta(q, a)
            if q == self.m:
                yield i - self.m + 1
