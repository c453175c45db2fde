"""Boyer-Moore-Horspool exact pattern matching.

Reference parity: src/pattern_matching/horspool.rs:45-113 — shift table
(m for absent symbols, m-1-j otherwise), last-symbol-anchored window scan.
"""

from __future__ import annotations

from typing import Iterator

from rust_bio_tpu.utils.text import to_bytes


class Horspool:
    """Horspool matcher.

    >>> h = Horspool(b"GAAAA")
    >>> list(h.find_all(b"ACGGCTAGGAAAAAGACTGAGGACTGAAAA"))
    [8, 25]
    """

    def __init__(self, pattern) -> None:
        p = to_bytes(pattern)
        m = len(p)
        shift = [m] * 256
        for j, a in enumerate(p[: m - 1]):
            shift[a] = m - 1 - j
        self.pattern = p
        self.m = m
        self.shift = shift

    def find_all(self, text) -> Iterator[int]:
        t = to_bytes(text)
        n = len(t)
        m = self.m
        last = m - 1
        pattern_last = self.pattern[m - 1]
        while True:
            while last < n and t[last] != pattern_last:
                last += self.shift[t[last]]
            if last >= n:
                return
            i = last + 1 - m
            j = last
            last += self.shift[pattern_last]
            if t[i:j] == self.pattern[: m - 1]:
                yield i
