"""BNDM exact pattern matching (backward nondeterministic DAWG).

Reference parity: src/pattern_matching/bndm.rs:27-108 — reversed-pattern
suffix automaton masks, window scan with last-suffix shift. The m < 64
limit is lifted (unbounded Python ints).
"""

from __future__ import annotations

from typing import Iterator

from rust_bio_tpu.pattern_matching.shift_and import masks
from rust_bio_tpu.utils.text import to_bytes


class BNDM:
    """BNDM matcher.

    >>> bndm = BNDM(b"GAAAA")
    >>> list(bndm.find_all(b"ACGGCTAGAAAAGGCTAGAAAA"))
    [7, 17]
    """

    def __init__(self, pattern) -> None:
        p = to_bytes(pattern)
        self.m = len(p)
        self.masks, self.accept = masks(p[::-1])

    def find_all(self, text) -> Iterator[int]:
        t = to_bytes(text)
        m = self.m
        window = m
        n = len(t)
        while window <= n:
            occ = None
            active = (1 << m) - 1
            j, lastsuffix = 1, 0
            while active != 0:
                active &= self.masks[t[window - j]]
                if active & self.accept:
                    if j == m:
                        occ = window - m
                        break
                    lastsuffix = j
                j += 1
                active = (active << 1) & ((1 << m) - 1)
            window += m - lastsuffix
            if occ is not None:
                yield occ
