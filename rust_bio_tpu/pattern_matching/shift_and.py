"""Shift-And exact pattern matching (bit-parallel NFA simulation).

Reference parity: src/pattern_matching/shift_and.rs — ``masks`` (:65-81),
``find_all`` (:50-63, start positions), m < 64 limit (:42; lifted here —
Python ints are unbounded, matching the spirit of the 4.0.1 fix).
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

from rust_bio_tpu.utils.text import to_bytes


def masks(pattern: bytes) -> Tuple[List[int], int]:
    """Per-symbol bit masks and the accept-state mask."""
    out = [0] * 256
    bit = 1
    for c in pattern:
        out[c] |= bit
        bit <<= 1
    return out, bit >> 1


class ShiftAnd:
    """Shift-And matcher.

    >>> sa = ShiftAnd(b"AAAA")
    >>> list(sa.find_all(b"ACGGCTAGAAAAGGGCG"))
    [8]
    """

    def __init__(self, pattern) -> None:
        p = to_bytes(pattern)
        self.m = len(p)
        self.masks, self.accept = masks(p)

    def find_all(self, text) -> Iterator[int]:
        t = to_bytes(text)
        active = 0
        for i, c in enumerate(t):
            active = ((active << 1) | 1) & self.masks[c]
            if active & self.accept:
                yield i - self.m + 1
