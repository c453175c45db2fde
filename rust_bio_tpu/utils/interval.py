"""Genomic interval newtype (reference parity: src/utils/interval/mod.rs).

An ``Interval`` is a half-open range ``[start, end)`` that is guaranteed to
satisfy ``start <= end`` on construction.
"""

from __future__ import annotations

from dataclasses import dataclass


class IntervalError(ValueError):
    """end < start (reference: utils::interval::Error)."""


@dataclass(frozen=True, order=True)
class Interval:
    start: int
    end: int

    def __post_init__(self) -> None:
        if self.end < self.start:
            raise IntervalError(
                f"invalid interval: end ({self.end}) < start ({self.start})"
            )

    @classmethod
    def new(cls, start: int, end: int) -> "Interval":
        return cls(start, end)

    def __len__(self) -> int:
        return self.end - self.start

    def __contains__(self, pos: int) -> bool:
        return self.start <= pos < self.end

    def overlaps(self, other: "Interval") -> bool:
        return self.start < other.end and other.start < self.end

    def contains_interval(self, other: "Interval") -> bool:
        return self.start <= other.start and other.end <= self.end

    @property
    def range(self) -> range:
        return range(self.start, self.end)
