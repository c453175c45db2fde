"""Genomic location annotations (bio_types::annot equivalents).

A "Loc" is anything with ``refid``, ``start``, ``length`` and ``strand``
attributes; ``Contig`` is the concrete contiguous region type.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional


@dataclass(frozen=True)
class Contig:
    """A contiguous region on a named reference sequence."""

    refid: Any
    start: int
    length: int
    strand: Any = None

    @classmethod
    def new(cls, refid, start: int, length: int, strand=None) -> "Contig":
        return cls(refid, start, length, strand)

    @property
    def end(self) -> int:
        return self.start + self.length

    def contains(self, pos: int) -> bool:
        return self.start <= pos < self.end

    def __str__(self) -> str:
        s = f"{self.refid}:{self.start}-{self.end}"
        if self.strand is not None:
            sym = getattr(self.strand, "strand_symbol", lambda: str(self.strand))()
            s += f"({sym})"
        return s
