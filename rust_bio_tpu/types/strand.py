"""Strand types (bio_types::strand equivalents)."""

from __future__ import annotations

from enum import Enum


class Strand(Enum):
    Forward = "+"
    Reverse = "-"
    Unknown = "."

    @classmethod
    def from_char(cls, c: str) -> "Strand":
        if c == "+":
            return cls.Forward
        if c == "-":
            return cls.Reverse
        if c in (".", "?"):
            return cls.Unknown
        raise ValueError(f"invalid strand character {c!r}")

    def strand_symbol(self) -> str:
        return self.value

    def is_unknown(self) -> bool:
        return self is Strand.Unknown


class ReqStrand(Enum):
    """A strand that must be known (bio_types::strand::ReqStrand)."""

    Forward = "+"
    Reverse = "-"

    @classmethod
    def from_char(cls, c: str) -> "ReqStrand":
        if c == "+":
            return cls.Forward
        if c == "-":
            return cls.Reverse
        raise ValueError(f"invalid strand character {c!r}")

    def strand_symbol(self) -> str:
        return self.value
