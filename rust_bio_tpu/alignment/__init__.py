"""Sequence alignment algorithms (reference parity: src/alignment/)."""

from rust_bio_tpu.alignment import distance, poa, sparse  # noqa: F401
from rust_bio_tpu.alignment.pairwise import banded  # noqa: F401
from rust_bio_tpu.alignment.types import (
    Alignment,
    AlignmentMode,
    AlignmentOperation,
    Del,
    Ins,
    Match,
    Subst,
    Xclip,
    Yclip,
)

__all__ = [
    "Alignment",
    "AlignmentMode",
    "AlignmentOperation",
    "Match",
    "Subst",
    "Del",
    "Ins",
    "Xclip",
    "Yclip",
]
