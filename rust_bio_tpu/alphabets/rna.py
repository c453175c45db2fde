"""RNA alphabet with complement/revcomp LUTs (reference: src/alphabets/rna.rs)."""

from __future__ import annotations

import numpy as np

from rust_bio_tpu.alphabets.core import Alphabet
from rust_bio_tpu.utils.text import TextLike, to_array


def alphabet() -> Alphabet:
    """The RNA alphabet (uppercase and lowercase). rna.rs:23"""
    return Alphabet(b"ACGUacgu")


def n_alphabet() -> Alphabet:
    """The RNA alphabet including N. rna.rs:28"""
    return Alphabet(b"ACGUNacgun")


def iupac_alphabet() -> Alphabet:
    """The IUPAC RNA alphabet. rna.rs:33"""
    return Alphabet(b"ACGURYSWKMBDHVNZacguryswkmbdhvnz")


def _build_complement() -> np.ndarray:
    comp = np.arange(256, dtype=np.uint8)
    for a, b in zip(b"AGCUYRWSKMDVHBNZ", b"UCGARYWSMKHBDVNZ"):
        comp[a] = b
        comp[a + 32] = b + 32
    return comp


COMPLEMENT: np.ndarray = _build_complement()


def complement(a):
    """Complement of an RNA symbol (IUPAC supported; case preserved)."""
    if np.isscalar(a) or isinstance(a, int):
        return int(COMPLEMENT[a])
    return COMPLEMENT[to_array(a)]


def revcomp(text: TextLike) -> bytes:
    """Reverse complement of an RNA text."""
    arr = to_array(text)
    return COMPLEMENT[arr][::-1].tobytes()
