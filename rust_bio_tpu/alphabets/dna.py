"""DNA alphabet with complement/revcomp LUTs (reference: src/alphabets/dna.rs).

``COMPLEMENT`` is a (256,) uint8 LUT so revcomp of a device-resident batch is
a gather + reverse — the TPU-native form of the reference's per-byte LUT.
"""

from __future__ import annotations

import numpy as np

from rust_bio_tpu.alphabets.core import Alphabet
from rust_bio_tpu.utils.text import TextLike, to_array


def alphabet() -> Alphabet:
    """The DNA alphabet (uppercase and lowercase). dna.rs:23"""
    return Alphabet(b"ACGTacgt")


def n_alphabet() -> Alphabet:
    """The DNA alphabet including N. dna.rs:28"""
    return Alphabet(b"ACGTNacgtn")


def iupac_alphabet() -> Alphabet:
    """The IUPAC DNA alphabet. dna.rs:33"""
    return Alphabet(b"ACGTRYSWKMBDHVNZacgtryswkmbdhvnz")


def _build_complement() -> np.ndarray:
    comp = np.arange(256, dtype=np.uint8)
    for a, b in zip(b"AGCTYRWSKMDVHBN", b"TCGARYWSMKHBDVN"):
        comp[a] = b
        comp[a + 32] = b + 32
    return comp


COMPLEMENT: np.ndarray = _build_complement()


def complement(a):
    """Complement of a DNA symbol (IUPAC supported; case preserved). dna.rs:67"""
    if np.isscalar(a) or isinstance(a, int):
        return int(COMPLEMENT[a])
    return COMPLEMENT[to_array(a)]


def revcomp(text: TextLike) -> bytes:
    """Reverse complement of a DNA text. dna.rs:83"""
    arr = to_array(text)
    return COMPLEMENT[arr][::-1].tobytes()


def revcomp_array(text: TextLike) -> np.ndarray:
    """Reverse complement as a uint8 array (batch/device-feed form)."""
    arr = to_array(text)
    return COMPLEMENT[arr][::-1].copy()
