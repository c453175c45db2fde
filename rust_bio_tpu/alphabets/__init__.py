"""Alphabets and rank transforms (reference parity: src/alphabets/).

Host-side symbol bookkeeping plus numpy/JAX-friendly LUT exports: every
alphabet can produce a dense uint8 rank LUT (shape (256,)) suitable for
device-side gathers, which is the TPU-native equivalent of the reference's
``RankTransform`` VecMap.
"""

from rust_bio_tpu.alphabets.core import Alphabet, RankTransform
from rust_bio_tpu.alphabets import dna, protein, rna

__all__ = ["Alphabet", "RankTransform", "dna", "rna", "protein"]
