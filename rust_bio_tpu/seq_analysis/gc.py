"""GC content (vectorized).

Reference parity: src/seq_analysis/gc.rs — ``gc_content`` (:39),
``gc3_content`` (:59); f32 result like the reference.
"""

from __future__ import annotations

import numpy as np

from rust_bio_tpu.utils.text import to_array

_IS_GC = np.zeros(256, dtype=bool)
for _c in b"cgGC":
    _IS_GC[_c] = True


def _gcn_content(sequence, step: int) -> float:
    arr = to_array(sequence)[::step]
    if len(arr) == 0:
        return float("nan")
    return float(np.float32(np.count_nonzero(_IS_GC[arr])) / np.float32(len(arr)))


def gc_content(sequence) -> float:
    """Fraction of G/C bases.

    >>> gc_content(b"GATATACA")
    0.25
    """
    return _gcn_content(sequence, 1)


def gc3_content(sequence) -> float:
    """Fraction of G/C among every 3rd base (codon wobble position).

    >>> round(gc3_content(b"GATATACA"), 6)
    0.666667
    """
    return _gcn_content(sequence, 3)


def gc_content_batch(seqs: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Vectorized GC content over a padded (B, L) batch."""
    mask = np.arange(seqs.shape[1])[None, :] < lens[:, None]
    gc = _IS_GC[seqs] & mask
    return gc.sum(axis=1).astype(np.float32) / np.maximum(lens, 1).astype(
        np.float32
    )
