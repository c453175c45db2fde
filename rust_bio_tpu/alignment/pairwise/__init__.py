"""Pairwise sequence alignment (reference parity: src/alignment/pairwise/).

Three layers:

- :mod:`scoring` — the affine-gap + clip scoring model (``Scoring``,
  ``MIN_SCORE``), shared by every execution path.
- :mod:`scalar` — an exact sequential implementation of the generalized
  Smith-Waterman with clip penalties. This is the semantic oracle: every
  vectorized/batched path is property-tested against it.
- :mod:`batched` — the TPU production path: a batch-lockstep, column-scan
  vectorized DP (reads in vector lanes, query positions in sublanes, the
  in-column insertion recurrence as a (max,+) prefix scan) producing
  bit-identical scores, operations and CIGARs.

Gap model (reference: pairwise/mod.rs:9-15, v4.0 semantics):
``GapScore(k) = gap_open + gap_extend * (k - 1)``.
"""

from rust_bio_tpu.alignment.pairwise.scoring import (
    MIN_SCORE,
    MatchParams,
    Scoring,
)
from rust_bio_tpu.alignment.pairwise.scalar import Aligner
from rust_bio_tpu.alignment.pairwise.batched import BatchAligner
from rust_bio_tpu.alignment.pairwise.banded_device import BatchBandedAligner

__all__ = [
    "MIN_SCORE",
    "MatchParams",
    "Scoring",
    "Aligner",
    "BatchAligner",
    "BatchBandedAligner",
]
