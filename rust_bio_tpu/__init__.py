"""rust_bio_tpu — a TPU-native sequence-analysis engine.

A brand-new JAX/XLA/Pallas framework with the capabilities of the
``rust-bio`` bioinformatics library (reference: rust-bio v4.0.1), rebuilt
TPU-first:

- pairwise/banded alignment as batched lockstep DP with anti-diagonal /
  column-scan vectorization (``alignment``, ``ops``)
- FM-index/BWT backward search over HBM-resident packed rank arrays
  (``data_structures``)
- Myers bit-parallel approximate matching over batched u32 lanes
  (``pattern_matching``)
- PairHMM forward probability in log space (``stats``)
- data-parallel scale-out over ``jax.sharding.Mesh`` (``parallel``)

Layer map mirrors the reference (see SURVEY.md §1):
L1 utils, L2 alphabets, L3 scores/stats.probs, L4 io, L5 data_structures,
L6 alignment/pattern_matching/stats/seq_analysis.
"""

__version__ = "0.1.0"

from rust_bio_tpu import (  # noqa: F401
    alignment,
    alphabets,
    data_structures,
    io,
    parallel,
    pattern_matching,
    scores,
    seq_analysis,
    stats,
    types,
    utils,
)
