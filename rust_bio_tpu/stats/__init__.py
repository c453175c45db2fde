"""Statistics layer: log-space probabilities, PairHMM, HMM, Bayesian models.

TPU-native redesign of the reference's ``src/stats/`` (SURVEY §2.4): the
``LogProb`` substrate is an exact scalar oracle plus vectorized numpy/JAX
helpers; the PairHMM forward pass has a batched device kernel.
"""

from rust_bio_tpu.stats.probs import (  # noqa: F401
    LogProb,
    PHREDProb,
    Prob,
)
from rust_bio_tpu.stats import bayesian, combinatorics, hmm, pairhmm  # noqa: F401
