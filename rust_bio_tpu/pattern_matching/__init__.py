"""Pattern matching: Myers bit-parallel, classic automata, PSSM.

TPU-native redesign of the reference's ``src/pattern_matching/``
(SURVEY §2.3): exact scalar oracles host-side, batched bit-parallel device
kernels for the throughput paths (``myers_device``).
"""

from rust_bio_tpu.pattern_matching import (  # noqa: F401
    bndm,
    bom,
    horspool,
    kmp,
    pssm,
    shift_and,
    ukkonen,
)
from rust_bio_tpu.pattern_matching.myers import Myers, MyersBuilder  # noqa: F401
