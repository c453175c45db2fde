"""Index layer: suffix arrays, BWT/FM-index, q-gram index, rank/select,
wavelet matrix, interval trees, Fenwick trees, bit-packed sequences.

TPU-native redesign of the reference's ``src/data_structures/`` (SURVEY §2.2):
host-side construction (numpy), HBM-resident bit-packed rank arrays and
batched search kernels on device (``fm_device``).
"""

from rust_bio_tpu.data_structures import (  # noqa: F401
    bwt,
    fmindex,
    smallints,
    suffix_array,
)
