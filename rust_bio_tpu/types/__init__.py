"""Core bio types: strand and genomic-location annotations.

Equivalent of the reference's external ``bio_types`` crate re-export
(src/lib.rs:258): ``strand::{Strand, ReqStrand}`` and
``annot::contig::Contig`` (the ``Loc`` interface is duck-typed:
``refid``/``start``/``length``/``strand`` attributes).
Alignment/CIGAR types live in ``rust_bio_tpu.alignment.types``.
"""

from rust_bio_tpu.types.strand import ReqStrand, Strand  # noqa: F401
from rust_bio_tpu.types.annot import Contig  # noqa: F401
