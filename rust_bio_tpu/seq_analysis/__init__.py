"""Sequence analysis: ORF finding and GC content (SURVEY §2.6)."""

from rust_bio_tpu.seq_analysis import gc, orf  # noqa: F401
