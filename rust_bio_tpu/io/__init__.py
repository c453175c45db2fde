"""I/O layer: FASTA/FASTQ/FASTX, BED/BEDPE, GFF/GTF, Newick.

Reference parity: src/io/ (SURVEY §2.5). Host-side parsing (buffered /
mmap), with ``batch`` providing the TPU-native padded/bucketed batching of
records into device-ready arrays — the layer the reference does not have.
"""

from rust_bio_tpu.io import bed, bedpe, fasta, fastq, fastx, gff, newick  # noqa: F401
