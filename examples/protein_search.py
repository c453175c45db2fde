"""Batched BLOSUM62 protein alignment on the transposed Pallas engine.

Usage: python examples/protein_search.py

Aligns a query batch against a target batch globally with full tracebacks;
arbitrary LUT scorings ride the same fast path as DNA (packed subs stream).
"""

from rust_bio_tpu.alignment.pairwise.batched import BatchAligner
from rust_bio_tpu.alignment.pairwise.scoring import Scoring
from rust_bio_tpu.scores import blosum62

queries = [b"MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQ", b"MSDNLKQHE"]
targets = [b"MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQAPILSRVGDGTQDNLSGAEKAVQ",
           b"MADNLKQHEWWT"]

aligner = BatchAligner(Scoring.new(-11, -1, blosum62))
for aln, q, t in zip(aligner.semiglobal(queries, targets), queries, targets):
    print(f"score={aln.score} cigar={aln.cigar()}")
    print(aln.pretty(q, t))


if __name__ == "__main__":
    pass
