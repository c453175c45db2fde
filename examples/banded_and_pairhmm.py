"""Banded batch alignment + score-exact PairHMM likelihoods.

Usage: python examples/banded_and_pairhmm.py

Demonstrates two round-2 engines:
- ``BatchBandedAligner``: kmer-seeded banded SW (banded.rs semantics) on
  the band-predicate Pallas kernel, bit-identical to the host oracle.
- ``BatchPairHMMExact``: the oracle-order f64 PairHMM forward on device
  (fastexp + 10-nat shortcut + max_edit_dist banding).
"""

import math

import numpy as np

import jax

from rust_bio_tpu.alignment.pairwise import BatchBandedAligner, Scoring


def main() -> None:
    rng = np.random.default_rng(1)

    # --- banded batch alignment ---------------------------------------
    refs, reads = [], []
    for _ in range(8):
        ref = rng.choice(list(b"ACGT"), size=400).astype("uint8").tobytes()
        s = int(rng.integers(0, 200))
        read = bytearray(ref[s : s + 150])
        for _ in range(5):
            read[int(rng.integers(0, len(read)))] = int(
                rng.choice(list(b"ACGT"))
            )
        refs.append(ref)
        reads.append(bytes(read))

    aligner = BatchBandedAligner(Scoring.from_scores(-5, -1, 2, -2), k=8, w=8)
    for i, aln in enumerate(aligner.semiglobal(reads, refs)):
        print(
            f"read {i}: score={aln.score} ref[{aln.ystart}:{aln.yend}] "
            f"cigar={aln.cigar()[:40]}..."
        )

    # --- score-exact PairHMM ------------------------------------------
    with jax.enable_x64(True):
        from rust_bio_tpu.stats.pairhmm.exact import BatchPairHMMExact

        subst = 0.0021
        emit = np.array(
            [math.log(1 - subst), math.log(subst / 3), math.log(1 - subst)]
        )
        hmm = BatchPairHMMExact(
            prob_gap_x=math.log(2.8e-6),
            prob_gap_y=math.log(5.1e-6),
            prob_gap_x_extend=float("-inf"),
            prob_gap_y_extend=float("-inf"),
        )
        B = len(reads)
        M = max(len(r) for r in refs)
        N = max(len(r) for r in reads)
        xs = np.zeros((B, M), np.uint8)
        ys = np.zeros((B, N), np.uint8)
        xl = np.array([len(r) for r in refs], np.int32)
        yl = np.array([len(r) for r in reads], np.int32)
        for i in range(B):
            xs[i, : xl[i]] = np.frombuffer(refs[i], np.uint8)
            ys[i, : yl[i]] = np.frombuffer(reads[i], np.uint8)
        ll = hmm.prob_related_batch(
            xs, ys, emit, semiglobal=True, max_edit_dist=8,
            xlens=xl, ylens=yl,
        )
        for i in range(B):
            print(f"read {i}: ln P(read | ref) = {ll[i]:.6f}")


if __name__ == "__main__":
    main()
