"""End-to-end pipeline tests (equivalent of the reference's crate-level
doctest, src/lib.rs:98-168, plus the TPU-native batched pipeline)."""

import io

import numpy as np

from rust_bio_tpu.alphabets import dna
from rust_bio_tpu.data_structures.bwt import Occ, bwt, less
from rust_bio_tpu.data_structures.fm_device import DeviceFMIndex
from rust_bio_tpu.data_structures.fmindex import (
    BackwardSearchKind,
    FMIndex,
)
from rust_bio_tpu.data_structures.suffix_array import suffix_array
from rust_bio_tpu.io import batch, fastq
from rust_bio_tpu.alignment.pairwise.batched import BatchAligner
from rust_bio_tpu.alignment.pairwise.scalar import Aligner as ScalarAligner
from rust_bio_tpu.alignment.pairwise.scoring import Scoring


def test_crate_doctest_pipeline():
    """src/lib.rs:98-168: FASTQ records validated and searched in an FM-index."""
    text = b"ACAGCTCGATCGGTA$"
    pattern = b"ATCG"

    alphabet = dna.iupac_alphabet()
    sa = suffix_array(text)
    b = bwt(text, sa)
    l = less(b, alphabet)
    occ = Occ(b, 3, alphabet)
    fm = FMIndex(b, l, occ)

    res = fm.backward_search(pattern)
    assert res.kind == BackwardSearchKind.Complete
    assert sorted(res.interval.occ(sa)) == [8]

    fq = (
        b"@r1\nGATC\n+\nIIII\n"
        b"@r2\nCTCG\n+\nIIII\n"
        b"@r3\nNNNN\n+\nIIII\n"
    )
    hits = {}
    for record in fastq.Reader(io.BytesIO(fq)).records():
        assert record.check() is None
        seq = record.seq
        if alphabet.is_word(seq):
            res = fm.backward_search(seq)
            if res.kind == BackwardSearchKind.Complete:
                hits[record.id] = sorted(res.interval.occ(sa))
    assert text.find(b"GATC") in hits["r1"]
    assert text.find(b"CTCG") in hits["r2"]


def test_batched_read_mapping_pipeline():
    """TPU-native flow: FASTQ -> bucketed batches -> device FM seeds ->
    batched SW alignment; results cross-checked against scalar oracles."""
    rng = np.random.default_rng(0)
    genome = rng.choice(list(b"ACGT"), size=3000).astype("uint8").tobytes()
    text = genome + b"$"

    # simulated reads with up to 2 substitutions
    reads = []
    for i in range(64):
        start = int(rng.integers(0, len(genome) - 80))
        read = bytearray(genome[start : start + 80])
        for _ in range(int(rng.integers(0, 3))):
            read[int(rng.integers(0, 80))] = ord("ACGT"[rng.integers(0, 4)])
        reads.append(
            fastq.Record(id=f"r{i}_{start}", seq=bytes(read), qual=b"I" * 80)
        )

    # index the genome on device
    alphabet = dna.n_alphabet()
    sa = suffix_array(text)
    b = bwt(text, sa)
    dev = DeviceFMIndex(b, alphabet, sa=sa, sampling_rate=8)

    scoring = Scoring.from_scores(-5, -1, 2, -2)
    aligner = BatchAligner(scoring)
    scalar = ScalarAligner.with_scoring(scoring)

    n_aligned = 0
    for sb in batch.bucketed_batches(reads, batch_size=32):
        # seed with the first 20 bp of each read
        seeds = [sb.seqs[i, :20].tobytes() for i in range(len(sb))]
        seed_hits = dev.backward_search_batch(seeds)
        xs, ys, ids = [], [], []
        for i, res in enumerate(seed_hits):
            if res.kind != BackwardSearchKind.Complete:
                continue  # a substitution in the seed -> no exact hit
            pos = int(dev.locate_batch(
                np.arange(res.interval.lower, res.interval.upper)
            )[0])
            ref = genome[max(pos - 5, 0) : pos + 90]
            xs.append(sb.seqs[i, : sb.lens[i]].tobytes())
            ys.append(ref)
            ids.append(sb.ids[i])
        if not xs:
            continue
        alns = aligner.semiglobal(xs, ys)
        n_aligned += len(alns)
        # oracle cross-check on a few lanes
        for k in range(0, len(xs), 7):
            want = scalar.semiglobal(xs[k], ys[k])
            assert alns[k] == want, ids[k]
        # every read should align with a strong score
        for k, aln in enumerate(alns):
            assert aln.score >= 2 * 80 - 4 * 10, (ids[k], aln.score)
    assert n_aligned >= 30  # reads with a clean first-20bp seed
