"""Seed-and-extend read mapping: FM-index seeds → batched SW extension.

The production composition of the framework's kernels (the reference is a
library of parts; this is the assembled machine):

1. index build: native SAIS suffix array → BWT → HBM bit-plane FM-index
   (``DeviceFMIndex``), once per genome (persistable via
   ``data_structures.serialize``).
2. per read batch: exact seed lookup on both strands (batched backward
   search over k-length prefixes/infixes), first-hit locate via the batched
   LF-walk.
3. extension: reference windows around seed hits + the read batch through
   the batch-lockstep SW kernel (semiglobal), producing scores and
   reference-exact CIGARs.

All device stages are batched; the host only does window slicing and
result assembly. Unmapped reads (no exact seed on either strand) are
reported with ``pos == -1``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np

from rust_bio_tpu.alignment.pairwise.batched import BatchAligner
from rust_bio_tpu.alignment.pairwise.scoring import Scoring
from rust_bio_tpu.alignment.types import Alignment
from rust_bio_tpu.alphabets import dna
from rust_bio_tpu.data_structures.bwt import bwt
from rust_bio_tpu.data_structures.fm_device import DeviceFMIndex
from rust_bio_tpu.data_structures.fmindex import BackwardSearchKind
from rust_bio_tpu.data_structures.suffix_array import suffix_array
from rust_bio_tpu.utils.text import to_bytes


@dataclass
class MappedRead:
    read_id: str
    pos: int  # 0-based reference position of the aligned window start (-1 = unmapped)
    strand: str  # '+' or '-'
    score: int
    cigar: str
    alignment: Optional[Alignment]


class ReadMapper:
    def __init__(
        self,
        genome,
        scoring: Optional[Scoring] = None,
        seed_len: int = 20,
        seed_tries: int = 3,
        flank: int = 8,
        sa_sampling_rate: int = 32,
    ) -> None:
        self.genome = to_bytes(genome)
        text = self.genome + b"$"
        sa = suffix_array(text)
        b = bwt(text, sa)
        self.index = DeviceFMIndex(
            b, dna.n_alphabet(), sa=sa, sampling_rate=sa_sampling_rate
        )
        self.scoring = scoring or Scoring.from_scores(-5, -1, 2, -2)
        self.aligner = BatchAligner(self.scoring)
        self.seed_len = seed_len
        self.seed_tries = seed_tries
        self.flank = flank

    def map_batch(self, reads: Sequence, ids: Optional[Sequence[str]] = None
                  ) -> List[MappedRead]:
        seqs = [to_bytes(r) if not hasattr(r, "seq") else bytes(r.seq) for r in reads]
        if ids is None:
            ids = [
                getattr(r, "id", str(i)) for i, r in enumerate(reads)
            ]
        B = len(seqs)
        L = self.seed_len

        # both-strand seed batch: for each read, seed_tries windows fwd + rev
        seed_pats: List[bytes] = []
        seed_meta: List[tuple] = []  # (read_idx, strand, offset_in_oriented_read)
        for i, seq in enumerate(seqs):
            rc = dna.revcomp(seq)
            for oriented, strand in ((seq, "+"), (rc, "-")):
                n = len(oriented)
                if n <= L:
                    starts = [0]
                else:
                    starts = sorted(
                        set(np.linspace(0, n - L, self.seed_tries).astype(int))
                    )
                for s in starts:
                    seed_pats.append(oriented[s : s + L])
                    seed_meta.append((i, strand, int(s)))

        results = self.index.backward_search_batch(seed_pats)

        # choose the first complete seed per read; collect locate rows
        chosen = {}
        rows = []
        for (i, strand, off), res in zip(seed_meta, results):
            if i in chosen:
                continue
            if res.kind == BackwardSearchKind.Complete:
                chosen[i] = (strand, off, len(rows))
                rows.append(res.interval.lower)
        positions = (
            self.index.locate_batch(np.asarray(rows, dtype=np.int32))
            if rows
            else np.zeros(0, np.int64)
        )

        # build extension batch
        xs, ys, metas = [], [], []
        for i, seq in enumerate(seqs):
            if i not in chosen:
                continue
            strand, off, row_idx = chosen[i]
            seed_pos = int(positions[row_idx])
            oriented = seq if strand == "+" else dna.revcomp(seq)
            win_start = max(seed_pos - off - self.flank, 0)
            win_end = min(
                seed_pos - off + len(oriented) + self.flank, len(self.genome)
            )
            xs.append(oriented)
            ys.append(self.genome[win_start:win_end])
            metas.append((i, strand, win_start))

        out: List[MappedRead] = [
            MappedRead(ids[i], -1, "+", 0, "", None) for i in range(B)
        ]
        if xs:
            alns = self.aligner.semiglobal(xs, ys)
            for (i, strand, win_start), aln in zip(metas, alns):
                out[i] = MappedRead(
                    read_id=ids[i],
                    pos=win_start + aln.ystart,
                    strand=strand,
                    score=aln.score,
                    cigar=aln.cigar(),
                    alignment=aln,
                )
        return out
