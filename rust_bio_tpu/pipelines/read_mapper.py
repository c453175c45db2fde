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

    def _seed_search_dispatch(self, pats: np.ndarray, plens: np.ndarray):
        """Async seed-search dispatch: returns DEVICE arrays (no host
        sync) so a stream driver can overlap the next batch's seeding
        with this batch's locate/extend/assembly."""
        import jax.numpy as jnp

        status, lower, _u, _m = self.index._search_kernel(
            jnp.asarray(pats), jnp.asarray(plens)
        )
        return status, lower

    def _seed_search(self, pats: np.ndarray, plens: np.ndarray):
        """(status, lower) arrays for a (N, L) seed batch; the sharded
        mapper overrides this with a mesh-sharded execution."""
        status, lower = self._seed_search_dispatch(pats, plens)
        return np.asarray(status), np.asarray(lower)

    def map_batch(self, reads: Sequence, ids: Optional[Sequence[str]] = None
                  ) -> List[MappedRead]:
        from rust_bio_tpu.data_structures.fm_device import COMPLETE

        seqs = [to_bytes(r) if not hasattr(r, "seq") else bytes(r.seq) for r in reads]
        if ids is None:
            ids = [
                getattr(r, "id", str(i)) for i, r in enumerate(reads)
            ]
        B = len(seqs)
        rcs, pats, plens, starts, K, L = self._prepare_seeds(seqs)
        return self._run_seeds(seqs, rcs, ids, pats, plens, starts, B, K, L)

    def _prepare_seeds(self, seqs):
        B = len(seqs)
        L = self.seed_len

        # both-strand seed batch, vectorized: K windows spread over each
        # oriented read (fwd lanes then rev lanes), one fancy-index gather
        K = self.seed_tries
        rcs = [dna.revcomp(s) for s in seqs]
        Lr = max(max((len(s) for s in seqs), default=1), L)
        ob = np.zeros((2 * B, Lr), np.uint8)
        olens = np.ones(2 * B, np.int64)
        for i, (s, rc) in enumerate(zip(seqs, rcs)):
            ob[i, : len(s)] = np.frombuffer(s, np.uint8)
            ob[B + i, : len(rc)] = np.frombuffer(rc, np.uint8)
            olens[i] = olens[B + i] = max(len(s), 1)
        span = np.maximum(olens - L, 0)  # (2B,)
        ks = np.arange(K)
        starts = (span[:, None] * ks[None, :]) // max(K - 1, 1)  # (2B, K)
        win_idx = starts[:, :, None] + np.arange(L)[None, None, :]
        win_idx = np.minimum(win_idx, Lr - 1)
        pats = ob[np.arange(2 * B)[:, None, None], win_idx]  # (2B, K, L)
        plens = np.minimum(np.broadcast_to(olens[:, None], (2 * B, K)), L)
        return rcs, pats, plens, starts, K, L

    def _run_seeds(self, seqs, rcs, ids, pats, plens, starts, B, K, L):
        status, lower = self._seed_search(
            pats.reshape(2 * B * K, L), plens.reshape(-1).astype(np.int32)
        )
        return self._finish_batch(
            seqs, rcs, ids, status, lower, starts, B, K
        )

    def _finish_batch(self, seqs, rcs, ids, status, lower, starts, B, K):
        from rust_bio_tpu.data_structures.fm_device import COMPLETE

        status = np.asarray(status)
        lower = np.asarray(lower)
        status = status.reshape(2, B, K)
        lower = lower.reshape(2, B, K)
        starts2 = starts.reshape(2, B, K)

        # first complete seed per read: forward strand seeds win over
        # reverse, earlier windows over later (matches the scan order)
        comp = status == COMPLETE  # (2, B, K)
        comp2 = np.moveaxis(comp, 1, 0).reshape(B, 2 * K)  # (B, [fwd K, rev K])
        has = comp2.any(axis=1)
        first = np.argmax(comp2, axis=1)  # (B,)
        sidx = (first >= K).astype(np.int64)  # strand index
        kidx = first % K
        bsel = np.arange(B)
        sel_lower = lower[sidx, bsel, kidx]
        sel_off = starts2[sidx, bsel, kidx]

        rows = sel_lower[has].astype(np.int32)
        positions_all = np.full(B, -1, np.int64)
        if rows.size:
            positions_all[has] = self.index.locate_batch(rows)
        chosen = {
            int(i): ("-" if sidx[i] else "+", int(sel_off[i]), None)
            for i in np.nonzero(has)[0]
        }
        positions_of = {int(i): int(positions_all[i]) for i in np.nonzero(has)[0]}

        picks = {}
        for i in np.nonzero(has)[0]:
            i = int(i)
            strand, off, _ = chosen[i]
            seed_pos = positions_of[i]
            oriented = seqs[i] if strand == "+" else rcs[i]
            win_start = max(seed_pos - off - self.flank, 0)
            win_end = min(
                seed_pos - off + len(oriented) + self.flank, len(self.genome)
            )
            picks[i] = (strand, win_start, win_end)
        return self._extend(seqs, rcs, ids, picks)

    def map_stream(self, read_batches, ids_batches=None):
        """Software-pipelined mapping over a stream of read batches
        (SURVEY pipeline parallelism): batch i+1's seed search is
        DISPATCHED (async, device-side) before batch i's locate/extend/
        host assembly runs, so the seeding stage overlaps the rest of the
        pipeline.  Yields one result list per batch, identical to
        ``map_batch`` outputs."""
        pending = None
        for bi, reads in enumerate(read_batches):
            seqs = [
                to_bytes(r) if not hasattr(r, "seq") else bytes(r.seq)
                for r in reads
            ]
            ids = (
                list(ids_batches[bi])
                if ids_batches is not None
                else [getattr(r, "id", str(i)) for i, r in enumerate(reads)]
            )
            B = len(seqs)
            rcs, pats, plens, starts, K, L = self._prepare_seeds(seqs)
            fut = self._seed_search_dispatch(
                pats.reshape(2 * B * K, L),
                plens.reshape(-1).astype(np.int32),
            )
            if pending is not None:
                yield self._finish_batch(*pending)
            pending = (seqs, rcs, ids, fut[0], fut[1], starts, B, K)
        if pending is not None:
            yield self._finish_batch(*pending)

    def _extend(self, seqs, rcs, ids, picks) -> List[MappedRead]:
        """Batched semiglobal extension + result assembly.

        ``picks``: read index -> (strand, window start, window end).
        """
        B = len(seqs)
        xs, ys, metas = [], [], []
        for i, (strand, win_start, win_end) in sorted(picks.items()):
            oriented = seqs[i] if strand == "+" else rcs[i]
            xs.append(oriented)
            ys.append(self.genome[win_start:win_end])
            metas.append((i, strand, win_start))

        out: List[MappedRead] = [
            MappedRead(ids[i], -1, "+", 0, "", None) for i in range(B)
        ]
        if xs:
            # pad the pick count to a power-of-two bucket: stable batch
            # shapes reuse one compiled engine across calls
            cap = max(8, 1 << (len(xs) - 1).bit_length())
            xs = xs + [b"A"] * (cap - len(xs))
            ys = ys + [b"A"] * (cap - len(ys))
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


class SmemReadMapper(ReadMapper):
    """Read mapper seeded by SMEMs over an FMD index (bwa-mem style).

    The genome is indexed as ``T$revcomp(T)$`` so one index covers both
    strands; super-maximal exact matches tolerate errors ANYWHERE in the
    read (the fixed-window seeding of ``ReadMapper`` fails when every
    window straddles an error). Seeding runs on the batched device SMEM
    kernel (data_structures/fmd_device.py); extension is the shared
    batched semiglobal path.
    """

    def __init__(
        self,
        genome,
        scoring: Optional[Scoring] = None,
        min_seed_len: int = 19,
        flank: int = 8,
        sa_sampling_rate: int = 8,
    ) -> None:
        # sa_sampling_rate 8 (not the serialization default 32): the locate
        # LF-walk is a lockstep while_loop over <= s sequential rank steps
        # (~0.9 ms each), and the sample array is 4 bytes per s text chars —
        # s=8 costs n/2 bytes of HBM for a ~4x faster locate stage
        from rust_bio_tpu.data_structures.fmd_device import DeviceFMDIndex
        from rust_bio_tpu.data_structures.fmindex import FMDIndex, FMIndex
        from rust_bio_tpu.data_structures.bwt import less as _less, Occ

        self.genome = to_bytes(genome)
        G = len(self.genome)
        text = self.genome + b"$" + dna.revcomp(self.genome) + b"$"
        sa = suffix_array(text)
        b = bwt(text, sa)
        alpha = dna.n_alphabet()
        alpha.insert(ord("$"))
        self.index = DeviceFMIndex(b, alpha, sa=sa, sampling_rate=sa_sampling_rate)
        self.fmd = DeviceFMDIndex(self.index)
        self._bwt = b
        self._host_fmd = None  # overflow-fallback oracle, built lazily
        self.G = G
        self.scoring = scoring or Scoring.from_scores(-5, -1, 2, -2)
        self.aligner = BatchAligner(self.scoring)
        self.min_seed_len = min_seed_len
        self.flank = flank

    def map_stream(self, read_batches, ids_batches=None):
        """Software-pipelined SMEM mapping: batch i+1's (dominant) SMEM
        kernel is dispatched async before batch i's retries/locate/extend/
        host assembly run, so the seeding stage overlaps the rest of the
        pipeline. Results are identical to ``map_batch``."""
        pending = None
        for bi, reads in enumerate(read_batches):
            seqs = [
                to_bytes(r) if not hasattr(r, "seq") else bytes(r.seq)
                for r in reads
            ]
            ids = (
                list(ids_batches[bi])
                if ids_batches is not None
                else [getattr(r, "id", str(i)) for i, r in enumerate(reads)]
            )
            handle = self._smem_dispatch(seqs)
            if pending is not None:
                yield self._smem_finish(*pending)
            rcs = [dna.revcomp(s) for s in seqs]
            pending = (seqs, rcs, ids, handle)
        if pending is not None:
            yield self._smem_finish(*pending)

    @property
    def host_fmd(self):
        if self._host_fmd is None:
            from rust_bio_tpu.data_structures.fmindex import FMDIndex, FMIndex
            from rust_bio_tpu.data_structures.bwt import less as _less, Occ

            alpha2 = dna.n_alphabet()
            self._host_fmd = FMDIndex(
                FMIndex(self._bwt, _less(self._bwt, alpha2),
                        Occ(self._bwt, 128, alpha2))
            )
        return self._host_fmd

    def map_batch(self, reads: Sequence, ids: Optional[Sequence[str]] = None
                  ) -> List[MappedRead]:
        seqs = [to_bytes(r) if not hasattr(r, "seq") else bytes(r.seq) for r in reads]
        if ids is None:
            ids = [getattr(r, "id", str(i)) for i, r in enumerate(reads)]
        handle = self._smem_dispatch(seqs)
        rcs = [dna.revcomp(s) for s in seqs]
        return self._smem_finish(seqs, rcs, ids, handle)

    def _smem_dispatch(self, seqs):
        """Async SMEM-seed dispatch for a batch: one full-batch kernel
        launch at the read middles, no host sync."""
        return self.fmd.smems_dispatch(
            seqs,
            [max(0, len(s) // 2 - 1) for s in seqs],
            self.min_seed_len,
            max_slots=16,
            mapper_mode=True,  # lower_rev unused: locate uses itv.lower
        )

    def _smem_finish(self, seqs, rcs, ids, handle) -> List[MappedRead]:
        B = len(seqs)

        # one seed suffices for extension: query SMEMs overlapping the
        # read middle (one full-batch call); the few reads without a
        # long-enough SMEM there retry at the quarter positions in SMALL
        # power-of-two buckets (stable shapes, tiny lane counts)
        def pick(lane):
            best = None
            for itv, q0, mlen in lane:
                if best is None or mlen > best[2]:
                    best = (itv, q0, mlen)
            return best

        smems = self.fmd.smems_collect(
            handle, host_oracle_fn=lambda: self.host_fmd
        )
        best_of = {}
        for i in range(B):
            if seqs[i]:
                best = pick(smems[i])
                if best is not None:
                    best_of[i] = best
        for frac in (4, 8):
            pending = [i for i in range(B) if i not in best_of and seqs[i]]
            if not pending:
                break
            cap = max(32, 1 << (len(pending) - 1).bit_length())
            sub = [seqs[i] for i in pending]
            sub += [b"A" * 1] * (cap - len(sub))
            pos = [max(0, len(s) // frac - 1) for s in sub]
            smems2 = self.fmd.smems_batch(
                sub, pos, self.min_seed_len, max_slots=16,
                host_oracle_fn=lambda: self.host_fmd,
                mapper_mode=True,
            )
            for r, i in enumerate(pending):
                best = pick(smems2[r])
                if best is not None:
                    best_of[i] = best
        rows, meta = [], []
        for i in sorted(best_of):
            itv, q0, mlen = best_of[i]
            rows.append(itv.lower)
            meta.append((i, q0, mlen))
        picks = {}
        if rows:
            positions = self.index.locate_batch(np.asarray(rows, np.int32))
            G = self.G
            for (i, q0, mlen), p in zip(meta, positions):
                p = int(p)
                n = len(seqs[i])
                if p < G:  # forward-strand hit
                    strand, off, gpos = "+", q0, p
                else:  # hit inside revcomp(T): read maps to '-' strand
                    r0 = p - (G + 1)
                    strand = "-"
                    off = n - q0 - mlen  # offset in the oriented (rc) read
                    gpos = G - r0 - mlen
                win_start = max(gpos - off - self.flank, 0)
                win_end = min(gpos - off + n + self.flank, G)
                picks[i] = (strand, win_start, win_end)
        return self._extend(seqs, rcs, ids, picks)
