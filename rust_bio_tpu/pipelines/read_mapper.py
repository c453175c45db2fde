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
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
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
    # Alignment object, or a zero-arg thunk decoding it on first access
    # (the packed fast path defers the op-list materialization — most
    # consumers only read pos/score/cigar)
    _aln: Optional[object] = None

    @property
    def alignment(self) -> Optional[Alignment]:
        if callable(self._aln):
            self._aln = self._aln()
        return self._aln


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
        self._genome_np = np.frombuffer(self.genome, np.uint8)
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

    # big batches are split into chunks this size and software-pipelined
    # through ``map_stream`` (chunk i+1's seed kernel dispatched before
    # chunk i's extend/decode), hiding the host decode + transfer
    # latency behind device work.  Results are order-identical.  8192:
    # the seed/locate kernels are LOCKSTEP-latency-bound, so narrower
    # chunks pay near-full kernel latency per call and lose more to the
    # doubled ~26 ms round trips than the overlap hides (measured: 4096
    # chunks at B=8192 are ~5% slower than one direct call).
    _PIPE_CHUNK = 8192

    def map_batch(self, reads: Sequence, ids: Optional[Sequence[str]] = None
                  ) -> List[MappedRead]:
        from rust_bio_tpu.data_structures.fm_device import COMPLETE

        seqs = [to_bytes(r) if not hasattr(r, "seq") else bytes(r.seq) for r in reads]
        if ids is None:
            ids = [
                getattr(r, "id", str(i)) for i, r in enumerate(reads)
            ]
        B = len(seqs)
        C = self._PIPE_CHUNK
        if B >= 2 * C:
            out: List[MappedRead] = []
            offs = range(0, B, C)
            for part in self.map_stream(
                [seqs[o : o + C] for o in offs],
                [ids[o : o + C] for o in offs],
            ):
                out.extend(part)
            return out
        rcs, pats, plens, starts, K, L, rb = self._prepare_seeds(seqs)
        return self._run_seeds(
            seqs, rcs, ids, pats, plens, starts, B, K, L, rb
        )

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
        # (ob, olens) ride along so the extension stage can build its
        # input by fancy indexing (fwd rows 0..B-1, rc rows B..2B-1)
        return rcs, pats, plens, starts, K, L, (ob, olens)

    def _run_seeds(self, seqs, rcs, ids, pats, plens, starts, B, K, L, rb):
        status, lower = self._seed_search(
            pats.reshape(2 * B * K, L), plens.reshape(-1).astype(np.int32)
        )
        return self._finish_batch(
            seqs, rcs, ids, status, lower, starts, B, K, rb
        )

    def _finish_batch(self, seqs, rcs, ids, status, lower, starts, B, K,
                      rb=None):
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
        return self._extend(seqs, rcs, ids, picks, rb)

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
            rcs, pats, plens, starts, K, L, rb = self._prepare_seeds(seqs)
            fut = self._seed_search_dispatch(
                pats.reshape(2 * B * K, L),
                plens.reshape(-1).astype(np.int32),
            )
            if pending is not None:
                yield self._finish_batch(*pending)
            pending = (seqs, rcs, ids, fut[0], fut[1], starts, B, K, rb)
        if pending is not None:
            yield self._finish_batch(*pending)

    def _extend_dispatch(self, seqs, rcs, picks):
        """Async half of ``_extend``: batch the pick windows and dispatch
        the semiglobal extension kernel WITHOUT syncing, so its tunnel
        round trip + device time overlap later host work.

        Returns ``(metas, handle, fallback)``; pass to ``_extend_finish``.
        """
        xs, ys, metas = [], [], []
        for i, (strand, win_start, win_end) in sorted(picks.items()):
            oriented = seqs[i] if strand == "+" else rcs[i]
            xs.append(oriented)
            ys.append(self.genome[win_start:win_end])
            metas.append((i, strand, win_start))
        if not xs:
            return metas, None, None
        # pad the pick count to a power-of-two bucket: stable batch
        # shapes reuse one compiled engine across calls
        cap = max(8, 1 << (len(xs) - 1).bit_length())
        xs = xs + [b"A"] * (cap - len(xs))
        ys = ys + [b"A"] * (cap - len(ys))
        try:
            return metas, self.aligner.semiglobal_packed_async(xs, ys), None
        except AssertionError:  # shapes the column-RLE engine can't hold
            return metas, None, (xs, ys)

    def _extend_finish(self, out, ids, metas, handle, fallback) -> None:
        """Sync half of ``_extend``: pull the packed results and assemble
        ``MappedRead``s into ``out`` at the meta lane indices."""
        if handle is not None:
            packed = self.aligner.semiglobal_packed_finish(handle)
            cigars = packed.cigars()
            for r, (i, strand, win_start) in enumerate(metas):
                out[i] = MappedRead(
                    read_id=ids[i],
                    pos=win_start + int(packed.ystart[r]),
                    strand=strand,
                    score=int(packed.score[r]),
                    cigar=cigars[r],
                    _aln=(lambda p=packed, rr=r: p.alignment(rr)),
                )
        elif fallback is not None:
            xs, ys = fallback
            alns = self.aligner.semiglobal(xs, ys)
            for (i, strand, win_start), aln in zip(metas, alns):
                out[i] = MappedRead(
                    read_id=ids[i],
                    pos=win_start + aln.ystart,
                    strand=strand,
                    score=aln.score,
                    cigar=aln.cigar(),
                    _aln=aln,
                )

    def _rc_pb(self, pb, plens):
        """Vectorized per-row reverse complement of a left-aligned padded
        read batch (replaces B ``dna.revcomp`` calls: ~41 ms at B=8192)."""
        comp = np.asarray(dna.COMPLEMENT, np.uint8)
        rev = comp[pb][:, ::-1]
        rc = np.zeros_like(pb)
        L = pb.shape[1]
        for l in np.unique(plens):  # reads are near-uniform length
            if l <= 0:
                continue
            m = plens == l
            rc[m, :l] = rev[m][:, L - l :]
        return rc

    def _extend_dispatch_packed(self, pb, plens, rc_pb, picks):
        """Array-native half of ``_extend_dispatch``: builds the padded
        extension batch by fancy indexing over the packed read batch and
        the genome array (no byte-string round trip), then dispatches the
        packed semiglobal kernel async.  Same (metas, handle, fallback)
        contract as ``_extend_dispatch``."""
        items = sorted(picks.items())
        if not items:
            return [], None, None
        rows = np.array([i for i, _ in items], np.int64)
        neg = np.array([p[0] == "-" for _, p in items])
        ws = np.array([p[1] for _, p in items], np.int64)
        we = np.array([p[2] for _, p in items], np.int64)
        metas = [
            (int(i), "-" if s else "+", int(w))
            for (i, _), s, w in zip(items, neg, ws)
        ]
        n = len(items)
        cap = max(8, 1 << (n - 1).bit_length())
        L = pb.shape[1]
        xb = np.zeros((cap, L), np.uint8)
        xb[:n] = np.where(neg[:, None], rc_pb[rows], pb[rows])
        xb[n:, 0] = ord("A")
        mlens = np.ones(cap, np.int32)
        mlens[:n] = plens[rows]
        nl = (we - ws).astype(np.int32)
        W = max(int(nl.max()), 1)
        yb = np.zeros((cap, W), np.uint8)
        gi = ws[:, None] + np.arange(W)[None, :]
        g = self._genome_np
        win = g[np.minimum(gi, len(g) - 1)]
        yb[:n] = np.where(np.arange(W)[None, :] < nl[:, None], win, 0)
        yb[n:, 0] = ord("A")
        nlens = np.ones(cap, np.int32)
        nlens[:n] = nl
        try:
            return metas, self.aligner.semiglobal_packed_async_arrays(
                xb, yb, mlens, nlens
            ), None
        except AssertionError:  # shapes the column-RLE engine can't hold
            xs = [bytes(xb[r, : mlens[r]]) for r in range(cap)]
            ys = [bytes(yb[r, : nlens[r]]) for r in range(cap)]
            return metas, None, (xs, ys)

    def _extend(self, seqs, rcs, ids, picks, rb=None) -> List[MappedRead]:
        """Batched semiglobal extension + result assembly.

        ``picks``: read index -> (strand, window start, window end).
        ``rb``: optional ``(ob, olens)`` from ``_prepare_seeds`` — the
        both-strand packed read batch, which lets the extension input be
        built by fancy indexing instead of byte-string re-packing.
        """
        B = len(seqs)
        out: List[MappedRead] = [
            MappedRead(ids[i], -1, "+", 0, "", None) for i in range(B)
        ]
        if rb is not None:
            ob, olens = rb
            ext = self._extend_dispatch_packed(
                ob[:B], olens[:B].astype(np.int32), ob[B:], picks
            )
        else:
            ext = self._extend_dispatch(seqs, rcs, picks)
        self._extend_finish(out, ids, *ext)
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
        index_cache: Optional[str] = None,
    ) -> None:
        # ``index_cache``: path to a serialized FMD DeviceFMIndex
        # (serialize.save_fm_index).  When the file exists the SAIS/BWT
        # build (~minutes per 100 Mbp of genome) is skipped and the index
        # is rehydrated straight into HBM; when absent it is built once
        # and saved (uncompressed — GB-scale artifacts).
        #
        # sa_sampling_rate 8 (not the serialization default 32): the locate
        # LF-walk is a lockstep while_loop over <= s sequential rank steps
        # (~0.9 ms each), and the sample array is 4 bytes per s text chars —
        # s=8 costs n/2 bytes of HBM for a ~4x faster locate stage
        from rust_bio_tpu.data_structures.fmd_device import DeviceFMDIndex
        from rust_bio_tpu.data_structures.fmindex import FMDIndex, FMIndex
        from rust_bio_tpu.data_structures.bwt import less as _less, Occ

        self.genome = to_bytes(genome)
        self._genome_np = np.frombuffer(self.genome, np.uint8)
        G = len(self.genome)
        import os as _os

        if index_cache is not None and _os.path.exists(index_cache):
            import hashlib
            import sys as _sys

            from rust_bio_tpu.data_structures.serialize import load_fm_index

            # provenance: the header's genome hash (cheap — hashes only the
            # genome we already hold, not the multi-GB arrays) replaces the
            # full content-hash pass; caches predating the field fall back
            # to the length check alone.
            self.index, meta = load_fm_index(
                index_cache, verify=False, return_meta=True
            )
            assert self.index.n == 2 * G + 2, (
                "cached index does not match this genome's FMD text length"
            )
            want = hashlib.sha256(self.genome).hexdigest()[:16]
            got = meta.get("genome_sha256")
            assert got is None or got == want, (
                f"cached index was built from a DIFFERENT genome "
                f"(hash {got} != {want}): refusing to map against it"
            )
            if self.index.s != sa_sampling_rate:
                print(
                    f"SmemReadMapper: cached index uses sa_sampling_rate="
                    f"{self.index.s} (requested {sa_sampling_rate}); using "
                    f"the cached value",
                    file=_sys.stderr,
                )
            b = self.index.bwt_host()
        else:
            text = self.genome + b"$" + dna.revcomp(self.genome) + b"$"
            sa = suffix_array(text)
            b = bwt(text, sa)
            alpha = dna.n_alphabet()
            alpha.insert(ord("$"))
            self.index = DeviceFMIndex(
                b, alpha, sa=sa, sampling_rate=sa_sampling_rate
            )
            if index_cache is not None:
                from rust_bio_tpu.data_structures.serialize import (
                    save_fm_index,
                )

                import hashlib

                save_fm_index(
                    index_cache,
                    self.index,
                    compress=False,
                    extra_meta={
                        "genome_sha256": hashlib.sha256(
                            self.genome
                        ).hexdigest()[:16]
                    },
                )
        self.fmd = DeviceFMDIndex(self.index)
        self._bwt = b
        self._host_fmd = None  # overflow-fallback oracle, built lazily
        self.G = G
        self.scoring = scoring or Scoring.from_scores(-5, -1, 2, -2)
        self.aligner = BatchAligner(self.scoring)
        self.min_seed_len = min_seed_len
        self.flank = flank
        # base candidate-slot budget of the fused seed kernel; overflow
        # lanes retry at 2*_E0 before the host oracle.  16 is the
        # measured sweet spot (CLAUDE.md: E=12 loses net); tests shrink
        # it to force the overflow paths cheaply.
        self._E0 = 16

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
            pending = (seqs, ids, handle)
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
        B = len(seqs)
        C = self._PIPE_CHUNK
        if B >= 2 * C:
            out: List[MappedRead] = []
            offs = range(0, B, C)
            for part in self.map_stream(
                [seqs[o : o + C] for o in offs],
                [ids[o : o + C] for o in offs],
            ):
                out.extend(part)
            return out
        handle = self._smem_dispatch(seqs)
        return self._smem_finish(seqs, ids, handle)

    def _seed_kernel(self, pb, plens, iis, E: int = 16):
        """Fused device seeding: SMEM search at the given positions ->
        best-slot pick (longest match, first on ties — the host pick
        order) -> sampled-SA locate of its interval start, all in one
        device chain so the host pays ONE round trip per batch.

        ``E`` sizes the candidate-slot/match arrays (static); overflow
        lanes are retried at E=32 before falling back to the host oracle.

        Returns a packed (B, 5) int32: [pos, q0, mlen, found, ovf]."""
        idx = self.index
        return self._seed_impl(
            idx._fused,
            idx.ensure_row_layout(),
            idx._mxu_T if idx._mxu_swt else idx._fused,
            idx.bwt_sym,
            idx.sa_sample,
            idx.sent_rows,
            idx.sent_vals,
            pb,
            plens,
            iis,
            E,
        )

    @partial(jax.jit, static_argnums=(0, 11))
    def _seed_impl(
        self, fused, fused_rows, mxu_T, bwt_sym, sa_sample, sent_rows,
        sent_vals, pb, plens, iis, E: int = 16,
    ):
        m_lo, _lor, _sz, m_st, m_ml, mcnt, ovf = self.fmd._smems_impl(
            fused, fused_rows, pb, plens, iis, E, E,
            jnp.int32(self.min_seed_len), True,
        )
        B, MC = m_lo.shape
        valid = jnp.arange(MC)[None, :] < mcnt[:, None]
        mlv = jnp.where(valid, m_ml, -1)
        best = jnp.argmax(mlv, axis=1)  # first max == host pick order
        take = lambda m: jnp.take_along_axis(m, best[:, None], axis=1)[:, 0]
        found = (mcnt > 0) & ~ovf
        rows = jnp.where(found, take(m_lo), 0)
        pos = self.index._locate_impl(
            fused, mxu_T, bwt_sym, sa_sample, sent_rows, sent_vals,
            rows.astype(jnp.int32),
        )
        return jnp.stack(
            [
                pos.astype(jnp.int32),
                take(m_st),
                take(m_ml),
                found.astype(jnp.int32),
                ovf.astype(jnp.int32),
            ],
            axis=1,
        )

    def _smem_dispatch(self, seqs):
        """Async fused seed+pick+locate dispatch: one kernel chain at the
        read middles, no host sync.  Returns ``(device_packed, pb,
        plens)`` — the padded read batch rides along so the extension
        stage can build its input arrays by fancy indexing instead of
        re-packing 8 K byte strings."""
        B = len(seqs)
        L = max((len(s) for s in seqs), default=1) or 1
        pb = np.zeros((B, L), np.uint8)
        plens = np.zeros(B, np.int32)
        for i, p in enumerate(seqs):
            pb[i, : len(p)] = np.frombuffer(p, np.uint8)
            plens[i] = len(p)
        iis = np.asarray(
            [max(0, len(s) // 2 - 1) for s in seqs], np.int32
        )
        dev = self._seed_kernel(
            jnp.asarray(pb), jnp.asarray(plens), jnp.asarray(iis),
            E=self._E0,
        )
        return dev, pb, plens

    def _pick_of_lane(self, lane):
        best = None
        for itv, q0, mlen in lane:
            if best is None or mlen > best[2]:
                best = (itv, q0, mlen)
        return best

    def _smem_finish(self, seqs, ids, handle) -> List[MappedRead]:
        B = len(seqs)
        dev, pb, plens = handle
        packed = np.asarray(dev)  # ONE pull: (B, 5)
        pos_a, q0_a, ml_a, found_a, ovf_a = packed.T
        rc_pb = self._rc_pb(pb, plens)

        # reads without a long-enough middle SMEM: retry at BOTH quarter
        # positions in ONE small power-of-two-bucket kernel call (two
        # sequential rounds pay the ~50 ms lockstep kernel latency twice;
        # merged lanes with the earlier-round preference are outcome-
        # identical to the sequential rounds).  The retry kernel is
        # DISPATCHED before the host-oracle overflow loop below so its
        # ~50 ms lockstep latency overlaps the host work (the two lane
        # sets are disjoint: pending excludes ovf lanes).
        pending = [
            i for i in range(B)
            if seqs[i] and not found_a[i] and not ovf_a[i]
        ]
        retry_handle = None
        if pending:
            fracs = (4, 8)
            nrow = len(pending) * len(fracs)
            cap = max(32, 1 << (nrow - 1).bit_length())
            Lr = max(max(len(seqs[i]) for i in pending), 1)
            rb = np.zeros((cap, Lr), np.uint8)
            rlens = np.ones(cap, np.int32)
            riis = np.zeros(cap, np.int32)
            for r, i in enumerate(pending):
                s = seqs[i]
                enc = np.frombuffer(s, np.uint8)
                for fi, frac in enumerate(fracs):
                    row = fi * len(pending) + r
                    rb[row, : len(s)] = enc
                    rlens[row] = len(s)
                    riis[row] = max(0, len(s) // frac - 1)
            retry_handle = self._seed_kernel(
                jnp.asarray(rb), jnp.asarray(rlens), jnp.asarray(riis),
                E=self._E0,
            )  # async: pulled after the host-oracle loop below
            retry_iis = riis

        # overflow lanes: retry on device with DOUBLE the slot budget
        # (2*_E0 = 32) before ever touching the ~10 ms/lane host oracle.  The
        # wider kernel is dispatched async here so it overlaps the main
        # extension below; lanes that still overflow at E=32 (rare^2)
        # fall back to the oracle.
        ovf_lanes = [i for i in range(B) if seqs[i] and ovf_a[i]]
        ovf_handle = None
        if ovf_lanes:
            cap = max(32, 1 << (len(ovf_lanes) - 1).bit_length())
            Lo = max(len(seqs[i]) for i in ovf_lanes)
            ob = np.zeros((cap, Lo), np.uint8)
            olens = np.ones(cap, np.int32)
            oiis = np.zeros(cap, np.int32)
            for r, i in enumerate(ovf_lanes):
                s = seqs[i]
                ob[r, : len(s)] = np.frombuffer(s, np.uint8)
                olens[r] = len(s)
                oiis[r] = max(0, len(s) // 2 - 1)
            ovf_handle = self._seed_kernel(
                jnp.asarray(ob), jnp.asarray(olens), jnp.asarray(oiis),
                E=2 * self._E0,
            )

        # found lanes don't depend on the retries: dispatch their
        # (dominant) extension kernel NOW so its ~26 ms round trip +
        # device time run concurrently with the retry kernel pull and
        # the host-oracle loop below.  Results are lane-independent, so
        # splitting the extension into two bucketed calls is outcome-
        # identical to the previous single combined call.
        main_picks = {}
        for i in np.nonzero(found_a)[0]:
            i = int(i)
            if seqs[i]:
                main_picks[i] = self._pick_window(
                    len(seqs[i]), int(pos_a[i]), int(q0_a[i]), int(ml_a[i])
                )
        main_ext = self._extend_dispatch_packed(pb, plens, rc_pb, main_picks)

        # collect the wide retry; still-overflowing lanes go host-oracle
        # (never silently wrong), overlapped with the in-flight kernels.
        # Lanes the wide kernel resolves enter retry_packed directly —
        # the kernel replicates the oracle's pick order, so this is
        # outcome-identical to the previous all-oracle path.
        best_host = {}
        retry_packed = {}
        if ovf_handle is not None:
            sub = np.asarray(ovf_handle)
            for r, i in enumerate(ovf_lanes):
                if sub[r, 4]:  # still overflowing at the doubled budget
                    lane = self.host_fmd.smems(
                        seqs[i],
                        max(0, len(seqs[i]) // 2 - 1),
                        self.min_seed_len,
                    )
                    best = self._pick_of_lane(lane)
                    if best is not None:
                        best_host[i] = best
                elif sub[r, 3]:
                    retry_packed[i] = sub[r]

        # dispatch the locate for the host-oracle picks NOW so its ~25 ms
        # lockstep LF-walk latency overlaps the retry pull; retry-overflow
        # lanes (rare) get a second, late locate below
        early_host = sorted(best_host)
        loc_handle, loc_nb = (None, 0)
        if early_host:
            loc_handle, loc_nb = self.index.locate_batch_async(
                np.asarray([best_host[i][0].lower for i in early_host],
                           np.int32)
            )

        if retry_handle is not None:
            sub = np.asarray(retry_handle)
            for r, i in enumerate(pending):
                for fi, frac in enumerate(fracs):
                    row = fi * len(pending) + r
                    if sub[row, 4]:  # overflow -> host oracle
                        lane = self.host_fmd.smems(
                            seqs[i], int(retry_iis[row]), self.min_seed_len
                        )
                        best = self._pick_of_lane(lane)
                        if best is not None:
                            best_host[i] = best
                        break
                    if sub[row, 3]:
                        retry_packed[i] = sub[row]
                        break

        # collect locates; host-oracle lanes enter retry_packed as seeds
        if loc_handle is not None:
            poss = np.asarray(loc_handle)[:loc_nb]
            for (i, p) in zip(early_host, poss):
                itv, q0, mlen = best_host[i]
                retry_packed[i] = np.array(
                    [int(p), q0, mlen, 1, 0], np.int32
                )
        late_host = [i for i in sorted(best_host) if i not in set(early_host)]
        if late_host:
            poss = self.index.locate_batch(
                np.asarray([best_host[i][0].lower for i in late_host],
                           np.int32)
            )
            for (i, p) in zip(late_host, poss):
                itv, q0, mlen = best_host[i]
                retry_packed[i] = np.array(
                    [int(p), q0, mlen, 1, 0], np.int32
                )

        retry_picks = {}
        for i, rp in retry_packed.items():
            if seqs[i] and not found_a[i]:
                p, q0, mlen = (int(x) for x in rp[:3])
                retry_picks[i] = self._pick_window(len(seqs[i]), p, q0, mlen)
        retry_ext = (
            self._extend_dispatch_packed(pb, plens, rc_pb, retry_picks)
            if retry_picks
            else None
        )

        out: List[MappedRead] = [
            MappedRead(ids[i], -1, "+", 0, "", None) for i in range(B)
        ]
        # main-lane assembly (host decode) overlaps the in-flight retry
        # extension's round trip
        self._extend_finish(out, ids, *main_ext)
        if retry_ext is not None:
            self._extend_finish(out, ids, *retry_ext)
        return out

    def _pick_window(self, n, p, q0, mlen):
        """Window geometry of a located seed: (strand, win_start, win_end).

        A hit at text position ``p >= G + 1`` lies inside revcomp(T), i.e.
        the read maps to the '-' strand (fmindex.rs FMD text layout)."""
        G = self.G
        if p < G:  # forward-strand hit
            strand, off, gpos = "+", q0, p
        else:
            r0 = p - (G + 1)
            strand = "-"
            off = n - q0 - mlen  # offset in the oriented (rc) read
            gpos = G - r0 - mlen
        win_start = max(gpos - off - self.flank, 0)
        win_end = min(gpos - off + n + self.flank, G)
        return strand, win_start, win_end
