"""Batched FMD-index SMEM search on TPU (bwa-mem style seeding).

TPU-native redesign of the reference's per-position SMEM algorithm
(fmindex.rs:367-434): B (pattern, position) queries advance in lockstep.
The key restructuring: the reference's inner loop over the candidate list
(``prev``) performs independent backward extensions — only the dedup /
emission bookkeeping is sequential — so candidates live on a fixed slot
axis E and every outer step extends ALL candidates of ALL lanes with ONE
fused rank gather; the last-size dedup and the "first empty extension
emits" rule become cheap masked prefix logic over the slot axis.

A batched ``backward_ext`` computes occ for all 11 extension-order symbols
($TGCNAtgcna, fmindex.rs:520-540) of both interval ends in a single fused
gather, then selects/prefix-sums — exactly the reference's accumulation
loop, vectorized.

Parity: output SMEMs (BiInterval, start, match length) are identical to
``FMDIndex.smems`` / ``all_smems`` including duplicate candidate entries
from the forward-phase break path and emission tie rules (property-tested
against the host oracle). Lanes that overflow the E-slot or match caps are
flagged so callers can fall back to the host path (never silently wrong).
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rust_bio_tpu.alphabets import dna
from rust_bio_tpu.data_structures.fmindex import BiInterval, _EXT_ORDER
from rust_bio_tpu.data_structures.fm_device import DeviceFMIndex

I32 = jnp.int32


class DeviceFMDIndex:
    """FMD-index (T$revcomp(T)$ text) with batched SMEM search.

    ``device_fm``: a ``DeviceFMIndex`` built over the FMD text's BWT.
    """

    def __init__(self, device_fm: DeviceFMIndex) -> None:
        # the bidirectional SMEM kernels are int32-indexed; an FMD text
        # with n >= 2^31 (a > 1 Gbp genome doubled) needs the occ-sharded
        # multi-chip index, not this single-chip path
        assert not device_fm._big, (
            "DeviceFMDIndex requires n < 2^31 (use ShardedFMIndex for "
            "larger FMD texts)"
        )
        self.fm = device_fm
        sym_of = np.asarray(device_fm.sym_of)
        ext = np.frombuffer(_EXT_ORDER, np.uint8)
        self.ext_syms = jnp.asarray(
            np.maximum(sym_of[ext], 0).astype(np.int32)
        )
        self.ext_valid = jnp.asarray(sym_of[ext] >= 0)
        ext_pos = np.full(256, -1, np.int32)
        for p, b in enumerate(ext):
            ext_pos[b] = p
        self.ext_pos = jnp.asarray(ext_pos)
        # static cap: symbols actually present never need ext-order columns
        # past their own position (the reference breaks at the queried
        # symbol), so the fused gather shrinks to KE columns (6 for DNA+$)
        present = [b for b in ext if sym_of[b] >= 0]
        self.KE = int(max(ext_pos[b] for b in present)) + 1 if present else 1
        self.ext_syms_np = [
            int(max(sym_of[b], 0)) for b in ext[: self.KE]
        ]  # static symbol indices for the row-gather rank
        self.comp = jnp.asarray(np.asarray(dna.COMPLEMENT, np.uint8))
        self.less_b = device_fm.less  # (257,) by byte
        device_fm.ensure_row_layout()

    # -- batched bidirectional extensions -------------------------------
    def _backward_ext(self, lo, lor, sz, a, fused=None, fused_rows=None):
        """All shapes (N,); returns (lo', lor', sz').

        With ``fused_rows`` the KE-symbol rank pair at each end is ONE
        row-slice gather per position (vs KE element gathers)."""
        N = lo.shape[0]
        hi = lo + sz - 1
        pos2 = jnp.concatenate([lo - 1, hi])
        KE = self.KE
        if fused_rows is not None:
            ra = self.fm._rank_all(pos2, fused_rows)  # (2N, S)
            r2 = jnp.stack(
                [ra[:, si] for si in self.ext_syms_np], axis=1
            )  # (2N, KE) in extension order
        else:
            r2 = self.fm._rank(
                pos2[:, None], self.ext_syms[None, :KE], fused
            )  # (2N, KE)
        r2 = jnp.where(self.ext_valid[None, :KE], r2, 0)
        o_all = jnp.where(lo[:, None] > 0, r2[:N], 0)
        s_all = r2[N:] - o_all
        aidx = self.ext_pos[a.astype(I32)]  # (N,)
        take = lambda m: jnp.take_along_axis(m, aidx[:, None], axis=1)[:, 0]
        cums = jnp.cumsum(s_all, axis=1)
        ssel = take(s_all)
        lor_new = lor + (take(cums) - ssel)
        lo_new = self.less_b[a.astype(I32)] + take(o_all)
        return lo_new, lor_new, ssel

    def _forward_ext(self, lo, lor, sz, a, fused=None, fused_rows=None):
        ca = self.comp[a.astype(I32)]
        k2, l2, s2 = self._backward_ext(lor, lo, sz, ca, fused, fused_rows)
        return l2, k2, s2

    def _backward_ext_nolor(self, lo, sz, a, fused=None):
        """Backward extension WITHOUT the reverse-interval update: rank of
        only the queried symbol at both ends (1 gather column instead of
        KE).  Valid when the result is never forward-extended (the SMEM
        backward phase) and the caller ignores ``lor`` — the mapper path.
        Returns (lo', sz')."""
        N = lo.shape[0]
        hi = lo + sz - 1
        sym = self.fm.sym_of[a.astype(I32)]  # (N,)
        symc = jnp.maximum(sym, 0)
        r2 = self.fm._rank(
            jnp.concatenate([lo - 1, hi]), jnp.concatenate([symc, symc]), fused
        )
        o = jnp.where((lo > 0) & (sym >= 0), r2[:N], 0)
        s = jnp.where(sym >= 0, r2[N:], 0) - o
        lo_new = self.less_b[a.astype(I32)] + o
        return lo_new, s

    # -- batched SMEMs ---------------------------------------------------
    def _smems_kernel(
        self, pats, plens, iis, E: int, MC: int, l_min,
        mapper_mode: bool = False,
    ):
        """Thin wrapper: the occ table goes in as a runtime ARGUMENT (a
        jit closure would embed the genome-sized table as an HLO
        constant)."""
        return self._smems_impl(
            self.fm._fused, self.fm.ensure_row_layout(),
            pats, plens, iis, E, MC, l_min, mapper_mode
        )

    @partial(jax.jit, static_argnums=(0, 6, 7, 9))
    def _smems_impl(
        self, fused, fused_rows, pats, plens, iis, E: int, MC: int, l_min,
        mapper_mode: bool = False,
    ):
        B, L = pats.shape
        bidx = jnp.arange(B)

        # --- phase 1: forward extensions from position i ---------------
        a0 = pats[bidx, iis].astype(I32)
        lo = self.less_b[a0]
        lor = self.less_b[self.comp[a0].astype(I32)]
        sz = self.less_b[a0 + 1] - lo
        mlen = (sz != 0).astype(I32)

        slot = lambda dt=I32: jnp.zeros((B, E), dt)
        st0 = (
            jnp.int32(1), lo, lor, sz, mlen,
            slot(), slot(), slot(), slot(),  # slot arrays lo/lor/sz/mlen
            jnp.zeros(B, I32),  # cnt
            jnp.ones(B, bool),  # alive
            jnp.zeros(B, bool),  # overflow
        )

        def f_cond(st):
            return (st[0] <= L) & jnp.any(st[10])

        def f_body(st):
            t, lo, lor, sz, mlen, s_lo, s_lor, s_sz, s_ml, cnt, alive, ovf = st
            pos = iis + t
            in_rng = pos < plens
            a = pats[bidx, jnp.minimum(pos, L - 1)]
            flo, flor, fsz = self._forward_ext(
                lo, lor, sz, a, fused, fused_rows
            )
            app = alive & in_rng & (sz != fsz)
            onehot = (jnp.arange(E)[None, :] == cnt[:, None]) & app[:, None]
            s_lo = jnp.where(onehot, lo[:, None], s_lo)
            s_lor = jnp.where(onehot, lor[:, None], s_lor)
            s_sz = jnp.where(onehot, sz[:, None], s_sz)
            s_ml = jnp.where(onehot, mlen[:, None], s_ml)
            ovf = ovf | (app & (cnt >= E))
            cnt = cnt + app
            cont = alive & in_rng & (fsz != 0)
            lo = jnp.where(cont, flo, lo)
            lor = jnp.where(cont, flor, lor)
            sz = jnp.where(cont, fsz, sz)
            mlen = mlen + cont
            return (
                t + 1, lo, lor, sz, mlen,
                s_lo, s_lor, s_sz, s_ml, cnt, cont, ovf,
            )

        st = jax.lax.while_loop(f_cond, f_body, st0)
        _, lo, lor, sz, mlen, s_lo, s_lor, s_sz, s_ml, cnt, _, ovf = st
        # final append (reference appends the current interval once more)
        onehot = jnp.arange(E)[None, :] == cnt[:, None]
        s_lo = jnp.where(onehot, lo[:, None], s_lo)
        s_lor = jnp.where(onehot, lor[:, None], s_lor)
        s_sz = jnp.where(onehot, sz[:, None], s_sz)
        s_ml = jnp.where(onehot, mlen[:, None], s_ml)
        ovf = ovf | (cnt >= E)
        cnt = cnt + 1

        # reverse the slot order (phase 2 consumes newest-first)
        ridx = jnp.clip(cnt[:, None] - 1 - jnp.arange(E)[None, :], 0, E - 1)
        gat = lambda m: jnp.take_along_axis(m, ridx, axis=1)
        s_lo, s_lor, s_sz, s_ml = gat(s_lo), gat(s_lor), gat(s_sz), gat(s_ml)
        valid = jnp.arange(E)[None, :] < cnt[:, None]

        # --- phase 2: backward sweep k = i-1 .. -1 ----------------------
        m_slot = lambda: jnp.zeros((B, MC), I32)
        st0 = (
            jnp.int32(1),
            s_lo, s_lor, s_sz, s_ml, valid,
            plens.astype(I32),  # j
            m_slot(), m_slot(), m_slot(), m_slot(), m_slot(),  # matches
            jnp.zeros(B, I32),  # mcnt
            jnp.ones(B, bool),  # alive
            ovf,
        )

        def b_cond(st):
            return jnp.any(st[13])

        def make_b_body(Ecur: int):
            def b_body(st):
                (
                    tau, s_lo, s_lor, s_sz, s_ml, valid, j,
                    m_lo, m_lor, m_sz, m_st, m_ml, mcnt, alive, ovf,
                ) = st
                k = iis - tau
                a = jnp.where(
                    k == -1,
                    jnp.int32(ord("$")),
                    pats[bidx, jnp.maximum(k, 0)].astype(I32),
                ).astype(jnp.uint8)
                # extend every candidate slot of every lane in one fused
                # gather
                af = jnp.broadcast_to(a[:, None], (B, Ecur)).reshape(-1)
                if mapper_mode:
                    # the mapper never reads lower_rev and phase 2 never
                    # forward-extends: rank only the queried symbol (1
                    # gather column instead of KE = 6x fewer scalarized
                    # gathers)
                    elo, esz = self._backward_ext_nolor(
                        s_lo.reshape(-1), s_sz.reshape(-1), af, fused
                    )
                    elor = s_lor.reshape(-1)  # carried, never consumed
                else:
                    elo, elor, esz = self._backward_ext(
                        s_lo.reshape(-1), s_lor.reshape(-1),
                        s_sz.reshape(-1), af, fused, fused_rows
                    )
                elo = elo.reshape(B, Ecur)
                elor = elor.reshape(B, Ecur)
                esz = esz.reshape(B, Ecur)

                # last-size dedup + emission bookkeeping along the slot
                # axis
                can_app = valid & (esz != 0)
                appended = jnp.zeros((B, Ecur), bool)
                last = jnp.full((B,), -1, I32)
                emitted = jnp.zeros(B, bool)
                emit_slot = jnp.zeros(B, I32)
                any_before = jnp.zeros(B, bool)
                for e in range(Ecur):  # small, static; pure vector ops
                    app_e = can_app[:, e] & (esz[:, e] != last)
                    appended = appended.at[:, e].set(app_e)
                    last = jnp.where(app_e, esz[:, e], last)
                    em_e = (
                        valid[:, e]
                        & ((esz[:, e] == 0) | (k == -1))
                        & ~any_before
                        & ~emitted
                        & (k < j)
                        & (s_ml[:, e] >= l_min)
                    )
                    emit_slot = jnp.where(em_e, e, emit_slot)
                    emitted = emitted | em_e
                    any_before = any_before | app_e

                emitted = emitted & alive
                j = jnp.where(emitted, k, j)
                take_e = lambda m: jnp.take_along_axis(
                    m, emit_slot[:, None], axis=1
                )[:, 0]
                onehot = (
                    jnp.arange(MC)[None, :] == mcnt[:, None]
                ) & emitted[:, None]
                m_lo = jnp.where(onehot, take_e(s_lo)[:, None], m_lo)
                m_lor = jnp.where(onehot, take_e(s_lor)[:, None], m_lor)
                m_sz = jnp.where(onehot, take_e(s_sz)[:, None], m_sz)
                m_st = jnp.where(onehot, (k + 1)[:, None], m_st)
                m_ml = jnp.where(onehot, take_e(s_ml)[:, None], m_ml)
                ovf = ovf | (emitted & (mcnt >= MC))
                mcnt = mcnt + emitted

                appended = appended & alive[:, None]
                s_lo = jnp.where(appended, elo, s_lo)
                s_lor = jnp.where(appended, elor, s_lor)
                s_sz = jnp.where(appended, esz, s_sz)
                s_ml = jnp.where(appended, s_ml + 1, s_ml)
                valid = appended
                alive = alive & appended.any(axis=1) & (k > -1)
                return (
                    tau + 1, s_lo, s_lor, s_sz, s_ml, valid, j,
                    m_lo, m_lor, m_sz, m_st, m_ml, mcnt, alive, ovf,
                )

            return b_body

        def compact(st, EC: int):
            """Shrink the slot axis to EC, keeping valid slots in their
            relative order (stable sort on ~valid) so the dedup/emission
            scans see the exact same slot sequence.  Lanes with more than
            EC survivors are flagged ``ovf`` and retired — callers treat
            ovf lanes as 'retry wider / host oracle' and never read their
            results."""
            (
                tau, s_lo, s_lor, s_sz, s_ml, valid, j,
                m_lo, m_lor, m_sz, m_st, m_ml, mcnt, alive, ovf,
            ) = st
            order = jnp.argsort(~valid, axis=1, stable=True)[:, :EC]
            gat = lambda m: jnp.take_along_axis(m, order, axis=1)
            nvalid = valid.sum(axis=1)
            ovf = ovf | (alive & (nvalid > EC))
            alive = alive & (nvalid <= EC)
            return (
                tau, gat(s_lo), gat(s_lor), gat(s_sz), gat(s_ml),
                gat(valid), j,
                m_lo, m_lor, m_sz, m_st, m_ml, mcnt, alive, ovf,
            )

        # Survivor counts decay ~1 per step (measured, 100 bp reads at
        # 1 Mbp: max 5 by step 8, max 2 by step 12; genome scale shifts
        # right ~log4(n/1M) ~ 3 steps at 50 Mbp), so the slot axis — the
        # multiplier in EVERY phase-2 rank gather — shrinks on a fixed
        # schedule.  Each stage is its own while_loop; compaction between
        # stages preserves slot order, and lanes exceeding the narrowed
        # width take the normal ovf route.  ~2.8x fewer phase-2 gathers
        # at E=16.
        if mapper_mode and E >= 4:
            sched = [(10, E), (16, E // 2), (22, max(E // 4, 1)),
                     (None, max(E // 8, 1))]
        else:
            sched = [(None, E)]
        st = st0
        for si, (lim, Ecur) in enumerate(sched):
            body = make_b_body(Ecur)
            if lim is None:
                st = jax.lax.while_loop(b_cond, body, st)
            else:
                st = jax.lax.while_loop(
                    lambda s, lim=lim: b_cond(s) & (s[0] <= lim), body, st
                )
                st = compact(st, sched[si + 1][1])
        (_, *_rest) = st
        m_lo, m_lor, m_sz, m_st, m_ml = st[7:12]
        mcnt, _, ovf = st[12], st[13], st[14]
        return m_lo, m_lor, m_sz, m_st, m_ml, mcnt, ovf

    def smems_batch(
        self,
        patterns: Sequence,
        positions: Sequence[int],
        l: int,
        max_slots: int = 32,
        max_matches: int = 16,
        host_oracle=None,
        host_oracle_fn=None,
        mapper_mode: bool = False,
    ) -> List[List[Tuple[BiInterval, int, int]]]:
        """Per (pattern, position): the reference's ``smems(pattern, i, l)``.

        Lanes that overflow the device caps fall back to ``host_oracle``
        (an ``FMDIndex``, or the lazy ``host_oracle_fn`` supplier) when
        given, else raise.

        ``mapper_mode=True`` skips the reverse-interval (``lower_rev``)
        updates in the backward phase — (lower, size, start, len) stay
        exact, ``BiInterval.lower_rev`` of the results is unspecified.
        6x fewer rank gathers; for callers that only locate/extend.
        """
        return self.smems_collect(
            self.smems_dispatch(
                patterns, positions, l, max_slots, max_matches, mapper_mode
            ),
            host_oracle=host_oracle,
            host_oracle_fn=host_oracle_fn,
        )

    def smems_dispatch(
        self,
        patterns: Sequence,
        positions: Sequence[int],
        l: int,
        max_slots: int = 32,
        max_matches: int = 16,
        mapper_mode: bool = False,
    ):
        """Async half of ``smems_batch``: launches the device kernel and
        returns a handle WITHOUT a host sync, so a stream driver can
        overlap the next batch's SMEM search with this batch's assembly."""
        from rust_bio_tpu.utils.text import to_array

        pats = [to_array(p) for p in patterns]
        B = len(pats)
        L = max((len(p) for p in pats), default=1) or 1
        pb = np.zeros((B, L), np.uint8)
        plens = np.zeros(B, np.int32)
        for i, p in enumerate(pats):
            pb[i, : len(p)] = p
            plens[i] = len(p)
        iis = np.asarray(positions, np.int32)
        outs = self._smems_kernel(
            jnp.asarray(pb),
            jnp.asarray(plens),
            jnp.asarray(iis),
            max_slots,
            max_matches,
            jnp.int32(l),
            mapper_mode,
        )
        # ONE device->host pull later: each np.asarray pays a full tunnel
        # round trip (~26 ms), so 7 separate pulls cost more than the kernel
        packed_dev = jnp.concatenate(
            [jnp.asarray(v, jnp.int32).reshape(B, -1) for v in outs], axis=1
        )
        return (pats, iis, int(max_matches), int(l), packed_dev)

    def smems_collect(
        self, handle, host_oracle=None, host_oracle_fn=None
    ) -> List[List[Tuple[BiInterval, int, int]]]:
        """Sync half of ``smems_batch``: pulls + decodes a dispatch handle."""
        pats, iis, MC5, l, packed_dev = handle
        B = len(pats)
        packed = np.asarray(packed_dev)
        m_lo = packed[:, 0:MC5]
        m_lor = packed[:, MC5 : 2 * MC5]
        m_sz = packed[:, 2 * MC5 : 3 * MC5]
        m_st = packed[:, 3 * MC5 : 4 * MC5]
        m_ml = packed[:, 4 * MC5 : 5 * MC5]
        mcnt = packed[:, 5 * MC5]
        ovf = packed[:, 5 * MC5 + 1].astype(bool)
        out: List[List[Tuple[BiInterval, int, int]]] = []
        for b in range(B):
            if ovf[b]:
                if host_oracle is None and host_oracle_fn is not None:
                    host_oracle = host_oracle_fn()
                assert host_oracle is not None, (
                    "device SMEM capacity overflow; pass host_oracle"
                )
                out.append(host_oracle.smems(bytes(pats[b]), int(iis[b]), l))
                continue
            lane = []
            for t in range(int(mcnt[b])):
                lane.append(
                    (
                        BiInterval(
                            int(m_lo[b, t]), int(m_lor[b, t]),
                            int(m_sz[b, t]), int(m_ml[b, t]),
                        ),
                        int(m_st[b, t]),
                        int(m_ml[b, t]),
                    )
                )
            out.append(lane)
        return out


    def all_smems_batch(
        self,
        patterns: Sequence,
        l: int,
        max_slots: int = 32,
        max_matches: int = 16,
        host_oracle=None,
    ) -> List[List[Tuple[BiInterval, int, int]]]:
        """Per pattern: the reference's ``all_smems(pattern, l)``.

        The per-read cursor loop (fmindex.rs:477-495) runs host-side with
        STABLE shapes: every round calls the device kernel on the full
        padded batch (finished reads ride along masked) so the kernel
        compiles once; rounds end when every cursor passes its read end
        (2-4 rounds for typical error rates).
        """
        from rust_bio_tpu.utils.text import to_array

        pats = [to_array(p) for p in patterns]
        B = len(pats)
        L = max((len(p) for p in pats), default=1) or 1
        pb = np.zeros((B, L), np.uint8)
        plens = np.zeros(B, np.int32)
        for i, p in enumerate(pats):
            pb[i, : len(p)] = p
            plens[i] = len(p)
        pb_d = jnp.asarray(pb)
        pl_d = jnp.asarray(plens)

        out: List[List[Tuple[BiInterval, int, int]]] = [[] for _ in range(B)]
        cursor = np.zeros(B, np.int64)
        while True:
            active = np.nonzero(cursor < plens)[0]
            if active.size == 0:
                break
            iis = np.minimum(cursor, np.maximum(plens - 1, 0)).astype(np.int32)
            m_lo, m_lor, m_sz, m_st, m_ml, mcnt, ovf = (
                np.asarray(v)
                for v in self._smems_kernel(
                    pb_d, pl_d, jnp.asarray(iis),
                    max_slots, max_matches, jnp.int32(l),
                )
            )
            for b in active:
                b = int(b)
                if ovf[b]:
                    assert host_oracle is not None, (
                        "device SMEM capacity overflow; pass host_oracle"
                    )
                    lane = host_oracle.smems(bytes(pats[b]), int(iis[b]), l)
                else:
                    lane = [
                        (
                            BiInterval(
                                int(m_lo[b, t]), int(m_lor[b, t]),
                                int(m_sz[b, t]), int(m_ml[b, t]),
                            ),
                            int(m_st[b, t]),
                            int(m_ml[b, t]),
                        )
                        for t in range(int(mcnt[b]))
                    ]
                nxt = cursor[b] + 1
                for _, p, ln in lane:
                    if p + ln > nxt:
                        nxt = p + ln
                cursor[b] = nxt
                out[b].extend(lane)
        return out
