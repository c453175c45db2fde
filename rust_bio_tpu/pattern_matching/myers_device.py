"""Batched Myers bit-parallel matching on TPU.

TPU-native redesign of the reference's Myers search (simple.rs:95-117 and
the block-based long.rs:46-120): instead of one u64 register advancing over
one text, B independent (pattern, text) lanes advance in lockstep, each lane
carrying its bit-vector state as W uint32 words — shape (B, W). The text
scan is one ``lax.scan``; multi-word carry/shift chains are unrolled at
trace time (W is static), so any pattern length is supported (the reference
``long`` variant's block decomposition becomes just W > 1).

Outputs are bit-exact with the host oracle ``myers.Myers`` (property-tested
in tests/test_myers_device.py).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rust_bio_tpu.utils.text import to_bytes

U32 = jnp.uint32
I32 = jnp.int32
_MASK32 = np.uint32(0xFFFFFFFF)


def _add_words(x: List, y: List) -> List:
    """Multi-word add (LSB word first), carry chain unrolled over W."""
    out = []
    carry = None
    for xw, yw in zip(x, y):
        s = xw + yw if carry is None else xw + yw + carry
        # carry-out: unsigned overflow detection on uint32 wraparound
        c1 = s < xw
        if carry is not None:
            c2 = (s == xw) & (carry == 1)
            carry = (c1 | c2).astype(U32)
        else:
            carry = c1.astype(U32)
        out.append(s)
    return out


def _shl1(x: List) -> List:
    """Multi-word logical shift left by one bit."""
    out = []
    prev_hi = None
    for xw in x:
        w = xw << 1
        if prev_hi is not None:
            w = w | prev_hi
        prev_hi = xw >> 31
        out.append(w)
    return out


class BatchMyers:
    """A batch of Myers matchers, one pattern per lane.

    All patterns share a word count W = ceil(max_m / 32); shorter patterns
    are exact thanks to per-lane ``bound`` masks and initial distances.
    """

    def __init__(self, patterns: Sequence, wildcards: Optional[bytes] = None):
        pats = [to_bytes(p) for p in patterns]
        B = len(pats)
        ms = np.array([len(p) for p in pats], dtype=np.int32)
        assert (ms > 0).all(), "Pattern is empty"
        W = int((ms.max() + 31) // 32)
        peq = np.zeros((B, 256, W), dtype=np.uint32)
        for b, p in enumerate(pats):
            for i, symbol in enumerate(p):
                peq[b, symbol, i >> 5] |= np.uint32(1) << np.uint32(i & 31)
            if wildcards:
                for w in wildcards:
                    peq[b, w, :] = _MASK32
        bound = np.zeros((B, W), dtype=np.uint32)
        bound[np.arange(B), (ms - 1) >> 5] = np.uint32(1) << (
            (ms - 1) & 31
        ).astype(np.uint32)
        self.B, self.W = B, W
        self.ms = jnp.asarray(ms)
        self.peq = jnp.asarray(peq)
        self.bound = jnp.asarray(bound)

    @partial(jax.jit, static_argnums=(0,))
    def _scan_kernel(self, texts, tlens):
        """Distances at every text end position: (N, B) int32 (garbage past
        tlens, mask downstream)."""
        B, W = self.B, self.W
        N = texts.shape[1]
        bidx = jnp.arange(B)

        def step(carry, a):
            pv, mv, dist = carry  # pv/mv: (B, W); dist: (B,)
            eq = self.peq[bidx, a.astype(I32)]  # (B, W)
            eqw = [eq[:, w] for w in range(W)]
            pvw = [pv[:, w] for w in range(W)]
            mvw = [mv[:, w] for w in range(W)]

            xv = [e | m for e, m in zip(eqw, mvw)]
            anded = [e & p for e, p in zip(eqw, pvw)]
            summed = _add_words(anded, pvw)
            xh = [(s ^ p) | e for s, p, e in zip(summed, pvw, eqw)]
            ph = [m | ~(x | p) for m, x, p in zip(mvw, xh, pvw)]
            mh = [p & x for p, x in zip(pvw, xh)]

            phb = jnp.zeros(B, bool)
            mhb = jnp.zeros(B, bool)
            for w in range(W):
                phb = phb | ((ph[w] & self.bound[:, w]) != 0)
                mhb = mhb | ((mh[w] & self.bound[:, w]) != 0)
            dist = dist + phb.astype(I32) - mhb.astype(I32)

            ph = _shl1(ph)
            mh = _shl1(mh)
            pv_n = [m | ~(x | p) for m, x, p in zip(mh, xv, ph)]
            mv_n = [p & x for p, x in zip(ph, xv)]
            pv2 = jnp.stack(pv_n, axis=1)
            mv2 = jnp.stack(mv_n, axis=1)
            return (pv2, mv2, dist), dist

        pv0 = jnp.full((B, W), _MASK32, dtype=U32)
        mv0 = jnp.zeros((B, W), dtype=U32)
        (_, _, _), dists = jax.lax.scan(
            step, (pv0, mv0, self.ms), jnp.swapaxes(texts, 0, 1)
        )
        return dists  # (N, B)

    # ------------------------------------------------------------------
    def _pad(self, texts: Sequence) -> Tuple[np.ndarray, np.ndarray]:
        ts = [to_bytes(t) for t in texts]
        assert len(ts) == self.B
        N = max((len(t) for t in ts), default=1) or 1
        tb = np.zeros((self.B, N), dtype=np.uint8)
        tlens = np.zeros(self.B, dtype=np.int32)
        for i, t in enumerate(ts):
            tb[i, : len(t)] = np.frombuffer(t, dtype=np.uint8)
            tlens[i] = len(t)
        return tb, tlens

    def distance_batch(self, texts: Sequence) -> np.ndarray:
        """Min edit distance per lane (reference ``distance``)."""
        tb, tlens = self._pad(texts)
        dists = np.asarray(self._scan_kernel(jnp.asarray(tb), jnp.asarray(tlens)))
        ms = np.asarray(self.ms)
        pos = np.arange(dists.shape[0])[:, None]
        masked = np.where(pos < tlens[None, :], dists, np.iinfo(np.int32).max)
        out = masked.min(axis=0)
        return np.where(tlens > 0, out, ms)

    def find_all_end_batch(
        self, texts: Sequence, max_dist: int
    ) -> List[List[Tuple[int, int]]]:
        """Per lane: list of (end, dist) hits (reference ``find_all_end``)."""
        tb, tlens = self._pad(texts)
        dists = np.asarray(self._scan_kernel(jnp.asarray(tb), jnp.asarray(tlens)))
        out: List[List[Tuple[int, int]]] = []
        for b in range(self.B):
            d = dists[: tlens[b], b]
            hits = np.nonzero(d <= max_dist)[0]
            out.append([(int(e), int(d[e])) for e in hits])
        return out

    def find_best_end_batch(self, texts: Sequence) -> np.ndarray:
        """(B, 2) array of (first best end, best dist) per lane."""
        tb, tlens = self._pad(texts)
        dists = np.asarray(self._scan_kernel(jnp.asarray(tb), jnp.asarray(tlens)))
        pos = np.arange(dists.shape[0])[:, None]
        masked = np.where(pos < tlens[None, :], dists, np.iinfo(np.int32).max)
        best = masked.min(axis=0)
        first = masked.argmin(axis=0)
        return np.stack([first, best], axis=1)


# ---------------------------------------------------------------------------
# Chunk-parallel approximate search over ONE long text
# ---------------------------------------------------------------------------
#
# An approximate match with <= k edits ending at text position t spans at
# most m + k text characters, so the text splits into C chunks with
# ``max_m + k - 1`` characters of left overlap and every chunk runs a
# FRESH automaton in its own vector lane: sequential depth becomes the
# chunk length instead of the text length. Sentinel padding on the left
# edge is exact: an alignment consuming s sentinels (s substitutions)
# costs the same as deleting those pattern characters instead. The
# per-step peq lookup is a rank-compacted select (a 256-row gather
# scalarizes on TPU); non-pattern text bytes share one "other" rank whose
# row is the wildcard mask, and the sentinel rank has an all-zero row so
# padding can never match (not even wildcards).


class ChunkedMyers:
    """B patterns searched in one shared text, chunk-parallel."""

    def __init__(self, patterns: Sequence, wildcards: Optional[bytes] = None):
        self.inner = BatchMyers(patterns, wildcards)
        peq = np.asarray(self.inner.peq)  # (B, 256, W)
        pats = [to_bytes(p) for p in patterns]
        self._pats = pats
        self._wildcards = wildcards
        syms = sorted(set(b for p in pats for b in p))
        unseen = next((s for s in range(256) if s not in set(syms)), None)
        assert unseen is not None, "need at least one unused byte value"
        self.sym_of = np.zeros(256, np.int32)  # rank 0 = "other byte"
        for r, s in enumerate(syms):
            self.sym_of[s] = r + 1
        S = len(syms) + 2  # + other(0) + sentinel(S-1)
        B, _, W = peq.shape
        small = np.zeros((S, B, W), np.uint32)
        small[0] = peq[:, unseen]  # wildcard mask (zeros if no wildcards)
        for r, s in enumerate(syms):
            small[r + 1] = peq[:, s]
        self.peq_small = jnp.asarray(small)  # sentinel row stays zero
        self.S = S
        self.sent = S - 1
        self.maxm = int(np.asarray(self.inner.ms).max())

    def _windows(self, text: bytes, k: int, chunk: int):
        T = len(text)
        ov = self.maxm + k - 1
        C = max(1, -(-T // chunk))
        Wn = chunk + ov
        ranks = self.sym_of[np.frombuffer(text, np.uint8)]
        padded = np.full(ov + C * chunk, self.sent, np.int32)
        padded[ov : ov + T] = ranks
        idx = (np.arange(C)[:, None] * chunk) + np.arange(Wn)[None, :]
        return padded[idx], C, Wn, T, ov

    @partial(jax.jit, static_argnums=(0, 2))
    def _kernel(self, win_ranks, emit_states: bool = False):
        """win_ranks (C, Wn) -> per-step distances (Wn, C, B) int32;
        with ``emit_states`` also the post-column (pv, mv) states
        ((Wn, C, B, W) uint32 each) for O(m+k) traceback."""
        inner = self.inner
        B, W = inner.B, inner.W
        C = win_ranks.shape[0]

        def step(carry, col):
            pv, mv, dist = carry  # (C, B, W) x2, (C, B)
            eq = jnp.zeros((C, B, W), U32)
            for s in range(self.S - 1):  # sentinel row is all-zero
                eq = jnp.where(
                    (col == s)[:, None, None], self.peq_small[s][None], eq
                )
            eqw = [eq[:, :, w] for w in range(W)]
            pvw = [pv[:, :, w] for w in range(W)]
            mvw = [mv[:, :, w] for w in range(W)]

            xv = [e | m for e, m in zip(eqw, mvw)]
            anded = [e & p for e, p in zip(eqw, pvw)]
            summed = _add_words(anded, pvw)
            xh = [(s_ ^ p) | e for s_, p, e in zip(summed, pvw, eqw)]
            ph = [m | ~(x | p) for m, x, p in zip(mvw, xh, pvw)]
            mh = [p & x for p, x in zip(pvw, xh)]

            phb = jnp.zeros((C, B), bool)
            mhb = jnp.zeros((C, B), bool)
            for w in range(W):
                phb = phb | ((ph[w] & inner.bound[None, :, w]) != 0)
                mhb = mhb | ((mh[w] & inner.bound[None, :, w]) != 0)
            dist = dist + phb.astype(I32) - mhb.astype(I32)

            ph = _shl1(ph)
            mh = _shl1(mh)
            pv_n = [m | ~(x | p) for m, x, p in zip(mh, xv, ph)]
            mv_n = [p & x for p, x in zip(ph, xv)]
            pv_s = jnp.stack(pv_n, axis=2)
            mv_s = jnp.stack(mv_n, axis=2)
            y = (dist, pv_s, mv_s) if emit_states else dist
            return (pv_s, mv_s, dist), y

        pv0 = jnp.full((C, B, W), _MASK32, dtype=U32)
        mv0 = jnp.zeros((C, B, W), dtype=U32)
        d0 = jnp.broadcast_to(inner.ms[None, :], (C, B))
        _, out = jax.lax.scan(
            step, (pv0, mv0, d0), jnp.swapaxes(win_ranks, 0, 1)
        )
        return out  # (Wn, C, B) [, states (Wn, C, B, W) x2]

    def find_all_end(
        self, text, max_dist: int, chunk: int = 128
    ) -> List[List[Tuple[int, int]]]:
        """Per pattern: sorted (end, dist) hits with dist <= max_dist —
        identical to the reference ``find_all_end`` on the whole text."""
        text = to_bytes(text)
        B = self.inner.B
        if len(text) == 0:
            return [[] for _ in range(B)]
        win, C, Wn, T, ov = self._windows(text, max_dist, chunk)
        dists = np.asarray(self._kernel(jnp.asarray(win)))  # (Wn, C, B)
        out: List[List[Tuple[int, int]]] = []
        ts = np.arange(Wn)
        for b in range(B):
            d = dists[:, :, b]  # (Wn, C)
            tt, cc = np.nonzero(d <= max_dist)
            ends = cc * chunk + (tt - ov)
            keep = (tt >= ov) & (ends < T)
            ee, dd = ends[keep], d[tt[keep], cc[keep]]
            order = np.argsort(ee, kind="stable")
            out.append([(int(e), int(v)) for e, v in zip(ee[order], dd[order])])
        return out

    def find_all_lazy(
        self, text, max_dist: int, chunk: int = 128
    ) -> "ChunkedLazyMatches":
        """Hits + O(m+k) path recovery from DEVICE-stored column states
        (the long-text analogue of the reference's ``find_all_lazy``,
        myers_impl.rs:500-635): a second kernel pass over only the
        hit-containing windows emits the (pv, mv) state stream, and each
        hit's path is recovered by the stored-state walk — no O(mn)
        window DP per hit."""
        text = to_bytes(text)
        hits = self.find_all_end(text, max_dist, chunk)
        return ChunkedLazyMatches(self, text, max_dist, hits, chunk)


class ChunkedLazyMatches:
    """Hit set of ``ChunkedMyers.find_all_lazy`` with stored-state path
    recovery.

    State windows use a 2(m+k)-overlap so every cell the traceback walk
    examines (D <= k+1 near the path) has its optimal start inside the
    window — the window states then agree with full-scan states on every
    examined bit, making paths identical to the reference walk."""

    def __init__(self, cm: ChunkedMyers, text: bytes, max_dist: int,
                 hits, chunk: int) -> None:
        self.cm = cm
        self.text = text
        self.k = max_dist
        self.hits = hits  # per pattern: sorted (end, dist)
        self.chunk = chunk
        self._states = None  # window -> (pv (Wn2, B, W), mv) numpy
        self._host = {}

    # -- state materialization (once, batched over needed windows) ------
    def _materialize(self):
        if self._states is not None:
            return
        cm, chunk = self.cm, self.chunk
        T = len(self.text)
        ov2 = 2 * (cm.maxm + self.k) + 4
        need = sorted(
            {e // chunk for lane in self.hits for (e, _d) in lane}
        )
        self._ov2 = ov2
        self._wins = {}
        if not need:
            self._states = {}
            return
        Wn2 = chunk + ov2
        ranks = cm.sym_of[np.frombuffer(self.text, np.uint8)]
        padded = np.full(ov2 + (T + chunk - 1) // chunk * chunk, cm.sent,
                         np.int32)
        padded[ov2 : ov2 + T] = ranks
        sel = np.asarray(need, np.int64)
        idx = (sel[:, None] * chunk) + np.arange(Wn2)[None, :]
        win = padded[idx]
        _d, pv, mv = jax.tree.map(
            np.asarray,
            cm._kernel(jnp.asarray(win), True),
        )  # (Wn2, Csel, B, W)
        self._states = {c: (pv[:, i], mv[:, i]) for i, c in enumerate(need)}

    def _host_myers(self, b: int):
        if b not in self._host:
            from rust_bio_tpu.pattern_matching.myers import Myers

            self._host[b] = Myers(
                self.cm._pats[b], wildcards=self.cm._wildcards
            )
        return self._host[b]

    class _StatesView:
        """states[g] -> (pv, mv) python ints for global column g+1."""

        def __init__(self, pv, mv, base: int, b: int, W: int) -> None:
            self.pv, self.mv, self.base, self.b, self.W = pv, mv, base, b, W

        def __getitem__(self, g: int):
            t = g - self.base
            assert t >= 0, "traceback walked past the state window"
            pvw = self.pv[t, self.b]
            mvw = self.mv[t, self.b]
            p = m = 0
            for w in range(self.W - 1, -1, -1):
                p = (p << 32) | int(pvw[w])
                m = (m << 32) | int(mvw[w])
            return p, m

    def path_at(self, b: int, end: int):
        """(start, dist, ops) for pattern ``b``'s hit ending at ``end``
        (inclusive), recovered in O(m+k) from the stored states."""
        self._materialize()
        dist = next((d for (e, d) in self.hits[b] if e == end), None)
        assert dist is not None, f"no hit at end={end}"
        c = end // self.chunk
        pv, mv = self._states[c]
        base = c * self.chunk - self._ov2
        view = self._StatesView(pv, mv, base, b, self.cm.inner.W)
        my = self._host_myers(b)
        start, d2, ops = my._traceback(
            self.text, end, ({end: dist}, view)
        )
        return start, d2, ops

    def alignment_at(self, b: int, end: int):
        """Reference-style Alignment for the hit (ystart/yend in text)."""
        from rust_bio_tpu.alignment.types import Alignment, AlignmentMode

        start, dist, ops = self.path_at(b, end)
        return Alignment(
            score=dist, ystart=start, yend=end + 1, xstart=0,
            xend=len(self.cm._pats[b]), xlen=len(self.cm._pats[b]),
            ylen=len(self.text), operations=ops,
            mode=AlignmentMode.Semiglobal,
        )
