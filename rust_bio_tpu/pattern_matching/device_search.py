"""Batched exact text search on TPU: chunk-parallel Shift-And automaton.

TPU-native redesign of the classic bit-parallel matchers (reference
shift_and.rs:26-83; the published BNDM/Horspool/Shift-And benchmarks at
lib.rs:218-228 are all this workload): B patterns scan one text
simultaneously, AND the text itself is processed in parallel chunks.

Exact matching is (m-1)-local — a match ending at position t depends only
on the last m text bytes — so the text splits into C chunks with
``max_m - 1`` bytes of left overlap, turning the inherently sequential
automaton scan into a (C, B)-lane vector program whose sequential depth is
the chunk length, not the text length. Hits in the overlap region are
suppressed (the previous chunk owns them), so results are exactly the
reference's ``find_all`` start positions.

The per-step symbol mask lookup is a rank-compacted select over the
actual alphabet (a 256-row gather would scalarize on TPU).
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rust_bio_tpu.utils.text import to_bytes

U32 = jnp.uint32


@partial(jax.jit, static_argnums=(5,))
def _scan_windows(win_ranks, masks_small, accept, mlens, chunk, maxm: int):
    """win_ranks (C, W) int32, masks_small (S, B) uint32 -> hits (C, W, B)."""
    C, W = win_ranks.shape
    S, B = masks_small.shape

    def step(D, col):  # col: (C,) symbol ranks for this step
        mask_t = jnp.zeros((C, B), U32)
        for s in range(S):
            mask_t = jnp.where(
                (col == s)[:, None], masks_small[s][None, :], mask_t
            )
        D = ((D << 1) | jnp.uint32(1)) & mask_t
        hit = (D & accept[None, :]) != 0
        return D, hit

    D0 = jnp.zeros((C, B), U32)
    _, hits = jax.lax.scan(step, D0, jnp.swapaxes(win_ranks, 0, 1))
    return jnp.swapaxes(hits, 0, 1)  # (C, W, B)


class BatchShiftAnd:
    """Shift-And over a batch of patterns (each len <= 32), chunk-parallel.

    ``find_all(text)`` returns, per pattern, the sorted start positions of
    exact occurrences — identical to the scalar ``ShiftAnd.find_all``.
    """

    def __init__(self, patterns: Sequence) -> None:
        pats = [to_bytes(p) for p in patterns]
        assert pats, "need at least one pattern"
        for p in pats:
            assert 0 < len(p) <= 32, "device Shift-And needs 1 <= m <= 32"
        self.B = len(pats)
        self.mlens = np.array([len(p) for p in pats], np.int32)
        self.maxm = int(self.mlens.max())
        # rank-compact the alphabet actually used by the patterns; any
        # other text byte maps to rank 0 == "no pattern contains it"
        syms = sorted(set(b for p in pats for b in p))
        assert len(syms) < 255, "alphabet too large"
        self.sym_of = np.zeros(256, np.int32)  # 0 = not-in-any-pattern
        for r, s in enumerate(syms):
            self.sym_of[s] = r + 1
        S = len(syms) + 1
        masks = np.zeros((S, self.B), np.uint32)
        pats_arr = np.zeros((self.B, self.maxm), np.uint8)
        for b, p in enumerate(pats):
            pats_arr[b, : len(p)] = np.frombuffer(p, np.uint8)
        ranks = self.sym_of[pats_arr]  # (B, maxm)
        lanes = np.arange(self.B)
        for i in range(self.maxm):
            sel = i < self.mlens
            np.bitwise_or.at(
                masks, (ranks[sel, i], lanes[sel]), np.uint32(1) << np.uint32(i)
            )
        self.masks = jnp.asarray(masks)
        self.accept = jnp.asarray(
            (np.uint32(1) << (self.mlens.astype(np.uint32) - 1))
        )

    def _windows(self, text: bytes, chunk: int):
        T = len(text)
        ov = self.maxm - 1
        C = max(1, -(-T // chunk))
        W = chunk + ov
        ranks = self.sym_of[np.frombuffer(text, np.uint8)]
        # left-pad with rank 0 (kills the automaton; no false overlap hits)
        padded = np.zeros(ov + C * chunk, np.int32)
        padded[ov : ov + T] = ranks
        idx = (np.arange(C)[:, None] * chunk) + np.arange(W)[None, :]
        return padded[idx], C, W, T

    def find_all(self, text, chunk: int = 512) -> List[np.ndarray]:
        text = to_bytes(text)
        if len(text) == 0:
            return [np.zeros(0, np.int64) for _ in range(self.B)]
        win, C, W, T = self._windows(text, chunk)
        hits = np.asarray(
            _scan_windows(
                jnp.asarray(win), self.masks, self.accept,
                jnp.asarray(self.mlens), chunk, self.maxm,
            )
        )  # (C, W, B) bool
        ov = self.maxm - 1
        out = []
        for b in range(self.B):
            cs, ts = np.nonzero(hits[:, :, b])
            ends = cs * chunk + (ts - ov)  # global END positions
            keep = (ts >= ov) & (ends < T)
            starts = ends[keep] - (int(self.mlens[b]) - 1)
            out.append(np.sort(starts).astype(np.int64))
        return out

    def counts(self, text, chunk: int = 512) -> np.ndarray:
        """(B,) occurrence counts, reduced on device (only B ints leave
        the chip — the full hit matrix never materializes on the host)."""
        text = to_bytes(text)
        if len(text) == 0:
            return np.zeros(self.B, np.int64)
        win, C, W, T = self._windows(text, chunk)
        cnt = _scan_windows_counts(
            jnp.asarray(win), self.masks, self.accept,
            jnp.int32(T), chunk, self.maxm,
        )
        return np.asarray(cnt, np.int64)


@partial(jax.jit, static_argnums=(4, 5))
def _scan_windows_counts(win_ranks, masks_small, accept, T, chunk, maxm: int):
    C, W = win_ranks.shape
    S, B = masks_small.shape
    ov = maxm - 1
    ends0 = jnp.arange(C, dtype=jnp.int32)[:, None] * chunk  # (C, 1)

    def step(carry, xs):
        D, cnt = carry
        col, t = xs
        mask_t = jnp.zeros((C, B), U32)
        for s in range(S):
            mask_t = jnp.where(
                (col == s)[:, None], masks_small[s][None, :], mask_t
            )
        D = ((D << 1) | jnp.uint32(1)) & mask_t
        hit = (D & accept[None, :]) != 0
        valid = (t >= ov) & (ends0 + (t - ov) < T)  # (C, 1)
        cnt = cnt + (hit & valid).astype(jnp.int32)
        return (D, cnt), None

    D0 = jnp.zeros((C, B), U32)
    cnt0 = jnp.zeros((C, B), jnp.int32)
    (_, cnt), _ = jax.lax.scan(
        step,
        (D0, cnt0),
        (jnp.swapaxes(win_ranks, 0, 1), jnp.arange(W, dtype=jnp.int32)),
    )
    return cnt.sum(axis=0)
