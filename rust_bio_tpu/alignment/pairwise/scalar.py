"""Exact sequential generalized Smith-Waterman (semantic oracle).

Reference parity: src/alignment/pairwise/mod.rs:591-1015 (``Aligner::custom``
and the global/semiglobal/local presets). This implementation reproduces the
reference's recurrences, candidate comparison order (tie-breaking) and
traceback walk exactly, so the scores, operation sequences and clip lengths
it emits are bit-identical to the reference's. It is the oracle that the
batched TPU path (``batched.py``) is property-tested against; use the batched
path for throughput.
"""

from __future__ import annotations

from typing import List

import numpy as np

from rust_bio_tpu.alignment.types import (
    Alignment,
    AlignmentMode,
    AlignmentOperation,
    Del,
    Ins,
    Match,
    Subst,
    Xclip,
    Yclip,
)
from rust_bio_tpu.alignment.pairwise.scoring import MIN_SCORE, Scoring
from rust_bio_tpu.utils.text import to_bytes

# Traceback move codes (reference: pairwise/mod.rs:1036-1046)
TB_START = 0
TB_INS = 1
TB_DEL = 2
TB_SUBST = 3
TB_MATCH = 4
TB_XCLIP_PREFIX = 5
TB_XCLIP_SUFFIX = 6
TB_YCLIP_PREFIX = 7
TB_YCLIP_SUFFIX = 8

# Bit positions inside a packed 12-bit traceback cell
I_POS = 0
D_POS = 4
S_POS = 8


def pack_tb(i_bits: int, d_bits: int, s_bits: int) -> int:
    return i_bits | (d_bits << D_POS) | (s_bits << S_POS)


def get_i_bits(v: int) -> int:
    return v & 0xF


def get_d_bits(v: int) -> int:
    return (v >> D_POS) & 0xF


def get_s_bits(v: int) -> int:
    return (v >> S_POS) & 0xF


class _Cell:
    """Mutable traceback cell view into the packed matrix."""

    __slots__ = ("mat", "idx")

    def __init__(self, mat: np.ndarray, i: int, j: int):
        self.mat = mat
        self.idx = (i, j)

    def set_i(self, v: int) -> None:
        self.mat[self.idx] = (self.mat[self.idx] & ~0xF) | v

    def set_d(self, v: int) -> None:
        self.mat[self.idx] = (self.mat[self.idx] & ~(0xF << D_POS)) | (v << D_POS)

    def set_s(self, v: int) -> None:
        self.mat[self.idx] = (self.mat[self.idx] & ~(0xF << S_POS)) | (v << S_POS)


def custom_alignment(scoring: Scoring, x: bytes, y: bytes) -> Alignment:
    """Compute the custom-mode alignment of x against y.

    Direct sequential evaluation of the generalized affine-gap DP with clip
    penalties; see module docstring for parity guarantees.
    """
    m, n = len(x), len(y)
    go, ge = scoring.gap_open, scoring.gap_extend
    xcp, xcs = scoring.xclip_prefix, scoring.xclip_suffix
    ycp, ycs = scoring.yclip_prefix, scoring.yclip_suffix
    score_fn = scoring.score

    S = np.full((2, m + 1), MIN_SCORE, dtype=np.int64)
    I = np.full((2, m + 1), MIN_SCORE, dtype=np.int64)  # noqa: E741
    D = np.full((2, m + 1), MIN_SCORE, dtype=np.int64)
    Lx = np.zeros(n + 1, dtype=np.int64)
    Ly = np.zeros(m + 1, dtype=np.int64)
    Sn = np.full(m + 1, MIN_SCORE, dtype=np.int64)
    tb = np.zeros((m + 1, n + 1), dtype=np.int32)

    # --- initial conditions: column j = 0 (evaluated for both parities) ---
    for k in range(2):
        S[k, :] = MIN_SCORE
        I[k, :] = MIN_SCORE
        D[k, :] = MIN_SCORE
        S[k, 0] = 0

        if k == 0:
            tb[0, 0] = pack_tb(TB_START, TB_START, TB_START)
            Lx[:] = 0
            Ly[:] = 0
            Sn[:] = MIN_SCORE
            Sn[0] = ycs
            Ly[0] = n

        for i in range(1, m + 1):
            i_bits, d_bits, s_bits = TB_START, TB_START, TB_START
            if i == 1:
                I[k, i] = go
            else:
                i_score = go + ge * (i - 1)
                c_score = xcp + go  # clip, then insert
                if i_score > c_score:
                    I[k, i] = i_score
                    i_bits = TB_INS
                else:
                    I[k, i] = c_score
                    i_bits = TB_XCLIP_PREFIX

            if i == m:
                s_bits = TB_XCLIP_SUFFIX
            else:
                S[k, i] = MIN_SCORE

            if I[k, i] > S[k, i]:
                S[k, i] = I[k, i]
                s_bits = TB_INS

            if xcp > S[k, i]:
                S[k, i] = xcp
                s_bits = TB_XCLIP_PREFIX

            # track x-suffix-clip into the last row of this column
            if i != m and S[k, i] + xcs > S[k, m]:
                S[k, m] = S[k, i] + xcs
                Lx[0] = m - i

            if k == 0:
                tb[i, 0] = pack_tb(i_bits, d_bits, s_bits)

            # track y-suffix-clip from here
            if S[k, i] + ycs > Sn[i]:
                Sn[i] = S[k, i] + ycs
                Ly[i] = n

    # --- main column loop ---
    for j in range(1, n + 1):
        curr = j % 2
        prev = 1 - curr

        # i = 0 boundary
        cell0 = _Cell(tb, 0, j)
        tb[0, j] = 0
        I[curr, 0] = MIN_SCORE
        if j == 1:
            D[curr, 0] = go
            cell0.set_d(TB_START)
        else:
            d_score = go + ge * (j - 1)
            c_score = ycp + go
            if d_score > c_score:
                D[curr, 0] = d_score
                cell0.set_d(TB_DEL)
            else:
                D[curr, 0] = c_score
                cell0.set_d(TB_YCLIP_PREFIX)
        if D[curr, 0] > ycp:
            S[curr, 0] = D[curr, 0]
            cell0.set_s(TB_DEL)
        else:
            S[curr, 0] = ycp
            cell0.set_s(TB_YCLIP_PREFIX)

        if j == n and Sn[0] > S[curr, 0]:
            S[curr, 0] = Sn[0]
            cell0.set_s(TB_YCLIP_SUFFIX)
        elif S[curr, 0] + ycs > Sn[0]:
            Sn[0] = S[curr, 0] + ycs
            Ly[0] = n - j

        S[curr, 1:] = MIN_SCORE

        q = y[j - 1]
        xclip_score = xcp + max(ycp, go + ge * (j - 1))
        for i in range(1, m + 1):
            p = x[i - 1]
            i_bits, d_bits, s_bits = 0, 0, 0

            m_score = S[prev, i - 1] + score_fn(p, q)

            i_score = I[curr, i - 1] + ge
            s_score = S[curr, i - 1] + go
            if i_score > s_score:
                best_i_score = i_score
                i_bits = TB_INS
            else:
                best_i_score = s_score
                i_bits = get_s_bits(tb[i - 1, j])

            d_score = D[prev, i] + ge
            s_score = S[prev, i] + go
            if d_score > s_score:
                best_d_score = d_score
                d_bits = TB_DEL
            else:
                best_d_score = s_score
                d_bits = get_s_bits(tb[i, j - 1])

            s_bits = TB_XCLIP_SUFFIX
            best_s_score = S[curr, i]

            if m_score > best_s_score:
                best_s_score = m_score
                s_bits = TB_MATCH if p == q else TB_SUBST

            if best_i_score > best_s_score:
                best_s_score = best_i_score
                s_bits = TB_INS

            if best_d_score > best_s_score:
                best_s_score = best_d_score
                s_bits = TB_DEL

            if xclip_score > best_s_score:
                best_s_score = xclip_score
                s_bits = TB_XCLIP_PREFIX

            yclip_score = ycp + go + ge * (i - 1)
            if yclip_score > best_s_score:
                best_s_score = yclip_score
                s_bits = TB_YCLIP_PREFIX

            S[curr, i] = best_s_score
            I[curr, i] = best_i_score
            D[curr, i] = best_d_score

            if S[curr, i] + xcs > S[curr, m]:
                S[curr, m] = S[curr, i] + xcs
                Lx[j] = m - i

            if S[curr, i] + ycs > Sn[i]:
                Sn[i] = S[curr, i] + ycs
                Ly[i] = n - j

            tb[i, j] = pack_tb(i_bits, d_bits, s_bits)

    # --- suffix clipping fixups in the j = n column ---
    j = n
    curr = j % 2
    for i in range(0, m + 1):
        if Sn[i] > S[curr, i]:
            S[curr, i] = Sn[i]
            _Cell(tb, i, j).set_s(TB_YCLIP_SUFFIX)
        if S[curr, i] + xcs > S[curr, m]:
            S[curr, m] = S[curr, i] + xcs
            Lx[j] = m - i
            _Cell(tb, m, j).set_s(TB_XCLIP_SUFFIX)

    # last column of I may change because S changed
    for i in range(1, m + 1):
        s_score = S[curr, i - 1] + go
        if s_score > I[curr, i]:
            I[curr, i] = s_score
            _Cell(tb, i, j).set_i(get_s_bits(tb[i - 1, j]))
        if s_score > S[curr, i]:
            S[curr, i] = s_score
            _Cell(tb, i, j).set_s(TB_INS)
            if S[curr, i] + xcs > S[curr, m]:
                S[curr, m] = S[curr, i] + xcs
                Lx[j] = m - i
                _Cell(tb, m, j).set_s(TB_XCLIP_SUFFIX)

    # --- traceback walk (reference: mod.rs:845-908) ---
    i, j = m, n
    operations: List[AlignmentOperation] = []
    xstart, ystart, xend, yend = 0, 0, m, n

    last_layer = get_s_bits(tb[i, j])
    while True:
        if last_layer == TB_START:
            break
        if last_layer == TB_INS:
            operations.append(Ins)
            next_layer = get_i_bits(tb[i, j])
            i -= 1
        elif last_layer == TB_DEL:
            operations.append(Del)
            next_layer = get_d_bits(tb[i, j])
            j -= 1
        elif last_layer == TB_MATCH:
            operations.append(Match)
            next_layer = get_s_bits(tb[i - 1, j - 1])
            i -= 1
            j -= 1
        elif last_layer == TB_SUBST:
            operations.append(Subst)
            next_layer = get_s_bits(tb[i - 1, j - 1])
            i -= 1
            j -= 1
        elif last_layer == TB_XCLIP_PREFIX:
            operations.append(Xclip(i))
            xstart = i
            i = 0
            next_layer = get_s_bits(tb[0, j])
        elif last_layer == TB_XCLIP_SUFFIX:
            operations.append(Xclip(int(Lx[j])))
            i -= int(Lx[j])
            xend = i
            next_layer = get_s_bits(tb[i, j])
        elif last_layer == TB_YCLIP_PREFIX:
            operations.append(Yclip(j))
            ystart = j
            j = 0
            next_layer = get_s_bits(tb[i, 0])
        elif last_layer == TB_YCLIP_SUFFIX:
            operations.append(Yclip(int(Ly[i])))
            j -= int(Ly[i])
            yend = j
            next_layer = get_s_bits(tb[i, j])
        else:
            raise AssertionError("invalid traceback layer")
        last_layer = next_layer

    operations.reverse()
    return Alignment(
        score=int(S[n % 2, m]),
        ystart=ystart,
        xstart=xstart,
        yend=yend,
        xend=xend,
        ylen=n,
        xlen=m,
        operations=operations,
        mode=AlignmentMode.Custom,
    )


class Aligner:
    """Sequential aligner with the reference's public API.

    Reference parity: pairwise/mod.rs Aligner::{new, with_capacity,
    with_scoring, custom, global, semiglobal, local}.
    """

    def __init__(self, gap_open: int, gap_extend: int, match_fn) -> None:
        self.scoring = Scoring.new(gap_open, gap_extend, match_fn)

    @classmethod
    def new(cls, gap_open: int, gap_extend: int, match_fn) -> "Aligner":
        return cls(gap_open, gap_extend, match_fn)

    @classmethod
    def with_capacity(cls, _m, _n, gap_open, gap_extend, match_fn) -> "Aligner":
        return cls(gap_open, gap_extend, match_fn)

    @classmethod
    def with_scoring(cls, scoring: Scoring) -> "Aligner":
        self = cls.__new__(cls)
        self.scoring = scoring
        return self

    @classmethod
    def with_capacity_and_scoring(cls, _m, _n, scoring: Scoring) -> "Aligner":
        return cls.with_scoring(scoring)

    def custom(self, x, y) -> Alignment:
        return custom_alignment(self.scoring, to_bytes(x), to_bytes(y))

    def _with_clips(self, x, y, clips, mode, filter_clips) -> Alignment:
        saved = self.scoring
        self.scoring = self.scoring.with_clips(*clips)
        try:
            alignment = self.custom(x, y)
        finally:
            self.scoring = saved
        alignment.mode = mode
        if filter_clips:
            alignment.filter_clip_operations()
        return alignment

    def global_(self, x, y) -> Alignment:
        return self._with_clips(
            x,
            y,
            (MIN_SCORE, MIN_SCORE, MIN_SCORE, MIN_SCORE),
            AlignmentMode.Global,
            False,
        )

    def semiglobal(self, x, y) -> Alignment:
        return self._with_clips(
            x, y, (MIN_SCORE, MIN_SCORE, 0, 0), AlignmentMode.Semiglobal, True
        )

    def local(self, x, y) -> Alignment:
        return self._with_clips(
            x, y, (0, 0, 0, 0), AlignmentMode.Local, True
        )
