"""Batch-lockstep generalized Smith-Waterman for TPU.

TPU-native re-design of the reference's column-major sequential DP
(src/alignment/pairwise/mod.rs:591-920):

- **Batch in vector lanes**: B independent (x, y) pairs advance in lockstep.
- **Query positions in sublanes**: each DP column is computed as one
  vectorized step over all rows i=0..M; the only true in-column dependency
  (the insertion matrix ``I``) is a (max, +) linear recurrence, evaluated as
  a parallel prefix scan ``I[i] = cummax(T[i] - i*ge) + i*ge``.
- **Columns via lax.scan**: the j loop is a single fused scan; per-pair
  length masking freezes a pair's carried state once ``j > n_i`` so padded
  batches stay bit-exact. With constant match/mismatch scoring the column
  scan instead runs as a Pallas kernel (ops/sw_pallas.py) that keeps the
  DP state VMEM-resident.
- **Bitpacked traceback in HBM**: 12-bit cells (I/D/S layers, 4 bits each,
  same encoding as the reference's TracebackCell) in uint16, written per
  column; the traceback is a batched lockstep walk (one gather per step).

The stages are factored so both scan engines share the exact same prelude
(init column) and postlude (suffix fixups, traceback assembly, walk):
``_init_column`` → ``_scan_columns_xla`` | Pallas → ``_suffix_fixups`` →
``_walk``.

Exactness: candidate evaluation order, strict-> tie-breaking, the row-``m``
suffix-clip accumulator, the ``j == n`` boundary branch and both post-loop
fixup passes replicate the reference semantics; scores, operations and clip
lengths are bit-identical (property-tested against ``scalar.py``).

Requires ``gap_open <= gap_extend`` (the standard affine regime): the prefix
scan rewrites ``max(I[i-1]+ge, S[i-1]+go)`` as ``max(I[i-1]+ge, S~[i-1]+go)``
with ``S~`` the non-insertion score, which is an identity exactly when
chained opens are dominated by extends.
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

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
from rust_bio_tpu.alignment.pairwise.scoring import (
    MIN_SCORE,
    MatchParams,
    Scoring,
)
from rust_bio_tpu.alignment.pairwise.scalar import (
    TB_DEL,
    TB_INS,
    TB_MATCH,
    TB_START,
    TB_SUBST,
    TB_XCLIP_PREFIX,
    TB_XCLIP_SUFFIX,
    TB_YCLIP_PREFIX,
    TB_YCLIP_SUFFIX,
)
from rust_bio_tpu.utils.text import to_bytes

I32 = jnp.int32
MIN = MIN_SCORE


def _pack(i_bits, d_bits, s_bits):
    """12-bit cell packed into uint16 (halves traceback HBM traffic)."""
    return (i_bits | (d_bits << 4) | (s_bits << 8)).astype(jnp.uint16)


def _unpack(cell):
    cell = cell.astype(I32)
    return cell & 0xF, (cell >> 4) & 0xF, (cell >> 8) & 0xF


def _priority_max(init_val, init_bits, candidates):
    """Sequential strict-> candidate selection (reference tie-breaking).

    ``candidates`` is a list of (value, bits) in reference evaluation order;
    an earlier candidate wins ties against all later ones.
    """
    best, bits = init_val, init_bits
    for v, b in candidates:
        take = v > best
        best = jnp.where(take, v, best)
        bits = jnp.where(take, b, bits)
    return best, bits


_SENTINEL = np.int32(np.iinfo(np.int32).min)


def _cummax1(u):
    """Running max along axis 1 via log-step shifted maxima.

    Equivalent to ``lax.cummax(u, axis=1)``; written with shifts so the
    same code lowers under Mosaic (Pallas) as well as XLA.
    """
    B, m = u.shape
    k = 1
    while k < m:
        shifted = jnp.concatenate(
            [jnp.full((B, k), _SENTINEL, u.dtype), u[:, :-k]], axis=1
        )
        u = jnp.maximum(u, shifted)
        k *= 2
    return u


def _first_argmax_acc(vals, mask):
    """Running strict-max accumulator over axis 1 starting at MIN_SCORE.

    Returns (max value, index of the first element attaining it, whether any
    update happened). Masked-out entries never update (the sentinel is
    INT32_MIN: real candidate values can legitimately fall below MIN_SCORE).
    Mirrors the reference's sequential ``if v > acc`` tracking.
    """
    masked = jnp.where(mask, vals, _SENTINEL)
    best = jnp.max(masked, axis=1, keepdims=True)  # (B, 1)
    updated = best > MIN
    hit = masked == best
    cols = lax.broadcasted_iota(I32, masked.shape, 1)
    big = jnp.int32(np.iinfo(np.int32).max)
    first = jnp.min(
        jnp.where(hit, cols, big), axis=1, keepdims=True
    ).astype(I32)
    return best, first, updated


def _subs_einsum(xb, yb, lut, n_syms: int = 32):
    """Substitution scores subs[b, i-1, j-1] via one-hot einsum on the MXU.

    A direct (256,256) LUT gather over (B, M, N) is pathologically slow on
    TPU (gathers scalarize); instead recode symbols to dense ranks over the
    symbols actually present and contract one-hot encodings against the
    compacted score table. f32 keeps i32 scores exact up to 2^24.

    ``n_syms`` (static) must be >= the number of distinct bytes in the
    batch (the dispatcher buckets it); the fill value -1 can never equal a
    byte, so padded slots have an all-zero one-hot column.
    """
    syms = jnp.unique(
        jnp.concatenate([xb.ravel(), yb.ravel()]).astype(I32),
        size=n_syms,
        fill_value=-1,
    )  # (n_syms,) int32
    small_lut = lut[jnp.clip(syms, 0)[:, None], jnp.clip(syms, 0)[None, :]]
    onehot_x = (xb[:, :, None] == syms[None, None, :]).astype(jnp.float32)
    onehot_y = (yb[:, :, None] == syms[None, None, :]).astype(jnp.float32)
    return jnp.einsum(
        "bms,st,bnt->bmn",
        onehot_x,
        small_lut.astype(jnp.float32),
        onehot_y,
        preferred_element_type=jnp.float32,
    ).astype(I32)  # (B, M, N)


def _init_column(B, M, rows, row_ge1, mlens, nlens, mlens_c, is_row_m, pens):
    """The j = 0 init column (reference custom() :597-672)."""
    go, ge, xcp, xcs, ycp, ycs = pens

    # I_init: i==1 -> go; else max(go+ge*(i-1), xcp+go) (ties -> clip)
    gap_i = go + ge * (rows - 1)
    clip_i = xcp + go
    ins_wins = gap_i > clip_i
    I0 = jnp.where(rows == 1, go, jnp.where(ins_wins, gap_i, clip_i))
    I0 = jnp.where(row_ge1, I0, MIN)
    i_bits0 = jnp.where(
        rows == 1,
        TB_START,
        jnp.where(ins_wins, TB_INS, TB_XCLIP_PREFIX),
    ).astype(I32)
    i_bits0 = jnp.where(row_ge1, i_bits0, TB_START)

    # S_init rows 1..M (pre row-m replacement): max(MIN, I0, xcp)
    S0_pre, s_bits0_pre = _priority_max(
        jnp.full((B, M + 1), MIN, dtype=I32),
        jnp.full((B, M + 1), TB_START, dtype=I32),
        [(I0, TB_INS), (jnp.full((B, M + 1), xcp, dtype=I32), TB_XCLIP_PREFIX)],
    )
    # row-m init: accumulator of S[i]+xcs over 1 <= i <= m-1
    accA, firstA, updA = _first_argmax_acc(
        S0_pre + xcs, row_ge1 & (rows <= mlens_c - 1)
    )
    Lx0 = jnp.where(updA, mlens_c - firstA, 0).astype(I32)[:, 0]
    S_row_m, s_bits_row_m = _priority_max(
        jnp.where(updA, accA, MIN),
        jnp.full((B, 1), TB_XCLIP_SUFFIX, dtype=I32),
        [
            (jnp.take_along_axis(I0, mlens_c, axis=1), TB_INS),
            (jnp.full((B, 1), xcp, dtype=I32), TB_XCLIP_PREFIX),
        ],
    )
    S0 = jnp.where(is_row_m, S_row_m, S0_pre)
    s_bits0 = jnp.where(is_row_m, s_bits_row_m, s_bits0_pre)
    # row 0
    S0 = S0.at[:, 0].set(0)
    s_bits0 = s_bits0.at[:, 0].set(TB_START)

    # Sn / Ly init
    Sn0 = jnp.full((B, M + 1), MIN, dtype=I32)
    Ly0 = jnp.zeros((B, M + 1), dtype=I32)
    Sn0 = Sn0.at[:, 0].set(jnp.broadcast_to(ycs, (B,)))
    Ly0 = Ly0.at[:, 0].set(nlens)
    upd_sn = (S0 + ycs > Sn0) & row_ge1 & (rows <= mlens_c)
    Ly0 = jnp.where(upd_sn, nlens[:, None], Ly0)
    Sn0 = jnp.where(upd_sn, S0 + ycs, Sn0)

    tb_col0 = _pack(i_bits0, jnp.full((B, M + 1), TB_START, dtype=I32), s_bits0)
    D0 = jnp.full((B, M + 1), MIN, dtype=I32)
    return S0, D0, s_bits0, Sn0, Ly0, tb_col0, Lx0


def _column_body(
    S_prev, D_prev, sbits_prev, I_prev, Sn, Ly,
    j, subs_col, eq_col,
    B, M, rows, row_ge1, mlens, nlens, mlens_c, is_row_m, yclip_row, pens,
):
    """One DP column (reference custom() hot loop :674-843), layout (B, M+1).

    Shared verbatim by the XLA scan and (re-traced on transposed shapes is
    NOT possible, so the Pallas kernel uses the same code via this function
    too — it operates purely on jnp values).
    """
    go, ge, xcp, xcs, ycp, ycs = pens
    nlens_c = nlens[:, None] if nlens.ndim == 1 else nlens  # (B, 1)
    active = (j <= nlens_c)  # (B, 1)
    is_last = (j == nlens_c)

    # --- i = 0 boundary ---
    d_gap = go + ge * (j - 1)
    d_clip = ycp + go
    del_wins = d_gap > d_clip
    D0j = jnp.where(j == 1, go, jnp.where(del_wins, d_gap, d_clip))
    d_bits_0 = jnp.where(
        j == 1, TB_START, jnp.where(del_wins, TB_DEL, TB_YCLIP_PREFIX)
    )
    d_gt = D0j > ycp
    S0j = jnp.where(d_gt, D0j, ycp)
    s_bits_0 = jnp.where(d_gt, TB_DEL, TB_YCLIP_PREFIX)
    S0j = jnp.broadcast_to(S0j, (B, 1))
    s_bits_0 = jnp.broadcast_to(s_bits_0, (B, 1)).astype(I32)

    Sn0v = Sn[:, 0:1]  # (B, 1)
    take_sn = is_last & (Sn0v > S0j)
    S0j = jnp.where(take_sn, Sn0v, S0j)
    s_bits_0 = jnp.where(take_sn, TB_YCLIP_SUFFIX, s_bits_0)
    upd_sn0 = (~take_sn) & (S0j + ycs > Sn0v)
    row0 = rows == 0
    Sn = jnp.where(
        row0, jnp.where(upd_sn0 & active, S0j + ycs, Sn0v), Sn
    )
    Ly = jnp.where(
        row0, jnp.where(upd_sn0 & active, nlens_c - j, Ly[:, 0:1]), Ly
    )

    # --- rows 1..M elementwise candidates ---
    m_score = jnp.concatenate(
        [jnp.full((B, 1), MIN, dtype=I32), S_prev[:, :-1] + subs_col],
        axis=1,
    )
    m_bits = jnp.concatenate(
        [jnp.full((B, 1), TB_START, dtype=I32),
         jnp.where(eq_col, TB_MATCH, TB_SUBST).astype(I32)],
        axis=1,
    )
    d_ext = D_prev + ge
    d_open = S_prev + go
    d_wins = d_ext > d_open
    bestD = jnp.where(d_wins, d_ext, d_open)
    d_bits = jnp.where(d_wins, TB_DEL, sbits_prev)

    xclip_score = xcp + jnp.maximum(ycp, go + ge * (j - 1))  # scalar

    # S~ = best without the I candidate (value only)
    s_tilde = jnp.maximum(
        jnp.maximum(m_score, bestD),
        jnp.maximum(
            jnp.broadcast_to(xclip_score, (B, M + 1)).astype(I32),
            yclip_row,
        ),
    )
    s_tilde = jnp.where(row_ge1, s_tilde, MIN)
    s_tilde = jnp.where(row0, S0j, s_tilde)

    # --- I via (max,+) prefix scan over rows ---
    # I[i] = max(I[i-1] + ge, S~[i-1] + go), I[0] = MIN
    T = jnp.concatenate(
        [jnp.full((B, 1), MIN, dtype=I32), s_tilde[:, :-1] + go], axis=1
    )
    U = T - rows * ge
    bestI = _cummax1(U) + rows * ge
    bestI = jnp.where(row_ge1, bestI, MIN)

    # --- full-priority S selection (rows 1..M, pre row-m) ---
    S_col, s_bits = _priority_max(
        jnp.full((B, M + 1), MIN, dtype=I32),
        jnp.full((B, M + 1), TB_XCLIP_SUFFIX, dtype=I32),
        [
            (m_score, m_bits),
            (bestI, jnp.full((B, M + 1), TB_INS, dtype=I32)),
            (bestD, jnp.full((B, M + 1), TB_DEL, dtype=I32)),
            (
                jnp.broadcast_to(xclip_score, (B, M + 1)).astype(I32),
                jnp.full((B, M + 1), TB_XCLIP_PREFIX, dtype=I32),
            ),
            (yclip_row, jnp.full((B, M + 1), TB_YCLIP_PREFIX, dtype=I32)),
        ],
    )

    # --- row-m replacement: init = suffix-clip accumulator ---
    accA, firstA, updA = _first_argmax_acc(
        S_col + xcs, row_ge1 & (rows <= mlens_c - 1)
    )
    Lx_j = jnp.where(updA & active, mlens_c - firstA, 0).astype(I32)  # (B, 1)
    # masked reduction instead of take_along_axis: per-step gathers are
    # slow on TPU, a lane-masked max over the row axis is a vector op
    take_m = lambda a: jnp.max(
        jnp.where(is_row_m, a, _SENTINEL), axis=1, keepdims=True
    )
    S_m, s_bits_m = _priority_max(
        jnp.where(updA, accA, MIN),
        jnp.full((B, 1), TB_XCLIP_SUFFIX, dtype=I32),
        [
            (take_m(m_score), take_m(m_bits)),
            (take_m(bestI), jnp.full((B, 1), TB_INS, dtype=I32)),
            (take_m(bestD), jnp.full((B, 1), TB_DEL, dtype=I32)),
            (
                jnp.broadcast_to(xclip_score, (B, 1)).astype(I32),
                jnp.full((B, 1), TB_XCLIP_PREFIX, dtype=I32),
            ),
            (take_m(yclip_row), jnp.full((B, 1), TB_YCLIP_PREFIX, dtype=I32)),
        ],
    )
    S_col = jnp.where(is_row_m, S_m, S_col)
    s_bits = jnp.where(is_row_m, s_bits_m, s_bits)

    # --- i_bits (post-hoc, elementwise) ---
    i_ext = jnp.concatenate(
        [jnp.full((B, 1), MIN, dtype=I32), bestI[:, :-1] + ge], axis=1
    )
    i_open = jnp.concatenate(
        [jnp.full((B, 1), MIN, dtype=I32), s_tilde[:, :-1] + go], axis=1
    )
    prev_sbits = jnp.concatenate(
        [jnp.full((B, 1), TB_START, dtype=I32), s_bits[:, :-1]], axis=1
    )
    # note: row 1's comparison uses s_tilde[0] = S0j and prev s_bits=...
    prev_sbits = jnp.where(rows == 1, s_bits_0, prev_sbits)
    i_bits = jnp.where(i_ext > i_open, TB_INS, prev_sbits)
    i_bits = jnp.where(row_ge1, i_bits, TB_START)

    # write row 0 into column arrays
    S_col = jnp.where(row0, S0j, S_col)
    s_bits = jnp.where(row0, s_bits_0, s_bits)
    bestD = jnp.where(row0, jnp.broadcast_to(D0j, (B, 1)), bestD)
    bestI = jnp.where(row0, MIN, bestI)
    d_bits = jnp.where(
        row0, jnp.broadcast_to(d_bits_0, (B, 1)).astype(I32), d_bits
    )

    # --- Sn / Ly tracking (rows 1..m) ---
    upd_sn_rows = (S_col + ycs > Sn) & row_ge1 & (rows <= mlens_c)
    upd_sn_rows = upd_sn_rows & active
    Sn_new = jnp.where(upd_sn_rows, S_col + ycs, Sn)
    Ly_new = jnp.where(upd_sn_rows, nlens_c - j, Ly)

    tb_col = _pack(i_bits, d_bits, s_bits)
    return S_col, bestD, s_bits, bestI, Sn_new, Ly_new, tb_col, Lx_j, active


def _scan_columns_xla(
    xb, yb, subs, S0, D0, s_bits0, Sn0, Ly0, tb_col0,
    B, M, N, rows, row_ge1, mlens, nlens, mlens_c, is_row_m, yclip_row, pens,
):
    """The XLA lax.scan engine over DP columns."""

    def column_step(carry, xs):
        S_prev, D_prev, sbits_prev, I_prev, Sn, Ly, tb_prev = carry
        j, subs_col, y_col = xs
        eq_col = xb == y_col[:, None]  # (B, M)
        (
            S_col, bestD, s_bits, bestI, Sn_new, Ly_new, tb_col, Lx_j, active
        ) = _column_body(
            S_prev, D_prev, sbits_prev, I_prev, Sn, Ly,
            j, subs_col, eq_col,
            B, M, rows, row_ge1, mlens, nlens, mlens_c, is_row_m,
            yclip_row, pens,
        )
        keep = active  # (B, 1)
        new_carry = (
            jnp.where(keep, S_col, S_prev),
            jnp.where(keep, bestD, D_prev),
            jnp.where(keep, s_bits, sbits_prev),
            jnp.where(keep, bestI, I_prev),
            Sn_new,
            Ly_new,
            jnp.where(keep, tb_col, tb_prev),
        )
        return new_carry, (tb_col, Lx_j[:, 0])

    carry0 = (
        S0, D0, s_bits0, jnp.full((B, M + 1), MIN, dtype=I32), Sn0, Ly0,
        tb_col0,
    )
    js = jnp.arange(1, N + 1, dtype=I32)
    xs = (js, jnp.moveaxis(subs, 2, 0), jnp.moveaxis(yb, 1, 0))
    (S_f, D_f, sbits_f, I_f, Sn_f, Ly_f, tb_f), (tb_cols, Lx_cols) = lax.scan(
        column_step, carry0, xs
    )
    return S_f, I_f, Sn_f, Ly_f, tb_f, tb_cols, Lx_cols


def _suffix_fixups(
    S_f, I_f, Sn_f, tb_f,
    B, M, rows, row_ge1, mlens, mlens_c, is_row_m, pens,
):
    """Post-loop suffix fixups at j = n (reference :809-843)."""
    go, ge, xcp, xcs, ycp, ycs = pens
    i_bits_f, d_bits_f, s_bits_f = _unpack(tb_f)

    # fixup 1: yclip-suffix improvements + xclip-suffix re-accumulation
    y_take = (Sn_f > S_f) & (rows <= mlens_c)
    S1 = jnp.where(y_take, Sn_f, S_f)
    sb1 = jnp.where(y_take, TB_YCLIP_SUFFIX, s_bits_f)
    take_m = lambda a: jnp.take_along_axis(a, mlens_c, axis=1)[:, 0]
    S_m_base = take_m(S_f)
    # accumulate S1[i]+xcs for 0 <= i <= m-1 against acc0 = S_f[m]
    vals = jnp.where(rows <= mlens_c - 1, S1 + xcs, _SENTINEL)
    A2 = jnp.max(vals, axis=1)
    x_upd = A2 > S_m_base
    firstX = jnp.argmax(vals == A2[:, None], axis=1).astype(I32)
    acc = jnp.where(x_upd, A2, S_m_base)
    sb_m = jnp.where(x_upd, TB_XCLIP_SUFFIX, take_m(sb1))
    Lx_n = jnp.where(x_upd, mlens - firstX, 0)
    lx_n_set = x_upd
    # then row m's own yclip-suffix check
    Sn_m = take_m(Sn_f)
    y_take_m = Sn_m > acc
    acc = jnp.where(y_take_m, Sn_m, acc)
    sb_m = jnp.where(y_take_m, TB_YCLIP_SUFFIX, sb_m)
    S1 = jnp.where(is_row_m, acc[:, None], S1)
    sb1 = jnp.where(is_row_m, sb_m[:, None], sb1)
    S1 = S1.at[:, 0].set(jnp.where(mlens == 0, acc, S1[:, 0]))
    sb1 = sb1.at[:, 0].set(jnp.where(mlens == 0, sb_m, sb1[:, 0]))

    # fixup 2: recompute last-column I (chained opens after clip updates)
    # S2[i] = max(S1[i], S2[i-1] + go) for i = 1..m-1 (row m handled after)
    U2 = S1 - rows * go
    S2 = lax.cummax(U2, axis=1) + rows * go
    upd2 = S2 > S1
    sb2 = jnp.where(upd2, TB_INS, sb1)
    S2m1 = jnp.concatenate([jnp.full((B, 1), MIN, dtype=I32), S2[:, :-1]], axis=1)
    open2 = S2m1 + go
    i_take2 = open2 > I_f
    I2 = jnp.where(i_take2, open2, I_f)
    sb2_prev = jnp.concatenate(
        [jnp.full((B, 1), TB_START, dtype=I32), sb2[:, :-1]], axis=1
    )
    ib2 = jnp.where(i_take2 & row_ge1, sb2_prev, i_bits_f)
    # xclip re-check for updated rows 1..m-1 against evolving S[m]
    vals3 = jnp.where((rows >= 1) & (rows <= mlens_c - 1) & upd2, S2 + xcs, _SENTINEL)
    A3 = jnp.max(vals3, axis=1)
    acc_m = take_m(S1)  # fixup-1 final row-m value
    x_upd3 = A3 > acc_m
    first3 = jnp.argmax(vals3 == A3[:, None], axis=1).astype(I32)
    acc3 = jnp.where(x_upd3, A3, acc_m)
    sb_m3 = jnp.where(x_upd3, TB_XCLIP_SUFFIX, take_m(sb2))
    Lx_n = jnp.where(x_upd3, mlens - first3, Lx_n)
    lx_n_set = lx_n_set | x_upd3
    # row m second statement: S[m] = max(acc3, S2[m-1]+go)
    sm_open = take_m(S2m1) + go
    m_take = (sm_open > acc3) & (mlens >= 1)
    S_final_m = jnp.where(m_take, sm_open, acc3)
    sb_final_m = jnp.where(m_take, TB_INS, sb_m3)
    # row m first statement (I)
    i_take_m = (sm_open > take_m(I_f)) & (mlens >= 1)
    I2 = jnp.where(is_row_m & i_take_m[:, None], sm_open[:, None], I2)
    ib_m = jnp.where(i_take_m, take_m(sb2_prev), take_m(i_bits_f))

    S_fixed = jnp.where(is_row_m, S_final_m[:, None], S2)
    sb_fixed = jnp.where(is_row_m, sb_final_m[:, None], sb2)
    ib_fixed = jnp.where(is_row_m, ib_m[:, None], ib2)
    S_fixed = jnp.where(mlens_c == 0, S1, S_fixed)
    sb_fixed = jnp.where(mlens_c == 0, sb1, sb_fixed)
    ib_fixed = jnp.where(mlens_c == 0, i_bits_f, ib_fixed)

    tb_col_fixed = _pack(ib_fixed, d_bits_f, sb_fixed)
    score = jnp.take_along_axis(S_fixed, mlens_c, axis=1)[:, 0]
    return score, tb_col_fixed, Lx_n, lx_n_set


def _walk(tb_full, Lx_full, Ly_f, mlens, nlens, B, M, N, no_clips=False):
    """Batched lockstep traceback walk; one big gather per step.

    The next step's layer is resolved from the cell gathered at that step
    (use_s), or carried from this cell's I/D bits.

    When ``M, N < 1024`` the clip lengths ride along in the cell word
    (bits 12..21 = Lx(j), 22..31 = Ly(i)), so each step is a single uint32
    gather instead of three (cell, Lx, Ly) — per-step gathers dominate the
    walk on TPU. Larger problems fall back to the three-gather form.
    ``no_clips`` (global mode): clip layers cannot occur, so the cell word
    is gathered as plain uint16 and all clip logic drops out.
    """
    T_steps = M + N + 8
    packed = M < 1024 and N < 1024 and not no_clips
    if no_clips:
        tb_flat = tb_full.reshape(B, (M + 1) * (N + 1))
    elif packed:
        tb32 = (
            (tb_full.astype(jnp.uint32) & 0xFFF)
            | (Lx_full.astype(jnp.uint32) << 12)[:, None, :]
            | (Ly_f.astype(jnp.uint32) << 22)[:, :, None]
        )
        tb_flat = tb32.reshape(B, (M + 1) * (N + 1))
    else:
        tb_flat = tb_full.reshape(B, (M + 1) * (N + 1))

    def cond(state):
        return (state[0] < T_steps) & ~jnp.all(state[-1])

    def walk_step(state):
        (
            t, i, j, carried, use_s, xstart, ystart, xend, yend, done,
            buf_c, buf_l,
        ) = state
        cell = jnp.take_along_axis(
            tb_flat, (i * (N + 1) + j)[:, None], axis=1
        )[:, 0]
        if no_clips:
            ib, db, sb = _unpack(cell)
        elif packed:
            # unpack in uint32 (bit 31 may be set); cast only small fields
            ib = (cell & 0xF).astype(I32)
            db = ((cell >> 4) & 0xF).astype(I32)
            sb = ((cell >> 8) & 0xF).astype(I32)
            lx = ((cell >> 12) & 0x3FF).astype(I32)
            ly = (cell >> 22).astype(I32)
        else:
            ib, db, sb = _unpack(cell)
            lx = jnp.take_along_axis(Lx_full, j[:, None], axis=1)[:, 0]
            ly = jnp.take_along_axis(Ly_f, i[:, None], axis=1)[:, 0]
        layer = jnp.where(use_s, sb, carried)

        is_ins = layer == TB_INS
        is_del = layer == TB_DEL
        is_mm = (layer == TB_MATCH) | (layer == TB_SUBST)
        if no_clips:
            op_len = jnp.zeros_like(i)
            op_code = jnp.where(done, 0, layer)
            new_i = jnp.where(done, i, i - (is_ins | is_mm) * 1)
            new_j = jnp.where(done, j, j - (is_del | is_mm) * 1)
        else:
            is_xp = layer == TB_XCLIP_PREFIX
            is_xs = layer == TB_XCLIP_SUFFIX
            is_yp = layer == TB_YCLIP_PREFIX
            is_ys = layer == TB_YCLIP_SUFFIX

            op_len = (
                is_xp * i + is_xs * lx + is_yp * j + is_ys * ly
            )
            op_code = jnp.where(done, 0, layer)

            new_i = (
                i
                - (is_ins | is_mm) * 1
                - is_xs * lx
                + is_xp * (-i)  # i -> 0
            )
            new_j = (
                j
                - (is_del | is_mm) * 1
                - is_ys * ly
                + is_yp * (-j)  # j -> 0
            )
            new_i = jnp.where(done, i, new_i)
            new_j = jnp.where(done, j, new_j)

            xstart = jnp.where(is_xp & ~done, i, xstart)
            xend = jnp.where(is_xs & ~done, new_i, xend)
            ystart = jnp.where(is_yp & ~done, j, ystart)
            yend = jnp.where(is_ys & ~done, new_j, yend)

        new_done = done | (layer == TB_START)
        next_carried = jnp.where(is_ins, ib, db)
        next_use_s = ~(is_ins | is_del) | new_done
        next_carried = jnp.where(new_done, TB_START, next_carried)
        buf_c = lax.dynamic_update_slice_in_dim(
            buf_c, op_code.astype(jnp.uint8)[None], t, axis=0
        )
        buf_l = lax.dynamic_update_slice_in_dim(
            buf_l, op_len.astype(jnp.uint16)[None], t, axis=0
        )
        return (
            t + 1,
            new_i,
            new_j,
            next_carried,
            next_use_s,
            xstart,
            ystart,
            xend,
            yend,
            new_done,
            buf_c,
            buf_l,
        )

    # early-exit while_loop: typical paths are far shorter than M+N;
    # finished lanes emit op 0 padding which the decoder stops at
    state0 = (
        jnp.int32(0),
        mlens,
        nlens,
        jnp.full(B, TB_START, I32),
        jnp.ones(B, bool),  # first step reads the s-bits at (m, n)
        jnp.zeros(B, I32),
        jnp.zeros(B, I32),
        mlens,
        nlens,
        jnp.zeros(B, bool),
        jnp.zeros((T_steps, B), jnp.uint8),
        jnp.zeros((T_steps, B), jnp.uint16),
    )
    (
        _, fi, fj, _, _, xstart, ystart, xend, yend, done, op_codes, op_lens
    ) = lax.while_loop(cond, walk_step, state0)
    return {
        "op_codes": op_codes,  # (T, B), end -> start
        "op_lens": op_lens,  # clip lengths < 65536
        "xstart": xstart,
        "ystart": ystart,
        "xend": xend,
        "yend": yend,
        "walk_done": done,
    }


def _postlude(
    scan_out, tb_col0, Lx0,
    B, M, N, rows, row_ge1, mlens, nlens, mlens_c, is_row_m, pens,
    with_traceback,
):
    """Fixups + traceback assembly + walk, shared by both scan engines."""
    S_f, I_f, Sn_f, Ly_f, tb_f, tb_cols, Lx_cols = scan_out
    score, tb_col_fixed, Lx_n, lx_n_set = _suffix_fixups(
        S_f, I_f, Sn_f, tb_f,
        B, M, rows, row_ge1, mlens, mlens_c, is_row_m, pens,
    )
    if not with_traceback:
        return {"score": score}

    # (B, M+1, N+1): init column + scanned columns, then fixed column at n_i
    tb_full = jnp.concatenate(
        [tb_col0[:, :, None], jnp.moveaxis(tb_cols, 0, 2)], axis=2
    )
    bidx = jnp.arange(B)
    tb_full = tb_full.at[
        bidx[:, None], jnp.arange(M + 1)[None, :], nlens[:, None]
    ].set(tb_col_fixed)
    Lx_full = jnp.concatenate([Lx0[:, None], jnp.moveaxis(Lx_cols, 0, 1)], axis=1)
    Lx_full = Lx_full.at[bidx, nlens].set(
        jnp.where(lx_n_set, Lx_n, Lx_full[bidx, nlens])
    )

    out = _walk(tb_full, Lx_full, Ly_f, mlens, nlens, B, M, N)
    out["score"] = score
    return out


def _pack_rle(
    score, ins_cnt, exit_op, ins0, fix_ins, fix_exit, fix_ly,
    xstart, ystart, xend, yend,
):
    """Single-pull packing of a column-RLE walk result: (10 + Np, B)
    uint16.  Through the dev tunnel every device->host transfer pays a
    ~26 ms round trip, so pulling the walk dict leaf-by-leaf costs 10x
    the compute; one packed tensor amortizes it.  ``ins_cnt`` <= M+1
    fits 12 bits (the sweep-walk engines already cap M+1 < 4096 for
    tbfix) and ``exit_op`` <= TB_REREAD fits 4, so the two per-column
    arrays share one uint16 row — HALF the transfer (~35 ms at B=8192
    through the tunnel)."""
    small = jnp.stack(
        [
            (score >> 16) & 0xFFFF,
            score & 0xFFFF,
            ins0.astype(I32),
            fix_ins,
            fix_exit,
            fix_ly,
            xstart,
            ystart,
            xend,
            yend,
        ]
    ).astype(jnp.uint16)
    merged = (
        exit_op.astype(jnp.uint16) << 12
    ) | ins_cnt.astype(jnp.uint16)
    return jnp.concatenate([small, merged], axis=0)


def _unpack_rle(packed: np.ndarray):
    """Host-side inverse of _pack_rle: returns (score i32 (B,), out dict
    of numpy arrays)."""
    small = packed[:10].astype(np.int64)
    v = (small[0] << 16) | small[1]
    score = np.where(v >= 2**31, v - 2**32, v).astype(np.int64)
    merged = packed[10:]
    return score, {
        "ins0": small[2],
        "fix_ins": small[3],
        "fix_exit": small[4],
        "fix_ly": small[5],
        "xstart": small[6],
        "ystart": small[7],
        "xend": small[8],
        "yend": small[9],
        "ins_cnt": merged & 0xFFF,
        "exit_op": merged >> 12,
    }


def _pack_rle_custom(
    score, pre, ins_cnt, exit_op, elen, post, fix_codes, fix_lens,
    xstart, ystart, xend, yend,
):
    """Single-pull packing of the general-clip column-RLE walk:
    (14 + 4*Nc, B) uint16.  Run lengths are <= M+1 < 4096 (12 bits), so
    ``exit_op`` (4 bits) rides in ``pre``'s spare top bits — one fewer
    per-column row to transfer."""
    small = jnp.concatenate(
        [
            jnp.stack(
                [
                    (score >> 16) & 0xFFFF,
                    score & 0xFFFF,
                    xstart,
                    ystart,
                    xend,
                    yend,
                ]
            ),
            jnp.transpose(fix_codes, (1, 0)),
            jnp.transpose(fix_lens, (1, 0)),
        ]
    ).astype(jnp.uint16)
    pre_op = (
        exit_op.astype(jnp.uint16) << 12
    ) | pre.astype(jnp.uint16)
    arrs = [pre_op, ins_cnt, elen, post]
    return jnp.concatenate(
        [small] + [a.astype(jnp.uint16) for a in arrs], axis=0
    )


def _pack_rle_local(
    score, ins_cnt, exit_op, fix_codes, fix_lens, xstart, ystart, xend, yend,
):
    """Single-pull packing of the LOCAL-mode column-RLE walk:
    (14 + Nc, B) uint16 — one merged per-column stream (vs the custom
    walk's four: local interior ops carry no clip machinery)."""
    small = jnp.concatenate(
        [
            jnp.stack(
                [
                    (score >> 16) & 0xFFFF,
                    score & 0xFFFF,
                    xstart,
                    ystart,
                    xend,
                    yend,
                ]
            ),
            jnp.transpose(fix_codes, (1, 0)),
            jnp.transpose(fix_lens, (1, 0)),
        ]
    ).astype(jnp.uint16)
    merged = (
        exit_op.astype(jnp.uint16) << 12
    ) | ins_cnt.astype(jnp.uint16)
    return jnp.concatenate([small, merged], axis=0)


def _merge_rle_device(ins_cnt, exit_op, ins0, fix_ins, fix_exit, nlens, R):
    """Device-side merge of the column-RLE walk stream into at most ``R``
    (kind, len) runs per lane — the vector replica of the numpy merge in
    ``PackedSemiglobal.cigars()`` (same stream order, same drop/merge
    rules; oracle-tested against it).  Purpose: the delivered-CIGAR pull
    is transfer-bound through the dev tunnel (~26 ms latency + ~40 MB/s),
    and at mapper-realistic identity a 150 bp pair merges to < 30 runs —
    pulling (5+R, B) u16 instead of (10+Np, B) u16 is ~4x fewer bytes.

    Returns (run_kind (R, B), run_len (R, B), n_runs (B,), ovf (B,) bool)
    where ``ovf`` flags lanes with > R runs or a run length > 4095 (the
    12-bit pack bound) — those lanes must be re-decoded via the dense
    path."""
    Np, B = ins_cnt.shape
    cols = jnp.arange(Np, dtype=I32)[None, :]
    cvalid = cols < nlens[:, None]  # (B, Np)
    ex = jnp.where(cvalid, jnp.transpose(exit_op).astype(I32), 0)
    cnt = jnp.where(cvalid, jnp.transpose(ins_cnt).astype(I32), 0)
    # stream order (cigars() C/Lm build): [INS ins0], (exit_j len 1,
    # INS cnt_j) for j ascending, [fix_exit len 1], [INS fix_ins]
    kind_pairs = jnp.stack(
        [ex, jnp.full_like(ex, TB_INS)], axis=2
    ).reshape(B, 2 * Np)
    len_pairs = jnp.stack([jnp.ones_like(cnt), cnt], axis=2).reshape(
        B, 2 * Np
    )
    kind = jnp.concatenate(
        [
            jnp.full((B, 1), TB_INS, I32),
            kind_pairs,
            fix_exit[:, None].astype(I32),
            jnp.full((B, 1), TB_INS, I32),
        ],
        axis=1,
    )  # (B, W)
    ln = jnp.concatenate(
        [
            ins0[:, None].astype(I32),
            len_pairs,
            jnp.ones((B, 1), I32),
            fix_ins[:, None].astype(I32),
        ],
        axis=1,
    )
    valid = (kind >= TB_INS) & (kind <= TB_MATCH) & (ln > 0)
    # previous-kept-kind forward fill (log-depth, no gathers), exclusive
    vk = jnp.where(valid, kind, 0)
    ffi = jax.lax.associative_scan(
        lambda a, b: jnp.where(b > 0, b, a), vk, axis=1
    )
    prev = jnp.concatenate([jnp.zeros((B, 1), I32), ffi[:, :-1]], axis=1)
    new = valid & (kind != prev)
    rid = jnp.cumsum(new.astype(I32), axis=1) - 1
    n_runs = rid[:, -1] + 1
    # masked-sum compaction: R unrolled reductions, no scatters/gathers
    lens_r, kinds_r = [], []
    for r in range(R):
        m = rid == r
        lens_r.append(jnp.sum(jnp.where(valid & m, ln, 0), axis=1))
        kinds_r.append(jnp.sum(jnp.where(new & m, kind, 0), axis=1))
    run_len = jnp.stack(lens_r, axis=0)  # (R, B)
    run_kind = jnp.stack(kinds_r, axis=0)
    ovf = (n_runs > R) | (jnp.max(run_len, axis=0) > 0xFFF)
    return run_kind, run_len, n_runs, ovf


def _pack_rle_merged(score, run_kind, run_len, n_runs, ovf, xstart, xend):
    """(5 + R, B) uint16 single-pull layout for the merged-run stream:
    kind (4 bits) rides each run length's top nibble; the overflow flag
    rides n_runs' top bit."""
    small = jnp.stack(
        [
            (score >> 16) & 0xFFFF,
            score & 0xFFFF,
            xstart,
            xend,
            n_runs | (ovf.astype(I32) << 15),
        ]
    ).astype(jnp.uint16)
    kl = (
        (run_kind.astype(jnp.uint16) << 12)
        | jnp.minimum(run_len, 0xFFF).astype(jnp.uint16)
    )
    return jnp.concatenate([small, kl], axis=0)


def _unpack_rle_merged(packed: np.ndarray):
    small = packed[:5].astype(np.int64)
    v = (small[0] << 16) | small[1]
    score = np.where(v >= 2**31, v - 2**32, v).astype(np.int64)
    kl = packed[5:]
    return score, {
        "xstart": small[2],
        "xend": small[3],
        "n_runs": small[4] & 0x7FFF,
        "ovf": (small[4] >> 15).astype(bool),
        "run_kind": kl >> 12,  # (R, B)
        "run_len": kl & 0xFFF,
    }


def _unpack_rle_local(packed: np.ndarray):
    small = packed[:14].astype(np.int64)
    v = (small[0] << 16) | small[1]
    score = np.where(v >= 2**31, v - 2**32, v).astype(np.int64)
    merged = packed[14:]
    return score, {
        "xstart": small[2],
        "ystart": small[3],
        "xend": small[4],
        "yend": small[5],
        "fix_codes": small[6:10],
        "fix_lens": small[10:14],
        "ins_cnt": merged & 0xFFF,
        "exit_op": merged >> 12,
    }


def _unpack_rle_custom(packed: np.ndarray):
    small = packed[:14].astype(np.int64)
    v = (small[0] << 16) | small[1]
    score = np.where(v >= 2**31, v - 2**32, v).astype(np.int64)
    Nc = (packed.shape[0] - 14) // 4
    arrs = [packed[14 + t * Nc : 14 + (t + 1) * Nc] for t in range(4)]
    return score, {
        "xstart": small[2],
        "ystart": small[3],
        "xend": small[4],
        "yend": small[5],
        "fix_codes": small[6:10],
        "fix_lens": small[10:14],
        "pre": arrs[0] & 0xFFF,
        "ins_cnt": arrs[1],
        "exit_op": arrs[0] >> 12,
        "elen": arrs[2],
        "post": arrs[3],
    }


def _geometry(B, M, mlens):
    rows = lax.broadcasted_iota(I32, (B, M + 1), 1)  # i index per row
    row_ge1 = rows >= 1
    mlens_c = mlens[:, None]
    is_row_m = (rows == mlens_c) & (mlens_c >= 1)
    return rows, row_ge1, mlens_c, is_row_m


@partial(jax.jit, static_argnames=("with_traceback", "n_syms"))
def _align_batch_device(
    xb,  # (B, M) uint8 padded query batch
    yb,  # (B, N) uint8 padded reference batch
    mlens,  # (B,) int32
    nlens,  # (B,) int32
    lut,  # (256, 256) int32 substitution LUT
    penalties,  # (6,) int32: go, ge, xcp, xcs, ycp, ycs
    with_traceback: bool = True,
    n_syms: int = 32,
):
    B, M = xb.shape
    N = yb.shape[1]
    pens = tuple(penalties[k] for k in range(6))
    go, ge, xcp, xcs, ycp, ycs = pens

    rows, row_ge1, mlens_c, is_row_m = _geometry(B, M, mlens)
    yclip_row = ycp + go + ge * (rows - 1)  # (B, M+1), valid rows >= 1

    subs = _subs_einsum(xb, yb, lut, n_syms)

    S0, D0, s_bits0, Sn0, Ly0, tb_col0, Lx0 = _init_column(
        B, M, rows, row_ge1, mlens, nlens, mlens_c, is_row_m, pens
    )

    scan_out = _scan_columns_xla(
        xb, yb, subs, S0, D0, s_bits0, Sn0, Ly0, tb_col0,
        B, M, N, rows, row_ge1, mlens, nlens, mlens_c, is_row_m,
        yclip_row, pens,
    )
    return _postlude(
        scan_out, tb_col0, Lx0,
        B, M, N, rows, row_ge1, mlens, nlens, mlens_c, is_row_m, pens,
        with_traceback,
    )


@partial(jax.jit, static_argnames=("with_traceback",))
def _align_batch_device_mp(
    xb, yb, mlens, nlens, penalties8, with_traceback: bool = True
):
    """MatchParams fast path: the column scan runs as a Pallas kernel with
    VMEM-resident DP state (ops/sw_pallas.scan_columns_pallas_mp); prelude
    and postlude are shared with the XLA engine, so results are identical.

    ``penalties8``: (8,) int32 = (go, ge, xcp, xcs, ycp, ycs, match, mismatch).
    """
    from rust_bio_tpu.ops.sw_pallas import scan_columns_pallas_mp

    B, M = xb.shape
    N = yb.shape[1]
    pens = tuple(penalties8[k] for k in range(6))

    rows, row_ge1, mlens_c, is_row_m = _geometry(B, M, mlens)

    S0, D0, s_bits0, Sn0, Ly0, tb_col0, Lx0 = _init_column(
        B, M, rows, row_ge1, mlens, nlens, mlens_c, is_row_m, pens
    )

    # eq laid out column-major directly (no big transposes)
    eq_nbm = (
        jnp.swapaxes(yb, 0, 1)[:, :, None] == xb[None, :, :]
    ).astype(jnp.uint8)  # (N, B, M)

    scan_out = scan_columns_pallas_mp(
        eq_nbm, S0, D0, s_bits0, Sn0, Ly0, tb_col0,
        mlens, nlens, penalties8,
    )
    return _postlude(
        scan_out, tb_col0, Lx0,
        B, M, N, rows, row_ge1, mlens, nlens, mlens_c, is_row_m, pens,
        with_traceback,
    )


def _walk_global(tb_xb, mlens, nlens, B, M, N):
    """Clip-free lockstep walk over the kernel-native column-major layout.

    ``tb_xb``: ((Np+1) * (M+1), B) uint16 — row ``j*(M+1)+i`` is cell
    (i, j); column j's raw cells are already the lane's true final column
    at j = nlens (no suffix fixups exist in global mode), so no scatter or
    transpose is needed between the scan kernel and the walk.
    """
    Mp1 = M + 1
    T_steps = M + N + 8

    def cond(state):
        t, i, j, carried, use_s, done, buf_c, buf_l = state
        return (t < T_steps) & ~jnp.all(done)

    def walk_step(state):
        t, i, j, carried, use_s, done, buf_c, buf_l = state
        cell = jnp.take_along_axis(
            tb_xb, (j * Mp1 + i)[None, :], axis=0
        )[0]
        ib, db, sb = _unpack(cell)
        layer = jnp.where(use_s, sb, carried)

        is_ins = layer == TB_INS
        is_del = layer == TB_DEL
        is_mm = (layer == TB_MATCH) | (layer == TB_SUBST)
        # same-op diagonal run length from the cell's spare nibble: jump
        # up to 15 Match/Subst cells in one gather (valid only when the
        # layer was taken via use_s — mid-gap reads must step singly)
        run = jnp.maximum((cell.astype(I32) >> 12) & 0xF, 1)
        r = jnp.where(is_mm & use_s, run, 1)
        op_code = jnp.where(done, 0, layer).astype(jnp.uint8)
        op_len = jnp.where(done | ~is_mm, 0, r).astype(jnp.uint16)
        new_i = jnp.where(done, i, i - (is_ins * 1 + is_mm * r))
        new_j = jnp.where(done, j, j - (is_del * 1 + is_mm * r))

        new_done = done | (layer == TB_START)
        next_carried = jnp.where(is_ins, ib, db)
        next_use_s = ~(is_ins | is_del) | new_done
        next_carried = jnp.where(new_done, TB_START, next_carried)
        buf_c = lax.dynamic_update_slice_in_dim(
            buf_c, op_code[None], t, axis=0
        )
        buf_l = lax.dynamic_update_slice_in_dim(
            buf_l, op_len[None], t, axis=0
        )
        return (
            t + 1, new_i, new_j, next_carried, next_use_s, new_done,
            buf_c, buf_l,
        )

    # early-exit while_loop: typical paths are far shorter than M+N
    # (high-identity reads walk ~max(m, n) steps); lanes that finish emit
    # op 0 padding which the decoder stops at
    state0 = (
        jnp.int32(0),
        mlens,
        nlens,
        jnp.full(B, TB_START, I32),
        jnp.ones(B, bool),
        jnp.zeros(B, bool),
        jnp.zeros((T_steps, B), jnp.uint8),
        jnp.zeros((T_steps, B), jnp.uint16),
    )
    _, fi, fj, _, _, done, op_codes, op_lens = lax.while_loop(
        cond, walk_step, state0
    )
    return {
        "op_codes": op_codes,  # (T, B) end -> start
        "op_lens": op_lens,  # run lengths for Match/Subst jumps (0 = 1)
        "xstart": jnp.zeros(B, I32),
        "ystart": jnp.zeros(B, I32),
        "xend": mlens,
        "yend": nlens,
        "walk_done": done,
    }


def _walk_semiclip(tb_xb, tbfix, mlens, nlens, B, M, N):
    """Lockstep walk for x-clip-free modes (semiglobal family).

    ``tb_xb``: kernel-native column-major cells as in ``_walk_global``;
    ``tbfix`` (B, M+1) int32: the suffix-FIXED final column, 12-bit cell |
    (Ly(i) << 12) — selected whenever the walk sits at j == nlens (the raw
    final column in ``tb_xb`` predates the fixups). Only y-clip layers can
    occur (x-clips are MIN_SCORE by contract).
    """
    Mp1 = M + 1
    T_steps = M + N + 8

    def cond(state):
        return (state[0] < T_steps) & ~jnp.all(state[7])

    def walk_step(state):
        t, i, j, carried, use_s, ystart, yend, done, buf_c, buf_l = state
        cm = jnp.take_along_axis(
            tb_xb, (j * Mp1 + i)[None, :], axis=0
        )[0].astype(I32)
        cf = jnp.take_along_axis(tbfix, i[:, None], axis=1)[:, 0]
        use_fix = j == nlens
        cell = jnp.where(use_fix, cf & 0xFFF, cm & 0xFFF)
        ib = cell & 0xF
        db = (cell >> 4) & 0xF
        sb = (cell >> 8) & 0xF
        ly = cf >> 12  # meaningful only at j == nlens
        layer = jnp.where(use_s, sb, carried)

        is_ins = layer == TB_INS
        is_del = layer == TB_DEL
        is_mm = (layer == TB_MATCH) | (layer == TB_SUBST)
        is_yp = layer == TB_YCLIP_PREFIX
        is_ys = layer == TB_YCLIP_SUFFIX
        run = jnp.maximum((cm >> 12) & 0xF, 1)
        r = jnp.where(is_mm & use_s & ~use_fix, run, 1)

        op_code = jnp.where(done, 0, layer).astype(jnp.uint8)
        op_len = jnp.where(
            done, 0, is_mm * r + is_yp * j + is_ys * ly
        ).astype(jnp.uint16)
        new_i = jnp.where(done, i, i - (is_ins * 1 + is_mm * r))
        new_j = jnp.where(
            done, j, j - (is_del * 1 + is_mm * r + is_ys * ly + is_yp * j)
        )
        ystart = jnp.where(is_yp & ~done, j, ystart)
        yend = jnp.where(is_ys & ~done, new_j, yend)

        new_done = done | (layer == TB_START)
        next_carried = jnp.where(is_ins, ib, db)
        next_use_s = ~(is_ins | is_del) | new_done
        next_carried = jnp.where(new_done, TB_START, next_carried)
        buf_c = lax.dynamic_update_slice_in_dim(
            buf_c, op_code[None], t, axis=0
        )
        buf_l = lax.dynamic_update_slice_in_dim(
            buf_l, op_len[None], t, axis=0
        )
        return (
            t + 1, new_i, new_j, next_carried, next_use_s, ystart, yend,
            new_done, buf_c, buf_l,
        )

    state0 = (
        jnp.int32(0),
        mlens,
        nlens,
        jnp.full(B, TB_START, I32),
        jnp.ones(B, bool),
        jnp.zeros(B, I32),
        nlens,
        jnp.zeros(B, bool),
        jnp.zeros((T_steps, B), jnp.uint8),
        jnp.zeros((T_steps, B), jnp.uint16),
    )
    (
        _, fi, fj, _, _, ystart, yend, done, op_codes, op_lens
    ) = lax.while_loop(cond, walk_step, state0)
    return {
        "op_codes": op_codes,
        "op_lens": op_lens,
        "xstart": jnp.zeros(B, I32),
        "ystart": ystart,
        "xend": mlens,
        "yend": yend,
        "walk_done": done,
    }


@partial(
    jax.jit, static_argnames=("with_traceback", "sweep_walk", "merged_runs")
)
def _align_batch_device_semiglobal_mp(
    xb, yb, mlens, nlens, penalties8, with_traceback: bool = True,
    sweep_walk: bool = True, merged_runs: int = 0,
):
    """Semiglobal-family MatchParams fast path (x-clips MIN, y-clips
    dynamic): transposed Pallas scan + the shared XLA suffix fixups on the
    small transposed finals + the y-clip walk. Bit-identical to the
    general engines (property-tested)."""
    from rust_bio_tpu.ops.sw_pallas import scan_semiglobal_pallas_mp

    B, M = xb.shape
    N = yb.shape[1]
    pens = tuple(penalties8[k] for k in range(6))

    tb_cols, S_f, I_f, Sn_f, Ly_f, tbk = scan_semiglobal_pallas_mp(
        xb, yb, mlens, nlens, penalties8,
        runs=("ins" if sweep_walk else True) if with_traceback else False,
    )
    rows, row_ge1, mlens_c, is_row_m = _geometry(B, M, mlens)
    score, tb_col_fixed, _Lx_n, _lx_set = _suffix_fixups(
        S_f, I_f, Sn_f, tbk.astype(jnp.uint16),
        B, M, rows, row_ge1, mlens, mlens_c, is_row_m, pens,
    )
    if not with_traceback:
        return {"score": score}

    tbfix = (tb_col_fixed.astype(I32) & 0xFFF) | (Ly_f << 12)
    if sweep_walk:
        from rust_bio_tpu.ops.walk_pallas import sweep_walk_semiglobal

        (
            ins_cnt, exit_op, ins0, fix_ins, fix_exit, fix_ly, ystart, yend
        ) = sweep_walk_semiglobal(tb_cols, tbfix, mlens, nlens)
        if merged_runs:
            rk, rl, nr, ovf = _merge_rle_device(
                ins_cnt, exit_op, ins0, fix_ins, fix_exit, nlens,
                merged_runs,
            )
            return {
                "score": score,
                "packed_merged": _pack_rle_merged(
                    score, rk, rl, nr, ovf, jnp.zeros(B, I32), mlens
                ),
            }
        return {
            "score": score,
            "packed": _pack_rle(
                score, ins_cnt, exit_op, ins0, fix_ins, fix_exit, fix_ly,
                jnp.zeros(B, I32), ystart, mlens, yend,
            ),
        }

    *_, tb_col0, _Lx0 = _init_column(
        B, M, rows, row_ge1, mlens, nlens, mlens_c, is_row_m, pens
    )
    tb_xb = jnp.concatenate(
        [jnp.transpose(tb_col0, (1, 0))[None], tb_cols], axis=0
    ).reshape(-1, B)

    out = _walk_semiclip(tb_xb, tbfix, mlens, nlens, B, M, N)
    out["score"] = score
    return out


def _walk_fullclip(tb_xb, tbfix, Lx_full, mlens, nlens, B, M, N):
    """Kernel-native lockstep walk with ALL clip layers live (local/custom
    modes): one main-cell gather + one fixed-column gather + one Lx gather
    per step. ``tbfix`` packs Ly(i) above the 12-bit cell; ``Lx_full``
    (B, N+1) holds per-column x-suffix clip lengths (fixups-patched at the
    final column)."""
    Mp1 = M + 1
    T_steps = M + N + 8

    def cond(state):
        return (state[0] < T_steps) & ~jnp.all(state[9])

    def walk_step(state):
        (
            t, i, j, carried, use_s, xstart, ystart, xend, yend, done,
            buf_c, buf_l,
        ) = state
        cm = jnp.take_along_axis(
            tb_xb, (j * Mp1 + i)[None, :], axis=0
        )[0].astype(I32)
        cf = jnp.take_along_axis(tbfix, i[:, None], axis=1)[:, 0]
        use_fix = j == nlens
        cell = jnp.where(use_fix, cf & 0xFFF, cm & 0xFFF)
        ib = cell & 0xF
        db = (cell >> 4) & 0xF
        sb = (cell >> 8) & 0xF
        ly = cf >> 12
        lx = jnp.take_along_axis(Lx_full, j[:, None], axis=1)[:, 0]
        layer = jnp.where(use_s, sb, carried)

        is_ins = layer == TB_INS
        is_del = layer == TB_DEL
        is_mm = (layer == TB_MATCH) | (layer == TB_SUBST)
        is_xp = layer == TB_XCLIP_PREFIX
        is_xs = layer == TB_XCLIP_SUFFIX
        is_yp = layer == TB_YCLIP_PREFIX
        is_ys = layer == TB_YCLIP_SUFFIX
        run = jnp.maximum((cm >> 12) & 0xF, 1)
        r = jnp.where(is_mm & use_s & ~use_fix, run, 1)

        op_code = jnp.where(done, 0, layer).astype(jnp.uint8)
        op_len = jnp.where(
            done, 0,
            is_mm * r + is_xp * i + is_xs * lx + is_yp * j + is_ys * ly,
        ).astype(jnp.uint16)
        new_i = jnp.where(
            done, i, i - (is_ins * 1 + is_mm * r + is_xs * lx + is_xp * i)
        )
        new_j = jnp.where(
            done, j, j - (is_del * 1 + is_mm * r + is_ys * ly + is_yp * j)
        )
        xstart = jnp.where(is_xp & ~done, i, xstart)
        xend = jnp.where(is_xs & ~done, new_i, xend)
        ystart = jnp.where(is_yp & ~done, j, ystart)
        yend = jnp.where(is_ys & ~done, new_j, yend)

        new_done = done | (layer == TB_START)
        next_carried = jnp.where(is_ins, ib, db)
        next_use_s = ~(is_ins | is_del) | new_done
        next_carried = jnp.where(new_done, TB_START, next_carried)
        buf_c = lax.dynamic_update_slice_in_dim(
            buf_c, op_code[None], t, axis=0
        )
        buf_l = lax.dynamic_update_slice_in_dim(
            buf_l, op_len[None], t, axis=0
        )
        return (
            t + 1, new_i, new_j, next_carried, next_use_s,
            xstart, ystart, xend, yend, new_done, buf_c, buf_l,
        )

    state0 = (
        jnp.int32(0),
        mlens,
        nlens,
        jnp.full(B, TB_START, I32),
        jnp.ones(B, bool),
        jnp.zeros(B, I32),
        jnp.zeros(B, I32),
        mlens,
        nlens,
        jnp.zeros(B, bool),
        jnp.zeros((T_steps, B), jnp.uint8),
        jnp.zeros((T_steps, B), jnp.uint16),
    )
    (
        _, fi, fj, _, _, xstart, ystart, xend, yend, done, op_codes, op_lens
    ) = lax.while_loop(cond, walk_step, state0)
    return {
        "op_codes": op_codes,
        "op_lens": op_lens,
        "xstart": xstart,
        "ystart": ystart,
        "xend": xend,
        "yend": yend,
        "walk_done": done,
    }


@partial(
    jax.jit,
    static_argnames=(
        "with_traceback", "sweep_walk", "local_engine", "local_walk"
    ),
)
def _align_batch_device_custom_mp(
    xb, yb, mlens, nlens, penalties8, with_traceback: bool = True,
    sweep_walk: bool = True, local_engine: bool = False,
    local_walk: bool = False,
):
    """General-clip MatchParams fast path (local/custom modes): the
    transposed general kernel streams per-column Lx clip lengths, the
    shared XLA suffix fixups run on the transposed finals, and the
    full-clip kernel-native walk emits reference-exact operations.

    ``local_engine=True`` (caller guarantees all four clip penalties are
    0, i.e. the reference's local() preset) swaps in the specialized
    local-mode kernel — byte-identical scan outputs at ~40% of the
    arithmetic; everything downstream is shared."""
    from rust_bio_tpu.ops.sw_pallas import (
        scan_custom_pallas_mp,
        scan_local_pallas_mp,
    )

    B, M = xb.shape
    N = yb.shape[1]
    pens = tuple(penalties8[k] for k in range(6))

    scan = scan_local_pallas_mp if local_engine else scan_custom_pallas_mp
    # nibble mode: vertical ins-run for the sweep walk; diagonal same-op
    # runs for the custom buffer walk (the local kernel never wrote them)
    if with_traceback and sweep_walk:
        runs = "ins"
    elif with_traceback and not local_engine:
        runs = True
    else:
        runs = False
    tb_cols, lx_cols, S_f, I_f, Sn_f, Ly_f, tbk = scan(
        xb, yb, mlens, nlens, penalties8, runs=runs
    )
    rows, row_ge1, mlens_c, is_row_m = _geometry(B, M, mlens)
    score, tb_col_fixed, Lx_n, lx_n_set = _suffix_fixups(
        S_f, I_f, Sn_f, tbk.astype(jnp.uint16),
        B, M, rows, row_ge1, mlens, mlens_c, is_row_m, pens,
    )
    if not with_traceback:
        return {"score": score}

    # the scans emit the j = 0 init column at index 0 (sweep mode: with its
    # ins-run nibble — column 0 can hold multi-row I runs when a leading
    # gap beats the x-prefix clip), so no host-side init column or tb
    # concat copy is needed
    tbfix = (tb_col_fixed.astype(I32) & 0xFFF) | (Ly_f << 12)
    bidx = jnp.arange(B)
    lx_n_patched = jnp.where(
        lx_n_set,
        Lx_n,
        jnp.take_along_axis(
            jnp.transpose(lx_cols, (1, 0)), nlens[:, None], axis=1
        )[:, 0],
    )
    if sweep_walk and local_walk:
        # LOCAL-specialized walk (caller guarantees local_engine clips
        # AND gap_open + gap_extend < 0 — see sweep_walk_local): the
        # interior kernel drops all clip machinery (global-kernel cost)
        # and the packed pull is ONE stream instead of four
        from rust_bio_tpu.ops.walk_pallas import sweep_walk_local

        (
            ins_cnt, exit_op, fix_codes, fix_lens,
            xstart, ystart, xend, yend,
        ) = sweep_walk_local(
            tb_cols, tbfix, lx_cols, lx_n_patched, mlens, nlens
        )
        return {
            "score": score,
            "packed_local": _pack_rle_local(
                score, ins_cnt, exit_op, fix_codes, fix_lens,
                xstart, ystart, xend, yend,
            ),
        }
    if sweep_walk:
        from rust_bio_tpu.ops.walk_pallas import sweep_walk_custom

        (
            pre, ins_cnt, exit_op, elen, post,
            fix_codes, fix_lens, xstart, ystart, xend, yend,
        ) = sweep_walk_custom(
            tb_cols, tbfix, lx_cols, lx_n_patched, mlens, nlens
        )
        return {
            "score": score,
            "packed_custom": _pack_rle_custom(
                score, pre, ins_cnt, exit_op, elen, post,
                fix_codes, fix_lens, xstart, ystart, xend, yend,
            ),
        }

    tb_xb = tb_cols.astype(I32).reshape(-1, B)
    Lx_full = jnp.transpose(lx_cols, (1, 0))  # (B, Np), column 0 included
    Lx_full = Lx_full.at[bidx, nlens].set(
        jnp.where(lx_n_set, Lx_n, Lx_full[bidx, nlens])
    )

    out = _walk_fullclip(tb_xb, tbfix, Lx_full, mlens, nlens, B, M, N)
    out["score"] = score
    return out


def _subs2_stream(xb, yb, lut, n_syms: int = 32):
    """(N, M, B) packed ``subs*2 | eq`` stream for the transposed kernels,
    emitted directly in stream order by the one-hot einsum.

    ``n_syms`` static, >= distinct bytes in the batch (see _subs_einsum)."""
    syms = jnp.unique(
        jnp.concatenate([xb.ravel(), yb.ravel()]).astype(I32),
        size=n_syms,
        fill_value=-1,
    )
    small = lut[jnp.clip(syms, 0)[:, None], jnp.clip(syms, 0)[None, :]]
    ox = (xb[:, :, None] == syms[None, None, :]).astype(jnp.float32)
    oy = (yb[:, :, None] == syms[None, None, :]).astype(jnp.float32)
    subs_nmb = jnp.einsum(
        "bms,st,bnt->nmb", ox, small.astype(jnp.float32), oy,
        preferred_element_type=jnp.float32,
    ).astype(I32)
    eq_nmb = (
        jnp.swapaxes(yb, 0, 1)[:, None, :] == jnp.swapaxes(xb, 0, 1)[None, :, :]
    ).astype(I32)
    return subs_nmb * 2 + eq_nmb


@partial(jax.jit, static_argnames=("with_traceback", "n_syms", "sweep_walk"))
def _align_batch_device_semiglobal_lut(
    xb, yb, mlens, nlens, lut, penalties, with_traceback: bool = True,
    n_syms: int = 32, sweep_walk: bool = True,
):
    """Semiglobal-family fast path for arbitrary LUT scorings: streamed
    packed-subs transposed kernel + the shared suffix fixups + y-clip walk
    (mirrors ``_align_batch_device_semiglobal_mp``)."""
    from rust_bio_tpu.ops.sw_pallas import scan_semiglobal_pallas_subs

    B, M = xb.shape
    N = yb.shape[1]
    pens = tuple(penalties[k] for k in range(6))

    subs2 = _subs2_stream(xb, yb, lut, n_syms)
    tb_cols, S_f, I_f, Sn_f, Ly_f, tbk = scan_semiglobal_pallas_subs(
        subs2, mlens, nlens, penalties,
        runs=("ins" if sweep_walk else True) if with_traceback else False,
    )
    rows, row_ge1, mlens_c, is_row_m = _geometry(B, M, mlens)
    score, tb_col_fixed, _Lx_n, _lx_set = _suffix_fixups(
        S_f, I_f, Sn_f, tbk.astype(jnp.uint16),
        B, M, rows, row_ge1, mlens, mlens_c, is_row_m, pens,
    )
    if not with_traceback:
        return {"score": score}

    tbfix = (tb_col_fixed.astype(I32) & 0xFFF) | (Ly_f << 12)
    if sweep_walk:
        from rust_bio_tpu.ops.walk_pallas import sweep_walk_semiglobal

        (
            ins_cnt, exit_op, ins0, fix_ins, fix_exit, fix_ly, ystart, yend
        ) = sweep_walk_semiglobal(tb_cols, tbfix, mlens, nlens)
        return {
            "score": score,
            "packed": _pack_rle(
                score, ins_cnt, exit_op, ins0, fix_ins, fix_exit, fix_ly,
                jnp.zeros(B, I32), ystart, mlens, yend,
            ),
        }

    *_, tb_col0, _Lx0 = _init_column(
        B, M, rows, row_ge1, mlens, nlens, mlens_c, is_row_m, pens
    )
    tb_xb = jnp.concatenate(
        [jnp.transpose(tb_col0, (1, 0))[None], tb_cols], axis=0
    ).reshape(-1, B)

    out = _walk_semiclip(tb_xb, tbfix, mlens, nlens, B, M, N)
    out["score"] = score
    return out


@partial(jax.jit, static_argnames=("with_traceback", "sweep_walk", "n_syms"))
def _align_batch_device_global_lut(
    xb, yb, mlens, nlens, lut, penalties, with_traceback: bool = True,
    sweep_walk: bool = True, n_syms: int = 32,
):
    """Global-mode fast path for ARBITRARY substitution scorings
    (BLOSUM/PAM/custom LUTs): the substitution tensor comes from the
    rank-compacted one-hot einsum on the MXU, packed as ``subs*2 | eq``
    and streamed into the transposed Pallas kernel; postlude identical to
    the MatchParams global path (column-sweep Pallas walk by default)."""
    from rust_bio_tpu.ops.sw_pallas import scan_global_pallas_subs

    B, M = xb.shape
    N = yb.shape[1]
    pens = tuple(penalties[k] for k in range(6))

    subs2 = _subs2_stream(xb, yb, lut, n_syms)
    score, tb_cols, _tbk = scan_global_pallas_subs(
        subs2, mlens, nlens, penalties,
        runs=("ins" if sweep_walk else True) if with_traceback else False,
    )
    if not with_traceback:
        return {"score": score}

    if sweep_walk:
        from rust_bio_tpu.ops.walk_pallas import sweep_walk_global

        ins_cnt, exit_op, ins0 = sweep_walk_global(tb_cols, mlens, nlens)
        z = jnp.zeros(B, I32)
        return {
            "score": score,
            "packed": _pack_rle(
                score, ins_cnt, exit_op, ins0, z, z, z, z, z, mlens, nlens,
            ),
        }

    rows, row_ge1, mlens_c, is_row_m = _geometry(B, M, mlens)
    *_, tb_col0, _Lx0 = _init_column(
        B, M, rows, row_ge1, mlens, nlens, mlens_c, is_row_m, pens
    )
    tb_xb = jnp.concatenate(
        [jnp.transpose(tb_col0, (1, 0))[None], tb_cols], axis=0
    ).reshape(-1, B)
    out = _walk_global(tb_xb, mlens, nlens, B, M, N)
    out["score"] = score
    return out


@partial(
    jax.jit, static_argnames=("with_traceback", "sweep_walk", "merged_runs")
)
def _align_batch_device_global_mp(
    xb, yb, mlens, nlens, penalties8, with_traceback: bool = True,
    sweep_walk: bool = True, merged_runs: int = 0,
):
    """Global-mode MatchParams fastest path: the transposed Pallas kernel
    (ops/sw_pallas.scan_global_pallas_mp) computes scores + traceback cells
    with DP rows on sublanes; suffix fixups and clip bookkeeping are
    provably dead in global mode, so the postlude is just the clip-free
    walk over the kernel-native layout (no transposes, no scatters).
    Bit-identical to the general engines (property-tested).

    ``sweep_walk``: use the Pallas column-sweep walk (one sequential
    reverse pass over the tb tensor, ops/walk_pallas.py) instead of the
    per-step-gather XLA walk; emits the identical op sequence in
    column-RLE form (decoded by ``_decode_ops_colrle``).
    """
    from rust_bio_tpu.ops.sw_pallas import scan_global_pallas_mp

    B, M = xb.shape
    N = yb.shape[1]
    pens = tuple(penalties8[k] for k in range(6))

    score, tb_cols, _tbk = scan_global_pallas_mp(
        xb, yb, mlens, nlens, penalties8,
        runs=("ins" if sweep_walk else True) if with_traceback else False,
    )  # tb_cols: (Np, M+1, B), columns 1..N valid
    if not with_traceback:
        return {"score": score}

    if sweep_walk:
        from rust_bio_tpu.ops.walk_pallas import sweep_walk_global

        ins_cnt, exit_op, ins0 = sweep_walk_global(tb_cols, mlens, nlens)
        z = jnp.zeros(B, I32)
        if merged_runs:
            rk, rl, nr, ovf = _merge_rle_device(
                ins_cnt, exit_op, ins0, z, z, nlens, merged_runs
            )
            return {
                "score": score,
                "packed_merged": _pack_rle_merged(
                    score, rk, rl, nr, ovf, z, mlens
                ),
            }
        return {
            "score": score,
            "packed": _pack_rle(
                score, ins_cnt, exit_op, ins0, z, z, z, z, z, mlens, nlens,
            ),
        }

    rows, row_ge1, mlens_c, is_row_m = _geometry(B, M, mlens)
    *_, tb_col0, _Lx0 = _init_column(
        B, M, rows, row_ge1, mlens, nlens, mlens_c, is_row_m, pens
    )
    tb_xb = jnp.concatenate(
        [jnp.transpose(tb_col0, (1, 0))[None], tb_cols], axis=0
    ).reshape(-1, B)  # ((Np+1)*(M+1), B)

    out = _walk_global(tb_xb, mlens, nlens, B, M, N)
    out["score"] = score
    return out


@partial(jax.jit, static_argnames=("with_traceback",))
def _align_batch_device_global_rows_mp(
    xb, yb, mlens, nlens, penalties8, with_traceback: bool = True
):
    """Global-mode long-sequence path: the block-row Pallas engine
    (ops/sw_pallas.scan_global_rows_pallas_mp) tiles DP rows into RB-row
    blocks with carried per-column boundaries, so M far beyond the
    single-block VMEM cap stays on Pallas; traceback via the column-sweep
    walk (whole columns are visible there, so the TB_REREAD open
    back-pointers written at block seams resolve exactly).
    Bit-identical to the single-block global engine (property-tested).
    """
    from rust_bio_tpu.ops.sw_pallas import scan_global_rows_pallas_mp
    from rust_bio_tpu.ops.walk_pallas import sweep_walk_global

    B, M = xb.shape
    score, tb_cols, _RRB = scan_global_rows_pallas_mp(
        xb, yb, mlens, nlens, penalties8
    )  # tb_cols: (Np, RRB, B)
    if not with_traceback:
        return {"score": score}

    ins_cnt, exit_op, ins0 = sweep_walk_global(tb_cols, mlens, nlens, ins_nib=False)
    z = jnp.zeros(B, I32)
    return {
        "score": score,
        "packed": _pack_rle(
            score, ins_cnt, exit_op, ins0, z, z, z, z, z, mlens, nlens,
        ),
    }


_OP_BY_CODE = {
    TB_INS: Ins,
    TB_DEL: Del,
    TB_MATCH: Match,
    TB_SUBST: Subst,
}


def _decode_ops_colrle(
    ins_cnt: np.ndarray, exit_op: np.ndarray, ins0: int, nlen: int
) -> List[AlignmentOperation]:
    """Decode the column-RLE walk output of ops/walk_pallas.py (one
    ``[Ins x cnt][exit]`` group per DP column, emitted end -> start) into
    the start -> end op list.  Bit-identical order to the sequential walk:
    reversed, the sequence is ``Ins*ins0`` then per column j ascending the
    exit op followed by that column's insertion run."""
    ops: List[AlignmentOperation] = [Ins] * int(ins0)
    exits = exit_op[:nlen].tolist()
    cnts = ins_cnt[:nlen].tolist()
    for j in range(nlen):
        c = exits[j]
        if c:
            ops.append(_OP_BY_CODE[c])
        n = cnts[j]
        if n:
            ops.extend([Ins] * n)
    return ops


_OP_ARR = np.empty(16, object)
for _c, _o in _OP_BY_CODE.items():
    _OP_ARR[_c] = _o


def _decode_ops_colrle_semi(
    ins_cnt, exit_op, ins0: int,
    fix_ins: int, fix_exit: int, fix_ly: int, nlen: int,
) -> List[AlignmentOperation]:
    """Decode the semiglobal column-RLE walk: per sweep column an
    ``[Ins x cnt][exit]`` group (exit may be Yclip-prefix of length j),
    then the fixed final column's group, emitted end -> start and
    reconstructed here start -> end (bit-identical order to the
    sequential ``_walk_semiclip``)."""
    ops: List[AlignmentOperation] = [Ins] * int(ins0)
    # tolist first: indexing numpy scalars in the column loop costs ~0.2 ms
    # per lane at read-mapper batch sizes
    exits = exit_op[:nlen].tolist()
    cnts = ins_cnt[:nlen].tolist()
    for j in range(nlen):
        c = exits[j]
        if c:
            if c == TB_YCLIP_PREFIX:
                ops.append(Yclip(j + 1))
            else:
                ops.append(_OP_BY_CODE[c])
        n = cnts[j]
        if n:
            ops.extend([Ins] * n)
    c = int(fix_exit)
    if c:
        if c in (TB_YCLIP_PREFIX, TB_YCLIP_SUFFIX):
            ops.append(Yclip(int(fix_ly)))
        else:
            ops.append(_OP_BY_CODE[c])
    ops.extend([Ins] * int(fix_ins))
    return ops


def _decode_semi_batch(
    ins_cnt, exit_op, ins0, fix_ins, fix_exit, fix_ly, nlens,
    drop_clips: bool = False,
) -> List[List[AlignmentOperation]]:
    """Whole-batch vectorized ``_decode_ops_colrle_semi``: one object-LUT
    ``np.repeat`` over the interleaved [exit][Ins-run] column stream of
    every lane (the per-read Python column loop costs ~40 ms per 1024
    reads at 216 columns; this is ~10x cheaper). Bit-identical op lists."""
    B = len(nlens)
    N = int(nlens.max()) if B else 0
    valid = np.arange(N)[None, :] < np.asarray(nlens)[:, None]  # (B, N)
    ex = exit_op[:N].T.astype(np.int64) * valid
    cnt = ins_cnt[:N].T.astype(np.int64) * valid
    W = 2 * N + 3
    C = np.zeros((B, W), np.int64)
    Lm = np.zeros((B, W), np.int64)
    C[:, 0] = TB_INS
    Lm[:, 0] = ins0
    C[:, 1 : 1 + 2 * N : 2] = ex
    Lm[:, 1 : 1 + 2 * N : 2] = 1
    C[:, 2 : 2 + 2 * N : 2] = TB_INS
    Lm[:, 2 : 2 + 2 * N : 2] = cnt
    C[:, 1 + 2 * N] = fix_exit
    Lm[:, 1 + 2 * N] = 1
    C[:, 2 + 2 * N] = TB_INS
    Lm[:, 2 + 2 * N] = fix_ins
    is_clip = C >= TB_XCLIP_PREFIX
    reps = np.where(
        C == 0, 0,
        np.where(is_clip, 0 if drop_clips else 1, np.maximum(Lm, 0)),
    )
    lutidx = np.where(is_clip, 0, C)  # clip slots patched below
    ops_flat = np.repeat(_OP_ARR[lutidx.ravel()], reps.ravel())
    row_tot = reps.sum(axis=1)
    offs = np.concatenate([[0], np.cumsum(row_tot)])
    within = np.cumsum(reps, axis=1) - reps
    for r, col in zip(*np.nonzero(is_clip & (reps > 0))):
        c = int(C[r, col])
        if col == 1 + 2 * N:
            ln = int(fix_ly[r])
        else:
            ln = (col - 1) // 2 + 1  # Yclip-prefix at column j -> Yclip(j+1)
        ops_flat[offs[r] + within[r, col]] = (
            Xclip(ln) if c in (TB_XCLIP_PREFIX, TB_XCLIP_SUFFIX) else Yclip(ln)
        )
    return [ops_flat[offs[k] : offs[k + 1]].tolist() for k in range(B)]


def _decode_ops_colrle_local(
    ins_cnt, exit_op, fix_codes, fix_lens, nlen: int,
    xstart: int = 0, ystart: int = 0, keep_clips: bool = False,
) -> List[AlignmentOperation]:
    """Decode the local-mode column-RLE walk (columns 0..nlen ascending;
    per column [exit][Ins x cnt]; then the fixed-column slots, newest
    last).  Interior streams carry no clips — terminal Xclip/Yclip
    prefixes resolved to coordinates in the kernel; suffix clips live in
    the fix slots (dropped by local's filter_clip_operations anyway).

    ``keep_clips`` (the custom() preset with all-zero clips dispatching
    into the local engine, where clip ops must be MATERIALIZED like the
    reference's custom mode, pairwise/mod.rs:845-921): the kernel-resolved
    prefix clips are re-emitted from (xstart, ystart).  With zero clips a
    path starting at xstart > 0 always enters via TB_XCLIP_PREFIX, and a
    row-0 cell at ystart > 0 is always TB_YCLIP_PREFIX (the gap ramp is
    strictly negative), so the reference op order is
    [Yclip(ystart), Xclip(xstart), <interior>...].  Degenerate lanes whose
    whole path lives in the fixed final column already emit their prefix
    clips through the fix slots (at most one source is ever nonzero —
    see _kernel_sweep_walk_local's max-merge)."""
    ops: List[AlignmentOperation] = []
    exits = exit_op[: nlen + 1].tolist()
    cnts = ins_cnt[: nlen + 1].tolist()
    for j in range(nlen + 1):
        e = exits[j]
        if e:
            ops.append(_OP_BY_CODE[e])
        n = cnts[j]
        if n:
            ops.extend([Ins] * n)
    emitted_xp = emitted_yp = False
    for t in range(3, -1, -1):
        c = int(fix_codes[t])
        if not c:
            continue
        if c == TB_INS:
            ops.extend([Ins] * int(fix_lens[t]))
        elif c in (TB_XCLIP_PREFIX, TB_XCLIP_SUFFIX):
            ops.append(Xclip(int(fix_lens[t])))
            emitted_xp = emitted_xp or c == TB_XCLIP_PREFIX
        elif c in (TB_YCLIP_PREFIX, TB_YCLIP_SUFFIX):
            ops.append(Yclip(int(fix_lens[t])))
            emitted_yp = emitted_yp or c == TB_YCLIP_PREFIX
        else:
            ops.append(_OP_BY_CODE[c])
    if keep_clips:
        pre: List[AlignmentOperation] = []
        if ystart and not emitted_yp:
            pre.append(Yclip(ystart))
        if xstart and not emitted_xp:
            pre.append(Xclip(xstart))
        if pre:
            ops = pre + ops
    return ops


def _decode_ops_colrle_custom(
    pre, ins_cnt, exit_op, elen, post, fix_codes, fix_lens, nlen: int,
) -> List[AlignmentOperation]:
    """Decode the general-clip column-RLE walk (columns 0..nlen ascending;
    per column the reversed emission is [post][exit][Ins x cnt][Xclip-
    suffix]; then the fixed final column's slots, newest last)."""
    ops: List[AlignmentOperation] = []
    posts = post[: nlen + 1].tolist()
    exits = exit_op[: nlen + 1].tolist()
    elens = elen[: nlen + 1].tolist()
    cnts = ins_cnt[: nlen + 1].tolist()
    pres = pre[: nlen + 1].tolist()
    for j in range(nlen + 1):
        p = posts[j]
        if p:
            if p == TB_YCLIP_PREFIX:
                ops.append(Yclip(j))
            else:
                ops.append(_OP_BY_CODE[p])
        e = exits[j]
        if e:
            if e == TB_XCLIP_PREFIX:
                ops.append(Xclip(elens[j]))
            elif e == TB_YCLIP_PREFIX:
                ops.append(Yclip(elens[j]))
            else:
                ops.append(_OP_BY_CODE[e])
        n = cnts[j]
        if n:
            ops.extend([Ins] * n)
        if pres[j]:
            ops.append(Xclip(pres[j]))
    for t in range(3, -1, -1):
        c = int(fix_codes[t])
        if not c:
            continue
        if c == TB_INS:
            ops.extend([Ins] * int(fix_lens[t]))
        elif c in (TB_XCLIP_PREFIX, TB_XCLIP_SUFFIX):
            ops.append(Xclip(int(fix_lens[t])))
        elif c in (TB_YCLIP_PREFIX, TB_YCLIP_SUFFIX):
            ops.append(Yclip(int(fix_lens[t])))
        else:
            ops.append(_OP_BY_CODE[c])
    return ops


def _decode_ops(codes: np.ndarray, lens: np.ndarray) -> List[AlignmentOperation]:
    """Decode one lane's (T,) walk buffers into the op list (end -> start
    reversed to start -> end).  Vectorized: a per-entry Python loop costs
    ~100 ms per thousand-lane batch; the numpy object-LUT expansion is
    ~10x cheaper."""
    nz = np.nonzero(codes == 0)[0]
    end = int(nz[0]) if nz.size else len(codes)
    if end == 0:
        return []
    c = codes[:end].astype(np.intp)
    l = lens[:end].astype(np.int64)
    # l > 1 on Match/Subst (run nibble) or on the banded ending fixups'
    # Ins/Del runs: expand to l copies; clip entries stay single
    is_clip = c >= TB_XCLIP_PREFIX
    reps = np.where(is_clip, 1, np.maximum(l, 1))
    ops = _OP_ARR[np.repeat(c, reps)].tolist()
    if is_clip.any():
        offs = np.concatenate([[0], np.cumsum(reps)])
        for j in np.nonzero(is_clip)[0]:
            code = int(c[j])
            ops[int(offs[j])] = (
                Xclip(int(l[j]))
                if code in (TB_XCLIP_PREFIX, TB_XCLIP_SUFFIX)
                else Yclip(int(l[j]))
            )
    ops.reverse()
    return ops


_CIGAR_BY_CODE = {TB_INS: "I", TB_DEL: "D", TB_SUBST: "X", TB_MATCH: "="}


def _format_cigar_strings(run_row, run_kind, run_len, B, xs_a, xe_a, m_a):
    """Vectorized byte-level CIGAR formatting for a flat merged-run list
    (row-major per lane): per-run Python f-strings cost ~0.4 s per
    8192-lane low-identity batch (~100 runs/pair); fixed-width digit
    buffers + a boolean compaction build every string in one pass.
    Per-column entries are uint16-bounded, but MERGED runs (e.g. one D
    run spanning the whole target) can reach N — 7 digits (guarded)."""
    assert len(run_len) == 0 or run_len.max() < 10_000_000, (
        "CIGAR run exceeds 7 digits"
    )
    R = len(run_len)
    opch = np.array(
        [0, ord("I"), ord("D"), ord("X"), ord("=")], np.uint8
    )[run_kind]
    ndig = (
        1
        + (run_len >= 10)
        + (run_len >= 100)
        + (run_len >= 1000)
        + (run_len >= 10000)
        + (run_len >= 100000)
        + (run_len >= 1000000)
    ).astype(np.int64)
    buf = np.empty((R, 8), np.uint8)
    buf[:, 0] = 48 + run_len // 1000000 % 10
    buf[:, 1] = 48 + run_len // 100000 % 10
    buf[:, 2] = 48 + run_len // 10000 % 10
    buf[:, 3] = 48 + run_len // 1000 % 10
    buf[:, 4] = 48 + run_len // 100 % 10
    buf[:, 5] = 48 + run_len // 10 % 10
    buf[:, 6] = 48 + run_len % 10
    buf[:, 7] = opch
    keep = np.arange(8)[None, :] >= (7 - ndig)[:, None]
    flat = buf[keep].tobytes()  # row-major: run order preserved
    row_nbytes = np.bincount(
        run_row, weights=ndig + 1, minlength=B
    ).astype(np.int64)
    offs = np.zeros(B + 1, np.int64)
    np.cumsum(row_nbytes, out=offs[1:])
    out = []
    for b in range(B):
        s = flat[offs[b] : offs[b + 1]].decode()
        xs_, xe, m = int(xs_a[b]), int(xe_a[b]), int(m_a[b])
        if xs_ > 0:
            s = f"{xs_}S" + s
        if m > xe:
            s = s + f"{m - xe}S"
        out.append(s)
    return out


class PackedMergedCigars:
    """Compact delivered-CIGAR batch result: the column-RLE stream was
    merged ON DEVICE (``_merge_rle_device``) and pulled as (5+R, B)
    uint16.  Holds scores + per-lane merged runs; ``cigars()`` is pure
    formatting.  ``ovf`` lanes (more than R runs) carry no run data — the
    compact ``finish`` wrappers transparently re-run those through the
    dense packed path."""

    def __init__(self, score, up, mlens, nlens) -> None:
        self.score = score
        self._up = up
        self.mlens = np.asarray(mlens)
        self.nlens = np.asarray(nlens)
        self.xstart = up["xstart"]
        self.xend = up["xend"]
        self.overflow = up["ovf"]
        self._ovf_idx = None  # set by packed_compact_finish on overflow
        self._ovf_cigars = None

    def cigars(self) -> List[str]:
        up = self._up
        B = len(self.mlens)
        nr = up["n_runs"]  # (B,)
        R = up["run_len"].shape[0]
        mask = (np.arange(R)[None, :] < nr[:, None]) & ~up["ovf"][:, None]
        kinds = up["run_kind"].T[mask]
        lens_ = up["run_len"].T[mask]
        rows = np.nonzero(mask)[0]
        out = _format_cigar_strings(
            rows, kinds, lens_.astype(np.int64), B,
            up["xstart"], up["xend"], self.mlens,
        )
        if self._ovf_idx is not None:
            for i, c in zip(self._ovf_idx, self._ovf_cigars):
                out[i] = c
        return out


class PackedSemiglobal:
    """Column-RLE semiglobal batch result: scores/coords as arrays,
    whole-batch vectorized CIGARs, per-read Alignment decode on demand."""

    def __init__(
        self, score, up, mlens, nlens,
        mode: AlignmentMode = AlignmentMode.Semiglobal,
    ) -> None:
        self.score = score
        self._up = up
        self.mlens = np.asarray(mlens)
        self.nlens = np.asarray(nlens)
        self.mode = mode
        self.xstart = up["xstart"]
        self.ystart = up["ystart"]
        self.xend = up["xend"]
        self.yend = up["yend"]

    def cigars(self) -> List[str]:
        """All CIGAR strings: threaded native column-RLE emitter when the
        library is available (~10 ms per 8192-lane batch), else one flat
        numpy RLE merge (the per-read op walk costs ~15 us/read; the
        numpy path is ~10x cheaper than that and doubles as the oracle
        for the native emitter)."""
        up = self._up
        B = len(self.mlens)
        N = int(self.nlens.max()) if B else 0
        if B and N:
            from rust_bio_tpu import native as _native

            got = _native.cigars_colrle(
                up["exit_op"][:N].T, up["ins_cnt"][:N].T,
                self.nlens, self.mlens, up["ins0"],
                up["fix_exit"], up["fix_ins"],
                self.xstart, self.xend,
            )
            if got is not None:
                return got
        valid = np.arange(N)[None, :] < self.nlens[:, None]
        # int32 staging: the (B, 2N+3) interleave is memory-bound and
        # int64 doubles the traffic for values that are uint16-bounded
        ex = up["exit_op"][:N].T.astype(np.int32) * valid
        cnt = up["ins_cnt"][:N].T.astype(np.int32) * valid
        W = 2 * N + 3
        C = np.zeros((B, W), np.int32)
        Lm = np.zeros((B, W), np.int32)
        C[:, 0] = TB_INS
        Lm[:, 0] = up["ins0"]
        C[:, 1 : 1 + 2 * N : 2] = ex
        Lm[:, 1 : 1 + 2 * N : 2] = 1
        C[:, 2 : 2 + 2 * N : 2] = TB_INS
        Lm[:, 2 : 2 + 2 * N : 2] = cnt
        C[:, 1 + 2 * N] = up["fix_exit"]
        Lm[:, 1 + 2 * N] = 1
        C[:, 2 + 2 * N] = TB_INS
        Lm[:, 2 + 2 * N] = up["fix_ins"]
        # drop clips + empty entries; flatten row-major (already op order)
        keep = (C >= TB_INS) & (C <= TB_MATCH) & (Lm > 0)
        rr, cc = np.nonzero(keep)
        k = C[rr, cc]
        ln = Lm[rr, cc]
        if len(rr) == 0:
            return [""] * B
        # merge consecutive same-kind entries within each row
        new = np.empty(len(rr), bool)
        new[0] = True
        new[1:] = (rr[1:] != rr[:-1]) | (k[1:] != k[:-1])
        run_id = np.cumsum(new) - 1
        run_len = np.bincount(run_id, weights=ln).astype(np.int64)
        starts = np.nonzero(new)[0]
        run_kind = k[starts]
        run_row = rr[starts]
        return _format_cigar_strings(
            run_row, run_kind, run_len, B,
            np.asarray(self.xstart), np.asarray(self.xend), self.mlens,
        )

    def alignment(self, k: int) -> Alignment:
        """Full reference-exact Alignment for read ``k`` (lazy decode)."""
        up = self._up
        if self.mode is AlignmentMode.Global:
            ops = _decode_ops_colrle(
                up["ins_cnt"][:, k], up["exit_op"][:, k], up["ins0"][k],
                int(self.nlens[k]),
            )
        else:
            ops = _decode_ops_colrle_semi(
                up["ins_cnt"][:, k], up["exit_op"][:, k], up["ins0"][k],
                up["fix_ins"][k], up["fix_exit"][k], up["fix_ly"][k],
                int(self.nlens[k]),
            )
        aln = Alignment(
            score=int(self.score[k]),
            xstart=int(self.xstart[k]), ystart=int(self.ystart[k]),
            xend=int(self.xend[k]), yend=int(self.yend[k]),
            xlen=int(self.mlens[k]), ylen=int(self.nlens[k]),
            operations=ops, mode=self.mode,
        )
        if self.mode is not AlignmentMode.Global:
            aln.filter_clip_operations()
        return aln


class BatchAligner:
    """Batched aligner: pads pairs to shared (M, N) and runs the lockstep DP.

    API mirrors the reference modes (custom/global/semiglobal/local); results
    are reference-exact ``Alignment`` objects.
    """

    def __init__(self, scoring: Scoring) -> None:
        assert scoring.gap_open <= scoring.gap_extend, (
            "batched path requires gap_open <= gap_extend; "
            "use the scalar Aligner otherwise"
        )
        self.scoring = scoring
        self._lut = jnp.asarray(scoring.dense_lut())

    def _dispatch(
        self, xb, yb, mlens, nlens, pen, with_traceback,
        merged_runs: int = 0,
    ):
        """Pick the scan engine: the Pallas MatchParams kernel when the
        scoring is constant match/mismatch (and shapes allow), else XLA."""
        B, M = xb.shape
        mp = self.scoring.match_fn
        # static symbol-count bucket for the one-hot einsum LUT paths: the
        # rank compaction must cover every distinct byte of the batch
        # (fill slots are -1, so a too-small bucket would zero real rows).
        # bincount, not unique: a sort here costs ~15 ms/call at B=8192
        nd = int(
            (
                (np.bincount(xb.ravel(), minlength=256) > 0)
                | (np.bincount(yb.ravel(), minlength=256) > 0)
            ).sum()
        )
        n_syms = next(s for s in (32, 64, 128, 256) if nd <= s)
        is_global = all(int(c) == MIN_SCORE for c in pen[2:6])
        x_clips_off = (
            int(pen[2]) == MIN_SCORE and int(pen[3]) == MIN_SCORE
        )
        from rust_bio_tpu.ops.sw_pallas import (
            rows_feasible,
            transposed_feasible,
        )

        pad128 = B + (-B % 128) if B > 128 else B
        fits = transposed_feasible(max(pad128, 8), M, yb.shape[1])
        eligible = 2 <= M < 4096 and fits and (
            isinstance(mp, MatchParams) or x_clips_off
        )
        # long sequences: the block-row engine (global only) keeps M far
        # beyond the single-block VMEM cap on Pallas
        rows_ok = (
            isinstance(mp, MatchParams)
            and is_global
            and M >= 2
            and not fits
            and rows_feasible(max(pad128, 8), M, yb.shape[1])
        )
        pad_unit = 128 if B > 128 else 8  # Mosaic lane-block legality
        if (eligible or rows_ok) and B % pad_unit:
            # pad the batch to a lane-aligned multiple with 1-char dummy
            # lanes so every batch size reaches the Pallas engines
            padb = -B % pad_unit
            out = self._dispatch(
                np.pad(xb, ((0, padb), (0, 0))),
                np.pad(yb, ((0, padb), (0, 0))),
                np.pad(mlens, (0, padb), constant_values=1),
                np.pad(nlens, (0, padb), constant_values=1),
                pen,
                with_traceback,
                merged_runs=merged_runs,
            )
            return {
                k: v[:, :B] if v.ndim == 2 else v[:B] for k, v in out.items()
            }
        if (
            isinstance(mp, MatchParams)
            and 2 <= M < 4096
            and fits
            and B % 8 == 0
        ):
            pen8 = np.concatenate(
                [pen, np.array([mp.match_score, mp.mismatch_score], np.int32)]
            )
            from rust_bio_tpu.ops import sw_pallas  # noqa: F401 (kernel import)

            if all(int(c) == MIN_SCORE for c in pen[2:6]):
                # global mode: clip machinery is dead -> transposed kernel
                return _align_batch_device_global_mp(
                    jnp.asarray(xb),
                    jnp.asarray(yb),
                    jnp.asarray(mlens),
                    jnp.asarray(nlens),
                    jnp.asarray(pen8),
                    with_traceback=with_traceback,
                    merged_runs=merged_runs,
                )
            if int(pen[2]) == MIN_SCORE and int(pen[3]) == MIN_SCORE:
                # x-clips disabled (semiglobal family): transposed kernel
                # with live y-clip machinery
                return _align_batch_device_semiglobal_mp(
                    jnp.asarray(xb),
                    jnp.asarray(yb),
                    jnp.asarray(mlens),
                    jnp.asarray(nlens),
                    jnp.asarray(pen8),
                    with_traceback=with_traceback,
                    merged_runs=merged_runs,
                )
            # general clips (local/custom): transposed general kernel;
            # the all-clips-zero local() preset gets the lean kernel
            # (guarded by the packed-reduction int32 headroom check)
            from rust_bio_tpu.ops.sw_pallas import local_engine_headroom_ok

            use_local = all(int(c) == 0 for c in pen[2:6]) and (
                local_engine_headroom_ok(M, yb.shape[1], mp.match_score)
            )
            # the local-specialized sweep walk requires strictly negative
            # gap steps: with gap_open + gap_extend == 0 a del-run past a
            # free x-suffix clip can TIE the direct clip and appear on the
            # argmax path as an interior TB_XCLIP_SUFFIX, which only the
            # general (custom) walk resolves
            use_local_walk = (
                use_local
                and with_traceback
                and int(pen[0]) + int(pen[1]) < 0
            )
            return _align_batch_device_custom_mp(
                jnp.asarray(xb),
                jnp.asarray(yb),
                jnp.asarray(mlens),
                jnp.asarray(nlens),
                jnp.asarray(pen8),
                with_traceback=with_traceback,
                local_engine=use_local,
                local_walk=use_local_walk,
            )
        if eligible and x_clips_off and B % 8 == 0:
            # arbitrary LUT scoring (BLOSUM/PAM/callable): streamed
            # packed-subs transposed kernels
            from rust_bio_tpu.ops import sw_pallas  # noqa: F401

            fn = (
                _align_batch_device_global_lut
                if is_global
                else _align_batch_device_semiglobal_lut
            )
            return fn(
                jnp.asarray(xb),
                jnp.asarray(yb),
                jnp.asarray(mlens),
                jnp.asarray(nlens),
                self._lut,
                jnp.asarray(pen),
                with_traceback=with_traceback,
                n_syms=n_syms,
            )
        if rows_ok and B % pad_unit == 0:
            pen8 = np.concatenate(
                [pen, np.array([mp.match_score, mp.mismatch_score], np.int32)]
            )
            return _align_batch_device_global_rows_mp(
                jnp.asarray(xb),
                jnp.asarray(yb),
                jnp.asarray(mlens),
                jnp.asarray(nlens),
                jnp.asarray(pen8),
                with_traceback=with_traceback,
            )
        if (
            isinstance(mp, MatchParams)
            and 2 <= M < 4096
            and not fits
            and B % 8 == 0
        ):
            # transposed state too big for VMEM (long reads): lane-major
            # general Pallas engine streams per-column blocks instead
            pen8 = np.concatenate(
                [pen, np.array([mp.match_score, mp.mismatch_score], np.int32)]
            )
            from rust_bio_tpu.ops import sw_pallas  # noqa: F401

            return _align_batch_device_mp(
                jnp.asarray(xb),
                jnp.asarray(yb),
                jnp.asarray(mlens),
                jnp.asarray(nlens),
                jnp.asarray(pen8),
                with_traceback=with_traceback,
            )
        return _align_batch_device(
            jnp.asarray(xb),
            jnp.asarray(yb),
            jnp.asarray(mlens),
            jnp.asarray(nlens),
            self._lut,
            jnp.asarray(pen),
            with_traceback=with_traceback,
            n_syms=n_syms,
        )

    def _pad(self, xs, ys):
        xs = [to_bytes(x) for x in xs]
        ys = [to_bytes(y) for y in ys]
        B = len(xs)
        assert len(ys) == B
        M = max((len(x) for x in xs), default=1) or 1
        N = max((len(y) for y in ys), default=1) or 1
        xb = np.zeros((B, M), dtype=np.uint8)
        yb = np.zeros((B, N), dtype=np.uint8)
        for k, (x, y) in enumerate(zip(xs, ys)):
            xb[k, : len(x)] = np.frombuffer(x, dtype=np.uint8)
            yb[k, : len(y)] = np.frombuffer(y, dtype=np.uint8)
        mlens = np.array([len(x) for x in xs], dtype=np.int32)
        nlens = np.array([len(y) for y in ys], dtype=np.int32)
        return xb, yb, mlens, nlens

    def _run(
        self,
        xs: Sequence[bytes],
        ys: Sequence[bytes],
        clips: Tuple[int, int, int, int],
        mode: AlignmentMode,
        filter_clips: bool,
    ) -> List[Alignment]:
        xb, yb, mlens, nlens = self._pad(xs, ys)
        B = len(mlens)
        go, ge = self.scoring.gap_open, self.scoring.gap_extend
        pen = np.array([go, ge, *clips], dtype=np.int32)

        out = self._dispatch(xb, yb, mlens, nlens, pen, with_traceback=True)
        custom_rle = False
        local_rle = False
        if "packed_local" in out:
            score_np, out = _unpack_rle_local(np.asarray(out["packed_local"]))
            out["score"] = score_np
            local_rle = True
        elif "packed_custom" in out:
            score_np, out = _unpack_rle_custom(np.asarray(out["packed_custom"]))
            out["score"] = score_np
            custom_rle = True
        elif "packed" in out:
            score_np, out = _unpack_rle(np.asarray(out["packed"]))
            out["score"] = score_np
        else:
            out = jax.tree.map(np.asarray, out)

        colrle = "ins_cnt" in out
        semi_rle = "fix_exit" in out
        semi_ops = (
            _decode_semi_batch(
                out["ins_cnt"], out["exit_op"], out["ins0"],
                out["fix_ins"], out["fix_exit"], out["fix_ly"], nlens,
                drop_clips=filter_clips,  # skip a whole filtering pass
            )
            if semi_rle
            else None
        )
        results = []
        for k in range(B):
            if local_rle:
                ops = _decode_ops_colrle_local(
                    out["ins_cnt"][:, k],
                    out["exit_op"][:, k],
                    out["fix_codes"][:, k],
                    out["fix_lens"][:, k],
                    int(nlens[k]),
                    xstart=int(out["xstart"][k]),
                    ystart=int(out["ystart"][k]),
                    keep_clips=not filter_clips,
                )
            elif custom_rle:
                ops = _decode_ops_colrle_custom(
                    out["pre"][:, k],
                    out["ins_cnt"][:, k],
                    out["exit_op"][:, k],
                    out["elen"][:, k],
                    out["post"][:, k],
                    out["fix_codes"][:, k],
                    out["fix_lens"][:, k],
                    int(nlens[k]),
                )
            elif semi_rle:
                ops = semi_ops[k]
            elif colrle:
                ops = _decode_ops_colrle(
                    out["ins_cnt"][:, k],
                    out["exit_op"][:, k],
                    out["ins0"][k],
                    int(nlens[k]),
                )
            else:
                ops = _decode_ops(out["op_codes"][:, k], out["op_lens"][:, k])
            aln = Alignment(
                score=int(out["score"][k]),
                xstart=int(out["xstart"][k]),
                ystart=int(out["ystart"][k]),
                xend=int(out["xend"][k]),
                yend=int(out["yend"][k]),
                xlen=int(mlens[k]),
                ylen=int(nlens[k]),
                operations=ops,
                mode=mode,
            )
            if filter_clips and not semi_rle:
                # (the semiglobal batch decode already dropped clips)
                aln.filter_clip_operations()
            results.append(aln)
        return results

    def semiglobal_packed_async(self, xs, ys):
        """Dispatch the packed semiglobal batch WITHOUT syncing: returns an
        opaque handle whose device work is already in flight.  Pass it to
        ``semiglobal_packed_finish`` to pull + decode.  Lets the mapper
        overlap the extension kernel's ~26 ms tunnel round trip + device
        time with unrelated host work (retry pulls, result assembly)."""
        xb, yb, mlens, nlens = self._pad(xs, ys)
        return self.semiglobal_packed_async_arrays(xb, yb, mlens, nlens)

    def semiglobal_packed_async_arrays(self, xb, yb, mlens, nlens):
        """``semiglobal_packed_async`` for callers that already hold the
        padded (B, M)/(B, N) uint8 batches + length vectors (the read
        mapper's hot path: list-of-bytes packing costs ~50 ms at
        B=8192)."""
        pen = np.array(
            [self.scoring.gap_open, self.scoring.gap_extend,
             MIN_SCORE, MIN_SCORE, 0, 0],
            dtype=np.int32,
        )
        mlens = np.asarray(mlens, np.int32)
        nlens = np.asarray(nlens, np.int32)
        out = self._dispatch(xb, yb, mlens, nlens, pen, with_traceback=True)
        assert "packed" in out, (
            "semiglobal_packed requires the column-RLE engine "
            "(MatchParams scoring, kernel-feasible shapes)"
        )
        return out["packed"], mlens, nlens

    @staticmethod
    def semiglobal_packed_finish(handle) -> "PackedSemiglobal":
        """Pull + decode a ``semiglobal_packed_async`` handle (ONE device
        transfer)."""
        packed, mlens, nlens = handle
        score_np, up = _unpack_rle(np.asarray(packed))
        return PackedSemiglobal(score_np, up, mlens, nlens)

    def semiglobal_packed(self, xs, ys) -> "PackedSemiglobal":
        """Semiglobal batch WITHOUT materializing op lists: returns a
        ``PackedSemiglobal`` holding the column-RLE walk arrays, with
        vectorized whole-batch CIGAR construction and per-read on-demand
        ``Alignment`` decode.  The read-mapper hot path: op-object lists
        cost ~15 us/read at mapper batch sizes and most consumers only
        ever read pos/score/CIGAR."""
        return self.semiglobal_packed_finish(
            self.semiglobal_packed_async(xs, ys)
        )

    def global_packed_async_arrays(self, xb, yb, mlens, nlens):
        """``semiglobal_packed_async_arrays`` for GLOBAL mode: dispatch the
        column-RLE global kernel without syncing.  Global-mode packed rows
        carry zero fix/clip fields (suffix fixups are provably dead), so
        the same single-pull uint16 layout and the vectorized
        ``PackedSemiglobal.cigars()`` merge apply unchanged."""
        pen = np.array(
            [self.scoring.gap_open, self.scoring.gap_extend,
             MIN_SCORE, MIN_SCORE, MIN_SCORE, MIN_SCORE],
            dtype=np.int32,
        )
        mlens = np.asarray(mlens, np.int32)
        nlens = np.asarray(nlens, np.int32)
        out = self._dispatch(xb, yb, mlens, nlens, pen, with_traceback=True)
        assert "packed" in out, (
            "global_packed requires the column-RLE engine "
            "(MatchParams scoring, kernel-feasible shapes)"
        )
        return out["packed"], mlens, nlens

    @staticmethod
    def global_packed_finish(handle) -> "PackedSemiglobal":
        """Pull + decode a ``global_packed_async_arrays`` handle (ONE
        device transfer): scores/coords as arrays, whole-batch vectorized
        CIGARs via ``.cigars()``, lazy per-read ``Alignment`` decode."""
        packed, mlens, nlens = handle
        score_np, up = _unpack_rle(np.asarray(packed))
        return PackedSemiglobal(
            score_np, up, mlens, nlens, mode=AlignmentMode.Global
        )

    # --- compact delivered-CIGAR path (device-side RLE merge) ---

    _COMPACT_RUNS = 32  # fits mapper-realistic identity; 12-bit lengths

    def global_packed_compact_async_arrays(
        self, xb, yb, mlens, nlens, max_runs: int = 0
    ):
        """Dispatch the global batch with the ON-DEVICE run merge
        (``_merge_rle_device``): the pull shrinks from (10+N, B) to
        (5+R, B) uint16 — the delivered-CIGAR path is transfer-bound
        through the dev tunnel, and high-identity pairs merge to well
        under R runs.  Lanes exceeding R runs are transparently re-run
        through the dense packed path at ``finish`` time."""
        R = max_runs or self._COMPACT_RUNS
        pen = np.array(
            [self.scoring.gap_open, self.scoring.gap_extend,
             MIN_SCORE, MIN_SCORE, MIN_SCORE, MIN_SCORE],
            dtype=np.int32,
        )
        mlens = np.asarray(mlens, np.int32)
        nlens = np.asarray(nlens, np.int32)
        out = self._dispatch(
            xb, yb, mlens, nlens, pen, with_traceback=True, merged_runs=R
        )
        assert "packed_merged" in out, (
            "compact packed requires the column-RLE global engine"
        )
        return out["packed_merged"], mlens, nlens, (self, xb, yb, "global")

    def semiglobal_packed_compact_async_arrays(
        self, xb, yb, mlens, nlens, max_runs: int = 0
    ):
        """``global_packed_compact_async_arrays`` for semiglobal mode."""
        R = max_runs or self._COMPACT_RUNS
        pen = np.array(
            [self.scoring.gap_open, self.scoring.gap_extend,
             MIN_SCORE, MIN_SCORE, 0, 0],
            dtype=np.int32,
        )
        mlens = np.asarray(mlens, np.int32)
        nlens = np.asarray(nlens, np.int32)
        out = self._dispatch(
            xb, yb, mlens, nlens, pen, with_traceback=True, merged_runs=R
        )
        assert "packed_merged" in out, (
            "compact packed requires the column-RLE semiglobal engine"
        )
        return out["packed_merged"], mlens, nlens, (self, xb, yb, "semiglobal")

    @staticmethod
    def packed_compact_finish_many(handles) -> List["PackedMergedCigars"]:
        """Finish several compact handles with ONE device→host transfer:
        the (5+R, B) packed tensors are stacked on device and pulled as a
        single (H, 5+R, B) array — each separate ``np.asarray`` pull pays
        the full ~26 ms tunnel round trip, so an 8-deep pipeline saves
        ~7 round trips per sync (CLAUDE.md "EVERY dispatch+sync round
        trip...").  Overflow lanes retry per handle exactly like
        ``packed_compact_finish``."""
        if not handles:
            return []
        stacked = np.asarray(jnp.stack([h[0] for h in handles], axis=0))
        out = []
        for k, handle in enumerate(handles):
            _, mlens, nlens, ctx = handle
            out.append(
                BatchAligner._finish_compact_host(
                    stacked[k], mlens, nlens, ctx
                )
            )
        return out

    @staticmethod
    def packed_compact_finish(handle) -> "PackedMergedCigars":
        """Pull + unpack a compact handle (ONE device transfer).  If any
        lane overflowed the run budget, those lanes are re-run through
        the dense packed path (one extra bucketed dispatch; rare by
        construction on high-identity data) so ``cigars()`` is always
        complete and exact."""
        packed, mlens, nlens, ctx = handle
        return BatchAligner._finish_compact_host(
            np.asarray(packed), mlens, nlens, ctx
        )

    @staticmethod
    def _finish_compact_host(packed_np, mlens, nlens, ctx):
        """Host half of the compact finish (shared by the one-handle and
        stacked-pull entry points): unpack + dense re-run of overflow
        lanes."""
        ba, xb, yb, mode = ctx
        score_np, up = _unpack_rle_merged(packed_np)
        res = PackedMergedCigars(score_np, up, mlens, nlens)
        if up["ovf"].any():
            idx = np.nonzero(up["ovf"])[0]
            # pow2 bucket keeps retry shapes stable (CLAUDE.md: shape-
            # unstable batched calls recompile every time)
            nb = max(8, 1 << int(np.ceil(np.log2(len(idx)))))
            sel = np.resize(idx, nb)
            xb_r = np.asarray(xb)[sel]
            yb_r = np.asarray(yb)[sel]
            ml_r = np.asarray(mlens)[sel]
            nl_r = np.asarray(nlens)[sel]
            if mode == "global":
                dense = BatchAligner.global_packed_finish(
                    ba.global_packed_async_arrays(xb_r, yb_r, ml_r, nl_r)
                )
            else:
                dense = BatchAligner.semiglobal_packed_finish(
                    ba.semiglobal_packed_async_arrays(xb_r, yb_r, ml_r, nl_r)
                )
            res._ovf_idx = idx
            res._ovf_cigars = dense.cigars()[: len(idx)]
        return res

    def global_packed(self, xs, ys) -> "PackedSemiglobal":
        """Global batch WITHOUT materializing op lists (delivered-CIGAR
        hot path; see ``semiglobal_packed``)."""
        xb, yb, mlens, nlens = self._pad(xs, ys)
        return self.global_packed_finish(
            self.global_packed_async_arrays(xb, yb, mlens, nlens)
        )

    def custom(self, xs, ys) -> List[Alignment]:
        s = self.scoring
        return self._run(
            xs,
            ys,
            (s.xclip_prefix, s.xclip_suffix, s.yclip_prefix, s.yclip_suffix),
            AlignmentMode.Custom,
            False,
        )

    def global_(self, xs, ys) -> List[Alignment]:
        return self._run(
            xs,
            ys,
            (MIN_SCORE, MIN_SCORE, MIN_SCORE, MIN_SCORE),
            AlignmentMode.Global,
            False,
        )

    def semiglobal(self, xs, ys) -> List[Alignment]:
        return self._run(
            xs, ys, (MIN_SCORE, MIN_SCORE, 0, 0), AlignmentMode.Semiglobal, True
        )

    def local(self, xs, ys) -> List[Alignment]:
        return self._run(xs, ys, (0, 0, 0, 0), AlignmentMode.Local, True)

    def scores(self, xs, ys, mode: str = "global"):
        """Score-only fast path (no traceback materialization)."""
        clips = {
            "global": (MIN_SCORE, MIN_SCORE, MIN_SCORE, MIN_SCORE),
            "semiglobal": (MIN_SCORE, MIN_SCORE, 0, 0),
            "local": (0, 0, 0, 0),
            "custom": (
                self.scoring.xclip_prefix,
                self.scoring.xclip_suffix,
                self.scoring.yclip_prefix,
                self.scoring.yclip_suffix,
            ),
        }[mode]
        xb, yb, mlens, nlens = self._pad(xs, ys)
        B, M = xb.shape
        mp = self.scoring.match_fn
        if mode == "global" and isinstance(mp, MatchParams):
            # VMEM-resident Pallas score kernel (~3x the scan engines);
            # pad the batch to a lane-aligned multiple with empty lanes
            from rust_bio_tpu.ops.sw_pallas import sw_scores_global_matchparams

            pad = (-B) % 128
            if pad:
                xb = np.concatenate([xb, np.zeros((pad, M), np.uint8)])
                yb = np.concatenate(
                    [yb, np.zeros((pad, yb.shape[1]), np.uint8)]
                )
                mlens = np.concatenate([mlens, np.ones(pad, np.int32)])
                nlens = np.concatenate([nlens, np.ones(pad, np.int32)])
            out = sw_scores_global_matchparams(
                jnp.asarray(xb), jnp.asarray(yb),
                jnp.asarray(mlens), jnp.asarray(nlens),
                mp.match_score, mp.mismatch_score,
                self.scoring.gap_open, self.scoring.gap_extend,
                block_b=128,
            )
            return np.asarray(out)[:B]
        pen = np.array(
            [self.scoring.gap_open, self.scoring.gap_extend, *clips],
            dtype=np.int32,
        )
        out = self._dispatch(xb, yb, mlens, nlens, pen, with_traceback=False)
        return np.asarray(out["score"])
