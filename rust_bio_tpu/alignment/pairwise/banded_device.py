"""Batched banded alignment on device (banded.rs parity).

``BatchBandedAligner`` mirrors ``banded.Aligner``'s API: bands are
rasterized host-side per pair (kmer matches -> sdpkpp backbone -> Band,
the reference's own seeding), then the batch runs on the band-predicate
transposed Pallas kernel (``ops/sw_pallas.scan_banded_pallas_mp``), the
banded suffix fixups (banded.rs:677-766 twin, vectorized) and a lockstep
walk that replicates the banded traceback including the out-of-band
ending fixups (banded.rs:833-856).

Bit-identical to ``banded.Aligner`` (the host oracle, itself embedding the
reference's golden values) by property test; pairs whose band exceeds
MAX_CELLS return the host's empty MIN_SCORE alignment, and shapes the
kernel cannot hold fall back to the host DP per pair.
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from rust_bio_tpu.alignment.pairwise import banded as _banded
from rust_bio_tpu.alignment.pairwise.banded import MAX_CELLS, Band
from rust_bio_tpu.alignment.pairwise.batched import MIN
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
from rust_bio_tpu.alignment.pairwise.scoring import (
    MIN_SCORE,
    MatchParams,
    Scoring,
)
from rust_bio_tpu.alignment.types import Alignment, AlignmentMode
from rust_bio_tpu.utils.text import to_bytes

I32 = jnp.int32
_SENT = np.int32(-(2**31) + 1)


def _init_column_banded(B, M, rows, mlens, nlens, pens, st0, en0):
    """XLA twin of the kernel's banded j = 0 column (banded.py:396-439):
    returns (tb_col0 (B, Mp1) int32 packed bits, Lx0 (B,))."""
    go, ge, xcp, xcs, ycp, ycs = pens
    mlens_c = mlens[:, None]
    st0c = st0[:, None]
    en0c = en0[:, None]
    row_ge1 = rows >= 1
    in_b0 = row_ge1 & (rows >= st0c) & (rows < en0c)
    is_row_m = (rows == mlens_c) & (mlens_c >= 1)

    gap_i = go + ge * (rows - 1)
    clip_i = xcp + go
    ins_wins = gap_i > clip_i
    I0v = jnp.where(rows == 1, go, jnp.where(ins_wins, gap_i, clip_i))
    ib0 = jnp.where(
        rows == 1, TB_START, jnp.where(ins_wins, TB_INS, TB_XCLIP_PREFIX)
    )
    S0 = jnp.full(rows.shape, MIN, I32)
    sb0 = jnp.full(rows.shape, TB_START, I32)
    tkI = I0v > S0
    S0 = jnp.where(tkI, I0v, S0)
    sb0 = jnp.where(tkI, TB_INS, sb0)
    tkX = xcp > S0
    S0 = jnp.where(tkX, xcp, S0)
    sb0 = jnp.where(tkX, TB_XCLIP_PREFIX, sb0)
    vals = jnp.where(in_b0 & (rows <= mlens_c - 1), S0 + xcs, _SENT)
    A = jnp.max(vals, axis=1)
    updA = A > MIN
    first = jnp.argmax(vals == A[:, None], axis=1).astype(I32)
    Lx0 = jnp.where(updA, mlens - first, 0)
    m_in_b0 = (mlens >= st0) & (mlens < en0) & (mlens >= 1)
    take_m = lambda a: jnp.take_along_axis(a, mlens_c, axis=1)[:, 0]
    S_m = jnp.where(updA, A, MIN)
    sb_m = jnp.full((B,), TB_XCLIP_SUFFIX, I32)
    I0_m = take_m(jnp.where(in_b0, I0v, MIN))
    tkIm = I0_m > S_m
    sb_m = jnp.where(tkIm, TB_INS, sb_m)
    S_m = jnp.where(tkIm, I0_m, S_m)
    tkXm = xcp > S_m
    sb_m = jnp.where(tkXm, TB_XCLIP_PREFIX, sb_m)
    sb_m = jnp.where(
        m_in_b0, sb_m, jnp.where(updA, TB_XCLIP_SUFFIX, TB_START)
    )
    ib_m = jnp.where(m_in_b0, take_m(jnp.where(in_b0, ib0, TB_START)), TB_START)
    sb0 = jnp.where(in_b0, sb0, TB_START)
    ib0 = jnp.where(in_b0, ib0, TB_START)
    sb0 = jnp.where(is_row_m, sb_m[:, None], sb0)
    ib0 = jnp.where(is_row_m, ib_m[:, None], ib0)
    sb0 = jnp.where(rows == 0, TB_START, sb0)
    ib0 = jnp.where(rows == 0, TB_START, ib0)
    tb_col0 = ib0 | (sb0 << 8)
    return tb_col0, Lx0


def _banded_suffix_fixups(
    S_f, I_f, Sn_f, Ly_f, tbk, B, M, mlens, nlens, pens, st_n, en_n
):
    """Vectorized twin of banded.py's j = n fixups (banded.rs:677-766) plus
    the score/tb effects of the final row-0 / column-0 rewrite loops.

    Returns (score, tbfix_cells (B, Mp1) packed 12-bit, Ly_fixed, Lx_n,
    lx_n_set)."""
    go, ge, xcp, xcs, ycp, ycs = pens
    rows = lax.broadcasted_iota(I32, (B, M + 1), 1)
    mlens_c = mlens[:, None]
    is_row_m = (rows == mlens_c) & (mlens_c >= 1)
    take_m = lambda a: jnp.take_along_axis(a, mlens_c, axis=1)[:, 0]
    tbk = tbk.astype(I32)
    i_bits = tbk & 0xF
    d_bits = (tbk >> 4) & 0xF
    s_bits = (tbk >> 8) & 0xF

    # out-of-band mask (host's exact off-by-one: `i > ends[n]` unmasked)
    masked = (~is_row_m) & (
        (rows < st_n[:, None]) | (rows > en_n[:, None])
    )
    S0 = jnp.where(masked, MIN, S_f)

    # loop 1: per-row Sn merge, then xclip-suffix accumulation into S[m]
    y_take = Sn_f > S0
    S1 = jnp.where(y_take, Sn_f, S0)
    sb1 = jnp.where(y_take, TB_YCLIP_SUFFIX, s_bits)
    S_m_base = take_m(S0)
    vals = jnp.where(rows <= mlens_c - 1, S1 + xcs, _SENT)
    A = jnp.max(vals, axis=1)
    x_upd = A > S_m_base
    firstX = jnp.argmax(vals == A[:, None], axis=1).astype(I32)
    acc = jnp.where(x_upd, A, S_m_base)
    sb_m = jnp.where(x_upd, TB_XCLIP_SUFFIX, take_m(sb1))
    Lx_n = jnp.where(x_upd, mlens - firstX, 0)
    lx_n_set = x_upd
    Sn_m = take_m(Sn_f)
    y_take_m = Sn_m > acc
    acc = jnp.where(y_take_m, Sn_m, acc)
    sb_m = jnp.where(y_take_m, TB_YCLIP_SUFFIX, sb_m)
    S1 = jnp.where(is_row_m, acc[:, None], S1)
    sb1 = jnp.where(is_row_m, sb_m[:, None], sb1)

    # loop 2: late insertion sweep over [max(1, st_n), en_n)
    in_sweep = (rows >= jnp.maximum(1, st_n[:, None])) & (
        rows < en_n[:, None]
    )
    U = jnp.where(rows >= st_n[:, None] - 1, S1 - rows * go, _SENT)
    C = lax.cummax(U, axis=1)
    Csh = jnp.concatenate(
        [jnp.full((B, 1), _SENT, I32), C[:, :-1]], axis=1
    )
    s_score = Csh + rows * go
    upd2 = in_sweep & (s_score > S1) & (~is_row_m)
    S2 = jnp.where(upd2, s_score, S1)
    sb2 = jnp.where(upd2, TB_INS, sb1)
    i_take = in_sweep & (s_score > I_f) & (~is_row_m)
    sb2_prev = jnp.concatenate(
        [jnp.full((B, 1), TB_START, I32), sb2[:, :-1]], axis=1
    )
    I2 = jnp.where(i_take, s_score, I_f)
    ib2 = jnp.where(i_take, sb2_prev, i_bits)
    vals3 = jnp.where(upd2 & (rows <= mlens_c - 1), S2 + xcs, _SENT)
    A3 = jnp.max(vals3, axis=1)
    acc_m = take_m(S1)
    x_upd3 = A3 > acc_m
    first3 = jnp.argmax(vals3 == A3[:, None], axis=1).astype(I32)
    acc3 = jnp.where(x_upd3, A3, acc_m)
    sb_m3 = jnp.where(x_upd3, TB_XCLIP_SUFFIX, take_m(sb2))
    Lx_n = jnp.where(x_upd3, mlens - first3, Lx_n)
    lx_n_set = lx_n_set | x_upd3
    # row m's own sweep statements (only when m is inside the sweep)
    m_in_sweep = (mlens >= jnp.maximum(1, st_n)) & (mlens < en_n)
    sm_score = take_m(s_score)
    m_take = m_in_sweep & (sm_score > acc3)
    S_final_m = jnp.where(m_take, sm_score, acc3)
    sb_final_m = jnp.where(m_take, TB_INS, sb_m3)
    i_take_m = m_in_sweep & (sm_score > take_m(I_f))
    I2 = jnp.where(
        is_row_m & i_take_m[:, None], sm_score[:, None], I2
    )
    ib2 = jnp.where(
        is_row_m & i_take_m[:, None], take_m(sb2_prev)[:, None], ib2
    )
    S2 = jnp.where(is_row_m, S_final_m[:, None], S2)
    sb2 = jnp.where(is_row_m, sb_final_m[:, None], sb2)

    # final rewrite loops' score/tb effects (banded.py:595-620):
    # j-loop at j = n ...
    d_n = go + ge * (nlens - 1)
    best0 = jnp.maximum(d_n, ycp)
    sb_0n = jnp.where(d_n > ycp, TB_DEL, TB_YCLIP_PREFIX)
    y_best = ycs > best0
    best0 = jnp.where(y_best, ycs, best0)
    sb_0n = jnp.where(y_best, TB_YCLIP_SUFFIX, sb_0n)
    S_m_now = take_m(S2)
    bump1 = (xcs + best0 > S_m_now) & (nlens >= 1)
    S_m_now = jnp.where(bump1, xcs + best0, S_m_now)
    Lx_n = jnp.where(bump1, mlens, Lx_n)
    lx_n_set = lx_n_set | bump1
    sb_mn = jnp.where(bump1, TB_XCLIP_SUFFIX, take_m(sb2))
    # ... and i-loop at i = m
    c_m = go + ge * (mlens - 1)
    bestm = jnp.maximum(c_m, xcp)
    x_best = xcs > bestm
    bestm = jnp.where(x_best, xcs, bestm)
    bump2 = (ycs + bestm > S_m_now) & (mlens >= 1)
    S_m_now = jnp.where(bump2, ycs + bestm, S_m_now)
    Ly_m = jnp.where(bump2, nlens, take_m(Ly_f))
    sb_mn = jnp.where(bump2, TB_YCLIP_SUFFIX, sb_mn)

    sb2 = jnp.where(is_row_m, sb_mn[:, None], sb2)
    # row 0 of the fixed column = the rewritten (0, n) s-bits
    sb2 = sb2.at[:, 0].set(jnp.where(nlens >= 1, sb_0n, sb2[:, 0]))
    Ly_fixed = jnp.where(is_row_m, Ly_m[:, None], Ly_f)

    score = S_m_now
    tbfix_cells = (ib2 & 0xF) | ((d_bits & 0xF) << 4) | ((sb2 & 0xF) << 8)
    return score, tbfix_cells, Ly_fixed, Lx_n, lx_n_set


def _walk_banded(tb_xb, tbfix, Lx_full, mlens, nlens, B, M, N, pens):
    """Banded lockstep walk: the full-clip walk plus (a) the on-the-fly
    row-0 / column-0 s-bit rewrites (banded.py:595-620 write these into tb
    after the DP; here they are synthesized at read time) and (b) the
    out-of-band ending fixups (banded.rs:833-856) emitted as two extra
    RLE ops when the walk dies at TB_START away from the origin."""
    go, ge, xcp, xcs, ycp, ycs = pens
    Mp1 = M + 1
    T_steps = M + N + 8

    def cond(state):
        return (state[0] < T_steps) & ~jnp.all(state[10])

    def walk_step(state):
        (
            t, i, j, carried, use_s, phase, xstart, ystart, xend, yend,
            done, buf_c, buf_l,
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
        # row-0 / column-0 rewrites (s-bits only), non-final columns
        rw0 = jnp.where(go + ge * (j - 1) > ycp, TB_DEL, TB_YCLIP_PREFIX)
        sb = jnp.where((i == 0) & (j >= 1) & ~use_fix, rw0, sb)
        c_i = go + ge * (i - 1)
        rwc = jnp.where(c_i > xcp, TB_INS, TB_XCLIP_PREFIX)
        rwc = jnp.where(
            (i == mlens) & (xcs > jnp.maximum(c_i, xcp)),
            TB_XCLIP_SUFFIX,
            rwc,
        )
        sb = jnp.where((j == 0) & (i >= 1), rwc, sb)
        ly = cf >> 12
        lx = jnp.take_along_axis(Lx_full, j[:, None], axis=1)[:, 0]
        layer = jnp.where(use_s, sb, carried)

        hit_start = (layer == TB_START) & ~done
        do_x = hit_start & (phase == 0) & (i > 0)
        do_y = hit_start & (j > 0) & (
            (phase == 1) | ((phase == 0) & (i == 0))
        )
        finish = hit_start & ~do_x & ~do_y

        is_ins = (layer == TB_INS) & ~hit_start
        is_del = (layer == TB_DEL) & ~hit_start
        is_mm = ((layer == TB_MATCH) | (layer == TB_SUBST)) & ~hit_start
        is_xp = (layer == TB_XCLIP_PREFIX) & ~hit_start
        is_xs = (layer == TB_XCLIP_SUFFIX) & ~hit_start
        is_yp = (layer == TB_YCLIP_PREFIX) & ~hit_start
        is_ys = (layer == TB_YCLIP_SUFFIX) & ~hit_start

        # ending fixups: Ins*i / Xclip(i) then Del*j / Yclip(j)
        iw = go + ge * (i - 1) > xcp
        dw = go + ge * (j - 1) > ycp
        fix_code = jnp.where(
            do_x,
            jnp.where(iw, TB_INS, TB_XCLIP_PREFIX),
            jnp.where(dw, TB_DEL, TB_YCLIP_PREFIX),
        )
        fix_len = jnp.where(do_x, i, j)

        op_code = jnp.where(
            done, 0, jnp.where(do_x | do_y, fix_code, layer)
        ).astype(jnp.uint8)
        op_code = jnp.where(finish, 0, op_code)
        op_len = jnp.where(
            done | finish,
            0,
            jnp.where(
                do_x | do_y,
                fix_len,
                is_mm * 1 + is_xp * i + is_xs * lx + is_yp * j + is_ys * ly,
            ),
        ).astype(jnp.uint16)

        new_i = jnp.where(
            done, i,
            jnp.where(
                do_x, 0,
                i - (is_ins * 1 + is_mm * 1 + is_xs * lx + is_xp * i),
            ),
        )
        new_j = jnp.where(
            done, j,
            jnp.where(
                do_y, 0,
                j - (is_del * 1 + is_mm * 1 + is_ys * ly + is_yp * j),
            ),
        )
        xstart = jnp.where(is_xp & ~done, i, xstart)
        xstart = jnp.where(do_x, jnp.where(iw, 0, i), xstart)
        xend = jnp.where(is_xs & ~done, new_i, xend)
        ystart = jnp.where(is_yp & ~done, j, ystart)
        ystart = jnp.where(do_y, jnp.where(dw, 0, j), ystart)
        yend = jnp.where(is_ys & ~done, new_j, yend)

        new_done = done | finish | (do_y & ~do_x)
        new_phase = jnp.where(do_x, 1, phase)
        next_carried = jnp.where(is_ins, ib, db)
        next_use_s = ~(is_ins | is_del | do_x) | new_done
        next_carried = jnp.where(
            do_x | new_done, TB_START, next_carried
        )
        buf_c = lax.dynamic_update_slice_in_dim(
            buf_c, op_code[None], t, axis=0
        )
        buf_l = lax.dynamic_update_slice_in_dim(
            buf_l, op_len[None], t, axis=0
        )
        return (
            t + 1, new_i, new_j, next_carried, next_use_s, new_phase,
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
        jnp.zeros(B, I32),
        mlens,
        nlens,
        jnp.zeros(B, bool),
        jnp.zeros((T_steps, B), jnp.uint8),
        jnp.zeros((T_steps, B), jnp.uint16),
    )
    (
        _, fi, fj, _, _, _, xstart, ystart, xend, yend, done,
        op_codes, op_lens,
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


@partial(jax.jit, static_argnames=("with_traceback",))
def _align_batch_device_banded_mp(
    xb, yb, mlens, nlens, penalties8, starts, ends,
    with_traceback: bool = True,
):
    """Banded custom-mode batch on the band-predicate Pallas kernel."""
    from rust_bio_tpu.ops.sw_pallas import scan_banded_pallas_mp

    B, M = xb.shape
    N = yb.shape[1]
    pens = tuple(penalties8[k] for k in range(6))

    tb_cols, lx_cols, S_f, I_f, Sn_f, Ly_f, tbk = scan_banded_pallas_mp(
        xb, yb, mlens, nlens, penalties8, starts, ends
    )
    bidx = jnp.arange(B)
    st_n = starts[bidx, nlens]
    en_n = ends[bidx, nlens]
    score, tbfix_cells, Ly_fixed, Lx_n, lx_n_set = _banded_suffix_fixups(
        S_f, I_f, Sn_f, Ly_f, tbk, B, M, mlens, nlens, pens, st_n, en_n
    )
    if not with_traceback:
        return {"score": score}

    rows = lax.broadcasted_iota(I32, (B, M + 1), 1)
    tb_col0, Lx0 = _init_column_banded(
        B, M, rows, mlens, nlens, pens, starts[:, 0], ends[:, 0]
    )
    tb_xb = jnp.concatenate(
        [jnp.transpose(tb_col0, (1, 0)).astype(jnp.uint16)[None], tb_cols],
        axis=0,
    ).reshape(-1, B)
    tbfix = (tbfix_cells & 0xFFF) | (Ly_fixed << 12)
    Lx_full = jnp.concatenate(
        [Lx0[:, None], jnp.transpose(lx_cols, (1, 0))], axis=1
    )
    Lx_full = Lx_full.at[bidx, nlens].set(
        jnp.where(lx_n_set, Lx_n, Lx_full[bidx, nlens])
    )

    out = _walk_banded(
        tb_xb, tbfix, Lx_full, mlens, nlens, B, M, N, pens
    )
    # single-pull packing: through the dev tunnel every device->host
    # transfer pays ~26 ms, so the 7-leaf dict costs 7x the compute.
    # Codes are 4 bits, lens/coords already uint16-bounded (the walk
    # buffers are uint16 today), score rides as two uint16 rows.
    small = jnp.stack(
        [
            (score >> 16) & 0xFFFF,
            score & 0xFFFF,
            out["xstart"],
            out["ystart"],
            out["xend"],
            out["yend"],
        ]
    ).astype(jnp.uint16)
    packed = jnp.concatenate(
        [small, out["op_codes"].astype(jnp.uint16), out["op_lens"]],
        axis=0,
    )
    return {"packed_banded": packed}


def _decode_ops_batch(codes: np.ndarray, lens: np.ndarray):
    """Whole-batch twin of batched._decode_ops over (T, B) walk buffers:
    one flat object-LUT expansion + per-lane split instead of B per-lane
    numpy passes (~60 ms -> ~10 ms at B=1024).  Entry semantics are
    identical: codes are 0 after a lane finishes, clip entries stay
    single with parametrized length, and each lane's list is reversed
    (walk emits end -> start)."""
    from rust_bio_tpu.alignment.pairwise.batched import _OP_ARR
    from rust_bio_tpu.alignment.types import Xclip, Yclip

    c = codes.T.astype(np.intp)  # (B, T), row-major per lane
    ln = lens.T.astype(np.int64)
    valid = c != 0
    is_clip = (c >= TB_XCLIP_PREFIX) & valid
    reps = np.where(valid, np.where(is_clip, 1, np.maximum(ln, 1)), 0)
    flat_reps = reps.ravel()
    flat_c = c.ravel()
    expanded = _OP_ARR[np.repeat(flat_c, flat_reps)]
    offs = np.zeros(flat_reps.size + 1, np.int64)
    np.cumsum(flat_reps, out=offs[1:])
    flat_l = ln.ravel()
    for idx in np.nonzero(is_clip.ravel())[0]:
        code = int(flat_c[idx])
        expanded[offs[idx]] = (
            Xclip(int(flat_l[idx]))
            if code in (TB_XCLIP_PREFIX, TB_XCLIP_SUFFIX)
            else Yclip(int(flat_l[idx]))
        )
    lane_tot = reps.sum(axis=1)
    lane_offs = np.zeros(len(lane_tot) + 1, np.int64)
    np.cumsum(lane_tot, out=lane_offs[1:])
    flat_ops = expanded.tolist()
    out = []
    for b in range(c.shape[0]):
        ops = flat_ops[int(lane_offs[b]) : int(lane_offs[b + 1])]
        ops.reverse()
        out.append(ops)
    return out


def _unpack_banded(packed: np.ndarray):
    """Host inverse of the packed banded walk: (score i32 (B,), dict)."""
    small = packed[:6].astype(np.int64)
    v = (small[0] << 16) | small[1]
    score = np.where(v >= 2**31, v - 2**32, v).astype(np.int64)
    T = (packed.shape[0] - 6) // 2
    return score, {
        "xstart": small[2],
        "ystart": small[3],
        "xend": small[4],
        "yend": small[5],
        "op_codes": packed[6 : 6 + T],
        "op_lens": packed[6 + T :],
    }


class BatchBandedAligner:
    """Batched banded aligner (banded.rs API, device DP).

    Mirrors ``banded.Aligner``'s mode wrappers; band construction and
    result post-processing are the host aligner's own code, the DP runs
    batched on device.  Requires MatchParams scoring and gap_open <=
    gap_extend (like ``BatchAligner``); other scorings fall back to the
    host aligner per pair.
    """

    def __init__(self, scoring: Scoring, k: int, w: int) -> None:
        self.scoring = scoring
        self.k = k
        self.w = w

    # ---- mode wrappers ----

    def custom(self, xs: Sequence, ys: Sequence) -> List[Alignment]:
        return self._run(xs, ys, self.scoring, AlignmentMode.Custom, False)

    def global_(self, xs, ys) -> List[Alignment]:
        sc = self.scoring.with_clips(*((MIN_SCORE,) * 4))
        return self._run(xs, ys, sc, AlignmentMode.Global, False)

    def semiglobal(self, xs, ys) -> List[Alignment]:
        sc = self.scoring.with_clips(MIN_SCORE, MIN_SCORE, 0, 0)
        return self._run(xs, ys, sc, AlignmentMode.Semiglobal, True)

    def local(self, xs, ys) -> List[Alignment]:
        sc = self.scoring.with_clips(0, 0, 0, 0)
        return self._run(xs, ys, sc, AlignmentMode.Local, True)

    # ---- engine ----

    def _host_one(self, sc, x, y, mode, filter_clips):
        al = _banded.Aligner(sc, self.k, self.w)
        aln = al.custom(x, y)
        aln.mode = mode
        if filter_clips:
            aln.filter_clip_operations()
        return aln

    def _host_batch(self, xs, ys, sc, mode, filter_clips):
        """Host fallback for shapes the TPU kernels cannot hold: the
        threaded native pipeline (banded_dp.hpp, ~300x the per-pair
        CPython path at kb-scale queries) when scoring is MatchParams,
        else per-pair Python."""
        if isinstance(sc.match_fn, MatchParams):
            from rust_bio_tpu import native as _native
            from rust_bio_tpu.alignment.pairwise.batched import _OP_ARR
            from rust_bio_tpu.alignment.types import Xclip, Yclip

            B = len(xs)
            M = max((len(x) for x in xs), default=1) or 1
            N = max((len(y) for y in ys), default=1) or 1
            xb = np.zeros((B, M), np.uint8)
            yb = np.zeros((B, N), np.uint8)
            for i, (x, y) in enumerate(zip(xs, ys)):
                xb[i, : len(x)] = np.frombuffer(x, np.uint8)
                yb[i, : len(y)] = np.frombuffer(y, np.uint8)
            ml = np.array([len(x) for x in xs], np.int64)
            nl = np.array([len(y) for y in ys], np.int64)
            res = _native.banded_batch(
                xb, ml, yb, nl, self.k, self.w,
                (sc.xclip_prefix, sc.xclip_suffix,
                 sc.yclip_prefix, sc.yclip_suffix),
                sc.match_fn.match_score, sc.match_fn.mismatch_score,
                sc.gap_open, sc.gap_extend,
            )
            if res is not None:
                scores, coords, oc, ol, n_ops = res
                out = []
                for b in range(B):
                    no = int(n_ops[b])
                    if no == -1:  # band over MAX_CELLS (banded.rs:407)
                        aln = Alignment(
                            score=MIN_SCORE, ystart=0, xstart=0, yend=0,
                            xend=0, ylen=0, xlen=0, operations=[],
                            mode=AlignmentMode.Custom,
                        )
                        aln.mode = mode
                        out.append(aln)
                        continue
                    if no == -2:  # RLE overflow: per-pair Python path
                        out.append(
                            self._host_one(sc, xs[b], ys[b], mode,
                                           filter_clips)
                        )
                        continue
                    c = oc[b, :no].astype(np.intp)
                    ln = ol[b, :no].astype(np.int64)
                    is_clip = c >= TB_XCLIP_PREFIX
                    reps = np.where(is_clip, 1, ln)
                    ops = _OP_ARR[np.repeat(c, reps)].tolist()
                    if is_clip.any():
                        offs = np.concatenate([[0], np.cumsum(reps)])
                        for j in np.nonzero(is_clip)[0]:
                            code = int(c[j])
                            ops[int(offs[j])] = (
                                Xclip(int(ln[j]))
                                if code
                                in (TB_XCLIP_PREFIX, TB_XCLIP_SUFFIX)
                                else Yclip(int(ln[j]))
                            )
                    aln = Alignment(
                        score=int(scores[b]),
                        xstart=int(coords[b, 0]), ystart=int(coords[b, 1]),
                        xend=int(coords[b, 2]), yend=int(coords[b, 3]),
                        xlen=len(xs[b]), ylen=len(ys[b]),
                        operations=ops, mode=AlignmentMode.Custom,
                    )
                    aln.mode = mode
                    if filter_clips:
                        aln.filter_clip_operations()
                    out.append(aln)
                return out
        return [
            self._host_one(sc, x, y, mode, filter_clips)
            for x, y in zip(xs, ys)
        ]

    def semiglobal_async(self, xs, ys):
        """Dispatch a semiglobal batch WITHOUT syncing: the host band
        build + upload run now, the device DP is left in flight.  Pass
        the handle to ``semiglobal_finish`` to pull + decode — batch
        i+1's band build (CPU threads) then overlaps batch i's device
        compute + pull (the production pipeline shape)."""
        sc = self.scoring.with_clips(MIN_SCORE, MIN_SCORE, 0, 0)
        return self._run_async(xs, ys, sc, AlignmentMode.Semiglobal, True)

    def semiglobal_finish(self, handle) -> List[Alignment]:
        return self._run_finish(handle)

    def _run(self, xs, ys, sc, mode, filter_clips) -> List[Alignment]:
        return self._run_finish(
            self._run_async(xs, ys, sc, mode, filter_clips)
        )

    def _run_async(self, xs, ys, sc, mode, filter_clips):
        from rust_bio_tpu.ops.sw_pallas import transposed_feasible

        xs = [to_bytes(x) for x in xs]
        ys = [to_bytes(y) for y in ys]
        B = len(xs)
        assert len(ys) == B
        M = max((len(x) for x in xs), default=1) or 1
        N = max((len(y) for y in ys), default=1) or 1

        device_ok = (
            isinstance(sc.match_fn, MatchParams)
            and sc.gap_open <= sc.gap_extend
            and all(len(x) >= 1 for x in xs)
            and all(len(y) >= 1 for y in ys)
            and 2 <= M
        )
        if not device_ok:
            return ("done", self._host_batch(xs, ys, sc, mode, filter_clips))

        # host band rasterization (the reference's own seeding path).
        # One threaded native call builds all B bands (byte-identical to
        # Band.create, property-tested); per-pair Python+ctypes costs
        # ~1 ms/pair at 20 kb targets vs ~30 us/pair batched.
        clips = (
            int(sc.xclip_prefix), int(sc.xclip_suffix),
            int(sc.yclip_prefix), int(sc.yclip_suffix),
        )
        ml_h = np.array([len(x) for x in xs], np.int64)
        nl_h = np.array([len(y) for y in ys], np.int64)
        # padded (B, M)/(B, N) byte matrices; uniform lengths take one
        # C-level join+frombuffer instead of B row copies
        if (ml_h == M).all():
            xb_h = np.frombuffer(b"".join(xs), np.uint8).reshape(B, M)
        else:
            xb_h = np.zeros((B, M), np.uint8)
            for i, x in enumerate(xs):
                xb_h[i, : len(x)] = np.frombuffer(x, np.uint8)
        if (nl_h == N).all():
            yb_h = np.frombuffer(b"".join(ys), np.uint8).reshape(B, N)
        else:
            yb_h = np.zeros((B, N), np.uint8)
            for i, y in enumerate(ys):
                yb_h[i, : len(y)] = np.frombuffer(y, np.uint8)

        # --- column-window crop (the long-target regime) ---------------
        # With free y clips the band occupies a narrow column window of a
        # long target; the DP outside it is row-0-only and j-invariant, so
        # the batch runs on the cropped window + 1-2 empty tail columns
        # matching the global final column's two-buffer PARITY (the host
        # oracle's stale-carry fixups read buffer[n % 2]).  Yclip lengths
        # and y coordinates are patched back below; ops/scores stay
        # byte-identical to the uncropped run (property-tested).  The
        # native builder emits the windows directly (full-width band
        # arrays cost ~160 MB of writes per 1K x 20 kb batch).
        crop = int(sc.yclip_prefix) == 0 and int(sc.yclip_suffix) == 0
        # pre-feasibility: a semiglobal band window spans >= ~M/2 columns
        # (the backbone path covers all M rows), so if even that width
        # cannot fit the kernel's VMEM state, skip the band build and go
        # straight to the threaded native host pipeline (avoids building
        # every band twice for kb-scale queries)
        Nc_pre = max(8, (min(M, N) // 2) if crop else N)
        Bp_pre = len(xs) + (-len(xs) % 8)
        if not transposed_feasible(max(Bp_pre, 8), M, Nc_pre):
            return (
                "done",
                self._host_batch(xs, ys, sc, mode, filter_clips),
            )
        if crop:
            wcap = min(
                max(N, 8),
                max(1024, 1 << (M + 8 * (self.k + self.w) + 16).bit_length()),
            )
        else:
            wcap = max(N, 8)

        stw = enw = c0_all = nle_all = cells_all = None
        if isinstance(sc.match_fn, MatchParams):
            from rust_bio_tpu import native as _native

            res = _native.band_build_batch(
                xb_h, ml_h, yb_h, nl_h, self.k, self.w, clips,
                sc.match_fn.match_score, -sc.gap_open, -sc.gap_extend,
                crop, wcap,
            )
            if res is not None:
                stw, enw, c0_all, nle_all, cells_all, _jwin = res
        if stw is None:
            # library unavailable: per-pair Python band build, windowed
            # with the identical formula
            stw = np.empty((B, wcap + 1), np.int32)
            enw = np.empty((B, wcap + 1), np.int32)
            c0_all = np.zeros(B, np.int64)
            nle_all = np.empty(B, np.int64)
            cells_all = np.empty(B, np.int64)
            for i, (x, y) in enumerate(zip(xs, ys)):
                band = Band.create(x, y, self.k, self.w, sc)
                n_i, m_i = len(y), len(x)
                cells_all[i] = band.num_cells()
                nz = np.nonzero(band.ends > band.starts)[0]
                if crop and nz.size:
                    j0, j1 = int(nz[0]), int(nz[-1])
                    c0 = max(j0 - 1, 0)
                    tail = n_i - j1
                    e = 0 if tail == 0 else (1 if tail % 2 == 1 else 2)
                    nle = j1 - c0 + e
                else:
                    c0, nle = 0, n_i
                c0_all[i] = c0
                if nle > wcap:
                    nle_all[i] = -1
                    continue
                nle_all[i] = nle
                win_i = min(nle, n_i - c0) + 1
                stw[i, :win_i] = band.starts[c0 : c0 + win_i]
                stw[i, win_i:] = m_i + 1
                enw[i, :win_i] = band.ends[c0 : c0 + win_i]
                enw[i, win_i:] = 0

        out: List = [None] * B
        run_idx = []
        for i in range(B):
            if int(cells_all[i]) > MAX_CELLS:
                out[i] = Alignment(
                    score=MIN_SCORE, ystart=0, xstart=0, yend=0, xend=0,
                    ylen=0, xlen=0, operations=[], mode=AlignmentMode.Custom,
                )
                out[i].mode = mode
            elif int(nle_all[i]) < 0:
                # band window wider than wcap (rare huge gap chains):
                # per-pair host path
                out[i] = self._host_one(sc, xs[i], ys[i], mode, filter_clips)
            else:
                run_idx.append(i)
        if not run_idx:
            return ("done", out)

        nb = len(run_idx)
        pad = -nb % 8
        Bp = nb + pad

        ri = np.asarray(run_idx, np.int64)
        c0s = c0_all[ri]
        nl_effs = nle_all[ri]
        Nc = int(nl_effs.max())
        Nc = max(8, 1 << (Nc - 1).bit_length())  # stable compile buckets

        # VMEM feasibility is judged on the CROPPED width (the uncropped
        # target length is irrelevant to the kernel's state)
        if not transposed_feasible(max(Bp, 8), M, Nc):
            return (
                "done",
                self._host_batch(xs, ys, sc, mode, filter_clips),
            )

        # vectorized window gathers (a per-pair slice loop costs ~100 ms
        # at B=1024 x 20 kb; yb_h rows are zero-padded past each pair's
        # true length, so clipped gathers read only zeros)
        xb = np.zeros((Bp, M), np.uint8)
        yb = np.zeros((Bp, Nc), np.uint8)
        mlens = np.ones(Bp, np.int32)
        nlens = np.ones(Bp, np.int32)
        starts = np.full((Bp, Nc + 1), M + 1, np.int32)
        ends = np.zeros((Bp, Nc + 1), np.int32)
        xb[:nb] = xb_h[ri]
        yidx = np.minimum(c0s[:, None] + np.arange(Nc)[None, :], N - 1)
        ymask = np.arange(Nc)[None, :] < nl_effs[:, None]
        yb[:nb] = np.where(ymask, yb_h[ri[:, None], yidx], 0)
        mlens[:nb] = ml_h[ri]
        nlens[:nb] = nl_effs
        wc = min(Nc, wcap)
        starts[:nb, : wc + 1] = stw[ri, : wc + 1]
        ends[:nb, : wc + 1] = enw[ri, : wc + 1]
        # dummy pad lanes: full 1x1 band
        starts[nb:, :2] = 0
        ends[nb:, :2] = 2
        starts[nb:, 2:] = M + 1
        ends[nb:, 2:] = 0

        mp = sc.match_fn
        pen8 = np.array(
            [
                sc.gap_open, sc.gap_extend,
                sc.xclip_prefix, sc.xclip_suffix,
                sc.yclip_prefix, sc.yclip_suffix,
                mp.match_score, mp.mismatch_score,
            ],
            np.int32,
        )
        dev = _align_batch_device_banded_mp(
            jnp.asarray(xb), jnp.asarray(yb),
            jnp.asarray(mlens), jnp.asarray(nlens),
            jnp.asarray(pen8),
            jnp.asarray(starts), jnp.asarray(ends),
        )
        return (
            "dev", dev, out, run_idx, xs, ys, crop, c0s, nb,
            mode, filter_clips,
        )

    def _run_finish(self, handle) -> List[Alignment]:
        if handle[0] == "done":
            return handle[1]
        (
            _, dev, out, run_idx, xs, ys, crop, c0s, nb,
            mode, filter_clips,
        ) = handle
        scores, up = _unpack_banded(np.asarray(dev["packed_banded"]))
        codes = up["op_codes"]
        lens = up["op_lens"]
        xst = up["xstart"]
        yst = up["ystart"]
        xen = up["xend"]
        yen = up["yend"]
        from rust_bio_tpu.alignment.types import Yclip as _Yclip

        ops_all = _decode_ops_batch(codes[:, :nb], lens[:, :nb])
        for r, i in enumerate(run_idx):
            ops = ops_all[r]
            ystart, yend = int(yst[r]), int(yen[r])
            if crop:
                # shift the window back to global y coordinates
                c0, Ny = int(c0s[r]), len(ys[i])
                ystart += c0
                yend += c0
                if c0 > 0:
                    if ops and ops[0].kind == "Yclip":
                        ops[0] = _Yclip(ops[0].len + c0)
                    else:
                        ops.insert(0, _Yclip(c0))
                if ops and ops[-1].kind == "Yclip":
                    ops[-1] = _Yclip(Ny - yend)
                elif yend < Ny:
                    ops.append(_Yclip(Ny - yend))
            aln = Alignment(
                score=int(scores[r]),
                ystart=ystart, xstart=int(xst[r]),
                yend=yend, xend=int(xen[r]),
                ylen=len(ys[i]), xlen=len(xs[i]),
                operations=ops, mode=AlignmentMode.Custom,
            )
            aln.mode = mode
            if filter_clips:
                aln.filter_clip_operations()
            out[i] = aln
        return out
