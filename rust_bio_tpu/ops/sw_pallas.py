"""Pallas TPU kernel: batch-lockstep global (NW) affine-gap SW scoring.

The XLA ``lax.scan`` path (alignment/pairwise/batched.py) round-trips its
carried DP columns through HBM every step; this kernel keeps the S/I/D
columns resident in VMEM scratch across the whole column loop and streams
only the substitution columns in — the score state never leaves the chip.

Layout: DP rows live on **sublanes** and batch lanes on the **lane** axis
((M+1, BB) tiles, BB a multiple of 128), so the row-shift in the recurrence
and the (max,+) prefix scan are cheap sublane shifts instead of lane
permutes.

Grid: ``(B / BB, N)`` with the column index innermost; scratch persists
across sequential grid steps (the standard TPU accumulator pattern), so
program ``(b, j)`` advances block ``b`` by one DP column. The in-column
insertion recurrence ``I[i] = max(I[i-1]+ge, S~[i-1]+go)`` is evaluated as
a (max,+) prefix scan via log-step shifted maxima (requires the standard
affine regime ``gap_open <= gap_extend``, like the batched path).

Semantics: global mode of the reference aligner (pairwise/mod.rs:925-951)
— scores are bit-identical to ``BatchAligner.scores(..., "global")``
(property-tested). Variable per-lane lengths are handled by freeze masks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
NEG = np.int32(-(2**30))  # safe -inf (two adds stay in int32)


def _shift_down_rows(a, k):
    """Shift sublane rows (axis 0) down by k: out[i] = a[i-k]; NEG fill."""
    return jnp.concatenate(
        [jnp.full((k,) + a.shape[1:], NEG, a.dtype), a[:-k]], axis=0
    )


def _cummax_rows(u):
    """Running max along axis 0 via log-step shifted maxima."""
    m = u.shape[0]
    k = 1
    while k < m:
        u = jnp.maximum(u, _shift_down_rows(u, k))
        k *= 2
    return u


def _kernel(pen_ref, subs_ref, mlens_ref, nlens_ref, out_ref, S, I, D):
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    go = pen_ref[0]
    ge = pen_ref[1]

    Mp1, BB = S.shape
    rows = jax.lax.broadcasted_iota(I32, (Mp1, BB), 0)
    mlens = mlens_ref[:]  # (1, BB)
    nlens = nlens_ref[:]

    @pl.when(j == 0)
    def _init():
        # column 0 of the global DP: S[i] = go + ge*(i-1) (i >= 1), S[0] = 0
        col = jnp.where(rows == 0, 0, go + ge * (rows - 1))
        # rows beyond mlens are never read (masked reduction at the end)
        S[:] = col
        I[:] = jnp.where(rows == 0, NEG, col)
        D[:] = jnp.full((Mp1, BB), NEG, I32)

    jj = j + 1  # DP column index (1-based)
    active = jj <= nlens  # (1, BB) lanes still inside their y length

    S_prev = S[:]
    D_prev = D[:]

    subs_col = subs_ref[0]  # (M, BB)
    m_score = jnp.concatenate(
        [jnp.full((1, BB), NEG, I32), S_prev[:-1] + subs_col], axis=0
    )

    bestD = jnp.maximum(D_prev + ge, S_prev + go)

    # boundary i = 0 for this column: delete all jj characters
    S0j = go + ge * (jj - 1)
    s_tilde = jnp.maximum(m_score, bestD)
    s_tilde = jnp.where(rows == 0, S0j, s_tilde)

    # I via (max,+) prefix scan over rows
    T = jnp.concatenate(
        [jnp.full((1, BB), NEG, I32), s_tilde[:-1] + go], axis=0
    )
    U = T - rows * ge
    bestI = _cummax_rows(U) + rows * ge
    bestI = jnp.where(rows == 0, NEG, bestI)

    S_col = jnp.maximum(jnp.maximum(m_score, bestI), bestD)
    S_col = jnp.where(rows == 0, S0j, S_col)

    keep = active  # (1, BB) broadcasts over rows
    S[:] = jnp.where(keep, S_col, S_prev)
    D[:] = jnp.where(keep, bestD, D_prev)
    I[:] = jnp.where(keep, bestI, I[:])

    @pl.when(j == n_j - 1)
    def _finish():
        is_row_m = rows == mlens
        out_ref[:] = jnp.max(jnp.where(is_row_m, S[:], NEG), axis=0, keepdims=True)


@partial(jax.jit, static_argnames=("block_b",))
def sw_scores_global(subs, mlens, nlens, gap_open, gap_extend, block_b: int = 256):
    """Global alignment scores from a precomputed substitution tensor.

    ``subs``: (B, M, N) int32 substitution scores; ``mlens``/``nlens``: (B,)
    int32 true lengths; returns (B,) int32 scores. ``B`` must be a multiple
    of ``block_b`` (itself a multiple of 128).
    """
    B, M, N = subs.shape
    assert B % block_b == 0, f"B={B} not a multiple of block_b={block_b}"
    assert block_b % 128 == 0
    pen = jnp.stack([jnp.int32(gap_open), jnp.int32(gap_extend)])
    # column-major stream with batch on lanes: (N, M, B)
    subs_nmb = jnp.transpose(subs, (2, 1, 0))
    grid = (B // block_b, N)
    out = pl.pallas_call(
        _kernel,
        interpret=jax.default_backend() == "cpu",
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, M, block_b), lambda b, j: (j, 0, b)),
            pl.BlockSpec((1, block_b), lambda b, j: (0, b)),
            pl.BlockSpec((1, block_b), lambda b, j: (0, b)),
        ],
        out_specs=pl.BlockSpec((1, block_b), lambda b, j: (0, b)),
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((M + 1, block_b), jnp.int32),
            pltpu.VMEM((M + 1, block_b), jnp.int32),
            pltpu.VMEM((M + 1, block_b), jnp.int32),
        ],
    )(
        pen,
        subs_nmb,
        mlens.reshape(1, B),
        nlens.reshape(1, B),
    )
    return out[0]


def subs_tensor(xb, yb, lut):
    """(B, M, N) substitution scores via the rank-compacted one-hot einsum."""
    syms = jnp.unique(
        jnp.concatenate([xb.ravel(), yb.ravel()]), size=32, fill_value=0
    )
    small = lut[syms.astype(I32)[:, None], syms.astype(I32)[None, :]]
    ox = (xb[:, :, None] == syms[None, None, :]).astype(jnp.float32)
    oy = (yb[:, :, None] == syms[None, None, :]).astype(jnp.float32)
    return jnp.einsum(
        "bms,st,bnt->bmn", ox, small.astype(jnp.float32), oy,
        preferred_element_type=jnp.float32,
    ).astype(I32)


def _kernel_mp(pen_ref, xt_ref, yt_ref, mlens_ref, nlens_ref, out_ref):
    """MatchParams variant: substitution scores computed in-kernel from the
    raw symbol tiles (subs_col = a == b ? match : mismatch) and the whole
    column loop inside one program — both sequence tiles are VMEM-resident,
    so there is no per-column grid/DMA overhead at all."""
    go = pen_ref[0]
    ge = pen_ref[1]
    ma = pen_ref[2]
    mi = pen_ref[3]
    n_cols = pen_ref[4]

    M, BB = xt_ref.shape
    Mp1 = M + 1
    rows = jax.lax.broadcasted_iota(I32, (Mp1, BB), 0)
    mlens = mlens_ref[:]
    nlens = nlens_ref[:]
    xt = xt_ref[:]

    # column 0 of the global DP: S[i] = go + ge*(i-1) (i >= 1), S[0] = 0
    S0 = jnp.where(rows == 0, 0, go + ge * (rows - 1))
    D0 = jnp.full((Mp1, BB), NEG, I32)

    def body(j, carry):
        S_prev, D_prev = carry
        jj = j + 1
        active = jj <= nlens

        y_col = yt_ref[pl.ds(j, 1)]  # (1, BB)
        subs_col = jnp.where(xt == y_col, ma, mi)  # (M, BB)
        m_score = jnp.concatenate(
            [jnp.full((1, BB), NEG, I32), S_prev[:-1] + subs_col], axis=0
        )

        bestD = jnp.maximum(D_prev + ge, S_prev + go)

        S0j = go + ge * (jj - 1)
        s_tilde = jnp.maximum(m_score, bestD)
        s_tilde = jnp.where(rows == 0, S0j, s_tilde)

        T = jnp.concatenate(
            [jnp.full((1, BB), NEG, I32), s_tilde[:-1] + go], axis=0
        )
        U = T - rows * ge
        bestI = _cummax_rows(U) + rows * ge

        S_col = jnp.maximum(jnp.maximum(m_score, bestI), bestD)
        S_col = jnp.where(rows == 0, S0j, S_col)

        return (
            jnp.where(active, S_col, S_prev),
            jnp.where(active, bestD, D_prev),
        )

    S, _ = jax.lax.fori_loop(0, n_cols, body, (S0, D0))
    is_row_m = rows == mlens
    out_ref[:] = jnp.max(jnp.where(is_row_m, S, NEG), axis=0, keepdims=True)


@partial(jax.jit, static_argnames=("block_b",))
def sw_scores_global_matchparams(
    xb, yb, mlens, nlens, match_score, mismatch_score, gap_open, gap_extend,
    block_b: int = 256,
):
    """Global scores for constant match/mismatch scoring, fully in-kernel.

    ``xb`` (B, M) / ``yb`` (B, N) uint8; returns (B,) int32 scores identical
    to ``BatchAligner.scores(..., "global")`` with ``Scoring.from_scores``.
    """
    B, M = xb.shape
    N = yb.shape[1]
    assert B % block_b == 0 and block_b % 128 == 0
    pen = jnp.stack(
        [jnp.int32(gap_open), jnp.int32(gap_extend),
         jnp.int32(match_score), jnp.int32(mismatch_score), jnp.int32(N)]
    )
    xt = jnp.transpose(xb.astype(I32), (1, 0))  # (M, B)
    yt = jnp.transpose(yb.astype(I32), (1, 0))  # (N, B)
    grid = (B // block_b,)
    out = pl.pallas_call(
        _kernel_mp,
        interpret=jax.default_backend() == "cpu",
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((M, block_b), lambda b: (0, b)),
            pl.BlockSpec((N, block_b), lambda b: (0, b)),
            pl.BlockSpec((1, block_b), lambda b: (0, b)),
            pl.BlockSpec((1, block_b), lambda b: (0, b)),
        ],
        out_specs=pl.BlockSpec((1, block_b), lambda b: (0, b)),
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.int32),
    )(
        pen,
        xt,
        yt,
        mlens.reshape(1, B),
        nlens.reshape(1, B),
    )
    return out[0]


# ---------------------------------------------------------------------------
# Full column-scan engine with traceback (general clip semantics)
# ---------------------------------------------------------------------------
#
# Drop-in replacement for ``batched._scan_columns_xla`` when scoring is
# constant match/mismatch: the 7-array DP state stays in VMEM scratch across
# the whole column loop; each grid step writes one packed uint16 traceback
# column to HBM. Per-column Lx values ride in the (otherwise unused) high
# nibbles of traceback lanes 0..2, avoiding an awkwardly-shaped extra output.
# The column recurrence is ``batched._column_body`` itself — the exact code
# the XLA engine runs — so the two engines are bit-identical by construction.


def _kernel_scan_full_mp(
    pen_ref,
    eq_ref,
    mlens_ref,
    nlens_ref,
    s0_ref,
    d0_ref,
    sb0_ref,
    sn0_ref,
    ly0_ref,
    tb0_ref,
    tb_out,
    sf_out,
    if_out,
    snf_out,
    lyf_out,
    tbf_out,
    S,
    D,
    SB,
    I,
    SN,
    LY,
    TBK,
):
    from rust_bio_tpu.alignment.pairwise.batched import _column_body

    j0 = pl.program_id(1)
    pens = tuple(pen_ref[k] for k in range(6))
    go, ge, xcp, xcs, ycp, ycs = pens
    ma = pen_ref[6]
    mi = pen_ref[7]

    BB, Mp1 = S.shape
    M = Mp1 - 1
    rows = jax.lax.broadcasted_iota(I32, (BB, Mp1), 1)
    row_ge1 = rows >= 1
    mlens_c = mlens_ref[:, 0:1]  # (BB, 1)
    nlens_c = nlens_ref[:, 0:1]
    is_row_m = (rows == mlens_c) & (mlens_c >= 1)
    yclip_row = ycp + go + ge * (rows - 1)

    @pl.when(j0 == 0)
    def _load_init():
        S[:] = s0_ref[:]
        D[:] = d0_ref[:]
        SB[:] = sb0_ref[:]
        I[:] = jnp.full((BB, Mp1), np.int32(-858_993_459), I32)
        SN[:] = sn0_ref[:]
        LY[:] = ly0_ref[:]
        TBK[:] = tb0_ref[:]

    j = (j0 + 1).astype(I32)
    eq_i = eq_ref[:].astype(I32)  # (BB, M) 0/1
    eq_col = eq_i > 0
    # arithmetic select: where(mask, dyn_scalar, dyn_scalar) trips a Mosaic
    # relayout bug (mask forced to a replicated layout), so blend instead
    subs_col = mi + (ma - mi) * eq_i

    (
        S_col, bestD, s_bits, bestI, Sn_new, Ly_new, tb_col, Lx_j, active
    ) = _column_body(
        S[:], D[:], SB[:], I[:], SN[:], LY[:],
        j, subs_col, eq_col,
        BB, M, rows, row_ge1, mlens_c, nlens_c, mlens_c, is_row_m,
        yclip_row, pens,
    )

    keep = active  # (BB, 1)
    S[:] = jnp.where(keep, S_col, S[:])
    D[:] = jnp.where(keep, bestD, D[:])
    SB[:] = jnp.where(keep, s_bits, SB[:])
    I[:] = jnp.where(keep, bestI, I[:])
    SN[:] = Sn_new
    LY[:] = Ly_new
    TBK[:] = jnp.where(keep, tb_col.astype(I32), TBK[:])

    # pack Lx_j (12 bits) into the unused high nibbles of lanes 0..2
    lx = Lx_j.astype(I32)  # (BB, 1)
    nib = (
        jnp.where(rows == 0, (lx & 0xF) << 12, 0)
        | jnp.where(rows == 1, ((lx >> 4) & 0xF) << 12, 0)
        | jnp.where(rows == 2, ((lx >> 8) & 0xF) << 12, 0)
    )
    tb_out[:] = tb_col | nib.astype(jnp.uint16)

    sf_out[:] = S[:]
    if_out[:] = I[:]
    snf_out[:] = SN[:]
    lyf_out[:] = LY[:]
    tbf_out[:] = TBK[:]


def scan_columns_pallas_mp(
    eq_nbm,  # (N, B, M) uint8: eq[j, b, i] = (x[b,i] == y[b,j])
    S0, D0, s_bits0, Sn0, Ly0, tb_col0,
    mlens, nlens, pens8,
    block_b: int = 0,
):
    """Pallas column-scan; returns the same tuple as _scan_columns_xla."""
    N, B, M = eq_nbm.shape
    if block_b == 0:  # largest power-of-two block that divides B
        for cand in (256, 128, 64, 32, 16, 8):
            if B % cand == 0:
                block_b = cand
                break
    assert block_b and B % block_b == 0 and block_b % 8 == 0
    assert M >= 2 and M < 4096, "Lx nibble packing needs 2 <= M < 4096"
    Mp1 = M + 1
    nb = B // block_b
    grid = (nb, N)
    # flatten the (column, batch-block) structure into plain 2D row blocks
    # (Mosaic relayouts of singleton-leading-dim blocks are buggy)
    eq2 = eq_nbm.reshape(N * B, M)
    lens_pad = jnp.concatenate(
        [mlens.reshape(B, 1), nlens.reshape(B, 1)], axis=1
    )
    lens8 = jnp.pad(lens_pad, ((0, 0), (0, 6)))  # (B, 8): lanes 0=m, 1=n
    bspec = lambda: pl.BlockSpec((block_b, Mp1), lambda b, j: (b, 0))
    out = pl.pallas_call(
        _kernel_scan_full_mp,
        interpret=jax.default_backend() == "cpu",
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_b, M), lambda b, j, nb=nb: (j * nb + b, 0)),
            pl.BlockSpec((block_b, 8), lambda b, j: (b, 0)),
            pl.BlockSpec((block_b, 8), lambda b, j: (b, 0)),
            bspec(),
            bspec(),
            bspec(),
            bspec(),
            bspec(),
            bspec(),
        ],
        out_specs=[
            pl.BlockSpec((block_b, Mp1), lambda b, j, nb=nb: (j * nb + b, 0)),
            bspec(),
            bspec(),
            bspec(),
            bspec(),
            bspec(),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N * B, Mp1), jnp.uint16),
            jax.ShapeDtypeStruct((B, Mp1), jnp.int32),
            jax.ShapeDtypeStruct((B, Mp1), jnp.int32),
            jax.ShapeDtypeStruct((B, Mp1), jnp.int32),
            jax.ShapeDtypeStruct((B, Mp1), jnp.int32),
            jax.ShapeDtypeStruct((B, Mp1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_b, Mp1), jnp.int32) for _ in range(7)
        ],
    )(
        jnp.asarray(pens8, jnp.int32),
        eq2,
        lens8,
        lens8[:, 1:2] * jnp.ones((1, 8), jnp.int32),  # nlens in lane 0
        S0,
        D0,
        s_bits0,
        Sn0,
        Ly0,
        tb_col0.astype(jnp.int32),
    )
    tb_cols2, S_f, I_f, Sn_f, Ly_f, tbf = out
    tb_cols = tb_cols2.reshape(N, B, Mp1)
    tb_f = tbf.astype(jnp.uint16)
    tbc = tb_cols.astype(jnp.int32)
    Lx_cols = (
        ((tbc[:, :, 0] >> 12) & 0xF)
        | (((tbc[:, :, 1] >> 12) & 0xF) << 4)
        | (((tbc[:, :, 2] >> 12) & 0xF) << 8)
    )  # (N, B)
    return S_f, I_f, Sn_f, Ly_f, tb_f, tb_cols, Lx_cols
