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


def _runs_mode(runs):
    """Wrapper runs flag -> kernel RUNS mode string."""
    return "diag" if runs is True else ("ins" if runs == "ins" else "none")


def _ins_run_nib(i_bits, rows):
    """min(vertical TB_INS run ending at each row, 15) << 12.

    The sweep walks read this from the tb spare bits instead of recomputing
    the full run with an O(log X) shift chain per column per walk step;
    runs > 15 are finished by the walks' rare re-gather chain.  ``rows``
    is the (X, BB) row iota.  Row 0's i_bits is TB_START in every engine,
    so a non-INS row always exists above any run."""
    z = jnp.where(i_bits == TB_INS, NEG, rows)
    for k in (1, 2, 4, 8):
        if k < z.shape[0]:  # a >=m-row shift is all-NEG (tiny-M engines)
            z = jnp.maximum(z, _shift_down_rows(z, k))
    # z = nearest non-INS row within the last 16 rows (NEG if none)
    return jnp.where(
        i_bits == TB_INS, jnp.minimum(rows - z, 15), 0
    ) << 12


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


def subs_tensor(xb, yb, lut, n_syms: int = 32):
    """(B, M, N) substitution scores via the rank-compacted one-hot einsum.

    ``n_syms`` must be >= the distinct bytes present (fill -1 never
    matches a byte, so padded slots contribute nothing)."""
    syms = jnp.unique(
        jnp.concatenate([xb.ravel(), yb.ravel()]).astype(I32),
        size=n_syms,
        fill_value=-1,
    )
    small = lut[jnp.clip(syms, 0)[:, None], jnp.clip(syms, 0)[None, :]]
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
    eq_ref,  # (K, BB, M) uint8 chunk of equality columns
    mlens_ref,
    nlens_ref,
    s0_ref,
    d0_ref,
    sb0_ref,
    sn0_ref,
    ly0_ref,
    tb0_ref,
    tb_out,  # (K, BB, Mp1) uint16
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

    c = pl.program_id(1)
    pens = tuple(pen_ref[k] for k in range(6))
    go, ge, xcp, xcs, ycp, ycs = pens
    ma = pen_ref[6]
    mi = pen_ref[7]
    n_total = pen_ref[8]  # true column count N (chunks may overrun)

    K = eq_ref.shape[0]
    BB, Mp1 = S.shape
    M = Mp1 - 1
    rows = jax.lax.broadcasted_iota(I32, (BB, Mp1), 1)
    row_ge1 = rows >= 1
    mlens_c = mlens_ref[:, 0:1]  # (BB, 1)
    nlens_c = nlens_ref[:, 0:1]
    is_row_m = (rows == mlens_c) & (mlens_c >= 1)
    yclip_row = ycp + go + ge * (rows - 1)

    @pl.when(c == 0)
    def _load_init():
        S[:] = s0_ref[:]
        D[:] = d0_ref[:]
        SB[:] = sb0_ref[:]
        I[:] = jnp.full((BB, Mp1), np.int32(-858_993_459), I32)
        SN[:] = sn0_ref[:]
        LY[:] = ly0_ref[:]
        TBK[:] = tb0_ref[:]

    def column(k, st):
        S_p, D_p, SB_p, I_p, SN_p, LY_p, TBK_p = st
        j = (c * K + k + 1).astype(I32)  # 1-based DP column
        valid = j <= n_total  # scalar: padded chunk tail is a no-op

        eq_i = eq_ref[k].astype(I32)  # (BB, M) 0/1
        eq_col = eq_i > 0
        # arithmetic select: where(mask, dyn_scalar, dyn_scalar) trips a
        # Mosaic relayout bug (mask forced replicated), so blend instead
        subs_col = mi + (ma - mi) * eq_i

        (
            S_col, bestD, s_bits, bestI, Sn_new, Ly_new, tb_col, Lx_j, active
        ) = _column_body(
            S_p, D_p, SB_p, I_p, SN_p, LY_p,
            j, subs_col, eq_col,
            BB, M, rows, row_ge1, mlens_c, nlens_c, mlens_c, is_row_m,
            yclip_row, pens,
        )

        keep = active & valid  # (BB, 1)

        # pack Lx_j (12 bits) into the unused high nibbles of lanes 0..2
        lx = Lx_j.astype(I32)  # (BB, 1)
        nib = (
            jnp.where(rows == 0, (lx & 0xF) << 12, 0)
            | jnp.where(rows == 1, ((lx >> 4) & 0xF) << 12, 0)
            | jnp.where(rows == 2, ((lx >> 8) & 0xF) << 12, 0)
        )
        tb_out[k] = tb_col | nib.astype(jnp.uint16)

        return (
            jnp.where(keep, S_col, S_p),
            jnp.where(keep, bestD, D_p),
            jnp.where(keep, s_bits, SB_p),
            jnp.where(keep, bestI, I_p),
            jnp.where(valid, Sn_new, SN_p),
            jnp.where(valid, Ly_new, LY_p),
            jnp.where(keep, tb_col.astype(I32), TBK_p),
        )

    st = jax.lax.fori_loop(
        0, K, column, (S[:], D[:], SB[:], I[:], SN[:], LY[:], TBK[:])
    )
    S[:], D[:], SB[:], I[:], SN[:], LY[:], TBK[:] = st

    sf_out[:] = S[:]
    if_out[:] = I[:]
    snf_out[:] = SN[:]
    lyf_out[:] = LY[:]
    tbf_out[:] = TBK[:]


def _pick_block(B: int, M: int, N: int):
    """(block_b, K): largest batch block + column chunk that fit VMEM.

    Budget model (bytes, double-buffered in/out blocks): the eq chunk costs
    2*K*bb*M, the tb chunk 4*K*bb*(M+1); init/state blocks, scratch and loop
    temporaries are ~45 (bb, M+1) i32 arrays. Minimizing grid steps
    (B/bb)*ceil(N/K) under a conservative 12 MiB budget.
    """
    budget = 13 * 2**20  # 16 MiB scoped VMEM minus measured headroom
    lanes_m = -(-M // 128) * 128  # lane axis pads to the 128-lane tile
    lanes_mp1 = -(-(M + 1) // 128) * 128
    best = None
    for bb in (512, 256, 128, 64, 32, 16, 8):
        if B % bb:
            continue
        fixed = 180 * bb * lanes_mp1
        perk = 2 * bb * (lanes_m + 2 * lanes_mp1)  # eq u8 + tb u16, 2 buffers
        if budget - fixed < perk:
            continue
        K = min(N, (budget - fixed) // perk)
        steps = (B // bb) * -(-N // K)
        if best is None or steps < best[0] or (
            steps == best[0] and bb > best[1]
        ):
            best = (steps, bb, K)
    assert best is not None, f"no feasible block for B={B} M={M} N={N}"
    return best[1], best[2]


def scan_columns_pallas_mp(
    eq_nbm,  # (N, B, M) uint8: eq[j, b, i] = (x[b,i] == y[b,j])
    S0, D0, s_bits0, Sn0, Ly0, tb_col0,
    mlens, nlens, pens8,
    block_b: int = 0,
):
    """Pallas column-scan; returns the same tuple as _scan_columns_xla."""
    N, B, M = eq_nbm.shape
    if block_b == 0:
        block_b, K = _pick_block(B, M, N)
    else:
        _, K = _pick_block(B, M, N)
    assert block_b and B % block_b == 0 and block_b % 8 == 0
    assert M >= 2 and M < 4096, "Lx nibble packing needs 2 <= M < 4096"
    Mp1 = M + 1
    nb = B // block_b
    n_chunks = -(-N // K)
    Np = n_chunks * K
    grid = (nb, n_chunks)
    if Np != N:  # pad the column axis; padded columns are in-kernel no-ops
        eq_nbm = jnp.pad(eq_nbm, ((0, Np - N), (0, 0), (0, 0)))
    lens_pad = jnp.concatenate(
        [mlens.reshape(B, 1), nlens.reshape(B, 1)], axis=1
    )
    lens8 = jnp.pad(lens_pad, ((0, 0), (0, 6)))  # (B, 8): lanes 0=m, 1=n
    bspec = lambda: pl.BlockSpec((block_b, Mp1), lambda b, c: (b, 0))
    pen = jnp.concatenate(
        [jnp.asarray(pens8, jnp.int32).reshape(8), jnp.array([N], jnp.int32)]
    )
    out = pl.pallas_call(
        _kernel_scan_full_mp,
        interpret=jax.default_backend() == "cpu",
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((K, block_b, M), lambda b, c: (c, b, 0)),
            pl.BlockSpec((block_b, 8), lambda b, c: (b, 0)),
            pl.BlockSpec((block_b, 8), lambda b, c: (b, 0)),
            bspec(),
            bspec(),
            bspec(),
            bspec(),
            bspec(),
            bspec(),
        ],
        out_specs=[
            pl.BlockSpec((K, block_b, Mp1), lambda b, c: (c, b, 0)),
            bspec(),
            bspec(),
            bspec(),
            bspec(),
            bspec(),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, B, Mp1), jnp.uint16),
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
        pen,
        eq_nbm,
        lens8,
        lens8[:, 1:2] * jnp.ones((1, 8), jnp.int32),  # nlens in lane 0
        S0,
        D0,
        s_bits0,
        Sn0,
        Ly0,
        tb_col0.astype(jnp.int32),
    )
    tb_cols_p, S_f, I_f, Sn_f, Ly_f, tbf = out
    tb_cols = tb_cols_p[:N]
    tb_f = tbf.astype(jnp.uint16)
    tbc = tb_cols.astype(jnp.int32)
    Lx_cols = (
        ((tbc[:, :, 0] >> 12) & 0xF)
        | (((tbc[:, :, 1] >> 12) & 0xF) << 4)
        | (((tbc[:, :, 2] >> 12) & 0xF) << 8)
    )  # (N, B)
    return S_f, I_f, Sn_f, Ly_f, tb_f, tb_cols, Lx_cols


# ---------------------------------------------------------------------------
# Global-mode full-traceback engine, transposed layout (rows on sublanes)
# ---------------------------------------------------------------------------
#
# Specialization of the general scan for global alignments (all four clip
# penalties = MIN_SCORE, reference pairwise/mod.rs:925-951): every clip
# candidate, the Sn/Ly suffix tracking, and the row-m replacement are
# provably dead, and the DP runs in (M+1, BB) layout — DP rows on sublanes,
# batch on lanes — so the row-shift in the match recurrence and the (max,+)
# prefix scan for I are cheap sublane shifts instead of cross-lane permutes
# (2-3x faster than the general lane-major kernel). Bit-exact with the
# general engines (tie-break priority Match/Subst > Ins > Del, d/i-bits
# pointing at the source layer's bits), property-tested against them.

TB_START = 0
TB_INS = 1
TB_DEL = 2
TB_SUBST = 3
TB_MATCH = 4
MIN_I32 = np.int32(-858_993_459)  # reference MIN_SCORE


def _kernel_scan_global_mp(
    pen_ref,
    xt_ref,  # (M, BB) int32 symbols
    yt_ref,  # (Np, BB) int32 symbols
    mlens_ref,  # (1, BB)
    nlens_ref,  # (1, BB)
    tb_out,  # (K, Mp1, BB) uint16
    score_out,  # (1, BB) int32
    tbk_out,  # (Mp1, BB) int32: frozen final (j = nlens) column cells
    *scratch,
    RUNS: bool = True,
):
    # RUNS: compute the same-op diagonal run-length nibble (bits 12-15),
    # used only by the per-step-gather walk; the column-sweep walk reads
    # bits 0-11, so its scan skips the run chain (fewer ops, one less
    # (Mp1, BB) scratch array -> larger column chunks)
    if RUNS == "diag":
        S, D, SB, TBK, R = scratch
    else:
        S, D, SB, TBK = scratch
        R = None
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    go = pen_ref[0]
    ge = pen_ref[1]
    ma = pen_ref[2]
    mi = pen_ref[3]
    n_total = pen_ref[4]

    K = tb_out.shape[0]
    Mp1, BB = S.shape
    rows = jax.lax.broadcasted_iota(I32, (Mp1, BB), 0)
    row0 = rows == 0
    mlens = mlens_ref[:]  # (1, BB)
    nlens = nlens_ref[:]
    xt = xt_ref[:]  # (M, BB)
    rge = rows * ge  # hoisted loop invariant

    @pl.when(c == 0)
    def _init():
        # init column j = 0 (reference custom() :597-672, clips disabled):
        # S[i] = go + ge*(i-1), s_bits = Ins (i >= 1); i_bits Start at i=1
        S[:] = jnp.where(row0, 0, go + ge * (rows - 1))
        D[:] = jnp.full((Mp1, BB), MIN_I32, I32)
        sb0 = jnp.where(row0, TB_START, TB_INS)
        SB[:] = sb0
        ib0 = jnp.where(rows == 1, TB_START, jnp.where(row0, TB_START, TB_INS))
        TBK[:] = ib0 | (TB_START << 4) | (sb0 << 8)
        if RUNS == "diag":
            R[:] = jnp.zeros((Mp1, BB), I32)

    def column(k, st):
        if RUNS == "diag":
            S_p, D_p, SB_p, TBK_p, R_p = st
        else:
            S_p, D_p, SB_p, TBK_p = st
        j = (c * K + k + 1).astype(I32)
        valid = j <= n_total

        y_col = yt_ref[c * K + k]  # (BB,) -> broadcast row
        eq = (xt == y_col[None, :]).astype(I32)  # (M, BB) 0/1
        subs = mi + (ma - mi) * eq

        neg_row = jnp.full((1, BB), MIN_I32, I32)
        m_val = jnp.concatenate([neg_row, S_p[:-1] + subs], axis=0)
        # TB_MATCH = TB_SUBST + 1: bits are 3 + eq (cheaper than select)
        m_bits = jnp.concatenate(
            [jnp.full((1, BB), TB_START, I32), TB_SUBST + eq],
            axis=0,
        )

        d_ext = D_p + ge
        d_open = S_p + go
        d_wins = d_ext > d_open
        bestD = jnp.where(d_wins, d_ext, d_open)
        d_bits = jnp.where(d_wins, TB_DEL, SB_p)
        # row 0: delete all j characters (d_bits Start at j = 1)
        Dj0 = go + ge * (j - 1)
        bestD = jnp.where(row0, Dj0, bestD)
        d_bits = jnp.where(
            row0, jnp.where(j == 1, TB_START, TB_DEL), d_bits
        )

        s_tilde = jnp.maximum(m_val, bestD)
        s_tilde = jnp.where(row0, Dj0, s_tilde)

        # I via (max,+) prefix scan; T doubles as the open candidate i_open
        T = jnp.concatenate([neg_row, s_tilde[:-1] + go], axis=0)
        U = T - rge
        bestI = _cummax_rows(U) + rge
        i_ext = jnp.concatenate([neg_row, bestI[:-1] + ge], axis=0)

        # S selection, reference priority: Match/Subst > Ins > Del
        S_col = m_val
        s_bits = m_bits
        takeI = bestI > S_col
        S_col = jnp.where(takeI, bestI, S_col)
        s_bits = jnp.where(takeI, TB_INS, s_bits)
        takeD = bestD > S_col
        S_col = jnp.where(takeD, bestD, S_col)
        s_bits = jnp.where(takeD, TB_DEL, s_bits)
        S_col = jnp.where(row0, Dj0, S_col)
        s_bits = jnp.where(row0, TB_DEL, s_bits)

        # i_bits: extend beats open only strictly; open points at the
        # current column's cell above (its s_bits)
        prev_sbits = jnp.concatenate(
            [jnp.full((1, BB), TB_START, I32), s_bits[:-1]], axis=0
        )
        i_bits = jnp.where(i_ext > T, TB_INS, prev_sbits)
        i_bits = jnp.where(row0, TB_START, i_bits)

        # same-op diagonal run length (walk jumps min(run, 15) cells per
        # gather): run(i,j) = 1 + run(i-1,j-1) while s_bits stays equal
        if RUNS == "diag":
            is_mm = (s_bits == TB_SUBST) | (s_bits == TB_MATCH)
            same = s_bits == jnp.concatenate(
                [jnp.full((1, BB), -1, I32), SB_p[:-1]], axis=0
            )
            r_diag = jnp.concatenate(
                [jnp.zeros((1, BB), I32), R_p[:-1]], axis=0
            )
            run = jnp.where(is_mm, 1 + jnp.where(same, r_diag, 0), 0)
            run_nib = jnp.minimum(run, 15)
            tb_col = (
                i_bits | (d_bits << 4) | (s_bits << 8) | (run_nib << 12)
            ).astype(jnp.uint16)
        elif RUNS == "ins":
            # sweep-walk tb: spare bits carry the vertical ins-run nibble
            tb_col = (
                i_bits | (d_bits << 4) | (s_bits << 8)
                | _ins_run_nib(i_bits, rows)
            ).astype(jnp.uint16)
        else:
            tb_col = (i_bits | (d_bits << 4) | (s_bits << 8)).astype(
                jnp.uint16
            )
        tb_out[k] = tb_col

        keep = valid & (j <= nlens)  # (1, BB) broadcasts over rows
        out = (
            jnp.where(keep, S_col, S_p),
            jnp.where(keep, bestD, D_p),
            jnp.where(keep, s_bits, SB_p),
            jnp.where(keep, tb_col.astype(I32), TBK_p),
        )
        if RUNS == "diag":
            out = out + (jnp.where(keep, run, R_p),)
        return out

    init = (S[:], D[:], SB[:], TBK[:]) + ((R[:],) if RUNS == "diag" else ())
    st = jax.lax.fori_loop(0, K, column, init)
    if RUNS == "diag":
        S[:], D[:], SB[:], TBK[:], R[:] = st
    else:
        S[:], D[:], SB[:], TBK[:] = st

    @pl.when(c == n_chunks - 1)
    def _finish():
        score_out[:] = jnp.max(
            jnp.where(rows == mlens, S[:], NEG), axis=0, keepdims=True
        )
        tbk_out[:] = TBK[:]


def _pick_block_global(
    B: int, M: int, N: int, n_state: int = 30, stream_bytes: int = 0
):
    """(block_b, K) for the transposed kernels (VMEM model).

    ``n_state``: rough count of live (Mp1, bb) i32 arrays (scratch + loop
    temporaries); the semiglobal kernel carries more state than global.
    ``stream_bytes``: per-element size of a per-column streamed input
    (0 for the in-kernel-eq kernels whose sequences are fixed blocks).

    Light-state kernels (n_state <= 26, i.e. the sweep-mode global scan)
    prefer 512 lanes: the column chain is partly LATENCY-bound, so fewer,
    wider column iterations win (measured 256 -> 512 at B=8192, M=N=150:
    global full-traceback 9.1 -> 7.9 ms) — heavier kernels at 512 lose
    the VMEM headroom and slow down instead."""
    budget = 13 * 2**20
    sub = -(-(M + 1) // 8) * 8  # sublane-padded Mp1
    best = None
    # Mosaic lane-dim legality: a (.., bb) block needs bb % 128 == 0 OR
    # bb == B (callers pad batches accordingly; interpret mode does not
    # check this, the real lowering does)
    cands = [bb for bb in (1024, 512, 256, 128) if B % bb == 0]
    if B <= 1024:
        cands.append(B)
    for bb in cands:
        if B % bb:
            continue
        lanes = -(-bb // 128) * 128
        fixed = n_state * sub * lanes * 4 + (M + N + 8) * lanes * 8
        # tb u16 + optional streamed input, each double-buffered
        perk = 2 * sub * lanes * (2 + stream_bytes)
        if budget - fixed < perk:
            continue
        K = min(N, (budget - fixed) // perk)
        if n_state <= 26 and bb == 512 and K >= 6:
            return bb, K
        steps = (B // bb) * -(-N // K)
        if best is None or steps < best[0] or (
            steps == best[0] and bb > best[1]
        ):
            best = (steps, bb, K)
    assert best is not None, f"no feasible block for B={B} M={M} N={N}"
    return best[1], best[2]


def transposed_feasible(B: int, M: int, N: int) -> bool:
    """Whether the transposed engines' VMEM state fits for this shape
    (the heaviest kernel's model); callers fall back to the lane-major
    engine / XLA scan when not."""
    try:
        _pick_block_global(B, M, N, n_state=55, stream_bytes=4)
        return True
    except AssertionError:
        return False


def scan_global_pallas_mp(xb, yb, mlens, nlens, pens8, runs=True):
    # runs: True = diagonal run nibble (buffer walk), "ins" = vertical
    # ins-run nibble (sweep walk), False = no nibble (score-only)
    """Global-mode scan: returns (score (B,), tb_cols (Np, Mp1, B) uint16
    with Np >= N (padded chunk tail is garbage but never walked), tbk
    (B, Mp1) int32 frozen final-column cells).

    ``runs=False`` skips the run-length nibble (bits 12-15 are 0) — valid
    when the traceback is walked by the column-sweep kernel, which only
    reads the 12 layer bits."""
    B, M = xb.shape
    N = yb.shape[1]
    block_b, K = _pick_block_global(B, M, N, n_state=30 if runs is True else 24)
    Mp1 = M + 1
    n_chunks = -(-N // K)
    Np = n_chunks * K
    grid = (B // block_b, n_chunks)
    xt = jnp.transpose(xb.astype(I32), (1, 0))  # (M, B)
    yt = jnp.transpose(yb.astype(I32), (1, 0))  # (N, B)
    if Np != N:
        yt = jnp.pad(yt, ((0, Np - N), (0, 0)))
    p8 = jnp.asarray(pens8, I32).reshape(8)
    pen = jnp.stack([p8[0], p8[1], p8[6], p8[7], jnp.int32(N)])
    out = pl.pallas_call(
        partial(_kernel_scan_global_mp, RUNS=_runs_mode(runs)),
        interpret=jax.default_backend() == "cpu",
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((M, block_b), lambda b, c: (0, b)),
            pl.BlockSpec((Np, block_b), lambda b, c: (0, b)),
            pl.BlockSpec((1, block_b), lambda b, c: (0, b)),
            pl.BlockSpec((1, block_b), lambda b, c: (0, b)),
        ],
        out_specs=[
            pl.BlockSpec((K, Mp1, block_b), lambda b, c: (c, 0, b)),
            pl.BlockSpec((1, block_b), lambda b, c: (0, b)),
            pl.BlockSpec((Mp1, block_b), lambda b, c: (0, b)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, Mp1, B), jnp.uint16),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((Mp1, B), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Mp1, block_b), jnp.int32)
            for _ in range(5 if runs is True else 4)
        ],
    )(
        pen,
        xt,
        yt,
        mlens.reshape(1, B),
        nlens.reshape(1, B),
    )
    tb_cols, score, tbk = out
    return score[0], tb_cols, jnp.transpose(tbk, (1, 0))


# ---------------------------------------------------------------------------
# Semiglobal-mode engine, transposed layout (x fully aligned, y clips free)
# ---------------------------------------------------------------------------
#
# Same transposed structure as the global kernel, with the y-clip machinery
# live: ycp/ycs are dynamic penalties (MIN_SCORE-safe), the Sn/Ly suffix
# accumulators are carried, and the final-column I state is frozen for the
# XLA-side suffix fixups (batched._suffix_fixups runs verbatim on the small
# transposed finals). x-clip penalties are MIN_SCORE by contract
# (reference semiglobal, pairwise/mod.rs:954-983), so every x-clip
# candidate is provably dead.

TB_YCLIP_PREFIX = 7
TB_YCLIP_SUFFIX = 8


def _kernel_scan_semiglobal_mp(
    pen_ref,
    xt_ref,  # (M, BB) int32 symbols
    yt_ref,  # (Np, BB) int32 symbols
    mlens_ref,  # (1, BB)
    nlens_ref,  # (1, BB)
    tb_out,  # (K, Mp1, BB) uint16
    sf_out,
    if_out,
    snf_out,
    lyf_out,
    tbk_out,
    *scratch,
    RUNS: bool = True,
):
    # RUNS: diagonal same-op run nibble for the buffer walk; RUNS=False
    # (the sweep-walk path) writes the vertical ins-run nibble instead and
    # drops the R carry
    if RUNS == "diag":
        S, D, SB, I, SN, LY, TBK, R = scratch
    else:
        S, D, SB, I, SN, LY, TBK = scratch
        R = None
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    go = pen_ref[0]
    ge = pen_ref[1]
    ma = pen_ref[2]
    mi = pen_ref[3]
    n_total = pen_ref[4]
    ycp = pen_ref[5]
    ycs = pen_ref[6]

    K = tb_out.shape[0]
    Mp1, BB = S.shape
    rows = jax.lax.broadcasted_iota(I32, (Mp1, BB), 0)
    row0 = rows == 0
    row_ge1 = rows >= 1
    mlens = mlens_ref[:]  # (1, BB)
    nlens = nlens_ref[:]
    in_x = row_ge1 & (rows <= mlens)
    xt = xt_ref[:]  # (M, BB)
    rge = rows * ge  # hoisted loop invariant
    yclip_row = ycp + go + ge * (rows - 1)

    @pl.when(c == 0)
    def _init():
        # init column j = 0 (reference custom() :597-672, x-clips disabled)
        S0 = jnp.where(row0, 0, go + ge * (rows - 1))
        S[:] = S0
        D[:] = jnp.full((Mp1, BB), MIN_I32, I32)
        I[:] = jnp.full((Mp1, BB), MIN_I32, I32)
        sb0 = jnp.where(row0, TB_START, TB_INS)
        SB[:] = sb0
        ib0 = jnp.where(rows <= 1, TB_START, TB_INS)
        TBK[:] = ib0 | (TB_START << 4) | (sb0 << 8)
        if RUNS == "diag":
            R[:] = jnp.zeros((Mp1, BB), I32)
        # Sn/Ly init: row0 = (ycs, nlens); rows 1..m accumulate S0 + ycs
        SN[:] = jnp.where(row0, ycs, jnp.where(in_x, S0 + ycs, MIN_I32))
        LY[:] = jnp.where(row0 | in_x, nlens, 0)

    def column(k, st):
        if RUNS == "diag":
            S_p, D_p, SB_p, I_p, SN_p, LY_p, TBK_p, R_p = st
        else:
            S_p, D_p, SB_p, I_p, SN_p, LY_p, TBK_p = st
            R_p = None
        j = (c * K + k + 1).astype(I32)
        valid = j <= n_total
        active = j <= nlens  # (1, BB)
        is_last = j == nlens

        y_col = yt_ref[c * K + k]
        eq = (xt == y_col[None, :]).astype(I32)  # (M, BB) 0/1
        subs = mi + (ma - mi) * eq

        neg_row = jnp.full((1, BB), MIN_I32, I32)
        m_val = jnp.concatenate([neg_row, S_p[:-1] + subs], axis=0)
        m_bits = jnp.concatenate(
            [jnp.full((1, BB), TB_START, I32), TB_SUBST + eq],
            axis=0,
        )

        d_ext = D_p + ge
        d_open = S_p + go
        d_wins = d_ext > d_open
        bestD = jnp.where(d_wins, d_ext, d_open)
        d_bits = jnp.where(d_wins, TB_DEL, SB_p)

        # row 0 boundary (reference :674-727): Del vs y-prefix-clip
        d_gap = go + ge * (j - 1)
        d_clip = ycp + go
        del_wins0 = d_gap > d_clip
        Dj0 = jnp.where(
            j == 1, go, jnp.where(del_wins0, d_gap, d_clip)
        )
        db0 = jnp.where(
            j == 1, TB_START,
            jnp.where(del_wins0, TB_DEL, TB_YCLIP_PREFIX),
        )
        d_gt = Dj0 > ycp
        S0j = jnp.where(d_gt, Dj0, ycp)
        sb0 = jnp.where(d_gt, TB_DEL, TB_YCLIP_PREFIX)
        # final column: best y-suffix accumulator may take over row 0
        sn0 = SN_p[0:1]  # (1, BB)
        take_sn = is_last & (sn0 > S0j)
        S0j = jnp.where(take_sn, sn0, S0j)
        sb0 = jnp.where(take_sn, TB_YCLIP_SUFFIX, sb0)
        upd_sn0 = (~take_sn) & (S0j + ycs > sn0) & active
        sn0_new = jnp.where(upd_sn0, S0j + ycs, sn0)
        ly0_new = jnp.where(upd_sn0, nlens - j, LY_p[0:1])

        bestD = jnp.where(row0, Dj0, bestD)
        d_bits = jnp.where(row0, db0, d_bits)

        s_tilde = jnp.maximum(jnp.maximum(m_val, bestD), yclip_row)
        s_tilde = jnp.where(row0, S0j, s_tilde)

        T = jnp.concatenate([neg_row, s_tilde[:-1] + go], axis=0)
        U = T - rge
        bestI = _cummax_rows(U) + rge
        i_ext = jnp.concatenate([neg_row, bestI[:-1] + ge], axis=0)

        # priority: Match/Subst > Ins > Del > Yclip-prefix
        S_col = m_val
        s_bits = m_bits
        takeI = bestI > S_col
        S_col = jnp.where(takeI, bestI, S_col)
        s_bits = jnp.where(takeI, TB_INS, s_bits)
        takeD = bestD > S_col
        S_col = jnp.where(takeD, bestD, S_col)
        s_bits = jnp.where(takeD, TB_DEL, s_bits)
        takeY = yclip_row > S_col
        S_col = jnp.where(takeY, yclip_row, S_col)
        s_bits = jnp.where(takeY, TB_YCLIP_PREFIX, s_bits)
        S_col = jnp.where(row0, S0j, S_col)
        s_bits = jnp.where(row0, sb0, s_bits)

        prev_sbits = jnp.concatenate(
            [jnp.full((1, BB), TB_START, I32), s_bits[:-1]], axis=0
        )
        i_bits = jnp.where(i_ext > T, TB_INS, prev_sbits)
        i_bits = jnp.where(row0, TB_START, i_bits)

        # y-suffix accumulators, rows 1..m (reference :745-771)
        upd_sn = (S_col + ycs > SN_p) & in_x & active
        Sn_new = jnp.where(upd_sn, S_col + ycs, SN_p)
        Ly_new = jnp.where(upd_sn, nlens - j, LY_p)
        Sn_new = jnp.where(row0, sn0_new, Sn_new)
        Ly_new = jnp.where(row0, ly0_new, Ly_new)

        if RUNS == "diag":
            is_mm = (s_bits == TB_SUBST) | (s_bits == TB_MATCH)
            same = s_bits == jnp.concatenate(
                [jnp.full((1, BB), -1, I32), SB_p[:-1]], axis=0
            )
            r_diag = jnp.concatenate(
                [jnp.zeros((1, BB), I32), R_p[:-1]], axis=0
            )
            run = jnp.where(is_mm, 1 + jnp.where(same, r_diag, 0), 0)
            nib12 = jnp.minimum(run, 15) << 12
        elif RUNS == "ins":
            # sweep-walk tb: spare bits carry the vertical ins-run nibble
            nib12 = _ins_run_nib(i_bits, rows)
        else:
            nib12 = 0

        tb_col = (
            i_bits | (d_bits << 4) | (s_bits << 8) | nib12
        ).astype(jnp.uint16)
        tb_out[k] = tb_col

        keep = valid & active
        return (
            jnp.where(keep, S_col, S_p),
            jnp.where(keep, bestD, D_p),
            jnp.where(keep, s_bits, SB_p),
            jnp.where(keep, bestI, I_p),
            jnp.where(valid, Sn_new, SN_p),
            jnp.where(valid, Ly_new, LY_p),
            jnp.where(keep, tb_col.astype(I32), TBK_p),
        ) + ((jnp.where(keep, run, R_p),) if RUNS == "diag" else ())

    init = (S[:], D[:], SB[:], I[:], SN[:], LY[:], TBK[:]) + (
        (R[:],) if RUNS == "diag" else ()
    )
    st = jax.lax.fori_loop(0, K, column, init)
    if RUNS == "diag":
        S[:], D[:], SB[:], I[:], SN[:], LY[:], TBK[:], R[:] = st
    else:
        S[:], D[:], SB[:], I[:], SN[:], LY[:], TBK[:] = st

    @pl.when(c == n_chunks - 1)
    def _finish():
        sf_out[:] = S[:]
        if_out[:] = I[:]
        snf_out[:] = SN[:]
        lyf_out[:] = LY[:]
        tbk_out[:] = TBK[:]


def scan_semiglobal_pallas_mp(xb, yb, mlens, nlens, pens8, runs=True):
    """Semiglobal-family scan (x-clips MIN by contract; y-clips dynamic).

    Returns (tb_cols (Np, Mp1, B) uint16, S_f, I_f, Sn_f, Ly_f, tbk) with
    the finals transposed to the lane-major (B, Mp1) layout the XLA-side
    suffix fixups expect.  ``runs=False`` (the sweep-walk path) swaps the
    diagonal run nibble for the vertical ins-run nibble."""
    B, M = xb.shape
    N = yb.shape[1]
    block_b, K = _pick_block_global(B, M, N, n_state=45 if runs is True else 44)
    Mp1 = M + 1
    n_chunks = -(-N // K)
    Np = n_chunks * K
    grid = (B // block_b, n_chunks)
    xt = jnp.transpose(xb.astype(I32), (1, 0))
    yt = jnp.transpose(yb.astype(I32), (1, 0))
    if Np != N:
        yt = jnp.pad(yt, ((0, Np - N), (0, 0)))
    p8 = jnp.asarray(pens8, I32).reshape(8)
    # pens8 = (go, ge, xcp, xcs, ycp, ycs, match, mismatch)
    pen = jnp.stack(
        [p8[0], p8[1], p8[6], p8[7], jnp.int32(N), p8[4], p8[5]]
    )
    fspec = lambda: pl.BlockSpec((Mp1, block_b), lambda b, c: (0, b))
    fshape = lambda: jax.ShapeDtypeStruct((Mp1, B), jnp.int32)
    out = pl.pallas_call(
        partial(_kernel_scan_semiglobal_mp, RUNS=_runs_mode(runs)),
        interpret=jax.default_backend() == "cpu",
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((M, block_b), lambda b, c: (0, b)),
            pl.BlockSpec((Np, block_b), lambda b, c: (0, b)),
            pl.BlockSpec((1, block_b), lambda b, c: (0, b)),
            pl.BlockSpec((1, block_b), lambda b, c: (0, b)),
        ],
        out_specs=[
            pl.BlockSpec((K, Mp1, block_b), lambda b, c: (c, 0, b)),
            fspec(), fspec(), fspec(), fspec(), fspec(),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, Mp1, B), jnp.uint16),
            fshape(), fshape(), fshape(), fshape(), fshape(),
        ],
        scratch_shapes=[
            pltpu.VMEM((Mp1, block_b), jnp.int32)
            for _ in range(8 if runs is True else 7)
        ],
    )(
        pen,
        xt,
        yt,
        mlens.reshape(1, B),
        nlens.reshape(1, B),
    )
    tb_cols, S_f, I_f, Sn_f, Ly_f, tbk = out
    tp = lambda a: jnp.transpose(a, (1, 0))
    return tb_cols, tp(S_f), tp(I_f), tp(Sn_f), tp(Ly_f), tp(tbk)


# ---------------------------------------------------------------------------
# Global-mode engine, streamed-substitution variant (arbitrary LUT scoring)
# ---------------------------------------------------------------------------
#
# Same transposed DP as ``_kernel_scan_global_mp`` but the substitution
# scores arrive as a streamed tensor instead of in-kernel equality — this
# serves BLOSUM/PAM and every other ``MatchFunc`` (the host computes the
# (B, M, N) subs tensor with the rank-compacted one-hot einsum on the MXU).
# Each streamed element packs ``subs * 2 | eq`` so the kernel recovers both
# the score (arithmetic shift) and the Match/Subst traceback bit.


def _kernel_scan_global_subs(
    pen_ref,
    subs_ref,  # (K, M, BB) int32: subs*2 | eq, columns c*K..c*K+K-1
    mlens_ref,
    nlens_ref,
    tb_out,  # (K, Mp1, BB) uint16
    score_out,
    tbk_out,
    *scratch,
    RUNS: bool = True,
):
    if RUNS == "diag":
        S, D, SB, TBK, R = scratch
    else:
        S, D, SB, TBK = scratch
        R = None
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    go = pen_ref[0]
    ge = pen_ref[1]
    n_total = pen_ref[4]

    K = tb_out.shape[0]
    Mp1, BB = S.shape
    rows = jax.lax.broadcasted_iota(I32, (Mp1, BB), 0)
    row0 = rows == 0
    mlens = mlens_ref[:]
    nlens = nlens_ref[:]
    rge = rows * ge

    @pl.when(c == 0)
    def _init():
        S[:] = jnp.where(row0, 0, go + ge * (rows - 1))
        D[:] = jnp.full((Mp1, BB), MIN_I32, I32)
        sb0 = jnp.where(row0, TB_START, TB_INS)
        SB[:] = sb0
        ib0 = jnp.where(rows <= 1, TB_START, TB_INS)
        TBK[:] = ib0 | (TB_START << 4) | (sb0 << 8)
        if RUNS == "diag":
            R[:] = jnp.zeros((Mp1, BB), I32)

    def column(k, st):
        if RUNS == "diag":
            S_p, D_p, SB_p, TBK_p, R_p = st
        else:
            S_p, D_p, SB_p, TBK_p = st
        j = (c * K + k + 1).astype(I32)
        valid = j <= n_total

        packed = subs_ref[k]  # (M, BB): subs*2 | eq
        eq = packed & 1
        subs = packed >> 1  # arithmetic shift restores negative scores

        neg_row = jnp.full((1, BB), MIN_I32, I32)
        m_val = jnp.concatenate([neg_row, S_p[:-1] + subs], axis=0)
        m_bits = jnp.concatenate(
            [jnp.full((1, BB), TB_START, I32), TB_SUBST + eq], axis=0
        )

        d_ext = D_p + ge
        d_open = S_p + go
        d_wins = d_ext > d_open
        bestD = jnp.where(d_wins, d_ext, d_open)
        d_bits = jnp.where(d_wins, TB_DEL, SB_p)
        Dj0 = go + ge * (j - 1)
        bestD = jnp.where(row0, Dj0, bestD)
        d_bits = jnp.where(
            row0, jnp.where(j == 1, TB_START, TB_DEL), d_bits
        )

        s_tilde = jnp.maximum(m_val, bestD)
        s_tilde = jnp.where(row0, Dj0, s_tilde)

        T = jnp.concatenate([neg_row, s_tilde[:-1] + go], axis=0)
        U = T - rge
        bestI = _cummax_rows(U) + rge
        i_ext = jnp.concatenate([neg_row, bestI[:-1] + ge], axis=0)

        S_col = m_val
        s_bits = m_bits
        takeI = bestI > S_col
        S_col = jnp.where(takeI, bestI, S_col)
        s_bits = jnp.where(takeI, TB_INS, s_bits)
        takeD = bestD > S_col
        S_col = jnp.where(takeD, bestD, S_col)
        s_bits = jnp.where(takeD, TB_DEL, s_bits)
        S_col = jnp.where(row0, Dj0, S_col)
        s_bits = jnp.where(row0, TB_DEL, s_bits)

        prev_sbits = jnp.concatenate(
            [jnp.full((1, BB), TB_START, I32), s_bits[:-1]], axis=0
        )
        i_bits = jnp.where(i_ext > T, TB_INS, prev_sbits)
        i_bits = jnp.where(row0, TB_START, i_bits)

        if RUNS == "diag":
            is_mm = (s_bits == TB_SUBST) | (s_bits == TB_MATCH)
            same = s_bits == jnp.concatenate(
                [jnp.full((1, BB), -1, I32), SB_p[:-1]], axis=0
            )
            r_diag = jnp.concatenate(
                [jnp.zeros((1, BB), I32), R_p[:-1]], axis=0
            )
            run = jnp.where(is_mm, 1 + jnp.where(same, r_diag, 0), 0)
            run_nib = jnp.minimum(run, 15)
            tb_col = (
                i_bits | (d_bits << 4) | (s_bits << 8) | (run_nib << 12)
            ).astype(jnp.uint16)
        elif RUNS == "ins":
            # sweep-walk tb: spare bits carry the vertical ins-run nibble
            tb_col = (
                i_bits | (d_bits << 4) | (s_bits << 8)
                | _ins_run_nib(i_bits, rows)
            ).astype(jnp.uint16)
        else:
            tb_col = (i_bits | (d_bits << 4) | (s_bits << 8)).astype(
                jnp.uint16
            )
        tb_out[k] = tb_col

        keep = valid & (j <= nlens)
        out = (
            jnp.where(keep, S_col, S_p),
            jnp.where(keep, bestD, D_p),
            jnp.where(keep, s_bits, SB_p),
            jnp.where(keep, tb_col.astype(I32), TBK_p),
        )
        if RUNS == "diag":
            out = out + (jnp.where(keep, run, R_p),)
        return out

    init = (S[:], D[:], SB[:], TBK[:]) + ((R[:],) if RUNS == "diag" else ())
    st = jax.lax.fori_loop(0, K, column, init)
    if RUNS == "diag":
        S[:], D[:], SB[:], TBK[:], R[:] = st
    else:
        S[:], D[:], SB[:], TBK[:] = st

    @pl.when(c == n_chunks - 1)
    def _finish():
        score_out[:] = jnp.max(
            jnp.where(rows == mlens, S[:], NEG), axis=0, keepdims=True
        )
        tbk_out[:] = TBK[:]


def scan_global_pallas_subs(subs2_nmb, mlens, nlens, pens6, runs=True):
    """Global-mode scan from a streamed packed-subs tensor.

    ``subs2_nmb``: (N, M, B) int32 = subs*2 | eq. Returns the same tuple
    as ``scan_global_pallas_mp``.  ``runs=False`` as in the MP kernel."""
    N, M, B = subs2_nmb.shape
    block_b, K = _pick_block_global(
        B, M, N, n_state=35 if runs is True else 29, stream_bytes=4
    )
    Mp1 = M + 1
    n_chunks = -(-N // K)
    Np = n_chunks * K
    grid = (B // block_b, n_chunks)
    if Np != N:
        subs2_nmb = jnp.pad(subs2_nmb, ((0, Np - N), (0, 0), (0, 0)))
    pen = jnp.concatenate(
        [jnp.asarray(pens6, I32).reshape(6)[:2],
         jnp.zeros(2, I32), jnp.array([N], I32)]
    )
    out = pl.pallas_call(
        partial(_kernel_scan_global_subs, RUNS=_runs_mode(runs)),
        interpret=jax.default_backend() == "cpu",
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((K, M, block_b), lambda b, c: (c, 0, b)),
            pl.BlockSpec((1, block_b), lambda b, c: (0, b)),
            pl.BlockSpec((1, block_b), lambda b, c: (0, b)),
        ],
        out_specs=[
            pl.BlockSpec((K, Mp1, block_b), lambda b, c: (c, 0, b)),
            pl.BlockSpec((1, block_b), lambda b, c: (0, b)),
            pl.BlockSpec((Mp1, block_b), lambda b, c: (0, b)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, Mp1, B), jnp.uint16),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((Mp1, B), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Mp1, block_b), jnp.int32)
            for _ in range(5 if runs is True else 4)
        ],
    )(
        pen,
        subs2_nmb,
        mlens.reshape(1, B),
        nlens.reshape(1, B),
    )
    tb_cols, score, tbk = out
    return score[0], tb_cols, jnp.transpose(tbk, (1, 0))


def _kernel_scan_semiglobal_subs(
    pen_ref,
    subs_ref,  # (K, M, BB) int32: subs*2 | eq
    mlens_ref,  # (1, BB)
    nlens_ref,  # (1, BB)
    tb_out,  # (K, Mp1, BB) uint16
    sf_out,
    if_out,
    snf_out,
    lyf_out,
    tbk_out,
    *scratch,
    RUNS: bool = True,
):
    # RUNS: diagonal same-op run nibble for the buffer walk; RUNS=False
    # (the sweep-walk path) writes the vertical ins-run nibble instead and
    # drops the R carry
    if RUNS == "diag":
        S, D, SB, I, SN, LY, TBK, R = scratch
    else:
        S, D, SB, I, SN, LY, TBK = scratch
        R = None
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    go = pen_ref[0]
    ge = pen_ref[1]
    ma = pen_ref[2]
    mi = pen_ref[3]
    n_total = pen_ref[4]
    ycp = pen_ref[5]
    ycs = pen_ref[6]

    K = tb_out.shape[0]
    Mp1, BB = S.shape
    rows = jax.lax.broadcasted_iota(I32, (Mp1, BB), 0)
    row0 = rows == 0
    row_ge1 = rows >= 1
    mlens = mlens_ref[:]  # (1, BB)
    nlens = nlens_ref[:]
    in_x = row_ge1 & (rows <= mlens)
    rge = rows * ge  # hoisted loop invariant
    yclip_row = ycp + go + ge * (rows - 1)

    @pl.when(c == 0)
    def _init():
        # init column j = 0 (reference custom() :597-672, x-clips disabled)
        S0 = jnp.where(row0, 0, go + ge * (rows - 1))
        S[:] = S0
        D[:] = jnp.full((Mp1, BB), MIN_I32, I32)
        I[:] = jnp.full((Mp1, BB), MIN_I32, I32)
        sb0 = jnp.where(row0, TB_START, TB_INS)
        SB[:] = sb0
        ib0 = jnp.where(rows <= 1, TB_START, TB_INS)
        TBK[:] = ib0 | (TB_START << 4) | (sb0 << 8)
        if RUNS == "diag":
            R[:] = jnp.zeros((Mp1, BB), I32)
        # Sn/Ly init: row0 = (ycs, nlens); rows 1..m accumulate S0 + ycs
        SN[:] = jnp.where(row0, ycs, jnp.where(in_x, S0 + ycs, MIN_I32))
        LY[:] = jnp.where(row0 | in_x, nlens, 0)

    def column(k, st):
        if RUNS == "diag":
            S_p, D_p, SB_p, I_p, SN_p, LY_p, TBK_p, R_p = st
        else:
            S_p, D_p, SB_p, I_p, SN_p, LY_p, TBK_p = st
            R_p = None
        j = (c * K + k + 1).astype(I32)
        valid = j <= n_total
        active = j <= nlens  # (1, BB)
        is_last = j == nlens

        packed = subs_ref[k]  # (M, BB): subs*2 | eq
        eq = packed & 1
        subs = packed >> 1

        neg_row = jnp.full((1, BB), MIN_I32, I32)
        m_val = jnp.concatenate([neg_row, S_p[:-1] + subs], axis=0)
        m_bits = jnp.concatenate(
            [jnp.full((1, BB), TB_START, I32), TB_SUBST + eq],
            axis=0,
        )

        d_ext = D_p + ge
        d_open = S_p + go
        d_wins = d_ext > d_open
        bestD = jnp.where(d_wins, d_ext, d_open)
        d_bits = jnp.where(d_wins, TB_DEL, SB_p)

        # row 0 boundary (reference :674-727): Del vs y-prefix-clip
        d_gap = go + ge * (j - 1)
        d_clip = ycp + go
        del_wins0 = d_gap > d_clip
        Dj0 = jnp.where(
            j == 1, go, jnp.where(del_wins0, d_gap, d_clip)
        )
        db0 = jnp.where(
            j == 1, TB_START,
            jnp.where(del_wins0, TB_DEL, TB_YCLIP_PREFIX),
        )
        d_gt = Dj0 > ycp
        S0j = jnp.where(d_gt, Dj0, ycp)
        sb0 = jnp.where(d_gt, TB_DEL, TB_YCLIP_PREFIX)
        # final column: best y-suffix accumulator may take over row 0
        sn0 = SN_p[0:1]  # (1, BB)
        take_sn = is_last & (sn0 > S0j)
        S0j = jnp.where(take_sn, sn0, S0j)
        sb0 = jnp.where(take_sn, TB_YCLIP_SUFFIX, sb0)
        upd_sn0 = (~take_sn) & (S0j + ycs > sn0) & active
        sn0_new = jnp.where(upd_sn0, S0j + ycs, sn0)
        ly0_new = jnp.where(upd_sn0, nlens - j, LY_p[0:1])

        bestD = jnp.where(row0, Dj0, bestD)
        d_bits = jnp.where(row0, db0, d_bits)

        s_tilde = jnp.maximum(jnp.maximum(m_val, bestD), yclip_row)
        s_tilde = jnp.where(row0, S0j, s_tilde)

        T = jnp.concatenate([neg_row, s_tilde[:-1] + go], axis=0)
        U = T - rge
        bestI = _cummax_rows(U) + rge
        i_ext = jnp.concatenate([neg_row, bestI[:-1] + ge], axis=0)

        # priority: Match/Subst > Ins > Del > Yclip-prefix
        S_col = m_val
        s_bits = m_bits
        takeI = bestI > S_col
        S_col = jnp.where(takeI, bestI, S_col)
        s_bits = jnp.where(takeI, TB_INS, s_bits)
        takeD = bestD > S_col
        S_col = jnp.where(takeD, bestD, S_col)
        s_bits = jnp.where(takeD, TB_DEL, s_bits)
        takeY = yclip_row > S_col
        S_col = jnp.where(takeY, yclip_row, S_col)
        s_bits = jnp.where(takeY, TB_YCLIP_PREFIX, s_bits)
        S_col = jnp.where(row0, S0j, S_col)
        s_bits = jnp.where(row0, sb0, s_bits)

        prev_sbits = jnp.concatenate(
            [jnp.full((1, BB), TB_START, I32), s_bits[:-1]], axis=0
        )
        i_bits = jnp.where(i_ext > T, TB_INS, prev_sbits)
        i_bits = jnp.where(row0, TB_START, i_bits)

        # y-suffix accumulators, rows 1..m (reference :745-771)
        upd_sn = (S_col + ycs > SN_p) & in_x & active
        Sn_new = jnp.where(upd_sn, S_col + ycs, SN_p)
        Ly_new = jnp.where(upd_sn, nlens - j, LY_p)
        Sn_new = jnp.where(row0, sn0_new, Sn_new)
        Ly_new = jnp.where(row0, ly0_new, Ly_new)

        if RUNS == "diag":
            is_mm = (s_bits == TB_SUBST) | (s_bits == TB_MATCH)
            same = s_bits == jnp.concatenate(
                [jnp.full((1, BB), -1, I32), SB_p[:-1]], axis=0
            )
            r_diag = jnp.concatenate(
                [jnp.zeros((1, BB), I32), R_p[:-1]], axis=0
            )
            run = jnp.where(is_mm, 1 + jnp.where(same, r_diag, 0), 0)
            nib12 = jnp.minimum(run, 15) << 12
        elif RUNS == "ins":
            # sweep-walk tb: spare bits carry the vertical ins-run nibble
            nib12 = _ins_run_nib(i_bits, rows)
        else:
            nib12 = 0

        tb_col = (
            i_bits | (d_bits << 4) | (s_bits << 8) | nib12
        ).astype(jnp.uint16)
        tb_out[k] = tb_col

        keep = valid & active
        return (
            jnp.where(keep, S_col, S_p),
            jnp.where(keep, bestD, D_p),
            jnp.where(keep, s_bits, SB_p),
            jnp.where(keep, bestI, I_p),
            jnp.where(valid, Sn_new, SN_p),
            jnp.where(valid, Ly_new, LY_p),
            jnp.where(keep, tb_col.astype(I32), TBK_p),
        ) + ((jnp.where(keep, run, R_p),) if RUNS == "diag" else ())

    init = (S[:], D[:], SB[:], I[:], SN[:], LY[:], TBK[:]) + (
        (R[:],) if RUNS == "diag" else ()
    )
    st = jax.lax.fori_loop(0, K, column, init)
    if RUNS == "diag":
        S[:], D[:], SB[:], I[:], SN[:], LY[:], TBK[:], R[:] = st
    else:
        S[:], D[:], SB[:], I[:], SN[:], LY[:], TBK[:] = st

    @pl.when(c == n_chunks - 1)
    def _finish():
        sf_out[:] = S[:]
        if_out[:] = I[:]
        snf_out[:] = SN[:]
        lyf_out[:] = LY[:]
        tbk_out[:] = TBK[:]



def scan_semiglobal_pallas_subs(subs2_nmb, mlens, nlens, pens6, runs=True):
    """Semiglobal-family scan from a streamed packed-subs tensor
    (arbitrary LUT scoring; x-clips MIN by contract, y-clips dynamic).
    Returns the same tuple as ``scan_semiglobal_pallas_mp``."""
    N, M, B = subs2_nmb.shape
    block_b, K = _pick_block_global(
        B, M, N, n_state=50 if runs is True else 49, stream_bytes=4
    )
    Mp1 = M + 1
    n_chunks = -(-N // K)
    Np = n_chunks * K
    grid = (B // block_b, n_chunks)
    if Np != N:
        subs2_nmb = jnp.pad(subs2_nmb, ((0, Np - N), (0, 0), (0, 0)))
    p6 = jnp.asarray(pens6, I32).reshape(6)
    # pen layout mirrors the mp kernel: [go, ge, ma, mi, N, ycp, ycs]
    pen = jnp.stack(
        [p6[0], p6[1], jnp.int32(0), jnp.int32(0), jnp.int32(N), p6[4], p6[5]]
    )
    fspec = lambda: pl.BlockSpec((Mp1, block_b), lambda b, c: (0, b))
    fshape = lambda: jax.ShapeDtypeStruct((Mp1, B), jnp.int32)
    out = pl.pallas_call(
        partial(_kernel_scan_semiglobal_subs, RUNS=_runs_mode(runs)),
        interpret=jax.default_backend() == "cpu",
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((K, M, block_b), lambda b, c: (c, 0, b)),
            pl.BlockSpec((1, block_b), lambda b, c: (0, b)),
            pl.BlockSpec((1, block_b), lambda b, c: (0, b)),
        ],
        out_specs=[
            pl.BlockSpec((K, Mp1, block_b), lambda b, c: (c, 0, b)),
            fspec(), fspec(), fspec(), fspec(), fspec(),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, Mp1, B), jnp.uint16),
            fshape(), fshape(), fshape(), fshape(), fshape(),
        ],
        scratch_shapes=[
            pltpu.VMEM((Mp1, block_b), jnp.int32)
            for _ in range(8 if runs is True else 7)
        ],
    )(
        pen,
        subs2_nmb,
        mlens.reshape(1, B),
        nlens.reshape(1, B),
    )
    tb_cols, S_f, I_f, Sn_f, Ly_f, tbk = out
    tp = lambda a: jnp.transpose(a, (1, 0))
    return tb_cols, tp(S_f), tp(I_f), tp(Sn_f), tp(Ly_f), tp(tbk)


# ---------------------------------------------------------------------------
# General-clip transposed engine (local/custom modes, MatchParams scoring)
# ---------------------------------------------------------------------------
#
# The fully-general column recurrence (reference custom() :674-843) in the
# transposed layout: all four clip penalties are live dynamic scalars, the
# row-m suffix-clip accumulator runs as a masked reduction over the sublane
# axis with a first-argmax for the Lx clip lengths (streamed out as an
# extra per-column output), and Sn/Ly/I state is carried for the shared
# XLA-side suffix fixups. Subsumes the semiglobal kernel semantically; the
# leaner mode-specific kernels stay because dead-code elimination is worth
# 20-40% on their modes.

TB_XCLIP_PREFIX = 5
TB_XCLIP_SUFFIX = 6
_SENT = np.int32(-(2**31) + 1)


def _kernel_scan_custom_mp(
    pen_ref,
    xt_ref,  # (M, BB) int32 symbols
    yt_ref,  # (Np, BB) int32 symbols
    mlens_ref,
    nlens_ref,
    tb_out,  # (K, Mp1, BB) uint16
    lx_out,  # (K, BB) int32 per-column Lx
    sf_out,
    if_out,
    snf_out,
    lyf_out,
    tbk_out,
    *scratch,
    RUNS: str = "diag",
):
    if RUNS == "diag":
        S, D, SB, I, SN, LY, TBK, R = scratch
    else:
        S, D, SB, I, SN, LY, TBK = scratch
        R = None
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    go = pen_ref[0]
    ge = pen_ref[1]
    ma = pen_ref[2]
    mi = pen_ref[3]
    n_total = pen_ref[4]
    ycp = pen_ref[5]
    ycs = pen_ref[6]
    xcp = pen_ref[7]
    xcs = pen_ref[8]

    K = tb_out.shape[0]
    Mp1, BB = S.shape
    M = Mp1 - 1
    rows = jax.lax.broadcasted_iota(I32, (Mp1, BB), 0)
    row0 = rows == 0
    row_ge1 = rows >= 1
    mlens = mlens_ref[:]  # (1, BB)
    nlens = nlens_ref[:]
    in_x = row_ge1 & (rows <= mlens)
    is_row_m = (rows == mlens) & (mlens >= 1)
    xt = xt_ref[:]
    rge = rows * ge
    yclip_row = ycp + go + ge * (rows - 1)

    @pl.when(c == 0)
    def _init():
        # init column j = 0 (reference custom() :597-672, all clips live)
        gap_i = go + ge * (rows - 1)
        clip_i = xcp + go
        ins_wins = gap_i > clip_i
        I0 = jnp.where(rows == 1, go, jnp.where(ins_wins, gap_i, clip_i))
        I0 = jnp.where(row_ge1, I0, MIN_I32)
        ib0 = jnp.where(
            rows == 1, TB_START,
            jnp.where(ins_wins, TB_INS, TB_XCLIP_PREFIX),
        )
        ib0 = jnp.where(row_ge1, ib0, TB_START)
        # S0 rows >= 1: priority max(MIN, I0, xcp)
        S0 = jnp.full((Mp1, BB), MIN_I32, I32)
        sb0 = jnp.full((Mp1, BB), TB_START, I32)
        takeI = I0 > S0
        S0 = jnp.where(takeI, I0, S0)
        sb0 = jnp.where(takeI, TB_INS, sb0)
        takeX = xcp > S0
        S0 = jnp.where(takeX & row_ge1, xcp, S0)
        sb0 = jnp.where(takeX & row_ge1, TB_XCLIP_PREFIX, sb0)
        # row-m replacement: suffix-clip accumulator over rows 1..m-1
        vals = jnp.where(
            row_ge1 & (rows <= mlens - 1), S0 + xcs, _SENT
        )
        A = jnp.max(vals, axis=0, keepdims=True)  # (1, BB)
        updA = A > MIN_I32
        first = jnp.min(
            jnp.where(vals == A, rows, jnp.int32(2**30)), axis=0, keepdims=True
        )
        S_m = jnp.where(updA, A, MIN_I32)
        sb_m = jnp.full((1, BB), TB_XCLIP_SUFFIX, I32)
        I0_m = jnp.max(jnp.where(is_row_m, I0, _SENT), axis=0, keepdims=True)
        tkI = I0_m > S_m
        S_m = jnp.where(tkI, I0_m, S_m)
        sb_m = jnp.where(tkI, TB_INS, sb_m)
        tkX = xcp > S_m
        S_m = jnp.where(tkX, xcp, S_m)
        sb_m = jnp.where(tkX, TB_XCLIP_PREFIX, sb_m)
        S0 = jnp.where(is_row_m, S_m, S0)
        sb0 = jnp.where(is_row_m, sb_m, sb0)
        S0 = jnp.where(row0, 0, S0)
        sb0 = jnp.where(row0, TB_START, sb0)
        S[:] = S0
        SB[:] = sb0
        D[:] = jnp.full((Mp1, BB), MIN_I32, I32)
        I[:] = jnp.full((Mp1, BB), MIN_I32, I32)
        TBK[:] = ib0 | (TB_START << 4) | (sb0 << 8)
        if RUNS == "diag":
            R[:] = jnp.zeros((Mp1, BB), I32)
        SN[:] = jnp.where(
            row0, ycs, jnp.where(in_x & (S0 + ycs > MIN_I32), S0 + ycs, MIN_I32)
        )
        LY[:] = jnp.where(row0 | (in_x & (S0 + ycs > MIN_I32)), nlens, 0)
        # emit column 0 directly (the wrapper used to concat _init_column's
        # host twin in front of the kernel columns: a full copy of the tb
        # tensor); in sweep mode its ins-run nibble is live (a leading gap
        # can beat the x-prefix clip, giving column 0 multi-row I runs)
        tb0 = TBK[:]
        if RUNS == "ins":
            tb0 = tb0 | _ins_run_nib(ib0, rows)
        tb_out[0] = tb0.astype(jnp.uint16)
        lx_out[0] = jnp.where(updA, mlens - first, 0)

    def column(k, st):
        if RUNS == "diag":
            S_p, D_p, SB_p, I_p, SN_p, LY_p, TBK_p, R_p = st
        else:
            S_p, D_p, SB_p, I_p, SN_p, LY_p, TBK_p = st
            R_p = None
        j = (c * K + k).astype(I32)  # 0-based: column 0 comes from _init
        valid = j <= n_total
        active = j <= nlens
        is_last = j == nlens

        y_col = yt_ref[c * K + k]
        eq = (xt == y_col[None, :]).astype(I32)
        subs = mi + (ma - mi) * eq

        neg_row = jnp.full((1, BB), MIN_I32, I32)
        m_val = jnp.concatenate([neg_row, S_p[:-1] + subs], axis=0)
        m_bits = jnp.concatenate(
            [jnp.full((1, BB), TB_START, I32), TB_SUBST + eq], axis=0
        )

        d_ext = D_p + ge
        d_open = S_p + go
        d_wins = d_ext > d_open
        bestD = jnp.where(d_wins, d_ext, d_open)
        d_bits = jnp.where(d_wins, TB_DEL, SB_p)

        # row 0 boundary
        d_gap = go + ge * (j - 1)
        d_clip = ycp + go
        del_wins0 = d_gap > d_clip
        Dj0 = jnp.where(j == 1, go, jnp.where(del_wins0, d_gap, d_clip))
        db0 = jnp.where(
            j == 1, TB_START,
            jnp.where(del_wins0, TB_DEL, TB_YCLIP_PREFIX),
        )
        d_gt = Dj0 > ycp
        S0j = jnp.where(d_gt, Dj0, ycp)
        sb0 = jnp.where(d_gt, TB_DEL, TB_YCLIP_PREFIX)
        sn0 = SN_p[0:1]
        take_sn = is_last & (sn0 > S0j)
        S0j = jnp.where(take_sn, sn0, S0j)
        sb0 = jnp.where(take_sn, TB_YCLIP_SUFFIX, sb0)
        upd_sn0 = (~take_sn) & (S0j + ycs > sn0) & active
        sn0_new = jnp.where(upd_sn0, S0j + ycs, sn0)
        ly0_new = jnp.where(upd_sn0, nlens - j, LY_p[0:1])

        bestD = jnp.where(row0, Dj0, bestD)
        d_bits = jnp.where(row0, db0, d_bits)

        xclip_score = xcp + jnp.maximum(ycp, go + ge * (j - 1))  # scalar

        s_tilde = jnp.maximum(jnp.maximum(m_val, bestD), yclip_row)
        s_tilde = jnp.maximum(s_tilde, xclip_score)
        s_tilde = jnp.where(row0, S0j, s_tilde)

        T = jnp.concatenate([neg_row, s_tilde[:-1] + go], axis=0)
        U = T - rge
        bestI = _cummax_rows(U) + rge
        i_ext = jnp.concatenate([neg_row, bestI[:-1] + ge], axis=0)

        # priority: Match/Subst > Ins > Del > Xclip-prefix > Yclip-prefix
        S_col = m_val
        s_bits = m_bits
        for cand, bits in (
            (bestI, TB_INS),
            (bestD, TB_DEL),
            (jnp.broadcast_to(xclip_score, (Mp1, BB)), TB_XCLIP_PREFIX),
            (yclip_row, TB_YCLIP_PREFIX),
        ):
            tk = cand > S_col
            S_col = jnp.where(tk, cand, S_col)
            s_bits = jnp.where(tk, bits, s_bits)
        S_col = jnp.where(row0, S0j, S_col)
        s_bits = jnp.where(row0, sb0, s_bits)

        # row-m replacement: suffix-clip accumulator (reference :770-804)
        vals = jnp.where(
            row_ge1 & (rows <= mlens - 1), S_col + xcs, _SENT
        )
        A = jnp.max(vals, axis=0, keepdims=True)
        updA = A > MIN_I32
        first = jnp.min(
            jnp.where(vals == A, rows, jnp.int32(2**30)), axis=0, keepdims=True
        )
        Lx_j = jnp.where(updA & active, mlens - first, 0)  # (1, BB)
        take_m = lambda a: jnp.max(
            jnp.where(is_row_m, a, _SENT), axis=0, keepdims=True
        )
        S_m = jnp.where(updA, A, MIN_I32)
        sb_m = jnp.full((1, BB), TB_XCLIP_SUFFIX, I32)
        for cand, bits in (
            (take_m(m_val), take_m(m_bits)),
            (take_m(bestI), jnp.full((1, BB), TB_INS, I32)),
            (take_m(bestD), jnp.full((1, BB), TB_DEL, I32)),
            (
                jnp.broadcast_to(xclip_score, (1, BB)),
                jnp.full((1, BB), TB_XCLIP_PREFIX, I32),
            ),
            (take_m(yclip_row), jnp.full((1, BB), TB_YCLIP_PREFIX, I32)),
        ):
            tk = cand > S_m
            S_m = jnp.where(tk, cand, S_m)
            sb_m = jnp.where(tk, bits, sb_m)
        S_col = jnp.where(is_row_m, S_m, S_col)
        s_bits = jnp.where(is_row_m, sb_m, s_bits)

        prev_sbits = jnp.concatenate(
            [jnp.full((1, BB), TB_START, I32), s_bits[:-1]], axis=0
        )
        i_bits = jnp.where(i_ext > T, TB_INS, prev_sbits)
        i_bits = jnp.where(row0, TB_START, i_bits)

        upd_sn = (S_col + ycs > SN_p) & in_x & active
        Sn_new = jnp.where(upd_sn, S_col + ycs, SN_p)
        Ly_new = jnp.where(upd_sn, nlens - j, LY_p)
        Sn_new = jnp.where(row0, sn0_new, Sn_new)
        Ly_new = jnp.where(row0, ly0_new, Ly_new)

        if RUNS == "diag":
            is_mm = (s_bits == TB_SUBST) | (s_bits == TB_MATCH)
            same = s_bits == jnp.concatenate(
                [jnp.full((1, BB), -1, I32), SB_p[:-1]], axis=0
            )
            r_diag = jnp.concatenate(
                [jnp.zeros((1, BB), I32), R_p[:-1]], axis=0
            )
            run = jnp.where(is_mm, 1 + jnp.where(same, r_diag, 0), 0)
            nib12 = jnp.minimum(run, 15) << 12
        elif RUNS == "ins":
            # sweep-walk tb: spare bits carry the vertical ins-run nibble
            nib12 = _ins_run_nib(i_bits, rows)
        else:
            nib12 = 0

        tb_col = (
            i_bits | (d_bits << 4) | (s_bits << 8) | nib12
        ).astype(jnp.uint16)
        tb_out[k] = tb_col
        lx_out[k] = Lx_j  # (1, BB) row into the (K, 1, BB) block

        keep = valid & active
        return (
            jnp.where(keep, S_col, S_p),
            jnp.where(keep, bestD, D_p),
            jnp.where(keep, s_bits, SB_p),
            jnp.where(keep, bestI, I_p),
            jnp.where(valid, Sn_new, SN_p),
            jnp.where(valid, Ly_new, LY_p),
            jnp.where(keep, tb_col.astype(I32), TBK_p),
        ) + ((jnp.where(keep, run, R_p),) if RUNS == "diag" else ())

    init = (S[:], D[:], SB[:], I[:], SN[:], LY[:], TBK[:]) + (
        (R[:],) if RUNS == "diag" else ()
    )
    # chunk 0's k = 0 slot is column 0, already emitted by _init
    st = jax.lax.fori_loop(jnp.where(c == 0, 1, 0), K, column, init)
    if RUNS == "diag":
        S[:], D[:], SB[:], I[:], SN[:], LY[:], TBK[:], R[:] = st
    else:
        S[:], D[:], SB[:], I[:], SN[:], LY[:], TBK[:] = st

    @pl.when(c == n_chunks - 1)
    def _finish():
        sf_out[:] = S[:]
        if_out[:] = I[:]
        snf_out[:] = SN[:]
        lyf_out[:] = LY[:]
        tbk_out[:] = TBK[:]


def scan_custom_pallas_mp(xb, yb, mlens, nlens, pens8, runs=True):
    """General-clip scan (MatchParams): returns (tb_cols (Np, Mp1, B) u16
    INCLUDING the j = 0 init column at index 0 (Np >= N+1; padded chunk
    tail is garbage but never walked), Lx_cols (Np, B) i32 likewise,
    S_f, I_f, Sn_f, Ly_f, tbk with finals transposed to the lane-major
    layout the XLA suffix fixups expect.  ``runs=False`` (the sweep-walk
    path) swaps the diagonal run nibble for the vertical ins-run
    nibble."""
    B, M = xb.shape
    N = yb.shape[1]
    block_b, K = _pick_block_global(B, M, N, n_state=55 if runs is True else 54)
    Mp1 = M + 1
    n_chunks = -(-(N + 1) // K)
    Np = n_chunks * K
    grid = (B // block_b, n_chunks)
    xt = jnp.transpose(xb.astype(I32), (1, 0))
    yt = jnp.transpose(yb.astype(I32), (1, 0))
    # leading dummy row aligns yt[j] with DP column j (column 0 unused)
    yt = jnp.pad(yt, ((1, Np - 1 - N), (0, 0)))
    p8 = jnp.asarray(pens8, I32).reshape(8)
    # pens8 = (go, ge, xcp, xcs, ycp, ycs, match, mismatch)
    pen = jnp.stack(
        [p8[0], p8[1], p8[6], p8[7], jnp.int32(N),
         p8[4], p8[5], p8[2], p8[3]]
    )
    fspec = lambda: pl.BlockSpec((Mp1, block_b), lambda b, c: (0, b))
    fshape = lambda: jax.ShapeDtypeStruct((Mp1, B), jnp.int32)
    out = pl.pallas_call(
        partial(_kernel_scan_custom_mp, RUNS=_runs_mode(runs)),
        interpret=jax.default_backend() == "cpu",
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((M, block_b), lambda b, c: (0, b)),
            pl.BlockSpec((Np, block_b), lambda b, c: (0, b)),
            pl.BlockSpec((1, block_b), lambda b, c: (0, b)),
            pl.BlockSpec((1, block_b), lambda b, c: (0, b)),
        ],
        out_specs=[
            pl.BlockSpec((K, Mp1, block_b), lambda b, c: (c, 0, b)),
            pl.BlockSpec((K, 1, block_b), lambda b, c: (c, 0, b)),
            fspec(), fspec(), fspec(), fspec(), fspec(),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, Mp1, B), jnp.uint16),
            jax.ShapeDtypeStruct((Np, 1, B), jnp.int32),
            fshape(), fshape(), fshape(), fshape(), fshape(),
        ],
        scratch_shapes=[
            pltpu.VMEM((Mp1, block_b), jnp.int32)
            for _ in range(8 if runs is True else 7)
        ],
    )(
        pen,
        xt,
        yt,
        mlens.reshape(1, B),
        nlens.reshape(1, B),
    )
    tb_cols, lx_cols, S_f, I_f, Sn_f, Ly_f, tbk = out
    tp = lambda a: jnp.transpose(a, (1, 0))
    return (
        tb_cols, lx_cols[:, 0], tp(S_f), tp(I_f), tp(Sn_f), tp(Ly_f), tp(tbk)
    )


# ---------------------------------------------------------------------------
# Local-mode transposed engine (all four clip penalties == 0)
# ---------------------------------------------------------------------------
#
# Specialization of the general-clip kernel for the reference's local()
# preset (pairwise/mod.rs:986-1015, clips = (0,0,0,0)): with zero clip
# penalties the x-prefix-clip candidate is the constant 0 (the classic SW
# floor), the y-prefix-clip row candidate go+ge*(i-1) < 0 can never beat
# it (strict-> priority, checked X before Y in the custom chain), row 0 is
# the constant (0, Yclip-prefix) except for the last-column Sn exit, and
# the run-length chain is dead (the column-sweep walk reads bits 0-11
# only).  Emits byte-identical (tb_cols, lx_cols, finals) to
# scan_custom_pallas_mp at clips == 0 (property-tested) with ~40% of its
# per-column arithmetic.


def _kernel_scan_local_mp(
    pen_ref,
    xt_ref,  # (M, BB) int32 symbols
    yt_ref,  # (Np, BB) int32 symbols
    mlens_ref,
    nlens_ref,
    tb_out,  # (K, Mp1, BB) uint16
    lx_out,  # (K, 1, BB) int32 per-column Lx
    sf_out,
    if_out,
    snf_out,
    lyf_out,
    tbk_out,
    S,
    D,
    SB,
    I,
    PN,  # packed SN*CN + LY (one carried array for the y-suffix tracker)
    TBK,
    *,
    CROW: int,
    LOG2C: int,
    CN: int,
    LOG2CN: int,
    RUNS: str = "ins",
):
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    go = pen_ref[0]
    ge = pen_ref[1]
    ma = pen_ref[2]
    mi = pen_ref[3]
    n_total = pen_ref[4]

    K = tb_out.shape[0]
    Mp1, BB = S.shape
    rows = jax.lax.broadcasted_iota(I32, (Mp1, BB), 0)
    row0 = rows == 0
    row_ge1 = rows >= 1
    mlens = mlens_ref[:]  # (1, BB)
    nlens = nlens_ref[:]
    in_x = row_ge1 & (rows <= mlens)
    is_row_m = (rows == mlens) & (mlens >= 1)
    mid_rows = row_ge1 & (rows <= mlens - 1)
    xt = xt_ref[:]
    rge = rows * ge

    @pl.when(c == 0)
    def _init():
        # column j = 0 with all clips free: S0 == 0 everywhere; bits are
        # Xclip-prefix except row 0 (Start) and row m (Xclip-suffix when
        # m >= 2, via the suffix accumulator over rows 1..m-1)
        S[:] = jnp.zeros((Mp1, BB), I32)
        sb0 = jnp.where(row0, TB_START, TB_XCLIP_PREFIX)
        sb0 = jnp.where(
            is_row_m & (mlens >= 2), TB_XCLIP_SUFFIX, sb0
        )
        SB[:] = sb0
        ib0 = jnp.where(rows <= 1, TB_START, TB_XCLIP_PREFIX)
        TBK[:] = ib0 | (TB_START << 4) | (sb0 << 8)
        D[:] = jnp.full((Mp1, BB), MIN_I32, I32)
        I[:] = jnp.full((Mp1, BB), MIN_I32, I32)
        # SN starts 0 with LY = nlens on live rows: packed value = nlens
        PN[:] = jnp.where(row0 | in_x, nlens, MIN_I32)
        # emit column 0 directly (local: no column-0 I runs, nibble 0;
        # Lx0 = mlens - 1 — all mid rows tie at 0, smallest row wins)
        tb_out[0] = TBK[:].astype(jnp.uint16)
        lx_out[0] = jnp.where(mlens >= 2, mlens - 1, 0)

    def column(k, st):
        S_p, D_p, SB_p, I_p, PN_p, TBK_p = st
        j = (c * K + k).astype(I32)  # 0-based: column 0 comes from _init
        valid = j <= n_total
        active = j <= nlens
        is_last = j == nlens

        y_col = yt_ref[c * K + k]
        eq = (xt == y_col[None, :]).astype(I32)
        subs = mi + (ma - mi) * eq

        neg_row = jnp.full((1, BB), MIN_I32, I32)
        m_val = jnp.concatenate([neg_row, S_p[:-1] + subs], axis=0)
        m_bits = jnp.concatenate(
            [jnp.full((1, BB), TB_START, I32), TB_SUBST + eq], axis=0
        )

        d_ext = D_p + ge
        d_open = S_p + go
        d_wins = d_ext > d_open
        bestD = jnp.where(d_wins, d_ext, d_open)
        d_bits = jnp.where(d_wins, TB_DEL, SB_p)

        # row 0 boundary: Dj0 == go always (gap run never beats clip+open),
        # S0 == 0 via the free y-prefix clip, except the last-column Sn exit
        db0 = jnp.where(j == 1, TB_START, TB_YCLIP_PREFIX)
        sn0 = PN_p[0:1] >> LOG2CN  # row-0 PN is always >= 0
        take_sn = is_last & (sn0 > 0)
        S0j = jnp.where(take_sn, sn0, 0)
        sb0 = jnp.where(take_sn, TB_YCLIP_SUFFIX, TB_YCLIP_PREFIX)

        bestD = jnp.where(row0, go, bestD)
        d_bits = jnp.where(row0, db0, d_bits)

        s_tilde = jnp.maximum(jnp.maximum(m_val, bestD), 0)
        s_tilde = jnp.where(row0, S0j, s_tilde)

        T = jnp.concatenate([neg_row, s_tilde[:-1] + go], axis=0)
        U = T - rge
        bestI = _cummax_rows(U) + rge
        i_ext = jnp.concatenate([neg_row, bestI[:-1] + ge], axis=0)

        # priority: Match/Subst > Ins > Del > Xclip-prefix (the 0 floor);
        # the y-prefix candidate go+ge*(i-1) < 0 is provably dead
        S_col = m_val
        s_bits = m_bits
        takeI = bestI > S_col
        S_col = jnp.where(takeI, bestI, S_col)
        s_bits = jnp.where(takeI, TB_INS, s_bits)
        takeD = bestD > S_col
        S_col = jnp.where(takeD, bestD, S_col)
        s_bits = jnp.where(takeD, TB_DEL, s_bits)
        takeX = S_col < 0
        S_col = jnp.where(takeX, 0, S_col)
        s_bits = jnp.where(takeX, TB_XCLIP_PREFIX, s_bits)
        S_col = jnp.where(row0, S0j, S_col)
        s_bits = jnp.where(row0, sb0, s_bits)

        # row-m replacement: free-suffix-clip accumulator (xcs == 0).
        # Every S_col in local mode is >= 0 (the Xclip floor), so one
        # packed masked reduction suffices (dispatch guards the headroom:
        # max score * CROW stays < 2^31):
        #   PA = max over mid rows of S*CROW + (CROW-1-row): value = best
        #        mid-row S, tie-break = SMALLEST row (for Lx)
        # The custom kernel's candidate chain at row m reduces to: A wins
        # iff not (W > A) — it seeds (A, Xclip-suffix) and every take is
        # strict.  W (the row-m cell's own chain) is S_col AT row m, so the
        # comparison runs in place under the is_row_m mask instead of
        # extracting W with a second gather-by-reduction.
        PA = jnp.max(
            jnp.where(mid_rows, S_col * CROW + (CROW - 1 - rows), -1),
            axis=0,
            keepdims=True,
        )
        A = PA >> LOG2C
        updA = PA >= 0
        first = (CROW - 1) - (PA & (CROW - 1))
        Lx_j = jnp.where(updA & active, mlens - first, 0)  # (1, BB)
        a_row = is_row_m & updA & jnp.logical_not(S_col > A)
        S_col = jnp.where(a_row, A, S_col)
        s_bits = jnp.where(a_row, TB_XCLIP_SUFFIX, s_bits)

        prev_sbits = jnp.concatenate(
            [jnp.full((1, BB), TB_START, I32), s_bits[:-1]], axis=0
        )
        i_bits = jnp.where(i_ext > T, TB_INS, prev_sbits)
        i_bits = jnp.where(row0, TB_START, i_bits)

        # packed y-suffix tracker: strict-> on SN with old-LY tie-keep ==
        # plain max on SN*CN + (nlens - j), since nlens - j strictly
        # decreases (S_col >= 0 in local mode keeps the pack in range)
        PN_new = jnp.where(
            in_x & active & valid,
            jnp.maximum(PN_p, S_col * CN + (nlens - j)),
            PN_p,
        )

        nib12 = _ins_run_nib(i_bits, rows) if RUNS == "ins" else 0
        tb_col = (
            i_bits | (d_bits << 4) | (s_bits << 8) | nib12
        ).astype(jnp.uint16)
        tb_out[k] = tb_col
        lx_out[k] = Lx_j

        keep = valid & active
        return (
            jnp.where(keep, S_col, S_p),
            jnp.where(keep, bestD, D_p),
            jnp.where(keep, s_bits, SB_p),
            jnp.where(keep, bestI, I_p),
            PN_new,
            jnp.where(keep, tb_col.astype(I32), TBK_p),
        )

    # chunk 0's k = 0 slot is column 0, already emitted by _init
    st = jax.lax.fori_loop(
        jnp.where(c == 0, 1, 0), K, column,
        (S[:], D[:], SB[:], I[:], PN[:], TBK[:]),
    )
    S[:], D[:], SB[:], I[:], PN[:], TBK[:] = st

    @pl.when(c == n_chunks - 1)
    def _finish():
        sf_out[:] = S[:]
        if_out[:] = I[:]
        live = PN[:] >= 0
        snf_out[:] = jnp.where(live, PN[:] >> LOG2CN, MIN_I32)
        lyf_out[:] = jnp.where(live, PN[:] & (CN - 1), 0)
        tbk_out[:] = TBK[:]


def local_engine_headroom_ok(M: int, N: int, match_score: int) -> bool:
    """Whether the packed reductions/trackers have int32 headroom for
    this shape: max local score (min(M,N)*match) times the larger of the
    row pack base CROW and the column pack base CN must stay < 2^31."""
    crow = 1 << max(M + 1, 2).bit_length()
    cn = 1 << max(N + 1, 2).bit_length()
    base = max(crow, cn, 16)
    smax = max(1, int(match_score)) * min(M, N)
    return smax < (2**31) // base - base


def scan_local_pallas_mp(xb, yb, mlens, nlens, pens8, runs="ins"):
    """Local-mode scan (clips == 0): same outputs/layout as
    scan_custom_pallas_mp, including the j = 0 init column at index 0."""
    B, M = xb.shape
    N = yb.shape[1]
    block_b, K = _pick_block_global(B, M, N, n_state=31)
    CROW = 1 << max(M + 1, 2).bit_length()
    CN = 1 << max(N + 1, 2).bit_length()
    Mp1 = M + 1
    n_chunks = -(-(N + 1) // K)
    Np = n_chunks * K
    grid = (B // block_b, n_chunks)
    xt = jnp.transpose(xb.astype(I32), (1, 0))
    yt = jnp.transpose(yb.astype(I32), (1, 0))
    # leading dummy row aligns yt[j] with DP column j (column 0 unused)
    yt = jnp.pad(yt, ((1, Np - 1 - N), (0, 0)))
    p8 = jnp.asarray(pens8, I32).reshape(8)
    pen = jnp.stack([p8[0], p8[1], p8[6], p8[7], jnp.int32(N)])
    fspec = lambda: pl.BlockSpec((Mp1, block_b), lambda b, c: (0, b))
    fshape = lambda: jax.ShapeDtypeStruct((Mp1, B), jnp.int32)
    out = pl.pallas_call(
        partial(
            _kernel_scan_local_mp, CROW=CROW, LOG2C=CROW.bit_length() - 1,
            CN=CN, LOG2CN=CN.bit_length() - 1, RUNS=_runs_mode(runs),
        ),
        interpret=jax.default_backend() == "cpu",
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((M, block_b), lambda b, c: (0, b)),
            pl.BlockSpec((Np, block_b), lambda b, c: (0, b)),
            pl.BlockSpec((1, block_b), lambda b, c: (0, b)),
            pl.BlockSpec((1, block_b), lambda b, c: (0, b)),
        ],
        out_specs=[
            pl.BlockSpec((K, Mp1, block_b), lambda b, c: (c, 0, b)),
            pl.BlockSpec((K, 1, block_b), lambda b, c: (c, 0, b)),
            fspec(), fspec(), fspec(), fspec(), fspec(),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, Mp1, B), jnp.uint16),
            jax.ShapeDtypeStruct((Np, 1, B), jnp.int32),
            fshape(), fshape(), fshape(), fshape(), fshape(),
        ],
        scratch_shapes=[
            pltpu.VMEM((Mp1, block_b), jnp.int32) for _ in range(6)
        ],
    )(
        pen,
        xt,
        yt,
        mlens.reshape(1, B),
        nlens.reshape(1, B),
    )
    tb_cols, lx_cols, S_f, I_f, Sn_f, Ly_f, tbk = out
    tp = lambda a: jnp.transpose(a, (1, 0))
    return (
        tb_cols, lx_cols[:, 0], tp(S_f), tp(I_f), tp(Sn_f), tp(Ly_f), tp(tbk)
    )


# ---------------------------------------------------------------------------
# Block-row long-sequence global engine
# ---------------------------------------------------------------------------
#
# The transposed kernels above keep the whole (M+1, BB) DP state in VMEM,
# which caps M at the low hundreds.  This engine tiles the ROW axis too:
# grid (B/BB, R, Nc) sweeps row blocks of RB rows over all columns, carrying
# the inter-block boundary per column in VMEM scratch — ``bndS[j]`` (the
# boundary row's final S), ``bndI[j]`` (the insertion-scan seed
# max(I_bot + ge, s~_bot + go)) and ``bndE[j]`` (whether the extend
# candidate won, for the first in-block row's i-bits).  This is SURVEY §5's
# "block-row sweeps with carried boundary columns" (the reference instead
# scales M algorithmically, banded.rs:6-16 — same trick, re-laid-out).
#
# Semantics are the global mode of the reference aligner
# (pairwise/mod.rs:925-951); first-in-block i-layer open back-pointers are
# written as TB_REREAD (resolved by the column-sweep walk, which sees whole
# columns).  Bit-identical to the single-block engine by property test.

TB_REREAD = 9


def _kernel_scan_global_rows_mp(
    pen_ref,  # SMEM: [go, ge, ma, mi, N]
    xs_ref,  # (RB, BB) i32: x symbol for DP row gi = r*RB + ii (x[gi-1])
    yt_ref,  # (K, BB) i32 column symbols
    mlens_ref,  # (1, BB)
    nlens_ref,  # (1, BB)
    tb_out,  # (K, RB, BB) uint16
    score_out,  # (1, BB) i32
    S,  # scratch (RB, BB) i32
    D,
    SB,
    bndS,  # scratch (Np, BB) i32
    bndI,
    bndE,
    carryS,  # scratch (1, BB) i32
):
    r = pl.program_id(1)
    c = pl.program_id(2)
    nc = pl.num_programs(2)
    go = pen_ref[0]
    ge = pen_ref[1]
    ma = pen_ref[2]
    mi = pen_ref[3]
    n_total = pen_ref[4]

    K, RB, BB = tb_out.shape
    rows_loc = jax.lax.broadcasted_iota(I32, (RB, BB), 0)
    gi = rows_loc + r * RB
    row0 = gi == 0  # true only in block r == 0
    rvec0 = jnp.full((1, BB), r, I32) == 0  # (1, BB) vector r == 0
    mlens = mlens_ref[:]
    nlens = nlens_ref[:]
    xs = xs_ref[:]
    rge = rows_loc * ge

    @pl.when(c == 0)
    def _init():
        # column 0 of the global DP restricted to this row block
        S[:] = jnp.where(row0, 0, go + ge * (gi - 1))
        D[:] = jnp.full((RB, BB), MIN_I32, I32)
        SB[:] = jnp.where(row0, TB_START, TB_INS)
        # S[r*RB - 1, 0] — the boundary row's init value, feeding the
        # first column's diagonal candidate (garbage at r == 0: masked)
        carryS[:] = jnp.full((1, BB), go + ge * (r * RB - 2), I32)

    neg_row = jnp.full((1, BB), MIN_I32, I32)

    def column(k, st):
        S_p, D_p, SB_p, pS = st
        j = (c * K + k + 1).astype(I32)
        idx = c * K + k  # bnd arrays are indexed by j - 1
        valid = j <= n_total

        y_col = yt_ref[k]  # (BB,)
        eq = (xs == y_col[None, :]).astype(I32)
        subs = mi + (ma - mi) * eq

        # read old boundary values (written by block r-1) BEFORE overwriting
        oS = bndS[idx][None, :]
        oI = bndI[idx][None, :]
        oE = bndE[idx][None, :]
        seedI = jnp.where(rvec0, NEG, oI)

        m_val = jnp.concatenate([pS + subs[0:1], S_p[:-1] + subs[1:]], axis=0)
        m_bits = TB_SUBST + eq

        d_ext = D_p + ge
        d_open = S_p + go
        d_wins = d_ext > d_open
        bestD = jnp.where(d_wins, d_ext, d_open)
        d_bits = jnp.where(d_wins, TB_DEL, SB_p)
        Dj0 = go + ge * (j - 1)
        bestD = jnp.where(row0, Dj0, bestD)
        d_bits = jnp.where(
            row0, jnp.where(j == 1, TB_START, TB_DEL), d_bits
        )

        s_tilde = jnp.maximum(m_val, bestD)
        s_tilde = jnp.where(row0, Dj0, s_tilde)

        # insertion prefix scan, seeded across the row-block boundary
        T = jnp.concatenate([neg_row, s_tilde[:-1] + go], axis=0)
        U = jnp.concatenate([seedI, s_tilde[:-1] + go - rge[1:]], axis=0)
        bestI = _cummax_rows(U) + rge
        i_ext = jnp.concatenate([neg_row, bestI[:-1] + ge], axis=0)

        S_col = m_val
        s_bits = m_bits
        takeI = bestI > S_col
        S_col = jnp.where(takeI, bestI, S_col)
        s_bits = jnp.where(takeI, TB_INS, s_bits)
        takeD = bestD > S_col
        S_col = jnp.where(takeD, bestD, S_col)
        s_bits = jnp.where(takeD, TB_DEL, s_bits)
        S_col = jnp.where(row0, Dj0, S_col)
        s_bits = jnp.where(row0, TB_DEL, s_bits)

        prev_sbits = jnp.concatenate(
            [jnp.full((1, BB), TB_REREAD, I32), s_bits[:-1]], axis=0
        )
        i_bits = jnp.where(i_ext > T, TB_INS, prev_sbits)
        # first in-block row: extend-vs-open decision carried from above
        row_first = rows_loc == 0
        ib0 = jnp.where(oE == 1, TB_INS, TB_REREAD)
        i_bits = jnp.where(
            row_first, jnp.broadcast_to(ib0, (RB, BB)), i_bits
        )
        i_bits = jnp.where(row0, TB_START, i_bits)

        tb_out[k] = (i_bits | (d_bits << 4) | (s_bits << 8)).astype(
            jnp.uint16
        )

        # boundary for block r+1 (garbage past nlens: never read there)
        last = RB - 1
        bndS[idx] = S_col[last]
        ext_wins = bestI[last : last + 1] + ge > s_tilde[last : last + 1] + go
        bndI[idx] = jnp.maximum(
            bestI[last : last + 1] + ge, s_tilde[last : last + 1] + go
        )[0]
        bndE[idx] = ext_wins.astype(I32)[0]

        keep = valid & (j <= nlens)
        return (
            jnp.where(keep, S_col, S_p),
            jnp.where(keep, bestD, D_p),
            jnp.where(keep, s_bits, SB_p),
            oS,
        )

    st = jax.lax.fori_loop(0, K, column, (S[:], D[:], SB[:], carryS[:]))
    S[:], D[:], SB[:], carryS[:] = st

    @pl.when(c == nc - 1)
    def _score():
        sc = jnp.max(jnp.where(gi == mlens, S[:], NEG), axis=0, keepdims=True)
        prev = jnp.where(rvec0, NEG, score_out[:])
        score_out[:] = jnp.maximum(prev, sc)


def _pick_block_rows(B: int, M: int, N: int):
    """(block_b, RB, K, Np) for the block-row engine's VMEM model."""
    budget = 12 * 2**20
    bb = 128 if B % 128 == 0 else (B if B <= 128 else 0)
    assert bb and B % bb == 0, f"block-row engine needs B%128==0 or B<=128, got {B}"
    lanes = 128  # physical lane padding
    best = None
    for RB in (512, 256, 128, 64):
        # state (3) + column temporaries (~16) + x double-buffered (2)
        fixed_rb = (3 + 16 + 2) * RB * lanes * 4
        for K in (64, 48, 32, 24, 16, 8, 4):
            Np = -(-N // K) * K
            bnd = 3 * Np * lanes * 4
            tb = 2 * K * RB * lanes * 2
            y = 2 * K * lanes * 4
            if fixed_rb + bnd + tb + y > budget:
                continue
            R = -(-(M + 1) // RB)
            steps = R * (Np // K)
            if best is None or steps < best[0]:
                best = (steps, bb, RB, K, Np)
    assert best is not None, f"no feasible block-row config for B={B} M={M} N={N}"
    return best[1], best[2], best[3], best[4]


def rows_feasible(B: int, M: int, N: int) -> bool:
    """Whether the block-row engine's boundary scratch fits for this shape."""
    try:
        _pick_block_rows(B, M, N)
        return True
    except AssertionError:
        return False


def scan_global_rows_pallas_mp(xb, yb, mlens, nlens, pens8):
    """Block-row global scan for long sequences: returns
    (score (B,), tb_cols (Np, RRB, B) uint16, RRB) — DP rows 0..RRB-1 on
    axis 1 (RRB = ceil((M+1)/RB)*RB >= M+1), columns 1..N on axis 0."""
    B, M = xb.shape
    N = yb.shape[1]
    block_b, RB, K, Np = _pick_block_rows(B, M, N)
    R = -(-(M + 1) // RB)
    RRB = R * RB
    nc = Np // K
    grid = (B // block_b, R, nc)
    # xs[t] = x symbol of DP row t (x[t-1]); row 0 is never read (row0 mask)
    xt = jnp.transpose(xb.astype(I32), (1, 0))  # (M, B)
    xs = jnp.pad(xt, ((1, RRB - M - 1), (0, 0)))
    yt = jnp.transpose(yb.astype(I32), (1, 0))
    if Np != N:
        yt = jnp.pad(yt, ((0, Np - N), (0, 0)))
    p8 = jnp.asarray(pens8, I32).reshape(8)
    pen = jnp.stack([p8[0], p8[1], p8[6], p8[7], jnp.int32(N)])
    out = pl.pallas_call(
        _kernel_scan_global_rows_mp,
        interpret=jax.default_backend() == "cpu",
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((RB, block_b), lambda b, r, c: (r, b)),
            pl.BlockSpec((K, block_b), lambda b, r, c: (c, b)),
            pl.BlockSpec((1, block_b), lambda b, r, c: (0, b)),
            pl.BlockSpec((1, block_b), lambda b, r, c: (0, b)),
        ],
        out_specs=[
            pl.BlockSpec((K, RB, block_b), lambda b, r, c: (c, r, b)),
            pl.BlockSpec((1, block_b), lambda b, r, c: (0, b)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, RRB, B), jnp.uint16),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((RB, block_b), jnp.int32),
            pltpu.VMEM((RB, block_b), jnp.int32),
            pltpu.VMEM((RB, block_b), jnp.int32),
            pltpu.VMEM((Np, block_b), jnp.int32),
            pltpu.VMEM((Np, block_b), jnp.int32),
            pltpu.VMEM((Np, block_b), jnp.int32),
            pltpu.VMEM((1, block_b), jnp.int32),
        ],
    )(
        pen,
        xs,
        yt,
        mlens.reshape(1, B),
        nlens.reshape(1, B),
    )
    tb_cols, score = out
    return score[0], tb_cols, RRB


# ---------------------------------------------------------------------------
# Banded custom-mode engine (banded.rs parity)
# ---------------------------------------------------------------------------
#
# Device twin of alignment/pairwise/banded.py compute_alignment (itself a
# statement-level twin of banded.rs:282-870): the general-clip DP restricted
# to per-column row bands [starts[j], ends[j]).  The host rolls two parity
# buffers and resets only band fringes, so out-of-band cells hold values
# from TWO columns earlier and ONE of them (row ends[n] at the final column,
# via the fixups' off-by-one unmask `i > ends[n]`) is observable.  The
# kernel therefore carries explicit (current, stale) pairs for S and D and
# applies the host's exact write/reset masks — buffer contents are
# bit-identical to the host's at every column, monotone bands or not.
#
# Banded-vs-custom recurrence deltas replicated here (all per-lane, keyed
# on is_last = j == nlens): xclip_score gains a max(ycp, Sn[0]) term; the
# insertion chain gains a Sn[i-1] + go candidate (TB_YCLIP_SUFFIX bits);
# row 0 has NO Sn merge; column 0 does NO Sn[i] updates; and when row m is
# out of band its accumulated xclip-suffix value feeds the Sn[m] update and
# is then discarded (S[m] = MIN, tb s-bits = TB_XCLIP_SUFFIX).


def _kernel_scan_banded_mp(
    pen_ref,  # SMEM [go, ge, ma, mi, N, ycp, ycs, xcp, xcs]
    xt_ref,  # (M, BB) int32 symbols
    yt_ref,  # (Np, BB)
    st_ref,  # (Np, BB) band starts, columns 1..N
    en_ref,  # (Np, BB) band ends (exclusive)
    enx_ref,  # (Np, BB) ends[min(n, j+1)] (the host post-reset bound)
    st0_ref,  # (1, BB) column-0 band
    en0_ref,  # (1, BB)
    mlens_ref,
    nlens_ref,
    tb_out,  # (K, Mp1, BB) uint16
    lx_out,  # (K, 1, BB) int32
    sf_out,
    if_out,
    snf_out,
    lyf_out,
    tbk_out,
    S,  # current-parity S buffer
    Ss,  # stale-parity S buffer
    D,
    Ds,
    SB,  # s-bits of the previous column's tb (0 where unwritten)
    I,
    SN,
    LY,
    TBK,
):
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    go = pen_ref[0]
    ge = pen_ref[1]
    ma = pen_ref[2]
    mi = pen_ref[3]
    n_total = pen_ref[4]
    ycp = pen_ref[5]
    ycs = pen_ref[6]
    xcp = pen_ref[7]
    xcs = pen_ref[8]

    K = tb_out.shape[0]
    Mp1, BB = S.shape
    M = Mp1 - 1
    rows = jax.lax.broadcasted_iota(I32, (Mp1, BB), 0)
    row0 = rows == 0
    row_ge1 = rows >= 1
    mlens = mlens_ref[:]
    nlens = nlens_ref[:]
    is_row_m = (rows == mlens) & (mlens >= 1)
    xt = xt_ref[:]
    rge = rows * ge
    yclip_row = ycp + go + ge * (rows - 1)

    @pl.when(c == 0)
    def _init():
        # column j = 0 (banded.py:396-439): band-masked init column
        st0 = st0_ref[:]
        en0 = en0_ref[:]
        in_b0 = row_ge1 & (rows >= st0) & (rows < en0)
        gap_i = go + ge * (rows - 1)
        clip_i = xcp + go
        ins_wins = gap_i > clip_i
        I0v = jnp.where(rows == 1, go, jnp.where(ins_wins, gap_i, clip_i))
        ib0 = jnp.where(
            rows == 1, TB_START, jnp.where(ins_wins, TB_INS, TB_XCLIP_PREFIX)
        )
        # cell S: base MIN; I > S -> INS; xcp > S -> XCLIP_PREFIX
        S0 = jnp.full((Mp1, BB), MIN_I32, I32)
        sb0 = jnp.full((Mp1, BB), TB_START, I32)
        tkI = I0v > S0
        S0 = jnp.where(tkI, I0v, S0)
        sb0 = jnp.where(tkI, TB_INS, sb0)
        tkX = xcp > S0
        S0 = jnp.where(tkX, xcp, S0)
        sb0 = jnp.where(tkX, TB_XCLIP_PREFIX, sb0)
        # row-m accumulator over in-band rows < m
        vals = jnp.where(in_b0 & (rows <= mlens - 1), S0 + xcs, _SENT)
        A = jnp.max(vals, axis=0, keepdims=True)
        updA = A > MIN_I32
        first = jnp.min(
            jnp.where(vals == A, rows, jnp.int32(2**30)), axis=0,
            keepdims=True,
        )
        del first  # column-0 Lx is recomputed by the XLA init twin
        m_in_b0 = (mlens >= st0) & (mlens < en0) & (mlens >= 1)
        S_m = jnp.where(updA, A, MIN_I32)
        sb_m = jnp.full((1, BB), TB_XCLIP_SUFFIX, I32)
        take_m = lambda a: jnp.max(
            jnp.where(is_row_m, a, _SENT), axis=0, keepdims=True
        )
        I0_m = take_m(jnp.where(in_b0, I0v, MIN_I32))
        tkIm = I0_m > S_m
        S_m = jnp.where(tkIm, I0_m, S_m)
        sb_m = jnp.where(tkIm, TB_INS, sb_m)
        tkXm = xcp > S_m
        S_m = jnp.where(tkXm, xcp, S_m)
        sb_m = jnp.where(tkXm, TB_XCLIP_PREFIX, sb_m)
        # `if i_end < m + 1: S[curr][m] = MIN` (no tb write at col 0: the
        # XCS s-bits exist only if the accumulator ever fired)
        S_m = jnp.where(m_in_b0, S_m, MIN_I32)
        sb_m = jnp.where(
            m_in_b0, sb_m,
            jnp.where(updA, TB_XCLIP_SUFFIX, TB_START),
        )
        S0 = jnp.where(in_b0, S0, MIN_I32)
        sb0 = jnp.where(in_b0, sb0, TB_START)
        I0 = jnp.where(in_b0, I0v, MIN_I32)
        ib0 = jnp.where(in_b0, ib0, TB_START)
        S0 = jnp.where(is_row_m, S_m, S0)
        sb0 = jnp.where(is_row_m, sb_m, sb0)
        S0 = jnp.where(row0, jnp.where(st0 == 0, 0, MIN_I32), S0)
        sb0 = jnp.where(row0, TB_START, sb0)
        S[:] = S0
        Ss[:] = jnp.full((Mp1, BB), MIN_I32, I32)
        D[:] = jnp.full((Mp1, BB), MIN_I32, I32)
        Ds[:] = jnp.full((Mp1, BB), MIN_I32, I32)
        SB[:] = sb0
        I[:] = I0
        TBK[:] = ib0 | (TB_START << 4) | (sb0 << 8)
        # Sn init (banded: ONLY row 0; no per-row ycs merge at column 0)
        yp_wins = ycp > ycs
        SN[:] = jnp.where(
            row0, jnp.where(yp_wins, ycp, ycs), MIN_I32
        )
        LY[:] = jnp.where(row0 & ~yp_wins, nlens, 0)

    def column(k, st):
        S_p, Ss_p, D_p, Ds_p, SB_p, I_p, SN_p, LY_p, TBK_p = st
        j = (c * K + k + 1).astype(I32)
        valid = j <= n_total
        active = j <= nlens
        is_last = j == nlens

        stj = st_ref[k][None, :]  # (1, BB)
        enj = en_ref[k][None, :]
        enx = enx_ref[k][None, :]
        in_band = row_ge1 & (rows >= stj) & (rows < enj)
        m_in_band = (mlens >= stj) & (mlens < enj) & (mlens >= 1)
        r0_comp = stj == 0  # (1, BB): host computes row 0 iff i_start == 0

        y_col = yt_ref[k]  # yt streams per chunk like st/en
        eq = (xt == y_col[None, :]).astype(I32)
        subs = mi + (ma - mi) * eq

        neg_row = jnp.full((1, BB), MIN_I32, I32)
        m_val = jnp.concatenate([neg_row, S_p[:-1] + subs], axis=0)
        m_bits = jnp.concatenate(
            [jnp.full((1, BB), TB_START, I32), TB_SUBST + eq], axis=0
        )

        d_ext = D_p + ge
        d_open = S_p + go
        d_wins = d_ext > d_open
        bestD = jnp.where(d_wins, d_ext, d_open)
        d_bits = jnp.where(d_wins, TB_DEL, SB_p)

        # row 0 (banded.py:561-599): computed iff the band starts at 0;
        # NO Sn merge into S (that is the full custom aligner's quirk)
        d_gap = go + ge * (j - 1)
        d_clip = ycp + go
        del_wins0 = d_gap > d_clip
        Dj0 = jnp.where(j == 1, go, jnp.where(del_wins0, d_gap, d_clip))
        db0 = jnp.where(
            j == 1, TB_START, jnp.where(del_wins0, TB_DEL, TB_YCLIP_PREFIX)
        )
        d_gt = Dj0 > ycp
        S0j = jnp.where(d_gt, Dj0, ycp)
        sb0 = jnp.where(d_gt, TB_DEL, TB_YCLIP_PREFIX)
        sn0_old = SN_p[0:1]
        upd_sn0 = (S0j + ycs > sn0_old) & active & r0_comp
        sn0_new = jnp.where(upd_sn0, S0j + ycs, sn0_old)
        ly0_new = jnp.where(upd_sn0, nlens - j, LY_p[0:1])

        bestD = jnp.where(row0, jnp.where(r0_comp, Dj0, MIN_I32), bestD)
        d_bits = jnp.where(row0, jnp.where(r0_comp, db0, TB_START), d_bits)

        # xclip_score (banded.py:480-483): at j == n the ycp term becomes
        # max(ycp, Sn[0]) with Sn[0] AFTER this column's row-0 update
        yterm = jnp.where(
            is_last, jnp.maximum(ycp, sn0_new), jnp.broadcast_to(ycp, sn0_new.shape)
        )
        xclip_vec = xcp + jnp.maximum(yterm, go + ge * (j - 1))  # (1, BB)

        s_tilde = jnp.maximum(jnp.maximum(m_val, bestD), yclip_row)
        s_tilde = jnp.maximum(s_tilde, xclip_vec)
        s_tilde = jnp.where(row0, jnp.where(r0_comp, S0j, MIN_I32), s_tilde)

        # insertion chain: open from s_tilde(i-1) + go, and at j == n also
        # from Sn(i-1) + go (banded.py:497-501); Sn values are pre-column
        # except row 0 (in-column updates are dominated since ycs <= 0)
        sn_for_i = jnp.concatenate([sn0_new, SN_p[1:]], axis=0)
        # the in-column open chain must match the host's buffer contents:
        # row st-1 is RESET (MIN) and rows above it never feed the band's
        # chain (the host loop starts at max(1, st)).  Chain sentinel: must
        # sit below every reachable value but leave headroom for the +go /
        # -rge arithmetic (an int32 _SENT wraps)
        SENT2 = jnp.int32(-1_500_000_000)
        s_tilde_eff = jnp.where(
            rows >= stj,
            s_tilde,
            jnp.where(rows == stj - 1, MIN_I32, SENT2),
        )
        T_s = jnp.concatenate([neg_row, s_tilde_eff[:-1] + go], axis=0)
        T_sn = jnp.concatenate([neg_row, sn_for_i[:-1] + go], axis=0)
        # gate to a sentinel BELOW any reachable chain value (values dip
        # under MIN_I32 by a few gap units; MIN_I32 itself would win there)
        T_sn = jnp.where(
            jnp.broadcast_to(is_last, T_sn.shape), T_sn, SENT2
        )
        # I-chain seed: at the first loop row the host reads the RESET
        # I[st-1] = MIN, so i_score = MIN + ge there (an "open" of value
        # MIN+ge at that row, extending with ge like any chain)
        T_seed = jnp.where(
            rows == jnp.maximum(1, stj), MIN_I32 + ge, SENT2
        )
        T = jnp.maximum(jnp.maximum(T_s, T_sn), T_seed)
        U = T - rge
        bestI = _cummax_rows(U) + rge
        i_ext = jnp.concatenate([neg_row, bestI[:-1] + ge], axis=0)

        # priority: M/S > I > D > XCLIP_PREFIX > YCLIP_PREFIX
        S_col = m_val
        s_bits = m_bits
        for cand, bits in (
            (bestI, TB_INS),
            (bestD, TB_DEL),
            (jnp.broadcast_to(xclip_vec, (Mp1, BB)), TB_XCLIP_PREFIX),
            (yclip_row, TB_YCLIP_PREFIX),
        ):
            tk = cand > S_col
            S_col = jnp.where(tk, cand, S_col)
            s_bits = jnp.where(tk, bits, s_bits)
        S_col = jnp.where(row0, S0j, S_col)
        s_bits = jnp.where(row0, sb0, s_bits)

        # row-m: xclip-suffix accumulator over in-band rows < m, then the
        # cell's own candidates when m is in band (banded.py:523-547)
        vals = jnp.where(in_band & (rows <= mlens - 1), S_col + xcs, _SENT)
        A = jnp.max(vals, axis=0, keepdims=True)
        updA = A > MIN_I32
        first = jnp.min(
            jnp.where(vals == A, rows, jnp.int32(2**30)), axis=0,
            keepdims=True,
        )
        Lx_j = jnp.where(updA & active, mlens - first, 0)
        take_m = lambda a: jnp.max(
            jnp.where(is_row_m, a, _SENT), axis=0, keepdims=True
        )
        S_m = jnp.where(updA, A, MIN_I32)
        sb_m = jnp.full((1, BB), TB_XCLIP_SUFFIX, I32)
        for cand, bits in (
            (take_m(m_val), take_m(m_bits)),
            (take_m(bestI), jnp.full((1, BB), TB_INS, I32)),
            (take_m(bestD), jnp.full((1, BB), TB_DEL, I32)),
            (
                jnp.broadcast_to(xclip_vec, (1, BB)),
                jnp.full((1, BB), TB_XCLIP_PREFIX, I32),
            ),
            (take_m(yclip_row), jnp.full((1, BB), TB_YCLIP_PREFIX, I32)),
        ):
            tk = cand > S_m
            S_m = jnp.where(tk, cand, S_m)
            sb_m = jnp.where(tk, bits, sb_m)
        S_col = jnp.where(is_row_m, jnp.where(m_in_band, S_m, S_col), S_col)
        s_bits = jnp.where(is_row_m, jnp.where(m_in_band, sb_m, s_bits), s_bits)

        # i-bits: chained-extend vs fresh open (s-bits of the cell above)
        # vs the j==n Sn open (TB_YCLIP_SUFFIX)
        prev_sbits = jnp.concatenate(
            [jnp.full((1, BB), TB_START, I32), s_bits[:-1]], axis=0
        )
        i_score_eff = jnp.maximum(i_ext, T_seed)
        i_bits = jnp.where(
            T_sn > jnp.maximum(i_score_eff, T_s),
            TB_YCLIP_SUFFIX,
            jnp.where(i_score_eff > T_s, TB_INS, prev_sbits),
        )
        i_bits = jnp.where(row0, TB_START, i_bits)

        # Sn updates from in-band cells (banded.py:548-552)
        upd_sn = (S_col + ycs > SN_p) & in_band & active
        Sn_new = jnp.where(upd_sn, S_col + ycs, SN_p)
        Ly_new = jnp.where(upd_sn, nlens - j, LY_p)
        Sn_new = jnp.where(row0, sn0_new, Sn_new)
        Ly_new = jnp.where(row0, ly0_new, Ly_new)

        # post-loop: Sn[m] from the accumulated S[m], THEN the out-of-band
        # row-m override (S[m] = MIN, tb s-bits = XCLIP_SUFFIX)
        S_m_acc = jnp.where(
            m_in_band, take_m(S_col), jnp.where(updA, A, MIN_I32)
        )
        upd_snm = (S_m_acc + ycs > take_m(Sn_new)) & active & (mlens >= 1)
        Sn_new = jnp.where(is_row_m & upd_snm, S_m_acc + ycs, Sn_new)
        Ly_new = jnp.where(is_row_m & upd_snm, nlens - j, Ly_new)
        S_col = jnp.where(is_row_m & ~m_in_band, MIN_I32, S_col)
        s_bits = jnp.where(is_row_m & ~m_in_band, TB_XCLIP_SUFFIX, s_bits)

        # host buffer replication: write mask + fringe resets on the
        # stale-parity base
        W = in_band | (row0 & r0_comp) | is_row_m
        R_pre = (rows == stj - 1) | is_row_m  # S-only m pre-reset
        R_post = (rows >= enj) & (rows < jnp.minimum(mlens + 1, enx))
        S_full = jnp.where(
            W, S_col, jnp.where(R_pre | R_post, MIN_I32, Ss_p)
        )
        W_id = in_band | (row0 & r0_comp)
        R_id = (rows == stj - 1) | R_post
        D_full = jnp.where(W_id, bestD, jnp.where(R_id, MIN_I32, Ds_p))
        I_col = jnp.where(W_id, bestI, jnp.where(R_id, MIN_I32, I_p))
        I_col = jnp.where(row0 & r0_comp, MIN_I32, I_col)  # I[curr][0]=MIN
        SB_col = jnp.where(W, s_bits, TB_START)

        # tb: i/d bits only where the cell was truly computed; the row-m
        # override writes s-bits only (host tb_set_s)
        tb_col = (
            jnp.where(W_id, i_bits, TB_START)
            | (jnp.where(W_id, d_bits, TB_START) << 4)
            | (SB_col << 8)
        ).astype(jnp.uint16)
        tb_out[k] = tb_col
        lx_out[k] = Lx_j

        keep = valid & active
        keep2 = jnp.broadcast_to(keep, (Mp1, BB))
        return (
            jnp.where(keep2, S_full, S_p),
            jnp.where(keep2, S_p, Ss_p),
            jnp.where(keep2, D_full, D_p),
            jnp.where(keep2, D_p, Ds_p),
            jnp.where(keep2, SB_col, SB_p),
            jnp.where(keep2, I_col, I_p),
            jnp.where(keep2, Sn_new, SN_p),
            jnp.where(keep2, Ly_new, LY_p),
            jnp.where(keep2, tb_col.astype(I32), TBK_p),
        )

    st = jax.lax.fori_loop(
        0, K, column,
        (S[:], Ss[:], D[:], Ds[:], SB[:], I[:], SN[:], LY[:], TBK[:]),
    )
    S[:], Ss[:], D[:], Ds[:], SB[:], I[:], SN[:], LY[:], TBK[:] = st

    @pl.when(c == n_chunks - 1)
    def _finish():
        sf_out[:] = S[:]
        if_out[:] = I[:]
        snf_out[:] = SN[:]
        lyf_out[:] = LY[:]
        tbk_out[:] = TBK[:]


def scan_banded_pallas_mp(xb, yb, mlens, nlens, pens8, starts, ends):
    """Banded custom scan (MatchParams).  ``starts``/``ends``: (B, N+1)
    int32 per-column band rows (host-rasterized, banded.py Band).  Returns
    (tb_cols (Np, Mp1, B) u16, lx_cols (Np, B) i32, S_f, I_f, Sn_f, Ly_f,
    tbk) — finals lane-major, like scan_custom_pallas_mp."""
    B, M = xb.shape
    N = yb.shape[1]
    block_b, K = _pick_block_global(B, M, N, n_state=70, stream_bytes=16)
    # Mosaic sublane rule: a (K, bb) streamed input block needs K % 8 == 0
    # unless K equals the full array dim
    if K < N:
        K = max(8, (K // 8) * 8)
    else:
        K = N
    Mp1 = M + 1
    n_chunks = -(-N // K)
    Np = n_chunks * K
    grid = (B // block_b, n_chunks)
    xt = jnp.transpose(xb.astype(I32), (1, 0))
    yt = jnp.transpose(yb.astype(I32), (1, 0))
    # columns 1..N streams; enx[j] = ends[min(n, j+1)] per lane
    stT = jnp.transpose(starts[:, 1:], (1, 0))
    enT = jnp.transpose(ends[:, 1:], (1, 0))
    jn = jnp.minimum(
        jnp.arange(1, N + 1, dtype=I32)[:, None] + 1, nlens[None, :]
    )
    enxT = jnp.take_along_axis(
        jnp.transpose(ends, (1, 0)), jn, axis=0
    )
    if Np != N:
        pad = ((0, Np - N), (0, 0))
        yt = jnp.pad(yt, pad)
        stT = jnp.pad(stT, pad, constant_values=M + 1)
        enT = jnp.pad(enT, pad)
        enxT = jnp.pad(enxT, pad)
    p8 = jnp.asarray(pens8, I32).reshape(8)
    pen = jnp.stack(
        [p8[0], p8[1], p8[6], p8[7], jnp.int32(N), p8[4], p8[5], p8[2], p8[3]]
    )
    fspec = lambda: pl.BlockSpec((Mp1, block_b), lambda b, c: (0, b))
    fshape = lambda: jax.ShapeDtypeStruct((Mp1, B), jnp.int32)
    out = pl.pallas_call(
        _kernel_scan_banded_mp,
        interpret=jax.default_backend() == "cpu",
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((M, block_b), lambda b, c: (0, b)),
            pl.BlockSpec((K, block_b), lambda b, c: (c, b)),
            pl.BlockSpec((K, block_b), lambda b, c: (c, b)),
            pl.BlockSpec((K, block_b), lambda b, c: (c, b)),
            pl.BlockSpec((K, block_b), lambda b, c: (c, b)),
            pl.BlockSpec((1, block_b), lambda b, c: (0, b)),
            pl.BlockSpec((1, block_b), lambda b, c: (0, b)),
            pl.BlockSpec((1, block_b), lambda b, c: (0, b)),
            pl.BlockSpec((1, block_b), lambda b, c: (0, b)),
        ],
        out_specs=[
            pl.BlockSpec((K, Mp1, block_b), lambda b, c: (c, 0, b)),
            pl.BlockSpec((K, 1, block_b), lambda b, c: (c, 0, b)),
            fspec(), fspec(), fspec(), fspec(), fspec(),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, Mp1, B), jnp.uint16),
            jax.ShapeDtypeStruct((Np, 1, B), jnp.int32),
            fshape(), fshape(), fshape(), fshape(), fshape(),
        ],
        scratch_shapes=[
            pltpu.VMEM((Mp1, block_b), jnp.int32) for _ in range(9)
        ],
    )(
        pen,
        xt,
        yt,
        stT,
        enT,
        enxT,
        starts[:, 0].reshape(1, B),
        ends[:, 0].reshape(1, B),
        mlens.reshape(1, B),
        nlens.reshape(1, B),
    )
    tb_cols, lx_cols, S_f, I_f, Sn_f, Ly_f, tbk = out
    tr = lambda a: jnp.transpose(a, (1, 0))
    return (
        tb_cols,
        lx_cols[:, 0, :],
        tr(S_f),
        tr(I_f),
        tr(Sn_f),
        tr(Ly_f),
        tr(tbk),
    )
