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
