"""Score-exact batched PairHMM forward on device.

``BatchPairHMMExact`` replicates the scalar oracle
(``stats/pairhmm/__init__.py`` ``PairHMM.prob_related``, itself a
statement-level twin of the reference ``pairhmm.rs:104-280``) operation for
operation in f64: the reference's fastexp approximation (bit-exact,
``utils/fastexp.fastexp_jax``), the ``ln_sum3_exp_approx`` 10-nat
max-dominance shortcut including its partial-sort tie semantics, the
``max_edit_dist`` banding with the oracle's stale-buffer behavior (only
``fm`` is cleared between rows; a skipped cell's ``fx/fy/med`` retain the
value from TWO rows earlier), and the free-end-gap column accumulation in
the oracle's exact summation order.

Exactness envelope (measured, documented in PARITY.md): every operation
matches the oracle except ``log1p``, where XLA and libm differ by <= 1 ULP
on ~25% of inputs, and TPU f64 arithmetic, which is software-emulated
(double-float, non-IEEE, ~1e-15/op).  Agreement with the f64 oracle is
therefore ~1e-13 relative on the reference bench inputs — about 10^10
tighter than the f32 throughput kernels and far inside the reference's own
test epsilons.  On identical-log1p backends the op sequence is identical
by construction.

Banding note: the integer ``med``/skip bookkeeping is pure int32/int64
arithmetic and IS bit-identical to the oracle on every backend; the
``skip_pattern`` debug output lets tests assert that directly.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rust_bio_tpu.utils.fastexp import fastexp_jax

NEG_INF = float("-inf")
# med saturation sentinel: stands in for the oracle's usize::MAX.  Values
# only ever feed min() and "> max_edit_dist" comparisons; growth is bounded
# by +1 per row so int64 never overflows and the ordering is preserved.
MED_SENT = np.int64(1) << 62


def _lae(a, b):
    """LogProb(a).ln_add_exp(b), vectorized (probs/mod.rs:196-220 order)."""
    p0 = jnp.maximum(a, b)
    p1 = jnp.minimum(a, b)
    diff = jnp.where(jnp.isfinite(p0), p1 - p0, 0.0)
    out = p0 + jnp.log1p(fastexp_jax(diff))
    out = jnp.where(p0 == jnp.inf, jnp.inf, out)
    out = jnp.where(p0 == -jnp.inf, -jnp.inf, out)
    return jnp.where(b == -jnp.inf, a, out)


def _ln_sum3_exp_approx(p0, p1, p2):
    """pairhmm.rs:26-40: partial sort, 10-nat shortcut, else ln_sum_exp
    with pmax = p0 (the sort guarantees imax == 0)."""
    # if p1 < p2: swap(p1, p2)
    s1 = p1 < p2
    q1 = jnp.where(s1, p2, p1)
    q2 = jnp.where(s1, p1, p2)
    # if q1 > p0: swap(p0, q1)
    s2 = q1 > p0
    r0 = jnp.where(s2, q1, p0)
    r1 = jnp.where(s2, p0, q1)
    # sum skipping index 0; -inf terms give fastexp == 0.0 exactly, which
    # is an f64 identity under +, matching the oracle's explicit skip
    s = fastexp_jax(r1 - r0) + fastexp_jax(q2 - r0)
    full = r0 + jnp.log1p(s)
    out = jnp.where(r0 - r1 > 10.0, r0, full)
    out = jnp.where(r0 == jnp.inf, jnp.inf, out)
    return jnp.where(r0 == -jnp.inf, -jnp.inf, out)


def _ln_sum_exp3(a, b, c):
    """LogProb.ln_sum_exp([a, b, c]) exactly: first-strict-max pmax, sum
    in index order skipping imax (adding 0.0 is an f64 identity)."""
    pmax = jnp.maximum(a, jnp.maximum(b, c))
    im2 = c > jnp.maximum(a, b)
    im1 = (~im2) & (b > a)
    im0 = (~im2) & (~im1)
    sa = jnp.where(im0, 0.0, fastexp_jax(a - pmax))
    sb = jnp.where(im1, 0.0, fastexp_jax(b - pmax))
    sc = jnp.where(im2, 0.0, fastexp_jax(c - pmax))
    s = (sa + sb) + sc
    out = pmax + jnp.log1p(s)
    out = jnp.where(pmax == jnp.inf, jnp.inf, out)
    return jnp.where(pmax == -jnp.inf, -jnp.inf, out)


def _ln_sum_exp_ordered(flat, pmax, first):
    """LogProb.ln_sum_exp over ``flat`` (K, B) in index order: sequential
    f64 accumulation (the oracle's ``s += fastexp(p - pmax)`` loop)."""
    K = flat.shape[0]

    def body(k, s):
        term = fastexp_jax(flat[k] - pmax)
        return s + jnp.where(k == first, 0.0, term)

    s = jax.lax.fori_loop(0, K, body, jnp.zeros_like(pmax))
    out = pmax + jnp.log1p(s)
    out = jnp.where(pmax == jnp.inf, jnp.inf, out)
    return jnp.where(pmax == -jnp.inf, -jnp.inf, out)


class BatchPairHMMExact:
    """Batched oracle-order f64 PairHMM forward (global + semiglobal,
    optional ``max_edit_dist`` banding).

    Constructor matches ``BatchPairHMM``: shared scalar gap log-probs.  The
    derived no-gap cache is computed HOST-side with the oracle's own
    ``LogProb`` arithmetic, so the scalars entering the device computation
    are bit-identical to the oracle's ``_GapParamCache``.
    """

    def __init__(
        self,
        prob_gap_x: float,
        prob_gap_y: float,
        prob_gap_x_extend: float,
        prob_gap_y_extend: float,
    ) -> None:
        from rust_bio_tpu.stats.pairhmm import (
            GapParameters,
            PairHMM,
        )

        class _G(GapParameters):
            def prob_gap_x(self):
                return prob_gap_x

            def prob_gap_y(self):
                return prob_gap_y

            def prob_gap_x_extend(self):
                return prob_gap_x_extend

            def prob_gap_y_extend(self):
                return prob_gap_y_extend

        self.g = PairHMM(_G()).gap_params  # oracle-computed cache

    @partial(
        jax.jit,
        static_argnums=(0,),
        static_argnames=("semiglobal", "max_edit_dist", "debug_skip"),
    )
    def _forward(
        self,
        xs,
        ys,
        xlens,
        ylens,
        emit_probs,
        semiglobal: bool,
        max_edit_dist: Optional[int] = None,
        debug_skip: bool = False,
    ):
        if not jax.config.jax_enable_x64:
            raise RuntimeError("BatchPairHMMExact requires jax_enable_x64")
        B, M = xs.shape
        N = ys.shape[1]
        F = jnp.float64
        g = self.g
        banded = max_edit_dist is not None
        K_ed = np.int64(max_edit_dist if banded else 0)

        ep = jnp.broadcast_to(jnp.asarray(emit_probs, F), (B, 3))
        p_match, p_mismatch, p_gap_emit = ep[:, 0], ep[:, 1], ep[:, 2]
        # reference bench model: prob_emit_x(i) == prob_emit_y(j) == the
        # gap-emission prob (scalar per lane)
        pex = p_gap_emit[:, None]
        pey = p_gap_emit[:, None]

        no_gap = jnp.asarray(g.prob_no_gap, F)
        ngxe = jnp.asarray(g.prob_no_gap_x_extend, F)
        ngye = jnp.asarray(g.prob_no_gap_y_extend, F)
        gx = jnp.asarray(g.prob_gap_x, F)
        gy = jnp.asarray(g.prob_gap_y, F)
        gxe = jnp.asarray(
            g.prob_gap_x_extend if g.do_gap_x_extend else NEG_INF, F
        )
        gye = jnp.asarray(
            g.prob_gap_y_extend if g.do_gap_y_extend else NEG_INF, F
        )
        start_gap = jnp.asarray(0.0 if semiglobal else NEG_INF, F)

        def med_row_scan(med_prev, med_stale, eq_row):
            """Banded skip mask + new med row: sequential over j (the
            in-row med_top dependence), pure integer ops — bit-identical
            to the oracle's bookkeeping."""

            def stp(med_top, ins):
                tl, left, stale_j, is_m = ins
                skip = jnp.minimum(jnp.minimum(tl, med_top), left) > K_ed
                m = jnp.where(is_m, tl, tl + 1)
                new_med = jnp.minimum(jnp.minimum(m, left + 1), med_top + 1)
                med_j = jnp.where(skip, stale_j, new_med)
                return med_j, (skip, med_j)

            ins = (
                jnp.swapaxes(med_prev[:, :-1], 0, 1),  # (N, B) topleft
                jnp.swapaxes(med_prev[:, 1:], 0, 1),  # left
                jnp.swapaxes(med_stale[:, 1:], 0, 1),  # stale
                jnp.swapaxes(eq_row, 0, 1),  # is_match
            )
            _, (skip, med_new) = jax.lax.scan(stp, med_stale[:, 0], ins)
            return (
                jnp.swapaxes(skip, 0, 1),  # (B, N)
                jnp.concatenate(
                    [med_stale[:, :1], jnp.swapaxes(med_new, 0, 1)], axis=1
                ),
            )

        def row(carry, xi_i):
            (
                fm_prev,
                fx_prev,
                fy_prev,
                fx_stale,
                fy_stale,
                med_prev,
                med_stale,
            ) = carry
            xi, i = xi_i
            active = i < xlens  # (B,)

            # fm[prev][0] = ln_add_exp(fm[prev][0], prob_start_gap_x(i))
            b0 = _lae(fm_prev[:, 0], start_gap)
            fm_prev = fm_prev.at[:, 0].set(
                jnp.where(active, b0, fm_prev[:, 0])
            )
            if banded and semiglobal:
                med_prev = med_prev.at[:, 0].set(
                    jnp.where(active, np.int64(0), med_prev[:, 0])
                )

            eq = xi[:, None] == ys  # (B, N)

            if banded:
                skip, med_curr = med_row_scan(med_prev, med_stale, eq)
            else:
                skip = jnp.zeros((B, N), bool)
                med_curr = med_stale

            emit_xy = jnp.where(eq, p_match[:, None], p_mismatch[:, None])

            # fm (prev-row only; oracle op order: emit + approx3(...))
            m_in = _ln_sum3_exp_approx(
                no_gap + fm_prev[:, :-1],
                ngxe + fx_prev[:, :-1],
                ngye + fy_prev[:, :-1],
            )
            fm_new = emit_xy + m_in
            fm_curr = jnp.concatenate(
                [
                    jnp.full((B, 1), NEG_INF, F),
                    jnp.where(skip, NEG_INF, fm_new),
                ],
                axis=1,
            )

            # fx (prob_gap_y): prev-row only
            fx_new = pex + (gy + fm_prev[:, 1:])
            if g.do_gap_y_extend:
                fx_new = _lae(fx_new, gye + fx_prev[:, 1:])
            fx_curr = jnp.concatenate(
                [
                    fx_stale[:, :1],
                    jnp.where(skip, fx_stale[:, 1:], fx_new),
                ],
                axis=1,
            )

            # fy (prob_gap_x): uses fm[curr][j-1] AFTER this row's writes
            if not g.do_gap_x_extend:
                fy_new = pey + (gx + fm_curr[:, :-1])
                fy_curr = jnp.concatenate(
                    [
                        fy_stale[:, :1],
                        jnp.where(skip, fy_stale[:, 1:], fy_new),
                    ],
                    axis=1,
                )
            else:
                # in-row f64 dependence: sequential scan over j in the
                # oracle's evaluation order
                def stp(fy_jm1, ins):
                    fmc_jm1, stale_j, skip_j, pey_b = ins
                    v = pey_b + (gx + fmc_jm1)
                    v = _lae(v, gxe + fy_jm1)
                    fy_j = jnp.where(skip_j, stale_j, v)
                    return fy_j, fy_j

                ins = (
                    jnp.swapaxes(fm_curr[:, :-1], 0, 1),
                    jnp.swapaxes(fy_stale[:, 1:], 0, 1),
                    jnp.swapaxes(skip, 0, 1),
                    jnp.broadcast_to(p_gap_emit, (N, B)),
                )
                _, fy_cols = jax.lax.scan(stp, fy_stale[:, 0], ins)
                fy_curr = jnp.concatenate(
                    [fy_stale[:, :1], jnp.swapaxes(fy_cols, 0, 1)], axis=1
                )

            # per-row free-end-gap accumulation values (at each lane's N)
            last = ylens[:, None]
            ends = jnp.stack(
                [
                    jnp.take_along_axis(fm_curr, last, axis=1)[:, 0],
                    jnp.take_along_axis(fx_curr, last, axis=1)[:, 0],
                    jnp.take_along_axis(fy_curr, last, axis=1)[:, 0],
                ]
            )  # (3, B)
            ends = jnp.where(active[None, :], ends, NEG_INF)

            keep = active[:, None]
            keep_i = keep
            out_carry = (
                jnp.where(keep, fm_curr, fm_prev),
                jnp.where(keep, fx_curr, fx_prev),
                jnp.where(keep, fy_curr, fy_prev),
                jnp.where(keep, fx_prev, fx_stale),
                jnp.where(keep, fy_prev, fy_stale),
                jnp.where(keep_i, med_curr, med_prev),
                jnp.where(keep_i, med_prev, med_stale),
            )
            ys_out = (ends, skip) if debug_skip else (ends,)
            return out_carry, ys_out

        neg = jnp.full((B, N + 1), NEG_INF, F)
        fm0 = neg.at[:, 0].set(0.0)
        sent = jnp.full((B, N + 1), MED_SENT, jnp.int64)
        carry0 = (fm0, neg, neg, neg, neg, sent, sent)

        carry, ys_out = jax.lax.scan(
            row,
            carry0,
            (jnp.swapaxes(xs, 0, 1), jnp.arange(M, dtype=jnp.int32)),
        )
        ends_rows = ys_out[0]  # (M, 3, B)
        fm_f, fx_f, fy_f = carry[0], carry[1], carry[2]

        if semiglobal:
            flat = ends_rows.reshape(M * 3, B)
            pmax = flat.max(axis=0)
            first = jnp.argmax(flat == pmax[None, :], axis=0)
            p = _ln_sum_exp_ordered(flat, pmax, first)
        else:
            last = ylens[:, None]
            p = _ln_sum_exp3(
                jnp.take_along_axis(fm_f, last, axis=1)[:, 0],
                jnp.take_along_axis(fx_f, last, axis=1)[:, 0],
                jnp.take_along_axis(fy_f, last, axis=1)[:, 0],
            )
        p = jnp.where(p > 0.0, 0.0, p)
        if debug_skip:
            return p, ys_out[1]
        return p

    def prob_related_batch(
        self,
        xs,
        ys,
        emit_probs,
        semiglobal: bool = False,
        max_edit_dist: Optional[int] = None,
        xlens: Optional[np.ndarray] = None,
        ylens: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """Oracle-order log-likelihoods for a padded (B, M)/(B, N) batch.

        ``emit_probs``: [ln p_match, ln p_mismatch, ln p_gap_emit], shared
        or (B, 3).  Requires ``jax.config.update("jax_enable_x64", True)``.
        """
        xs = np.asarray(xs, dtype=np.uint8)
        ys = np.asarray(ys, dtype=np.uint8)
        B, M = xs.shape
        N = ys.shape[1]
        if xlens is None:
            xlens = np.full(B, M, dtype=np.int32)
        if ylens is None:
            ylens = np.full(B, N, dtype=np.int32)
        out = self._forward(
            jnp.asarray(xs),
            jnp.asarray(ys),
            jnp.asarray(xlens, dtype=jnp.int32),
            jnp.asarray(ylens, dtype=jnp.int32),
            jnp.asarray(emit_probs, dtype=jnp.float64),
            semiglobal=bool(semiglobal),
            max_edit_dist=max_edit_dist,
        )
        return np.asarray(out, dtype=np.float64)
