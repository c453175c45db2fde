"""Batched PairHMM forward kernel on TPU.

TPU-native redesign of the reference's column-sequential forward pass
(pairhmm.rs:104-280): B (read, haplotype) pairs advance in lockstep through
the DP; the x loop is a ``lax.scan``; within a row the M and X states are
fully vectorized over y, and the Y state's in-row dependency
``fy[j] = logaddexp(A[j], B + fy[j-1])`` — a first-order log-linear
recurrence — is solved with ``lax.associative_scan`` (log-domain linear
recurrences compose associatively), so no scalar inner loop remains.

Numerics: f32 log-space with exact ``logaddexp`` (the reference uses f64 +
a fastexp approximation + a 10-nat max-dominance shortcut; agreement is
~1e-3 relative, property-tested against the scalar oracle). Boundary
quirks of the reference are replicated exactly: the ``ln(2)`` j=0 boundary
on the first row in semiglobal mode, the never-written ``fx/fy`` column 0,
and the per-row free-end-gap column accumulation.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

F32 = jnp.float32
NEG_INF = -3.0e38  # f32-safe -inf surrogate (finite to avoid nan in adds)
NEG_INF64 = -1.0e308


def _lae(a, b):
    """logaddexp that tolerates the NEG_INF surrogate."""
    neg = NEG_INF if a.dtype == jnp.float32 else NEG_INF64
    clamp = -87.0 if a.dtype == jnp.float32 else -700.0
    hi = jnp.maximum(a, b)
    lo = jnp.minimum(a, b)
    out = hi + jnp.log1p(jnp.exp(jnp.maximum(lo - hi, clamp)))
    return jnp.where(lo <= neg / 2, hi, out)


def _lae3(a, b, c):
    return _lae(_lae(a, b), c)


class BatchPairHMM:
    """Batched forward probability for B sequence pairs.

    Gap parameters are shared scalars (log space); emissions use the
    standard sequencing model: per-lane match/mismatch/gap emission probs.
    """

    def __init__(
        self,
        prob_gap_x: float,
        prob_gap_y: float,
        prob_gap_x_extend: float,
        prob_gap_y_extend: float,
        dtype=jnp.float32,
    ) -> None:
        # f32 is the throughput mode (~1e-3 agreement with the f64 oracle);
        # pass jnp.float64 (with jax_enable_x64) for score-exact runs
        self.dtype = dtype
        self._neg = NEG_INF if dtype == jnp.float32 else NEG_INF64
        def ln1m(p):
            return float(np.log1p(-np.exp(p))) if p != float("-inf") else 0.0

        gx, gy = float(prob_gap_x), float(prob_gap_y)
        self.g = dict(
            no_gap=float(np.log1p(-(np.exp(gx) + np.exp(gy)))),
            no_gap_x_extend=ln1m(float(prob_gap_x_extend)),
            no_gap_y_extend=ln1m(float(prob_gap_y_extend)),
            gap_x=gx,
            gap_y=gy,
            gap_x_extend=float(prob_gap_x_extend)
            if prob_gap_x_extend != float("-inf")
            else NEG_INF,
            gap_y_extend=float(prob_gap_y_extend)
            if prob_gap_y_extend != float("-inf")
            else NEG_INF,
        )

    @partial(jax.jit, static_argnums=(0, 7))
    def _forward(self, xs, ys, xlens, ylens, emit_probs, _unused, semiglobal: bool):
        """xs (B,M) uint8, ys (B,N) uint8 → (B,) f32 log-likelihoods.

        emit_probs: (3,) or (B,3) [match, mismatch, gap_emit] log probs.
        """
        B, M = xs.shape
        N = ys.shape[1]
        FT = self.dtype
        NEG = self._neg
        g = {k: jnp.asarray(v, FT) for k, v in self.g.items()}
        ep = jnp.broadcast_to(jnp.asarray(emit_probs, FT), (B, 3))
        p_match, p_mismatch, p_gap_emit = ep[:, 0], ep[:, 1], ep[:, 2]

        j_ = jnp.arange(N + 1, dtype=jnp.int32)  # 0..N

        def row(carry, xi_i):
            fm_prev, fx_prev, fy_prev, acc = carry
            xi, i = xi_i  # xi: (B,) symbol; i: scalar row index
            active = i < xlens  # (B,)

            if semiglobal:
                bound = jnp.where(i == 0, jnp.asarray(np.log(2.0), FT), jnp.asarray(0.0, FT))
                fm_prev = fm_prev.at[:, 0].set(
                    jnp.where(active, bound, fm_prev[:, 0])
                )

            # emissions for this row against every y position
            eq = xs[jnp.arange(B), jnp.minimum(i, M - 1)][:, None] == ys  # (B,N)
            emit_xy = jnp.where(eq, p_match[:, None], p_mismatch[:, None])

            # M state (vectorized over j): depends only on prev column j-1
            m_in = _lae3(
                g["no_gap"] + fm_prev[:, :-1],
                g["no_gap_x_extend"] + fx_prev[:, :-1],
                g["no_gap_y_extend"] + fy_prev[:, :-1],
            )
            fm_curr = jnp.concatenate(
                [jnp.full((B, 1), NEG, FT), emit_xy + m_in], axis=1
            )

            # X state (gap in y, consumes x): prev column same j
            fx_in = _lae(
                g["gap_y"] + fm_prev[:, 1:],
                g["gap_y_extend"] + fx_prev[:, 1:],
            )
            fx_curr = jnp.concatenate(
                [jnp.full((B, 1), NEG, FT), p_gap_emit[:, None] + fx_in],
                axis=1,
            )

            # Y state (gap in x, consumes y): in-row linear recurrence
            # fy[j] = logaddexp(A[j], Bc + fy[j-1]),  fy[0] = -inf
            A = p_gap_emit[:, None] + g["gap_x"] + fm_curr[:, :-1]  # (B,N)
            Bc = p_gap_emit[:, None] + jnp.broadcast_to(
                g["gap_x_extend"], (B, N)
            )

            def combine(l, r):
                a1, b1 = l
                a2, b2 = r
                return _lae(a2, b2 + a1), b1 + b2

            As, _ = jax.lax.associative_scan(combine, (A, Bc), axis=1)
            fy_curr = jnp.concatenate(
                [jnp.full((B, 1), NEG, FT), As], axis=1
            )

            # freeze lanes past their length
            keep = active[:, None]
            fm_n = jnp.where(keep, fm_curr, fm_prev)
            fx_n = jnp.where(keep, fx_curr, fx_prev)
            fy_n = jnp.where(keep, fy_curr, fy_prev)

            if semiglobal:
                last = ylens[:, None]
                ends = (
                    jnp.take_along_axis(fm_curr, last, axis=1)[:, 0],
                    jnp.take_along_axis(fx_curr, last, axis=1)[:, 0],
                    jnp.take_along_axis(fy_curr, last, axis=1)[:, 0],
                )
                row_p = _lae3(*ends)
                acc = jnp.where(active, _lae(acc, row_p), acc)

            return (fm_n, fx_n, fy_n, acc), None

        fm0 = jnp.full((B, N + 1), NEG, FT).at[:, 0].set(0.0)
        fx0 = jnp.full((B, N + 1), NEG, FT)
        fy0 = jnp.full((B, N + 1), NEG, FT)
        acc0 = jnp.full((B,), NEG, FT)

        (fm, fx, fy, acc), _ = jax.lax.scan(
            row,
            (fm0, fx0, fy0, acc0),
            (jnp.swapaxes(xs, 0, 1), jnp.arange(M, dtype=jnp.int32)),
        )

        if semiglobal:
            p = acc
        else:
            last = ylens[:, None]
            p = _lae3(
                jnp.take_along_axis(fm, last, axis=1)[:, 0],
                jnp.take_along_axis(fx, last, axis=1)[:, 0],
                jnp.take_along_axis(fy, last, axis=1)[:, 0],
            )
        return jnp.minimum(p, 0.0)

    def prob_related_batch(
        self,
        xs,
        ys,
        emit_probs,
        semiglobal: bool = False,
        xlens: Optional[np.ndarray] = None,
        ylens: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """Log-likelihoods for a padded pair batch.

        ``emit_probs``: [ln p_match, ln p_mismatch, ln p_gap_emit], shared or
        per-lane (B, 3).
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
            jnp.asarray(emit_probs, dtype=self.dtype),
            None,
            bool(semiglobal),
        )
        return np.asarray(out, dtype=np.float64)


class BatchPairHMMLinear(BatchPairHMM):
    """Scaled linear-space forward (GATK-style): transitions/emissions as
    probabilities, per-row rescaling against under/overflow, the Y-state
    in-row recurrence as a plain (mul, add) ``associative_scan``.

    ~20x the log-space kernel's throughput (no transcendentals in the hot
    loop — one log per row for the scale accumulator); agreement with the
    f64 scalar oracle is the same ~1e-3 relative as the f32 log kernel
    (property-tested). Same constructor and ``prob_related_batch`` API.
    """

    @partial(jax.jit, static_argnums=(0, 7))
    def _forward(self, xs, ys, xlens, ylens, emit_probs, _unused, semiglobal: bool):
        B, M = xs.shape
        N = ys.shape[1]
        FT = jnp.float32

        g = {k: jnp.exp(jnp.asarray(np.float32(v), FT)) for k, v in self.g.items()}
        ep = jnp.broadcast_to(jnp.asarray(emit_probs, FT), (B, 3))
        p_match = jnp.exp(ep[:, 0])
        p_mismatch = jnp.exp(ep[:, 1])
        p_gap_emit = jnp.exp(ep[:, 2])

        def row(carry, xi_i):
            fm_prev, fx_prev, fy_prev, acc, logscale = carry
            xi, i = xi_i
            active = i < xlens

            if semiglobal:
                # ln(2) boundary quirk: probability 2 at j=0 on row 0,
                # probability 1 afterwards — but ONLY while unscaled mass;
                # under scaling the boundary must be in current row units
                unit = jnp.exp(-logscale)  # prob 1.0 in scaled units
                bound = jnp.where(i == 0, 2.0 * unit, unit)
                fm_prev = fm_prev.at[:, 0].set(
                    jnp.where(active, bound, fm_prev[:, 0])
                )

            eq = xs[jnp.arange(B), jnp.minimum(i, M - 1)][:, None] == ys
            emit_xy = jnp.where(eq, p_match[:, None], p_mismatch[:, None])

            m_in = (
                g["no_gap"] * fm_prev[:, :-1]
                + g["no_gap_x_extend"] * fx_prev[:, :-1]
                + g["no_gap_y_extend"] * fy_prev[:, :-1]
            )
            fm_curr = jnp.concatenate(
                [jnp.zeros((B, 1), FT), emit_xy * m_in], axis=1
            )

            fx_in = (
                g["gap_y"] * fm_prev[:, 1:]
                + g["gap_y_extend"] * fx_prev[:, 1:]
            )
            fx_curr = jnp.concatenate(
                [jnp.zeros((B, 1), FT), p_gap_emit[:, None] * fx_in], axis=1
            )

            # fy[j] = A[j] + Bc * fy[j-1] -> (mul, add) associative scan
            A = p_gap_emit[:, None] * g["gap_x"] * fm_curr[:, :-1]
            Bc = jnp.broadcast_to(
                p_gap_emit[:, None] * g["gap_x_extend"], (B, N)
            )

            def combine(l, r):
                a1, b1 = l
                a2, b2 = r
                return a2 + b2 * a1, b1 * b2

            As, _ = jax.lax.associative_scan(combine, (A, Bc), axis=1)
            fy_curr = jnp.concatenate([jnp.zeros((B, 1), FT), As], axis=1)

            keep = active[:, None]
            fm_n = jnp.where(keep, fm_curr, fm_prev)
            fx_n = jnp.where(keep, fx_curr, fx_prev)
            fy_n = jnp.where(keep, fy_curr, fy_prev)

            if semiglobal:
                last = ylens[:, None]
                row_p = (
                    jnp.take_along_axis(fm_curr, last, axis=1)[:, 0]
                    + jnp.take_along_axis(fx_curr, last, axis=1)[:, 0]
                    + jnp.take_along_axis(fy_curr, last, axis=1)[:, 0]
                )
                acc = jnp.where(active, acc + row_p, acc)
                # acc lives in the CURRENT scale; rescaling below divides
                # it together with the state rows

            # per-row rescale: keep the max state magnitude near 1
            mx = jnp.maximum(
                jnp.max(fm_n, axis=1),
                jnp.maximum(jnp.max(fx_n, axis=1), jnp.max(fy_n, axis=1)),
            )
            mx = jnp.maximum(mx, 1e-30)
            scale = jnp.where(active, mx, 1.0)[:, None]
            fm_n = fm_n / scale
            fx_n = fx_n / scale
            fy_n = fy_n / scale
            acc = acc / scale[:, 0]
            logscale = logscale + jnp.log(scale[:, 0])

            return (fm_n, fx_n, fy_n, acc, logscale), None

        fm0 = jnp.zeros((B, N + 1), FT).at[:, 0].set(1.0)
        fx0 = jnp.zeros((B, N + 1), FT)
        fy0 = jnp.zeros((B, N + 1), FT)
        acc0 = jnp.zeros((B,), FT)
        ls0 = jnp.zeros((B,), FT)

        (fm, fx, fy, acc, logscale), _ = jax.lax.scan(
            row,
            (fm0, fx0, fy0, acc0, ls0),
            (jnp.swapaxes(xs, 0, 1), jnp.arange(M, dtype=jnp.int32)),
        )

        if semiglobal:
            p_lin = acc
        else:
            last = ylens[:, None]
            p_lin = (
                jnp.take_along_axis(fm, last, axis=1)[:, 0]
                + jnp.take_along_axis(fx, last, axis=1)[:, 0]
                + jnp.take_along_axis(fy, last, axis=1)[:, 0]
            )
        p = jnp.where(
            p_lin > 0, jnp.log(jnp.maximum(p_lin, 1e-38)) + logscale, NEG_INF
        )
        return jnp.minimum(p, 0.0)


    def prob_related_batch(
        self,
        xs,
        ys,
        emit_probs,
        semiglobal: bool = False,
        xlens=None,
        ylens=None,
    ) -> np.ndarray:
        """Hybrid: the scaled linear pass covers the dominant-path regime
        (read vs candidate haplotype); lanes whose probability underflows
        f32 relative to the per-row maximum (≳1e-38 dynamic range, i.e.
        heavily divergent pairs) are recomputed with the exact log-space
        kernel, so results are always correct."""
        xs = np.asarray(xs, dtype=np.uint8)
        ys = np.asarray(ys, dtype=np.uint8)
        B, M = xs.shape
        N = ys.shape[1]
        if xlens is None:
            xlens = np.full(B, M, dtype=np.int32)
        if ylens is None:
            ylens = np.full(B, N, dtype=np.int32)
        ep = np.asarray(emit_probs, np.float64).reshape(-1)
        if ep.size == 3:
            # shared emissions: VMEM-resident Pallas kernel (pad to lanes)
            from rust_bio_tpu.ops.pairhmm_pallas import pairhmm_fwd_scaled

            padb = -B % 256
            xs_p = np.pad(xs, ((0, padb), (0, 0)))
            ys_p = np.pad(ys, ((0, padb), (0, 0)))
            xl_p = np.pad(xlens, (0, padb), constant_values=1)
            yl_p = np.pad(ylens, (0, padb), constant_values=1)
            g = self.g
            params = np.exp(
                np.array(
                    [
                        g["no_gap"], g["no_gap_x_extend"], g["no_gap_y_extend"],
                        g["gap_x"], g["gap_y"], g["gap_x_extend"],
                        g["gap_y_extend"], ep[0], ep[1], ep[2],
                    ],
                    np.float64,
                ).clip(min=-700)
            ).astype(np.float32)
            out = np.asarray(
                pairhmm_fwd_scaled(
                    jnp.asarray(xs_p), jnp.asarray(ys_p),
                    jnp.asarray(xl_p), jnp.asarray(yl_p),
                    params, bool(semiglobal),
                ),
                dtype=np.float64,
            )[:B]
        else:
            out = np.asarray(
                self._forward(
                    jnp.asarray(xs), jnp.asarray(ys),
                    jnp.asarray(xlens, jnp.int32), jnp.asarray(ylens, jnp.int32),
                    jnp.asarray(emit_probs, jnp.float32), None, bool(semiglobal),
                ),
                dtype=np.float64,
            )
        fell = out <= NEG_INF / 2
        if fell.any():
            sub = np.nonzero(fell)[0]
            exact = BatchPairHMM._forward(
                self,
                jnp.asarray(xs[sub]), jnp.asarray(ys[sub]),
                jnp.asarray(xlens[sub], jnp.int32),
                jnp.asarray(ylens[sub], jnp.int32),
                jnp.asarray(emit_probs, jnp.float32), None, bool(semiglobal),
            )
            out[sub] = np.asarray(exact, np.float64)
        return out
