"""Batched 14-state HomopolyPairHMM forward kernel on TPU.

TPU-native redesign of the reference's row-sequential forward pass
(homopolypairhmm.rs:246-420) for the standard sequencing emission model:
B (read, haplotype) pairs advance in lockstep; the x loop is a
``lax.scan``; within a row the 4 match states, GapY and the 4 hop-Y
states are fully vectorized over y, and the two in-row recurrences
(GapX and the 4 hop-X states) — first-order log-linear recurrences —
are solved with one stacked ``lax.associative_scan``.

Reference quirks replicated exactly:
- quarter initial mass over the 4 match states, mismatch emissions halved
  (separate match states), the GapX/GapY parameter crossing in the
  transition table (homopolypairhmm.rs:519-534);
- free-end-gap mode's per-CELL ``prob_cols`` accumulation
  (homopolypairhmm.rs:383-396): within row i the final-column entry read
  at inner step j < len_y-1 is the value computed two rows earlier (the
  rolling buffers only overwrite it at the last step), so each row
  contributes ``(len_y - 1)`` copies of the two-rows-ago column plus one
  fresh copy — evaluated here in closed form with a ``ln(len_y - 1)``
  shift instead of a j-loop.

Numerics: f32 log-space with exact logaddexp (the scalar oracle uses f64 +
fastexp; ~1e-3 relative agreement, property-tested). Pass jnp.float64
(with jax_enable_x64) for score-exact runs.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rust_bio_tpu.stats.pairhmm.device import NEG_INF, NEG_INF64, _lae
from rust_bio_tpu.stats.probs import LogProb

_BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def _ln1m(p: float) -> float:
    return float(LogProb(p).ln_one_minus_exp()) if p != float("-inf") else 0.0


def _lse_stack(arrs):
    """Exact ln-sum-exp over a list of same-shape arrays."""
    out = arrs[0]
    for a in arrs[1:]:
        out = _lae(out, a)
    return out


class BatchHomopolyPairHMM:
    """Batched forward probability for B pairs under the 14-state model.

    ``hop_*`` parameters may be scalars (uniform) or length-4 arrays
    (base-specific, A/C/G/T order), all in log space.
    """

    def __init__(
        self,
        prob_gap_x: float,
        prob_gap_y: float,
        prob_gap_x_extend: float,
        prob_gap_y_extend: float,
        prob_hop_x,
        prob_hop_y,
        prob_hop_x_extend,
        prob_hop_y_extend,
        dtype=jnp.float32,
    ) -> None:
        self.dtype = dtype
        self._neg = NEG_INF if dtype == jnp.float32 else NEG_INF64

        def vec4(v):
            a = np.asarray(v, np.float64).reshape(-1)
            return np.broadcast_to(a, (4,)).copy() if a.size == 1 else a

        hx, hy = vec4(prob_hop_x), vec4(prob_hop_y)
        hxe, hye = vec4(prob_hop_x_extend), vec4(prob_hop_y_extend)
        pgx, pgy = float(prob_gap_x), float(prob_gap_y)
        pgxe, pgye = float(prob_gap_x_extend), float(prob_gap_y_extend)

        # reference aggregates: mean hop prob over bases, then the match
        # self-transition soaks up the remainder (homopolypairhmm.rs:495+)
        ph_x = float(LogProb.ln_sum_exp(list(hx))) - np.log(4.0)
        ph_y = float(LogProb.ln_sum_exp(list(hy))) - np.log(4.0)
        match_any = _ln1m(float(LogProb.ln_sum_exp([pgy, pgx, ph_x, ph_y])))

        def fin(v):
            a = np.asarray(v, np.float64)
            neg = NEG_INF if dtype == jnp.float32 else NEG_INF64
            return np.where(np.isneginf(a), neg, a)

        self.p = {
            "match_any": fin(match_any),
            "pgx": fin(pgx),  # Match -> GapY   (reference crossing)
            "pgy": fin(pgy),  # Match -> GapX
            "pgxe": fin(pgxe),  # GapY self
            "pgye": fin(pgye),  # GapX self
            "from_gx": fin(_ln1m(pgye)),  # GapX -> Match
            "from_gy": fin(_ln1m(pgxe)),  # GapY -> Match
            "hx": fin(hx),
            "hy": fin(hy),
            "hxe": fin(hxe),
            "hye": fin(hye),
            "from_hx": fin([_ln1m(v) for v in hx]),
            "from_hy": fin([_ln1m(v) for v in hy]),
        }

    @partial(jax.jit, static_argnums=(0, 6))
    def _forward(self, xs, ys, xlens, ylens, emit_probs, semiglobal: bool):
        """xs (B,M) / ys (B,N) uint8 -> (B,) log-likelihoods.

        ``emit_probs``: (4,) or (B,4) [p_match, p_mismatch, p_emit_x,
        p_emit_y] log probs.
        """
        B, M = xs.shape
        N = ys.shape[1]
        FT = self.dtype
        NEG = self._neg
        p = {k: jnp.asarray(v, FT) for k, v in self.p.items()}
        ep = jnp.broadcast_to(jnp.asarray(emit_probs, FT), (B, 4))
        p_match, p_mismatch = ep[:, 0], ep[:, 1]
        pe_x, pe_y = ep[:, 2], ep[:, 3]
        ln2 = jnp.asarray(np.log(2.0), FT)
        quarter = jnp.asarray(np.log(0.25), FT)

        bases = jnp.asarray(_BASES)  # (4,)
        ey_gate = ys[:, None, :] == bases[None, :, None]  # (B, 4, N)
        eq_any = None  # computed per row

        def lse4(a):  # over axis 1 of (B, 4, ...) keeping other dims
            return _lse_stack([a[:, k] for k in range(4)])

        def row(carry, xi_i):
            (vm_p, vgx_p, vgy_p, vhx_p, vhy_p, col2, col1, acc) = carry
            xi, i = xi_i
            active = i < xlens  # (B,)

            if semiglobal:
                # free start gaps: psg = ln(1) each row, minus ln 4
                vm_p = vm_p.at[:, :, 0].set(
                    jnp.where(
                        active[:, None],
                        _lae(vm_p[:, :, 0], jnp.full((B, 4), -np.log(4.0), FT)),
                        vm_p[:, :, 0],
                    )
                )

            ex_gate = xi[:, None] == bases[None, :]  # (B, 4)
            gate = ex_gate[:, :, None] | ey_gate  # (B, 4, N)
            eq = xi[:, None] == ys  # (B, N)
            ep_m = jnp.where(
                eq, p_match[:, None], p_mismatch[:, None] - ln2
            )  # (B, N) same for all match states

            # shared inbound mass for the 4 match states (all transition
            # coefficients into a match state are state- not target-dep.)
            pre = _lse_stack(
                [p["match_any"] + lse4(vm_p[:, :, :-1])]
                + [p["from_gx"] + vgx_p[:, :-1], p["from_gy"] + vgy_p[:, :-1]]
                + [
                    p["from_hx"][b] + vhx_p[:, b, :-1]
                    for b in range(4)
                ]
                + [
                    p["from_hy"][b] + vhy_p[:, b, :-1]
                    for b in range(4)
                ]
            )  # (B, N)
            vm_c = jnp.where(
                gate, (ep_m + pre)[:, None, :], NEG
            )  # (B, 4, N) columns 1..N
            vm_c = jnp.concatenate([jnp.full((B, 4, 1), NEG, FT), vm_c], 2)

            # GapY (consumes x): prev row, same column
            vgy_in = _lae(
                p["pgx"] + lse4(vm_p[:, :, 1:]),
                p["pgxe"] + vgy_p[:, 1:],
            )
            vgy_c = jnp.concatenate(
                [jnp.full((B, 1), NEG, FT), pe_x[:, None] + vgy_in], 1
            )

            # hop-Y states: prev row, same column
            vhy_c = _lae(
                p["hy"][None, :, None] + vm_p[:, :, 1:],
                p["hye"][None, :, None] + vhy_p[:, :, 1:],
            )
            vhy_c = jnp.concatenate([jnp.full((B, 4, 1), NEG, FT), vhy_c], 2)

            # in-row recurrences: GapX + 4 hop-X states, one stacked scan
            # f[j] = logaddexp(A[j], Bc[j] + f[j-1])
            A_gx = pe_y[:, None] + p["pgy"] + lse4(vm_c[:, :, :-1])  # (B, N)
            B_gx = jnp.broadcast_to(pe_y[:, None] + p["pgye"], (B, N))
            A_hx = p["hx"][None, :, None] + vm_c[:, :, :-1]  # (B, 4, N)
            B_hx = jnp.broadcast_to(p["hxe"][None, :, None], (B, 4, N))
            A = jnp.concatenate([A_gx[:, None, :], A_hx], 1).reshape(B * 5, N)
            Bc = jnp.concatenate([B_gx[:, None, :], B_hx], 1).reshape(B * 5, N)

            def combine(l, r):
                a1, b1 = l
                a2, b2 = r
                return _lae(a2, b2 + a1), b1 + b2

            As, _ = jax.lax.associative_scan(combine, (A, Bc), axis=1)
            As = As.reshape(B, 5, N)
            vgx_c = jnp.concatenate(
                [jnp.full((B, 1), NEG, FT), As[:, 0]], 1
            )
            vhx_c = jnp.concatenate(
                [jnp.full((B, 4, 1), NEG, FT), As[:, 1:]], 2
            )

            # freeze lanes past their x length
            keep1 = active[:, None]
            keep2 = active[:, None, None]
            vm_n = jnp.where(keep2, vm_c, jnp.full((B, 4, N + 1), NEG, FT))
            vgx_n = jnp.where(keep1, vgx_c, vgx_p)
            vgy_n = jnp.where(keep1, vgy_c, vgy_p)
            vhx_n = jnp.where(keep2, vhx_c, vhx_p)
            vhy_n = jnp.where(keep2, vhy_c, vhy_p)
            # NOTE: frozen vm resets to NEG like the reference's per-row
            # match reset (global end reads the last ACTIVE row's values
            # via the accumulator below, not the frozen buffer)

            last = ylens[:, None]

            def col_at(vm, vgx, vgy, vhx, vhy):
                take1 = lambda a: jnp.take_along_axis(a, last, axis=1)[:, 0]
                take2 = lambda a: jnp.take_along_axis(
                    a, last[:, None, :].repeat(4, 1), axis=2
                )[:, :, 0]
                return jnp.concatenate(
                    [
                        take2(vm),
                        take1(vgx)[:, None],
                        take1(vgy)[:, None],
                        take2(vhx),
                        take2(vhy),
                    ],
                    axis=1,
                )  # (B, 14)

            fresh = col_at(vm_c, vgx_c, vgy_c, vhx_c, vhy_c)

            if semiglobal:
                # per-cell prob_cols quirk: (len_y - 1) stale copies of
                # the two-rows-ago column (match entries reset to -inf)
                # + 1 fresh copy, per active row
                stale = col2.at[:, 0:4].set(NEG)
                n_stale = jnp.maximum(ylens - 1, 0).astype(FT)[:, None]
                ln_nstale = jnp.where(
                    n_stale > 0, jnp.log(jnp.maximum(n_stale, 1.0)), NEG
                )
                row_mass = _lse_stack(
                    [_lse_stack([stale[:, s] + ln_nstale[:, 0] for s in range(14)])]
                    + [_lse_stack([fresh[:, s] for s in range(14)])]
                )
                acc = jnp.where(active, _lae(acc, row_mass), acc)
            else:
                row_mass = _lse_stack([fresh[:, s] for s in range(14)])
                acc = jnp.where(active, row_mass, acc)

            return (
                vm_n, vgx_n, vgy_n, vhx_n, vhy_n, col1, fresh, acc
            ), None

        vm0 = jnp.full((B, 4, N + 1), NEG, FT).at[:, :, 0].set(quarter)
        vgx0 = jnp.full((B, N + 1), NEG, FT)
        vgy0 = jnp.full((B, N + 1), NEG, FT)
        vhx0 = jnp.full((B, 4, N + 1), NEG, FT)
        vhy0 = jnp.full((B, 4, N + 1), NEG, FT)
        col0 = jnp.full((B, 14), NEG, FT)
        acc0 = jnp.full((B,), NEG, FT)

        (carry, _) = jax.lax.scan(
            row,
            (vm0, vgx0, vgy0, vhx0, vhy0, col0, col0, acc0),
            (jnp.swapaxes(xs, 0, 1), jnp.arange(M, dtype=jnp.int32)),
        )
        acc = carry[-1]
        return jnp.minimum(acc, 0.0)

    def prob_related_batch(
        self,
        xs,
        ys,
        emit_probs,
        semiglobal: bool = False,
        xlens: Optional[np.ndarray] = None,
        ylens: Optional[np.ndarray] = None,
    ) -> np.ndarray:
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
            bool(semiglobal),
        )
        return np.asarray(out, dtype=np.float64)
