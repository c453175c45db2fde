"""Batched POA scoring: B queries against one frozen partial-order graph.

TPU-native view of the reference's topological-order DP (poa.rs:498-576):
graph construction/extension (``add_alignment``) is inherently sequential
and stays on the host (alignment/poa.py), but the production-scale use —
scoring many reads against a built graph (consensus polishing, final
round-robin rescoring) — is a batch problem: all B queries advance
through one node-ordered ``lax.scan``; per node the predecessor rows are
gathered and reduced, and the in-row gap chain (linear gap model, like
the reference POA) is a (max,+) prefix scan.

Replicated quirks: root nodes take only the diagonal from row 0 (no gap
term, poa.py:205-206); column 0 of row i is ``i * gap_open`` with i the
NODE INDEX + 1, not the topological depth (poa.rs Traceback::new_row).
Global mode (all clips MIN_SCORE); scores equal
``poa.Aligner(scoring, ref).global_(q).alignment().score`` exactly.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rust_bio_tpu.alignment.pairwise.scoring import MIN_SCORE, MatchParams, Scoring
from rust_bio_tpu.utils.text import to_bytes

I32 = jnp.int32


@partial(jax.jit, static_argnums=(8,))
def _poa_scores_kernel(
    qb, qlens, topo, pred_rows, pred_mask, is_root, weights, pens, last_row: int
):
    B, L = qb.shape
    m = weights.shape[0]
    go, ma, mi = pens[0], pens[1], pens[2]
    Lp1 = L + 1
    cols = jnp.arange(Lp1, dtype=I32)

    # row 0: S[0][j] = j * go, S[0][0] = 0 (global clips)
    row0 = cols * go
    S0 = jnp.broadcast_to(row0[None, :], (B, Lp1))
    Smat = jnp.full((m + 1, B, Lp1), MIN_SCORE, I32).at[0].set(S0)

    def node_step(Smat, node):
        i = node + 1
        r = weights[node]
        prevs = pred_rows[node]  # (P,) matrix row indices of predecessors
        pmask = pred_mask[node]  # (P,)
        root = is_root[node]

        Srows = jnp.take(Smat, prevs, axis=0)  # (P, B, Lp1)
        Srows = jnp.where(pmask[:, None, None], Srows, MIN_SCORE)
        sub = jnp.where(qb == r, ma, mi)  # (B, L)

        diag = jnp.max(Srows[:, :, :-1], axis=0) + sub  # (B, L)
        gapv = jnp.max(Srows[:, :, 1:], axis=0) + go  # (B, L)

        # root quirk: only the diagonal from row 0, no gap/clip candidates
        diag_root = Smat[0, :, :-1] + sub
        max_cell = jnp.where(root, diag_root, jnp.maximum(diag, gapv))

        # in-row chain S[i][j] = max(max_cell[j], S[i][j-1] + go) with
        # S[i][0] = i * go, via (max,+) prefix scan
        C = jnp.concatenate(
            [jnp.full((B, 1), i * go, I32), max_cell], axis=1
        )  # (B, Lp1)
        U = C - cols[None, :] * go
        S_i = jax.lax.cummax(U, axis=1) + cols[None, :] * go

        return jax.lax.dynamic_update_slice(Smat, S_i[None], (i, 0, 0)), None

    Smat, _ = jax.lax.scan(node_step, Smat, topo)
    final_row = Smat[last_row]  # (B, Lp1)
    return jnp.take_along_axis(final_row, qlens[:, None], axis=1)[:, 0]


class BatchPoa:
    """Batch scorer over a frozen ``poa.Poa`` / ``poa.Aligner`` graph."""

    def __init__(self, scoring: Scoring, poa_or_aligner) -> None:
        poa = getattr(poa_or_aligner, "poa", poa_or_aligner)
        g = poa.graph
        mp = scoring.match_fn
        assert isinstance(mp, MatchParams), "device POA needs MatchParams"
        self.scoring = scoring
        topo = g.topo_order()
        m = g.node_count()
        P = max((len(g.incoming(v)) for v in range(m)), default=1) or 1
        pred_rows = np.zeros((m, P), np.int32)
        pred_mask = np.zeros((m, P), bool)
        is_root = np.zeros(m, bool)
        for v in range(m):
            ps = g.incoming(v)
            if not ps:
                is_root[v] = True
                continue
            for k, p in enumerate(ps):
                pred_rows[v, k] = p + 1
                pred_mask[v, k] = True
        self.topo = jnp.asarray(np.asarray(topo, np.int32))
        self.pred_rows = jnp.asarray(pred_rows)
        self.pred_mask = jnp.asarray(pred_mask)
        self.is_root = jnp.asarray(is_root)
        self.weights = jnp.asarray(np.asarray(g.weights, np.int32))
        self.last_row = int(topo[-1]) + 1
        self.pens = jnp.asarray(
            np.array(
                [scoring.gap_open, mp.match_score, mp.mismatch_score], np.int32
            )
        )

    def global_scores(self, queries: Sequence) -> np.ndarray:
        """(B,) global-mode alignment scores vs the graph."""
        qs = [to_bytes(q) for q in queries]
        B = len(qs)
        L = max((len(q) for q in qs), default=1) or 1
        qb = np.zeros((B, L), np.uint8)
        qlens = np.zeros(B, np.int32)
        for k, q in enumerate(qs):
            qb[k, : len(q)] = np.frombuffer(q, np.uint8)
            qlens[k] = len(q)
        out = _poa_scores_kernel(
            jnp.asarray(qb.astype(np.int32)),
            jnp.asarray(qlens),
            self.topo,
            self.pred_rows,
            self.pred_mask,
            self.is_root,
            self.weights,
            self.pens,
            self.last_row,
        )
        return np.asarray(out)
