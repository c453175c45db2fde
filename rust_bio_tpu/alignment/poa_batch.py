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


def _poa_forward(qb, topo, pred_rows, pred_mask, is_root, weights, pens):
    """Full score matrix (m+1, B, L+1) of the reference's topological DP
    (poa.rs:498-567, global clips): every cell equals the host oracle's
    ``Traceback.get`` exactly — the device walk gathers arbitrary cells."""
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
    return Smat


@partial(jax.jit, static_argnums=(8,))
def _poa_scores_kernel(
    qb, qlens, topo, pred_rows, pred_mask, is_root, weights, pens, last_row: int
):
    Smat = _poa_forward(qb, topo, pred_rows, pred_mask, is_root, weights, pens)
    final_row = Smat[last_row]  # (B, Lp1)
    return jnp.take_along_axis(final_row, qlens[:, None], axis=1)[:, 0]


# walk op codes (host decode maps these to poa.Op objects)
_W_NONE, _W_MATCH, _W_DEL, _W_INS, _W_MATCH_ROOT = 0, 1, 2, 3, 4


@partial(jax.jit, static_argnums=(8,))
def _poa_align_kernel(
    qb, qlens, topo, pred_rows, pred_mask, is_root, weights, pens, last_row: int
):
    """Forward DP + lockstep score-difference traceback of the reference's
    ``recalculate_alignment`` (poa.rs:643-826) in global mode (all clips
    MIN_SCORE: the clip branches are statically dead).

    Replicated tie-break order, per walk step:
      1. the in-row Ins (``jump_left``) is checked FIRST and wins on
         equality (poa.rs:700-704 / poa.py:319-323);
      2. otherwise predecessors are scanned in ``incoming()`` order and
         the LAST one whose Del-then-diag if/elif chain fires supplies
         the op (each iteration overwrites, poa.rs:705-737);
      3. root nodes take the diagonal from row 0 (MatchOp(None)).
    The walk breaks when the PRE-move node is a root or the POST-move
    query index is 0 (poa.rs:777-812); trailing Ins*q / Del ops are
    appended host-side from the recorded (cause, q_final).

    Returns (scores (B,), opcodes (S, B) u8, cur_node (S, B) u16,
    next_node (S, B) u16, cause (B,) u8 [1=root, 2=q0], q_final (B,)).
    """
    B, L = qb.shape
    m = weights.shape[0]
    Lp1 = L + 1
    go, ma, mi = pens[0], pens[1], pens[2]
    P = pred_rows.shape[1]
    S = m + L + 2  # every step decreases node-rank or query index

    Smat = _poa_forward(qb, topo, pred_rows, pred_mask, is_root, weights, pens)
    scores = jnp.take_along_axis(Smat[last_row], qlens[:, None], axis=1)[:, 0]

    flat = Smat.reshape(-1)
    bidx = jnp.arange(B, dtype=I32)

    def g(r, c):
        """Smat[r, b, c] for per-lane (and optionally per-pred) indices."""
        if r.ndim == 2:  # (B, P)
            return jnp.take(
                flat, r * (B * Lp1) + bidx[:, None] * Lp1 + c, axis=0
            )
        return jnp.take(flat, r * (B * Lp1) + bidx * Lp1 + c, axis=0)

    ks = jnp.arange(P, dtype=I32)

    def body(carry):
        t, node, q, done, cause, qfin, ops, n1s, n2s = carry
        qm1 = jnp.maximum(q - 1, 0)
        nz = jnp.maximum(node - 1, 0)  # node id (0-based), clamped for done
        cur = g(node, q)
        ins_hit = cur == g(node, qm1) + go
        root = is_root[nz]
        pr = pred_rows[nz]  # (B, P) predecessor matrix rows (p + 1)
        pm = pred_mask[nz]
        top = g(pr, q[:, None])
        diag = g(pr, qm1[:, None])
        delk = pm & (cur[:, None] == top + go)
        diagk = (
            pm
            & ~delk
            & ((cur[:, None] == diag + mi) | (cur[:, None] == diag + ma))
        )
        kidx = jnp.max(jnp.where(delk | diagk, ks[None, :], -1), axis=1)
        kcl = jnp.maximum(kidx, 0)[:, None]
        is_del = jnp.take_along_axis(delk, kcl, axis=1)[:, 0] & (kidx >= 0)
        pnode = jnp.take_along_axis(pr, kcl, axis=1)[:, 0]

        opcode = jnp.where(
            ins_hit,
            _W_INS,
            jnp.where(
                root, _W_MATCH_ROOT, jnp.where(is_del, _W_DEL, _W_MATCH)
            ),
        ).astype(jnp.uint8)
        next_node = jnp.where(ins_hit, node, jnp.where(root, 1, pnode))
        next_q = jnp.where(ins_hit | root | ~is_del, q - 1, q)

        act = done == 0
        ops = jax.lax.dynamic_update_slice(
            ops, jnp.where(act, opcode, 0)[None], (t, 0)
        )
        n1s = jax.lax.dynamic_update_slice(
            n1s, jnp.where(act, node, 0).astype(jnp.uint16)[None], (t, 0)
        )
        n2s = jax.lax.dynamic_update_slice(
            n2s, jnp.where(act, next_node, 0).astype(jnp.uint16)[None], (t, 0)
        )
        now_done = act & (root | (next_q == 0))
        cause = jnp.where(now_done, jnp.where(root, 1, 2), cause).astype(
            jnp.uint8
        )
        qfin = jnp.where(now_done, next_q, qfin)
        node = jnp.where(act, next_node, node)
        q = jnp.where(act, jnp.maximum(next_q, 0), q)
        done = (done | now_done.astype(jnp.int32)).astype(jnp.int32)
        return t + 1, node, q, done, cause, qfin, ops, n1s, n2s

    def cond(carry):
        t, _, _, done, *_ = carry
        return (t < S) & jnp.any(done == 0)

    init = (
        jnp.int32(0),
        jnp.full((B,), last_row, I32),
        qlens.astype(I32),
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((B,), jnp.uint8),
        jnp.zeros((B,), I32),
        jnp.zeros((S, B), jnp.uint8),
        jnp.zeros((S, B), jnp.uint16),
        jnp.zeros((S, B), jnp.uint16),
    )
    _, _, _, _, cause, qfin, ops, n1s, n2s = jax.lax.while_loop(
        cond, body, init
    )
    return scores, ops, n1s, n2s, cause, qfin


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
        qb, qlens = self._pack(queries)
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

    def _pack(self, queries: Sequence):
        qs = [to_bytes(q) for q in queries]
        B = len(qs)
        L = max((len(q) for q in qs), default=1) or 1
        qb = np.zeros((B, L), np.uint8)
        qlens = np.zeros(B, np.int32)
        for k, q in enumerate(qs):
            qb[k, : len(q)] = np.frombuffer(q, np.uint8)
            qlens[k] = len(q)
        return qb, qlens

    def global_alignments(self, queries: Sequence):
        """Full global-mode ``PoaAlignment`` objects (score + operations)
        for B queries vs the frozen graph — op lists identical to the
        host oracle's ``Aligner.global_(q).alignment()`` (the reference's
        recalculate_alignment, poa.rs:643-826): forward DP and the
        score-difference traceback both run on device in ONE dispatch;
        the host decodes the pulled (op, node, next) step records."""
        from rust_bio_tpu.alignment.poa import (
            DelOp,
            InsOp,
            MatchOp,
            PoaAlignment,
        )

        qb, qlens = self._pack(queries)
        assert qlens.min() >= 1, "empty queries are not supported"
        scores, ops, n1s, n2s, cause, qfin = jax.tree.map(
            np.asarray,
            _poa_align_kernel(
                jnp.asarray(qb.astype(np.int32)),
                jnp.asarray(qlens),
                self.topo,
                self.pred_rows,
                self.pred_mask,
                self.is_root,
                self.weights,
                self.pens,
                self.last_row,
            ),
        )
        B = qb.shape[0]
        out = []
        opsT, n1T, n2T = ops.T, n1s.T, n2s.T  # (B, S)
        for b in range(B):
            oc, n1, n2 = opsT[b], n1T[b], n2T[b]
            n = int(np.argmax(oc == _W_NONE)) if (oc == _W_NONE).any() else len(oc)
            lst = []
            for t in range(n):
                c = oc[t]
                if c == _W_MATCH:
                    lst.append(MatchOp((int(n2[t]) - 1, int(n1[t]) - 1)))
                elif c == _W_MATCH_ROOT:
                    lst.append(MatchOp(None))
                elif c == _W_DEL:
                    lst.append(DelOp(None))
                else:
                    lst.append(InsOp(int(n1[t]) - 1))
            # trailing ops at the break (poa.rs:790-812, global clips)
            if cause[b] == 1:  # pre-move node was a root
                lst.extend(InsOp(None) for _ in range(int(qfin[b])))
            else:  # query exhausted at a non-root node
                lst.append(DelOp(None))
            lst.reverse()
            out.append(PoaAlignment(score=int(scores[b]), operations=lst))
        return out
