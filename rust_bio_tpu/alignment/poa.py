"""Partial-order alignment (POA) on a DAG with consensus generation.

Reference parity: src/alignment/poa.rs — graph-node ``AlignmentOperation``
(:57), score-only ``Traceback`` matrix with band support (:167-270),
builder-style ``Aligner`` with global/semiglobal/local/custom +
``global_banded`` (:276-414), ``consensus`` heaviest-bundle walk (:414),
``Poa::custom`` topological-order DP (:498), ``recalculate_alignment``
score-difference traceback (:643), ``add_alignment`` graph extension
(:856). O(N^2 L^2) like the reference.

The graph mimics petgraph's iteration orders (incoming neighbors in
reverse edge-insertion order; Topo as a stack seeded with index-ordered
sources) so emitted operations are reference-identical.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from rust_bio_tpu.alignment.pairwise.scoring import MIN_SCORE, Scoring
from rust_bio_tpu.utils.text import to_bytes


# ---- graph-node alignment operations (poa.rs:57) ----


@dataclass(frozen=True)
class Op:
    kind: str  # 'match', 'del', 'ins', 'xclip', 'yclip'
    arg: object = None

    def __repr__(self) -> str:
        return f"{self.kind.capitalize()}({self.arg})"


def MatchOp(arg=None) -> Op:
    return Op("match", arg)


def DelOp(arg=None) -> Op:
    return Op("del", arg)


def InsOp(arg=None) -> Op:
    return Op("ins", arg)


def XclipOp(n) -> Op:
    return Op("xclip", n)


def YclipOp(to, frm) -> Op:
    return Op("yclip", (to, frm))


@dataclass
class PoaAlignment:
    score: int
    operations: List[Op]


class POAGraph:
    """Directed graph of (base) nodes with weighted edges."""

    def __init__(self) -> None:
        self.weights: List[int] = []  # node weights (bases)
        self.out_edges: List[List[int]] = []  # node -> list of edge ids
        self.in_edges: List[List[int]] = []
        self.edges: List[Tuple[int, int, int]] = []  # (from, to, weight)

    def add_node(self, base: int) -> int:
        self.weights.append(base)
        self.out_edges.append([])
        self.in_edges.append([])
        return len(self.weights) - 1

    def add_edge(self, a: int, b: int, w: int) -> int:
        eid = len(self.edges)
        self.edges.append((a, b, w))
        self.out_edges[a].append(eid)
        self.in_edges[b].append(eid)
        return eid

    def find_edge(self, a: int, b: int) -> Optional[int]:
        for eid in self.out_edges[a]:
            if self.edges[eid][1] == b:
                return eid
        return None

    def bump_edge(self, eid: int) -> None:
        a, b, w = self.edges[eid]
        self.edges[eid] = (a, b, w + 1)

    def node_count(self) -> int:
        return len(self.weights)

    def edge_count(self) -> int:
        return len(self.edges)

    def incoming(self, node: int) -> List[int]:
        """Incoming neighbor nodes, reverse edge-insertion order (petgraph)."""
        return [self.edges[eid][0] for eid in reversed(self.in_edges[node])]

    def outgoing(self, node: int) -> List[int]:
        return [self.edges[eid][1] for eid in reversed(self.out_edges[node])]

    def edges_connecting_weight(self, a: int, b: int) -> int:
        return sum(
            self.edges[eid][2] for eid in self.out_edges[a] if self.edges[eid][1] == b
        )

    def topo_order(self) -> List[int]:
        """Kahn topo order with a stack, mimicking petgraph::visit::Topo."""
        indeg = [len(e) for e in self.in_edges]
        stack = [i for i in range(self.node_count()) if indeg[i] == 0]
        order: List[int] = []
        while stack:
            node = stack.pop()
            order.append(node)
            for nb in self.outgoing(node):
                indeg[nb] -= 1
                if indeg[nb] == 0:
                    stack.append(nb)
        return order


class Traceback:
    """Score matrix with per-row band ranges (poa.rs:167-270)."""

    def __init__(self, m: int, n: int) -> None:
        self.rows = m
        self.cols = n
        self.best_in_last_row = 0
        self.best_in_last_col = 0
        self.best_overall = (0, 0)
        self.last = 0
        self.start_end: List[Tuple[int, int]] = [(0, n + 1)] * (m + 1)
        self.matrix: List[List[int]] = [[] for _ in range(m + 1)]

    def initialize_scores(self, gap_open: int, yclip_prefix: int) -> None:
        self.matrix[0] = [max(j * gap_open, yclip_prefix) for j in range(self.cols + 1)]
        self.matrix[0][0] = 0

    def new_row(self, row, size, gap_open, xclip_prefix, start, end) -> None:
        self.start_end[row] = (start, end)
        if start == 0:
            self.matrix[row] = [max(row * gap_open, xclip_prefix)]
        else:
            self.matrix[row] = [MIN_SCORE]
        self.matrix[row].extend([MIN_SCORE] * size)

    def set(self, i, j, v) -> None:
        s, e = self.start_end[i]
        if not (s > j or e < j):
            self.matrix[i][j - s] = v

    def get(self, i, j) -> int:
        s, e = self.start_end[i]
        if not (s > j or e <= j or not self.matrix[i]):
            return self.matrix[i][j - s]
        return MIN_SCORE


class Poa:
    """POA DP engine over the graph (poa.rs:459)."""

    def __init__(self, scoring: Scoring, graph: POAGraph) -> None:
        self.scoring = scoring
        self.graph = graph

    @classmethod
    def from_string(cls, scoring: Scoring, seq) -> "Poa":
        seq = to_bytes(seq)
        graph = POAGraph()
        prev = graph.add_node(seq[0])
        for base in seq[1:]:
            node = graph.add_node(base)
            graph.add_edge(prev, node, 1)
            prev = node
        return cls(scoring, graph)

    def custom(self, query) -> Traceback:
        query = to_bytes(query)
        g = self.graph
        sc = self.scoring
        assert g.node_count() != 0
        m, n = g.node_count(), len(query)
        tb = Traceback(m, n)
        tb.initialize_scores(sc.gap_open, sc.yclip_prefix)

        max_score_last_column = -(1 << 62)
        max_score_overall = 0
        for node in g.topo_order():
            max_score_last_row = -(1 << 62)
            r = g.weights[node]
            i = node + 1
            tb.last = node
            prevs = g.incoming(node)
            tb.new_row(i, n + 1, sc.gap_open, sc.xclip_prefix, 0, n + 1)
            y_clip_min = tb.get(i, 0) + sc.yclip_prefix
            for qi, qb in enumerate(query):
                j = qi + 1
                if not prevs:
                    max_cell = tb.get(0, j - 1) + sc.score(r, qb)
                else:
                    x_clip_min = tb.get(0, j) + sc.xclip_prefix
                    max_cell = max(MIN_SCORE, x_clip_min, y_clip_min)
                    for prev_node in prevs:
                        i_p = prev_node + 1
                        max_cell = max(
                            max_cell,
                            tb.get(i_p, j - 1) + sc.score(r, qb),
                            tb.get(i_p, j) + sc.gap_open,
                        )
                score = max(max_cell, tb.get(i, j - 1) + sc.gap_open)
                if score > max_score_last_row:
                    max_score_last_row = score
                    tb.best_in_last_row = j
                if score > max_score_last_column and qi == n - 1:
                    max_score_last_column = score
                    tb.best_in_last_col = i
                if score > max_score_overall:
                    max_score_overall = score
                    tb.best_overall = (i, j)
                tb.set(i, j, score)
        return tb

    def global_banded(self, query, bandwidth: int) -> Traceback:
        query = to_bytes(query)
        g = self.graph
        sc = self.scoring
        assert g.node_count() != 0
        m, n = g.node_count(), len(query)
        tb = Traceback(m, n)
        tb.initialize_scores(sc.gap_open, sc.yclip_prefix)
        tb.set(0, 0, 0)
        max_scoring_j = 0
        max_score_for_row = MIN_SCORE
        for node in g.topo_order():
            r = g.weights[node]
            i = node + 1
            tb.last = node
            prevs = g.incoming(node)
            start = max(max_scoring_j - bandwidth, 0)
            end = max_scoring_j + bandwidth
            tb.new_row(i, (end - start) + 1, sc.gap_open, sc.xclip_prefix, start, end + 1)
            for qi in range(start, len(query)):
                j = qi + 1
                if j > end:
                    break
                qb = query[qi]
                if not prevs:
                    max_cell = tb.get(0, j - 1) + sc.score(r, qb)
                else:
                    max_cell = MIN_SCORE
                    for prev_node in prevs:
                        i_p = prev_node + 1
                        max_cell = max(
                            max_cell,
                            tb.get(i_p, j - 1) + sc.score(r, qb),
                            tb.get(i_p, j) + sc.gap_open,
                        )
                score = max(max_cell, tb.get(i, j - 1) + sc.gap_open)
                if score > max_score_for_row:
                    max_scoring_j = j
                    max_score_for_row = score
                tb.set(i, j, score)
        return tb

    def recalculate_alignment(self, tb: Traceback) -> PoaAlignment:
        """Score-difference traceback (poa.rs:643-826)."""
        g = self.graph
        sc = self.scoring
        ops: List[Op] = []
        last_node = tb.last + 1
        last_query = tb.cols
        final_score = tb.get(last_node, last_query)
        curr_node = last_node
        curr_query = last_query

        match_s = sc.score(0, 0)
        mismatch_s = sc.score(0, 1)

        xy_score = (
            tb.get(*tb.best_overall) + sc.xclip_suffix + sc.yclip_suffix
        )
        y_score = tb.get(last_node, tb.best_in_last_row) + sc.yclip_suffix
        x_score = tb.get(tb.best_in_last_col, last_query) + sc.xclip_suffix
        if (
            xy_score >= final_score
            and xy_score >= x_score
            and xy_score >= y_score
            and tb.best_overall[1] != last_query
            and tb.best_overall[0] != last_node
        ):
            ops.append(XclipOp(tb.best_overall[0]))
            ops.append(YclipOp(tb.best_overall[1], last_query))
            curr_node, curr_query = tb.best_overall
        elif (
            y_score >= final_score
            and y_score >= x_score
            and tb.best_in_last_row != last_query
        ):
            ops.append(YclipOp(tb.best_in_last_row, last_query))
            curr_query = tb.best_in_last_row
        elif x_score >= final_score and tb.best_in_last_col != last_node:
            ops.append(XclipOp(tb.best_in_last_col))
            curr_node = tb.best_in_last_col

        while True:
            op = MatchOp(None)
            cur = tb.get(curr_node, curr_query)
            next_jump = curr_query
            next_node = 1
            prevs = g.incoming(curr_node - 1)
            jump_up_score = MIN_SCORE
            jump_diagonal_score = MIN_SCORE
            jump_left_score = tb.get(curr_node, curr_query - 1) + sc.gap_open
            if cur == jump_left_score:
                op = InsOp(curr_node - 1)
                next_node = curr_node
                next_jump = curr_query - 1
            else:
                for prev in prevs:
                    prev_node = prev + 1
                    diagonal_score = tb.get(prev_node, curr_query - 1)
                    top_score = tb.get(prev_node, curr_query)
                    if cur == top_score + sc.gap_open:
                        jump_up_score = top_score + sc.gap_open
                        op = DelOp(None)
                        next_jump = curr_query
                        next_node = prev_node
                    elif cur == diagonal_score + mismatch_s:
                        jump_diagonal_score = diagonal_score + mismatch_s
                        op = MatchOp((prev_node - 1, curr_node - 1))
                        next_node = prev_node
                        next_jump = curr_query - 1
                    elif cur == diagonal_score + match_s:
                        jump_diagonal_score = diagonal_score + match_s
                        op = MatchOp((prev_node - 1, curr_node - 1))
                        next_node = prev_node
                        next_jump = curr_query - 1
                if not prevs:
                    if cur == tb.get(0, curr_query - 1) + match_s:
                        op = MatchOp(None)
                        jump_diagonal_score = tb.get(0, curr_query - 1) + match_s
                        next_node = 1
                        next_jump = curr_query - 1
                    if cur == tb.get(0, curr_query - 1) + mismatch_s:
                        op = MatchOp(None)
                        jump_diagonal_score = tb.get(0, curr_query - 1) + mismatch_s
                        next_node = 1
                        next_jump = curr_query - 1
            max_score = max(jump_diagonal_score, jump_up_score, jump_left_score)
            if sc.xclip_prefix >= max_score:
                next_node = 0
                op = XclipOp(0)
            if sc.yclip_prefix >= max(max_score, sc.xclip_prefix):
                next_jump = 0
                op = YclipOp(0, curr_query)
            ops.append(op)
            curr_query = next_jump
            curr_node = next_node
            if not prevs or curr_query == 0:
                if not prevs:
                    if curr_query > 0:
                        for _ in range(curr_query):
                            if sc.yclip_prefix > MIN_SCORE:
                                ops.append(YclipOp(0, curr_query))
                                break
                            ops.append(InsOp(None))
                else:
                    if sc.xclip_prefix > MIN_SCORE:
                        ops.append(XclipOp(0))
                    else:
                        ops.append(DelOp(None))
                break
        ops.reverse()
        return PoaAlignment(score=final_score, operations=ops)

    def add_alignment(self, aln: PoaAlignment, seq) -> None:
        """Extend the graph with an aligned sequence (poa.rs:856-925)."""
        seq = to_bytes(seq)
        g = self.graph
        head = g.topo_order()[0]
        prev = head
        i = 0
        edge_not_connected = False
        for op in aln.operations:
            if op.kind == "match" and op.arg is None:
                node = head
                if seq[i] != g.weights[head] and seq[i] != ord("X"):
                    new_node = g.add_node(seq[i])
                    if edge_not_connected:
                        g.add_edge(prev, new_node, 1)
                    edge_not_connected = False
                    prev = new_node
                if edge_not_connected:
                    g.add_edge(prev, node, 1)
                    prev = node
                    edge_not_connected = False
                i += 1
            elif op.kind == "match":
                _, p = op.arg
                node = p
                if seq[i] != g.weights[p] and seq[i] != ord("X"):
                    new_node = g.add_node(seq[i])
                    g.add_edge(prev, new_node, 1)
                    prev = new_node
                else:
                    eid = g.find_edge(prev, node)
                    if eid is not None:
                        g.bump_edge(eid)
                    elif prev != head and prev != node:
                        g.add_edge(prev, node, 1)
                    prev = p
                i += 1
            elif op.kind == "ins" and op.arg is None:
                node = g.add_node(seq[i])
                if edge_not_connected:
                    g.add_edge(prev, node, 1)
                prev = node
                edge_not_connected = True
                i += 1
            elif op.kind == "ins":
                node = g.add_node(seq[i])
                g.add_edge(prev, node, 1)
                prev = node
                i += 1
            elif op.kind == "del" or op.kind == "xclip":
                pass
            elif op.kind == "yclip":
                i = op.arg[1]


class Aligner:
    """Builder-style POA aligner (poa.rs:276-414)."""

    def __init__(self, scoring: Scoring, reference) -> None:
        self.traceback: Optional[Traceback] = None
        self.query = to_bytes(reference)
        self.poa = Poa.from_string(scoring, reference)

    @classmethod
    def new(cls, scoring: Scoring, reference) -> "Aligner":
        return cls(scoring, reference)

    def _with_clips(self, query, clips) -> "Aligner":
        sc = self.poa.scoring
        saved = (sc.xclip_prefix, sc.xclip_suffix, sc.yclip_prefix, sc.yclip_suffix)
        self.poa.scoring = sc.with_clips(*clips)
        self.query = to_bytes(query)
        self.traceback = self.poa.custom(self.query)
        self.poa.scoring = self.poa.scoring.with_clips(*saved)
        return self

    def global_(self, query) -> "Aligner":
        return self._with_clips(query, (MIN_SCORE,) * 4)

    def semiglobal(self, query) -> "Aligner":
        return self._with_clips(query, (MIN_SCORE, MIN_SCORE, 0, 0))

    def local(self, query) -> "Aligner":
        return self._with_clips(query, (0, 0, 0, 0))

    def custom(self, query) -> "Aligner":
        self.query = to_bytes(query)
        self.traceback = self.poa.custom(self.query)
        return self

    def global_banded(self, query, bandwidth: int) -> "Aligner":
        self.query = to_bytes(query)
        self.traceback = self.poa.global_banded(self.query, bandwidth)
        return self

    def alignment(self) -> PoaAlignment:
        return self.poa.recalculate_alignment(self.traceback)

    def add_to_graph(self) -> "Aligner":
        aln = self.alignment()
        self.poa.add_alignment(aln, self.query)
        return self

    def add_alignment(self, aln: PoaAlignment) -> "Aligner":
        self.poa.add_alignment(aln, self.query)
        return self

    def graph(self) -> POAGraph:
        return self.poa.graph

    def consensus(self) -> bytes:
        """Heaviest-bundle consensus walk (poa.rs:414-457)."""
        g = self.poa.graph
        max_index = g.node_count()
        INF = 1 << 62
        wsn: List[Tuple[int, int, int]] = [(0, 0, 0)] * (max_index + 1)
        for node in g.topo_order():
            best = (0, 0, INF)  # (weight, score, next) — usize::MAX -> INF
            for nb in g.incoming(node):
                nb_score = wsn[nb][1]
                weight = g.edges_connecting_weight(nb, node)
                cand = (weight, weight + nb_score, nb)
                if cand > best:
                    best = cand
            wsn[node] = best
        pos = max(range(len(wsn)), key=lambda idx: wsn[idx][1])
        out = bytearray()
        while pos != INF:
            out.append(g.weights[pos])
            pos = wsn[pos][2]
        out.reverse()
        return bytes(out)
