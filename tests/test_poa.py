"""Parity suite for POA (reference: poa.rs tests)."""

import pytest

from rust_bio_tpu.alignment.pairwise.scoring import Scoring
from rust_bio_tpu.alignment.poa import (
    Aligner,
    DelOp,
    InsOp,
    MatchOp,
    Poa,
    XclipOp,
    YclipOp,
)


def _scoring(go=-1, ge=0, ma=1, mi=-1):
    return Scoring.new(go, ge, lambda a, b: ma if a == b else mi)


def test_init_graph():
    poa = Poa.from_string(_scoring(), b"123456789")
    assert poa.graph.node_count() == 9
    assert poa.graph.edge_count() == 8


def test_alignment():
    poa = Poa.from_string(_scoring(), b"GATTACA")
    aln = poa.recalculate_alignment(poa.custom(b"GCATGCU"))
    assert aln.score == 0
    aln = poa.recalculate_alignment(poa.custom(b"GCATGCUx"))
    assert aln.score == -1
    aln = poa.recalculate_alignment(poa.custom(b"xCATGCU"))
    assert aln.score == -2


def test_branched_alignment():
    poa = Poa.from_string(_scoring(), b"TTTTT")
    head, tail = 1, 2
    node1 = poa.graph.add_node(ord("A"))
    node2 = poa.graph.add_node(ord("A"))
    poa.graph.add_edge(head, node1, 1)
    poa.graph.add_edge(node1, node2, 1)
    poa.graph.add_edge(node2, tail, 1)
    aln = poa.recalculate_alignment(poa.custom(b"TTATT"))
    assert aln.score == 3


def test_alt_branched_alignment():
    poa = Poa.from_string(_scoring(), b"TTCCTTAA")
    head, tail = 1, 2
    node1 = poa.graph.add_node(ord("A"))
    node2 = poa.graph.add_node(ord("A"))
    poa.graph.add_edge(head, node1, 1)
    poa.graph.add_edge(node1, node2, 1)
    poa.graph.add_edge(node2, tail, 1)
    aln = poa.recalculate_alignment(poa.custom(b"TTTTGGAA"))
    poa.add_alignment(aln, b"TTTTGGAA")
    assert poa.graph.edge_count() == 14
    assert poa.graph.find_edge(5, 10) is not None
    assert poa.graph.find_edge(11, 6) is not None


def test_insertion_on_branch():
    poa = Poa.from_string(_scoring(), b"TTCCGGTTTAA")
    head, tail = 1, 2
    n1 = poa.graph.add_node(ord("C"))
    n2 = poa.graph.add_node(ord("C"))
    n3 = poa.graph.add_node(ord("C"))
    poa.graph.add_edge(head, n1, 1)
    poa.graph.add_edge(n1, n2, 1)
    poa.graph.add_edge(n2, n3, 1)
    poa.graph.add_edge(n3, tail, 1)
    aln = poa.recalculate_alignment(poa.custom(b"TTGGTATGGGAA"))
    assert aln.score == 2
    poa.add_alignment(aln, b"TTGGTATGGGAA")
    aln2 = poa.recalculate_alignment(poa.custom(b"TTGGTTTGCGAA"))
    assert aln2.score == 10


def test_poa_method_chaining():
    aligner = Aligner(_scoring(), b"TTCCGGTTTAA")
    aligner.global_(b"TTGGTATGGGAA").add_to_graph().global_(b"TTGGTTTGCGAA")
    assert aligner.alignment().score == 10


def test_edge_cases():
    # case 1: BBA + AAA
    aligner = Aligner(_scoring(), b"BBA")
    aligner.global_(b"AAA").add_to_graph()
    g = aligner.graph()
    assert g.node_count() == 5
    assert bytes(g.weights) == b"BBAAA"
    edges = {(a, b): w for a, b, w in g.edges}
    assert edges == {(0, 1): 1, (1, 2): 1, (3, 4): 1, (4, 2): 1}
    # case 2: AAA + ABA
    aligner = Aligner(_scoring(), b"AAA")
    aligner.global_(b"ABA").add_to_graph()
    g = aligner.graph()
    assert bytes(g.weights) == b"AAAB"
    edges = {(a, b): w for a, b, w in g.edges}
    assert edges == {(0, 1): 1, (1, 2): 1, (0, 3): 1, (3, 2): 1}
    # case 3: BBBBBAAA + AAA
    aligner = Aligner(_scoring(), b"BBBBBAAA")
    aligner.global_(b"AAA").add_to_graph()
    g = aligner.graph()
    edges = {(a, b): w for a, b, w in g.edges}
    assert edges == {
        (0, 1): 1, (1, 2): 1, (2, 3): 1, (3, 4): 1, (4, 5): 1,
        (5, 6): 2, (6, 7): 2,
    }
    # case 4: AAA + BBBBBAAA
    aligner = Aligner(_scoring(), b"AAA")
    aligner.global_(b"BBBBBAAA").add_to_graph()
    g = aligner.graph()
    edges = {(a, b): w for a, b, w in g.edges}
    assert edges == {
        (0, 1): 2, (1, 2): 2, (3, 4): 1, (4, 5): 1, (5, 6): 1,
        (6, 7): 1, (7, 0): 1,
    }


def test_consensus():
    aligner = Aligner(_scoring(), b"GCATGCUx")
    aligner.global_(b"GCATGCU").add_to_graph()
    aligner.global_(b"xCATGCU").add_to_graph()
    assert aligner.consensus() == b"GCATGCUx"


def test_global_banded_equals_unbanded():
    s1 = b"TGGCATGCTCAAGGACCGTTGAATACTATCTTAATGGACCGCAAGCTCCCTGAAGGTGGGCCACATTCGAGGGCC"
    s2 = b"TGGCTACATGCTCAAGCATCGTTGAAGCTCATCTTAATGGACCGCAACGGCCGCCTGAAGGTGGGACACGTGACG"
    s3 = b"TGGCATGCTCAAGGAGTGCTGAAGCTCATTTTAATGGACCGCAACGGCCGCCTGAAGGTGGGGCACGTGACGGGC"
    scoring = Scoring.from_scores(-2, -2, 2, -4)
    ab = Aligner(scoring, s1)
    ab.global_banded(s2, 25).add_to_graph()
    ab.global_banded(s3, 25)
    au = Aligner(Scoring.from_scores(-2, -2, 2, -4), s1)
    au.global_(s2).add_to_graph()
    au.global_(s3)
    assert ab.alignment().operations == au.alignment().operations


def test_xclip_prefix_custom():
    scoring = _scoring(go=-5, ge=-1).xclip(-5)
    aligner = Aligner(scoring, b"GGGGGGATG")
    aln = aligner.custom(b"ATG").alignment()
    assert aln.operations == [
        XclipOp(0), MatchOp((5, 6)), MatchOp((6, 7)), MatchOp((7, 8)),
    ]


def test_yclip_prefix_custom():
    scoring = _scoring(go=-5, ge=-1).yclip(-5)
    aligner = Aligner(scoring, b"ATG")
    aln = aligner.custom(b"GGGGGGATG").alignment()
    assert aln.operations == [
        YclipOp(0, 6), MatchOp(None), MatchOp((0, 1)), MatchOp((1, 2)),
    ]


def test_xclip_suffix_custom():
    scoring = _scoring(go=-5, ge=-1).xclip(0).yclip(0)
    aligner = Aligner(scoring, b"GAAAA")
    aln = aligner.custom(b"CG").alignment()
    assert aln.operations == [YclipOp(0, 1), MatchOp(None), XclipOp(1)]


def test_yclip_suffix_custom():
    scoring = Scoring.new(-5, -1, lambda a, b: 3 if a == b else -3).yclip(-5).xclip(0)
    aligner = Aligner(scoring, b"CG")
    aln = aligner.custom(b"GAAAA").alignment()
    assert aln.operations == [XclipOp(0), MatchOp((0, 1)), YclipOp(1, 5)]


def test_batch_poa_global_scores_match_host():
    import numpy as np

    from rust_bio_tpu.alignment.poa import Aligner
    from rust_bio_tpu.alignment.poa_batch import BatchPoa
    from rust_bio_tpu.alignment.pairwise.scoring import Scoring

    sc = Scoring.from_scores(-4, -4, 3, -2)
    # build a branched graph by threading several sequences through it
    al = Aligner(sc, b"TTCCGGTTTAA")
    for s in (b"TTGGCCTTTAA", b"TTCCGGAATTTAA", b"TTCCGTTTAA"):
        al.global_(s).add_to_graph()
    bp = BatchPoa(sc, al)

    rng = np.random.default_rng(61)
    queries = [
        b"TTCCGGTTTAA", b"TTGGCCTTTAA", b"AAAAAAA", b"TTCCG",
        bytes(rng.choice(list(b"ACGT")) for _ in range(9)),
        bytes(rng.choice(list(b"ACGT")) for _ in range(14)),
    ]
    got = bp.global_scores(queries)
    for k, q in enumerate(queries):
        want = al.global_(q).alignment().score
        assert int(got[k]) == want, q


def test_cpu_poa_twin_score_parity(tmp_path):
    """The -O3 C++ baseline twin (baselines/cpu_poa.cpp, the reference's
    Poa::custom DP, poa.rs:498-567) must be score-exact vs the host
    oracle on a branched graph: the `poa_vs_baseline` bench row divides
    by this twin."""
    import os
    import subprocess

    import numpy as np

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(here, "baselines", "cpu_poa.cpp")
    exe = os.path.join(str(tmp_path), "cpu_poa")
    subprocess.run(["g++", "-O2", "-o", exe, src], check=True)

    rng = np.random.default_rng(7)
    sc = Scoring.from_scores(-4, -4, 3, -2)
    L = 60
    backbone = rng.choice(list(b"ACGT"), size=L).astype(np.uint8)
    al = Aligner(sc, backbone.tobytes())
    for _ in range(4):  # thread mutated reads -> branches in the DAG
        r = backbone.copy()
        idx = rng.random(L) < 0.08
        r[idx] = rng.choice(list(b"ACGT"), size=int(idx.sum()))
        al.global_(r.tobytes()).add_to_graph()

    B = 16
    qb = np.zeros((B, L), np.uint8)
    for k in range(B):
        r = backbone.copy()
        idx = rng.random(L) < 0.08
        r[idx] = rng.choice(list(b"ACGT"), size=int(idx.sum()))
        qb[k] = r

    g = al.poa.graph
    m = g.node_count()
    gbin = os.path.join(str(tmp_path), "graph.bin")
    with open(gbin, "wb") as f:
        f.write(np.int32(m).tobytes())
        f.write(np.asarray(g.weights, np.uint8).tobytes())
        f.write(np.asarray(g.topo_order(), np.int32).tobytes())
        preds = [np.asarray(g.incoming(v), np.int32) for v in range(m)]
        f.write(np.asarray([len(p) for p in preds], np.int32).tobytes())
        for p in preds:
            f.write(p.tobytes())
        f.write(np.int32(B).tobytes())
        f.write(np.int32(L).tobytes())
        f.write(qb.tobytes())
        mp = sc.match_fn
        f.write(
            np.asarray(
                [sc.gap_open, mp.match_score, mp.mismatch_score], np.int32
            ).tobytes()
        )

    out = subprocess.run(
        [exe, gbin, "0"], capture_output=True, text=True, check=True
    )
    got = [int(x) for x in out.stdout.split()]
    want = [
        al.global_(qb[k].tobytes()).alignment().score for k in range(B)
    ]
    assert got == want


def test_batch_poa_global_alignments_op_exact():
    """Device forward+traceback (poa_batch._poa_align_kernel) emits op
    lists IDENTICAL to the host oracle's recalculate_alignment
    (poa.rs:643-826) on branched graphs with substitutions and indels —
    including tie-break order (Ins first, last predecessor wins) and the
    trailing root-Ins / q0-Del break ops."""
    import numpy as np

    from rust_bio_tpu.alignment.poa_batch import BatchPoa

    rng = np.random.default_rng(31)
    for trial in range(4):
        sc = (
            Scoring.from_scores(-4, -4, 3, -2)
            if trial % 2 == 0
            else Scoring.from_scores(-6, -6, 2, -3)
        )
        L = int(rng.integers(20, 80))
        backbone = rng.choice(list(b"ACGT"), size=L).astype(np.uint8)
        al = Aligner(sc, backbone.tobytes())
        for _ in range(int(rng.integers(0, 5))):
            r = backbone.copy()
            idx = rng.random(L) < 0.1
            r[idx] = rng.choice(list(b"ACGT"), size=int(idx.sum()))
            rr = bytearray(r.tobytes())
            if rng.random() < 0.5 and len(rr) > 5:
                del rr[int(rng.integers(0, len(rr)))]
            al.global_(bytes(rr)).add_to_graph()
        bp = BatchPoa(sc, al)
        qs = []
        for _ in range(8):
            r = backbone.copy()
            idx = rng.random(L) < 0.12
            r[idx] = rng.choice(list(b"ACGT"), size=int(idx.sum()))
            rr = bytearray(r.tobytes())
            if rng.random() < 0.5 and len(rr) > 5:
                del rr[int(rng.integers(0, len(rr)))]
            if rng.random() < 0.5:
                rr.insert(
                    int(rng.integers(0, len(rr))),
                    int(rng.choice(list(b"ACGT"))),
                )
            qs.append(bytes(rr))
        got = bp.global_alignments(qs)
        for k, q in enumerate(qs):
            want = al.global_(q).alignment()
            assert got[k].score == want.score
            assert got[k].operations == want.operations


def test_batch_poa_alignments_extend_graph_like_host():
    """Device-emitted alignments drive add_alignment to the same graph
    as host-emitted ones (op lists are identical, so the extension path
    is too) — the consensus after extension must match."""
    import numpy as np

    from rust_bio_tpu.alignment.poa_batch import BatchPoa

    rng = np.random.default_rng(97)
    sc = Scoring.from_scores(-4, -4, 3, -2)
    L = 50
    backbone = rng.choice(list(b"ACGT"), size=L).astype(np.uint8)
    reads = []
    for _ in range(5):
        r = backbone.copy()
        idx = rng.random(L) < 0.06
        r[idx] = rng.choice(list(b"ACGT"), size=int(idx.sum()))
        reads.append(r.tobytes())

    al_host = Aligner(sc, backbone.tobytes())
    al_dev = Aligner(sc, backbone.tobytes())
    for r in reads:
        al_host.global_(r).add_to_graph()
        aln = BatchPoa(sc, al_dev).global_alignments([r])[0]
        al_dev.poa.add_alignment(aln, r)
    assert al_host.consensus() == al_dev.consensus()
    assert (
        al_host.poa.graph.node_count() == al_dev.poa.graph.node_count()
    )
    assert (
        al_host.poa.graph.edge_count() == al_dev.poa.graph.edge_count()
    )
