"""Parity suite for the remaining data structures (reference unit tests)."""

import numpy as np
import pytest

from rust_bio_tpu.alphabets import Alphabet, RankTransform, dna
from rust_bio_tpu.data_structures.annot_map import AnnotMap
from rust_bio_tpu.data_structures.bit_tree import MaxBitTree, SumBitTree
from rust_bio_tpu.data_structures.bitenc import BitEnc
from rust_bio_tpu.data_structures.bwt import Occ, bwt
from rust_bio_tpu.data_structures.interpolation_table import (
    InterpolationTable,
    interpolate,
)
from rust_bio_tpu.data_structures.interval_tree import (
    ArrayBackedIntervalTree,
    IntervalTree,
)
from rust_bio_tpu.data_structures.qgram_index import (
    ExactMatch,
    Interval,
    Match,
    QGramIndex,
)
from rust_bio_tpu.data_structures.rank_select import RankSelect
from rust_bio_tpu.data_structures.suffix_array import suffix_array
from rust_bio_tpu.data_structures.wavelet_matrix import WaveletMatrix
from rust_bio_tpu.types import Contig, ReqStrand


# ---- q-gram index (qgram_index.rs tests) ----

TEXT = b"ACGGCTGAGATGAT"


def _first_qgram(q, s, alphabet):
    return int(RankTransform(alphabet).qgrams(q, s)[0])


def test_qgram_matches():
    alphabet = dna.alphabet()
    idx = QGramIndex(3, TEXT, alphabet)
    qg = _first_qgram(3, b"TGA", alphabet)
    assert idx.qgram_matches(qg).tolist() == [5, 10]


def test_qgram_with_max_count():
    alphabet = dna.alphabet()
    idx = QGramIndex.with_max_count(3, TEXT, alphabet, 1)
    qg = _first_qgram(3, b"TGA", alphabet)
    assert idx.qgram_matches(qg).tolist() == []


def test_qgram_with_max_count_index_0():
    alphabet = dna.alphabet()
    idx = QGramIndex.with_max_count(3, b"AAAAA", alphabet, 1)
    qg = _first_qgram(3, b"AAA", alphabet)
    assert idx.qgram_matches(qg).tolist() == []


def test_qgram_sizeof_pos():
    alphabet = dna.alphabet()
    idx = QGramIndex(3, b"AAAAA", alphabet)
    qg = _first_qgram(3, b"AAA", alphabet)
    assert idx.qgram_matches(qg).tolist() == [0, 1, 2]


def test_matches():
    alphabet = dna.alphabet()
    idx = QGramIndex(3, TEXT, alphabet)
    matches = idx.matches(b"GCTG", 1)
    assert matches == [Match(Interval(0, 4), Interval(3, 7), 2)]
    matches = idx.matches(b"GCTAAGA", 2)
    assert matches == [Match(Interval(0, 7), Interval(3, 10), 2)]


def test_exact_matches():
    alphabet = dna.alphabet()
    idx = QGramIndex(3, TEXT, alphabet)
    ems = idx.exact_matches(b"GCTGA")
    assert len(ems) == 2
    for m in ems:
        assert m.pattern.get(b"GCTGA") == m.text.get(TEXT)
    ems = idx.exact_matches(b"GCTAAGA")
    assert sorted(ems, key=lambda m: m.pattern.start) == [
        ExactMatch(Interval(0, 3), Interval(3, 6)),
        ExactMatch(Interval(4, 7), Interval(7, 10)),
    ]


# ---- rank/select (rank_select.rs tests) ----

def test_rank_select():
    bits = np.zeros(64, dtype=bool)
    bits[5] = True
    bits[32] = True
    rs = RankSelect(bits, 1)
    assert rs.rank_1(1) == 0
    assert rs.rank_1(5) == 1
    assert rs.rank_1(6) == 1
    assert rs.rank_1(7) == 1
    assert rs.rank_1(32) == 2
    assert rs.rank_1(33) == 2
    assert rs.rank_1(64) is None
    assert rs.select_1(0) is None
    assert rs.select_1(1) == 5
    assert rs.select_1(2) == 32
    assert rs.rank_0(1) == 2
    assert rs.select_0(1) == 0


def test_select_edges():
    bits = np.zeros(900, dtype=bool)
    bits[64] = True
    assert RankSelect(bits, 1).select_1(1) == 64
    bits = np.zeros(900, dtype=bool)
    bits[50] = True
    assert RankSelect(bits, 1).select_1(1) == 50


def test_rank_select_vs_oracle():
    rng = np.random.default_rng(0)
    bits = rng.random(500) < 0.3
    rs = RankSelect(bits, 32)
    cum = np.cumsum(bits)
    for i in range(0, 500, 13):
        assert rs.rank_1(i) == cum[i]
        assert rs.rank_0(i) == i + 1 - cum[i]
    ones = np.nonzero(bits)[0]
    for j in range(1, len(ones) + 1, 7):
        assert rs.select_1(j) == ones[j - 1]


def test_rank_select_push():
    rs = RankSelect(np.zeros(0, dtype=bool), 1)
    rs.extend([False, True, False, True])
    assert rs.rank_1(3) == 2
    rs.push(True)
    assert rs.rank_1(4) == 3


# ---- wavelet matrix (bwt.rs:252-270 cross-validation) ----

def test_wavelet_matrix_vs_occ():
    text = b"GCCTTAACATTATTACGCCTA$"
    alphabet = dna.n_alphabet()
    alphabet.insert(ord("$"))
    sa = suffix_array(text)
    b = bwt(text, sa)
    occ = Occ(b, 3, alphabet)
    wm = WaveletMatrix(bytes(b))
    for c in b"ACGT$":
        for p in range(len(text)):
            assert occ.get(b, p, c) == wm.rank(c, p), (chr(c), p)


# ---- Fenwick trees (bit_tree.rs test) ----

def test_bit_tree():
    tree = MaxBitTree(10, default=(0, 0))
    tree.set(0, (1, 0))
    tree.set(1, (1, 1))
    tree.set(2, (2, 2))
    tree.set(5, (3, 5))
    assert tree.get(0) == (1, 0)
    assert tree.get(1) == (1, 1)
    assert tree.get(2) == (2, 2)
    assert tree.get(3) == (2, 2)
    assert tree.get(4) == (2, 2)
    assert tree.get(5) == (3, 5)
    assert tree.get(6) == (3, 5)


def test_sum_tree():
    t = SumBitTree(8)
    for i in range(8):
        t.set(i, i)
    assert t.get(7) == sum(range(8))
    assert t.get(3) == 0 + 1 + 2 + 3


# ---- BitEnc (bitenc.rs behavior) ----

def test_bitenc():
    be = BitEnc(2)
    for v in [0, 2, 1, 3, 0, 1]:
        be.push(v)
    assert list(be.iter()) == [0, 2, 1, 3, 0, 1]
    be.set(1, 3)
    assert be.get(1) == 3
    assert be.get(99) is None
    assert len(be) == 6
    be.push_values(4, 2)
    assert list(be.iter())[-4:] == [2, 2, 2, 2]
    assert be.nr_blocks() >= 1
    be.clear()
    assert be.is_empty()


def test_bitenc_width7():
    be = BitEnc(7)
    vals = [0, 127, 64, 1, 100]
    for v in vals:
        be.push(v)
    assert list(be.iter()) == vals


# ---- interpolation table (interpolation_table.rs) ----

def test_interpolation_table():
    assert interpolate(0.0, 10.0, 0.5) == 5.0
    table = InterpolationTable(0.0, 10.0, 2, np.log1p)
    for x in [0.0, 0.005, 1.234, 9.99, 15.0, -0.5]:
        assert table.get(x) == pytest.approx(np.log1p(x), abs=1e-4)
    xs = np.array([0.1, 5.5, 12.0])
    np.testing.assert_allclose(table.get_batch(xs), np.log1p(xs), atol=1e-4)


# ---- interval trees ----

def _naive_overlaps(items, q):
    return sorted(
        d for (s, e), d in items if s < q[1] and q[0] < e
    )


@pytest.mark.parametrize("tree_cls", [IntervalTree, ArrayBackedIntervalTree])
def test_interval_trees_vs_oracle(tree_cls):
    rng = np.random.default_rng(1)
    items = []
    tree = tree_cls()
    for i in range(200):
        s = int(rng.integers(0, 1000))
        e = s + int(rng.integers(1, 50))
        items.append(((s, e), i))
        tree.insert((s, e), i)
    if isinstance(tree, ArrayBackedIntervalTree):
        tree.index()
    for _ in range(50):
        qs = int(rng.integers(0, 1000))
        qe = qs + int(rng.integers(1, 80))
        got = sorted(e.data() for e in tree.find((qs, qe)))
        assert got == _naive_overlaps(items, (qs, qe))


def test_interval_tree_entry_api():
    tree = IntervalTree()
    tree.insert((11, 20), "Range_1")
    tree.insert((25, 30), "Range_2")
    hits = list(tree.find((15, 25)))
    assert len(hits) == 1
    assert hits[0].data() == "Range_1"
    assert hits[0].interval().start == 11


def test_array_backed_requires_index():
    t = ArrayBackedIntervalTree()
    t.insert((1, 5), "a")
    with pytest.raises(RuntimeError):
        t.find((0, 10))
    t.index()
    assert [e.data() for e in t.find((0, 10))] == ["a"]


# ---- annot_map (annot_map.rs doctests) ----

def test_annot_map():
    genes = AnnotMap()
    tma22 = Contig("chrX", 461829, 462426 - 461829, ReqStrand.Forward)
    genes.insert_at("TMA22", tma22)
    query = Contig("chrX", 461800, 100, ReqStrand.Forward)
    hits = [e.data() for e in genes.find(query)]
    assert hits == ["TMA22"]
    # different chromosome: no hits
    q2 = Contig("chrY", 461800, 100, ReqStrand.Forward)
    assert list(genes.find(q2)) == []


def test_annot_map_insert_loc():
    gene_locs = AnnotMap()
    tma19 = Contig("chrXI", 334412, 334916 - 334412, ReqStrand.Reverse)
    gene_locs.insert_loc(tma19)
    query = Contig("chrXI", 334400, 100, ReqStrand.Reverse)
    hits = [e.data() for e in gene_locs.find(query)]
    assert hits == [tma19]
