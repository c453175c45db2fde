"""Parity suite for classic pattern matchers (reference unit tests)."""

import numpy as np

from rust_bio_tpu.pattern_matching.bndm import BNDM
from rust_bio_tpu.pattern_matching.bom import BOM
from rust_bio_tpu.pattern_matching.horspool import Horspool
from rust_bio_tpu.pattern_matching.kmp import KMP, lps
from rust_bio_tpu.pattern_matching.shift_and import ShiftAnd
from rust_bio_tpu.pattern_matching.ukkonen import Ukkonen, unit_cost


# ---- KMP (kmp.rs tests) ----

def test_kmp_find_all():
    assert list(KMP(b"qnnnannan").find_all(b"dhjalkjwqnnnannanaflkjdklfj")) == [8]
    assert list(KMP(b"dhjalk").find_all(b"dhjalkjwqnnnannanaflkjdklfj")) == [0]
    assert list(KMP(b"abbab").find_all(b"aaaaabbabbbbbbbabbab")) == [4, 15]


def test_kmp_lps():
    assert lps(b"ababaca") == [0, 0, 1, 2, 3, 0, 1]


def test_kmp_delta():
    kmp = KMP(b"abbab")
    expected = {
        (0, ord("a")): 1, (0, ord("b")): 0,
        (1, ord("a")): 1, (1, ord("b")): 2,
        (2, ord("a")): 1, (2, ord("b")): 3,
        (3, ord("a")): 4, (3, ord("b")): 0,
        (4, ord("a")): 1, (4, ord("b")): 5,
        (5, ord("a")): 1, (5, ord("b")): 3,
    }
    for (q, a), want in expected.items():
        assert kmp.delta(q, a) == want, (q, chr(a))


# ---- Shift-And (shift_and.rs tests) ----

def test_shift_and():
    assert list(ShiftAnd(b"AAAA").find_all(b"ACGGCTAGAAAAGGGCG")) == [8]
    assert list(ShiftAnd(b"AAAA").find_all(b"AAAACGGCTAGGGCG")) == [0]
    assert list(ShiftAnd(b"ACA").find_all(b"ACACACA")) == [0, 2, 4]


def test_shift_and_64():
    # 4.0.1 fixed rejection of 64-symbol patterns; we support any length
    pattern = b"A" * 64
    text = b"GGGGGGGGGG" + pattern
    assert list(ShiftAnd(pattern).find_all(text)) == [10]


# ---- BNDM (bndm.rs tests) ----

def test_bndm():
    assert list(BNDM(b"GAAAA").find_all(b"ACGGCTAGAAAAGGCTAGAAAA")) == [7, 17]
    assert list(BNDM(b"AAAA").find_all(b"ACGGCTAGAAAAGGGCG")) == [8]
    assert list(BNDM(b"AAAA").find_all(b"AAAACGGCTAGGGCG")) == [0]
    pattern = b"GATACCCTTGGGCTAA"
    text = b"GTACGTACGA" + pattern
    assert list(BNDM(pattern).find_all(text)) == [10]


# ---- BOM (bom.rs tests) ----

def test_bom_delta():
    bom = BOM(b"qnnnannan")
    assert bom.delta(0, ord("n")) == 1
    assert bom.delta(1, ord("a")) == 2
    assert bom.delta(2, ord("n")) == 3
    assert bom.delta(3, ord("n")) == 4
    assert bom.delta(4, ord("a")) == 5
    assert bom.delta(5, ord("n")) == 6
    assert bom.delta(6, ord("n")) == 7
    assert bom.delta(7, ord("n")) == 8
    assert bom.delta(8, ord("q")) == 9
    assert bom.delta(0, ord("a")) == 2
    assert bom.delta(0, ord("q")) == 9
    assert bom.delta(1, ord("n")) == 4
    assert bom.delta(1, ord("q")) == 9
    assert bom.delta(4, ord("n")) == 8
    assert bom.delta(4, ord("q")) == 9


def test_bom_find_all():
    assert list(BOM(b"GAAAA").find_all(b"ACGGCTAGGAAAAAGACTGAGGACTGAAAA")) == [8, 25]
    assert list(BOM(b"AAAA").find_all(b"ACGGCTAGAAAAGGGCG")) == [8]
    assert list(BOM(b"AAAA").find_all(b"AAAACGGCTAGGGCG")) == [0]


# ---- Horspool (horspool.rs tests) ----

def test_horspool_shift():
    h = Horspool(b"AACB")
    assert h.shift[ord("A")] == 2
    assert h.shift[ord("C")] == 1
    assert h.shift[ord("B")] == 4


def test_horspool_find_all():
    assert list(
        Horspool(b"GAAAA").find_all(b"ACGGCTAGGAAAAAGACTGAGGACTGAAAA")
    ) == [8, 25]
    assert list(Horspool(b"AAAA").find_all(b"ACGGCTAGAAAAGGGCG")) == [8]
    assert list(Horspool(b"AAAA").find_all(b"AAAACGGCTAGGGCG")) == [0]


# ---- Ukkonen (ukkonen.rs tests) ----

def test_ukkonen_find_all_end():
    u = Ukkonen.with_capacity(10, unit_cost)
    occ = list(u.find_all_end(b"TGAGCGT", b"ACCGTGGATGAGCGCCATAG", 1))
    assert occ == [(13, 1), (14, 1)]


def test_ukkonen_find_start():
    u = Ukkonen.with_capacity(10, unit_cost)
    assert list(u.find_all_end(b"ACCGT", b"ACCGTGGATGAGCGCCATAG", 1)) == [
        (3, 1), (4, 0), (5, 1),
    ]
    assert list(u.find_all_end(b"ACCGT", b"AACCGTGGATGAGCGCCATAG", 1)) == [
        (4, 1), (5, 0), (6, 1),
    ]


# ---- cross-oracle property test ----

def test_exact_matchers_agree():
    rng = np.random.default_rng(7)
    for _ in range(15):
        n = int(rng.integers(20, 300))
        m = int(rng.integers(1, 8))
        text = rng.choice(list(b"ACGT"), size=n).astype("uint8").tobytes()
        patt = rng.choice(list(b"ACG"), size=m).astype("uint8").tobytes()
        naive = [
            i for i in range(n - m + 1) if text[i : i + m] == patt
        ]
        assert list(KMP(patt).find_all(text)) == naive
        assert list(ShiftAnd(patt).find_all(text)) == naive
        assert list(BNDM(patt).find_all(text)) == naive
        assert list(BOM(patt).find_all(text)) == naive
        assert list(Horspool(patt).find_all(text)) == naive


class TestBatchShiftAnd:
    def test_matches_scalar_shift_and(self):
        import numpy as np

        from rust_bio_tpu.pattern_matching.device_search import BatchShiftAnd
        from rust_bio_tpu.pattern_matching.shift_and import ShiftAnd

        rng = np.random.default_rng(31)
        text = rng.choice(list(b"ACGT"), size=5000).astype("uint8").tobytes()
        pats = [
            b"GCGCGTACACACCGCCCG"[:k] for k in (4, 7, 12, 18)
        ] + [text[100:118], text[4000:4009], b"AAAA", b"ACGTACGT"]
        dev = BatchShiftAnd(pats)
        got = dev.find_all(text, chunk=256)
        for b, p in enumerate(pats):
            want = list(ShiftAnd(p).find_all(text))
            assert got[b].tolist() == want, p

    def test_chunk_boundaries(self):
        from rust_bio_tpu.pattern_matching.device_search import BatchShiftAnd

        text = b"A" * 100
        dev = BatchShiftAnd([b"AAAA"])
        # overlapping matches straddling every chunk boundary
        got = dev.find_all(text, chunk=16)[0]
        assert got.tolist() == list(range(97))

    def test_empty_and_absent(self):
        from rust_bio_tpu.pattern_matching.device_search import BatchShiftAnd

        dev = BatchShiftAnd([b"TTTT", b"ACGT"])
        assert [v.tolist() for v in dev.find_all(b"")] == [[], []]
        got = dev.find_all(b"ACGCACGC" * 10)
        assert got[0].tolist() == [] and got[1].tolist() == []
