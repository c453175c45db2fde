"""Parity suite for PSSM (reference: pssm tests)."""

import numpy as np
import pytest

from rust_bio_tpu.pattern_matching.pssm import (
    DNAMotif,
    InconsistentLen,
    InvalidMonomer,
    ProtMotif,
)


def test_simple_pssm():
    pssm = DNAMotif.from_seqs([b"AAAA", b"TTTT", b"GGGG", b"CCCC"], None)
    np.testing.assert_allclose(pssm.scores, np.full((4, 4), 0.25))


def test_find_motif():
    pssm = DNAMotif.from_seqs([b"ATGC"], None)
    sp = pssm.score(b"GGGGATGCGGGG")
    assert sp.loc == 4
    assert sp.sum == pytest.approx(1.0)


def test_info_content():
    pssm = DNAMotif.from_seqs([b"AAAA"], [0.0] * 4)
    assert pssm.info_content() == pytest.approx(8.0)


def test_mono_err():
    pssm = DNAMotif.from_seqs([b"ATGC"], None)
    with pytest.raises(InvalidMonomer):
        pssm.score(b"AAAAXAAAAAAAAA")


def test_inconsist_err():
    with pytest.raises(InconsistentLen):
        DNAMotif.from_seqs([b"AAAA", b"TTTT", b"C"], [0.0] * 4)


def test_degenerate_consensus_same_bases():
    pssm = DNAMotif.from_seqs([b"ATGC", b"ATGC"], [0.0] * 4)
    assert pssm.degenerate_consensus() == b"ATGC"


def test_degenerate_consensus_two_bases():
    pssm = DNAMotif.from_seqs([b"AAACCG", b"CGTGTT"], [0.0] * 4)
    assert pssm.degenerate_consensus() == b"MRWSYK"


def test_degenerate_consensus_three_bases():
    pssm = DNAMotif.from_seqs([b"AAAC", b"CCGG", b"GTTT"], [0.0] * 4)
    assert pssm.degenerate_consensus() == b"VHDB"


def test_degenerate_consensus_n():
    pssm = DNAMotif.from_seqs([b"AAAA", b"GGGG", b"CCCC", b"TTTT"], None)
    assert pssm.degenerate_consensus() == b"NNNN"


def test_degenerate_input():
    pssm = DNAMotif.from_seqs([b"ATMC"], [0.0] * 4)
    assert pssm.degenerate_consensus() == b"ATMC"


def test_prot_degenerate_consensus():
    pssm = ProtMotif.from_seqs([b"QVTYNDSA", b"QVTYNDSA"], [0.0] * 20)
    assert pssm.degenerate_consensus() == b"QVTYNDSA"
    pssm = ProtMotif.from_seqs([b"ARNDCEQG", b"GQECDNRA"], [0.0] * 20)
    assert pssm.degenerate_consensus() == b"XXXXXXXX"


def test_prot_x_handling():
    pssm = ProtMotif.from_seqs([b"ARNX"], None)
    assert len(pssm) == 4


def test_score_batch_matches_scalar():
    pssm = DNAMotif.from_seqs([b"ATGC", b"ATGA"], None)
    seqs_list = [b"GGGGATGCGGGG", b"ATGCAA", b"TTTTTTTTATGA"]
    B = len(seqs_list)
    N = max(len(s) for s in seqs_list)
    seqs = np.zeros((B, N), dtype=np.uint8)
    lens = np.zeros(B, dtype=np.int32)
    for i, s in enumerate(seqs_list):
        seqs[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
        lens[i] = len(s)
    out = pssm.score_batch(seqs, lens)
    for i, s in enumerate(seqs_list):
        sp = pssm.score(s)
        assert int(out[i, 0]) == sp.loc
        assert out[i, 1] == pytest.approx(sp.sum, abs=1e-6)


def test_revcomp():
    pssm = DNAMotif.from_seqs([b"AATT"], [0.0] * 4)
    rc = pssm.revcomp()
    assert rc.degenerate_consensus() == b"AATT"
    pssm = DNAMotif.from_seqs([b"AACG"], [0.0] * 4)
    assert pssm.revcomp().degenerate_consensus() == b"CGTT"
