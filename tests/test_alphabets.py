import numpy as np

from rust_bio_tpu.alphabets import Alphabet, RankTransform, dna, protein, rna


def test_dna_alphabet_words():
    # reference: src/alphabets/dna.rs doctests + tests
    assert dna.alphabet().is_word(b"GATTACA")
    assert dna.alphabet().is_word(b"gattaca")
    assert not dna.alphabet().is_word(b"ACGU")
    assert not dna.alphabet().is_word(b"gaUUaca")
    assert not dna.alphabet().is_word(b"#")
    assert not dna.alphabet().is_word(b"42")


def test_dna_complement_values():
    assert dna.complement(65) == 84  # A -> T
    assert dna.complement(99) == 103  # c -> g
    assert dna.complement(78) == 78  # N -> N
    assert dna.complement(89) == 82  # Y -> R
    assert dna.complement(115) == 115  # s -> s


def test_dna_revcomp():
    assert dna.revcomp(b"ACGTN") == b"NACGT"
    assert dna.revcomp(b"GaTtaCA") == b"TGtaAtC"
    assert dna.revcomp(b"AGCTYRWSKMDVHBN") == b"NVDBHKMSWYRAGCT"


def test_rna():
    assert rna.alphabet().is_word(b"GAUUACA")
    assert rna.complement(65) == 85  # A -> U
    assert rna.complement(103) == 99  # g -> c
    assert rna.revcomp(b"ACGUN") == b"NACGU"
    assert rna.revcomp(b"GaUuaCA") == b"UGuaAuC"
    assert rna.revcomp(b"AGCUYRWSKMDVHBNZ") == b"ZNVDBHKMSWYRAGCU"


def test_protein():
    assert protein.alphabet().is_word(b"PRSkl")
    assert not protein.alphabet().is_word(b"Bb")
    assert protein.iupac_alphabet().is_word(b"XMN")


def test_alphabet_ops():
    a = Alphabet(b"ACGTacgt")
    assert a.max_symbol() == ord("t")
    assert Alphabet(b"").max_symbol() is None
    assert len(a) == 8
    a2 = Alphabet(b"ACGT")
    assert a.intersection(a2) == a2
    assert a.difference(a2) == Alphabet(b"acgt")
    assert a2.union(Alphabet(b"acgt")) == a
    a3 = Alphabet(b"ACGTacgt")
    assert not a3.is_word(b"N")
    a3.insert(78)
    assert a3.is_word(b"N")


def test_rank_transform():
    rt = RankTransform(Alphabet(b"acgtACGT"))
    assert rt.get(65) == 0  # 'A'
    assert rt.get(116) == 7  # 't'
    assert list(rt.transform(b"aAcCgGtT")) == [4, 0, 5, 1, 6, 2, 7, 3]
    assert rt.get_width() == 3
    assert RankTransform(Alphabet(b"ACGT")).get_width() == 2
    assert RankTransform(Alphabet(b"ACGTN")).get_width() == 3


def test_qgrams():
    rt = RankTransform(Alphabet(b"ACGTacgt"))
    assert list(rt.qgrams(2, b"ACGT")) == [1, 10, 19]
    assert list(rt.rev_qgrams(2, b"ACGT")) == [19, 10, 1]
    assert rt.alphabet() == Alphabet(b"ACGTacgt")
