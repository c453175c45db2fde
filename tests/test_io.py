"""IO layer tests (reference: src/io/ unit/doctest behavior)."""

import io

import numpy as np
import pytest

from rust_bio_tpu.io import batch, bed, bedpe, fasta, fastq, fastx, gff, newick


FASTA_TEXT = b""">id desc
ACCGTAGGCTGA
CCGTAGGCTGAA
CGTAGGCTGAAA
GTAGGCTGAAAA
CCCC
>id2
ATTGTTGTTTTA
ATTGTTGTTTTA
ATTGTTGTTTTA
GGGG
"""

FASTQ_TEXT = b"""@id desc
ACCGTAGGCTGA
+
IIIIIIIIIIII
@id2
ATTGTTGTTTTA
+
IIIIIIIIIIII
"""


def test_fasta_reader():
    recs = list(fasta.Reader(io.BytesIO(FASTA_TEXT)).records())
    assert len(recs) == 2
    assert recs[0].id == "id"
    assert recs[0].desc == "desc"
    assert recs[0].seq == b"ACCGTAGGCTGACCGTAGGCTGAACGTAGGCTGAAAGTAGGCTGAAAACCCC"
    assert recs[1].id == "id2"
    assert recs[1].desc is None
    assert recs[0].check() is None


def test_fasta_record_check():
    assert fasta.Record(id="", seq=b"ACGT").check() is not None
    assert fasta.Record(id="x", seq=b"AC GT").check() is not None
    assert fasta.Record(id="x", seq=b"AC-GT.*").check() is None


def test_fasta_writer_roundtrip():
    out = io.BytesIO()
    w = fasta.Writer(out, line_width=12)
    for r in fasta.Reader(io.BytesIO(FASTA_TEXT)).records():
        w.write_record(r)
    out.seek(0)
    recs = list(fasta.Reader(out).records())
    assert recs[0].seq == b"ACCGTAGGCTGACCGTAGGCTGAACGTAGGCTGAAAGTAGGCTGAAAACCCC"


def test_fasta_indexed_reader(tmp_path):
    p = tmp_path / "test.fa"
    p.write_bytes(FASTA_TEXT)
    idx = fasta.Index.build(p)
    assert [s.name for s in idx.sequences()] == ["id", "id2"]
    assert idx.sequences()[0].len == 52
    r = fasta.IndexedReader(open(p, "rb"), idx)
    r.fetch("id", 12, 26)
    assert r.read() == b"CCGTAGGCTGAACG"
    r.fetch_all("id2")
    assert r.read() == b"ATTGTTGTTTTAATTGTTGTTTTAATTGTTGTTTTAGGGG"
    r.fetch_by_rid(0, 0, 4)
    assert r.read() == b"ACCG"
    # index write/read roundtrip
    fai = tmp_path / "test.fa.fai"
    idx.write(fai)
    idx2 = fasta.Index.new(open(fai, "rb"))
    assert [s.len for s in idx2.sequences()] == [52, 40]


def test_fastq_reader():
    recs = list(fastq.Reader(io.BytesIO(FASTQ_TEXT)).records())
    assert len(recs) == 2
    assert recs[0].id == "id"
    assert recs[0].desc == "desc"
    assert recs[0].seq == b"ACCGTAGGCTGA"
    assert recs[0].qual == b"IIIIIIIIIIII"
    assert recs[0].check() is None
    bad = fastq.Record(id="x", seq=b"ACGT", qual=b"III")
    assert bad.check() is not None


def test_fastq_writer_roundtrip():
    out = io.BytesIO()
    w = fastq.Writer(out)
    for r in fastq.Reader(io.BytesIO(FASTQ_TEXT)).records():
        w.write_record(r)
    out.seek(0)
    recs = list(fastq.Reader(out).records())
    assert recs[0].seq == b"ACCGTAGGCTGA"


def test_fastx_autodetect():
    assert fastx.get_kind(FASTA_TEXT) == fastx.Kind.FASTA
    assert fastx.get_kind(FASTQ_TEXT) == fastx.Kind.FASTQ
    recs = list(fastx.EitherRecords(io.BytesIO(FASTQ_TEXT)))
    assert recs[0].kind == fastx.Kind.FASTQ
    assert recs[0].qual == b"IIIIIIIIIIII"
    recs = list(fastx.EitherRecords(io.BytesIO(FASTA_TEXT)))
    assert recs[0].kind == fastx.Kind.FASTA
    assert recs[0].qual is None
    assert recs[0].to_fastq().qual == b"I" * len(recs[0].seq)


BED_TEXT = "1\t5\t5000\tname1\tup\n2\t3\t5005\tname2\tup\n"


def test_bed_roundtrip():
    recs = list(bed.Reader(io.StringIO(BED_TEXT)).records())
    assert len(recs) == 2
    assert recs[0].chrom == "1"
    assert recs[0].start == 5
    assert recs[0].end == 5000
    assert recs[0].name() == "name1"
    assert recs[0].score() == "up"
    out = io.StringIO()
    w = bed.Writer(out)
    for r in recs:
        w.write(r)
    assert out.getvalue() == BED_TEXT


BEDPE_TEXT = "1\t5\t5000\t2\t10\t5010\tname1\t5\t+\t-\n"


def test_bedpe_roundtrip():
    recs = list(bedpe.Reader(io.StringIO(BEDPE_TEXT)).records())
    r = recs[0]
    assert (r.chrom1, r.start1, r.end1) == ("1", 5, 5000)
    assert (r.chrom2, r.start2, r.end2) == ("2", 10, 5010)
    assert r.name() == "name1"
    assert r.score() == "5"
    assert r.strand1() == "+"
    assert r.strand2() == "-"
    out = io.StringIO()
    bedpe.Writer(out).write(r)
    assert out.getvalue() == BEDPE_TEXT


GFF_TEXT = (
    "P0A7B8\tUniProtKB\tInitiator methionine\t1\t1\t.\t.\t.\t"
    "Note=Removed,Obsolete;ID=test\n"
)


def test_gff3_roundtrip():
    recs = list(gff.Reader(io.StringIO(GFF_TEXT), gff.GffType.GFF3).records())
    r = recs[0]
    assert r.seqname == "P0A7B8"
    assert r.feature_type == "Initiator methionine"
    assert (r.start, r.end) == (1, 1)
    assert r.attributes["Note"] == ["Removed", "Obsolete"]
    assert r.attribute("ID") == "test"
    out = io.StringIO()
    gff.Writer(out, gff.GffType.GFF3).write(r)
    back = list(gff.Reader(io.StringIO(out.getvalue()), gff.GffType.GFF3).records())
    assert back[0].attributes == r.attributes


def test_gff3_percent_encoding():
    r = gff.Record(
        seqname="c1", source="s", feature_type="gene", start=1, end=10,
        attributes={"Note": ["a;b=c"], "X": ["1", "2"], "Y": ["p,q"]},
    )
    out = io.StringIO()
    gff.Writer(out, gff.GffType.GFF3).write(r)
    line = out.getvalue()
    assert "a%3Bb%3Dc" in line
    back = list(gff.Reader(io.StringIO(line), gff.GffType.GFF3).records())
    assert back[0].attributes["Note"] == ["a;b=c"]
    # multi-values are comma-joined on write and split on read
    assert back[0].attributes["X"] == ["1", "2"]
    # a literal comma inside one value is percent-encoded and roundtrips
    assert back[0].attributes["Y"] == ["p,q"]


def test_gtf2_attributes():
    line = '1\thavana\tgene\t11869\t14409\t.\t+\t.\tgene_id "ENSG0000"; gene_name "DDX11L1";\n'
    recs = list(gff.Reader(io.StringIO(line), gff.GffType.GTF2).records())
    assert recs[0].attribute("gene_id") == "ENSG0000"
    assert recs[0].attribute("gene_name") == "DDX11L1"
    out = io.StringIO()
    gff.Writer(out, gff.GffType.GTF2).write(recs[0])
    assert "%" not in out.getvalue()


def test_newick():
    t = newick.from_string("(A:0.1,B:0.2,(C:0.3,D:0.4)E:0.5)F;")
    assert t.leaf_names() == ["A", "B", "C", "D"]
    assert t.node_count() == 6
    s = newick.to_string(t)
    t2 = newick.from_string(s)
    assert t2.leaf_names() == t.leaf_names()


def test_batching():
    rng = np.random.default_rng(0)
    records = []
    for i in range(300):
        n = int(rng.integers(30, 200))
        records.append(
            fastq.Record(
                id=f"r{i}",
                seq=rng.choice(list(b"ACGT"), size=n).astype("uint8").tobytes(),
                qual=b"I" * n,
            )
        )
    batches = list(batch.bucketed_batches(records, batch_size=64))
    total = sum(len(b) for b in batches)
    assert total == 300
    for b in batches:
        assert b.seqs.shape == b.quals.shape
        assert b.seqs.shape[1] % 8 == 0
        for i in range(len(b)):
            assert (b.seqs[i, b.lens[i] :] == 0).all()
