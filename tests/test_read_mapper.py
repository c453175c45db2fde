"""End-to-end seed-and-extend read mapper (pipelines.read_mapper)."""

import numpy as np
import pytest

from rust_bio_tpu.alphabets import dna
from rust_bio_tpu.pipelines import MappedRead, ReadMapper


@pytest.fixture(scope="module")
def genome():
    rng = np.random.default_rng(1234)
    return rng.choice(list(b"ACGT"), size=5000).astype("uint8").tobytes()


@pytest.fixture(scope="module")
def mapper(genome):
    return ReadMapper(genome, seed_len=20, flank=8)


def test_perfect_forward_reads(genome, mapper):
    rng = np.random.default_rng(7)
    starts = [int(s) for s in rng.integers(0, len(genome) - 100, size=16)]
    reads = [genome[s : s + 100] for s in starts]
    out = mapper.map_batch(reads)
    for s, m in zip(starts, out):
        assert m.strand == "+"
        assert m.pos == s
        assert m.cigar == "100="
        assert m.score == 200  # 100 matches * 2


def test_reverse_strand_reads(genome, mapper):
    rng = np.random.default_rng(8)
    starts = [int(s) for s in rng.integers(0, len(genome) - 100, size=8)]
    reads = [dna.revcomp(genome[s : s + 100]) for s in starts]
    out = mapper.map_batch(reads)
    for s, m in zip(starts, out):
        assert m.strand == "-"
        assert m.pos == s
        assert m.cigar == "100="


def test_reads_with_mismatches(genome, mapper):
    rng = np.random.default_rng(9)
    starts = [int(s) for s in rng.integers(0, len(genome) - 100, size=8)]
    reads = []
    for s in starts:
        r = bytearray(genome[s : s + 100])
        # mutate a base outside every seed window (seeds at 0, 40, 80)
        pos = 30
        r[pos] = b"ACGT"[(b"ACGT".index(bytes([r[pos]])) + 1) % 4]
        reads.append(bytes(r))
    out = mapper.map_batch(reads)
    for s, m in zip(starts, out):
        assert m.pos == s
        assert m.score == 99 * 2 - 2
        assert m.cigar in ("30=1X69=",)


def test_read_with_deletion(genome, mapper):
    s = 1000
    # read skips 3 genome bases at offset 50 -> 'D' in the CIGAR
    read = genome[s : s + 50] + genome[s + 53 : s + 103]
    out = mapper.map_batch([read])
    m = out[0]
    assert m.pos == s
    assert "D" in m.cigar
    # deletion placement may shift within a repeat; shape must be k=3D(100-k)=
    import re

    mt = re.fullmatch(r"(\d+)=3D(\d+)=", m.cigar)
    assert mt and int(mt.group(1)) + int(mt.group(2)) == 100


def test_unmapped_read(mapper):
    rng = np.random.default_rng(10)
    junk = rng.choice(list(b"ACGT"), size=100).astype("uint8").tobytes()
    # random 100-mer almost surely lacks any exact 20-mer from the genome
    out = mapper.map_batch([junk])
    assert out[0].pos == -1
    assert out[0].alignment is None


def test_mixed_batch(genome, mapper):
    rng = np.random.default_rng(11)
    fwd = genome[200:300]
    rev = dna.revcomp(genome[400:500])
    junk = rng.choice(list(b"ACGT"), size=100).astype("uint8").tobytes()
    out = mapper.map_batch([fwd, junk, rev], ids=["a", "b", "c"])
    assert [m.read_id for m in out] == ["a", "b", "c"]
    assert out[0].pos == 200 and out[0].strand == "+"
    assert out[1].pos == -1
    assert out[2].pos == 400 and out[2].strand == "-"
    assert isinstance(out[0], MappedRead)
