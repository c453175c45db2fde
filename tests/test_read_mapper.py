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


# ---- SMEM-seeded mapper (FMD index, both strands in one index) ----

@pytest.fixture(scope="module")
def smem_mapper(genome):
    from rust_bio_tpu.pipelines.read_mapper import SmemReadMapper

    return SmemReadMapper(genome, min_seed_len=19, flank=8)


def test_smem_mapper_perfect_reads(genome, smem_mapper):
    rng = np.random.default_rng(17)
    starts = [int(s) for s in rng.integers(0, len(genome) - 100, size=8)]
    reads = [genome[s : s + 100] for s in starts]
    out = smem_mapper.map_batch(reads)
    for s, m in zip(starts, out):
        assert (m.strand, m.pos, m.cigar) == ("+", s, "100=")


def test_smem_mapper_reverse_and_errors(genome, smem_mapper):
    rng = np.random.default_rng(18)
    starts = [int(s) for s in rng.integers(0, len(genome) - 100, size=8)]
    reads = []
    for k, s in enumerate(starts):
        r = bytearray(genome[s : s + 100])
        # errors at positions that break EVERY fixed window of the
        # classic 3-window seeding (0, 40, 80 for seed_len=20)
        for pos in (10, 50, 90):
            r[pos] = b"ACGT"[(b"ACGT".index(bytes([r[pos]])) + 1) % 4]
        r = bytes(r)
        reads.append(dna.revcomp(r) if k % 2 else r)
    out = smem_mapper.map_batch(reads)
    for k, (s, m) in enumerate(zip(starts, out)):
        assert m.pos == s, k
        assert m.strand == ("-" if k % 2 else "+")
        assert m.score == 97 * 2 - 3 * 2


@pytest.mark.slow
def test_smem_beats_fixed_window_seeding(genome, mapper, smem_mapper):
    # a read whose every fixed seed window straddles an error: the classic
    # mapper misses it, the SMEM mapper maps it
    rng = np.random.default_rng(19)
    s = 2000
    r = bytearray(genome[s : s + 70])
    for pos in (5, 30, 60):  # seed windows at 0, 25, 50 (len 20) all hit
        r[pos] = b"ACGT"[(b"ACGT".index(bytes([r[pos]])) + 1) % 4]
    out_classic = mapper.map_batch([bytes(r)])
    out_smem = smem_mapper.map_batch([bytes(r)])
    assert out_classic[0].pos == -1
    assert out_smem[0].pos == s


@pytest.mark.slow
def test_smem_mapper_overflow_retry_paths(genome):
    """Slot-overflow lanes must route through the doubled-budget device
    retry and (if still overflowing) the host oracle, with results
    identical to a mapper whose budget never overflows.

    A tandem-repeat region makes the backward extension shed occurrences
    one interval at a time, so a tiny _E0 overflows the candidate slots;
    _E0=2 forces the ovf retry (E=4) and, for the worst lanes, the
    host-oracle fallback."""
    from rust_bio_tpu.pipelines.read_mapper import SmemReadMapper

    rng = np.random.default_rng(23)
    unit = rng.choice(list(b"ACGT"), size=13).astype("uint8").tobytes()
    g = genome[:1500] + unit * 30 + genome[1500:3000]
    big = SmemReadMapper(g, min_seed_len=19, flank=8)
    small = SmemReadMapper(g, min_seed_len=19, flank=8)
    small._E0 = 2

    starts = [1400, 1450, 1495, 1520, 1600, 2100, 2500]
    reads = [g[s : s + 70] for s in starts] + [
        dna.revcomp(g[1480 : 1480 + 70])
    ]
    # the tiny budget must actually overflow on some lane, or this test
    # isn't exercising the retry paths at all
    packed = np.asarray(small._smem_dispatch(reads)[0])
    assert packed[:, 4].any()

    out_small = small.map_batch(reads)
    out_big = big.map_batch(reads)
    for k, (a, b) in enumerate(zip(out_small, out_big)):
        assert (a.pos, a.strand, a.score, a.cigar) == (
            b.pos,
            b.strand,
            b.score,
            b.cigar,
        ), k


@pytest.mark.slow
def test_map_batch_chunked_pipeline_identity(genome, mapper, smem_mapper):
    """Batches >= 2*_PIPE_CHUNK route through the internal chunked
    pipeline; results must be order-identical to the direct path for
    BOTH mapper families."""
    rng = np.random.default_rng(31)
    starts = [int(s) for s in rng.integers(0, len(genome) - 90, size=13)]
    reads = [genome[s : s + 90] for s in starts]
    reads[3] = dna.revcomp(reads[3])
    reads[7] = rng.choice(list(b"ACGT"), size=90).astype("uint8").tobytes()
    for m in (mapper, smem_mapper):
        direct = m.map_batch(reads)
        old = m._PIPE_CHUNK
        try:
            m._PIPE_CHUNK = 4  # force 4 chunks incl. a ragged tail
            chunked = m.map_batch(reads)
        finally:
            m._PIPE_CHUNK = old
        for a, b in zip(chunked, direct):
            assert (a.read_id, a.pos, a.strand, a.score, a.cigar) == (
                b.read_id,
                b.pos,
                b.strand,
                b.score,
                b.cigar,
            )


@pytest.mark.slow
def test_smem_mapper_ragged_lengths(genome, smem_mapper):
    """Mixed read lengths exercise the vectorized per-length revcomp
    grouping (_rc_pb) and the packed extension's ragged mlens/nlens;
    results must match single-length batches read-for-read."""
    rng = np.random.default_rng(53)
    lens = [60, 72, 85, 100, 100, 60, 85, 72]
    starts = [int(s) for s in rng.integers(0, len(genome) - 100, size=8)]
    reads = []
    for k, (s, l) in enumerate(zip(starts, lens)):
        r = genome[s : s + l]
        reads.append(dna.revcomp(r) if k >= 4 else r)
    mixed = smem_mapper.map_batch(reads)
    for k, (s, l, m) in enumerate(zip(starts, lens, mixed)):
        assert m.pos == s, k
        assert m.strand == ("-" if k >= 4 else "+"), k
        assert m.cigar == f"{l}=", k
    # read-for-read identity with uniform-length batches
    for k in range(8):
        solo = smem_mapper.map_batch([reads[k]])
        assert (solo[0].pos, solo[0].strand, solo[0].score, solo[0].cigar) \
            == (mixed[k].pos, mixed[k].strand, mixed[k].score,
                mixed[k].cigar), k


def test_map_stream_pipelined_matches_map_batch():
    """The software-pipelined stream driver (batch i+1's seeding
    dispatched before batch i finishes) must yield exactly map_batch's
    results."""
    import numpy as np

    from rust_bio_tpu.pipelines import ReadMapper

    rng = np.random.default_rng(41)
    genome = rng.choice(list(b"ACGT"), size=3000).astype("uint8").tobytes()
    mapper = ReadMapper(genome, seed_len=20, flank=8)
    batches = []
    for _ in range(3):
        starts = [int(s) for s in rng.integers(0, len(genome) - 80, size=6)]
        batches.append([genome[s : s + 80] for s in starts])

    streamed = list(mapper.map_stream(batches))
    assert len(streamed) == 3
    for bi, reads in enumerate(batches):
        direct = mapper.map_batch(reads)
        for a, b in zip(streamed[bi], direct):
            assert (a.pos, a.strand, a.score, a.cigar) == (
                b.pos,
                b.strand,
                b.score,
                b.cigar,
            )


def test_semiglobal_packed_matches_op_path():
    """PackedSemiglobal (vectorized CIGARs + lazy Alignment decode) must
    reproduce the op-list path exactly."""
    import numpy as np

    from rust_bio_tpu.alignment.pairwise.batched import BatchAligner
    from rust_bio_tpu.alignment.pairwise.scoring import Scoring

    rng = np.random.default_rng(67)
    ba = BatchAligner(Scoring.from_scores(-5, -1, 2, -2))
    xs, ys = [], []
    for _ in range(24):
        N = int(rng.integers(30, 120))
        y = rng.choice(list(b"ACGT"), size=N).astype(np.uint8).tobytes()
        M = int(rng.integers(5, min(60, N)))
        s = int(rng.integers(0, N - M))
        x = bytearray(y[s : s + M])
        for _ in range(int(rng.integers(0, 4))):
            x[int(rng.integers(0, M))] = int(rng.choice(list(b"ACGT")))
        xs.append(bytes(x))
        ys.append(y)
    packed = ba.semiglobal_packed(xs, ys)
    cigars = packed.cigars()
    want = ba.semiglobal(xs, ys)
    for k in range(len(xs)):
        assert int(packed.score[k]) == want[k].score, k
        assert cigars[k] == want[k].cigar(), (k, cigars[k], want[k].cigar())
        got_aln = packed.alignment(k)
        assert got_aln.operations == want[k].operations, k
        for f in ("xstart", "xend", "ystart", "yend"):
            assert getattr(got_aln, f) == getattr(want[k], f), (k, f)


def test_global_packed_matches_op_path():
    """global_packed (single-pull column-RLE + vectorized CIGARs) must
    reproduce the global_ op-list path exactly."""
    import numpy as np

    from rust_bio_tpu.alignment.pairwise.batched import BatchAligner
    from rust_bio_tpu.alignment.pairwise.scoring import Scoring

    rng = np.random.default_rng(71)
    ba = BatchAligner(Scoring.from_scores(-5, -1, 2, -2))
    xs, ys = [], []
    for _ in range(24):
        N = int(rng.integers(20, 120))
        y = rng.choice(list(b"ACGT"), size=N).astype(np.uint8).tobytes()
        M = int(rng.integers(5, N + 1))
        x = bytearray(
            rng.choice(list(b"ACGT"), size=M).astype(np.uint8).tobytes()
        )
        xs.append(bytes(x))
        ys.append(y)
    packed = ba.global_packed(xs, ys)
    cigars = packed.cigars()
    want = ba.global_(xs, ys)
    from itertools import groupby

    from rust_bio_tpu.alignment.types import Del, Ins, Match, Subst

    ch = {Match: "=", Subst: "X", Ins: "I", Del: "D"}
    for k in range(len(xs)):
        assert int(packed.score[k]) == want[k].score, k
        # the reference forbids .cigar() in Global mode; build the string
        # from the op list (no clips exist in global mode)
        exp = "".join(
            f"{len(list(g))}{ch[op]}"
            for op, g in groupby(want[k].operations)
        )
        assert cigars[k] == exp, (k, cigars[k], exp)
        got_aln = packed.alignment(k)
        assert got_aln.operations == want[k].operations, k
        for f in ("xstart", "xend", "ystart", "yend"):
            assert getattr(got_aln, f) == getattr(want[k], f), (k, f)


def test_smem_mapper_indel_reads(genome, smem_mapper):
    """Golden SMEM+indel evidence: reads with 1-3 bp insertions/deletions
    must map to the true position with the indel in the CIGAR (the
    extension path is the shared semiglobal engine, so indels ride the
    same affine-gap DP as the pairwise tests)."""
    import re

    # deletions: read skips k genome bases at offset d
    for k, d, s in ((1, 30, 500), (2, 70, 1200), (3, 25, 2300)):
        read = genome[s : s + d] + genome[s + d + k : s + d + k + (100 - d)]
        assert len(read) == 100
        m = smem_mapper.map_batch([read])[0]
        assert m.pos == s, (k, d)
        assert m.strand == "+"
        mt = re.fullmatch(r"(\d+)=(\d)D(\d+)=", m.cigar)
        assert mt, (k, d, m.cigar)
        assert int(mt.group(2)) == k
        assert int(mt.group(1)) + int(mt.group(3)) == 100
        assert m.score == 100 * 2 - (5 + (k - 1) * 1)

    # insertions: k novel bases spliced in at offset d (choose bases that
    # differ from the genome continuation so the aligner can't absorb
    # them as matches)
    rng = np.random.default_rng(23)
    for k, d, s in ((1, 40, 800), (2, 65, 1600), (3, 35, 3100)):
        ins = bytes(
            b"ACGT"[(b"ACGT".index(genome[s + d + j : s + d + j + 1]) + 1) % 4]
            for j in range(k)
        )
        read = genome[s : s + d] + ins + genome[s + d : s + d + (100 - d - k)]
        assert len(read) == 100
        m = smem_mapper.map_batch([read])[0]
        assert m.pos == s, (k, d)
        assert m.strand == "+"
        # insertion may shift within a local repeat; require exactly one
        # k-length I run and 100 read bases consumed
        runs = re.findall(r"(\d+)([=XID])", m.cigar)
        assert [int(n) for n, c in runs if c == "I"] == [k], (k, d, m.cigar)
        consumed = sum(int(n) for n, c in runs if c in "=XI")
        assert consumed == 100, m.cigar
        assert m.score >= (100 - k) * 2 - (5 + (k - 1) * 1) - 4 * 2, (k, d, m.cigar)

    # reverse-strand indel read
    s, k, d = 4000, 2, 55
    read = genome[s : s + d] + genome[s + d + k : s + d + k + (100 - d)]
    from rust_bio_tpu.alphabets import dna as _dna

    m = smem_mapper.map_batch([_dna.revcomp(read)])[0]
    assert (m.pos, m.strand) == (s, "-")
    assert re.fullmatch(r"(\d+)=2D(\d+)=", m.cigar), m.cigar


def test_smem_mapper_index_cache_roundtrip(genome, tmp_path):
    """SmemReadMapper(index_cache=...) must build+save on first run and
    rehydrate an identical-behavior index on the second (the genome-scale
    bench path: SAIS once, load forever)."""
    import os

    from rust_bio_tpu.pipelines.read_mapper import SmemReadMapper

    cache = str(tmp_path / "fmd_idx.npz")
    m1 = SmemReadMapper(genome, min_seed_len=19, index_cache=cache)
    assert os.path.exists(cache)
    m2 = SmemReadMapper(genome, min_seed_len=19, index_cache=cache)

    rng = np.random.default_rng(91)
    starts = [int(s) for s in rng.integers(0, len(genome) - 100, size=12)]
    reads = []
    for k, s in enumerate(starts):
        r = bytearray(genome[s : s + 100])
        for _ in range(2):
            r[int(rng.integers(0, 100))] = int(rng.choice(list(b"ACGT")))
        r = bytes(r)
        reads.append(dna.revcomp(r) if k % 2 else r)
    out1 = m1.map_batch(reads)
    out2 = m2.map_batch(reads)
    for a, b in zip(out1, out2):
        assert (a.pos, a.strand, a.score, a.cigar) == (
            b.pos, b.strand, b.score, b.cigar,
        )
    # host-oracle fallback path must also work from a rehydrated index
    assert m2.host_fmd is not None


def test_native_cigar_emitter_matches_numpy_merge():
    """The threaded native column-RLE CIGAR emitter must byte-match the
    numpy merge (itself tested against the op-list path) on mixed
    semiglobal/global batches with clips, long runs, and ragged lens."""
    import numpy as np

    from rust_bio_tpu import native as _native
    from rust_bio_tpu.alignment.pairwise.batched import BatchAligner
    from rust_bio_tpu.alignment.pairwise.scoring import Scoring

    if _native.get_lib() is None:
        import pytest

        pytest.skip("native library unavailable")

    rng = np.random.default_rng(83)
    ba = BatchAligner(Scoring.from_scores(-5, -1, 2, -2))
    xs, ys = [], []
    for _ in range(32):
        N = int(rng.integers(30, 200))
        y = rng.choice(list(b"ACGT"), size=N).astype(np.uint8).tobytes()
        M = int(rng.integers(5, min(80, N)))
        s = int(rng.integers(0, N - M))
        x = bytearray(y[s : s + M])
        for _ in range(int(rng.integers(0, 6))):
            x[int(rng.integers(0, M))] = int(rng.choice(list(b"ACGT")))
        xs.append(bytes(x))
        ys.append(y)
    for packed in (ba.semiglobal_packed(xs, ys), ba.global_packed(xs, ys)):
        up = packed._up
        B = len(packed.mlens)
        N = int(packed.nlens.max())
        native = _native.cigars_colrle(
            up["exit_op"][:N].T, up["ins_cnt"][:N].T,
            packed.nlens, packed.mlens, up["ins0"],
            up["fix_exit"], up["fix_ins"], packed.xstart, packed.xend,
        )
        assert native is not None
        # numpy-merge reference: force the fallback path
        import rust_bio_tpu.native as nat_mod

        orig = nat_mod.cigars_colrle
        try:
            nat_mod.cigars_colrle = lambda *a, **k: None
            want = packed.cigars()
        finally:
            nat_mod.cigars_colrle = orig
        assert native == want
