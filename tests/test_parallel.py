"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Determinism contract (SURVEY §4): sharded execution must equal the
single-device kernel bit-for-bit.
"""

import jax
import numpy as np
import pytest

from rust_bio_tpu import parallel
from rust_bio_tpu.alignment.pairwise.batched import BatchAligner
from rust_bio_tpu.alignment.pairwise.scoring import Scoring
from rust_bio_tpu.alphabets import dna
from rust_bio_tpu.data_structures.bwt import Occ, bwt, less
from rust_bio_tpu.data_structures.fm_device import DeviceFMIndex
from rust_bio_tpu.data_structures.fmindex import FMIndex
from rust_bio_tpu.data_structures.suffix_array import suffix_array
from rust_bio_tpu.parallel.pipeline import ShardedAligner, ShardedFMIndex

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the virtual 8-device mesh"
)


def _batch(rng, B, M, N):
    xb = rng.integers(0, 4, size=(B, M)).astype(np.uint8) + ord("A")
    yb = rng.integers(0, 4, size=(B, N)).astype(np.uint8) + ord("A")
    mlens = rng.integers(1, M + 1, size=B).astype(np.int32)
    nlens = rng.integers(1, N + 1, size=B).astype(np.int32)
    return xb, yb, mlens, nlens


def test_mesh_shapes():
    mesh = parallel.make_mesh()
    assert mesh.shape["data"] * mesh.shape["model"] == len(jax.devices())


@pytest.mark.parametrize("mode", ["global", "semiglobal", "local"])
def test_sharded_scores_match_single_device(mode):
    rng = np.random.default_rng(0)
    B = 37  # deliberately not divisible by 8
    xb, yb, mlens, nlens = _batch(rng, B, 24, 30)
    scoring = Scoring.from_scores(-5, -1, 2, -2)
    sharded = ShardedAligner(scoring, parallel.make_mesh())
    got = sharded.scores(xb, yb, mlens, nlens, mode)

    single = BatchAligner(scoring)
    xs = [xb[i, : mlens[i]].tobytes() for i in range(B)]
    ys = [yb[i, : nlens[i]].tobytes() for i in range(B)]
    want = single.scores(xs, ys, mode)
    np.testing.assert_array_equal(got, want)


def test_sharded_fmindex_matches_host():
    rng = np.random.default_rng(1)
    text = rng.choice(list(b"ACGT"), size=400).astype("uint8").tobytes() + b"$"
    alphabet = dna.n_alphabet()
    sa = suffix_array(text)
    b = bwt(text, sa)
    fm = FMIndex(b, less(b, alphabet), Occ(b, 32, alphabet))
    dev = DeviceFMIndex(b, alphabet, sa=sa, sampling_rate=8)
    sharded = ShardedFMIndex(dev, parallel.make_mesh())

    patterns = []
    for _ in range(21):
        ln = int(rng.integers(1, 15))
        if rng.random() < 0.6:
            start = int(rng.integers(0, len(text) - ln - 1))
            patterns.append(text[start : start + ln])
        else:
            patterns.append(
                rng.choice(list(b"ACGT"), size=ln).astype("uint8").tobytes()
            )
    got = sharded.backward_search_batch(patterns)
    for pat, res in zip(patterns, got):
        expect = fm.backward_search(pat)
        assert res.kind == expect.kind
        if res.interval is not None:
            assert res.interval == expect.interval


def test_occ_sharded_fmindex_matches_host():
    rng = np.random.default_rng(2)
    text = rng.choice(list(b"ACGT"), size=600).astype("uint8").tobytes() + b"$"
    alphabet = dna.n_alphabet()
    sa = suffix_array(text)
    b = bwt(text, sa)
    fm = FMIndex(b, less(b, alphabet), Occ(b, 32, alphabet))
    dev = DeviceFMIndex(b, alphabet)
    sharded = ShardedFMIndex(
        dev, parallel.make_mesh(n_data=2, n_model=4), index_sharding="occ_sharded"
    )
    patterns = []
    for _ in range(16):
        ln = int(rng.integers(1, 18))
        start = int(rng.integers(0, len(text) - ln - 1))
        patterns.append(text[start : start + ln])
    got = sharded.backward_search_batch(patterns)
    for pat, res in zip(patterns, got):
        expect = fm.backward_search(pat)
        assert res.kind == expect.kind
        if res.interval is not None:
            assert res.interval == expect.interval


@pytest.mark.slow
def test_sharded_read_mapper_matches_single_device():
    from rust_bio_tpu import parallel
    from rust_bio_tpu.parallel.pipeline import ShardedReadMapper
    from rust_bio_tpu.pipelines import ReadMapper
    from rust_bio_tpu.alphabets import dna

    rng = np.random.default_rng(23)
    genome = rng.choice(list(b"ACGT"), size=3000).astype("uint8").tobytes()
    mesh = parallel.make_mesh()
    smapper = ShardedReadMapper(genome, mesh=mesh, seed_len=20, flank=8)
    mapper = ReadMapper(genome, seed_len=20, flank=8)

    starts = [int(s) for s in rng.integers(0, len(genome) - 80, size=10)]
    reads = [genome[s : s + 80] for s in starts[:7]]
    reads += [dna.revcomp(genome[s : s + 80]) for s in starts[7:]]
    junk = rng.choice(list(b"ACGT"), size=80).astype("uint8").tobytes()
    reads.append(junk)

    got = smapper.map_batch(reads)
    want = mapper.map_batch(reads)
    for g, w in zip(got, want):
        assert (g.pos, g.strand, g.score, g.cigar) == (
            w.pos, w.strand, w.score, w.cigar
        )
