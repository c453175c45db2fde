"""Checkpointed streaming pipeline: crash/resume + idempotent shards."""

import os

import numpy as np
import pytest

from rust_bio_tpu.pipelines import ReadMapper
from rust_bio_tpu.pipelines.stream import StreamingMapper


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    rng = np.random.default_rng(99)
    genome = rng.choice(list(b"ACGT"), size=4000).astype("uint8").tobytes()
    mapper = ReadMapper(genome, seed_len=20, flank=8)
    d = tmp_path_factory.mktemp("stream")
    fq = d / "reads.fq"
    starts = [int(s) for s in rng.integers(0, len(genome) - 80, size=40)]
    with open(fq, "w") as f:
        for k, s in enumerate(starts):
            seq = genome[s : s + 80].decode()
            f.write(f"@r{k}\n{seq}\n+\n{'I' * 80}\n")
    return mapper, str(fq), str(d), starts


def test_stream_and_finalize(setup):
    mapper, fq, d, starts = setup
    out = os.path.join(d, "out.tsv")
    ck = os.path.join(d, "ck.json")
    stats = []
    sm = StreamingMapper(mapper, batch_size=16, on_stats=stats.append)
    n = sm.run(fq, out, ck)
    assert n == 3  # 40 reads / 16 per batch
    assert len(stats) == 3 and stats[0]["mapped"] == 16
    sm.finalize(out)
    lines = open(out).read().strip().split("\n")
    assert len(lines) == 40
    for k, (line, s) in enumerate(zip(lines, starts)):
        rid, pos, strand, score, cigar = line.split("\t")
        assert rid == f"r{k}" and int(pos) == s and cigar == "80="


def test_crash_resume_is_idempotent(setup):
    mapper, fq, d, starts = setup
    out = os.path.join(d, "out2.tsv")
    ck = os.path.join(d, "ck2.json")

    class Boom(RuntimeError):
        pass

    calls = {"n": 0}
    real = mapper.map_batch

    def flaky(reads, ids=None):
        calls["n"] += 1
        if calls["n"] == 2:
            raise Boom()
        return real(reads, ids)

    mapper.map_batch = flaky
    sm = StreamingMapper(mapper, batch_size=16)
    with pytest.raises(Boom):
        sm.run(fq, out, ck)
    # batch 0 committed, batch 1 crashed mid-flight: no partial shard
    assert os.path.exists(sm._shard_path(out, 0))
    assert not os.path.exists(sm._shard_path(out, 1))

    mapper.map_batch = real
    n = sm.run(fq, out, ck)  # resume: skips batch 0
    assert n == 2
    sm.finalize(out)
    assert len(open(out).read().strip().split("\n")) == 40


def test_input_change_restarts(setup, tmp_path):
    mapper, fq, d, starts = setup
    out = str(tmp_path / "out3.tsv")
    ck = str(tmp_path / "ck3.json")
    sm = StreamingMapper(mapper, batch_size=32)
    assert sm.run(fq, out, ck) == 2
    # same checkpoint against a DIFFERENT input must not skip anything
    fq2 = str(tmp_path / "other.fq")
    with open(fq2, "w") as f:
        f.write("@x\n" + "ACGT" * 20 + "\n+\n" + "I" * 80 + "\n")
    assert sm.run(fq2, out, ck) == 1
