"""Pallas SW kernels vs the XLA batched oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rust_bio_tpu.alignment.pairwise.batched import BatchAligner
from rust_bio_tpu.alignment.pairwise.scoring import Scoring
from rust_bio_tpu.ops.sw_pallas import (
    subs_tensor,
    sw_scores_global,
    sw_scores_global_matchparams,
)


def _rand_batch(rng, B, M, N):
    xb = rng.integers(0, 4, size=(B, M)).astype(np.uint8) + ord("A")
    yb = rng.integers(0, 4, size=(B, N)).astype(np.uint8) + ord("A")
    mlens = rng.integers(1, M + 1, size=B).astype(np.int32)
    nlens = rng.integers(1, N + 1, size=B).astype(np.int32)
    return xb, yb, mlens, nlens


def _oracle_scores(scoring, xb, yb, mlens, nlens):
    ba = BatchAligner(scoring)
    xs = [xb[i, : mlens[i]].tobytes() for i in range(len(xb))]
    ys = [yb[i, : nlens[i]].tobytes() for i in range(len(yb))]
    return ba.scores(xs, ys, "global")


def test_pallas_matchparams_matches_oracle():
    rng = np.random.default_rng(0)
    B, M, N = 256, 20, 26
    xb, yb, mlens, nlens = _rand_batch(rng, B, M, N)
    scoring = Scoring.from_scores(-5, -1, 2, -2)
    got = np.asarray(
        sw_scores_global_matchparams(
            jnp.asarray(xb), jnp.asarray(yb),
            jnp.asarray(mlens), jnp.asarray(nlens),
            2, -2, -5, -1, block_b=128,
        )
    )
    want = _oracle_scores(scoring, xb, yb, mlens, nlens)
    np.testing.assert_array_equal(got, want)


def test_pallas_subs_tensor_kernel_matches_oracle():
    rng = np.random.default_rng(1)
    B, M, N = 128, 16, 18
    xb, yb, mlens, nlens = _rand_batch(rng, B, M, N)
    scoring = Scoring.from_scores(-3, -1, 1, -1)
    lut = jnp.asarray(scoring.dense_lut())
    subs = subs_tensor(jnp.asarray(xb), jnp.asarray(yb), lut)
    got = np.asarray(
        sw_scores_global(
            subs, jnp.asarray(mlens), jnp.asarray(nlens), -3, -1, block_b=128
        )
    )
    want = _oracle_scores(scoring, xb, yb, mlens, nlens)
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_full_scan_engine_chunked_matches_scalar(monkeypatch):
    """Full traceback engine through the chunked Pallas scan, multi-chunk
    path forced (K < N), vs the scalar aligner."""
    import random

    from rust_bio_tpu.ops import sw_pallas
    from rust_bio_tpu.alignment.pairwise.scalar import Aligner

    real_pick = sw_pallas._pick_block
    monkeypatch.setattr(
        sw_pallas, "_pick_block",
        lambda B, M, N, **kw: (real_pick(B, M, N)[0], max(1, N // 3)),
    )

    rng = random.Random(21)
    sc = Scoring.from_scores(-5, -1, 2, -2)
    ba = BatchAligner(sc)
    sa = Aligner.with_scoring(sc)
    B = 16
    xs = [
        bytes(rng.choice(b"ACGT") for _ in range(rng.randint(1, 20)))
        for _ in range(B)
    ]
    ys = [
        bytes(rng.choice(b"ACGT") for _ in range(rng.randint(1, 25)))
        for _ in range(B)
    ]
    for mode in ("global_", "semiglobal", "local"):
        got = getattr(ba, mode)(xs, ys)
        for k, (x, y) in enumerate(zip(xs, ys)):
            want = getattr(sa, mode)(x, y)
            assert got[k].score == want.score, (mode, k)
            assert got[k].operations == want.operations, (mode, k)


@pytest.mark.parametrize("go,ge", [(-5, -1), (-2, -2), (-1, -1)])
def test_global_transposed_kernel_matches_scalar(monkeypatch, go, ge):
    """Transposed global-mode kernel vs scalar aligner: scores, ops, and
    tie-breaks (go == ge exercises the open-vs-extend tie), multi-chunk."""
    import random

    from rust_bio_tpu.ops import sw_pallas
    from rust_bio_tpu.alignment.pairwise.scalar import Aligner

    real_pick = sw_pallas._pick_block_global
    monkeypatch.setattr(
        sw_pallas, "_pick_block_global",
        lambda B, M, N, **kw: (real_pick(B, M, N)[0], max(1, N // 4)),
    )

    rng = random.Random(go * 100 + ge)
    sc = Scoring.from_scores(go, ge, 2, -3)
    ba = BatchAligner(sc)
    sa = Aligner.with_scoring(sc)
    xs, ys = [], []
    for _ in range(24):
        xs.append(bytes(rng.choice(b"ACGT") for _ in range(rng.randint(0, 18))))
        ys.append(bytes(rng.choice(b"ACGT") for _ in range(rng.randint(0, 22))))
    got = ba.global_(xs, ys)
    for k, (x, y) in enumerate(zip(xs, ys)):
        want = sa.global_(x, y)
        assert got[k].score == want.score, (k, x, y)
        assert got[k].operations == want.operations, (k, x, y)
        assert (got[k].xstart, got[k].xend, got[k].ystart, got[k].yend) == (
            want.xstart, want.xend, want.ystart, want.yend
        ), (k, x, y)


@pytest.mark.parametrize("go,ge", [(-5, -1), (-2, -2)])
def test_semiglobal_transposed_kernel_matches_scalar(monkeypatch, go, ge):
    """Transposed semiglobal kernel (live y-clips + suffix fixups + y-clip
    walk) vs the scalar aligner, multi-chunk forced."""
    import random

    from rust_bio_tpu.ops import sw_pallas
    from rust_bio_tpu.alignment.pairwise.scalar import Aligner

    real_pick = sw_pallas._pick_block_global
    monkeypatch.setattr(
        sw_pallas, "_pick_block_global",
        lambda B, M, N, n_state=30, **kw: (
            real_pick(B, M, N, n_state)[0], max(1, N // 4)
        ),
    )

    rng = random.Random(go * 31 + ge)
    sc = Scoring.from_scores(go, ge, 2, -3)
    ba = BatchAligner(sc)
    sa = Aligner.with_scoring(sc)
    xs, ys = [], []
    for _ in range(24):
        m = rng.randint(0, 16)
        x = bytes(rng.choice(b"ACGT") for _ in range(m))
        # half the lanes: y contains x-ish (the semiglobal sweet spot)
        if rng.random() < 0.5:
            pre = bytes(rng.choice(b"ACGT") for _ in range(rng.randint(0, 8)))
            suf = bytes(rng.choice(b"ACGT") for _ in range(rng.randint(0, 8)))
            y = pre + x + suf
        else:
            y = bytes(rng.choice(b"ACGT") for _ in range(rng.randint(0, 24)))
        xs.append(x)
        ys.append(y)
    got = ba.semiglobal(xs, ys)
    for k, (x, y) in enumerate(zip(xs, ys)):
        want = sa.semiglobal(x, y)
        assert got[k].score == want.score, (k, x, y)
        assert got[k].operations == want.operations, (k, x, y)
        assert (got[k].xstart, got[k].xend, got[k].ystart, got[k].yend) == (
            want.xstart, want.xend, want.ystart, want.yend
        ), (k, x, y)


def test_global_lut_streamed_kernel_blosum(monkeypatch):
    """Streamed-substitution transposed global kernel with BLOSUM62 vs the
    scalar aligner, multi-chunk forced."""
    import random

    from rust_bio_tpu.ops import sw_pallas
    from rust_bio_tpu.alignment.pairwise.scalar import Aligner
    from rust_bio_tpu.scores import blosum62

    real_pick = sw_pallas._pick_block_global
    monkeypatch.setattr(
        sw_pallas, "_pick_block_global",
        lambda B, M, N, n_state=30, stream_bytes=0: (
            real_pick(B, M, N, n_state, stream_bytes)[0], max(1, N // 4)
        ),
    )

    rng = random.Random(71)
    sc = Scoring.new(-8, -2, blosum62)
    ba = BatchAligner(sc)
    sa = Aligner.with_scoring(sc)
    aas = b"ARNDCQEGHILKMFPSTWYV"
    xs = [
        bytes(rng.choice(aas) for _ in range(rng.randint(1, 18)))
        for _ in range(16)
    ]
    ys = [
        bytes(rng.choice(aas) for _ in range(rng.randint(1, 22)))
        for _ in range(16)
    ]
    got = ba.global_(xs, ys)
    for k, (x, y) in enumerate(zip(xs, ys)):
        want = sa.global_(x, y)
        assert got[k].score == want.score, (k, x, y)
        assert got[k].operations == want.operations, (k, x, y)


def test_semiglobal_lut_streamed_kernel_blosum(monkeypatch):
    """Streamed-subs semiglobal kernel with BLOSUM62 vs scalar."""
    import random

    from rust_bio_tpu.ops import sw_pallas
    from rust_bio_tpu.alignment.pairwise.scalar import Aligner
    from rust_bio_tpu.scores import blosum62

    real_pick = sw_pallas._pick_block_global
    monkeypatch.setattr(
        sw_pallas, "_pick_block_global",
        lambda B, M, N, n_state=30, stream_bytes=0: (
            real_pick(B, M, N, n_state, stream_bytes)[0], max(1, N // 3)
        ),
    )
    rng = random.Random(83)
    sc = Scoring.new(-8, -2, blosum62)
    ba = BatchAligner(sc)
    sa = Aligner.with_scoring(sc)
    aas = b"ARNDCQEGHILKMFPSTWYV"
    xs, ys = [], []
    for _ in range(16):
        x = bytes(rng.choice(aas) for _ in range(rng.randint(1, 14)))
        if rng.random() < 0.5:
            pre = bytes(rng.choice(aas) for _ in range(rng.randint(0, 6)))
            suf = bytes(rng.choice(aas) for _ in range(rng.randint(0, 6)))
            y = pre + x + suf
        else:
            y = bytes(rng.choice(aas) for _ in range(rng.randint(1, 20)))
        xs.append(x)
        ys.append(y)
    got = ba.semiglobal(xs, ys)
    for k, (x, y) in enumerate(zip(xs, ys)):
        want = sa.semiglobal(x, y)
        assert got[k].score == want.score, (k, x, y)
        assert got[k].operations == want.operations, (k, x, y)


@pytest.mark.slow
def test_custom_transposed_kernel_random_clips(monkeypatch):
    """General-clip transposed kernel vs scalar: random clip combos
    including local (0,0,0,0), multi-chunk forced."""
    import random

    from rust_bio_tpu.ops import sw_pallas
    from rust_bio_tpu.alignment.pairwise.scalar import Aligner
    from rust_bio_tpu.alignment.pairwise.scoring import MIN_SCORE, MatchParams

    real_pick = sw_pallas._pick_block_global
    monkeypatch.setattr(
        sw_pallas, "_pick_block_global",
        lambda B, M, N, n_state=30, stream_bytes=0: (
            real_pick(B, M, N, n_state, stream_bytes)[0], max(1, N // 4)
        ),
    )
    rng = random.Random(97)
    clip_choices = [MIN_SCORE, 0, -1, -7]
    for trial in range(4):
        go = rng.randint(-9, -1)
        ge = rng.randint(go, 0)
        clips = tuple(rng.choice(clip_choices) for _ in range(4))
        if trial == 0:
            clips = (0, 0, 0, 0)  # always cover local
        sc = Scoring(
            gap_open=go, gap_extend=ge, match_fn=MatchParams(2, -3),
            xclip_prefix=clips[0], xclip_suffix=clips[1],
            yclip_prefix=clips[2], yclip_suffix=clips[3],
        )
        ba = BatchAligner(sc)
        sa = Aligner.with_scoring(sc)
        xs = [
            bytes(rng.choice(b"ACGT") for _ in range(rng.randint(0, 16)))
            for _ in range(16)
        ]
        ys = [
            bytes(rng.choice(b"ACGT") for _ in range(rng.randint(0, 20)))
            for _ in range(16)
        ]
        got = ba.custom(xs, ys)
        for k, (x, y) in enumerate(zip(xs, ys)):
            want = sa.custom(x, y)
            assert got[k].score == want.score, (trial, clips, k, x, y)
            assert got[k].operations == want.operations, (trial, clips, k, x, y)


def test_lane_major_general_engine_still_exact():
    """The lane-major general Pallas engine (shared _column_body) is no
    longer dispatched by default but stays as a reference implementation;
    keep it bit-exact."""
    import random

    from rust_bio_tpu.alignment.pairwise.batched import _align_batch_device_mp
    from rust_bio_tpu.alignment.pairwise.scalar import Aligner
    from rust_bio_tpu.alignment.pairwise.scoring import MIN_SCORE

    rng = random.Random(101)
    sc = Scoring.from_scores(-5, -1, 2, -2)
    sa = Aligner.with_scoring(sc)
    B = 8
    xs = [bytes(rng.choice(b"ACGT") for _ in range(rng.randint(1, 14))) for _ in range(B)]
    ys = [bytes(rng.choice(b"ACGT") for _ in range(rng.randint(1, 18))) for _ in range(B)]
    import numpy as np

    M = max(len(x) for x in xs)
    N = max(len(y) for y in ys)
    xb = np.zeros((B, M), np.uint8)
    yb = np.zeros((B, N), np.uint8)
    ml = np.array([len(x) for x in xs], np.int32)
    nl = np.array([len(y) for y in ys], np.int32)
    for k in range(B):
        xb[k, : ml[k]] = np.frombuffer(xs[k], np.uint8)
        yb[k, : nl[k]] = np.frombuffer(ys[k], np.uint8)
    pen8 = np.array([-5, -1, MIN_SCORE, MIN_SCORE, 0, 0, 2, -2], np.int32)
    out = _align_batch_device_mp(
        jnp.asarray(xb), jnp.asarray(yb), jnp.asarray(ml), jnp.asarray(nl),
        jnp.asarray(pen8),
    )
    import numpy as _np

    scores = _np.asarray(out["score"])
    for k in range(B):
        assert int(scores[k]) == sa.semiglobal(xs[k], ys[k]).score


def test_pick_block_lane_legality():
    """Every chosen batch block must satisfy the Mosaic lane rule
    (bb % 128 == 0 or bb == B) — the real TPU lowering rejects others."""
    from rust_bio_tpu.ops.sw_pallas import _pick_block_global

    for B in (8, 16, 24, 100, 128, 136, 256, 384, 1024, 4096, 8192):
        for M, N in ((20, 26), (150, 150), (100, 316)):
            bb, K = _pick_block_global(B, M, N)
            assert bb % 128 == 0 or bb == B, (B, M, N, bb)
            assert B % bb == 0 and K >= 1


def test_dispatch_pads_odd_large_batches():
    """A 4056-lane batch (not 128-divisible) must still produce exact
    results through the fast path (regression: Mosaic lane rule)."""
    import random

    from rust_bio_tpu.alignment.pairwise.scalar import Aligner

    rng = random.Random(113)
    sc = Scoring.from_scores(-5, -1, 2, -2)
    ba = BatchAligner(sc)
    sa = Aligner.with_scoring(sc)
    B = 136  # > 128, not a multiple of 128
    xs = [bytes(rng.choice(b"ACGT") for _ in range(rng.randint(1, 12))) for _ in range(B)]
    ys = [bytes(rng.choice(b"ACGT") for _ in range(rng.randint(1, 16))) for _ in range(B)]
    got = ba.semiglobal(xs, ys)
    for k in (0, 64, 129, 135):
        want = sa.semiglobal(xs[k], ys[k])
        assert got[k].score == want.score and got[k].operations == want.operations


def test_sweep_walk_matches_gather_walk(monkeypatch):
    """The Pallas column-sweep walk must emit exactly the ops of the
    per-step-gather walk (multi-chunk forced), for ragged lens."""
    import random

    import numpy as np

    from rust_bio_tpu.alignment.pairwise.batched import (
        _align_batch_device_global_mp,
        _decode_ops,
        _decode_ops_colrle,
    )
    from rust_bio_tpu.alignment.pairwise.scoring import MIN_SCORE
    from rust_bio_tpu.ops import walk_pallas

    real_pick = walk_pallas._pick_block_walk
    monkeypatch.setattr(
        walk_pallas, "_pick_block_walk",
        lambda B, X, N: (real_pick(B, X, N)[0], max(1, N // 3)),
    )

    rng = random.Random(31)
    B, M, N = 16, 21, 26
    xb = np.zeros((B, M), np.uint8)
    yb = np.zeros((B, N), np.uint8)
    ml = np.zeros(B, np.int32)
    nl = np.zeros(B, np.int32)
    for k in range(B):
        ml[k] = rng.randint(1, M)
        nl[k] = rng.randint(1, N)
        xb[k, : ml[k]] = [rng.choice(b"ACGT") for _ in range(ml[k])]
        yb[k, : nl[k]] = [rng.choice(b"ACGT") for _ in range(nl[k])]
    pen8 = np.array(
        [-5, -1, MIN_SCORE, MIN_SCORE, MIN_SCORE, MIN_SCORE, 2, -2], np.int32
    )
    args = (
        jnp.asarray(xb), jnp.asarray(yb), jnp.asarray(ml), jnp.asarray(nl),
        jnp.asarray(pen8),
    )
    from rust_bio_tpu.alignment.pairwise.batched import _unpack_rle

    new_out = _align_batch_device_global_mp(*args, sweep_walk=True)
    new_score, new = _unpack_rle(np.asarray(new_out["packed"]))
    assert (np.asarray(new_out["score"]) == new_score).all()
    old = {k: np.asarray(v) for k, v in
           _align_batch_device_global_mp(*args, sweep_walk=False).items()}
    assert (new_score == old["score"]).all()
    for k in range(B):
        ops_new = _decode_ops_colrle(
            new["ins_cnt"][:, k], new["exit_op"][:, k], new["ins0"][k],
            int(nl[k]),
        )
        ops_old = _decode_ops(old["op_codes"][:, k], old["op_lens"][:, k])
        assert ops_new == ops_old, (k, ops_new, ops_old)


def test_block_row_engine_matches_single_block(monkeypatch):
    """The block-row global engine (16-row blocks forced, many row seams)
    must be bit-identical to the single-block transposed engine."""
    import random

    import numpy as np

    from rust_bio_tpu.alignment.pairwise.batched import (
        _align_batch_device_global_mp,
        _align_batch_device_global_rows_mp,
        _decode_ops_colrle,
    )
    from rust_bio_tpu.alignment.pairwise.scoring import MIN_SCORE
    from rust_bio_tpu.ops import sw_pallas

    monkeypatch.setattr(
        sw_pallas, "_pick_block_rows",
        lambda B, M, N: (min(B, 128), 16, 8, -(-N // 8) * 8),
    )

    rng = random.Random(77)
    B, M, N = 8, 45, 50
    xb = np.zeros((B, M), np.uint8)
    yb = np.zeros((B, N), np.uint8)
    ml = np.zeros(B, np.int32)
    nl = np.zeros(B, np.int32)
    for k in range(B):
        ml[k] = rng.randint(1, M)
        nl[k] = rng.randint(1, N)
        xb[k, : ml[k]] = [rng.choice(b"ACGT") for _ in range(ml[k])]
        yb[k, : nl[k]] = [rng.choice(b"ACGT") for _ in range(nl[k])]
    pen8 = np.array(
        [-5, -1, MIN_SCORE, MIN_SCORE, MIN_SCORE, MIN_SCORE, 2, -2], np.int32
    )
    args = tuple(map(jnp.asarray, (xb, yb, ml, nl, pen8)))
    from rust_bio_tpu.alignment.pairwise.batched import _unpack_rle

    rows_s, rows = _unpack_rle(
        np.asarray(_align_batch_device_global_rows_mp(*args)["packed"])
    )
    ref_s, ref = _unpack_rle(
        np.asarray(_align_batch_device_global_mp(*args)["packed"])
    )
    assert (rows_s == ref_s).all()
    for k in range(B):
        o1 = _decode_ops_colrle(
            rows["ins_cnt"][:, k], rows["exit_op"][:, k], rows["ins0"][k],
            int(nl[k]),
        )
        o2 = _decode_ops_colrle(
            ref["ins_cnt"][:, k], ref["exit_op"][:, k], ref["ins0"][k],
            int(nl[k]),
        )
        assert o1 == o2, k


@pytest.mark.slow
def test_block_row_segmented_walk_long_sequences():
    """Long sequences (M > 1024: segmented sweep walk, real row seams)
    through the public dispatch, vs the scalar oracle; half the lanes are
    high-identity mutated copies (long diagonal runs + short gaps)."""
    import random

    from rust_bio_tpu.alignment.pairwise.scalar import Aligner

    rng = random.Random(13)
    sc = Scoring.from_scores(-5, -1, 2, -2)
    ba = BatchAligner(sc)
    sa = Aligner.with_scoring(sc)
    B, M = 8, 1100
    xs, ys = [], []
    for k in range(B):
        x = bytes(rng.choice(b"ACGT") for _ in range(rng.randint(M // 2, M)))
        if k % 2:
            y = bytearray(x[: rng.randint(400, len(x))])
            for _ in range(15):
                p = rng.randrange(len(y))
                y[p] = rng.choice(b"ACGT")
            y = bytes(y)
        else:
            y = bytes(rng.choice(b"ACGT") for _ in range(rng.randint(400, 600)))
        xs.append(x)
        ys.append(y)
    got = ba.global_(xs, ys)
    for k in (0, 1, 2, 3):
        want = sa.global_(xs[k], ys[k])
        assert got[k].score == want.score, k
        assert got[k].operations == want.operations, k


def test_dispatch_long_reads_fall_back():
    """Shapes whose transposed-engine state can't fit VMEM (M=500 at B=8 is
    past the feasibility boundary of 424) must fall through to a working
    engine instead of crashing (regression: MatchParams branch skipped the
    feasibility check)."""
    import random

    from rust_bio_tpu.alignment.pairwise.scalar import Aligner
    from rust_bio_tpu.ops.sw_pallas import transposed_feasible

    rng = random.Random(7)
    sc = Scoring.from_scores(-5, -1, 2, -2)
    ba = BatchAligner(sc)
    sa = Aligner.with_scoring(sc)
    B, M = 8, 500
    assert not transposed_feasible(B, M, M)
    xs = [bytes(rng.choice(b"ACGT") for _ in range(M)) for _ in range(B)]
    ys = [bytes(rng.choice(b"ACGT") for _ in range(M)) for _ in range(B)]
    got = ba.global_(xs, ys)
    want = sa.global_(xs[0], ys[0])
    assert got[0].score == want.score


def test_lut_rank_compaction_edge_bytes():
    """Out-of-alphabet bytes must score via the LUT exactly like the host
    oracle.  Regression: the one-hot rank compaction used fill_value=0, so
    a batch containing byte 0 duplicated its one-hot slot and the einsum
    summed the LUT entry once per duplicate (scores off by orders of
    magnitude); sigma > 32 silently truncated the symbol set."""
    import numpy as np

    from rust_bio_tpu.alignment.pairwise.scalar import Aligner
    from rust_bio_tpu.scores import blosum62

    rng = np.random.default_rng(0)
    sc = Scoring.new(-5, -1, blosum62)
    ba = BatchAligner(sc)
    host = Aligner.with_scoring(sc)

    # byte 0 inside sequences (fill-slot collision)
    xs = [bytes(rng.choice([0, 65, 82, 71], size=int(rng.integers(5, 30)))
                .astype("uint8")) for _ in range(8)]
    ys = [bytes(rng.choice([0, 65, 82, 71], size=int(rng.integers(5, 30)))
                .astype("uint8")) for _ in range(8)]
    got = ba.global_(xs, ys)
    for i in range(8):
        want = host.global_(xs[i], ys[i])
        assert got[i].score == want.score, i
        assert got[i].operations == want.operations, i

    # more than 32 distinct bytes in the batch
    xs2 = [bytes(rng.integers(0, 256, size=25).astype("uint8"))
           for _ in range(8)]
    ys2 = [bytes(rng.integers(0, 256, size=28).astype("uint8"))
           for _ in range(8)]
    got2 = ba.global_(xs2, ys2)
    for i in range(8):
        want = host.global_(xs2[i], ys2[i])
        assert got2[i].score == want.score, i
        assert got2[i].operations == want.operations, i


@pytest.mark.slow
def test_custom_sweep_walk_matches_gather_walk(monkeypatch):
    """The general-clip column-sweep walk must produce exactly the ops of
    the per-step-gather walk (multi-chunk forced), across clip configs
    incl. local, half-clipped and custom, with ragged lens."""
    import random

    import numpy as np

    from rust_bio_tpu.alignment.pairwise.batched import (
        _align_batch_device_custom_mp,
        _decode_ops,
        _decode_ops_colrle_custom,
        _unpack_rle_custom,
    )
    from rust_bio_tpu.alignment.pairwise.scoring import MIN_SCORE
    from rust_bio_tpu.ops import walk_pallas

    real_pick = walk_pallas._pick_block_walk
    monkeypatch.setattr(
        walk_pallas, "_pick_block_walk",
        lambda B, X, N: (real_pick(B, X, N)[0], max(1, N // 3)),
    )

    rng = random.Random(47)
    B, M, N = 16, 19, 23
    for clips in (
        (0, 0, 0, 0),                               # local
        (MIN_SCORE, 0, 0, MIN_SCORE),               # mixed
        (-3, -7, -2, -5),                           # custom finite
        (0, MIN_SCORE, MIN_SCORE, 0),               # mixed 2
    ):
        xb = np.zeros((B, M), np.uint8)
        yb = np.zeros((B, N), np.uint8)
        ml = np.zeros(B, np.int32)
        nl = np.zeros(B, np.int32)
        for k in range(B):
            ml[k] = rng.randint(1, M)
            nl[k] = rng.randint(1, N)
            xb[k, : ml[k]] = [rng.choice(b"ACGT") for _ in range(ml[k])]
            yb[k, : nl[k]] = [rng.choice(b"ACGT") for _ in range(nl[k])]
        pen8 = np.array([-5, -1, *clips, 2, -2], np.int32)
        args = (
            jnp.asarray(xb), jnp.asarray(yb), jnp.asarray(ml),
            jnp.asarray(nl), jnp.asarray(pen8),
        )
        new_out = _align_batch_device_custom_mp(*args, sweep_walk=True)
        score_new, up = _unpack_rle_custom(np.asarray(new_out["packed_custom"]))
        old = {k: np.asarray(v) for k, v in
               _align_batch_device_custom_mp(*args, sweep_walk=False).items()}
        assert (score_new == old["score"]).all(), clips
        for k in range(B):
            ops_new = _decode_ops_colrle_custom(
                up["pre"][:, k], up["ins_cnt"][:, k], up["exit_op"][:, k],
                up["elen"][:, k], up["post"][:, k],
                up["fix_codes"][:, k], up["fix_lens"][:, k], int(nl[k]),
            )
            ops_old = _decode_ops(old["op_codes"][:, k], old["op_lens"][:, k])
            assert ops_new == ops_old, (clips, k, ops_new, ops_old)
            for key in ("xstart", "ystart", "xend", "yend"):
                assert int(up[key][k]) == int(old[key][k]), (clips, k, key)


@pytest.mark.slow
def test_sweep_walks_degenerate_lengths():
    """1-char and highly ragged pairs through all sweep-walked modes."""
    from rust_bio_tpu.alignment.pairwise.scalar import Aligner

    sc = Scoring.from_scores(-5, -1, 2, -2)
    ba = BatchAligner(sc)
    host = Aligner.with_scoring(sc)
    xs = [b"A", b"ACGT", b"A", b"ACGTACGTACGTACGT"]
    ys = [b"A", b"A", b"ACGTACGT", b"T"]
    for mode in ("global_", "semiglobal", "local"):
        got = getattr(ba, mode)(xs, ys)
        for i in range(len(xs)):
            want = getattr(host, mode)(xs[i], ys[i])
            assert got[i].score == want.score, (mode, i)
            assert got[i].operations == want.operations, (mode, i)
            assert (got[i].xstart, got[i].ystart, got[i].xend, got[i].yend) == (
                want.xstart, want.ystart, want.xend, want.yend
            ), (mode, i)


@pytest.mark.slow
def test_custom_sweep_walk_column0_ins_run():
    """A custom-mode path that enters column 0's I-layer with a multi-row
    insertion run (gap beats the x-prefix clip): regression for the sweep
    walk reading a missing ins-run nibble in the init column's tb and
    dropping all but one Ins op."""
    import random

    from rust_bio_tpu.alignment.pairwise.scalar import Aligner

    sc = Scoring.from_scores(-5, -1, 2, -2).xclip(-20).yclip(-20)
    ba = BatchAligner(sc)
    host = Aligner.with_scoring(sc)
    got = ba.custom([b"AAAC"], [b"C"])[0]
    want = host.custom(b"AAAC", b"C")
    assert got.score == want.score
    assert got.operations == want.operations  # [Ins, Ins, Ins, Match]

    random.seed(7)
    for _ in range(6):
        xs, ys = [], []
        for _ in range(8):
            m = random.randint(1, 20)
            n = random.randint(1, 6)
            xs.append(bytes(random.choice(b"ACGT") for _ in range(m)))
            ys.append(bytes(random.choice(b"ACGT") for _ in range(n)))
        res = ba.custom(xs, ys)
        for i in range(8):
            w = host.custom(xs[i], ys[i])
            assert res[i].score == w.score, (xs[i], ys[i])
            assert res[i].operations == w.operations, (xs[i], ys[i])


@pytest.mark.slow
def test_sweep_walks_tiny_row_count():
    """Batches whose padded M+1 <= 8 (fewer rows than the largest ins-run
    nibble shift) through all sweep-walked modes: regression for
    _ins_run_nib emitting an (8, BB) shift against a (M+1, BB) array."""
    from rust_bio_tpu.alignment.pairwise.scalar import Aligner

    sc = Scoring.from_scores(-5, -1, 2, -2)
    ba = BatchAligner(sc)
    host = Aligner.with_scoring(sc)
    for x, y in [(b"ACGT", b"AGGT"), (b"A", b"ACGTAC"), (b"ACGTACG", b"T")]:
        for mode in ("global_", "semiglobal", "local"):
            got = getattr(ba, mode)([x], [y])[0]
            want = getattr(host, mode)(x, y)
            assert got.score == want.score, (mode, x, y)
            assert got.operations == want.operations, (mode, x, y)


@pytest.mark.slow
def test_local_engine_matches_custom_engine(monkeypatch):
    """The specialized local kernel (clips == 0) must emit byte-identical
    scan outputs to the general-clip kernel (tb layer bits, Lx columns,
    finals), and reference-exact alignments end-to-end; multi-chunk
    forced."""
    import random

    from rust_bio_tpu.alignment.pairwise.scalar import Aligner
    from rust_bio_tpu.alignment.pairwise.scoring import MatchParams
    from rust_bio_tpu.ops import sw_pallas

    real_pick = sw_pallas._pick_block_global
    monkeypatch.setattr(
        sw_pallas, "_pick_block_global",
        lambda B, M, N, n_state=30, stream_bytes=0: (
            real_pick(B, M, N, n_state, stream_bytes)[0], max(1, N // 4)
        ),
    )

    rng = random.Random(131)
    B, M, N = 16, 19, 23
    for trial in range(3):
        go = rng.randint(-9, -1)
        ge = rng.randint(go, 0)
        ma, mi = 2, rng.randint(-4, -1)
        xb = np.zeros((B, M), np.uint8)
        yb = np.zeros((B, N), np.uint8)
        ml = np.zeros(B, np.int32)
        nl = np.zeros(B, np.int32)
        for k in range(B):
            ml[k] = rng.randint(1, M)
            nl[k] = rng.randint(1, N)
            xb[k, : ml[k]] = [rng.choice(b"ACGT") for _ in range(ml[k])]
            yb[k, : nl[k]] = [rng.choice(b"ACGT") for _ in range(nl[k])]
        pen8 = jnp.asarray(np.array([go, ge, 0, 0, 0, 0, ma, mi], np.int32))
        args = (jnp.asarray(xb), jnp.asarray(yb), jnp.asarray(ml),
                jnp.asarray(nl), pen8)
        got = sw_pallas.scan_local_pallas_mp(*args)
        want = sw_pallas.scan_custom_pallas_mp(*args)
        # tb layer bits (run nibble is walk-dead and local omits it)
        np.testing.assert_array_equal(
            np.asarray(got[0][:N]) & 0x0FFF, np.asarray(want[0][:N]) & 0x0FFF,
            err_msg=f"trial {trial} tb",
        )
        np.testing.assert_array_equal(
            np.asarray(got[1][:N]), np.asarray(want[1][:N]),
            err_msg=f"trial {trial} lx",
        )
        for name, g, w in (
            ("S_f", got[2], want[2]), ("I_f", got[3], want[3]),
            ("Sn_f", got[4], want[4]), ("Ly_f", got[5], want[5]),
        ):
            np.testing.assert_array_equal(
                np.asarray(g), np.asarray(w), err_msg=f"trial {trial} {name}"
            )
        np.testing.assert_array_equal(
            np.asarray(got[6]) & 0x0FFF, np.asarray(want[6]) & 0x0FFF,
            err_msg=f"trial {trial} tbk",
        )

        # end-to-end local() vs the scalar oracle (dispatch routes to the
        # local engine for the all-zeros preset)
        sc = Scoring(
            gap_open=go, gap_extend=ge, match_fn=MatchParams(ma, mi),
            xclip_prefix=0, xclip_suffix=0, yclip_prefix=0, yclip_suffix=0,
        )
        ba = BatchAligner(sc)
        sa = Aligner.with_scoring(sc)
        xs = [xb[k, : ml[k]].tobytes() for k in range(B)]
        ys = [yb[k, : nl[k]].tobytes() for k in range(B)]
        res = ba.local(xs, ys)
        for k, (x, y) in enumerate(zip(xs, ys)):
            want_a = sa.local(x, y)
            assert res[k].score == want_a.score, (trial, k, x, y)
            assert res[k].operations == want_a.operations, (trial, k, x, y)


@pytest.mark.slow
def test_sweep_walks_long_insertion_runs():
    """Paths with vertical insertion runs far beyond the 15-cell run
    nibble (x >> y) must still decode exactly: exercises the walks' rare
    re-gather chain for capped nibbles across every sweep-walked mode."""
    from rust_bio_tpu.alignment.pairwise.scalar import Aligner
    from rust_bio_tpu.alignment.pairwise.scoring import MatchParams

    rng = np.random.default_rng(911)
    B = 8
    xs, ys = [], []
    for k in range(B):
        # long x vs tiny y: one >= 30-cell insertion run per lane
        xs.append(bytes(rng.choice(list(b"ACGT"), size=40 + k)))
        ys.append(bytes(rng.choice(list(b"ACGT"), size=2 + (k % 3))))
    for mode, clips in (
        ("global_", (-(2**30),) * 4),
        ("semiglobal", (-(2**30), -(2**30), 0, 0)),
        ("local", (0, 0, 0, 0)),
        ("custom", (-3, 0, -2, 0)),
    ):
        sc = Scoring(
            gap_open=-5, gap_extend=-1, match_fn=MatchParams(2, -2),
            xclip_prefix=clips[0], xclip_suffix=clips[1],
            yclip_prefix=clips[2], yclip_suffix=clips[3],
        )
        ba = BatchAligner(sc)
        sa = Aligner.with_scoring(sc)
        res = getattr(ba, mode)(xs, ys) if mode != "custom" else ba.custom(xs, ys)
        for k, (x, y) in enumerate(zip(xs, ys)):
            want = getattr(sa, mode)(x, y) if mode != "custom" else sa.custom(x, y)
            assert res[k].score == want.score, (mode, k)
            assert res[k].operations == want.operations, (mode, k)


@pytest.mark.slow
def test_block_row_engine_medium_m_walk():
    """M in the transposed-infeasible but X <= 1024 range routes the
    block-row engine's REREAD-containing, nibble-less tb to the SEGMENTED
    walk (regression: the whole-column walk assumes plain-engine tb with
    the bits 12-15 ins-run nibble and no TB_REREAD)."""
    from rust_bio_tpu.alignment.pairwise.scalar import Aligner

    rng = np.random.default_rng(55)
    sc = Scoring.from_scores(-5, -1, 2, -2)
    ba, sa = BatchAligner(sc), Aligner.with_scoring(sc)
    xs = [bytes(rng.choice(list(b"ACGT"), size=400 + 9 * k)) for k in range(8)]
    ys = [bytes(rng.choice(list(b"ACGT"), size=30 + 50 * k)) for k in range(8)]
    res = ba.global_(xs, ys)
    for k, (x, y) in enumerate(zip(xs, ys)):
        want = sa.global_(x, y)
        assert res[k].score == want.score, k
        assert res[k].operations == want.operations, k


@pytest.mark.slow
def test_dispatch_fuzz_engine_boundaries():
    """Random ragged pairs across the shape bands that cross engine
    boundaries (tiny / long-x / long-y / bench-shape), all three public
    modes, ops + scores oracle-identical.  (The transposed-infeasible
    block-row band is covered by test_block_row_engine_medium_m_walk.)"""
    from rust_bio_tpu.alignment.pairwise.scalar import Aligner

    rng = np.random.default_rng(123)
    sc = Scoring.from_scores(-4, -1, 2, -3)
    ba, host = BatchAligner(sc), Aligner.with_scoring(sc)
    for Mlo, Mhi, Nlo, Nhi in [
        (1, 30, 1, 30),
        (100, 200, 5, 20),
        (5, 20, 100, 200),
        (140, 160, 140, 160),
    ]:
        xs = [
            bytes(rng.choice(list(b"ACGT"), size=rng.integers(Mlo, Mhi + 1))
                  .astype(np.uint8))
            for _ in range(8)
        ]
        ys = [
            bytes(rng.choice(list(b"ACGT"), size=rng.integers(Nlo, Nhi + 1))
                  .astype(np.uint8))
            for _ in range(8)
        ]
        for mode in ("global_", "semiglobal", "local"):
            dev = getattr(ba, mode)(xs, ys)
            for i in range(8):
                h = getattr(host, mode)(xs[i], ys[i])
                assert dev[i].score == h.score, (mode, i)
                assert dev[i].operations == h.operations, (mode, i)


def test_local_walk_matches_custom_walk():
    """The local-specialized sweep walk (sweep_walk_local: no clip
    machinery, terminal clip-prefixes) must produce Alignments identical
    to the general custom walk on the same scan outputs — score, ops,
    and all four coordinates — including ins runs, ragged lens, and
    paths that end in y/x-suffix clips."""
    import random

    from rust_bio_tpu.alignment.pairwise.batched import (
        _align_batch_device_custom_mp,
        _decode_ops_colrle_custom,
        _decode_ops_colrle_local,
        _unpack_rle_custom,
        _unpack_rle_local,
    )

    rng = random.Random(977)
    B, M, N = 16, 21, 26
    for trial in range(4):
        go = rng.randint(-9, -1)
        ge = rng.randint(go, 0)
        ma, mi = rng.randint(1, 3), rng.randint(-4, -1)
        xb = np.zeros((B, M), np.uint8)
        yb = np.zeros((B, N), np.uint8)
        ml = np.zeros(B, np.int32)
        nl = np.zeros(B, np.int32)
        for k in range(B):
            ml[k] = rng.randint(1, M)
            nl[k] = rng.randint(1, N)
            xb[k, : ml[k]] = [rng.choice(b"ACGT") for _ in range(ml[k])]
            yb[k, : nl[k]] = [rng.choice(b"ACG") for _ in range(nl[k])]
        pen8 = jnp.asarray(np.array([go, ge, 0, 0, 0, 0, ma, mi], np.int32))
        args = (jnp.asarray(xb), jnp.asarray(yb), jnp.asarray(ml),
                jnp.asarray(nl), pen8)
        out_l = _align_batch_device_custom_mp(
            *args, local_engine=True, local_walk=True
        )
        out_c = _align_batch_device_custom_mp(
            *args, local_engine=True, local_walk=False
        )
        s_l, up_l = _unpack_rle_local(np.asarray(out_l["packed_local"]))
        s_c, up_c = _unpack_rle_custom(np.asarray(out_c["packed_custom"]))
        np.testing.assert_array_equal(s_l, s_c, err_msg=f"trial {trial}")
        for name in ("xstart", "ystart", "xend", "yend"):
            np.testing.assert_array_equal(
                up_l[name], up_c[name], err_msg=f"trial {trial} {name}"
            )
        for k in range(B):
            ops_l = _decode_ops_colrle_local(
                up_l["ins_cnt"][:, k], up_l["exit_op"][:, k],
                up_l["fix_codes"][:, k], up_l["fix_lens"][:, k],
                int(nl[k]),
            )
            ops_c = _decode_ops_colrle_custom(
                up_c["pre"][:, k], up_c["ins_cnt"][:, k],
                up_c["exit_op"][:, k], up_c["elen"][:, k],
                up_c["post"][:, k], up_c["fix_codes"][:, k],
                up_c["fix_lens"][:, k], int(nl[k]),
            )
            drop = lambda ops: [
                o for o in ops if o.kind not in ("Xclip", "Yclip")
            ]
            assert drop(ops_l) == drop(ops_c), (trial, k, ops_l, ops_c)


def test_packed_compact_cigars_match_dense():
    """Device-side RLE merge (compact delivered-CIGAR pull) emits the
    exact same CIGAR strings as the dense packed path, for global and
    semiglobal, on high-identity data (no overflow) AND random pairs
    (overflow lanes take the dense re-run fallback)."""
    from rust_bio_tpu.alignment.pairwise.batched import BatchAligner
    from rust_bio_tpu.alignment.pairwise.scoring import Scoring

    rng = np.random.default_rng(11)
    B, M, N = 64, 96, 96
    ba = BatchAligner(Scoring.from_scores(-5, -1, 2, -2))
    mlens = np.full(B, M, np.int32)
    nlens = np.full(B, N, np.int32)

    def corpus(p):
        xb = rng.integers(0, 4, size=(B, M)).astype(np.uint8) + ord("A")
        yb = xb.copy()
        mut = rng.random(size=(B, N)) < p
        yb[mut] = rng.integers(0, 4, size=int(mut.sum())).astype(
            np.uint8
        ) + ord("A")
        return xb, yb

    for p in (0.02, 0.9):  # hi-identity; effectively random (overflows)
        xb, yb = corpus(p)
        dense = BatchAligner.global_packed_finish(
            ba.global_packed_async_arrays(xb, yb, mlens, nlens)
        )
        comp = BatchAligner.packed_compact_finish(
            ba.global_packed_compact_async_arrays(xb, yb, mlens, nlens)
        )
        assert np.array_equal(np.asarray(dense.score), np.asarray(comp.score))
        assert dense.cigars() == comp.cigars(), f"global p={p}"
        if p > 0.5:
            assert comp.overflow.any()  # the fallback path really ran

        dense = BatchAligner.semiglobal_packed_finish(
            ba.semiglobal_packed_async_arrays(xb, yb, mlens, nlens)
        )
        comp = BatchAligner.packed_compact_finish(
            ba.semiglobal_packed_compact_async_arrays(xb, yb, mlens, nlens)
        )
        assert np.array_equal(np.asarray(dense.score), np.asarray(comp.score))
        assert dense.cigars() == comp.cigars(), f"semiglobal p={p}"


def test_packed_compact_variable_lengths():
    """Compact merge honors per-lane nlens masking (columns past a lane's
    target length must not leak runs)."""
    from rust_bio_tpu.alignment.pairwise.batched import BatchAligner
    from rust_bio_tpu.alignment.pairwise.scoring import Scoring

    rng = np.random.default_rng(13)
    B, M, N = 32, 80, 80
    ba = BatchAligner(Scoring.from_scores(-4, -1, 1, -1))
    mlens = rng.integers(20, M + 1, size=B).astype(np.int32)
    nlens = rng.integers(20, N + 1, size=B).astype(np.int32)
    xb = rng.integers(0, 4, size=(B, M)).astype(np.uint8) + ord("A")
    yb = np.zeros((B, N), np.uint8) + ord("A")
    for i in range(B):
        L = int(min(mlens[i], nlens[i]))
        yb[i, :nlens[i]] = ord("A")
        yb[i, : L] = xb[i, : L]  # mostly-matching prefix
    dense = BatchAligner.semiglobal_packed_finish(
        ba.semiglobal_packed_async_arrays(xb, yb, mlens, nlens)
    )
    comp = BatchAligner.packed_compact_finish(
        ba.semiglobal_packed_compact_async_arrays(xb, yb, mlens, nlens)
    )
    assert dense.cigars() == comp.cigars()


def test_packed_compact_finish_many_matches_single():
    """The stacked one-pull multi-handle finish must produce the same
    scores and CIGARs as finishing each handle separately (incl. a mixed
    batch where some handles overflow into the dense re-run)."""
    from rust_bio_tpu.alignment.pairwise.batched import BatchAligner
    from rust_bio_tpu.alignment.pairwise.scoring import Scoring

    rng = np.random.default_rng(17)
    B, M, N = 32, 64, 64
    ba = BatchAligner(Scoring.from_scores(-5, -1, 2, -2))
    mlens = np.full(B, M, np.int32)
    nlens = np.full(B, N, np.int32)
    batches = []
    for p in (0.02, 0.05, 0.9):
        xb = rng.integers(0, 4, size=(B, M)).astype(np.uint8) + ord("A")
        yb = xb.copy()
        mut = rng.random(size=(B, N)) < p
        yb[mut] = rng.integers(0, 4, size=int(mut.sum())).astype(
            np.uint8
        ) + ord("A")
        batches.append((xb, yb))

    handles = [
        ba.global_packed_compact_async_arrays(xb, yb, mlens, nlens)
        for xb, yb in batches
    ]
    many = BatchAligner.packed_compact_finish_many(handles)
    for k, (xb, yb) in enumerate(batches):
        single = BatchAligner.packed_compact_finish(
            ba.global_packed_compact_async_arrays(xb, yb, mlens, nlens)
        )
        assert np.array_equal(
            np.asarray(many[k].score), np.asarray(single.score)
        )
        assert many[k].cigars() == single.cigars()
