"""Device banded aligner vs the host oracle (banded.py, itself embedding
the reference banded.rs golden values)."""

import numpy as np
import pytest

from rust_bio_tpu.alignment.pairwise import banded
from rust_bio_tpu.alignment.pairwise.banded_device import BatchBandedAligner
from rust_bio_tpu.alignment.pairwise.scoring import Scoring

K, W = 5, 8


def _gen_pair(rng, mmax=60, nmax=70):
    m = int(rng.integers(10, mmax))
    x = rng.choice(list(b"ACGT"), size=m).astype("uint8").tobytes()
    if rng.random() < 0.8:
        y = bytearray(x)
        for _ in range(int(rng.integers(0, 6))):
            p = int(rng.integers(0, len(y)))
            op = rng.random()
            if op < 0.5:
                y[p] = int(rng.choice(list(b"ACGT")))
            elif op < 0.75 and len(y) > 12:
                del y[p]
            else:
                y.insert(p, int(rng.choice(list(b"ACGT"))))
        if rng.random() < 0.4:
            y = (
                rng.choice(list(b"ACGT"), size=int(rng.integers(0, 10)))
                .astype("uint8")
                .tobytes()
                + bytes(y)
            )
        y = bytes(y)[:nmax] or b"A"
    else:
        y = (
            rng.choice(list(b"ACGT"), size=int(rng.integers(10, nmax)))
            .astype("uint8")
            .tobytes()
        )
    return x, y


def _assert_same(got, want, ctx):
    assert got.score == want.score, ctx
    assert got.operations == want.operations, ctx
    assert (got.xstart, got.ystart, got.xend, got.yend) == (
        want.xstart,
        want.ystart,
        want.xend,
        want.yend,
    ), ctx


@pytest.mark.parametrize("mode", ["custom", "global_", "semiglobal", "local"])
def test_banded_device_matches_host(mode):
    rng = np.random.default_rng(11)
    sc = Scoring.from_scores(-5, -1, 2, -2)
    bat = BatchBandedAligner(sc, K, W)
    pairs = [_gen_pair(rng) for _ in range(12)]
    xs = [p[0] for p in pairs]
    ys = [p[1] for p in pairs]
    got = getattr(bat, mode)(xs, ys)
    for i, (x, y) in enumerate(pairs):
        al = banded.Aligner(sc, K, W)
        want = getattr(al, {"global_": "global_"}.get(mode, mode))(x, y)
        _assert_same(got[i], want, (mode, i, x, y))


def test_banded_device_multichunk_and_short_y(monkeypatch):
    """Forced multi-chunk streaming + bands that never reach row m (the
    final-column stale-cell regime) + a different (k, w)."""
    from rust_bio_tpu.ops import sw_pallas

    real_pick = sw_pallas._pick_block_global
    monkeypatch.setattr(
        sw_pallas,
        "_pick_block_global",
        lambda B, M, N, n_state=30, stream_bytes=0: (
            real_pick(B, M, N, n_state, stream_bytes)[0],
            max(1, N // 4),
        ),
    )
    rng = np.random.default_rng(7)
    sc = Scoring.from_scores(-5, -1, 2, -2)
    bat = BatchBandedAligner(sc, 6, 10)
    pairs = []
    for t in range(8):
        x, y = _gen_pair(rng, mmax=120, nmax=140)
        if t % 3 == 2:
            y = y[: max(8, len(y) // 3)]
        pairs.append((x, y))
    xs = [p[0] for p in pairs]
    ys = [p[1] for p in pairs]
    for mode in ("custom", "semiglobal", "local"):
        got = getattr(bat, mode)(xs, ys)
        for i, (x, y) in enumerate(pairs):
            al = banded.Aligner(sc, 6, 10)
            want = getattr(al, mode)(x, y)
            _assert_same(got[i], want, (mode, i))


def test_banded_device_no_matches_full_matrix():
    """Pairs with no kmer matches fall back to a full-matrix band —
    device path must agree with the host there too."""
    rng = np.random.default_rng(3)
    sc = Scoring.from_scores(-4, -1, 1, -1)
    bat = BatchBandedAligner(sc, 8, 4)
    xs = [rng.choice(list(b"AC"), size=20).astype("uint8").tobytes()
          for _ in range(4)]
    ys = [rng.choice(list(b"GT"), size=25).astype("uint8").tobytes()
          for _ in range(4)]
    got = bat.global_(xs, ys)
    for i in range(4):
        al = banded.Aligner(sc, 8, 4)
        want = al.global_(xs[i], ys[i])
        _assert_same(got[i], want, i)


def test_banded_device_golden_reference_case():
    """The reference's own banded test sequences (banded.rs tests, already
    embedded as goldens in test_banded.py) through the batch path."""
    x = b"AAAAACCCCCAAAAACCCCCAAAAACCCCCAAAAACCCCC"
    y = b"AAAAACCCCCAAAAACCCCCAAAAACCCCCAAAAACCCCC"
    z = b"AAAAACCCCCAAAAAGCCCCAAAAACCCCCAAAAACCCCC"
    sc = Scoring.from_scores(-5, -1, 1, -1)
    bat = BatchBandedAligner(sc, 8, 6)
    got = bat.semiglobal([x, x], [y, z])
    for i, yy in enumerate((y, z)):
        al = banded.Aligner(sc, 8, 6)
        want = al.semiglobal(x, yy)
        _assert_same(got[i], want, i)


def test_native_band_build_matches_python():
    """Native kmer-match + sdpkpp + raster must produce byte-identical
    bands to the pure-Python builders across clip configs and geometries."""
    import numpy as np

    from rust_bio_tpu import native
    from rust_bio_tpu.alignment import sparse
    from rust_bio_tpu.alignment.pairwise.banded import Band
    from rust_bio_tpu.alignment.pairwise.scoring import MIN_SCORE, Scoring

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")

    rng = np.random.default_rng(53)
    for trial in range(8):
        N = int(rng.integers(60, 2000))
        M = int(rng.integers(20, min(N, 400)))
        y = rng.choice(list(b"ACGT"), size=N).astype(np.uint8).tobytes()
        s = int(rng.integers(0, N - M))
        x = bytearray(y[s : s + M])
        for _ in range(int(rng.integers(0, 5))):
            x[int(rng.integers(0, M))] = int(rng.choice(list(b"ACGT")))
        x = bytes(x)
        k = int(rng.integers(5, 10))
        w = int(rng.integers(2, 12))
        clips = [
            (0, 0, 0, 0),
            (MIN_SCORE,) * 4,
            (MIN_SCORE, MIN_SCORE, 0, 0),
            (-3, -7, -2, -5),
        ][trial % 4]
        sc = Scoring.from_scores(-5, -1, 2, -2).with_clips(*clips)

        # native kmer matches == python
        mx = native.kmer_matches(x, y, k)
        want_m = sparse.find_kmer_matches(x, y, k)
        assert [tuple(r) for r in mx.tolist()] == want_m, (trial, k)

        got = Band.create_native(x, y, k, w, sc)
        assert got is not None
        matches = sparse.find_kmer_matches(x, y, k)
        want = Band.create_with_matches(x, y, k, w, sc, matches)
        np.testing.assert_array_equal(got.starts, want.starts, err_msg=str(trial))
        np.testing.assert_array_equal(got.ends, want.ends, err_msg=str(trial))


@pytest.mark.slow
def test_banded_crop_long_targets_matches_host():
    """Column-window crop (free y clips): short reads vs long targets at
    every tail parity/offset must produce the HOST banded aligner's exact
    alignments (score, ops, coords)."""
    import numpy as np

    from rust_bio_tpu.alignment.pairwise.banded import Aligner as HostBanded
    from rust_bio_tpu.alignment.pairwise.banded_device import (
        BatchBandedAligner,
    )
    from rust_bio_tpu.alignment.pairwise.scoring import MIN_SCORE, Scoring

    rng = np.random.default_rng(59)
    sc = Scoring.from_scores(-5, -1, 2, -2)
    k, w = 8, 8
    for mode in ("semiglobal", "local", "custom_freey"):
        if mode == "custom_freey":
            scm = sc.with_clips(-3, -7, 0, 0)
        else:
            scm = sc
        bat = BatchBandedAligner(scm, k, w)
        host = HostBanded(
            scm if mode == "custom_freey" else (
                scm.with_clips(*((MIN_SCORE,) * 2 + (0, 0)))
                if mode == "semiglobal"
                else scm.with_clips(0, 0, 0, 0)
            ),
            k, w,
        )
        xs, ys = [], []
        for t in range(12):
            N = int(rng.integers(400, 1600))
            y = rng.choice(list(b"ACGT"), size=N).astype(np.uint8).tobytes()
            M = int(rng.integers(30, 120))
            # place the read at varying offsets incl. target start/end
            s = [0, 1, N - M, N - M - 1][t % 4] if t < 4 else int(
                rng.integers(0, N - M)
            )
            x = bytearray(y[s : s + M])
            for _ in range(int(rng.integers(0, 4))):
                x[int(rng.integers(0, M))] = int(rng.choice(list(b"ACGT")))
            xs.append(bytes(x))
            ys.append(y)
        if mode == "semiglobal":
            got = bat.semiglobal(xs, ys)
        elif mode == "local":
            got = bat.local(xs, ys)
        else:
            got = bat.custom(xs, ys)
        for i, (x, y) in enumerate(zip(xs, ys)):
            if mode == "semiglobal":
                want = host.semiglobal(x, y)
            elif mode == "local":
                want = host.local(x, y)
            else:
                want = host.custom(x, y)
            assert got[i].score == want.score, (mode, i)
            assert got[i].operations == want.operations, (mode, i)
            for f in ("xstart", "xend", "ystart", "yend"):
                assert getattr(got[i], f) == getattr(want, f), (mode, i, f)


def test_native_host_fallback_matches_python_host():
    """Shapes the transposed kernel cannot hold (kb-scale queries) route
    to the threaded native banded pipeline (banded_dp.hpp); results must
    be identical to the per-pair Python host path (itself the oracle)."""
    import numpy as np

    from rust_bio_tpu.alignment.pairwise.banded_device import (
        BatchBandedAligner,
    )
    from rust_bio_tpu.alignment.pairwise.scoring import Scoring
    from rust_bio_tpu.ops.sw_pallas import transposed_feasible

    rng = np.random.default_rng(57)
    B, M, N = 4, 1500, 4000
    sc = Scoring.from_scores(-5, -1, 2, -2)
    xs, ys = [], []
    for _ in range(B):
        y = rng.choice(list(b"ACGT"), size=N).astype(np.uint8).tobytes()
        s = int(rng.integers(0, N - M))
        x = bytearray(y[s : s + M])
        for _ in range(20):
            x[int(rng.integers(0, M))] = int(rng.choice(list(b"ACGT")))
        xs.append(bytes(x))
        ys.append(y)
    # no-kmer-match junk pair exercises the full-matrix band
    xs.append(rng.choice(list(b"ACGT"), size=40).astype(np.uint8).tobytes())
    ys.append(rng.choice(list(b"ACGT"), size=60).astype(np.uint8).tobytes())

    assert not transposed_feasible(8, M, 2048), "shape must be infeasible"
    bat = BatchBandedAligner(sc, 8, 8)
    got = bat.semiglobal(xs, ys)
    for i, (x, y) in enumerate(zip(xs, ys)):
        want = bat._host_one(
            sc.with_clips(-858993459, -858993459, 0, 0), x, y,
            got[i].mode, True,
        )
        assert got[i].score == want.score, i
        assert got[i].operations == want.operations, i
        for f in ("xstart", "xend", "ystart", "yend"):
            assert getattr(got[i], f) == getattr(want, f), (i, f)


def test_native_host_batch_all_modes_random_clips():
    """ADVICE r4 #2: the native banded twin (banded_dp.hpp) serves
    production results for ALL four modes + arbitrary clip combos when
    shapes are kernel-infeasible — property-test _host_batch's native
    path against the per-pair Python oracle (_host_one) across every
    mode preset AND random finite/MIN_SCORE clip patterns."""
    from rust_bio_tpu.alignment.pairwise.banded_device import (
        BatchBandedAligner,
    )
    from rust_bio_tpu.alignment.pairwise.scoring import MIN_SCORE, Scoring
    from rust_bio_tpu.alignment.types import AlignmentMode

    rng = np.random.default_rng(91)
    bat = BatchBandedAligner(Scoring.from_scores(-5, -1, 2, -2), 6, 8)

    def gen_batch(B):
        xs, ys = [], []
        for _ in range(B):
            N = int(rng.integers(60, 220))
            M = int(rng.integers(30, 160))
            y = rng.choice(list(b"ACGT"), size=N).astype(np.uint8).tobytes()
            if rng.random() < 0.7 and N > M:
                s = int(rng.integers(0, N - M))
                x = bytearray(y[s : s + M])
                for _ in range(int(rng.integers(0, 8))):
                    x[int(rng.integers(0, M))] = int(
                        rng.choice(list(b"ACGT"))
                    )
                x = bytes(x)
            else:
                x = rng.choice(list(b"ACGT"), size=M).astype(
                    np.uint8
                ).tobytes()
            xs.append(x)
            ys.append(y)
        return xs, ys

    base = Scoring.from_scores(-5, -1, 2, -2)
    mode_clips = {
        AlignmentMode.Global: (MIN_SCORE,) * 4,
        AlignmentMode.Semiglobal: (MIN_SCORE, MIN_SCORE, 0, 0),
        AlignmentMode.Local: (0, 0, 0, 0),
    }
    cases = [(m, c) for m, c in mode_clips.items()]
    for _ in range(5):  # random custom clip combos (finite + MIN_SCORE)
        clips = tuple(
            int(rng.choice([MIN_SCORE, 0, -3, -7, -11]))
            for _ in range(4)
        )
        cases.append((AlignmentMode.Custom, clips))

    for mode, clips in cases:
        sc = base.with_clips(*clips)
        xs, ys = gen_batch(10)
        got = bat._host_batch(xs, ys, sc, mode, filter_clips=False)
        for i, (x, y) in enumerate(zip(xs, ys)):
            want = bat._host_one(sc, x, y, mode, filter_clips=False)
            assert got[i].score == want.score, (mode, clips, i)
            assert got[i].operations == want.operations, (mode, clips, i)
            for f in ("xstart", "xend", "ystart", "yend"):
                assert getattr(got[i], f) == getattr(want, f), (
                    mode, clips, i, f,
                )
