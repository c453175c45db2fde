"""Driver benchmark: batched affine-gap SW alignments/s on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload matches the driver metric (BASELINE.json): 150 bp read pairs,
affine-gap Smith-Waterman (global mode), scores + full traceback parity
semantics. ``vs_baseline`` anchors against a -O3 C++ twin of the reference's
scalar DP inner loop measured on this machine's CPU (single core, the
reference's own execution model — see baselines/cpu_sw.cpp).

Timing policy: every rate is best-of-N over timed iterations that END in a
full device->host sync (np.asarray pull). The axon tunnel to the TPU adds a
measured ~26 ms fixed round-trip latency per dispatch+sync (a dev-tunnel
artifact, not device time: a no-op jitted add costs the same 26 ms), so each
timed iteration chains K=64 async dispatches before its single sync — the
steady-state pipeline throughput a co-located host would see.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import threading
import time

import numpy as np

# ---------------------------------------------------------------------------
# Evidence pipeline hardening (round 5): the bench MUST print its one JSON
# line no matter which row stalls.  Three layers:
#   1. every row runs behind a wall-clock budget check (BENCH_BUDGET_S,
#      default 460 s) — rows that would blow it are skipped to null;
#   2. the final print sits in try/finally;
#   3. a daemon watchdog timer (budget + 90 s) and SIGTERM/SIGALRM handlers
#      emit whatever is filled in so far and hard-exit — a hung device pull
#      cannot starve the report (round 4 recorded rc=124, parsed null).
# ---------------------------------------------------------------------------
_T0 = time.monotonic()
# Budget calibration (round 5): a fully-warm all-caches run measured
# 2,773 s end-to-end on the real chip (headline block 279 s, smem trio
# ~1,310 s, Gbp FM quad ~1,184 s) with minutes-scale noise from the
# shared remote-compile service.  The round-3 driver bench ran >10 min
# and recorded rc=0, so the driver allows well beyond 600 s; the SIGTERM
# handler emits the partial JSON line and exits immediately if the
# driver's own timeout fires first.  28 min covers the healthy-chip full
# run; per-row reserves below skip what can no longer fit.
_BUDGET = float(os.environ.get("BENCH_BUDGET_S", "2250"))
_EMIT_LOCK = threading.Lock()
_EMITTED = False

RESULTS = {
    "metric": "sw_alignments_per_s_per_chip_150bp",
    "value": None,
    "unit": "alignments/s",
    "vs_baseline": None,
}


def _emit() -> None:
    global _EMITTED
    with _EMIT_LOCK:
        if _EMITTED:
            return
        _EMITTED = True
    print(json.dumps(RESULTS), flush=True)


def _watchdog() -> None:
    print(
        f"bench: watchdog fired at {time.monotonic() - _T0:.0f}s — "
        "emitting partial results",
        file=sys.stderr,
    )
    _emit()
    sys.stdout.flush()
    os._exit(0)


def _sig_handler(signum, frame) -> None:
    print(
        f"bench: signal {signum} at {time.monotonic() - _T0:.0f}s — "
        "emitting partial results",
        file=sys.stderr,
    )
    _emit()
    sys.stdout.flush()
    os._exit(0)


def _row(name: str, est_s: float, fn) -> None:
    """Run one bench row under the global budget.  ``fn`` fills RESULTS;
    a skipped or failed row leaves its metrics null (never raises)."""
    el = time.monotonic() - _T0
    if el + est_s > _BUDGET:
        print(
            f"bench: SKIP {name} (elapsed {el:.0f}s + est {est_s:.0f}s "
            f"> budget {_BUDGET:.0f}s)",
            file=sys.stderr,
        )
        return
    t0 = time.monotonic()
    try:
        fn()
        print(
            f"bench: {name} ok in {time.monotonic() - t0:.1f}s "
            f"(elapsed {time.monotonic() - _T0:.0f}s)",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"bench: {name} FAILED after {time.monotonic() - t0:.1f}s: {e}",
              file=sys.stderr)


def _build_twin(name: str, extra_deps=()) -> str:
    """Compile a baselines/<name>.cpp twin if stale; returns the exe path."""
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "baselines", f"{name}.cpp")
    exe = os.path.join(here, "baselines", name)
    mtime = max(
        [os.path.getmtime(src)]
        + [os.path.getmtime(os.path.join(here, d)) for d in extra_deps]
    )
    if not os.path.exists(exe) or os.path.getmtime(exe) < mtime:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-pthread", "-o", exe, src],
            check=True,
        )
    return exe


def _cpu_baseline_rate(B=512, M=150, N=150, iters=3) -> float:
    """alignments/s for the C++ scalar reference twin (cached)."""
    exe = _build_twin("cpu_sw")
    out = subprocess.run(
        [exe, str(B), str(M), str(N), str(iters)],
        check=True,
        capture_output=True,
        text=True,
    )
    return float(out.stdout.strip())


def _cpu_fm_baseline_rate(
    text_len=100_000, B=65536, L=20, occ_k=64, iters=3, threads=1
):
    """queries/s for the C++ FM-index reference twin (bwt.rs hot loop)."""
    exe = _build_twin("cpu_fm")
    out = subprocess.run(
        [exe, str(text_len), str(B), str(L), str(occ_k), str(iters),
         str(threads)],
        check=True,
        capture_output=True,
        text=True,
    )
    return float(out.stdout.strip().splitlines()[-1])


def _best_of(f, n=5) -> float:
    """Best-of-n seconds for f() (one policy for every reported rate).

    Each f() must end in an np.asarray device->host pull: the axon tunnel
    adds multi-ms jitter per sync and block_until_ready is unreliable, so
    the minimum over n full syncs is the honest device throughput."""
    dt = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        dt = min(dt, time.perf_counter() - t0)
    return dt


def _free_device():
    """Release big device indexes between rows: several device methods
    jit with static self, so the jit cache holds a STRONG ref to the
    whole index (at 1-2 Gbp that pins GBs of HBM across rows).  Clearing
    jax's caches breaks those refs; later rows recompile from the
    persistent on-disk compile cache.  CALLERS must drop their own
    reference (``del idx`` / return) before or right after calling this —
    a passed-in object cannot be released from here."""
    import gc
    import jax

    jax.clear_caches()
    gc.collect()


def _fm_queries_per_s() -> float:
    """Secondary stat: batched FM-index backward searches per second."""
    import jax.numpy as jnp

    from rust_bio_tpu.alphabets import dna
    from rust_bio_tpu.data_structures.bwt import bwt
    from rust_bio_tpu.data_structures.fm_device import DeviceFMIndex
    from rust_bio_tpu.data_structures.suffix_array import suffix_array

    rng = np.random.default_rng(11)
    text = rng.choice(list(b"ACGT"), size=100_000).astype(np.uint8).tobytes() + b"$"
    sa = suffix_array(text)
    idx = DeviceFMIndex(bwt(text, sa), dna.n_alphabet())
    B, L = 65536, 20
    pats = np.zeros((B, L), dtype=np.uint8)
    starts = rng.integers(0, len(text) - L - 1, size=B)
    tarr = np.frombuffer(text, dtype=np.uint8)
    for i, s in enumerate(starts):
        pats[i] = tarr[s : s + L]
    plens = np.full(B, L, dtype=np.int32)
    pats_d, plens_d = jnp.asarray(pats), jnp.asarray(plens)
    K = 64

    def run():
        s = None
        for _ in range(K):
            out = idx._search_kernel(pats_d, plens_d)
            s = out[3] if s is None else s + out[3]
        _ = np.asarray(s).sum()  # forces full sync

    run()
    return K * B / _best_of(run)


def _pairhmm_pairs_per_s() -> float:
    """PairHMM forward pairs/s on the reference bench geometry
    (benches/pairhmm.rs:9-19): 54 bp Illumina reads vs ~207 bp texts,
    semiglobal, scaled linear-space Pallas kernel (exact-fallback path)."""
    import math

    from rust_bio_tpu.stats.pairhmm.device import BatchPairHMMLinear

    PROB_INS, PROB_DEL, PROB_SUBST = 2.8e-6, 5.1e-6, 0.0021
    B, M, N = 4096, 207, 54
    rng = np.random.default_rng(13)
    xs = rng.integers(0, 4, size=(B, M)).astype(np.uint8) + ord("A")
    ys = np.zeros((B, N), np.uint8)
    for i in range(B):
        s = int(rng.integers(0, M - N))
        ys[i] = xs[i, s : s + N]
        for _ in range(2):  # a couple of sequencing errors
            ys[i, int(rng.integers(0, N))] = ord("A") + int(rng.integers(0, 4))
    emit = np.array(
        [
            math.log(1.0 - PROB_SUBST),
            math.log(PROB_SUBST / 3.0),
            math.log(1.0 - PROB_SUBST),
        ]
    )
    hmm = BatchPairHMMLinear(
        prob_gap_x=math.log(PROB_INS),
        prob_gap_y=math.log(PROB_DEL),
        prob_gap_x_extend=float("-inf"),
        prob_gap_y_extend=float("-inf"),
    )

    # prob_related_batch syncs internally (exact-fallback check); verify
    # once that no lane underflows on this workload, then time the Pallas
    # kernel path it dispatches to, chained K deep per sync
    from rust_bio_tpu.ops.pairhmm_pallas import pairhmm_fwd_scaled
    import jax.numpy as jnp

    out0 = hmm.prob_related_batch(xs, ys, emit, semiglobal=True)
    assert np.isfinite(out0).all(), "underflow lanes would hit the fallback"
    g = hmm.g
    params = np.exp(
        np.array(
            [
                g["no_gap"], g["no_gap_x_extend"], g["no_gap_y_extend"],
                g["gap_x"], g["gap_y"], g["gap_x_extend"], g["gap_y_extend"],
                emit[0], emit[1], emit[2],
            ],
            np.float64,
        ).clip(min=-700)
    ).astype(np.float32)
    xs_d, ys_d = jnp.asarray(xs), jnp.asarray(ys)
    xl = jnp.asarray(np.full(B, M, np.int32))
    yl = jnp.asarray(np.full(B, N, np.int32))
    K = 64

    def run():
        s = None
        for _ in range(K):
            o = pairhmm_fwd_scaled(xs_d, ys_d, xl, yl, params, True)
            s = o if s is None else s + o
        _ = float(np.asarray(s).sum())

    run()
    return K * B / _best_of(run)


def _smem_50mbp_reads_per_s() -> float:
    """End-to-end SMEM mapping at genome scale: 50 Mbp genome (100 Mbp FMD
    text), 100 bp reads with 2 errors, measured in the production shape —
    ``map_stream`` over successive batches, so batch i+1's SMEM kernel
    overlaps batch i's retries/locate/extend/assembly (steady-state
    pipelined throughput, same policy as the alignment rows' chained
    dispatches)."""
    from rust_bio_tpu.pipelines.read_mapper import SmemReadMapper

    rng = np.random.default_rng(37)
    G = 50_000_000
    genome = rng.choice(list(b"ACGT"), size=G).astype(np.uint8).tobytes()
    os.makedirs(_CACHE_DIR, exist_ok=True)
    mapper = SmemReadMapper(
        genome,
        min_seed_len=19,
        index_cache=os.path.join(_CACHE_DIR, "smem_50mbp_v1.npz"),
    )
    B, L, NB = 1024, 100, 6
    batches = []
    all_starts = []
    for _ in range(NB):
        starts = rng.integers(0, G - L, size=B)
        reads = []
        for s in starts:
            r = bytearray(genome[s : s + L])
            for _ in range(2):
                r[int(rng.integers(0, L))] = int(rng.choice(list(b"ACGT")))
            reads.append(bytes(r))
        batches.append(reads)
        all_starts.append(starts)
    outs = [m for batch in mapper.map_stream(batches) for m in batch]
    ok = sum(
        1
        for m, s in zip(outs, np.concatenate(all_starts))
        if m.pos == s
    )
    assert ok >= NB * B * 9 // 10, f"only {ok}/{NB * B} mapped at 50 Mbp"

    def run():
        for _ in mapper.map_stream(batches):
            pass

    return NB * B / _best_of(run, 3)


def _cpu_pairhmm_baseline_rate(B=1024, M=207, N=54, iters=3, band=4):
    """pairs/s for the -O3 C++ twin of the reference's banded PairHMM
    bench loop (benches/pairhmm.rs:88-103, max_edit_dist=4, fastexp
    LogProb arithmetic; parity-tested vs the host oracle)."""
    exe = _build_twin("cpu_pairhmm")
    out = subprocess.run(
        [exe, str(B), str(M), str(N), str(iters), str(band)],
        check=True,
        capture_output=True,
        text=True,
    )
    return float(out.stdout.strip().splitlines()[-1])


def _pairhmm_exact_rates():
    """The PARITY path: oracle-order f64 PairHMM (stats/pairhmm/exact.py,
    4.3e-15 rel on chip) on the reference bench geometry. f64 on TPU is
    emulated double-float, so this documents the exact-path cost next to
    the f32 kernel's fast number.  Returns (unbanded pairs/s, banded
    max_edit_dist=4 pairs/s — the reference bench's own configuration,
    benches/pairhmm.rs:97-100 — and the banded cpu twin's pairs/s)."""
    import math

    import jax
    import jax.numpy as jnp

    from rust_bio_tpu.stats.pairhmm.exact import BatchPairHMMExact

    PROB_INS, PROB_DEL, PROB_SUBST = 2.8e-6, 5.1e-6, 0.0021
    B, M, N = 1024, 207, 54
    rng = np.random.default_rng(13)
    xs = rng.integers(0, 4, size=(B, M)).astype(np.uint8) + ord("A")
    ys = np.zeros((B, N), np.uint8)
    for i in range(B):
        s = int(rng.integers(0, M - N))
        ys[i] = xs[i, s : s + N]
        for _ in range(2):
            ys[i, int(rng.integers(0, N))] = ord("A") + int(rng.integers(0, 4))
    emit = np.array(
        [
            math.log(1.0 - PROB_SUBST),
            math.log(PROB_SUBST / 3.0),
            math.log(1.0 - PROB_SUBST),
        ]
    )
    with jax.enable_x64(True):
        hmm = BatchPairHMMExact(
            prob_gap_x=math.log(PROB_INS),
            prob_gap_y=math.log(PROB_DEL),
            prob_gap_x_extend=float("-inf"),
            prob_gap_y_extend=float("-inf"),
        )
        xs_d, ys_d = jnp.asarray(xs), jnp.asarray(ys)
        xl = jnp.asarray(np.full(B, M, np.int32))
        yl = jnp.asarray(np.full(B, N, np.int32))
        ed = jnp.asarray(emit, jnp.float64)
        K = 4

        def run():
            s = None
            for _ in range(K):
                o = hmm._forward(xs_d, ys_d, xl, yl, ed, semiglobal=True)
                s = o if s is None else s + o
            _ = float(np.asarray(s).sum())

        run()
        unbanded = K * B / _best_of(run, 3)

        def run_banded():
            s = None
            for _ in range(K):
                o = hmm._forward(
                    xs_d, ys_d, xl, yl, ed, semiglobal=True,
                    max_edit_dist=4,
                )
                s = o if s is None else s + o
            _ = float(np.asarray(s).sum())

        run_banded()
        banded = K * B / _best_of(run_banded, 3)

    cpu = _cpu_pairhmm_baseline_rate(B=min(B, 1024), M=M, N=N, iters=2)
    return unbanded, banded, cpu


def _homopoly_pairs_per_s():
    """HomopolyPairHMM device path (14-state, f32) on the bench geometry."""
    import math

    import jax.numpy as jnp

    from rust_bio_tpu.stats.pairhmm.homopoly_device import BatchHomopolyPairHMM

    PROB_INS, PROB_DEL, PROB_SUBST = 2.8e-6, 5.1e-6, 0.0021
    B, M, N = 2048, 207, 54
    rng = np.random.default_rng(15)
    xs = rng.integers(0, 4, size=(B, M)).astype(np.uint8) + ord("A")
    ys = np.zeros((B, N), np.uint8)
    for i in range(B):
        s = int(rng.integers(0, M - N))
        ys[i] = xs[i, s : s + N]
    p_match = math.log1p(-PROB_SUBST)
    emit = np.array([p_match, math.log(PROB_SUBST / 3.0), p_match, p_match])
    hmm = BatchHomopolyPairHMM(
        prob_gap_x=math.log(PROB_INS),
        prob_gap_y=math.log(PROB_DEL),
        prob_gap_x_extend=float("-inf"),
        prob_gap_y_extend=float("-inf"),
        prob_hop_x=math.log(1e-4),
        prob_hop_y=math.log(1e-4),
        prob_hop_x_extend=math.log(0.5),
        prob_hop_y_extend=math.log(0.5),
    )
    xs_d, ys_d = jnp.asarray(xs), jnp.asarray(ys)
    xl = jnp.asarray(np.full(B, M, np.int32))
    yl = jnp.asarray(np.full(B, N, np.int32))
    ed = jnp.asarray(emit, jnp.float32)
    K = 16

    def run():
        s = None
        for _ in range(K):
            o = hmm._forward(xs_d, ys_d, xl, yl, ed, True)
            s = o if s is None else s + o
        _ = float(np.asarray(s).sum())

    run()
    rate = K * B / _best_of(run, 3)

    exe = _build_twin("cpu_homopoly")
    out = subprocess.run(
        [exe, "256", str(M), str(N), "2"],
        check=True, capture_output=True, text=True,
    )
    cpu = float(out.stdout.strip().splitlines()[-1])
    return rate, cpu


def _poa_rates():
    """Batched POA scorer on a consensus graph (7 reads threaded through a
    200 bp backbone): device scores/s and the host Poa twin's rate."""
    import jax.numpy as jnp

    from rust_bio_tpu.alignment.poa import Aligner
    from rust_bio_tpu.alignment.poa_batch import BatchPoa, _poa_scores_kernel
    from rust_bio_tpu.alignment.pairwise.scoring import Scoring

    rng = np.random.default_rng(41)
    sc = Scoring.from_scores(-4, -4, 3, -2)
    L = 200
    backbone = rng.choice(list(b"ACGT"), size=L).astype(np.uint8)
    al = Aligner(sc, backbone.tobytes())
    for _ in range(7):
        r = backbone.copy()
        idx = rng.random(L) < 0.04
        r[idx] = rng.choice(list(b"ACGT"), size=int(idx.sum()))
        al.global_(r.tobytes()).add_to_graph()
    bp = BatchPoa(sc, al)

    B = 512
    qb = np.zeros((B, L), np.uint8)
    for k in range(B):
        r = backbone.copy()
        idx = rng.random(L) < 0.04
        r[idx] = rng.choice(list(b"ACGT"), size=int(idx.sum()))
        qb[k] = r
    # device == host parity spot-check (3 queries)
    got = bp.global_scores([qb[k].tobytes() for k in range(3)])
    for k in range(3):
        want = al.global_(qb[k].tobytes()).alignment().score
        assert int(got[k]) == want

    qb_d = jnp.asarray(qb.astype(np.int32))
    ql_d = jnp.asarray(np.full(B, L, np.int32))
    K = 16

    def run():
        s = None
        for _ in range(K):
            o = _poa_scores_kernel(
                qb_d, ql_d, bp.topo, bp.pred_rows, bp.pred_mask,
                bp.is_root, bp.weights, bp.pens, bp.last_row,
            )
            s = o if s is None else s + o
        _ = float(np.asarray(s).sum())

    run()
    rate = K * B / _best_of(run, 3)

    t0 = time.perf_counter()
    nh = 3
    for k in range(nh):
        al.global_(qb[k].tobytes())
    host_rate = nh / (time.perf_counter() - t0)

    # compiled twin of the reference's Poa::custom DP (poa.rs:498-567) on
    # the SAME frozen graph + query batch; probe scores parity-checked
    # against the host oracle's alignment scores computed above
    g = al.poa.graph
    m = g.node_count()
    os.makedirs(_CACHE_DIR, exist_ok=True)
    gbin = os.path.join(_CACHE_DIR, "poa_graph.bin")
    with open(gbin, "wb") as f:
        f.write(np.int32(m).tobytes())
        f.write(np.asarray(g.weights, np.uint8).tobytes())
        f.write(np.asarray(g.topo_order(), np.int32).tobytes())
        preds = [np.asarray(g.incoming(v), np.int32) for v in range(m)]
        f.write(np.asarray([len(p) for p in preds], np.int32).tobytes())
        for p in preds:
            f.write(p.tobytes())
        f.write(np.int32(B).tobytes())
        f.write(np.int32(L).tobytes())
        f.write(qb.astype(np.uint8).tobytes())
        mp = sc.match_fn
        f.write(
            np.asarray(
                [sc.gap_open, mp.match_score, mp.mismatch_score], np.int32
            ).tobytes()
        )
    exe = _build_twin("cpu_poa")
    out = subprocess.run(
        [exe, gbin, "4"], check=True, capture_output=True, text=True
    )
    lines = out.stdout.strip().splitlines()
    probe = [int(x) for x in lines[0].split()]
    want = [
        al.global_(qb[k].tobytes()).alignment().score for k in range(3)
    ]
    assert probe == want, f"cpu_poa twin parity: {probe} != {want}"
    twin_rate = float(lines[-1])

    # delivered full PoaAlignments: device forward + device score-diff
    # traceback in one dispatch, pull, host op decode — op lists are
    # oracle-identical (tests/test_poa.py::test_batch_poa_global_
    # alignments_op_exact)
    queries = [qb[k].tobytes() for k in range(B)]
    alns = bp.global_alignments(queries)
    assert alns[0].score == want[0]

    def run_delivered():
        bp.global_alignments(queries)

    delivered_rate = B / _best_of(run_delivered, 3)
    return rate, host_rate, twin_rate, delivered_rate


def _sw_5kb_rates():
    """The reference pairwise bench corpus geometry
    (benches/pairwise.rs:140-158): ~5.1 kb STR-bearing pairs, global mode,
    full traceback, on the block-row long-sequence Pallas engine.

    Returns (device alignments/s, cpu twin alignments/s)."""
    import jax.numpy as jnp

    from rust_bio_tpu.alignment.pairwise.batched import (
        _align_batch_device_global_rows_mp,
    )
    from rust_bio_tpu.alignment.pairwise.scoring import MIN_SCORE

    # B = 128 fills the 128 VPU lanes (the per-batch vector op count is
    # lane-padded and therefore ~constant in B: 141 ms at B=8 vs 154 ms at
    # B=128 measured); the uint16 traceback tensor is 6.9 GB at this shape,
    # so one batch is in flight per sync (K=1)
    B, M = 128, 5100
    rng = np.random.default_rng(17)
    # STR-like corpus: random backbone with repeated motifs spliced in
    xb = rng.integers(0, 4, size=(B, M)).astype(np.uint8)
    for i in range(B):
        motif = rng.integers(0, 4, size=4).astype(np.uint8)
        for _ in range(6):
            s = int(rng.integers(0, M - 200))
            xb[i, s : s + 200] = np.tile(motif, 50)
    yb = xb.copy()
    idx = rng.random(size=(B, M)) < 0.05  # diverged copies
    yb[idx] = rng.integers(0, 4, size=int(idx.sum())).astype(np.uint8)
    xb += ord("A")
    yb += ord("A")
    xd, yd = jnp.asarray(xb), jnp.asarray(yb)
    lens = jnp.full((B,), M, dtype=jnp.int32)
    pen8 = jnp.asarray(
        np.array(
            [-5, -1, MIN_SCORE, MIN_SCORE, MIN_SCORE, MIN_SCORE, 2, -2],
            np.int32,
        )
    )
    K = 1

    def run():
        s = None
        for _ in range(K):
            out = _align_batch_device_global_rows_mp(xd, yd, lens, lens, pen8)
            s = out["score"] if s is None else s + out["score"]
        return int(np.asarray(s).sum())

    run()
    dev_rate = K * B / _best_of(run)
    cpu_rate = _cpu_baseline_rate(B=4, M=M, N=M, iters=1)
    return dev_rate, cpu_rate


def _sw_cigar_delivered_per_s() -> float:
    """DELIVERED-CIGAR throughput on the headline workload: the same
    8192x150bp global batch, but the timed loop pulls the packed RLE
    tensor (one transfer) and runs the vectorized host CIGAR merge
    (PackedSemiglobal.cigars) — i.e. what a consumer that needs the
    CIGAR strings in host memory actually gets, vs the device-compute
    headline row which leaves the ops tensor on device.  K handles are
    dispatched first so device compute overlaps host pull+decode."""
    from rust_bio_tpu.alignment.pairwise.batched import BatchAligner
    from rust_bio_tpu.alignment.pairwise.scoring import Scoring

    B, M, N = 8192, 150, 150
    rng = np.random.default_rng(7)
    xb = rng.integers(0, 4, size=(B, M)).astype(np.uint8) + ord("A")
    yb = rng.integers(0, 4, size=(B, N)).astype(np.uint8) + ord("A")
    mlens = np.full(B, M, np.int32)
    nlens = np.full(B, N, np.int32)
    ba = BatchAligner(Scoring.from_scores(-5, -1, 2, -2))

    # warm + sanity: every lane yields a CIGAR consuming all of x
    p = BatchAligner.global_packed_finish(
        ba.global_packed_async_arrays(xb, yb, mlens, nlens)
    )
    cigs = p.cigars()
    assert len(cigs) == B and all(cigs)

    K = 8

    def run():
        handles = [
            ba.global_packed_async_arrays(xb, yb, mlens, nlens)
            for _ in range(K)
        ]
        for h in handles:
            BatchAligner.global_packed_finish(h).cigars()

    run()
    return K * B / _best_of(run, 3)


def _mut_reads(genome, starts, L, rng):
    """Reads with 2 mixed errors each: substitutions (70%), or 1-2 bp
    deletions/insertions (15%/15%), placed >=10 bp from the read ends so
    the true mapping position stays the window start."""
    reads = []
    for s in starts:
        r = bytearray(genome[s : s + L + 8])  # slack for deletions
        for _ in range(2):
            p = int(rng.integers(10, L - 10))
            kind = rng.random()
            if kind < 0.70:
                r[p] = int(rng.choice(list(b"ACGT")))
            elif kind < 0.85:
                del r[p : p + int(rng.integers(1, 3))]
            else:
                ins = rng.choice(list(b"ACGT"), size=int(rng.integers(1, 3)))
                r[p:p] = ins.astype(np.uint8).tobytes()
        reads.append(bytes(r[:L]))
    return reads


def _smem_reads_per_s():
    """End-to-end SMEM-seeded read mapping (bwa-mem-style): 1 Mbp genome,
    100 bp reads with 2 mixed substitution+indel errors, both strands,
    full CIGARs.  Returns (single-batch map_batch rate, streamed
    map_stream rate) — the streamed rate is the production shape, where
    batch i+1's seed kernel overlaps batch i's extension/decode."""
    from rust_bio_tpu.pipelines.read_mapper import SmemReadMapper

    rng = np.random.default_rng(29)
    G = 1_000_000
    genome = rng.choice(list(b"ACGT"), size=G).astype(np.uint8).tobytes()
    mapper = SmemReadMapper(genome, min_seed_len=19)
    B, L = 8192, 100
    starts = rng.integers(0, G - L - 8, size=B)
    reads = _mut_reads(genome, starts, L, rng)
    out = mapper.map_batch(reads)
    ok = sum(1 for m, s in zip(out, starts) if m.pos == s)
    assert ok >= B * 9 // 10, f"only {ok}/{B} mapped"

    def run():
        mapper.map_batch(reads)

    batch_rate = B / _best_of(run, 3)

    # streamed: 3 FULL-WIDTH batches through the software pipeline
    # (narrower chunks lose to lockstep kernel latency: 4x2048 streams
    # at ~11K vs 15K for one 8192 batch); batch i+1's seed kernel +
    # upload overlap batch i's extension pull + host decode
    NB = 3
    batches = [reads]
    for _ in range(NB - 1):
        bstarts = rng.integers(0, G - L - 8, size=B)
        batches.append(_mut_reads(genome, bstarts, L, rng))

    def run_stream():
        for _ in mapper.map_stream(batches):
            pass

    stream_rate = NB * B / _best_of(run_stream, 3)
    return batch_rate, stream_rate


_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".bench_cache"
)

_ACGT_LUT = np.frombuffer(b"ACGT", np.uint8)


def _dna_text(G: int, seed: int) -> bytes:
    """Vectorized random DNA text (a per-char Python loop costs minutes
    at Gbp scale)."""
    rng = np.random.default_rng(seed)
    return _ACGT_LUT[rng.integers(0, 4, size=G, dtype=np.uint8)].tobytes()


def _repeat_genome(G: int, seed: int):
    """Repeat-structured genome: ~20% of the sequence is segmental
    duplications (0.5-3 kb copies) plus tandem repeats (2-50 bp units,
    10-100 copies) pasted over a random backbone — the regime that
    stresses SMEM slot compaction, the overflow retries, and locate at
    wide intervals (random texts are the EASY case for FM seeding).
    Returns (genome bytes, uniquely_mappable (G,) bool mask: positions
    never overwritten by a paste)."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 4, size=G, dtype=np.uint8)
    pasted = np.zeros(G, bool)
    dup_target = int(G * 0.15)
    placed = 0
    while placed < dup_target:
        L = int(rng.integers(500, 3000))
        src = int(rng.integers(0, G - L))
        dst = int(rng.integers(0, G - L))
        base[dst : dst + L] = base[src : src + L]
        pasted[dst : dst + L] = True
        # the SOURCE copy is no longer uniquely mappable either
        pasted[src : src + L] = True
        placed += L
    tr_target = int(G * 0.05)
    placed = 0
    while placed < tr_target:
        u = int(rng.integers(2, 50))
        reps = int(rng.integers(10, 100))
        L = u * reps
        dst = int(rng.integers(0, G - L))
        base[dst : dst + L] = np.tile(
            rng.integers(0, 4, size=u, dtype=np.uint8), reps
        )
        pasted[dst : dst + L] = True
        placed += L
    return _ACGT_LUT[base].tobytes(), ~pasted


def _fm_big_rates(G: int, seed: int, tag: str, twin_threads: int = 0):
    """Human-genome-scale FM search: G bp text, HBM bit-plane rank +
    q=12 LUT jump, vs the cpu_fm twin queried on the SAME text (the twin
    gets the cached BWT injected — its own Gbp-scale int64 SA build
    would cost tens of GB and minutes per bench run; build time is
    unmeasured in every FM row).  The index is built once (native SAIS —
    u8/i32 below 2^31 symbols, u8/u32 above, the reference's dtype
    dispatch, suffix_array.rs:270-281) and cached under .bench_cache/;
    the query substrings are persisted alongside so cache-hit runs never
    regenerate the Gbp text.
    Returns (lut q/s, plain q/s, twin q/s[, twin q/s at twin_threads])."""
    import gc
    import jax
    import jax.numpy as jnp

    from rust_bio_tpu.alphabets import dna
    from rust_bio_tpu.data_structures.bwt import bwt
    from rust_bio_tpu.data_structures.fm_device import DeviceFMIndex
    from rust_bio_tpu.data_structures.serialize import (
        load_fm_index,
        save_fm_index,
    )
    from rust_bio_tpu.data_structures.suffix_array import suffix_array

    os.makedirs(_CACHE_DIR, exist_ok=True)
    cache = os.path.join(_CACHE_DIR, f"fm_{tag}_v1.npz")
    pats_full = os.path.join(_CACHE_DIR, f"fm_{tag}_patsfull.npy")
    B, L = 65536, 20
    text = None
    if os.path.exists(cache):
        # skip the sha256 integrity pass: it reads all N GB twice
        idx = load_fm_index(cache, verify=False)
        assert idx.n == G + 1
    elif G > 1_500_000_000 and not os.environ.get("BENCH_BUILD_BIG"):
        # a Gbp-scale inline build costs 0.5-2+ hours; it must be prebuilt
        # (scripts/build_big_fm_cache.py sets BENCH_BUILD_BIG) — report
        # the row as absent instead of stalling a driver bench run
        raise RuntimeError(
            f"{tag} cache missing; run scripts/build_3gbp_cache.py first"
        )
    else:
        text = _dna_text(G, seed) + b"$"
        t0 = time.perf_counter()
        sa = suffix_array(text)
        t_sa = time.perf_counter() - t0
        b = bwt(text, sa)
        del sa
        gc.collect()
        idx = DeviceFMIndex(b, dna.n_alphabet())
        del b
        gc.collect()
        idx.build_kmer_lut(q=12)
        save_fm_index(cache, idx, compress=False)
        print(
            f"fm_{tag}: built (SAIS {t_sa:.0f}s, total "
            f"{time.perf_counter() - t0:.0f}s), cached to {cache}",
            file=sys.stderr,
        )
    assert idx._fs_cfg is None and not idx._mxu_swt

    if os.path.exists(pats_full):
        pats = np.load(pats_full)
        assert pats.shape == (B, L)
    else:
        if text is None:
            text = _dna_text(G, seed) + b"$"
        rng = np.random.default_rng(27)
        starts = rng.integers(0, G - L - 1, size=B)
        tarr = np.frombuffer(text, dtype=np.uint8)
        pats = tarr[starts[:, None] + np.arange(L)[None, :]]
        np.save(pats_full, pats)
    del text
    gc.collect()
    plens = np.full(B, L, dtype=np.int32)
    pats_d, plens_d = jnp.asarray(pats), jnp.asarray(plens)

    st, lo, up, ml = idx.search_batch_lut(pats[:2048], plens[:2048])
    assert (st == 2).all() and (ml == L).all()
    _, _, _, _, miss = jax.tree.map(
        np.asarray, idx._search_kernel_lut(pats_d, plens_d)
    )
    assert not miss.any()

    K = 8

    def run_lut():
        s = None
        for _ in range(K):
            out = idx._search_kernel_lut(pats_d, plens_d)
            s = out[3] if s is None else s + out[3]
        _ = np.asarray(s).sum()

    run_lut()
    lut_rate = K * B / _best_of(run_lut, 3)

    def run_plain():
        s = None
        for _ in range(K):
            out = idx._search_kernel(pats_d, plens_d)
            s = out[3] if s is None else s + out[3]
        _ = np.asarray(s).sum()

    run_plain()
    plain_rate = K * B / _best_of(run_plain, 3)

    # twin on the SAME text: inject the cached BWT + real-substring pats
    exe = _build_twin("cpu_fm")
    bwt_path = os.path.join(_CACHE_DIR, f"fm_{tag}_bwt.bin")
    if not os.path.exists(bwt_path):
        idx.bwt_host().tofile(bwt_path)
    Bt = 16384
    pat_path = os.path.join(_CACHE_DIR, f"fm_{tag}_pats.bin")
    if not os.path.exists(pat_path):
        pats[:Bt].tofile(pat_path)
    # ONE twin invocation times every thread count (the Gbp-scale occ
    # build inside the twin costs minutes and must be shared).  The twin
    # rates are machine properties, not device code under test: they are
    # measured once per (tag, B, L, threads) and cached so driver runs
    # spend their budget on the device rows (BENCH_FRESH_TWIN=1 forces a
    # re-measure; delete .bench_cache/twin_rates.json after changing
    # baselines/cpu_fm.cpp).
    tcounts = ["1"] + ([str(twin_threads)] if twin_threads else [])
    tr_path = os.path.join(_CACHE_DIR, "twin_rates.json")
    tr_key = f"cpu_fm:{tag}:{Bt}:{L}:" + ",".join(tcounts)
    twin_cache = {}
    if os.path.exists(tr_path):
        with open(tr_path) as f:
            twin_cache = json.load(f)
    if tr_key in twin_cache and not os.environ.get("BENCH_FRESH_TWIN"):
        lines = twin_cache[tr_key]
    else:
        out = subprocess.run(
            [exe, "--bwt", bwt_path, pat_path, str(Bt), str(L), "64", "2",
             *tcounts],
            check=True,
            capture_output=True,
            text=True,
        )
        lines = out.stdout.strip().splitlines()[-len(tcounts):]
        twin_cache[tr_key] = lines
        with open(tr_path, "w") as f:
            json.dump(twin_cache, f)
    rates = [lut_rate, plain_rate] + [float(v) for v in lines]

    del idx, pats_d, plens_d
    _free_device()
    return tuple(rates)


def _fm_1gbp_rates():
    return _fm_big_rates(1_000_000_000, 23, "1gbp")


def _fm_2gbp_rates():
    """2 Gbp — the largest text the u8/i32 SAIS path holds (n < 2^31;
    the reference's dtype-dispatch threshold, suffix_array.rs:270-281).
    Build: ~35 min / ~57 GB host RSS, cached.  With the lazy BWT-byte
    upload the search row costs ~2.6 GB HBM (fused planes + LUT)."""
    return _fm_big_rates(2_000_000_000, 61, "2gbp", twin_threads=4)


def _fm_3gbp_rates():
    """3.1 Gbp — the full human-genome envelope.  n >= 2^31 takes the
    u8-text/u32-SA SAIS instantiation (the reference's dtype dispatch,
    suffix_array.rs:270-281, realized as u32 here: n < 2^32 halves the
    i64 working set) and the uint32 rank/search kernels (interval bounds
    no longer fit int32).  Cache prebuilt by
    scripts/build_big_fm_cache.py; the row reports absent if missing."""
    return _fm_big_rates(3_100_000_000, 71, "3gbp", twin_threads=4)


def _smem_300mbp_reads_per_s() -> float:
    """End-to-end SMEM mapping at 300 Mbp (600 Mbp FMD text), 100 bp
    reads with 2 errors, streamed (production shape).  The FMD index is
    built once (native SAIS) and cached under .bench_cache/."""
    import gc

    from rust_bio_tpu.pipelines.read_mapper import SmemReadMapper

    G = 300_000_000
    os.makedirs(_CACHE_DIR, exist_ok=True)
    cache = os.path.join(_CACHE_DIR, "smem_300mbp_v1.npz")
    genome = _dna_text(G, 29)
    t0 = time.perf_counter()
    fresh = not os.path.exists(cache)
    mapper = SmemReadMapper(genome, min_seed_len=19, index_cache=cache)
    if fresh:
        print(
            f"smem_300mbp: built + cached in {time.perf_counter() - t0:.0f}s",
            file=sys.stderr,
        )
    rng = np.random.default_rng(31)
    B, L, NB = 1024, 100, 4
    batches = []
    all_starts = []
    for _ in range(NB):
        starts = rng.integers(0, G - L, size=B)
        reads = []
        for s in starts:
            r = bytearray(genome[s : s + L])
            for _ in range(2):
                r[int(rng.integers(0, L))] = int(rng.choice(list(b"ACGT")))
            reads.append(bytes(r))
        batches.append(reads)
        all_starts.append(starts)
    outs = [m for batch in mapper.map_stream(batches) for m in batch]
    ok = sum(
        1 for m, s in zip(outs, np.concatenate(all_starts)) if m.pos == s
    )
    assert ok >= NB * B * 85 // 100, f"only {ok}/{NB * B} mapped at 300 Mbp"

    def run():
        for _ in mapper.map_stream(batches):
            pass

    rate = NB * B / _best_of(run, 3)
    del mapper
    _free_device()
    return rate


def _smem_repeats_rates():
    """SMEM mapping on a repeat-structured genome (the HARD case for FM
    seeding: ~20% duplications + tandem repeats).  Returns (1 Mbp-class
    reads/s, fraction of uniquely-originating reads mapped to their true
    position, 50 Mbp-class reads/s)."""
    import gc

    from rust_bio_tpu.pipelines.read_mapper import SmemReadMapper

    # --- 1 Mbp class ---
    G1 = 1_000_000
    genome, uniq = _repeat_genome(G1, 41)
    mapper = SmemReadMapper(genome, min_seed_len=19)
    rng = np.random.default_rng(43)
    B, L = 8192, 100
    # cumulative mask: a read start is "uniquely originating" iff its
    # whole window avoids pasted regions
    cm = np.concatenate([[0], np.cumsum(~uniq)])
    starts = rng.integers(0, G1 - L, size=B)
    read_uniq = (cm[starts + L] - cm[starts]) == 0
    reads = _mut_reads(genome, starts, L, rng)
    out = mapper.map_batch(reads)
    okn = sum(
        1
        for m, s, u in zip(out, starts, read_uniq)
        if u and m.pos == s
    )
    nu = int(read_uniq.sum())
    frac = okn / max(nu, 1)
    assert frac >= 0.9, f"only {okn}/{nu} uniquely-mappable reads mapped"

    def run():
        mapper.map_batch(reads)

    rate1 = B / _best_of(run, 3)
    # NOTE: no jax.clear_caches() here — re-TRACING the mapper's Pallas
    # kernels costs ~10+ min of host CPU (tracing/lowering is not disk-
    # cached); the 1 Mbp index pins only ~10 MB
    del mapper
    import gc

    gc.collect()

    # --- 50 Mbp class ---
    G50 = 50_000_000
    genome50, uniq50 = _repeat_genome(G50, 47)
    os.makedirs(_CACHE_DIR, exist_ok=True)
    mapper50 = SmemReadMapper(
        genome50,
        min_seed_len=19,
        index_cache=os.path.join(_CACHE_DIR, "smem_rep50mbp_v1.npz"),
    )
    cm50 = np.concatenate([[0], np.cumsum(~uniq50)])
    NB = 4
    batches = []
    metas = []
    for _ in range(NB):
        starts = rng.integers(0, G50 - L, size=1024)
        ru = (cm50[starts + L] - cm50[starts]) == 0
        batches.append(_mut_reads(genome50, starts, L, rng))
        metas.append((starts, ru))
    outs = [m for batch in mapper50.map_stream(batches) for m in batch]
    okn = 0
    nu = 0
    flat = [
        (s, u)
        for starts, ru in metas
        for s, u in zip(starts, ru)
    ]
    for m, (s, u) in zip(outs, flat):
        if u:
            nu += 1
            okn += m.pos == s
    assert okn >= nu * 85 // 100, f"only {okn}/{nu} at 50 Mbp repeats"

    def run50():
        for _ in mapper50.map_stream(batches):
            pass

    rate50 = NB * 1024 / _best_of(run50, 3)
    del mapper50
    gc.collect()
    return rate1, frac, rate50


def _fixed_window_mapper_reads_per_s() -> float:
    """Fixed-window seed-and-extend mapper (ReadMapper): 1 Mbp genome,
    100 bp error-free-window reads, both strands, full CIGARs."""
    from rust_bio_tpu.pipelines.read_mapper import ReadMapper

    rng = np.random.default_rng(43)
    G = 1_000_000
    genome = rng.choice(list(b"ACGT"), size=G).astype(np.uint8).tobytes()
    mapper = ReadMapper(genome, seed_len=20)
    B, L = 2048, 100
    starts = rng.integers(0, G - L, size=B)
    reads = [genome[s : s + L] for s in starts]
    out = mapper.map_batch(reads)
    ok = sum(1 for m, s in zip(out, starts) if m.pos == s)
    assert ok >= B * 9 // 10, f"only {ok}/{B} mapped"

    def run():
        mapper.map_batch(reads)

    return B / _best_of(run, 3)


def _cpu_banded_baseline_rate(
    B=64, M=150, N=20_000, iters=2, threads=1
) -> float:
    """pairs/s for the -O3 C++ twin of the reference's banded pipeline
    (kmer hash + sdpkpp + band raster + banded DP + traceback walk,
    banded.rs; score-parity-tested vs the banded.py oracle)."""
    exe = _build_twin(
        "cpu_banded", extra_deps=("native/biotpu.cpp", "native/banded_dp.hpp")
    )
    out = subprocess.run(
        [exe, str(B), str(M), str(N), str(iters), "8", "8", str(threads)],
        check=True,
        capture_output=True,
        text=True,
    )
    return float(out.stdout.strip().splitlines()[-1])


def _banded_long_rates():
    """Banded aligner in ITS regime (banded.rs:6-16 exists for long
    targets): 150 bp reads vs 20 kb targets, semiglobal, k-mer band.
    Threaded native band build (kmer match + sdpkpp + raster in C++),
    column-window crop on device, async-pipelined batches (band build /
    decode of batch i overlap batch i+1's device DP).  Returns (pipelined
    device pairs/s, single-call sync pairs/s, cpu-twin pairs/s,
    full-matrix device pairs/s at the same shapes)."""
    from rust_bio_tpu.alignment.pairwise.banded_device import (
        BatchBandedAligner,
    )
    from rust_bio_tpu.alignment.pairwise.batched import BatchAligner
    from rust_bio_tpu.alignment.pairwise.scoring import Scoring

    rng = np.random.default_rng(31)
    B, M, N = 2048, 150, 20_000
    NB = 3
    sc = Scoring.from_scores(-5, -1, 2, -2)
    batches = []
    for _ in range(NB):
        xs, ys = [], []
        for _ in range(B):
            y = rng.choice(list(b"ACGT"), size=N).astype(np.uint8).tobytes()
            s = int(rng.integers(0, N - M))
            x = bytearray(y[s : s + M])
            for _ in range(4):
                x[int(rng.integers(0, M))] = int(rng.choice(list(b"ACGT")))
            xs.append(bytes(x))
            ys.append(y)
        batches.append((xs, ys))
    bat = BatchBandedAligner(sc, 8, 8)
    bat.semiglobal(*batches[0])  # compile + warm

    def run_sync():
        bat.semiglobal(*batches[0])

    sync_rate = B / _best_of(run_sync, 3)

    def run_pipe():
        # batch i+1's band build (native threads, GIL-free) runs on an
        # executor thread while the main thread waits out batch i's
        # device compute + pull + decode
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(1) as pool:
            fut = pool.submit(bat.semiglobal_async, *batches[0])
            for nxt in range(1, NB):
                h = fut.result()
                fut = pool.submit(bat.semiglobal_async, *batches[nxt])
                bat.semiglobal_finish(h)
            bat.semiglobal_finish(fut.result())

    run_pipe()
    pipe_rate = NB * B / _best_of(run_pipe, 3)

    cpu_rate = _cpu_banded_baseline_rate()

    # full-matrix device engine at the same shapes (what "don't band"
    # costs at this geometry; scores can legitimately differ — the band
    # restricts the DP)
    ba = BatchAligner(sc)
    xs0, ys0 = batches[0][0][:256], batches[0][1][:256]
    ba.semiglobal(xs0, ys0)  # compile + warm

    def run_full():
        ba.semiglobal(xs0, ys0)

    full_rate = 256 / _best_of(run_full, 2)
    return pipe_rate, sync_rate, cpu_rate, full_rate


def _banded_1kb_rates():
    """Banded aligner with ~1 kb queries vs 20 kb targets (the long-read
    regime the reference's banded aligner documents, banded.rs:6-16).
    Returns (device pairs/s, cpu-twin pairs/s)."""
    from rust_bio_tpu.alignment.pairwise.banded_device import (
        BatchBandedAligner,
    )
    from rust_bio_tpu.alignment.pairwise.scoring import Scoring

    rng = np.random.default_rng(33)
    B, M, N = 256, 1000, 20_000
    sc = Scoring.from_scores(-5, -1, 2, -2)
    xs, ys = [], []
    for _ in range(B):
        y = rng.choice(list(b"ACGT"), size=N).astype(np.uint8).tobytes()
        s = int(rng.integers(0, N - M))
        x = bytearray(y[s : s + M])
        for _ in range(20):  # ~2% divergence
            x[int(rng.integers(0, M))] = int(rng.choice(list(b"ACGT")))
        xs.append(bytes(x))
        ys.append(y)
    bat = BatchBandedAligner(sc, 8, 8)
    bat.semiglobal(xs, ys)  # compile + warm

    def run():
        bat.semiglobal(xs, ys)

    dev_rate = B / _best_of(run, 3)
    cpu_rate = _cpu_banded_baseline_rate(B=32, M=M, N=N, iters=2)
    return dev_rate, cpu_rate


def _hmm_rates():
    """Batched Viterbi on the occasionally-dishonest-casino model
    (hmm/mod.rs doc example): B=8192 sequences x T=1000 observations,
    2 states, vs the -O3 C++ twin of the reference's viterbi_matrices +
    traceback loop.  Returns (device seqs/s, twin seqs/s)."""
    import jax.numpy as jnp

    from rust_bio_tpu.stats.hmm.device import BatchDiscreteHMM

    B, T = 8192, 1000
    A = np.log([[0.95, 0.05], [0.1, 0.9]])
    Bm = np.log(
        [[1 / 6.0] * 6, [0.1, 0.1, 0.1, 0.1, 0.1, 0.5]]
    )
    pi = np.log([0.5, 0.5])
    hmm = BatchDiscreteHMM(A, Bm, pi)
    rng = np.random.default_rng(53)
    obs = rng.integers(0, 6, size=(B, T)).astype(np.int32)
    obs_d = jnp.asarray(obs)
    lens_d = jnp.asarray(np.full(B, T, np.int32))
    K = 8

    def run():
        s = None
        for _ in range(K):
            path, prob = hmm._viterbi(obs_d, lens_d)
            s = prob if s is None else s + prob
        _ = float(np.asarray(s).sum())

    run()
    rate = K * B / _best_of(run, 3)

    exe = _build_twin("cpu_hmm")
    out = subprocess.run(
        [exe, "2048", str(T), "2", "1"],
        check=True, capture_output=True, text=True,
    )
    cpu = float(out.stdout.strip().splitlines()[-1])
    return rate, cpu


def _cigar_modes_rates():
    """Delivered-CIGAR throughput beyond the worst-case global row:
    semiglobal and local at the same 150 bp random-pair geometry, plus a
    realistic-identity global corpus (2% divergence — mapper-shaped
    data, where the column-RLE merge has few runs per pair).  An
    Alignment's operations only exist once materialized
    (pairwise/mod.rs:845-921) — these rows pay the full pull + decode.
    Returns (semiglobal/s, local/s, hi_identity_global/s)."""
    from rust_bio_tpu.alignment.pairwise.batched import BatchAligner
    from rust_bio_tpu.alignment.pairwise.scoring import Scoring

    B, M, N = 8192, 150, 150
    rng = np.random.default_rng(7)
    xb = rng.integers(0, 4, size=(B, M)).astype(np.uint8) + ord("A")
    yb = rng.integers(0, 4, size=(B, N)).astype(np.uint8) + ord("A")
    mlens = np.full(B, M, np.int32)
    nlens = np.full(B, N, np.int32)
    ba = BatchAligner(Scoring.from_scores(-5, -1, 2, -2))
    K = 8

    # --- semiglobal delivered (packed pull + vectorized merge) ---
    p = BatchAligner.semiglobal_packed_finish(
        ba.semiglobal_packed_async_arrays(xb, yb, mlens, nlens)
    )
    assert len(p.cigars()) == B

    def run_sg():
        handles = [
            ba.semiglobal_packed_async_arrays(xb, yb, mlens, nlens)
            for _ in range(K)
        ]
        for h in handles:
            BatchAligner.semiglobal_packed_finish(h).cigars()

    run_sg()
    sg_rate = K * B / _best_of(run_sg, 3)

    # --- local delivered (full Alignment materialization — the local
    # result needs (xstart, ystart) clips resolved per lane) ---
    xs = [bytes(xb[i]) for i in range(B)]
    ys = [bytes(yb[i]) for i in range(B)]
    out = ba.local(xs, ys)
    assert len(out) == B

    def run_local():
        ba.local(xs, ys)

    local_rate = B / _best_of(run_local, 3)

    # --- realistic identity: y = x with 2% substitutions (global) ---
    yb_hi = xb.copy()
    mut = rng.random(size=(B, N)) < 0.02
    yb_hi[mut] = rng.integers(0, 4, size=int(mut.sum())).astype(
        np.uint8
    ) + ord("A")
    # compact path: the column-RLE stream merges ON DEVICE to <= 32 runs
    # per lane, so the transfer-bound pull shrinks ~4x (overflow lanes,
    # if any, re-run dense — parity-tested in test_sw_pallas.py)
    p = BatchAligner.packed_compact_finish(
        ba.global_packed_compact_async_arrays(xb, yb_hi, mlens, nlens)
    )
    cigs = p.cigars()
    assert len(cigs) == B and all(cigs)
    assert not p.overflow.any(), "hi-id corpus should fit the run budget"

    # K compact dispatches chained (fresh per-dispatch input uploads —
    # measured: pre-committed device buffers serialize dispatches through
    # the axon tunnel, 43 K/s vs 111 K/s; fresh jnp.asarray uploads
    # pipeline with compute), ONE stacked (K, 5+R, B) pull, host format
    def run_hi():
        handles = [
            ba.global_packed_compact_async_arrays(xb, yb_hi, mlens, nlens)
            for _ in range(K)
        ]
        for r in BatchAligner.packed_compact_finish_many(handles):
            r.cigars()

    run_hi()
    hi_rate = K * B / _best_of(run_hi, 3)
    return sg_rate, local_rate, hi_rate


def main() -> None:
    import jax

    # persistent compile cache: protects repeated bench runs from the slow
    # (remote) TPU compile path
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from rust_bio_tpu.alignment.pairwise.batched import (
        _align_batch_device_global_mp,
        _align_batch_device_custom_mp,
        _align_batch_device_semiglobal_mp,
    )
    from rust_bio_tpu.alignment.pairwise.scoring import MIN_SCORE

    # all metrics pre-registered (null until their row fills them): a
    # skipped/failed/stalled row can never keep the line from printing
    for k in (
        "score_only_alignments_per_s",
        "sw_cigar_delivered_per_s",
        "sw_cigar_delivered_semiglobal_per_s",
        "sw_cigar_delivered_local_per_s",
        "sw_cigar_delivered_hi_id_per_s",
        "local_alignments_per_s",
        "custom_alignments_per_s",
        "fm_index_queries_per_s",
        "fm_vs_baseline",
        "fm_vs_baseline_4core",
        "fm_50mbp_queries_per_s",
        "fm_large_vs_baseline",
        "fm_50mbp_nolut_queries_per_s",
        "semiglobal_alignments_per_s",
        "pairhmm_pairs_per_s",
        "pairhmm_exact_pairs_per_s",
        "pairhmm_exact_banded_pairs_per_s",
        "pairhmm_exact_vs_baseline",
        "homopoly_pairs_per_s",
        "homopoly_vs_baseline",
        "hmm_viterbi_seqs_per_s",
        "hmm_viterbi_vs_baseline",
        "poa_batch_scores_per_s",
        "poa_vs_host",
        "poa_vs_baseline",
        "poa_alignments_delivered_per_s",
        "sw_5kb_alignments_per_s",
        "sw_5kb_vs_baseline",
        "smem_mapper_reads_per_s",
        "smem_mapper_streamed_reads_per_s",
        "smem_mapper_50mbp_reads_per_s",
        "smem_mapper_300mbp_reads_per_s",
        "smem_mapper_repeats_reads_per_s",
        "smem_mapper_repeats_unique_mapped_frac",
        "smem_mapper_repeats_50mbp_reads_per_s",
        "fm_1gbp_queries_per_s",
        "fm_1gbp_vs_baseline",
        "fm_1gbp_nolut_queries_per_s",
        "fm_2gbp_queries_per_s",
        "fm_2gbp_vs_baseline",
        "fm_2gbp_vs_baseline_4core",
        "fm_3gbp_queries_per_s",
        "fm_3gbp_vs_baseline",
        "fm_3gbp_vs_baseline_4core",
        "fixed_window_mapper_reads_per_s",
        "banded_long_pairs_per_s",
        "banded_long_sync_pairs_per_s",
        "banded_long_vs_baseline",
        "banded_long_vs_baseline_4core",
        "banded_long_vs_full_matrix",
        "banded_1kb_pairs_per_s",
        "banded_1kb_vs_baseline",
    ):
        RESULTS.setdefault(k, None)

    # watchdog + signal handlers: the JSON line survives a driver TERM,
    # an internal alarm, or any single hung device pull
    signal.signal(signal.SIGTERM, _sig_handler)
    signal.signal(signal.SIGALRM, _sig_handler)
    signal.alarm(int(_BUDGET) + 120)
    wd = threading.Timer(_BUDGET + 90.0, _watchdog)
    wd.daemon = True
    wd.start()

    B, M, N = 8192, 150, 150
    rng = np.random.default_rng(7)
    xb = jnp.asarray(rng.integers(0, 4, size=(B, M)).astype(np.uint8) + ord("A"))
    yb = jnp.asarray(rng.integers(0, 4, size=(B, N)).astype(np.uint8) + ord("A"))
    mlens = jnp.full((B,), M, dtype=jnp.int32)
    nlens = jnp.full((B,), N, dtype=jnp.int32)
    pen8 = jnp.asarray(
        np.array(
            [-5, -1, MIN_SCORE, MIN_SCORE, MIN_SCORE, MIN_SCORE, 2, -2],
            np.int32,
        )
    )
    K = 64

    def headline():
        # full-traceback global alignment on the transposed Pallas engine
        # (the same path BatchAligner.global_ dispatches to), K batches
        # chained per sync; np.asarray forces a full device->host sync
        # (block_until_ready is not reliable through the axon tunnel)
        def run():
            s = None
            for _ in range(K):
                out = _align_batch_device_global_mp(xb, yb, mlens, nlens, pen8)
                s = out["score"] if s is None else s + out["score"]
            return int(np.asarray(s).sum())

        run()  # compile + warmup
        rate = K * B / _best_of(run, 5)
        RESULTS["value"] = round(rate, 2)
        cpu_rate = _cpu_baseline_rate(M=M, N=N)
        RESULTS["vs_baseline"] = round(rate / cpu_rate, 3)

    def score_only():
        def run():
            s = None
            for _ in range(K):
                out = _align_batch_device_global_mp(
                    xb, yb, mlens, nlens, pen8, with_traceback=False
                )
                s = out["score"] if s is None else s + out["score"]
            return int(np.asarray(s).sum())

        run()
        RESULTS["score_only_alignments_per_s"] = round(K * B / _best_of(run), 2)

    def semiglobal():
        pen8_sg = jnp.asarray(
            np.array([-5, -1, MIN_SCORE, MIN_SCORE, 0, 0, 2, -2], np.int32)
        )

        def run():
            s = None
            for _ in range(K):
                out = _align_batch_device_semiglobal_mp(
                    xb, yb, mlens, nlens, pen8_sg
                )
                s = out["score"] if s is None else s + out["score"]
            np.asarray(s)

        run()
        RESULTS["semiglobal_alignments_per_s"] = round(
            K * B / _best_of(run), 2
        )

    def local_mode():
        pen8_l = jnp.asarray(np.array([-5, -1, 0, 0, 0, 0, 2, -2], np.int32))

        def run():
            s = None
            for _ in range(K):
                out = _align_batch_device_custom_mp(
                    xb, yb, mlens, nlens, pen8_l, local_engine=True,
                    local_walk=True,
                )
                s = out["score"] if s is None else s + out["score"]
            return int(np.asarray(s).sum())

        run()
        RESULTS["local_alignments_per_s"] = round(K * B / _best_of(run), 2)

    def custom_mode():
        # arbitrary clip penalties (the reference's custom() mode,
        # mod.rs:591): finite nonzero clips keep ALL clip machinery live
        pen8_c = jnp.asarray(
            np.array([-5, -1, -7, -3, -11, -4, 2, -2], np.int32)
        )

        def run():
            s = None
            for _ in range(K):
                out = _align_batch_device_custom_mp(
                    xb, yb, mlens, nlens, pen8_c, local_engine=False
                )
                s = out["score"] if s is None else s + out["score"]
            return int(np.asarray(s).sum())

        run()
        RESULTS["custom_alignments_per_s"] = round(K * B / _best_of(run), 2)

    def cigar_global():
        RESULTS["sw_cigar_delivered_per_s"] = round(
            _sw_cigar_delivered_per_s(), 2
        )

    def cigar_modes():
        sg, loc, hi = _cigar_modes_rates()
        RESULTS["sw_cigar_delivered_semiglobal_per_s"] = round(sg, 2)
        RESULTS["sw_cigar_delivered_local_per_s"] = round(loc, 2)
        RESULTS["sw_cigar_delivered_hi_id_per_s"] = round(hi, 2)

    def fm_small():
        fm_rate = _fm_queries_per_s()
        RESULTS["fm_index_queries_per_s"] = round(fm_rate, 2)
        fm_cpu = _cpu_fm_baseline_rate(iters=2)
        RESULTS["fm_vs_baseline"] = round(fm_rate / fm_cpu, 3)
        fm_cpu4 = _cpu_fm_baseline_rate(iters=2, threads=4)
        RESULTS["fm_vs_baseline_4core"] = round(fm_rate / fm_cpu4, 3)

    def pairhmm_f32():
        RESULTS["pairhmm_pairs_per_s"] = round(_pairhmm_pairs_per_s(), 2)

    def pairhmm_exact():
        unb, band, cpu = _pairhmm_exact_rates()
        RESULTS["pairhmm_exact_pairs_per_s"] = round(unb, 2)
        RESULTS["pairhmm_exact_banded_pairs_per_s"] = round(band, 2)
        RESULTS["pairhmm_exact_vs_baseline"] = round(band / cpu, 3)

    def homopoly():
        rate, cpu = _homopoly_pairs_per_s()
        RESULTS["homopoly_pairs_per_s"] = round(rate, 2)
        RESULTS["homopoly_vs_baseline"] = round(rate / cpu, 2)

    def hmm_row():
        rate, cpu = _hmm_rates()
        RESULTS["hmm_viterbi_seqs_per_s"] = round(rate, 2)
        RESULTS["hmm_viterbi_vs_baseline"] = round(rate / cpu, 2)

    def poa():
        rate, host, twin, delivered = _poa_rates()
        RESULTS["poa_batch_scores_per_s"] = round(rate, 2)
        RESULTS["poa_vs_host"] = round(rate / host, 1)
        RESULTS["poa_vs_baseline"] = round(rate / twin, 2)
        RESULTS["poa_alignments_delivered_per_s"] = round(delivered, 2)

    def sw5kb():
        dev, cpu = _sw_5kb_rates()
        RESULTS["sw_5kb_alignments_per_s"] = round(dev, 2)
        RESULTS["sw_5kb_vs_baseline"] = round(dev / cpu, 3)

    def banded_long():
        pipe, sync, cpu, full = _banded_long_rates()
        RESULTS["banded_long_pairs_per_s"] = round(pipe, 2)
        RESULTS["banded_long_sync_pairs_per_s"] = round(sync, 2)
        RESULTS["banded_long_vs_baseline"] = round(pipe / cpu, 2)
        RESULTS["banded_long_vs_full_matrix"] = round(pipe / full, 2)
        cpu4 = _cpu_banded_baseline_rate(threads=4)
        RESULTS["banded_long_vs_baseline_4core"] = round(pipe / cpu4, 2)

    def banded_1kb():
        dev, cpu = _banded_1kb_rates()
        RESULTS["banded_1kb_pairs_per_s"] = round(dev, 2)
        RESULTS["banded_1kb_vs_baseline"] = round(dev / cpu, 2)

    def smem_1mbp():
        b, s = _smem_reads_per_s()
        RESULTS["smem_mapper_reads_per_s"] = round(b, 2)
        RESULTS["smem_mapper_streamed_reads_per_s"] = round(s, 2)

    def fixed_window():
        RESULTS["fixed_window_mapper_reads_per_s"] = round(
            _fixed_window_mapper_reads_per_s(), 2
        )

    def smem_repeats():
        r1, frac, r50 = _smem_repeats_rates()
        RESULTS["smem_mapper_repeats_reads_per_s"] = round(r1, 2)
        RESULTS["smem_mapper_repeats_unique_mapped_frac"] = round(frac, 4)
        RESULTS["smem_mapper_repeats_50mbp_reads_per_s"] = round(r50, 2)

    def smem_50mbp():
        RESULTS["smem_mapper_50mbp_reads_per_s"] = round(
            _smem_50mbp_reads_per_s(), 2
        )

    def smem_300mbp():
        RESULTS["smem_mapper_300mbp_reads_per_s"] = round(
            _smem_300mbp_reads_per_s(), 2
        )

    def fm_50mbp():
        lut, plain, cpu = _fm_big_rates(50_000_000, 19, "50mbp")
        RESULTS["fm_50mbp_queries_per_s"] = round(lut, 2)
        RESULTS["fm_large_vs_baseline"] = round(lut / cpu, 3)
        RESULTS["fm_50mbp_nolut_queries_per_s"] = round(plain, 2)

    def fm_1gbp():
        lut, plain, cpu = _fm_1gbp_rates()
        RESULTS["fm_1gbp_queries_per_s"] = round(lut, 2)
        RESULTS["fm_1gbp_vs_baseline"] = round(lut / cpu, 3)
        RESULTS["fm_1gbp_nolut_queries_per_s"] = round(plain, 2)

    def fm_2gbp():
        lut, _plain, cpu, cpu4 = _fm_2gbp_rates()
        RESULTS["fm_2gbp_queries_per_s"] = round(lut, 2)
        RESULTS["fm_2gbp_vs_baseline"] = round(lut / cpu, 3)
        RESULTS["fm_2gbp_vs_baseline_4core"] = round(lut / cpu4, 3)

    def fm_3gbp():
        lut, _plain, cpu, cpu4 = _fm_3gbp_rates()
        RESULTS["fm_3gbp_queries_per_s"] = round(lut, 2)
        RESULTS["fm_3gbp_vs_baseline"] = round(lut / cpu, 3)
        RESULTS["fm_3gbp_vs_baseline_4core"] = round(lut / cpu4, 3)

    # headline-first ordering (VERDICT r4 #1): the metrics the round is
    # graded on land before anything that can be slow; mapper rows run
    # before any _free_device/clear_caches (retracing the mapper kernels
    # costs ~10+ min of host CPU); Gbp FM rows last.  Estimates are the
    # wall-clock reserve a row needs — rows that would blow the budget
    # are skipped to null, never started.
    # reserves = measured warm-run row times (round-5 calibration runs)
    # plus headroom for remote-compile noise; a row that can no longer
    # fit is skipped to null rather than started
    rows = [
        ("sw_headline", 0, headline),
        ("score_only", 10, score_only),
        ("semiglobal", 10, semiglobal),
        ("local", 12, local_mode),
        ("custom", 12, custom_mode),
        ("cigar_global", 15, cigar_global),
        ("cigar_modes", 30, cigar_modes),
        ("fm_small", 20, fm_small),
        ("pairhmm_f32", 8, pairhmm_f32),
        ("pairhmm_exact", 25, pairhmm_exact),
        ("homopoly", 30, homopoly),
        ("hmm", 10, hmm_row),
        ("poa", 10, poa),
        ("sw_5kb", 10, sw5kb),
        ("banded_long", 55, banded_long),
        ("banded_1kb", 5, banded_1kb),
        ("smem_1mbp", 50, smem_1mbp),
        ("fixed_window", 25, fixed_window),
        ("smem_repeats", 150, smem_repeats),
        ("smem_50mbp", 100, smem_50mbp),
        ("smem_300mbp", 250, smem_300mbp),
        ("fm_50mbp", 15, fm_50mbp),
        ("fm_1gbp", 160, fm_1gbp),
        ("fm_2gbp", 260, fm_2gbp),
        ("fm_3gbp", 430, fm_3gbp),
    ]
    try:
        for name, est, fn in rows:
            _row(name, est, fn)
    finally:
        _emit()


if __name__ == "__main__":
    main()
