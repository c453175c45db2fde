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
import subprocess
import sys
import time

import numpy as np


def _cpu_baseline_rate(B=512, M=150, N=150, iters=3) -> float:
    """alignments/s for the C++ scalar reference twin (cached)."""
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "baselines", "cpu_sw.cpp")
    exe = os.path.join(here, "baselines", "cpu_sw")
    if not os.path.exists(exe) or os.path.getmtime(exe) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-o", exe, src], check=True
        )
    out = subprocess.run(
        [exe, str(B), str(M), str(N), str(iters)],
        check=True,
        capture_output=True,
        text=True,
    )
    return float(out.stdout.strip())


def _cpu_fm_baseline_rate(text_len=100_000, B=65536, L=20, occ_k=64, iters=3):
    """queries/s for the C++ FM-index reference twin (bwt.rs hot loop)."""
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "baselines", "cpu_fm.cpp")
    exe = os.path.join(here, "baselines", "cpu_fm")
    if not os.path.exists(exe) or os.path.getmtime(exe) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-o", exe, src], check=True
        )
    out = subprocess.run(
        [exe, str(text_len), str(B), str(L), str(occ_k), str(iters)],
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


def _free_device(*objs):
    """Release big device indexes between rows: several device methods
    jit with static self, so the jit cache holds a STRONG ref to the
    whole index (at 1-2 Gbp that pins GBs of HBM across rows).  Clearing
    jax's caches breaks those refs; later rows recompile from the
    persistent on-disk compile cache."""
    import gc
    import jax

    for o in objs:
        del o
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


def _fm_large_rates():
    """Genome-scale FM search: 50 Mbp text, HBM bit-plane rank (the fused
    in-VMEM kernel and the MXU table both cap out near 8 Mbp, so this is
    the path a human-genome index actually runs) + the q=12 k-mer LUT
    jump.  Returns (lut_rate, plain_rate, cpu_twin_rate)."""
    import jax
    import jax.numpy as jnp

    from rust_bio_tpu.alphabets import dna
    from rust_bio_tpu.data_structures.bwt import bwt
    from rust_bio_tpu.data_structures.fm_device import DeviceFMIndex
    from rust_bio_tpu.data_structures.suffix_array import suffix_array

    G = 50_000_000
    rng = np.random.default_rng(19)
    text = rng.choice(list(b"ACGT"), size=G).astype(np.uint8).tobytes() + b"$"
    sa = suffix_array(text)
    idx = DeviceFMIndex(bwt(text, sa), dna.n_alphabet())
    assert idx._fs_cfg is None and not idx._mxu_swt, (
        "50 Mbp must exercise the HBM gather path"
    )
    idx.build_kmer_lut(q=12)
    B, L = 65536, 20
    pats = np.zeros((B, L), dtype=np.uint8)
    starts = rng.integers(0, G - L - 1, size=B)
    tarr = np.frombuffer(text, dtype=np.uint8)
    for i, s in enumerate(starts):
        pats[i] = tarr[s : s + L]
    plens = np.full(B, L, dtype=np.int32)
    pats_d, plens_d = jnp.asarray(pats), jnp.asarray(plens)

    # parity + no-miss check once (the timed loop chains async dispatches)
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

    cpu_rate = _cpu_fm_baseline_rate(
        text_len=G, B=16384, L=L, occ_k=64, iters=2
    )
    return lut_rate, plain_rate, cpu_rate


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
    mapper = SmemReadMapper(genome, min_seed_len=19)
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
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "baselines", "cpu_pairhmm.cpp")
    exe = os.path.join(here, "baselines", "cpu_pairhmm")
    if not os.path.exists(exe) or os.path.getmtime(exe) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-o", exe, src], check=True
        )
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

    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "baselines", "cpu_homopoly.cpp")
    exe = os.path.join(here, "baselines", "cpu_homopoly")
    if not os.path.exists(exe) or os.path.getmtime(exe) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-o", exe, src], check=True
        )
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
    return rate, host_rate


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


def _fm_big_rates(G: int, seed: int, tag: str):
    """Human-genome-scale FM search: G bp text, HBM bit-plane rank +
    q=12 LUT jump, vs the cpu_fm twin queried on the SAME text (the twin
    gets the cached BWT injected — its own Gbp-scale int64 SA build
    would cost tens of GB and minutes per bench run; build time is
    unmeasured in every FM row).  The index is built once (native SAIS —
    u8/i32 below 2^31 symbols, u8/i64 above, the reference's dtype
    dispatch) and cached under .bench_cache/.
    Returns (lut q/s, plain q/s, twin q/s)."""
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
    text = _dna_text(G, seed) + b"$"
    if os.path.exists(cache):
        # skip the sha256 integrity pass: it reads all N GB twice
        idx = load_fm_index(cache, verify=False)
        assert idx.n == G + 1
    elif G > 1_500_000_000 and not os.environ.get("BENCH_BUILD_BIG"):
        # a 3 Gbp inline build costs hours; it must be prebuilt
        # (scripts/build_3gbp_cache.py sets BENCH_BUILD_BIG) — report the
        # row as absent instead of stalling a driver bench run
        raise RuntimeError(
            f"{tag} cache missing; run scripts/build_3gbp_cache.py first"
        )
    else:
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

    rng = np.random.default_rng(27)
    B, L = 65536, 20
    starts = rng.integers(0, G - L - 1, size=B)
    tarr = np.frombuffer(text, dtype=np.uint8)
    pats = tarr[starts[:, None] + np.arange(L)[None, :]]
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
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "baselines", "cpu_fm.cpp")
    exe = os.path.join(here, "baselines", "cpu_fm")
    if not os.path.exists(exe) or os.path.getmtime(exe) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-o", exe, src], check=True
        )
    bwt_path = os.path.join(_CACHE_DIR, f"fm_{tag}_bwt.bin")
    if not os.path.exists(bwt_path):
        np.asarray(idx.bwt_bytes).tofile(bwt_path)
    Bt = 16384
    pat_path = os.path.join(_CACHE_DIR, f"fm_{tag}_pats.bin")
    pats[:Bt].tofile(pat_path)
    out = subprocess.run(
        [exe, "--bwt", bwt_path, pat_path, str(Bt), str(L), "64", "2"],
        check=True,
        capture_output=True,
        text=True,
    )
    cpu_rate = float(out.stdout.strip().splitlines()[-1])

    _free_device(idx)
    return lut_rate, plain_rate, cpu_rate


def _fm_1gbp_rates():
    return _fm_big_rates(1_000_000_000, 23, "1gbp")


def _fm_2gbp_rates():
    """2 Gbp — the largest text the u8/i32 SAIS path holds (n < 2^31;
    the reference's dtype-dispatch threshold, suffix_array.rs:270-281).
    Build: ~35 min / ~57 GB host RSS, cached.  A full 3.1 Gbp human
    genome needs the u8/i64 build (>2.5 h single-core on this 2.1 GHz
    VM — attempted, timed out; envelope documented in PARITY.md) but
    fits the chip: the 2 Gbp index costs ~6.5 GB HBM, 3 Gbp ~10 GB of
    the 16 GB."""
    return _fm_big_rates(2_000_000_000, 61, "2gbp")


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
    _free_device(mapper)
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
    mapper50 = SmemReadMapper(genome50, min_seed_len=19)
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


def _cpu_banded_baseline_rate(B=64, M=150, N=20_000, iters=2) -> float:
    """pairs/s for the -O3 C++ twin of the reference's banded pipeline
    (kmer hash + sdpkpp + band raster + banded DP + traceback walk,
    banded.rs; score-parity-tested vs the banded.py oracle)."""
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "baselines", "cpu_banded.cpp")
    exe = os.path.join(here, "baselines", "cpu_banded")
    dep = os.path.join(here, "native", "biotpu.cpp")
    if not os.path.exists(exe) or os.path.getmtime(exe) < max(
        os.path.getmtime(src), os.path.getmtime(dep)
    ):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-o", exe, src], check=True
        )
    out = subprocess.run(
        [exe, str(B), str(M), str(N), str(iters)],
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
    )
    from rust_bio_tpu.alignment.pairwise.scoring import MIN_SCORE

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

    def run():
        # full-traceback global alignment on the transposed Pallas engine
        # (the same path BatchAligner.global_ dispatches to), K batches
        # chained per sync
        s = None
        for _ in range(K):
            out = _align_batch_device_global_mp(xb, yb, mlens, nlens, pen8)
            s = out["score"] if s is None else s + out["score"]
        # np.asarray forces a full device->host sync (block_until_ready is
        # not reliable through the axon tunnel)
        return int(np.asarray(s).sum())

    run()  # compile + warmup
    rate = K * B / _best_of(run, 7)

    def _score_only():
        s = None
        for _ in range(K):
            out = _align_batch_device_global_mp(
                xb, yb, mlens, nlens, pen8, with_traceback=False
            )
            s = out["score"] if s is None else s + out["score"]
        return int(np.asarray(s).sum())

    try:
        _score_only()
        so_rate = round(K * B / _best_of(_score_only), 2)
    except Exception as e:
        print(f"score-only bench failed: {e}", file=sys.stderr)
        so_rate = None

    def _local_rate():
        from rust_bio_tpu.alignment.pairwise.batched import (
            _align_batch_device_custom_mp,
        )

        pen8_l = jnp.asarray(
            np.array([-5, -1, 0, 0, 0, 0, 2, -2], np.int32)
        )

        def run_l():
            s = None
            for _ in range(K):
                out = _align_batch_device_custom_mp(
                    xb, yb, mlens, nlens, pen8_l, local_engine=True
                )
                s = out["score"] if s is None else s + out["score"]
            return int(np.asarray(s).sum())

        run_l()
        return K * B / _best_of(run_l)

    try:
        local_rate = round(_local_rate(), 2)
    except Exception as e:
        print(f"local bench failed: {e}", file=sys.stderr)
        local_rate = None

    def _custom_rate():
        # arbitrary clip penalties (the reference's custom() mode,
        # mod.rs:591): finite nonzero clips keep ALL clip machinery live
        # in the general transposed kernel + fullclip sweep walk
        from rust_bio_tpu.alignment.pairwise.batched import (
            _align_batch_device_custom_mp,
        )

        pen8_c = jnp.asarray(
            np.array([-5, -1, -7, -3, -11, -4, 2, -2], np.int32)
        )

        def run_c():
            s = None
            for _ in range(K):
                out = _align_batch_device_custom_mp(
                    xb, yb, mlens, nlens, pen8_c, local_engine=False
                )
                s = out["score"] if s is None else s + out["score"]
            return int(np.asarray(s).sum())

        run_c()
        return K * B / _best_of(run_c)

    try:
        custom_rate = round(_custom_rate(), 2)
    except Exception as e:
        print(f"custom bench failed: {e}", file=sys.stderr)
        custom_rate = None

    try:
        cigar_rate = round(_sw_cigar_delivered_per_s(), 2)
    except Exception as e:
        print(f"cigar delivered bench failed: {e}", file=sys.stderr)
        cigar_rate = None

    try:
        cpu_rate = _cpu_baseline_rate(M=M, N=N)
    except Exception as e:  # baseline must never break the bench line
        print(f"cpu baseline failed: {e}", file=sys.stderr)
        cpu_rate = float("nan")

    try:
        fm_rate = round(_fm_queries_per_s(), 2)
    except Exception as e:
        print(f"fm bench failed: {e}", file=sys.stderr)
        fm_rate = None

    try:
        fm_cpu = _cpu_fm_baseline_rate()
        fm_vs = round(fm_rate / fm_cpu, 3) if fm_rate else None
    except Exception as e:
        print(f"fm cpu baseline failed: {e}", file=sys.stderr)
        fm_vs = None

    def _semiglobal_rate():
        from rust_bio_tpu.alignment.pairwise.batched import (
            _align_batch_device_semiglobal_mp,
        )

        pen8 = jnp.asarray(
            np.array(
                [-5, -1, MIN_SCORE, MIN_SCORE, 0, 0, 2, -2], np.int32
            )
        )
        args = (xb, yb, mlens, nlens, pen8)

        def run_sg():
            s = None
            for _ in range(K):
                out = _align_batch_device_semiglobal_mp(*args)
                s = out["score"] if s is None else s + out["score"]
            np.asarray(s)

        run_sg()
        return K * B / _best_of(run_sg)

    try:
        sg_rate = round(_semiglobal_rate(), 2)
    except Exception as e:
        print(f"semiglobal bench failed: {e}", file=sys.stderr)
        sg_rate = None

    try:
        ph_rate = round(_pairhmm_pairs_per_s(), 2)
    except Exception as e:
        print(f"pairhmm bench failed: {e}", file=sys.stderr)
        ph_rate = None

    try:
        sw5_dev, sw5_cpu = _sw_5kb_rates()
        sw5_rate = round(sw5_dev, 2)
        sw5_vs = round(sw5_dev / sw5_cpu, 3)
    except Exception as e:
        print(f"5kb bench failed: {e}", file=sys.stderr)
        sw5_rate = sw5_vs = None

    try:
        _sb, _ss = _smem_reads_per_s()
        smem_rate = round(_sb, 2)
        smem_stream_rate = round(_ss, 2)
    except Exception as e:
        print(f"smem bench failed: {e}", file=sys.stderr)
        smem_rate = smem_stream_rate = None

    try:
        bl_pipe, bl_sync, bl_cpu, bl_full = _banded_long_rates()
        banded_rate = round(bl_pipe, 2)
        banded_sync = round(bl_sync, 2)
        banded_vs_baseline = round(bl_pipe / bl_cpu, 2)
        banded_vs_full = round(bl_pipe / bl_full, 2)
    except Exception as e:
        print(f"banded bench failed: {e}", file=sys.stderr)
        banded_rate = banded_sync = banded_vs_baseline = banded_vs_full = None

    try:
        b1k_dev, b1k_cpu = _banded_1kb_rates()
        banded_1kb = round(b1k_dev, 2)
        banded_1kb_vs = round(b1k_dev / b1k_cpu, 2)
    except Exception as e:
        print(f"banded 1kb bench failed: {e}", file=sys.stderr)
        banded_1kb = banded_1kb_vs = None

    try:
        phe_unb, phe_band, phe_cpu = _pairhmm_exact_rates()
        ph_exact = round(phe_unb, 2)
        ph_exact_banded = round(phe_band, 2)
        ph_exact_vs = round(phe_band / phe_cpu, 3)
    except Exception as e:
        print(f"pairhmm exact bench failed: {e}", file=sys.stderr)
        ph_exact = ph_exact_banded = ph_exact_vs = None

    try:
        hp_rate, hp_cpu = _homopoly_pairs_per_s()
        hp_rate = round(hp_rate, 2)
        hp_vs = round(hp_rate / hp_cpu, 2)
    except Exception as e:
        print(f"homopoly bench failed: {e}", file=sys.stderr)
        hp_rate = hp_vs = None

    try:
        poa_rate, poa_host = _poa_rates()
        poa_rate = round(poa_rate, 2)
        poa_vs = round(poa_rate / poa_host, 1)
    except Exception as e:
        print(f"poa bench failed: {e}", file=sys.stderr)
        poa_rate = poa_vs = None

    try:
        fml_lut, fml_plain, fml_cpu = _fm_large_rates()
        fm_large = round(fml_lut, 2)
        fm_large_vs = round(fml_lut / fml_cpu, 3)
        fm_large_plain = round(fml_plain, 2)
    except Exception as e:
        print(f"fm large bench failed: {e}", file=sys.stderr)
        fm_large = fm_large_vs = fm_large_plain = None

    try:
        smem50 = round(_smem_50mbp_reads_per_s(), 2)
    except Exception as e:
        print(f"smem 50mbp bench failed: {e}", file=sys.stderr)
        smem50 = None

    try:
        fw_rate = round(_fixed_window_mapper_reads_per_s(), 2)
    except Exception as e:
        print(f"fixed-window mapper bench failed: {e}", file=sys.stderr)
        fw_rate = None

    try:
        rep1, rep_frac, rep50 = _smem_repeats_rates()
        rep1 = round(rep1, 2)
        rep50 = round(rep50, 2)
        rep_frac = round(rep_frac, 4)
    except Exception as e:
        print(f"smem repeats bench failed: {e}", file=sys.stderr)
        rep1 = rep50 = rep_frac = None

    try:
        smem300 = round(_smem_300mbp_reads_per_s(), 2)
    except Exception as e:
        print(f"smem 300mbp bench failed: {e}", file=sys.stderr)
        smem300 = None

    try:
        fm1g_lut, fm1g_plain, fm1g_cpu = _fm_1gbp_rates()
        fm_1gbp = round(fm1g_lut, 2)
        fm_1gbp_vs = round(fm1g_lut / fm1g_cpu, 3)
        fm_1gbp_plain = round(fm1g_plain, 2)
    except Exception as e:
        print(f"fm 1gbp bench failed: {e}", file=sys.stderr)
        fm_1gbp = fm_1gbp_vs = fm_1gbp_plain = None

    try:
        fm2g_lut, _fm2g_plain, fm2g_cpu = _fm_2gbp_rates()
        fm_2gbp = round(fm2g_lut, 2)
        fm_2gbp_vs = round(fm2g_lut / fm2g_cpu, 3)
    except Exception as e:
        print(f"fm 2gbp bench failed: {e}", file=sys.stderr)
        fm_2gbp = fm_2gbp_vs = None

    print(
        json.dumps(
            {
                "metric": "sw_alignments_per_s_per_chip_150bp",
                "value": round(rate, 2),
                "unit": "alignments/s",
                "vs_baseline": round(rate / cpu_rate, 3)
                if cpu_rate == cpu_rate
                else None,
                "score_only_alignments_per_s": so_rate,
                "sw_cigar_delivered_per_s": cigar_rate,
                "local_alignments_per_s": local_rate,
                "custom_alignments_per_s": custom_rate,
                "fm_index_queries_per_s": fm_rate,
                "fm_vs_baseline": fm_vs,
                "fm_50mbp_queries_per_s": fm_large,
                "fm_large_vs_baseline": fm_large_vs,
                "fm_50mbp_nolut_queries_per_s": fm_large_plain,
                "semiglobal_alignments_per_s": sg_rate,
                "pairhmm_pairs_per_s": ph_rate,
                "pairhmm_exact_pairs_per_s": ph_exact,
                "pairhmm_exact_banded_pairs_per_s": ph_exact_banded,
                "pairhmm_exact_vs_baseline": ph_exact_vs,
                "homopoly_pairs_per_s": hp_rate,
                "homopoly_vs_baseline": hp_vs,
                "poa_batch_scores_per_s": poa_rate,
                "poa_vs_host": poa_vs,
                "sw_5kb_alignments_per_s": sw5_rate,
                "sw_5kb_vs_baseline": sw5_vs,
                "smem_mapper_reads_per_s": smem_rate,
                "smem_mapper_streamed_reads_per_s": smem_stream_rate,
                "smem_mapper_50mbp_reads_per_s": smem50,
                "smem_mapper_300mbp_reads_per_s": smem300,
                "smem_mapper_repeats_reads_per_s": rep1,
                "smem_mapper_repeats_unique_mapped_frac": rep_frac,
                "smem_mapper_repeats_50mbp_reads_per_s": rep50,
                "fm_1gbp_queries_per_s": fm_1gbp,
                "fm_1gbp_vs_baseline": fm_1gbp_vs,
                "fm_1gbp_nolut_queries_per_s": fm_1gbp_plain,
                "fm_2gbp_queries_per_s": fm_2gbp,
                "fm_2gbp_vs_baseline": fm_2gbp_vs,
                "fixed_window_mapper_reads_per_s": fw_rate,
                "banded_long_pairs_per_s": banded_rate,
                "banded_long_sync_pairs_per_s": banded_sync,
                "banded_long_vs_baseline": banded_vs_baseline,
                "banded_long_vs_full_matrix": banded_vs_full,
                "banded_1kb_pairs_per_s": banded_1kb,
                "banded_1kb_vs_baseline": banded_1kb_vs,
            }
        )
    )


if __name__ == "__main__":
    main()
