"""Validate the three new round-3 bench rows on the real TPU:
pairhmm_exact, homopoly device, POA batch scorer."""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def best_of(f, n=3):
    dt = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        dt = min(dt, time.perf_counter() - t0)
    return dt


PROB_INS, PROB_DEL, PROB_SUBST = 2.8e-6, 5.1e-6, 0.0021


def _bench_geometry(B, M=207, N=54, seed=13):
    rng = np.random.default_rng(seed)
    xs = rng.integers(0, 4, size=(B, M)).astype(np.uint8) + ord("A")
    ys = np.zeros((B, N), np.uint8)
    for i in range(B):
        s = int(rng.integers(0, M - N))
        ys[i] = xs[i, s : s + N]
        for _ in range(2):
            ys[i, int(rng.integers(0, N))] = ord("A") + int(rng.integers(0, 4))
    return xs, ys


def pairhmm_exact():
    from rust_bio_tpu.stats.pairhmm.exact import BatchPairHMMExact

    B, M, N = 1024, 207, 54
    xs, ys = _bench_geometry(B)
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
        rate = K * B / best_of(run)
    print(f"pairhmm_exact_pairs_per_s: {rate:.1f}", flush=True)


def homopoly():
    from rust_bio_tpu.stats.pairhmm.homopoly_device import BatchHomopolyPairHMM

    B, M, N = 2048, 207, 54
    xs, ys = _bench_geometry(B, seed=15)
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
    rate = K * B / best_of(run)
    print(f"homopoly_pairs_per_s: {rate:.1f}", flush=True)


def poa():
    from rust_bio_tpu.alignment.poa import Aligner
    from rust_bio_tpu.alignment.poa_batch import BatchPoa, _poa_scores_kernel
    from rust_bio_tpu.alignment.pairwise.scoring import Scoring

    rng = np.random.default_rng(41)
    sc = Scoring.from_scores(-4, -4, 3, -2)
    L = 200
    backbone = rng.choice(list(b"ACGT"), size=L).astype(np.uint8)
    al = Aligner(sc, backbone.tobytes())
    for _ in range(7):  # N reads threaded through -> branched consensus graph
        r = backbone.copy()
        idx = rng.random(L) < 0.04
        r[idx] = rng.choice(list(b"ACGT"), size=int(idx.sum()))
        al.global_(r.tobytes()).add_to_graph()
    cons = al.consensus()
    print(f"graph nodes: {al.poa.graph.node_count()}, consensus len {len(cons)}")
    bp = BatchPoa(sc, al)

    B = 512
    queries = []
    for _ in range(B):
        r = backbone.copy()
        idx = rng.random(L) < 0.04
        r[idx] = rng.choice(list(b"ACGT"), size=int(idx.sum()))
        queries.append(r.tobytes())
    got = bp.global_scores(queries)

    qb = np.zeros((B, L), np.uint8)
    for k, q in enumerate(queries):
        qb[k] = np.frombuffer(q, np.uint8)
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
    rate = K * B / best_of(run)

    # host twin: score a few queries, extrapolate
    t0 = time.perf_counter()
    nh = 3
    for q in queries[:nh]:
        al.global_(q)
    host_rate = nh / (time.perf_counter() - t0)
    print(
        f"poa_scores_per_s: {rate:.1f}  host: {host_rate:.2f}  "
        f"ratio: {rate/host_rate:.1f}",
        flush=True,
    )
    # sanity: device == host on first 3
    for k in range(3):
        want = al.global_(queries[k]).alignment().score
        assert int(got[k]) == want, (k, got[k], want)
    print("poa device==host on 3 spot checks", flush=True)


if __name__ == "__main__":
    poa()
    homopoly()
    pairhmm_exact()
