"""Round-3 profiling: stage timings for the 5 kb block-row path and the
local/custom path on the real TPU. Each timing chains K async dispatches
per sync (tunnel latency ~26 ms flat per round trip)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rust_bio_tpu.alignment.pairwise.scoring import MIN_SCORE


def best_of(f, n=3):
    dt = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        dt = min(dt, time.perf_counter() - t0)
    return dt


def make_5kb(B, M, seed=17):
    rng = np.random.default_rng(seed)
    xb = rng.integers(0, 4, size=(B, M)).astype(np.uint8)
    for i in range(B):
        motif = rng.integers(0, 4, size=4).astype(np.uint8)
        for _ in range(6):
            s = int(rng.integers(0, M - 200))
            xb[i, s : s + 200] = np.tile(motif, 50)
    yb = xb.copy()
    idx = rng.random(size=(B, M)) < 0.05
    yb[idx] = rng.integers(0, 4, size=int(idx.sum())).astype(np.uint8)
    return jnp.asarray(xb + ord("A")), jnp.asarray(yb + ord("A"))


def prof_5kb():
    from rust_bio_tpu.ops.sw_pallas import (
        scan_global_rows_pallas_mp,
        _pick_block_rows,
    )
    from rust_bio_tpu.ops.walk_pallas import _sweep_walk_global_seg

    B, M = 8, 5100
    print("pick_block_rows(8,5100,5100):", _pick_block_rows(B, M, M), flush=True)
    xd, yd = make_5kb(B, M)
    lens = jnp.full((B,), M, dtype=jnp.int32)
    pen8 = jnp.asarray(
        np.array([-5, -1, MIN_SCORE, MIN_SCORE, MIN_SCORE, MIN_SCORE, 2, -2], np.int32)
    )

    scan = jax.jit(scan_global_rows_pallas_mp, static_argnames=())

    K = 4

    def run_scan():
        s = None
        for _ in range(K):
            sc, tb, RRB = scan_global_rows_pallas_mp(xd, yd, lens, lens, pen8)
            s = sc if s is None else s + sc
        np.asarray(s)

    run_scan()
    t_scan = best_of(run_scan) / K
    print(f"5kb scan only (incl tb write): {t_scan*1e3:.1f} ms/batch(B=8)", flush=True)

    sc, tb, RRB = scan_global_rows_pallas_mp(xd, yd, lens, lens, pen8)
    tb = jax.block_until_ready(tb)

    walk = jax.jit(_sweep_walk_global_seg)

    def run_walk():
        s = None
        for _ in range(K):
            ins_cnt, exit_op, ins0 = walk(tb, lens, lens)
            s = exit_op if s is None else s + exit_op
        np.asarray(s)

    run_walk()
    t_walk = best_of(run_walk) / K
    print(f"5kb seg walk only: {t_walk*1e3:.1f} ms/batch(B=8)", flush=True)

    # full path for reference
    from rust_bio_tpu.alignment.pairwise.batched import (
        _align_batch_device_global_rows_mp,
    )

    def run_full():
        s = None
        for _ in range(K):
            out = _align_batch_device_global_rows_mp(xd, yd, lens, lens, pen8)
            s = out["score"] if s is None else s + out["score"]
        np.asarray(s)

    run_full()
    t_full = best_of(run_full) / K
    print(f"5kb full path: {t_full*1e3:.1f} ms/batch(B=8) = {8/t_full:.1f} aln/s", flush=True)


def prof_local():
    from rust_bio_tpu.ops.sw_pallas import (
        scan_custom_pallas_mp,
        scan_global_pallas_mp,
        _pick_block_global,
    )

    B, M, N = 8192, 150, 150
    print("custom block:", _pick_block_global(B, M, N, n_state=55), flush=True)
    print("global block:", _pick_block_global(B, M, N, n_state=24), flush=True)
    rng = np.random.default_rng(7)
    xb = jnp.asarray(rng.integers(0, 4, size=(B, M)).astype(np.uint8) + ord("A"))
    yb = jnp.asarray(rng.integers(0, 4, size=(B, N)).astype(np.uint8) + ord("A"))
    mlens = jnp.full((B,), M, dtype=jnp.int32)
    nlens = jnp.full((B,), N, dtype=jnp.int32)
    pen8_l = jnp.asarray(np.array([-5, -1, 0, 0, 0, 0, 2, -2], np.int32))
    pen8_g = jnp.asarray(
        np.array([-5, -1, MIN_SCORE, MIN_SCORE, MIN_SCORE, MIN_SCORE, 2, -2], np.int32)
    )
    K = 32

    scan_c = jax.jit(scan_custom_pallas_mp)
    scan_g = jax.jit(lambda *a: scan_global_pallas_mp(*a, runs=False))

    def run_scan_c():
        s = None
        for _ in range(K):
            out = scan_c(xb, yb, mlens, nlens, pen8_l)
            s = out[2] if s is None else s + out[2]
        np.asarray(s)

    run_scan_c()
    t = best_of(run_scan_c) / K
    print(f"custom scan only: {t*1e3:.2f} ms/batch = {B/t/1e3:.0f}K scans/s", flush=True)

    def run_scan_g():
        s = None
        for _ in range(K):
            out = scan_g(xb, yb, mlens, nlens, pen8_g)
            s = out[0] if s is None else s + out[0]
        np.asarray(s)

    run_scan_g()
    t = best_of(run_scan_g) / K
    print(f"global scan only (runs=False): {t*1e3:.2f} ms/batch = {B/t/1e3:.0f}K scans/s", flush=True)

    # walk + fixup stage cost: full local path minus scan
    from rust_bio_tpu.alignment.pairwise.batched import (
        _align_batch_device_custom_mp,
        _align_batch_device_global_mp,
    )

    def run_full_c():
        s = None
        for _ in range(K):
            out = _align_batch_device_custom_mp(xb, yb, mlens, nlens, pen8_l)
            s = out["score"] if s is None else s + out["score"]
        np.asarray(s)

    run_full_c()
    t = best_of(run_full_c) / K
    print(f"local full path: {t*1e3:.2f} ms/batch = {B/t/1e3:.0f}K aln/s", flush=True)

    def run_full_g():
        s = None
        for _ in range(K):
            out = _align_batch_device_global_mp(xb, yb, mlens, nlens, pen8_g)
            s = out["score"] if s is None else s + out["score"]
        np.asarray(s)

    run_full_g()
    t = best_of(run_full_g) / K
    print(f"global full path: {t*1e3:.2f} ms/batch = {B/t/1e3:.0f}K aln/s", flush=True)


if __name__ == "__main__":
    prof_5kb()
    prof_local()
