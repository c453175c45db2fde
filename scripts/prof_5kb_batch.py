"""5kb block-row engine throughput vs batch size (lane utilization)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rust_bio_tpu.alignment.pairwise.batched import (
    _align_batch_device_global_rows_mp,
)
from rust_bio_tpu.alignment.pairwise.scoring import MIN_SCORE


def best_of(f, n=3):
    dt = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        dt = min(dt, time.perf_counter() - t0)
    return dt


def make(B, M, seed=17):
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


M = 5100
pen8 = jnp.asarray(
    np.array([-5, -1, MIN_SCORE, MIN_SCORE, MIN_SCORE, MIN_SCORE, 2, -2], np.int32)
)

for B, K in ((32, 4), (64, 2), (128, 1)):
    xd, yd = make(B, M)
    lens = jnp.full((B,), M, dtype=jnp.int32)

    def run():
        s = None
        for _ in range(K):
            out = _align_batch_device_global_rows_mp(xd, yd, lens, lens, pen8)
            s = out["score"] if s is None else s + out["score"]
        np.asarray(s)

    try:
        run()
        t = best_of(run)
        print(f"B={B} K={K}: {t*1e3:.1f} ms total = {K*B/t:.1f} aln/s", flush=True)
    except Exception as e:
        print(f"B={B} K={K}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
    del xd, yd
