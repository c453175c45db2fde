"""TPU smoke + timing for the specialized local kernel."""
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
    _align_batch_device_custom_mp,
    _unpack_rle_custom,
)


def best_of(f, n=5):
    dt = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        dt = min(dt, time.perf_counter() - t0)
    return dt


B, M, N = 8192, 150, 150
rng = np.random.default_rng(7)
xb = jnp.asarray(rng.integers(0, 4, size=(B, M)).astype(np.uint8) + ord("A"))
yb = jnp.asarray(rng.integers(0, 4, size=(B, N)).astype(np.uint8) + ord("A"))
mlens = jnp.full((B,), M, dtype=jnp.int32)
nlens = jnp.full((B,), N, dtype=jnp.int32)
pen8_l = jnp.asarray(np.array([-5, -1, 0, 0, 0, 0, 2, -2], np.int32))

# correctness on-chip: local engine vs general engine, full packed result
out_new = _align_batch_device_custom_mp(xb, yb, mlens, nlens, pen8_l,
                                        local_engine=True)
out_old = _align_batch_device_custom_mp(xb, yb, mlens, nlens, pen8_l)
sn, un = _unpack_rle_custom(np.asarray(out_new["packed_custom"]))
so, uo = _unpack_rle_custom(np.asarray(out_old["packed_custom"]))
assert (sn == so).all(), "score mismatch"
ok = True
for k in un:
    a, b = un[k], uo[k]
    if a.ndim == 2:  # per-column, valid rows 0..N
        a, b = a[: N + 1], b[: N + 1]
    if not (a == b).all():
        ok = False
        print(k, "MISMATCH", (a != b).sum())
assert ok
print("local engine == custom engine on-chip: OK")

K = 32


def run_new():
    s = None
    for _ in range(K):
        o = _align_batch_device_custom_mp(xb, yb, mlens, nlens, pen8_l,
                                          local_engine=True)
        s = o["score"] if s is None else s + o["score"]
    np.asarray(s)


run_new()
t = best_of(run_new) / K
print(f"local (new engine) full path: {t*1e3:.2f} ms/batch = {B/t/1e3:.0f}K aln/s")

from rust_bio_tpu.ops.sw_pallas import scan_local_pallas_mp

scan = jax.jit(scan_local_pallas_mp)


def run_scan():
    s = None
    for _ in range(K):
        o = scan(xb, yb, mlens, nlens, pen8_l)
        s = o[2] if s is None else s + o[2]
    np.asarray(s)


run_scan()
t = best_of(run_scan) / K
print(f"local scan only: {t*1e3:.2f} ms/batch = {B/t/1e3:.0f}K scans/s")
