"""Stage-level profiling of the SMEM mapper bench workload on TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rust_bio_tpu.pipelines.read_mapper import SmemReadMapper

rng = np.random.default_rng(29)
G = 500_000
genome = rng.choice(list(b"ACGT"), size=G).astype(np.uint8).tobytes()
t0 = time.perf_counter()
mapper = SmemReadMapper(genome, min_seed_len=19)
print(f"index build: {time.perf_counter()-t0:.1f} s", flush=True)
B, L = 1024, 100
starts = rng.integers(0, G - L, size=B)
reads = []
for s in starts:
    r = bytearray(genome[s : s + L])
    for _ in range(2):
        r[int(rng.integers(0, L))] = int(rng.choice(list(b"ACGT")))
    reads.append(bytes(r))

out = mapper.map_batch(reads)
ok = sum(1 for m, s in zip(out, starts) if m.pos == s)
print(f"mapped correctly: {ok}/{B}", flush=True)


def best_of(f, n=3):
    dt = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        dt = min(dt, time.perf_counter() - t0)
    return dt


t = best_of(lambda: mapper.map_batch(reads))
print(f"map_batch: {t*1e3:.1f} ms = {B/t:.0f} reads/s", flush=True)

# stage: smems_batch (incl. single pull)
seqs = [bytes(r) for r in reads]
poss = [max(0, len(s) // 2 - 1) for s in seqs]
t = best_of(
    lambda: mapper.fmd.smems_batch(
        seqs, poss, 19, max_slots=16, mapper_mode=True,
        host_oracle_fn=lambda: mapper.host_fmd,
    )
)
print(f"smems_batch(mapper_mode): {t*1e3:.1f} ms", flush=True)
t = best_of(
    lambda: mapper.fmd.smems_batch(
        seqs, poss, 19, max_slots=16,
        host_oracle_fn=lambda: mapper.host_fmd,
    )
)
print(f"smems_batch(full): {t*1e3:.1f} ms", flush=True)

# stage: kernel only (no decode)
pb = np.zeros((B, L), np.uint8)
pl = np.zeros(B, np.int32)
for i, p in enumerate(seqs):
    pb[i, : len(p)] = np.frombuffer(p, np.uint8)
    pl[i] = len(p)
pb_d, pl_d, ii_d = jnp.asarray(pb), jnp.asarray(pl), jnp.asarray(np.asarray(poss, np.int32))


def kernel_only(mm):
    outs = mapper.fmd._smems_kernel(pb_d, pl_d, ii_d, 16, 16, jnp.int32(19), mm)
    np.asarray(outs[0])


t = best_of(lambda: kernel_only(True))
print(f"_smems_kernel(mapper_mode): {t*1e3:.1f} ms", flush=True)
t = best_of(lambda: kernel_only(False))
print(f"_smems_kernel(full): {t*1e3:.1f} ms", flush=True)

# stage: locate
rows = np.asarray(
    [m.alignment is not None for m in out], bool
)
rows_arr = rng.integers(0, mapper.index.n - 1, size=1024).astype(np.int32)
t = best_of(lambda: mapper.index.locate_batch(rows_arr))
print(f"locate_batch(1024): {t*1e3:.1f} ms", flush=True)

# stage: extension (semiglobal 1024x(100,216))
xs = seqs
ys = [genome[max(s - 8, 0) : s + L + 8] for s in starts]
t = best_of(lambda: mapper.aligner.semiglobal(xs, ys))
print(f"extend semiglobal(1024): {t*1e3:.1f} ms", flush=True)
