"""SMEM mapper: B=8192 and stream-of-4096 probes."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from rust_bio_tpu.pipelines.read_mapper import SmemReadMapper

rng = np.random.default_rng(29)
G = 500_000
genome = rng.choice(list(b"ACGT"), size=G).astype(np.uint8).tobytes()
mapper = SmemReadMapper(genome, min_seed_len=19)
L = 100

def mk(B):
    starts = rng.integers(0, G - L, size=B)
    reads = []
    for s in starts:
        r = bytearray(genome[s:s+L])
        for _ in range(2):
            r[int(rng.integers(0, L))] = int(rng.choice(list(b"ACGT")))
        reads.append(bytes(r))
    return reads, starts

for B in (4096, 8192):
    reads, starts = mk(B)
    out = mapper.map_batch(reads)
    ok = sum(1 for m, s in zip(out, starts) if m.pos == s)
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); mapper.map_batch(reads)
        dt = min(dt, time.perf_counter() - t0)
    print(f"B={B}: {dt*1e3:.0f} ms = {B/dt:.0f} reads/s ({ok}/{B})", flush=True)

# stream of 8 x 4096
batches = [mk(4096)[0] for _ in range(8)]
list(mapper.map_stream(batches[:2]))
t0 = time.perf_counter()
outs = list(mapper.map_stream(batches))
dt = time.perf_counter() - t0
print(f"stream 8x4096: {dt*1e3:.0f} ms = {8*4096/dt:.0f} reads/s", flush=True)
