"""Real-TPU smoke + timing of the restructured SMEM mapper (async
extension overlap + doubled-budget ovf retry): 1 Mbp map_batch at B=8192
(the bench row geometry) with correctness assertions."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from rust_bio_tpu.pipelines.read_mapper import SmemReadMapper

rng = np.random.default_rng(29)
G = 1_000_000
genome = rng.choice(list(b"ACGT"), size=G).astype(np.uint8).tobytes()
mapper = SmemReadMapper(genome, min_seed_len=19)
B, L = 8192, 100
starts = rng.integers(0, G - L, size=B)
reads = []
for s in starts:
    r = bytearray(genome[s : s + L])
    for _ in range(2):
        r[int(rng.integers(0, L))] = int(rng.choice(list(b"ACGT")))
    reads.append(bytes(r))
out = mapper.map_batch(reads)
ok = sum(1 for m, s in zip(out, starts) if m.pos == s)
print(f"mapped ok: {ok}/{B}", flush=True)
assert ok >= B * 9 // 10

best = float("inf")
for _ in range(4):
    t0 = time.perf_counter()
    mapper.map_batch(reads)
    best = min(best, time.perf_counter() - t0)
print(f"map_batch: {best*1e3:.0f} ms -> {B/best:.0f} reads/s", flush=True)
