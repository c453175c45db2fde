import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import bench
from rust_bio_tpu.pipelines.read_mapper import SmemReadMapper
import os

G = 300_000_000
cache = os.path.join(bench._CACHE_DIR, "smem_300mbp_v1.npz")
genome = bench._dna_text(G, 29)
t0 = time.time()
mapper = SmemReadMapper(genome, min_seed_len=19, index_cache=cache)
print(f"load: {time.time()-t0:.0f}s", flush=True)
rng = np.random.default_rng(31)
B, L = 1024, 100
starts = rng.integers(0, G - L, size=B)
reads = []
for s in starts:
    r = bytearray(genome[s : s + L])
    for _ in range(2):
        r[int(rng.integers(0, L))] = int(rng.choice(list(b"ACGT")))
    reads.append(bytes(r))

# instrument: ovf lanes + host oracle hits
packed = np.asarray(mapper._smem_dispatch(reads)[0])
print("ovf lanes:", int(packed[:, 4].sum()), "not found:", int((packed[:, 3] == 0).sum()), flush=True)

orig = type(mapper).host_fmd.fget
calls = [0]
import rust_bio_tpu.pipelines.read_mapper as rm
# count host-oracle usage via _host_fmd access after map
t0 = time.time()
out = mapper.map_batch(reads)
print(f"map_batch: {time.time()-t0:.2f}s, host_fmd built: {mapper._host_fmd is not None}", flush=True)
t0 = time.time()
out = mapper.map_batch(reads)
print(f"map_batch warm: {time.time()-t0:.2f}s", flush=True)
