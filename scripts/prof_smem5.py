"""Stage split of map_batch at the bench geometry (1 Mbp, B=8192)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from rust_bio_tpu.pipelines.read_mapper import SmemReadMapper
from rust_bio_tpu.alphabets import dna

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
seqs = reads
mapper.map_batch(reads)

def best_of(f, n=3):
    dt = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        dt = min(dt, time.perf_counter() - t0)
    return dt

t = best_of(lambda: mapper._smem_dispatch(seqs))
print(f"seed dispatch (host pack only): {t*1e3:.0f} ms", flush=True)
t = best_of(lambda: np.asarray(mapper._smem_dispatch(seqs)))
print(f"seed dispatch+pull: {t*1e3:.0f} ms", flush=True)

h = mapper._smem_dispatch(seqs)
packed = np.asarray(h)
n_found = int(packed[:, 3].sum())
n_ovf = int(packed[:, 4].sum())
print(f"found {n_found}/{B}, ovf {n_ovf}, retries {B-n_found-n_ovf}", flush=True)

rcs = [dna.revcomp(s) for s in seqs]
ids = [str(i) for i in range(B)]

# extension dispatch alone (host pack + async dispatch)
pos_a, q0_a, ml_a, found_a, ovf_a = packed.T
main_picks = {}
for i in np.nonzero(found_a)[0]:
    i = int(i)
    if seqs[i]:
        main_picks[i] = mapper._pick_window(
            len(seqs[i]), int(pos_a[i]), int(q0_a[i]), int(ml_a[i])
        )
t = best_of(lambda: mapper._extend_dispatch(seqs, rcs, main_picks))
print(f"extend dispatch (host pack + async): {t*1e3:.0f} ms", flush=True)

def ext_full():
    out = [None] * B
    metas, handle, fb = mapper._extend_dispatch(seqs, rcs, main_picks)
    mapper._extend_finish(out, ids, metas, handle, fb)
t = best_of(ext_full)
print(f"extend dispatch+finish: {t*1e3:.0f} ms", flush=True)

t = best_of(lambda: mapper._smem_finish(seqs, rcs, ids, mapper._smem_dispatch(seqs)))
print(f"dispatch+finish total: {t*1e3:.0f} ms", flush=True)

t = best_of(lambda: [dna.revcomp(s) for s in seqs])
print(f"revcomp host: {t*1e3:.0f} ms", flush=True)
