"""Stage split of map_batch at B=4096 (seed kernel / finish / extend /
decode / assembly)."""
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
B, L = 4096, 100
starts = rng.integers(0, G - L, size=B)
reads = []
for s in starts:
    r = bytearray(genome[s : s + L])
    for _ in range(2):
        r[int(rng.integers(0, L))] = int(rng.choice(list(b"ACGT")))
    reads.append(bytes(r))
seqs = [bytes(r) for r in reads]
mapper.map_batch(reads)


def best_of(f, n=3):
    dt = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        dt = min(dt, time.perf_counter() - t0)
    return dt


def seed_only():
    h = mapper._smem_dispatch(seqs)
    np.asarray(h)


t = best_of(seed_only)
print(f"seed kernel (smems+pick+locate, 1 pull): {t*1e3:.0f} ms", flush=True)

# count retries
h = mapper._smem_dispatch(seqs)
packed = np.asarray(h)
n_found = int(packed[:, 3].sum())
n_ovf = int(packed[:, 4].sum())
print(f"found {n_found}/{B}, ovf {n_ovf} -> retries for {B-n_found-n_ovf}",
      flush=True)

from rust_bio_tpu.alphabets import dna
rcs = [dna.revcomp(s) for s in seqs]
ids = [str(i) for i in range(B)]

t = best_of(lambda: mapper._smem_finish(seqs, rcs, ids, mapper._smem_dispatch(seqs)))
print(f"dispatch+finish total: {t*1e3:.0f} ms", flush=True)

# picks capture for extend-only timing
import types
picks_box = {}
orig_extend = mapper._extend
def capture(seqs_, rcs_, ids_, picks):
    picks_box["p"] = picks
    return orig_extend(seqs_, rcs_, ids_, picks)
mapper._extend = capture
mapper._smem_finish(seqs, rcs, ids, mapper._smem_dispatch(seqs))
mapper._extend = orig_extend
picks = picks_box["p"]

t = best_of(lambda: mapper._extend(seqs, rcs, ids, picks))
print(f"extend total: {t*1e3:.0f} ms", flush=True)

# inside extend: aligner.semiglobal split
xs, ys = [], []
for i, (strand, w0, w1) in sorted(picks.items()):
    o = seqs[i] if strand == "+" else rcs[i]
    xs.append(o)
    ys.append(mapper.genome[w0:w1])
cap = max(8, 1 << (len(xs) - 1).bit_length())
xs2 = xs + [b"A"] * (cap - len(xs))
ys2 = ys + [b"A"] * (cap - len(ys))
t = best_of(lambda: mapper.aligner.semiglobal(xs2, ys2))
print(f"  aligner.semiglobal: {t*1e3:.0f} ms", flush=True)

xb, yb, ml, nl = mapper.aligner._pad(xs2, ys2)
t = best_of(lambda: mapper.aligner._pad(xs2, ys2))
print(f"    _pad: {t*1e3:.0f} ms", flush=True)
from rust_bio_tpu.alignment.pairwise.scoring import MIN_SCORE
pen = np.array([-5, -1, MIN_SCORE, MIN_SCORE, 0, 0], np.int32)
def disp_pull():
    out = mapper.aligner._dispatch(xb, yb, ml, nl, pen, True)
    np.asarray(out["packed"])
t = best_of(disp_pull)
print(f"    dispatch+pull: {t*1e3:.0f} ms", flush=True)
