"""Round 2 of SMEM profiling: init breakdown, extend breakdown, stream rate."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

t00 = time.perf_counter()

import rust_bio_tpu.pipelines.read_mapper as rm
from rust_bio_tpu.alphabets import dna
from rust_bio_tpu.data_structures.bwt import bwt
from rust_bio_tpu.data_structures.suffix_array import suffix_array
from rust_bio_tpu.data_structures.fm_device import DeviceFMIndex

rng = np.random.default_rng(29)
G = 500_000
genome = rng.choice(list(b"ACGT"), size=G).astype(np.uint8).tobytes()

t0 = time.perf_counter()
text = genome + b"$" + dna.revcomp(genome) + b"$"
t1 = time.perf_counter()
sa = suffix_array(text)
t2 = time.perf_counter()
b = bwt(text, sa)
t3 = time.perf_counter()
alpha = dna.n_alphabet()
alpha.insert(ord("$"))
idx = DeviceFMIndex(b, alpha, sa=sa, sampling_rate=8)
t4 = time.perf_counter()
print(
    f"revcomp {t1-t0:.1f}s sais {t2-t1:.1f}s bwt {t3-t2:.1f}s "
    f"DeviceFMIndex {t4-t3:.1f}s",
    flush=True,
)

mapper = rm.SmemReadMapper(genome, min_seed_len=19)
print(f"SmemReadMapper init total: {time.perf_counter()-t4:.1f}s", flush=True)

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
print(f"mapped: {ok}/{B}", flush=True)


def best_of(f, n=3):
    dt = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        dt = min(dt, time.perf_counter() - t0)
    return dt


t = best_of(lambda: mapper.map_batch(reads))
print(f"map_batch: {t*1e3:.1f} ms = {B/t:.0f} reads/s", flush=True)

# extend breakdown: aligner.semiglobal = dispatch+kernel+pull+decode
xs = [bytes(r) for r in reads]
ys = [genome[max(int(s) - 8, 0) : int(s) + L + 8] for s in starts]
xb, yb, mlens, nlens = mapper.aligner._pad(xs, ys)
from rust_bio_tpu.alignment.pairwise.scoring import MIN_SCORE

pen = np.array([-5, -1, MIN_SCORE, MIN_SCORE, 0, 0], np.int32)
t = best_of(
    lambda: mapper.aligner._dispatch(xb, yb, mlens, nlens, pen, True)
)
print(f"extend dispatch only (async): {t*1e3:.1f} ms", flush=True)


def disp_pull():
    out = mapper.aligner._dispatch(xb, yb, mlens, nlens, pen, True)
    np.asarray(out["packed"])


t = best_of(disp_pull)
print(f"extend dispatch+pull: {t*1e3:.1f} ms", flush=True)
t = best_of(lambda: mapper.aligner.semiglobal(xs, ys))
print(f"extend full (incl decode): {t*1e3:.1f} ms", flush=True)

# stream rate over 8 batches
batches = []
all_starts = []
for _ in range(8):
    st = rng.integers(0, G - L, size=B)
    bs = []
    for s in st:
        r = bytearray(genome[s : s + L])
        for _ in range(2):
            r[int(rng.integers(0, L))] = int(rng.choice(list(b"ACGT")))
        bs.append(bytes(r))
    batches.append(bs)
    all_starts.append(st)

# warm
list(mapper.map_stream(batches[:2]))
t0 = time.perf_counter()
outs = list(mapper.map_stream(batches))
dt = time.perf_counter() - t0
ok = sum(
    1
    for bi in range(8)
    for m, s in zip(outs[bi], all_starts[bi])
    if m.pos == s
)
print(f"map_stream 8x{B}: {dt*1e3:.0f} ms = {8*B/dt:.0f} reads/s ({ok}/{8*B} ok)", flush=True)
