"""50 Mbp FM search on the HBM gather path: plain scan vs q=12 LUT jump."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rust_bio_tpu.alphabets import dna
from rust_bio_tpu.data_structures.bwt import bwt
from rust_bio_tpu.data_structures.fm_device import DeviceFMIndex
from rust_bio_tpu.data_structures.suffix_array import suffix_array

G = 50_000_000
rng = np.random.default_rng(19)
t0 = time.perf_counter()
text = rng.choice(list(b"ACGT"), size=G).astype(np.uint8).tobytes() + b"$"
sa = suffix_array(text)
t1 = time.perf_counter()
idx = DeviceFMIndex(bwt(text, sa), dna.n_alphabet())
t2 = time.perf_counter()
idx.build_kmer_lut(q=12)
t3 = time.perf_counter()
print(
    f"sais {t1-t0:.1f}s  DeviceFMIndex {t2-t1:.1f}s  lut {t3-t2:.1f}s",
    flush=True,
)
print("fs_cfg:", idx._fs_cfg, "mxu:", idx._mxu_swt, flush=True)

B, L = 65536, 20
pats = np.zeros((B, L), dtype=np.uint8)
starts = rng.integers(0, G - L - 1, size=B)
tarr = np.frombuffer(text, dtype=np.uint8)
for i, s in enumerate(starts):
    pats[i] = tarr[s : s + L]
plens = np.full(B, L, dtype=np.int32)
pats_d, plens_d = jnp.asarray(pats), jnp.asarray(plens)

st, lo, up, ml = idx.search_batch_lut(pats[:2048], plens[:2048])
assert (st == 2).all() and (ml == L).all(), (st[:5], ml[:5])
print("lut parity spot-check ok", flush=True)


def best_of(f, n=3):
    dt = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        dt = min(dt, time.perf_counter() - t0)
    return dt


K = 8


def run_lut():
    s = None
    for _ in range(K):
        out = idx._search_kernel_lut(pats_d, plens_d)
        s = out[3] if s is None else s + out[3]
    np.asarray(s)


run_lut()
print(f"lut path: {K*B/best_of(run_lut)/1e6:.3f} M q/s", flush=True)


def run_plain():
    s = None
    for _ in range(K):
        out = idx._search_kernel(pats_d, plens_d)
        s = out[3] if s is None else s + out[3]
    np.asarray(s)


run_plain()
print(f"plain path: {K*B/best_of(run_plain)/1e6:.3f} M q/s", flush=True)
