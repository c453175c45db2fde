"""Stage-split profile of the banded device path on real TPU."""
import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rust_bio_tpu.alignment.pairwise.banded_device import BatchBandedAligner
from rust_bio_tpu.alignment.pairwise.scoring import Scoring

rng = np.random.default_rng(31)
M, N = 150, 20_000
sc = Scoring.from_scores(-5, -1, 2, -2)

def make(B):
    xs, ys = [], []
    for _ in range(B):
        y = rng.choice(list(b"ACGT"), size=N).astype(np.uint8).tobytes()
        s = int(rng.integers(0, N - M))
        x = bytearray(y[s : s + M])
        for _ in range(4):
            x[int(rng.integers(0, M))] = int(rng.choice(list(b"ACGT")))
        xs.append(bytes(x))
        ys.append(y)
    return xs, ys

bat = BatchBandedAligner(sc, 8, 8)
for B in (256, 1024):
    xs, ys = make(B)
    t0 = time.perf_counter()
    bat.semiglobal(xs, ys)
    print(f"B={B} warm call: {time.perf_counter()-t0:.2f}s")
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        bat.semiglobal(xs, ys)
        best = min(best, time.perf_counter() - t0)
    print(f"B={B} full semiglobal: {best*1e3:.1f} ms -> {B/best:.1f} pairs/s")

# stage split at B=1024
import rust_bio_tpu.alignment.pairwise.banded_device as bd
from rust_bio_tpu import native as _native
xs, ys = make(1024)
xb_h = np.zeros((1024, M), np.uint8); yb_h = np.zeros((1024, N), np.uint8)
for i,(x,y) in enumerate(zip(xs,ys)):
    xb_h[i,:len(x)] = np.frombuffer(x,np.uint8); yb_h[i,:len(y)] = np.frombuffer(y,np.uint8)
ml = np.full(1024, M, np.int64); nl = np.full(1024, N, np.int64)
t0=time.perf_counter()
_native.band_build_batch(xb_h, ml, yb_h, nl, 8, 8, (-858993459,-858993459,0,0), 2, 5, 1)
print(f"native band build batch: {(time.perf_counter()-t0)*1e3:.1f} ms")

orig = bd._align_batch_device_banded_mp
t_dev = {}
def timed(*a, **k):
    t0 = time.perf_counter()
    out = orig(*a, **k)
    t_dev["dispatch"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    outh = {kk: np.asarray(vv) for kk, vv in out.items()}
    t_dev["pull"] = time.perf_counter() - t0
    import jax.numpy as jnp
    return {kk: jnp.asarray(vv) for kk, vv in outh.items()}
bd._align_batch_device_banded_mp = timed
t0 = time.perf_counter()
bat.semiglobal(xs, ys)
tot = time.perf_counter() - t0
print(f"B=1024 split: total {tot*1e3:.1f} ms, dispatch(async) {t_dev['dispatch']*1e3:.1f} ms, devwait+pull {t_dev['pull']*1e3:.1f} ms, host rest {(tot-t_dev['dispatch']-t_dev['pull'])*1e3:.1f} ms")
