import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rust_bio_tpu.alignment.pairwise.banded_device import BatchBandedAligner
import rust_bio_tpu.alignment.pairwise.banded_device as bd
from rust_bio_tpu.alignment.pairwise.scoring import Scoring

rng = np.random.default_rng(31)
B, M, N = 1024, 150, 20_000
sc = Scoring.from_scores(-5, -1, 2, -2)
xs, ys = [], []
for _ in range(B):
    y = rng.choice(list(b"ACGT"), size=N).astype(np.uint8).tobytes()
    s = int(rng.integers(0, N - M))
    x = bytearray(y[s : s + M])
    for _ in range(4):
        x[int(rng.integers(0, M))] = int(rng.choice(list(b"ACGT")))
    xs.append(bytes(x)); ys.append(y)

bat = BatchBandedAligner(sc, 8, 8)
bat.semiglobal(xs, ys)  # warm

# instrument: wrap key callables with timers
import rust_bio_tpu.native as _native
tm = {}
def wrap(mod, name, key):
    orig = getattr(mod, name)
    def f(*a, **k):
        t0 = time.perf_counter()
        out = orig(*a, **k)
        tm[key] = tm.get(key, 0) + time.perf_counter() - t0
        return out
    setattr(mod, name, f)
    return orig

o1 = wrap(_native, "band_build_batch", "band")
orig_dev = bd._align_batch_device_banded_mp
def timed_dev(*a, **k):
    t0 = time.perf_counter()
    out = orig_dev(*a, **k)
    tm["dispatch"] = tm.get("dispatch",0) + time.perf_counter() - t0
    t0 = time.perf_counter()
    outh = {kk: np.asarray(vv) for kk, vv in out.items()}
    tm["devwait_pull"] = tm.get("devwait_pull",0) + time.perf_counter() - t0
    import jax.numpy as jnp
    return {kk: jnp.asarray(vv) for kk, vv in outh.items()}
bd._align_batch_device_banded_mp = timed_dev
o3 = wrap(bd, "_unpack_banded", "unpack")
o4 = wrap(bd, "_decode_ops", "decode_ops")

t0 = time.perf_counter()
bat.semiglobal(xs, ys)
tot = time.perf_counter() - t0
other = tot - sum(tm.values())
print({k: round(v*1e3,1) for k,v in tm.items()}, "total", round(tot*1e3,1), "other", round(other*1e3,1))
