import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from rust_bio_tpu.alignment.pairwise.batched import BatchAligner
from rust_bio_tpu.alignment.pairwise.scoring import Scoring

B, M, N = 8192, 150, 150
rng = np.random.default_rng(7)
xb = rng.integers(0, 4, size=(B, M)).astype(np.uint8) + ord("A")
yb = rng.integers(0, 4, size=(B, N)).astype(np.uint8) + ord("A")
ml = np.full(B, M, np.int32); nl = np.full(B, N, np.int32)
ba = BatchAligner(Scoring.from_scores(-5, -1, 2, -2))
h = ba.global_packed_async_arrays(xb, yb, ml, nl)
p = BatchAligner.global_packed_finish(h)
p.cigars()

t0 = time.perf_counter()
h = ba.global_packed_async_arrays(xb, yb, ml, nl)
t1 = time.perf_counter()
packed_np = np.asarray(h[0])
t2 = time.perf_counter()
pk = BatchAligner.global_packed_finish((jnp.asarray(packed_np), h[1], h[2]))
t25 = time.perf_counter()
c = pk.cigars()
t3 = time.perf_counter()
print(f"dispatch(host) {1e3*(t1-t0):.1f} ms, devwait+pull {1e3*(t2-t1):.1f} ms (shape {packed_np.shape} {packed_np.dtype}), finish(re-pull) {1e3*(t25-t2):.1f}, cigars {1e3*(t3-t25):.1f} ms")
