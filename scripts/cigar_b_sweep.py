import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from rust_bio_tpu.alignment.pairwise.batched import BatchAligner
from rust_bio_tpu.alignment.pairwise.scoring import Scoring

M = N = 150
rng = np.random.default_rng(7)
ba = BatchAligner(Scoring.from_scores(-5, -1, 2, -2))
for B, K in ((8192, 8), (32768, 2), (65536, 1)):
    xb = rng.integers(0, 4, size=(B, M)).astype(np.uint8) + ord("A")
    yb = rng.integers(0, 4, size=(B, N)).astype(np.uint8) + ord("A")
    ml = np.full(B, M, np.int32); nl = np.full(B, N, np.int32)
    def run():
        hs = [ba.global_packed_async_arrays(xb, yb, ml, nl) for _ in range(K)]
        for h in hs:
            BatchAligner.global_packed_finish(h).cigars()
    run()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); run(); best = min(best, time.perf_counter()-t0)
    print(f"B={B} K={K}: {K*B/best:.0f} aln/s delivered")
