import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from concurrent.futures import ThreadPoolExecutor
from rust_bio_tpu.alignment.pairwise.banded_device import BatchBandedAligner
from rust_bio_tpu.alignment.pairwise.scoring import Scoring

rng = np.random.default_rng(31)
M, N, NB = 150, 20_000, 3
sc = Scoring.from_scores(-5, -1, 2, -2)
bat = BatchBandedAligner(sc, 8, 8)

def make(B):
    batches = []
    for _ in range(NB):
        xs, ys = [], []
        for _ in range(B):
            y = rng.choice(list(b"ACGT"), size=N).astype(np.uint8).tobytes()
            s = int(rng.integers(0, N - M))
            x = bytearray(y[s : s + M])
            for _ in range(4):
                x[int(rng.integers(0, M))] = int(rng.choice(list(b"ACGT")))
            xs.append(bytes(x)); ys.append(y)
        batches.append((xs, ys))
    return batches

for B in (1024, 2048, 4096):
    batches = make(B)
    bat.semiglobal(*batches[0])  # warm/compile
    def run_pipe():
        with ThreadPoolExecutor(1) as pool:
            fut = pool.submit(bat.semiglobal_async, *batches[0])
            for nxt in range(1, NB):
                h = fut.result()
                fut = pool.submit(bat.semiglobal_async, *batches[nxt])
                bat.semiglobal_finish(h)
            bat.semiglobal_finish(fut.result())
    run_pipe()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); run_pipe(); best = min(best, time.perf_counter()-t0)
    print(f"B={B}: pipelined {NB*B/best:.0f} pairs/s")
