"""Banded long-target bench pieces on TPU + SMEM batch-size sweep."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")
import bench


def main():
    t0 = time.perf_counter()
    dev, host, full = bench._banded_long_rates()
    print(
        f"banded_long: dev {dev:.1f} pairs/s  host {host:.2f}  "
        f"full-matrix {full:.1f}  vs_host {dev/host:.0f}x  "
        f"vs_full {dev/full:.1f}x  ({time.perf_counter()-t0:.0f}s)",
        flush=True,
    )

    # SMEM mapper batch-size sweep
    from rust_bio_tpu.pipelines.read_mapper import SmemReadMapper

    rng = np.random.default_rng(29)
    G = 500_000
    genome = rng.choice(list(b"ACGT"), size=G).astype(np.uint8).tobytes()
    mapper = SmemReadMapper(genome, min_seed_len=19)
    for B in (1024, 2048, 4096):
        L = 100
        starts = rng.integers(0, G - L, size=B)
        reads = []
        for s in starts:
            r = bytearray(genome[s : s + L])
            for _ in range(2):
                r[int(rng.integers(0, L))] = int(rng.choice(list(b"ACGT")))
            reads.append(bytes(r))
        out = mapper.map_batch(reads)
        ok = sum(1 for m, s in zip(out, starts) if m.pos == s)
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            mapper.map_batch(reads)
            dt = min(dt, time.perf_counter() - t0)
        print(f"smem B={B}: {dt*1e3:.0f} ms = {B/dt:.0f} reads/s ({ok}/{B})",
              flush=True)


if __name__ == "__main__":
    main()
