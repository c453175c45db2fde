import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import bench

t0 = time.time()
r1, frac, r50 = bench._smem_repeats_rates()
print(f"repeats: {r1:.0f} / {r50:.0f} reads/s ({time.time()-t0:.0f}s)", flush=True)
t0 = time.time()
s300 = bench._smem_300mbp_reads_per_s()
print(f"smem300: {s300:.0f} reads/s ({time.time()-t0:.0f}s)", flush=True)
t0 = time.time()
l1, p1, c1 = bench._fm_1gbp_rates()
print(f"fm_1gbp: {l1:.0f} q/s vs {l1/c1:.2f}x ({time.time()-t0:.0f}s)", flush=True)
t0 = time.time()
l2, p2, c2 = bench._fm_2gbp_rates()
print(f"fm_2gbp: {l2:.0f} q/s vs {l2/c2:.2f}x ({time.time()-t0:.0f}s)", flush=True)
