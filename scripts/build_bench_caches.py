"""Pre-build the genome-scale bench index caches (.bench_cache/): run
once so driver bench runs load instead of rebuild."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import bench

t0 = time.time()
print("building 300 Mbp SMEM cache...", flush=True)
r = bench._smem_300mbp_reads_per_s()
print(f"smem_300mbp: {r:.1f} reads/s ({time.time()-t0:.0f}s)", flush=True)

t0 = time.time()
print("building 1 Gbp FM cache...", flush=True)
lut, plain, cpu = bench._fm_1gbp_rates()
print(f"fm_1gbp: lut {lut:.0f} plain {plain:.0f} cpu {cpu:.0f} q/s "
      f"vs {lut/cpu:.2f}x ({time.time()-t0:.0f}s)", flush=True)
