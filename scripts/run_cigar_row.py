import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import bench
t0 = time.time()
c = bench._sw_cigar_delivered_per_s()
print(f"sw_cigar_delivered: {c:.0f} aln/s ({time.time()-t0:.0f}s)")
