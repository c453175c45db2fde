import sys; sys.path.insert(0, "/root/repo")
import time
import os
os.environ["BENCH_BUILD_BIG"] = "1"
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import bench
t0 = time.time()
rates = bench._fm_big_rates(2_000_000_000, 61, "2gbp", twin_threads=4)
lut, plain, cpu = rates[:3]
print(f"fm_2gbp: lut {lut:.0f} plain {plain:.0f} cpu {cpu:.0f} q/s vs {lut/cpu:.2f}x ({time.time()-t0:.0f}s)", flush=True)
