import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import bench
u, b, c = bench._pairhmm_exact_rates()
print(f"exact unbanded {u:.1f}/s banded {b:.1f}/s cpu-twin(banded) {c:.1f}/s vs {b/c:.2f}x")
