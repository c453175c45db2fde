import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import bench
p, s, c, f = bench._banded_long_rates()
print(f"150bp: pipelined {p:.1f}/s sync {s:.1f}/s cpu-twin {c:.1f}/s vs {p/c:.2f}x, full-matrix {f:.1f}/s")
d1, c1 = bench._banded_1kb_rates()
print(f"1kb: device {d1:.1f}/s cpu-twin {c1:.1f}/s vs {d1/c1:.2f}x")
