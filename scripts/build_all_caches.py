"""Sequentially prebuild every .bench_cache/ index a driver bench run
needs (fresh-machine bootstrap).  Each step is independent: a failure is
logged and the rest proceed.  Runs on the real TPU (the row functions
time their kernels), which also warms the persistent compile cache at
/root/.cache/jax_comp so the driver's first bench run compiles nothing.

The 2 Gbp step waits until the (concurrent) 3 Gbp SAIS build has
checkpointed its SA — their host-RSS peaks (~57 GB + ~62 GB) must not
coincide on this 125 GB box.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench  # noqa: E402

CACHE = bench._CACHE_DIR


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def step(name, fn):
    t0 = time.time()
    log(f"--- {name} ---")
    try:
        out = fn()
        log(f"{name}: OK {out} ({time.time() - t0:.0f}s)")
    except Exception as e:  # noqa: BLE001
        log(f"{name}: FAILED after {time.time() - t0:.0f}s: {e!r}")


def wait_for_3gbp_sa():
    """Block until the 3 Gbp build's RAM peak (the SAIS stage) is past:
    either its SA checkpoint exists or no build process remains."""
    sa = os.path.join(CACHE, "fm_3gbp_bwt.bin")
    sa2 = os.path.join(CACHE, "fm_3gbp_sa.u32.bin")
    while True:
        if os.path.exists(sa) or os.path.exists(sa2):
            return
        alive = os.system(
            "ps aux | grep build_3gbp_cache.py | grep -v grep >/dev/null"
        ) == 0
        if not alive:
            return
        log("waiting for 3 Gbp SAIS checkpoint before the 2 Gbp build...")
        time.sleep(120)


step("fm_50mbp", lambda: bench._fm_big_rates(50_000_000, 19, "50mbp"))
step("smem_50mbp", bench._smem_50mbp_reads_per_s)
step("smem_repeats", bench._smem_repeats_rates)
step("smem_300mbp", bench._smem_300mbp_reads_per_s)
step("fm_1gbp", bench._fm_1gbp_rates)
os.environ["BENCH_BUILD_BIG"] = "1"
wait_for_3gbp_sa()
step(
    "fm_2gbp",
    lambda: bench._fm_big_rates(2_000_000_000, 61, "2gbp", twin_threads=4),
)
log("all cache builds attempted")
