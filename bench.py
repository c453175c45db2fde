"""Driver benchmark: batched affine-gap SW alignments/s on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload matches the driver metric (BASELINE.json): 150 bp read pairs,
affine-gap Smith-Waterman (global mode), scores + full traceback parity
semantics. ``vs_baseline`` anchors against a -O3 C++ twin of the reference's
scalar DP inner loop measured on this machine's CPU (single core, the
reference's own execution model — see baselines/cpu_sw.cpp).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np


def _cpu_baseline_rate(B=512, M=150, N=150, iters=3) -> float:
    """alignments/s for the C++ scalar reference twin (cached)."""
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "baselines", "cpu_sw.cpp")
    exe = os.path.join(here, "baselines", "cpu_sw")
    if not os.path.exists(exe) or os.path.getmtime(exe) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-o", exe, src], check=True
        )
    out = subprocess.run(
        [exe, str(B), str(M), str(N), str(iters)],
        check=True,
        capture_output=True,
        text=True,
    )
    return float(out.stdout.strip())


def main() -> None:
    import jax
    import jax.numpy as jnp

    from rust_bio_tpu.alignment.pairwise.batched import _align_batch_device
    from rust_bio_tpu.alignment.pairwise.scoring import MIN_SCORE, Scoring

    B, M, N = 4096, 150, 150
    rng = np.random.default_rng(7)
    xb = jnp.asarray(rng.integers(0, 4, size=(B, M)).astype(np.uint8) + ord("A"))
    yb = jnp.asarray(rng.integers(0, 4, size=(B, N)).astype(np.uint8) + ord("A"))
    mlens = jnp.full((B,), M, dtype=jnp.int32)
    nlens = jnp.full((B,), N, dtype=jnp.int32)

    scoring = Scoring.from_scores(-5, -1, 2, -2)
    lut = jnp.asarray(scoring.dense_lut())
    pen = jnp.asarray(
        np.array([-5, -1, MIN_SCORE, MIN_SCORE, MIN_SCORE, MIN_SCORE], np.int32)
    )

    def run():
        out = _align_batch_device(xb, yb, mlens, nlens, lut, pen)
        jax.block_until_ready(out)
        return out

    run()  # compile + warmup
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    dt = (time.perf_counter() - t0) / iters
    rate = B / dt

    try:
        cpu_rate = _cpu_baseline_rate(M=M, N=N)
    except Exception as e:  # baseline must never break the bench line
        print(f"cpu baseline failed: {e}", file=sys.stderr)
        cpu_rate = float("nan")

    print(
        json.dumps(
            {
                "metric": "sw_alignments_per_s_per_chip_150bp",
                "value": round(rate, 2),
                "unit": "alignments/s",
                "vs_baseline": round(rate / cpu_rate, 3)
                if cpu_rate == cpu_rate
                else None,
            }
        )
    )


if __name__ == "__main__":
    main()
