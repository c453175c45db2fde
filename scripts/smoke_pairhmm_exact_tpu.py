"""TPU smoke: BatchPairHMMExact on the reference bench workload.

TPU f64 is software-emulated (non-IEEE, ~1e-15/op — see PARITY.md); this
verifies the exact path runs on the chip and measures its deviation from
the f64 host oracle.
"""

import math

import numpy as np

import jax


def main():
    print("backend:", jax.default_backend(), flush=True)
    with jax.enable_x64(True):
        import sys

        sys.path.insert(0, "/root/repo/tests")
        from test_pairhmm_exact import (
            BENCH_PATTERN,
            BENCH_TEXT,
            EMIT,
            _Gaps,
            _device,
            _oracle,
        )
        from rust_bio_tpu.stats.pairhmm import Semiglobal

        want = _oracle(BENCH_TEXT, BENCH_PATTERN, Semiglobal(), med=4)
        got = _device([BENCH_TEXT], [BENCH_PATTERN], True, med=4)[0]
        rel = abs(got - want) / abs(want)
        print(f"banded semiglobal: got={got!r} want={want!r} rel={rel:.2e}",
              flush=True)
        ok = rel < 1e-10
        want_u = _oracle(BENCH_TEXT, BENCH_PATTERN, Semiglobal())
        got_u = _device([BENCH_TEXT], [BENCH_PATTERN], True)[0]
        rel_u = abs(got_u - want_u) / abs(want_u)
        print(f"unbanded semiglobal: rel={rel_u:.2e}", flush=True)
        ok &= rel_u < 1e-10
        print("PASS" if ok else "FAIL", "pairhmm_exact_tpu", flush=True)


if __name__ == "__main__":
    main()
