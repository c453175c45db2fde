"""TPU smoke: the banded Pallas kernel at realistic shapes vs the host
oracle (Mosaic constraints are not validated by interpret mode)."""

import sys
import time

import numpy as np

import jax


def main():
    print("backend:", jax.default_backend(), flush=True)
    sys.path.insert(0, "/root/repo/scripts")
    from dev_banded_check import gen_pair

    from rust_bio_tpu.alignment.pairwise import banded
    from rust_bio_tpu.alignment.pairwise.banded_device import (
        BatchBandedAligner,
    )
    from rust_bio_tpu.alignment.pairwise.scoring import Scoring

    rng = np.random.default_rng(21)
    sc = Scoring.from_scores(-5, -1, 2, -2)
    bat = BatchBandedAligner(sc, 5, 8)
    pairs = [gen_pair(rng, mmax=150, nmax=170) for _ in range(128)]
    xs = [p[0] for p in pairs]
    ys = [p[1] for p in pairs]
    allok = True
    for mode in ("custom", "global_", "semiglobal", "local"):
        t0 = time.time()
        got = getattr(bat, mode)(xs, ys)
        dt = time.time() - t0
        bad = 0
        for i in range(0, len(pairs), 17):
            al = banded.Aligner(sc, 5, 8)
            want = getattr(al, mode)(xs[i], ys[i])
            g = got[i]
            if not (
                g.score == want.score
                and g.operations == want.operations
                and (g.xstart, g.ystart, g.xend, g.yend)
                == (want.xstart, want.ystart, want.xend, want.yend)
            ):
                bad += 1
                print(f"  MISMATCH {mode} {i}: {g.score} vs {want.score}")
        ok = bad == 0
        allok &= ok
        print(f"{'PASS' if ok else 'FAIL'} banded_{mode} ({dt:.1f}s)",
              flush=True)
    print("ALL OK" if allok else "FAILURES", flush=True)


if __name__ == "__main__":
    main()
