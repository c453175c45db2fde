"""Iteration harness: BatchBandedAligner vs banded.Aligner on random pairs."""

import sys

import numpy as np

from rust_bio_tpu.alignment.pairwise import banded
from rust_bio_tpu.alignment.pairwise.banded_device import BatchBandedAligner
from rust_bio_tpu.alignment.pairwise.scoring import Scoring


def gen_pair(rng, mmax=60, nmax=70, related=True):
    m = int(rng.integers(10, mmax))
    x = rng.choice(list(b"ACGT"), size=m).astype("uint8").tobytes()
    if related and rng.random() < 0.8:
        y = bytearray(x)
        for _ in range(int(rng.integers(0, 6))):
            p = int(rng.integers(0, len(y)))
            op = rng.random()
            if op < 0.5:
                y[p] = int(rng.choice(list(b"ACGT")))
            elif op < 0.75 and len(y) > 12:
                del y[p]
            else:
                y.insert(p, int(rng.choice(list(b"ACGT"))))
        # random prefix/suffix flanks sometimes
        if rng.random() < 0.4:
            y = rng.choice(list(b"ACGT"), size=int(rng.integers(0, 10))).astype("uint8").tobytes() + bytes(y)
        else:
            y = bytes(y)
        y = bytes(y)[:nmax]
        if not y:
            y = b"A"
    else:
        y = rng.choice(
            list(b"ACGT"), size=int(rng.integers(10, nmax))
        ).astype("uint8").tobytes()
    return x, y


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    npairs = int(sys.argv[3]) if len(sys.argv) > 3 else 24
    rng = np.random.default_rng(seed)
    k, w = 5, 8
    sc = Scoring.from_scores(-5, -1, 2, -2)
    bat = BatchBandedAligner(sc, k, w)
    pairs = [gen_pair(rng) for _ in range(npairs)]
    xs = [p[0] for p in pairs]
    ys = [p[1] for p in pairs]

    modes = (
        ["custom", "global_", "semiglobal", "local"] if mode == "all"
        else [mode]
    )
    nbad = 0
    for mname in modes:
        got = getattr(bat, mname)(xs, ys)
        for i, (x, y) in enumerate(pairs):
            al = banded.Aligner(sc, k, w)
            hm = {"custom": al.custom, "global_": al.global_,
                  "semiglobal": al.semiglobal, "local": al.local}[mname]
            want = hm(x, y)
            g = got[i]
            ok = (
                g.score == want.score
                and g.operations == want.operations
                and g.xstart == want.xstart and g.ystart == want.ystart
                and g.xend == want.xend and g.yend == want.yend
            )
            if not ok:
                nbad += 1
                print(f"MISMATCH {mname} pair {i}: "
                      f"score {g.score} vs {want.score}; "
                      f"start ({g.xstart},{g.ystart}) vs "
                      f"({want.xstart},{want.ystart}); "
                      f"end ({g.xend},{g.yend}) vs ({want.xend},{want.yend})")
                if g.operations != want.operations:
                    print(f"  ops got : {g.operations[:30]}")
                    print(f"  ops want: {want.operations[:30]}")
                    print(f"  x={x!r}")
                    print(f"  y={y!r}")
                if nbad > 3:
                    sys.exit(1)
        print(f"{mname}: done ({npairs} pairs)", flush=True)
    print("ALL OK" if nbad == 0 else f"{nbad} mismatches")
    sys.exit(1 if nbad else 0)


if __name__ == "__main__":
    main()
