"""TPU probe: LUT global path at larger M/N (multi-chunk subs kernel +
sweep walk) vs the host oracle."""

import time

import numpy as np

import jax


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(3)

    from rust_bio_tpu.alignment.pairwise.batched import BatchAligner
    from rust_bio_tpu.alignment.pairwise.scalar import Aligner
    from rust_bio_tpu.alignment.pairwise.scoring import Scoring
    from rust_bio_tpu.scores import blosum62

    aas = list(b"ARNDCQEGHILKMFPSTWYV")
    for (B, M, N) in [(64, 600, 700), (64, 640, 720)]:
        xs = [rng.choice(aas, size=int(rng.integers(M // 2, M + 1)))
              .astype("uint8").tobytes() for _ in range(B)]
        ys = [rng.choice(aas, size=int(rng.integers(N // 2, N + 1)))
              .astype("uint8").tobytes() for _ in range(B)]
        sc = Scoring.new(-5, -1, blosum62)
        ba = BatchAligner(sc)
        t0 = time.time()
        res = ba.global_(xs, ys)
        print(f"B={B} M={M} N={N}: {time.time()-t0:.1f}s", flush=True)
        host = Aligner.with_scoring(sc)
        bad = 0
        for i in range(0, B, 11):
            want = host.global_(xs[i], ys[i])
            if res[i].score != want.score or res[i].operations != want.operations:
                bad += 1
                print(f"  MISMATCH lane {i}: got score {res[i].score} "
                      f"want {want.score}; ops equal: "
                      f"{res[i].operations == want.operations}", flush=True)
        print(("PASS" if bad == 0 else "FAIL") + f" lut_long M={M}", flush=True)


if __name__ == "__main__":
    main()
