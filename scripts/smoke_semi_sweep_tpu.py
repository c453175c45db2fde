"""TPU smoke: semiglobal sweep walk vs host oracle + throughput."""

import time

import numpy as np

import jax


def main():
    print("backend:", jax.default_backend(), flush=True)
    from rust_bio_tpu.alignment.pairwise.batched import BatchAligner
    from rust_bio_tpu.alignment.pairwise.scalar import Aligner
    from rust_bio_tpu.alignment.pairwise.scoring import Scoring

    rng = np.random.default_rng(33)
    sc = Scoring.from_scores(-5, -1, 2, -2)
    ba = BatchAligner(sc)
    host = Aligner.with_scoring(sc)

    # correctness: reads inside larger texts + unrelated + ragged
    xs, ys = [], []
    for t in range(256):
        if t % 3 == 0:
            y = rng.choice(list(b"ACGT"), size=int(rng.integers(60, 140))).astype("uint8").tobytes()
            s = int(rng.integers(0, max(1, len(y) - 50)))
            x = bytearray(y[s : s + 50])
            for _ in range(int(rng.integers(0, 4))):
                x[int(rng.integers(0, len(x)))] = int(rng.choice(list(b"ACGT")))
            xs.append(bytes(x))
            ys.append(y)
        else:
            xs.append(rng.choice(list(b"ACGT"), size=int(rng.integers(20, 100))).astype("uint8").tobytes())
            ys.append(rng.choice(list(b"ACGT"), size=int(rng.integers(20, 120))).astype("uint8").tobytes())
    t0 = time.time()
    got = ba.semiglobal(xs, ys)
    print(f"batch done {time.time()-t0:.1f}s", flush=True)
    bad = 0
    for i in range(0, 256, 11):
        want = host.semiglobal(xs[i], ys[i])
        g = got[i]
        if not (g.score == want.score and g.operations == want.operations
                and (g.ystart, g.yend) == (want.ystart, want.yend)):
            bad += 1
            print(f"MISMATCH {i}: {g.score} vs {want.score}")
            print(f"  got : {g.operations[:25]}")
            print(f"  want: {want.operations[:25]}")
    print(("PASS" if bad == 0 else "FAIL") + " semiglobal_sweep", flush=True)

    # throughput at bench shape
    import jax.numpy as jnp
    from rust_bio_tpu.alignment.pairwise.batched import (
        _align_batch_device_semiglobal_mp,
    )
    from rust_bio_tpu.alignment.pairwise.scoring import MIN_SCORE

    B, M, N = 8192, 150, 150
    xb = jnp.asarray(rng.integers(0, 4, size=(B, M)).astype(np.uint8) + 65)
    yb = jnp.asarray(rng.integers(0, 4, size=(B, N)).astype(np.uint8) + 65)
    lens = jnp.full((B,), M, jnp.int32)
    pen8 = jnp.asarray(np.array([-5, -1, MIN_SCORE, MIN_SCORE, 0, 0, 2, -2], np.int32))

    def run():
        s = None
        for _ in range(8):
            out = _align_batch_device_semiglobal_mp(xb, yb, lens, lens, pen8)
            s = out["score"] if s is None else s + out["score"]
        np.asarray(s)

    run()
    dt = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        run()
        dt = min(dt, time.perf_counter() - t0)
    print(f"semiglobal full-tb: {8*B/dt:,.0f} aln/s", flush=True)


if __name__ == "__main__":
    main()
