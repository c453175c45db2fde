"""TPU profile: where does SmemReadMapper.map_batch spend its time?"""

import time

import numpy as np

import jax


def main():
    print("backend:", jax.default_backend(), flush=True)
    from rust_bio_tpu.pipelines.read_mapper import ReadMapper, SmemReadMapper

    rng = np.random.default_rng(5)
    G = 1_000_000
    genome = rng.choice(list(b"ACGT"), size=G).astype("uint8").tobytes()
    t0 = time.time()
    smem = SmemReadMapper(genome, min_seed_len=19)
    print(f"index build: {time.time()-t0:.1f}s", flush=True)

    B, L = 1024, 100
    starts = rng.integers(0, G - L, size=B)
    reads = []
    for s in starts:
        r = bytearray(genome[s : s + L])
        for _ in range(2):
            r[int(rng.integers(0, L))] = int(rng.choice(list(b"ACGT")))
        reads.append(bytes(r))

    # warm
    out = smem.map_batch(reads[:B])
    ok = sum(1 for m, s in zip(out, starts) if m.pos == s)
    print(f"mapped correctly: {ok}/{B}", flush=True)

    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        smem.map_batch(reads)
        dt = min(dt, time.perf_counter() - t0)
    print(f"map_batch (best of 3): {dt*1e3:.0f} ms  ({B/dt:,.0f} reads/s)",
          flush=True)

    # phase timings
    seqs = reads
    t_smem = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sm = smem.fmd.smems_batch(
            seqs, [len(s) // 2 - 1 for s in seqs], 19, max_slots=16,
            host_oracle_fn=lambda: smem.host_fmd,
        )
        t_smem = min(t_smem, time.perf_counter() - t0)
    print(f"  smems_batch (best of 3): {t_smem*1e3:.0f} ms", flush=True)

    rows = []
    for i in range(B):
        best = None
        for itv, q0, mlen in sm[i]:
            if best is None or mlen > best[2]:
                best = (itv, q0, mlen)
        if best:
            rows.append(best[0].lower)
    t_loc = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        pos = smem.index.locate_batch(np.asarray(rows, np.int32))
        t_loc = min(t_loc, time.perf_counter() - t0)
    print(f"  locate_batch ({len(rows)} rows, best of 3): {t_loc*1e3:.0f} ms",
          flush=True)

    # extension stage alone via the fixed-window mapper for comparison



if __name__ == "__main__" and __import__("sys").argv[-1] not in (
        "extend", "extend2"):
    main()


def profile_extend():
    import time
    import numpy as np
    import jax
    print("backend:", jax.default_backend(), flush=True)
    from rust_bio_tpu.alignment.pairwise.batched import BatchAligner
    from rust_bio_tpu.alignment.pairwise.scoring import Scoring

    rng = np.random.default_rng(5)
    B, L, W = 1024, 100, 116
    xs, ys = [], []
    for _ in range(B):
        y = rng.choice(list(b"ACGT"), size=W).astype("uint8").tobytes()
        s = int(rng.integers(0, W - L))
        x = bytearray(y[s:s + L])
        x[int(rng.integers(0, L))] = int(rng.choice(list(b"ACGT")))
        xs.append(bytes(x)); ys.append(y)
    ba = BatchAligner(Scoring.from_scores(-5, -1, 2, -2))
    ba.semiglobal(xs, ys)
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        alns = ba.semiglobal(xs, ys)
        dt = min(dt, time.perf_counter() - t0)
    print(f"semiglobal B={B} full result objects: {dt*1e3:.0f} ms "
          f"({B/dt:,.0f} aln/s)", flush=True)
    t0 = time.perf_counter()
    _ = [a.cigar() for a in alns]
    print(f"  cigar strings: {(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)


if __name__ == "__main__" and __import__("sys").argv[-1] == "extend":
    profile_extend()
    raise SystemExit


def profile_extend2():
    import time
    import numpy as np
    import jax, jax.numpy as jnp
    print("backend:", jax.default_backend(), flush=True)
    from rust_bio_tpu.alignment.pairwise.batched import (
        BatchAligner, _align_batch_device_semiglobal_mp,
    )
    from rust_bio_tpu.alignment.pairwise.scoring import Scoring, MIN_SCORE

    rng = np.random.default_rng(5)
    B, L, W = 1024, 100, 116
    xs, ys = [], []
    for _ in range(B):
        y = rng.choice(list(b"ACGT"), size=W).astype("uint8").tobytes()
        s = int(rng.integers(0, W - L))
        x = bytearray(y[s:s + L])
        x[int(rng.integers(0, L))] = int(rng.choice(list(b"ACGT")))
        xs.append(bytes(x)); ys.append(y)
    ba = BatchAligner(Scoring.from_scores(-5, -1, 2, -2))

    xb, yb, mlens, nlens = ba._pad(xs, ys)
    pen = np.array([-5, -1, MIN_SCORE, MIN_SCORE, 0, 0], np.int32)

    def dev_only():
        out = ba._dispatch(xb, yb, mlens, nlens, pen, with_traceback=True)
        np.asarray(out["packed"])
        return out

    out = dev_only()
    t = min(
        (lambda: (lambda t0: (dev_only(), time.perf_counter() - t0)[1])(
            time.perf_counter()))() for _ in range(3)
    )
    print(f"device dispatch+pull: {t*1e3:.0f} ms", flush=True)

    from rust_bio_tpu.alignment.pairwise.batched import (
        _decode_ops_colrle_semi, _unpack_rle,
    )
    _, up = _unpack_rle(np.asarray(out["packed"]))
    t0 = time.perf_counter()
    for k in range(B):
        _decode_ops_colrle_semi(
            up["ins_cnt"][:, k], up["exit_op"][:, k], up["ins0"][k],
            up["fix_ins"][k], up["fix_exit"][k], up["fix_ly"][k],
            int(nlens[k]),
        )
    print(f"decode x{B}: {(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)

    t0 = time.perf_counter()
    ba.semiglobal(xs, ys)
    print(f"full semiglobal(): {(time.perf_counter()-t0)*1e3:.0f} ms",
          flush=True)


if __name__ == "__main__" and __import__("sys").argv[-1] == "extend2":
    profile_extend2()
    raise SystemExit
