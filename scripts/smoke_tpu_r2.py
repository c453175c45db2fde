"""One-shot TPU smoke test for the round-2 new kernel paths:

  1. global MP engine, runs=False scratch layout + Pallas sweep walk
  2. global subs (LUT) engine, runs=False + sweep walk
  3. fused FM-index backward-search kernel (ops/fm_pallas.py)

Each path is checked against its host oracle / XLA twin on small-but-
layout-relevant shapes.  Prints PASS/FAIL per path.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp


def check(name, ok):
    print(f"{'PASS' if ok else 'FAIL'} {name}", flush=True)
    return ok


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    all_ok = True

    # --- 1+2: global engines with sweep walk ---------------------------
    from rust_bio_tpu.alignment.pairwise.batched import BatchAligner
    from rust_bio_tpu.alignment.pairwise.scalar import Aligner, Scoring

    B, M, N = 256, 100, 120
    xs, ys = [], []
    for i in range(B):
        ml = int(rng.integers(50, M + 1))
        nl = int(rng.integers(50, N + 1))
        xs.append(rng.choice(list(b"ACGT"), size=ml).astype("uint8").tobytes())
        ys.append(rng.choice(list(b"ACGT"), size=nl).astype("uint8").tobytes())

    t0 = time.time()
    sc = Scoring.from_scores(-5, -1, 1, -1)
    ba = BatchAligner(sc)
    res = ba.global_(xs, ys)
    print(f"global MP batch done in {time.time()-t0:.1f}s", flush=True)
    host = Aligner.with_scoring(sc)
    ok = True
    for i in range(0, B, 37):
        want = host.global_(xs[i], ys[i])
        got = res[i]
        ok &= got.score == want.score and got.operations == want.operations
    all_ok &= check("global_mp_sweep_walk", ok)

    from rust_bio_tpu.scores import blosum62

    t0 = time.time()
    scb = Scoring.new(-5, -1, blosum62)
    bab = BatchAligner(scb)
    xs2 = [rng.choice(list(b"ARNDCQEGHILKMFPSTWYV"), size=80).astype("uint8").tobytes()
           for _ in range(B)]
    ys2 = [rng.choice(list(b"ARNDCQEGHILKMFPSTWYV"), size=90).astype("uint8").tobytes()
           for _ in range(B)]
    res2 = bab.global_(xs2, ys2)
    print(f"global LUT batch done in {time.time()-t0:.1f}s", flush=True)
    hostb = Aligner.with_scoring(scb)
    ok = True
    for i in range(0, B, 41):
        want = hostb.global_(xs2[i], ys2[i])
        got = res2[i]
        ok &= got.score == want.score and got.operations == want.operations
    all_ok &= check("global_subs_sweep_walk", ok)

    # --- 3: fused FM search -------------------------------------------
    from rust_bio_tpu.alphabets import dna
    from rust_bio_tpu.data_structures.bwt import bwt
    from rust_bio_tpu.data_structures.fm_device import DeviceFMIndex
    from rust_bio_tpu.data_structures.suffix_array import suffix_array

    text = rng.choice(list(b"ACGT"), size=200_000).astype("uint8").tobytes() + b"$"
    b = bwt(text, suffix_array(text))
    t0 = time.time()
    dev = DeviceFMIndex(b, dna.n_alphabet())
    print(f"fm index built in {time.time()-t0:.1f}s; fused cfg:",
          dev._fs_cfg, flush=True)
    B2, L = 1024, 24
    pats = np.zeros((B2, L), dtype=np.uint8)
    plens = np.zeros(B2, dtype=np.int32)
    tarr = np.frombuffer(text, dtype=np.uint8)
    for i in range(B2):
        ln = int(rng.integers(1, L + 1))
        plens[i] = ln
        k = rng.random()
        if k < 0.4:
            s = int(rng.integers(0, len(text) - ln - 1))
            pats[i, :ln] = tarr[s:s + ln]
        elif k < 0.8:
            pats[i, :ln] = rng.choice(list(b"ACGT"), size=ln).astype("uint8")
        else:
            pats[i, :ln] = rng.choice(list(b"ACGTNX"), size=ln).astype("uint8")
    t0 = time.time()
    got = dev._search_kernel(jnp.asarray(pats), jnp.asarray(plens))
    got = [np.asarray(g) for g in got]
    print(f"fused search done in {time.time()-t0:.1f}s", flush=True)
    dev2 = DeviceFMIndex(b, dna.n_alphabet())
    dev2._fs_cfg = None
    want = [np.asarray(w) for w in
            dev2._search_kernel(jnp.asarray(pats), jnp.asarray(plens))]
    ok = all((g == w).all() for g, w in zip(got, want))
    all_ok &= check("fm_fused_search", ok)

    print("ALL OK" if all_ok else "SMOKE FAILURES", flush=True)


if __name__ == "__main__":
    main()
