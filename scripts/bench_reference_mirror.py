"""Mirror of every reference bench workload (rust-bio benches/*.rs) on
this machine: host-oracle timings (the reference's execution model) vs the
TPU-native batched paths, geometry-matched to the reference corpora.

The reference's chrMT text is mirrored by a same-size random DNA text
(~16.6 kb); the 18-mer pattern and all workload shapes are the
reference's.  Prints one markdown table row per bench file; paste into
PARITY.md's perf section.

Run on TPU (driver env) for the device columns:
  env PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_reference_mirror.py
"""

import time

import numpy as np

PATTERN = b"GCGCGTACACACCGCCCG"  # the published 18-mer (lib.rs:218-228)


def best_of(f, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def call_rate(f, count_per_call, n=5):
    """Searches/s of a host-syncing batched call (the tunnel's ~26 ms
    round trip amortizes over the batch lanes)."""
    f()
    return count_per_call / best_of(f, n)


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(42)
    text = rng.choice(list(b"ACGT"), size=16_600).astype("uint8").tobytes()
    # plant some pattern hits like chrMT has
    t = bytearray(text)
    for s in rng.integers(0, len(t) - 20, size=4):
        t[s : s + len(PATTERN)] = PATTERN
    text = bytes(t)

    rows = []

    # --- pattern_matching.rs: 10,000 searches of the 18-mer ------------
    from rust_bio_tpu.pattern_matching.bndm import BNDM
    from rust_bio_tpu.pattern_matching.bom import BOM
    from rust_bio_tpu.pattern_matching.horspool import Horspool
    from rust_bio_tpu.pattern_matching.shift_and import ShiftAnd
    from rust_bio_tpu.pattern_matching.device_search import BatchShiftAnd

    for name, cls in (("BNDM", BNDM), ("BOM", BOM),
                      ("Horspool", Horspool), ("Shift-And", ShiftAnd)):
        dt = best_of(lambda: list(cls(PATTERN).find_all(text)))
        rows.append((f"pattern_matching/{name} (host oracle)",
                     f"{dt * 10_000 * 1e3:,.0f} ms / 10k searches"))

    B = 4096
    bsa = BatchShiftAnd([PATTERN] * B)
    want = len(list(ShiftAnd(PATTERN).find_all(text)))

    def dev_sa():
        got = np.asarray(bsa.counts(text, chunk=512))
        assert int(got[0]) == want, (got[0], want)

    rate = call_rate(dev_sa, B)
    rows.append(("pattern_matching (device batched Shift-And)",
                 f"{10_000 / rate * 1e3:,.1f} ms / 10k searches "
                 f"({rate:,.0f} searches/s)"))

    # --- approximate_matching.rs: 18-mer, k = 2 ------------------------
    from rust_bio_tpu.pattern_matching.myers import Myers
    from rust_bio_tpu.pattern_matching.ukkonen import Ukkonen, unit_cost
    from rust_bio_tpu.pattern_matching.myers_device import ChunkedMyers

    my = Myers(PATTERN)
    dt = best_of(lambda: list(my.find_all_end(text, 2)))
    rows.append(("approximate_matching/Myers k=2 (host oracle)",
                 f"{dt * 1e3:,.1f} ms / search"))
    uk = Ukkonen(unit_cost)
    dt = best_of(lambda: list(uk.find_all_end(PATTERN, text, 2)))
    rows.append(("approximate_matching/Ukkonen k=2 (host oracle)",
                 f"{dt * 1e3:,.1f} ms / search"))

    cm = ChunkedMyers([PATTERN] * 64)
    want_hits = len(list(my.find_all_end(text, 2)))

    def dev_my():
        hits = cm.find_all_end(text, 2)
        assert len(hits[0]) == want_hits

    rate = call_rate(dev_my, 64)
    rows.append(("approximate_matching (device chunked Myers, 64 lanes)",
                 f"{1.0 / rate * 1e3:,.2f} ms / search "
                 f"({rate:,.0f} searches/s)"))

    # --- suffix_array.rs ------------------------------------------------
    from rust_bio_tpu.data_structures.suffix_array import suffix_array

    toy = b"GCCTTAACATTATTACGCCTA$"
    dt = best_of(lambda: suffix_array(toy), 5)
    rows.append(("suffix_array (22-char toy, reference input)",
                 f"{dt * 1e6:,.0f} us / build"))
    big = rng.choice(list(b"ACGT"), size=1_000_000).astype("uint8").tobytes() + b"$"
    dt = best_of(lambda: suffix_array(big), 3)
    rows.append(("suffix_array (1 Mbp, native SA-IS)",
                 f"{dt * 1e3:,.0f} ms / build "
                 f"({1e6 / dt / 1e6:,.1f} Msym/s)"))

    # --- distance.rs ----------------------------------------------------
    from rust_bio_tpu.alignment.distance import hamming, levenshtein

    s1 = rng.choice(list(b"ACGT"), size=100).astype("uint8").tobytes()
    s2 = bytearray(s1)
    for p in rng.integers(0, 100, size=30):
        s2[p] = int(rng.choice(list(b"ACGT")))
    s2 = bytes(s2)
    dt = best_of(lambda: [hamming(s1, s2) for _ in range(1000)])
    rows.append(("distance/hamming x1000 (native path)",
                 f"{dt * 1e3:,.2f} ms"))
    dt = best_of(lambda: levenshtein(s1, s2))
    rows.append(("distance/levenshtein (native Myers64)",
                 f"{dt * 1e6:,.0f} us"))

    # --- pairwise.rs / fmindex.rs / pairhmm.rs --------------------------
    rows.append(("pairwise 5.1kb / fmindex / pairhmm",
                 "see bench.py JSON (sw_5kb_*, fm_*, pairhmm_*)"))

    print()
    print("| Reference bench workload | This machine |")
    print("|---|---|")
    for name, val in rows:
        print(f"| {name} | {val} |")


if __name__ == "__main__":
    main()
