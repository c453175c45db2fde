"""Per-stage timing for SmemReadMapper at genome scale (real TPU).

Usage: python scripts/prof_smem50.py [G_mbp]
"""
import sys
import time

import numpy as np


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from rust_bio_tpu.pipelines.read_mapper import SmemReadMapper
    from rust_bio_tpu.alphabets import dna

    G = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 50_000_000
    rng = np.random.default_rng(37)
    genome = rng.choice(list(b"ACGT"), size=G).astype(np.uint8).tobytes()
    t0 = time.perf_counter()
    mapper = SmemReadMapper(genome, min_seed_len=19)
    print(f"build: {time.perf_counter()-t0:.1f}s", flush=True)
    B, L = 1024, 100
    starts = rng.integers(0, G - L, size=B)
    reads = []
    for s in starts:
        r = bytearray(genome[s : s + L])
        for _ in range(2):
            r[int(rng.integers(0, L))] = int(rng.choice(list(b"ACGT")))
        reads.append(bytes(r))
    seqs = [bytes(r) for r in reads]
    rcs = [dna.revcomp(s) for s in seqs]
    ids = [str(i) for i in range(B)]

    out = mapper.map_batch(reads)
    ok = sum(1 for m, s in zip(out, starts) if m.pos == s)
    print("mapped:", ok, "/", B, flush=True)

    def t(fn, n=3):
        ts = []
        for _ in range(n):
            a = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - a)
        return min(ts)

    tot = t(lambda: mapper.map_batch(reads))
    print(f"map_batch total: {tot*1000:.1f} ms -> {B/tot:.0f} reads/s",
          flush=True)

    # stage 1: seed kernel dispatch + pull
    def seed():
        h = mapper._smem_dispatch(seqs)
        np.asarray(h)

    ts1 = t(seed)
    print(f"seed (SMEM kernel + pick + locate, one pull): {ts1*1000:.1f} ms",
          flush=True)

    # stage 2+3: finish = retries + host fallbacks + extend + assemble
    h = mapper._smem_dispatch(seqs)
    np.asarray(h)
    ts2 = t(lambda: mapper._smem_finish(seqs, rcs, ids, h))
    print(f"finish (retries + extend + assemble): {ts2*1000:.1f} ms",
          flush=True)

    # breakdown of finish: count retry/ovf lanes
    packed = np.asarray(h)
    print("found:", int(packed[:, 3].sum()), "ovf:", int(packed[:, 4].sum()),
          flush=True)

    # extension alone
    pos_a, q0_a, ml_a, found_a, ovf_a = packed.T
    picks = {}
    for i in range(B):
        if found_a[i]:
            p, q0, mlen = int(pos_a[i]), int(q0_a[i]), int(ml_a[i])
            n = len(seqs[i])
            if p < G:
                strand, off, gpos = "+", q0, p
            else:
                r0 = p - (G + 1)
                strand = "-"
                off = n - q0 - mlen
                gpos = G - r0 - mlen
            ws = max(gpos - off - mapper.flank, 0)
            we = min(gpos - off + n + mapper.flank, G)
            picks[i] = (strand, ws, we)
    ts3 = t(lambda: mapper._extend(seqs, rcs, ids, picks))
    print(f"extend+assemble alone ({len(picks)} lanes): {ts3*1000:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
