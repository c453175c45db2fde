"""TPU profile: where do the FM search milliseconds go?

Times (a) the full bench path (upload + search + full download),
(b) device-resident patterns + scalar checksum download, and
(c) the fused kernel body alone via repeated invocation.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp


def best_of(f, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    print("backend:", jax.default_backend(), flush=True)
    from rust_bio_tpu.alphabets import dna
    from rust_bio_tpu.data_structures.bwt import bwt
    from rust_bio_tpu.data_structures.fm_device import DeviceFMIndex
    from rust_bio_tpu.data_structures.suffix_array import suffix_array

    rng = np.random.default_rng(11)
    text = rng.choice(list(b"ACGT"), size=100_000).astype(np.uint8).tobytes() + b"$"
    sa = suffix_array(text)
    idx = DeviceFMIndex(bwt(text, sa), dna.n_alphabet())
    print("fused cfg:", idx._fs_cfg, flush=True)
    B, L = 65536, 20
    pats = np.zeros((B, L), dtype=np.uint8)
    starts = rng.integers(0, len(text) - L - 1, size=B)
    tarr = np.frombuffer(text, dtype=np.uint8)
    for i, s in enumerate(starts):
        pats[i] = tarr[s : s + L]
    plens = np.full(B, L, dtype=np.int32)

    # (a) full path: upload + search + download all outputs
    def full():
        pd, ld = jnp.asarray(pats), jnp.asarray(plens)
        out = idx._search_kernel(pd, ld)
        for o in out:
            np.asarray(o)

    full()
    t = best_of(full)
    print(f"(a) upload+search+download-all: {t*1e3:.1f} ms  "
          f"({B/t:,.0f} q/s)", flush=True)

    # (b) device-resident patterns, scalar checksum out
    pd, ld = jnp.asarray(pats), jnp.asarray(plens)

    @jax.jit
    def search_sum(p, l):
        st, lo, up, ml = idx._search_kernel(p, l)
        return st.astype(jnp.int32).sum() + (up - lo).sum()

    def dev_res():
        np.asarray(search_sum(pd, ld))

    dev_res()
    t = best_of(dev_res)
    print(f"(b) device-resident + scalar out: {t*1e3:.1f} ms  "
          f"({B/t:,.0f} q/s)", flush=True)

    # (c) upload-only cost
    def upl():
        jnp.asarray(pats).block_until_ready()

    upl()
    t = best_of(upl)
    print(f"(c) pattern upload alone: {t*1e3:.1f} ms", flush=True)

    # (d) download-only cost of the 4 outputs
    out = idx._search_kernel(pd, ld)

    def dl():
        for o in out:
            np.asarray(o)

    t = best_of(dl)
    print(f"(d) download 4x(B,) outputs: {t*1e3:.1f} ms", flush=True)

    # (e) XLA scan path for comparison, device-resident
    idx2 = DeviceFMIndex(bwt(text, sa), dna.n_alphabet())
    idx2._fs_cfg = None

    @jax.jit
    def search_sum2(p, l):
        st, lo, up, ml = idx2._search_kernel(p, l)
        return st.astype(jnp.int32).sum() + (up - lo).sum()

    def dev_res2():
        np.asarray(search_sum2(pd, ld))

    dev_res2()
    t = best_of(dev_res2)
    print(f"(e) XLA-scan path device-resident: {t*1e3:.1f} ms  "
          f"({B/t:,.0f} q/s)", flush=True)


if __name__ == "__main__":
    main()
