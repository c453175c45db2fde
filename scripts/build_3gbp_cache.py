"""One-time, resumable 3.1 Gbp human-genome-scale FM cache build.

Stages checkpoint to .bench_cache/ so an interrupted build resumes where
it stopped (VERDICT r4 #3: the SAIS->BWT->planes->LUT pipeline as
separate restartable stages):

  1. fm_3gbp_sa.u32.bin   — u8/u32 native SAIS (sais_top_u8_u32)
  2. fm_3gbp_bwt.bin      — BWT from the SA (chunked gather)
  3. fm_3gbp_v1.npz       — packed bit-planes + checkpoints + q=12 LUT
  4. fm_3gbp_patsfull.npy / fm_3gbp_pats.bin — query substrings

Runs on the CPU backend on purpose: jnp buffers stay host-side, so the
build never touches (or OOMs) the TPU while a bench run is in flight.
"""

import os
import sys
import time

# hard overrides, not setdefault: the harness presets both, and the axon
# sitecustomize registers the TPU backend first if the pool IPs survive
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

G = 3_100_000_000
SEED = 71
CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".bench_cache",
)
SA_PATH = os.path.join(CACHE, "fm_3gbp_sa.u32.bin")
BWT_PATH = os.path.join(CACHE, "fm_3gbp_bwt.bin")
NPZ_PATH = os.path.join(CACHE, "fm_3gbp_v1.npz")
PATS_FULL = os.path.join(CACHE, "fm_3gbp_patsfull.npy")
PATS_BIN = os.path.join(CACHE, "fm_3gbp_pats.bin")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def rss_gb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1e6
    return 0.0


def dna_text() -> bytes:
    rng = np.random.default_rng(SEED)
    lut = np.frombuffer(b"ACGT", np.uint8)
    return lut[rng.integers(0, 4, size=G, dtype=np.uint8)].tobytes() + b"$"


def main():
    os.makedirs(CACHE, exist_ok=True)
    t_all = time.time()

    if not os.path.exists(BWT_PATH):
        text = dna_text()
        log(f"text ready ({rss_gb():.1f} GB RSS)")
        if not os.path.exists(SA_PATH):
            from rust_bio_tpu import native
            from rust_bio_tpu.alphabets import Alphabet
            from rust_bio_tpu.data_structures.suffix_array import (
                _sentinel_count,
                transform_text,
            )
            from rust_bio_tpu.utils.text import to_array

            arr = to_array(text)
            alphabet = Alphabet(text)  # no .tobytes() copy at 3.1 GB
            tr = transform_text(arr, alphabet, _sentinel_count(arr))
            del arr
            t0 = time.time()
            sa = native.sais_u32(tr, int(tr.max()) + 1)
            assert sa is not None and sa.dtype == np.uint32
            log(
                f"SAIS u8/u32 done in {time.time() - t0:.0f}s "
                f"(peak RSS {rss_gb():.1f} GB)"
            )
            del tr
            tmp = SA_PATH + ".tmp"
            sa.tofile(tmp)
            os.replace(tmp, SA_PATH)
            log(f"SA checkpointed to {SA_PATH}")
        else:
            sa = np.fromfile(SA_PATH, dtype=np.uint32)
            log("SA loaded from checkpoint")
        from rust_bio_tpu.data_structures.bwt import bwt

        t0 = time.time()
        b = bwt(text, sa)
        del sa, text
        log(f"BWT done in {time.time() - t0:.0f}s ({rss_gb():.1f} GB RSS)")
        tmp = BWT_PATH + ".tmp"
        b.tofile(tmp)
        os.replace(tmp, BWT_PATH)
        log(f"BWT checkpointed to {BWT_PATH}")
        del b
        import gc

        gc.collect()

    if not os.path.exists(NPZ_PATH):
        import jax

        # the axon sitecustomize registers the TPU backend at interpreter
        # startup, before this script body runs — the env vars alone are
        # not enough (CLAUDE.md "Environment gotchas")
        jax.config.update("jax_platforms", "cpu")
        assert jax.default_backend() == "cpu", "build must stay off the TPU"
        from rust_bio_tpu.alphabets import dna
        from rust_bio_tpu.data_structures.fm_device import DeviceFMIndex
        from rust_bio_tpu.data_structures.serialize import save_fm_index

        b = np.fromfile(BWT_PATH, dtype=np.uint8)
        t0 = time.time()
        idx = DeviceFMIndex(b, dna.n_alphabet())
        assert idx._big, "3.1 Gbp must take the u32 kernels"
        del b
        log(f"bit-planes done in {time.time() - t0:.0f}s ({rss_gb():.1f} GB)")
        t0 = time.time()
        idx.build_kmer_lut(q=12)
        log(f"q=12 LUT done in {time.time() - t0:.0f}s ({rss_gb():.1f} GB)")
        t0 = time.time()
        tmp = NPZ_PATH + ".build.npz"
        save_fm_index(tmp, idx, compress=False)
        os.replace(tmp, NPZ_PATH)
        log(f"index serialized in {time.time() - t0:.0f}s -> {NPZ_PATH}")
        del idx

    if not os.path.exists(PATS_FULL):
        text = dna_text()
        rng = np.random.default_rng(27)
        B, L = 65536, 20
        starts = rng.integers(0, G - L - 1, size=B)
        tarr = np.frombuffer(text, dtype=np.uint8)
        pats = tarr[starts[:, None] + np.arange(L)[None, :]]
        np.save(PATS_FULL, pats)
        pats[:16384].tofile(PATS_BIN)
        log("query substrings persisted")

    log(f"3 Gbp cache complete in {time.time() - t_all:.0f}s total")


if __name__ == "__main__":
    main()
