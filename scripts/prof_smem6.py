"""Device-time split of the SMEM mapper's two big stages at B=8192:
seed = smems-kernel + locate LF-walk; extension = column-RLE kernel +
packed pull + host decode."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from functools import partial
from rust_bio_tpu.pipelines.read_mapper import SmemReadMapper
from rust_bio_tpu.alphabets import dna

rng = np.random.default_rng(29)
G = 1_000_000
genome = rng.choice(list(b"ACGT"), size=G).astype(np.uint8).tobytes()
mapper = SmemReadMapper(genome, min_seed_len=19)
B, L = 8192, 100
starts = rng.integers(0, G - L, size=B)
reads = []
for s in starts:
    r = bytearray(genome[s : s + L])
    for _ in range(2):
        r[int(rng.integers(0, L))] = int(rng.choice(list(b"ACGT")))
    reads.append(bytes(r))
seqs = reads

pb = np.zeros((B, L), np.uint8)
plens = np.zeros(B, np.int32)
for i, p in enumerate(seqs):
    pb[i, : len(p)] = np.frombuffer(p, np.uint8)
    plens[i] = len(p)
iis = np.asarray([max(0, len(s) // 2 - 1) for s in seqs], np.int32)
pb_d, plens_d, iis_d = jnp.asarray(pb), jnp.asarray(plens), jnp.asarray(iis)

idx = mapper.index
fmd = mapper.fmd

@partial(jax.jit, static_argnums=())
def smems_only(fused, fused_rows, pb, plens, iis):
    outs = fmd._smems_impl(fused, fused_rows, pb, plens, iis, 16, 16,
                           jnp.int32(mapper.min_seed_len), True)
    return outs[0][:, 0]  # force materialization of one small slice

def best_of(f, n=3):
    dt = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        dt = min(dt, time.perf_counter() - t0)
    return dt

fr = idx.ensure_row_layout()
r = np.asarray(smems_only(idx._fused, fr, pb_d, plens_d, iis_d))
t = best_of(lambda: np.asarray(smems_only(idx._fused, fr, pb_d, plens_d, iis_d)))
print(f"smems kernel only: {t*1e3:.0f} ms", flush=True)

t = best_of(lambda: np.asarray(mapper._seed_kernel(pb_d, plens_d, iis_d)))
print(f"seed = smems+pick+locate: {t*1e3:.0f} ms", flush=True)

# extension split
packed = np.asarray(mapper._seed_kernel(pb_d, plens_d, iis_d))
pos_a, q0_a, ml_a, found_a, ovf_a = packed.T
rcs = [dna.revcomp(s) for s in seqs]
main_picks = {}
for i in np.nonzero(found_a)[0]:
    i = int(i)
    main_picks[i] = mapper._pick_window(
        len(seqs[i]), int(pos_a[i]), int(q0_a[i]), int(ml_a[i])
    )

metas, handle, fb = mapper._extend_dispatch(seqs, rcs, main_picks)

def kernel_and_pull():
    metas, handle, fb = mapper._extend_dispatch(seqs, rcs, main_picks)
    np.asarray(handle[0])
t = best_of(kernel_and_pull)
print(f"ext dispatch+kernel+pull: {t*1e3:.0f} ms", flush=True)

from rust_bio_tpu.alignment.pairwise.batched import BatchAligner
def decode_only():
    p = BatchAligner.semiglobal_packed_finish(handle)
    p.cigars()
t = best_of(decode_only)
print(f"ext unpack+cigars (host, after pull): {t*1e3:.0f} ms", flush=True)
print(f"packed bytes: {np.asarray(handle[0]).nbytes/1e6:.1f} MB", flush=True)
