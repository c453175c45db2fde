import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from rust_bio_tpu.alignment.pairwise.banded_device import (
    BatchBandedAligner, _align_batch_device_banded_mp, _unpack_banded,
    _decode_ops_batch,
)
from rust_bio_tpu.alignment.pairwise.scoring import Scoring
from rust_bio_tpu import native as _native

rng = np.random.default_rng(31)
B, M, N = 1024, 150, 20_000
sc = Scoring.from_scores(-5, -1, 2, -2)
xs, ys = [], []
for _ in range(B):
    y = rng.choice(list(b"ACGT"), size=N).astype(np.uint8).tobytes()
    s = int(rng.integers(0, N - M))
    x = bytearray(y[s : s + M])
    for _ in range(4):
        x[int(rng.integers(0, M))] = int(rng.choice(list(b"ACGT")))
    xs.append(bytes(x)); ys.append(y)

xb_h = np.frombuffer(b"".join(xs), np.uint8).reshape(B, M)
yb_h = np.frombuffer(b"".join(ys), np.uint8).reshape(B, N)
ml = np.full(B, M, np.int64); nl = np.full(B, N, np.int64)
clips = (-858993459, -858993459, 0, 0)

def bob(f, n=3):
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter(); f(); best = min(best, time.perf_counter()-t0)
    return best*1e3

print("band batch (4thr): %.1f ms" % bob(lambda: _native.band_build_batch(xb_h, ml, yb_h, nl, 8, 8, clips, 2, 5, 1)))
print("band batch (1thr): %.1f ms" % bob(lambda: _native.band_build_batch(xb_h, ml, yb_h, nl, 8, 8, clips, 2, 5, 1, nthreads=1)))

# device inputs exactly as _run builds them
starts_all, ends_all, cells, jwin = _native.band_build_batch(xb_h, ml, yb_h, nl, 8, 8, clips, 2, 5, 1)
j0, j1 = jwin[:,0], jwin[:,1]
c0s = np.maximum(j0-1, 0)
tail = nl - j1
e = np.where(tail==0, 0, np.where(tail%2==1, 1, 2))
nle = j1 - c0s + e
Nc = max(8, 1 << (int(nle.max())-1).bit_length())
xb = xb_h
yidx = np.minimum(c0s[:,None]+np.arange(Nc)[None,:], N-1)
ymask = np.arange(Nc)[None,:] < nle[:,None]
yb = np.where(ymask, yb_h[np.arange(B)[:,None], yidx], 0).astype(np.uint8)
bidx2 = np.minimum(c0s[:,None]+np.arange(Nc+1)[None,:], N)
win = np.minimum(nle, nl-c0s)+1
bmask = np.arange(Nc+1)[None,:] < win[:,None]
starts = np.where(bmask, starts_all[np.arange(B)[:,None], bidx2], M+1).astype(np.int32)
ends = np.where(bmask, ends_all[np.arange(B)[:,None], bidx2], 0).astype(np.int32)
mlens = ml.astype(np.int32); nlens = nle.astype(np.int32)
pen8 = np.array([-5,-1,-858993459,-858993459,0,0,2,-2], np.int32)

def pack_and_upload():
    yidx = np.minimum(c0s[:,None]+np.arange(Nc)[None,:], N-1)
    ymask = np.arange(Nc)[None,:] < nle[:,None]
    yb = np.where(ymask, yb_h[np.arange(B)[:,None], yidx], 0).astype(np.uint8)
    bidx2 = np.minimum(c0s[:,None]+np.arange(Nc+1)[None,:], N)
    bmask = np.arange(Nc+1)[None,:] < win[:,None]
    st = np.where(bmask, starts_all[np.arange(B)[:,None], bidx2], M+1).astype(np.int32)
    en = np.where(bmask, ends_all[np.arange(B)[:,None], bidx2], 0).astype(np.int32)
    return [jnp.asarray(a) for a in (xb, yb, mlens, nlens, pen8, st, en)]
print("host pack+upload(async): %.1f ms" % bob(pack_and_upload))

args = pack_and_upload()
# score only (kernel scan + fixups)
o = _align_batch_device_banded_mp(*args, with_traceback=False)
np.asarray(o["score"])
def so():
    o = _align_batch_device_banded_mp(*args, with_traceback=False)
    np.asarray(o["score"])
print("device score-only (scan+fixups): %.1f ms" % bob(so))

o = _align_batch_device_banded_mp(*args)
np.asarray(o["packed_banded"])
def full():
    o = _align_batch_device_banded_mp(*args)
    np.asarray(o["packed_banded"])
print("device full (scan+fixups+walk+pull): %.1f ms" % bob(full))

packed = np.asarray(_align_batch_device_banded_mp(*args)["packed_banded"])
sc_, up = _unpack_banded(packed)
def dec():
    s, u = _unpack_banded(packed)
    _decode_ops_batch(u["op_codes"], u["op_lens"])
print("host unpack+batch decode: %.1f ms" % bob(dec))
