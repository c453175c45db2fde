import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from rust_bio_tpu.alignment.pairwise.batched import _align_batch_device_custom_mp, _align_batch_device_global_mp
from rust_bio_tpu.alignment.pairwise.scoring import MIN_SCORE

B, M, N = 8192, 150, 150
rng = np.random.default_rng(7)
xb = jnp.asarray(rng.integers(0, 4, size=(B, M)).astype(np.uint8) + ord("A"))
yb = jnp.asarray(rng.integers(0, 4, size=(B, N)).astype(np.uint8) + ord("A"))
ml = jnp.full((B,), M, jnp.int32); nl = jnp.full((B,), N, jnp.int32)
pen_l = jnp.asarray(np.array([-5,-1,0,0,0,0,2,-2], np.int32))
pen_g = jnp.asarray(np.array([-5,-1]+[MIN_SCORE]*4+[2,-2], np.int32))

def rate(fn, **kw):
    out = fn(xb, yb, ml, nl, **kw)
    np.asarray(jax.tree.leaves(out)[0])
    K = 32
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        s = None
        for _ in range(K):
            o = fn(xb, yb, ml, nl, **kw)
            v = o["score"]
            s = v if s is None else s + v
        np.asarray(s)
        best = min(best, time.perf_counter() - t0)
    return K * B / best

print("local full (scan+walk):  %.0f aln/s" % rate(_align_batch_device_custom_mp, penalties8=pen_l, local_engine=True))
print("local score-only (scan): %.0f aln/s" % rate(_align_batch_device_custom_mp, penalties8=pen_l, local_engine=True, with_traceback=False))
print("global full:             %.0f aln/s" % rate(_align_batch_device_global_mp, penalties8=pen_g))
print("global score-only:       %.0f aln/s" % rate(_align_batch_device_global_mp, penalties8=pen_g, with_traceback=False))
