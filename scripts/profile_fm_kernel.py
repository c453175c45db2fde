"""Sweep the fused FM kernel's (wpr, qtb) and strip stages to find where
the time goes.  Synthetic table, bench shapes (B=65536, L=20, n=100k)."""

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from rust_bio_tpu.ops import fm_pallas


def best_of(f, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def run_cfg(bits, ckpt, n, wpr, qtb, B=65536, L=20):
    Tt, base, swt_pad = fm_pallas.build_search_table(bits, ckpt, wpr)
    rng = np.random.default_rng(0)
    sym = rng.integers(0, 4, size=(L, B)).astype(np.int32)
    less = rng.integers(0, n, size=(L, B)).astype(np.int32) % 100
    basec = np.asarray(base)[sym]
    plens = np.full(B, L, np.int32)
    args = [jnp.asarray(a) for a in (sym, less, basec, plens)]
    Ttd = jnp.asarray(Tt)

    @jax.jit
    def f(s, le, b, p):
        st, lo, up, ml = fm_pallas.backward_search_fused(
            s, le, b, p, Ttd, n=n, wpr=wpr, swt_pad=swt_pad, qtb=qtb
        )
        return st.sum() + lo.sum() + up.sum() + ml.sum()

    out = f(*args)
    np.asarray(out)
    t = best_of(lambda: np.asarray(f(*args)))
    print(
        f"wpr={wpr:4d} qtb={qtb:5d} swt_pad={swt_pad:5d}: {t*1e3:7.1f} ms "
        f"({B/t:,.0f} q/s)",
        flush=True,
    )
    return t


def main():
    print("backend:", jax.default_backend(), flush=True)
    n = 100_001
    nw = -(-n // 32)
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 1 << 32, size=(5, nw), dtype=np.uint64).astype(
        np.uint32
    )
    # make bitplanes disjoint-ish; ckpt = running popcount (exclusive)
    ckpt = np.zeros((5, nw), np.int32)
    for s in range(5):
        pc = np.unpackbits(
            bits[s].view(np.uint8).reshape(nw, 4), axis=1
        ).sum(axis=1)
        ckpt[s] = np.concatenate([[0], np.cumsum(pc)[:-1]]).astype(np.int32)

    for wpr in (32, 64, 128):
        for qtb in (256, 512, 1024, 2048):
            try:
                cfg = fm_pallas.fused_search_feasible(n, nw)
                # bypass feasibility; test raw
                run_cfg(bits, ckpt, n, wpr, qtb)
            except Exception as e:
                print(f"wpr={wpr} qtb={qtb}: FAILED {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    main()
