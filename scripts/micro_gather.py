"""Micro-bench: per-step walk gather layouts on TPU.

a) (B, X) u16 take_along_axis axis=1  (lane-major; current walk form)
b) (X, B) u16 take_along_axis axis=0  (kernel-native; avoids the transpose)
c) transpose (Np, Mp1, B) u16 -> (B, Mp1, Np)
"""

import os, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

B, M, N = 8192, 150, 150
X = (M + 1) * (N + 1)
rng = np.random.default_rng(0)
tb_bx = jnp.asarray(rng.integers(0, 2**16, size=(B, X)).astype(np.uint16))
tb_xb = jnp.asarray(np.ascontiguousarray(np.asarray(tb_bx).T))
idx0 = jnp.asarray(rng.integers(0, X, size=B).astype(np.int32))
tb3 = jnp.asarray(rng.integers(0, 2**16, size=(N, M + 1, B)).astype(np.uint16))

T = M + N + 8


@jax.jit
def walk_bx(tb, idx):
    def step(i, _):
        cell = jnp.take_along_axis(tb, i[:, None], axis=1)[:, 0]
        i = (i + cell.astype(jnp.int32)) % X
        return i, cell

    i, cells = jax.lax.scan(step, idx, None, length=T)
    return cells.sum()


@jax.jit
def walk_xb(tb, idx):
    def step(i, _):
        cell = jnp.take_along_axis(tb, i[None, :], axis=0)[0]
        i = (i + cell.astype(jnp.int32)) % X
        return i, cell

    i, cells = jax.lax.scan(step, idx, None, length=T)
    return cells.sum()


@jax.jit
def do_T(tb3):
    return jnp.transpose(tb3, (2, 1, 0)).sum(axis=(1, 2))


def t(fn, *a, n=10):
    np.asarray(fn(*a))
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best


print(f"walk (B,X) axis1 {t(walk_bx, tb_bx, idx0)*1e3:8.1f} ms", flush=True)
print(f"walk (X,B) axis0 {t(walk_xb, tb_xb, idx0)*1e3:8.1f} ms", flush=True)
print(f"transpose NMB->BMN {t(do_T, tb3)*1e3:8.1f} ms", flush=True)
