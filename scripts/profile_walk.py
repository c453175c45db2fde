"""Profile the full-traceback pipeline split: scan vs tb-assembly vs walk."""

import os, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

from rust_bio_tpu.alignment.pairwise import batched as bt
from rust_bio_tpu.ops.sw_pallas import scan_columns_pallas_mp

B, L = 8192, 150
rng = np.random.default_rng(0)
xb = rng.integers(0, 4, size=(B, L)).astype(np.uint8) + 65
yb = rng.integers(0, 4, size=(B, L)).astype(np.uint8) + 65
mlens = np.full(B, L, np.int32)
nlens = np.full(B, L, np.int32)
pen8 = np.array([-5, -1, 0, 0, 0, 0, 1, -1], np.int32)


@partial(jax.jit, static_argnames=("stage",))
def probe(xb, yb, mlens, nlens, penalties8, stage: str):
    B, M = xb.shape
    N = yb.shape[1]
    pens = tuple(penalties8[k] for k in range(6))
    rows, row_ge1, mlens_c, is_row_m = bt._geometry(B, M, mlens)
    S0, D0, s_bits0, Sn0, Ly0, tb_col0, Lx0 = bt._init_column(
        B, M, rows, row_ge1, mlens, nlens, mlens_c, is_row_m, pens
    )
    eq_nbm = (jnp.swapaxes(yb, 0, 1)[:, :, None] == xb[None, :, :]).astype(jnp.uint8)
    scan_out = scan_columns_pallas_mp(
        eq_nbm, S0, D0, s_bits0, Sn0, Ly0, tb_col0, mlens, nlens, penalties8
    )
    S_f, I_f, Sn_f, Ly_f, tb_f, tb_cols, Lx_cols = scan_out
    score, tb_col_fixed, Lx_n, lx_n_set = bt._suffix_fixups(
        S_f, I_f, Sn_f, tb_f, B, M, rows, row_ge1, mlens, mlens_c, is_row_m, pens
    )
    if stage == "scan":
        return score
    tb_full = jnp.concatenate(
        [tb_col0[:, :, None], jnp.moveaxis(tb_cols, 0, 2)], axis=2
    )
    bidx = jnp.arange(B)
    tb_full = tb_full.at[
        bidx[:, None], jnp.arange(M + 1)[None, :], nlens[:, None]
    ].set(tb_col_fixed)
    Lx_full = jnp.concatenate([Lx0[:, None], jnp.moveaxis(Lx_cols, 0, 1)], axis=1)
    Lx_full = Lx_full.at[bidx, nlens].set(
        jnp.where(lx_n_set, Lx_n, Lx_full[bidx, nlens])
    )
    if stage == "asm":
        return score + tb_full[:, 0, 0].astype(jnp.int32) + Lx_full[:, 0]
    out = bt._walk(tb_full, Lx_full, Ly_f, mlens, nlens, B, M, N)
    return out["op_codes"].sum(0).astype(jnp.int32) + score


def timeit(stage, n=10):
    a = probe(xb, yb, mlens, nlens, pen8, stage)
    np.asarray(a)  # warm + sync
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(probe(xb, yb, mlens, nlens, pen8, stage))
        best = min(best, time.perf_counter() - t0)
    return best


for stage in ("scan", "asm", "walk"):
    print(f"{stage:5s} {timeit(stage)*1e3:8.1f} ms", flush=True)


def timeit_fn(fn, n=10):
    np.asarray(jax.tree.leaves(fn())[0])
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(jax.tree.leaves(fn())[0])
        best = min(best, time.perf_counter() - t0)
    return best


from rust_bio_tpu.alignment.pairwise.batched import (
    _align_batch_device_global_mp,
)

pen8g = np.array(
    [-5, -1] + [-858_993_459] * 4 + [1, -1], np.int32
)
args = (jnp.asarray(xb), jnp.asarray(yb), jnp.asarray(mlens), jnp.asarray(nlens), jnp.asarray(pen8g))
t_scoreonly = timeit_fn(lambda: _align_batch_device_global_mp(*args, with_traceback=False))
print(f"g-scan {t_scoreonly*1e3:8.1f} ms", flush=True)
t_full = timeit_fn(lambda: _align_batch_device_global_mp(*args, with_traceback=True))
print(f"g-full {t_full*1e3:8.1f} ms  ({B/t_full:,.0f} aln/s)", flush=True)


@partial(jax.jit, static_argnames=("stage",))
def probe_g(xb, yb, mlens, nlens, pen8g, stage: str):
    from rust_bio_tpu.ops.sw_pallas import scan_global_pallas_mp

    B, M = xb.shape
    N = yb.shape[1]
    pens = tuple(pen8g[k] for k in range(6))
    score, tb_cols, _tbk = scan_global_pallas_mp(xb, yb, mlens, nlens, pen8g)
    if stage == "scan":
        return score
    rows, row_ge1, mlens_c, is_row_m = bt._geometry(B, M, mlens)
    *_, tb_col0, _Lx0 = bt._init_column(
        B, M, rows, row_ge1, mlens, nlens, mlens_c, is_row_m, pens
    )
    tb_xb = jnp.concatenate(
        [jnp.transpose(tb_col0, (1, 0))[None], tb_cols], axis=0
    ).reshape(-1, B)
    if stage == "asm":
        return score + tb_xb[0].astype(jnp.int32) + tb_xb[-1].astype(jnp.int32)
    out = bt._walk_global(tb_xb, mlens, nlens, B, M, N)
    return out["op_codes"].sum(0).astype(jnp.int32) + score


def timeit_g(stage, n=10):
    ja = (jnp.asarray(xb), jnp.asarray(yb), jnp.asarray(mlens), jnp.asarray(nlens), jnp.asarray(pen8g))
    np.asarray(probe_g(*ja, stage))
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(probe_g(*ja, stage))
        best = min(best, time.perf_counter() - t0)
    return best


for stage in ("scan", "asm", "walk"):
    print(f"g-{stage:5s} {timeit_g(stage)*1e3:8.1f} ms", flush=True)
