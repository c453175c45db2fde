"""Isolated TPU timing for the sweep walks (global vs custom)."""
import time

import numpy as np


def best_of(fn, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from rust_bio_tpu.alignment.pairwise.batched import (
        _align_batch_device_custom_mp,
    )

    B, M, N = 8192, 150, 150
    rng = np.random.default_rng(7)
    xb = jnp.asarray(rng.integers(0, 4, size=(B, M)).astype(np.uint8) + ord("A"))
    yb = jnp.asarray(rng.integers(0, 4, size=(B, N)).astype(np.uint8) + ord("A"))
    mlens = jnp.full((B,), M, dtype=jnp.int32)
    nlens = jnp.full((B,), N, dtype=jnp.int32)
    pen8_l = jnp.asarray(np.array([-5, -1, 0, 0, 0, 0, 2, -2], np.int32))
    K = 64

    # materialize the scan outputs once, then time walks alone via jit'd
    # wrappers over the saved tensors
    from functools import partial
    from rust_bio_tpu.ops.sw_pallas import scan_local_pallas_mp
    from rust_bio_tpu.ops import walk_pallas as wp

    @jax.jit
    def scan(xb, yb, mlens, nlens, pen8):
        return scan_local_pallas_mp(xb, yb, mlens, nlens, pen8)

    tb_cols, lx_cols, S_f, I_f, Sn_f, Ly_f, tbk = scan(
        xb, yb, mlens, nlens, pen8_l)

    # fabricate walk inputs the way _align_batch_device_custom_mp does
    from rust_bio_tpu.alignment.pairwise import batched as bt

    @jax.jit
    def prep(tb_cols, lx_cols, S_f, I_f, Sn_f, Ly_f, tbk, mlens, nlens):
        pens = tuple(pen8_l[k] for k in range(6))
        rows, row_ge1, mlens_c, is_row_m = bt._geometry(B, M, mlens)
        score, tb_col_fixed, Lx_n, lx_n_set = bt._suffix_fixups(
            S_f, I_f, Sn_f, tbk.astype(jnp.uint16),
            B, M, rows, row_ge1, mlens, mlens_c, is_row_m, pens)
        *_, tb_col0, Lx0 = bt._init_column(
            B, M, rows, row_ge1, mlens, nlens, mlens_c, is_row_m, pens)
        tbfix = (tb_col_fixed.astype(bt.I32) & 0xFFF) | (Ly_f << 12)
        lx_n_patched = jnp.where(
            lx_n_set, Lx_n,
            jnp.where(nlens == 0, Lx0,
                      jnp.take_along_axis(
                          jnp.transpose(lx_cols, (1, 0)),
                          jnp.maximum(nlens - 1, 0)[:, None], axis=1)[:, 0]))
        tb_all = jnp.concatenate(
            [jnp.transpose(tb_col0, (1, 0)).astype(jnp.uint16)[None], tb_cols],
            axis=0)
        lx_all = jnp.concatenate([Lx0[None, :], lx_cols], axis=0)
        return tb_all, lx_all, tbfix, lx_n_patched

    tb_all, lx_all, tbfix, lx_n_patched = prep(
        tb_cols, lx_cols, S_f, I_f, Sn_f, Ly_f, tbk, mlens, nlens)
    tb_all = jax.block_until_ready(tb_all)

    @jax.jit
    def walk_custom(tb_all, lx_all, tbfix, lx_n_patched, mlens, nlens):
        out = wp.sweep_walk_custom(
            tb_all, tbfix, lx_all, lx_n_patched, mlens, nlens)
        return sum(o.astype(jnp.int32).sum() for o in out[:5])

    def run_wc():
        s = None
        for _ in range(K):
            out = walk_custom(tb_all, lx_all, tbfix, lx_n_patched, mlens, nlens)
            s = out if s is None else s + out
        np.asarray(s)

    run_wc()
    t = best_of(run_wc)
    print(f"custom walk alone: {t/K*1000:.3f} ms/batch")

    # global walk on a global-mode tb (shape (N, X, B))
    from rust_bio_tpu.ops.sw_pallas import scan_global_pallas_mp

    pen8_g = jnp.asarray(
        np.array([-5, -1, -(2**30), -(2**30), -(2**30), -(2**30), 2, -2],
                 np.int32))

    @jax.jit
    def scang(xb, yb, mlens, nlens, pen8):
        return scan_global_pallas_mp(xb, yb, mlens, nlens, pen8, runs=False)

    g = scang(xb, yb, mlens, nlens, pen8_g)
    tbg = jax.block_until_ready(g[1])

    @jax.jit
    def walk_global(tbg, mlens, nlens):
        out = wp.sweep_walk_global(tbg, mlens, nlens)
        return sum(o.astype(jnp.int32).sum() for o in out)

    def run_wg():
        s = None
        for _ in range(K):
            out = walk_global(tbg, mlens, nlens)
            s = out if s is None else s + out
        np.asarray(s)

    run_wg()
    t = best_of(run_wg)
    print(f"global walk alone: {t/K*1000:.3f} ms/batch")


if __name__ == "__main__":
    main()
