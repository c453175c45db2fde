"""Per-stage TPU timing for the local-mode path (scan / fixups / walk).

Run on the real chip: python scripts/prof_local.py
"""
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
    from functools import partial

    from rust_bio_tpu.alignment.pairwise.batched import (
        _align_batch_device_custom_mp,
        _align_batch_device_global_mp,
        _geometry,
        _init_column,
        _suffix_fixups,
        _pack_rle_custom,
        I32,
    )

    B, M, N = 8192, 150, 150
    rng = np.random.default_rng(7)
    xb = jnp.asarray(rng.integers(0, 4, size=(B, M)).astype(np.uint8) + ord("A"))
    yb = jnp.asarray(rng.integers(0, 4, size=(B, N)).astype(np.uint8) + ord("A"))
    mlens = jnp.full((B,), M, dtype=jnp.int32)
    nlens = jnp.full((B,), N, dtype=jnp.int32)
    pen8_l = jnp.asarray(np.array([-5, -1, 0, 0, 0, 0, 2, -2], np.int32))
    pen8_g = jnp.asarray(
        np.array([-5, -1, -(2**30), -(2**30), -(2**30), -(2**30), 2, -2],
                 np.int32))
    K = 64

    # stage 1: local scan kernel only
    @jax.jit
    def scan_only(xb, yb, mlens, nlens, pen8):
        from rust_bio_tpu.ops.sw_pallas import scan_local_pallas_mp
        out = scan_local_pallas_mp(xb, yb, mlens, nlens, pen8)
        # force all outputs live; reduce to a small sync tensor
        return sum(o.astype(jnp.int32).sum() for o in out)

    # stage 2: scan + fixups (score path)
    @partial(jax.jit, static_argnames=())
    def scan_fix(xb, yb, mlens, nlens, pen8):
        from rust_bio_tpu.ops.sw_pallas import scan_local_pallas_mp
        tb_cols, lx_cols, S_f, I_f, Sn_f, Ly_f, tbk = scan_local_pallas_mp(
            xb, yb, mlens, nlens, pen8)
        rows, row_ge1, mlens_c, is_row_m = _geometry(B, M, mlens)
        pens = tuple(pen8[k] for k in range(6))
        score, tb_col_fixed, Lx_n, lx_n_set = _suffix_fixups(
            S_f, I_f, Sn_f, tbk.astype(jnp.uint16),
            B, M, rows, row_ge1, mlens, mlens_c, is_row_m, pens)
        return score.sum() + tb_cols.astype(jnp.int32).sum() \
            + lx_cols.sum() + Ly_f.sum()

    def timed(fn, label, sync_small=True):
        def run():
            s = None
            for _ in range(K):
                out = fn(xb, yb, mlens, nlens, pen8_l)
                s = out if s is None else s + out
            np.asarray(s)
        run()
        t = best_of(run)
        print(f"{label}: {t/K*1000:.3f} ms/batch  -> {K*B/t:,.0f} aln/s")
        return t

    def timed_dict(fn, label, **kw):
        def run():
            s = None
            for _ in range(K):
                out = fn(xb, yb, mlens, nlens, **kw)
                s = out["score"] if s is None else s + out["score"]
            np.asarray(s)
        run()
        t = best_of(run)
        print(f"{label}: {t/K*1000:.3f} ms/batch  -> {K*B/t:,.0f} aln/s")
        return t

    timed(scan_only, "local scan only")
    timed(scan_fix, "local scan+fixups")
    timed_dict(
        lambda xb, yb, mlens, nlens: _align_batch_device_custom_mp(
            xb, yb, mlens, nlens, pen8_l, local_engine=True,
            with_traceback=False),
        "local score-only path")
    timed_dict(
        lambda xb, yb, mlens, nlens: _align_batch_device_custom_mp(
            xb, yb, mlens, nlens, pen8_l, local_engine=True),
        "local full (scan+fixups+walk)")
    timed_dict(
        lambda xb, yb, mlens, nlens: _align_batch_device_global_mp(
            xb, yb, mlens, nlens, pen8_g),
        "global full (for reference)")
    timed_dict(
        lambda xb, yb, mlens, nlens: _align_batch_device_global_mp(
            xb, yb, mlens, nlens, pen8_g, with_traceback=False),
        "global score-only")


if __name__ == "__main__":
    main()
