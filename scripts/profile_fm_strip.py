"""Isolate the fused FM kernel's cost center: run stripped kernel variants
(same grid/DMA, parts of the step removed) at bench shapes."""

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

I32 = jnp.int32
BF16 = jnp.bfloat16


def best_of(f, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def make_kernel(mode, L, WPR, SWT_PAD, n):
    log2_wpr = WPR.bit_length() - 1

    def kern(symcols_ref, lesscols_ref, basecols_ref, plens_ref,
             Tt_ref, status_out, lower_out, upper_out, mlen_out):
        QTB = plens_ref.shape[1]
        Q2 = 2 * QTB
        plens = plens_ref[:]
        rows_iota = jax.lax.broadcasted_iota(I32, (SWT_PAD, Q2), 0)
        wiota = jax.lax.broadcasted_iota(I32, (1, WPR, Q2), 1)
        Tt = Tt_ref[:]

        def swar(v):
            v = v - ((v >> 1) & 0x55555555)
            v = (v & 0x33333333) + ((v >> 2) & 0x33333333)
            v = (v + (v >> 4)) & 0x0F0F0F0F
            return (v + (v >> 8) + (v >> 16) + (v >> 24)) & 0x3F

        def step(t, st):
            l, r, mlen, done = st
            sym = symcols_ref[t : t + 1, :]
            less_a = lesscols_ref[t : t + 1, :]
            base_v = basecols_ref[t : t + 1, :]
            active = (t < plens) & (done == 0)
            valid = sym >= 0

            pos2 = jnp.concatenate([r, l - 1], axis=1)
            posc = jnp.maximum(pos2, 0)
            w = posc >> 5
            bitpos = posc & 31
            row = jnp.concatenate([base_v, base_v], axis=1) + (w >> log2_wpr)
            cw = w & (WPR - 1)

            if mode == "full" or mode == "noselect" or mode == "nopop":
                onehot = (rows_iota == row).astype(BF16)
                R = jax.lax.dot_general(
                    Tt, onehot, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            if mode == "full" or mode == "nopop":
                sel = jnp.sum(
                    jnp.where(wiota == cw.reshape(1, 1, Q2),
                              R.reshape(7, WPR, Q2), 0.0),
                    axis=1,
                ).astype(I32)
            elif mode == "noselect":
                sel = R[:7].astype(I32)  # skip the WPR column select
            else:  # nomatmul: fabricate sel from cheap ops
                sel = jnp.broadcast_to(
                    (row + cw).astype(I32), (7, Q2)
                )

            ck = sel[0:1] + (sel[1:2] << 8) + (sel[2:3] << 16)
            word = sel[3:4] | (sel[4:5] << 8) | (sel[5:6] << 16) | (sel[6:7] << 24)
            if mode == "nopop":
                cnt = ck + (word & 1)
            else:
                mask = jnp.where(
                    bitpos == 31, jnp.int32(-1),
                    (jnp.int32(1) << jnp.minimum(bitpos + 1, 31)) - 1,
                )
                cnt = ck + swar(word & mask)
            rank2 = jnp.where(pos2 < 0, 0, cnt)

            occ_r = jnp.where(valid, rank2[:, :QTB], 0)
            occ_lm1 = jnp.where((l > 0) & valid, rank2[:, QTB:], 0)
            l_new = less_a + occ_lm1
            r_new = less_a + occ_r - 1
            fail = (occ_r == 0) | (l_new > r_new)
            upd = active & ~fail
            return (
                jnp.where(upd, l_new, l),
                jnp.where(upd, r_new, r),
                jnp.where(upd, mlen + 1, mlen),
                jnp.where(active & fail, 1, done),
            )

        QTB = plens_ref.shape[1]
        zeros = jnp.zeros((1, QTB), I32)
        st = (zeros, jnp.full((1, QTB), n - 1, I32), zeros, zeros)
        for t in range(L):
            st = step(t, st)
        l, r, mlen, _ = st
        status_out[:] = mlen
        lower_out[:] = l
        upper_out[:] = r + 1
        mlen_out[:] = mlen

    return kern


def run(mode, n=100_001, wpr=32, qtb=512, B=65536, L=20):
    nw = -(-n // 32)
    G = -(-nw // wpr)
    swt_pad = -(-((5 + 1) * G) // 128) * 128
    rng = np.random.default_rng(0)
    Tt = rng.integers(0, 255, size=(7 * wpr, swt_pad)).astype(np.float32)
    sym = rng.integers(0, 4, size=(L, B)).astype(np.int32)
    less = rng.integers(0, 100, size=(L, B)).astype(np.int32)
    basec = (sym * G).astype(np.int32)
    plens = np.full(B, L, np.int32)

    kern = make_kernel(mode, L, wpr, swt_pad, n)
    grid = (B // qtb,)

    @jax.jit
    def f(s, le, b, p, T):
        outs = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((L, qtb), lambda q: (0, q)),
                pl.BlockSpec((L, qtb), lambda q: (0, q)),
                pl.BlockSpec((L, qtb), lambda q: (0, q)),
                pl.BlockSpec((1, qtb), lambda q: (0, q)),
                pl.BlockSpec((7 * wpr, swt_pad), lambda q: (0, 0)),
            ],
            out_specs=[pl.BlockSpec((1, qtb), lambda q: (0, q))
                       for _ in range(4)],
            out_shape=[jax.ShapeDtypeStruct((1, B), jnp.int32)
                       for _ in range(4)],
        )(s, le, b, p.reshape(1, B), T)
        return sum(o.sum() for o in outs)

    args = [jnp.asarray(a) for a in (sym, less, basec, plens)]
    Td = jnp.asarray(Tt.astype(jnp.bfloat16))
    np.asarray(f(*args, Td))
    t = best_of(lambda: np.asarray(f(*args, Td)))
    print(f"mode={mode:10s}: {t*1e3:7.1f} ms ({B/t:,.0f} q/s)", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    for mode in ("full", "nopop", "noselect", "nomatmul"):
        run(mode)


if __name__ == "__main__":
    main()


def run_state8(n=100_001, qtb=1024, B=65536, L=20, QR=8):
    """Theory probe: same per-query state ops but shaped (QR, qtb) —
    QR*qtb queries per tile, no rank lookup at all."""
    rng = np.random.default_rng(0)
    sym = rng.integers(0, 4, size=(L * QR, qtb)).astype(np.int32)
    less = rng.integers(0, 100, size=(L * QR, qtb)).astype(np.int32)
    plens = np.full((QR, qtb), L, np.int32)
    grid = (B // (QR * qtb),)

    def kern(symcols_ref, lesscols_ref, plens_ref, lower_out, upper_out):
        plens = plens_ref[:]

        def step(t, st):
            l, r, mlen, done = st
            sym = symcols_ref[t * QR : (t + 1) * QR, :]
            less_a = lesscols_ref[t * QR : (t + 1) * QR, :]
            active = (t < plens) & (done == 0)
            valid = sym >= 0
            # stand-in for the rank result: cheap elementwise mix
            rank_r = (r ^ (r >> 3)) + sym
            rank_l = (l ^ (l >> 5)) + sym
            occ_r = jnp.where(valid, rank_r, 0)
            occ_lm1 = jnp.where((l > 0) & valid, rank_l, 0)
            l_new = less_a + occ_lm1
            r_new = less_a + occ_r - 1
            fail = (occ_r == 0) | (l_new > r_new)
            upd = active & ~fail
            return (
                jnp.where(upd, l_new, l),
                jnp.where(upd, r_new, r),
                jnp.where(upd, mlen + 1, mlen),
                jnp.where(active & fail, 1, done),
            )

        zeros = jnp.zeros((QR, qtb), I32)
        st = (zeros, jnp.full((QR, qtb), n - 1, I32), zeros, zeros)
        for t in range(L):
            st = step(t, st)
        l, r, mlen, _ = st
        lower_out[:] = l
        upper_out[:] = r + 1

    @jax.jit
    def f(s, le, p):
        outs = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((L * QR, qtb), lambda q: (q, 0)),
                pl.BlockSpec((L * QR, qtb), lambda q: (q, 0)),
                pl.BlockSpec((QR, qtb), lambda q: (q, 0)),
            ],
            out_specs=[pl.BlockSpec((QR, qtb), lambda q: (q, 0))
                       for _ in range(2)],
            out_shape=[
                jax.ShapeDtypeStruct((B // qtb, qtb), jnp.int32)
                for _ in range(2)
            ],
        )(s, le, p)
        return sum(o.sum() for o in outs)

    # replicate inputs per tile (timing only)
    nt = grid[0]
    sbig = np.tile(sym, (nt, 1))
    lbig = np.tile(less, (nt, 1))
    pbig = np.tile(plens, (nt, 1))
    args = [jnp.asarray(a) for a in (sbig, lbig, pbig)]
    np.asarray(f(*args))
    t = best_of(lambda: np.asarray(f(*args)))
    print(f"state8 QR={QR}: {t*1e3:7.1f} ms ({B/t:,.0f} q/s)", flush=True)


def main2():
    print("backend:", jax.default_backend(), flush=True)
    for qr in (8, 32):
        run_state8(QR=qr)


if __name__ == "__main__" and True:
    main2()
