"""Pallas TPU kernel: fused FM-index backward search (MXU rank path).

The XLA MXU rank path (fm_device._rank_mxu) materializes a (Q, SWt) one-hot
and a (Q, 896) f32 rank-result in HBM on every pattern step — ~2.5 ms/step of
pure HBM traffic at Q = 128K.  This kernel runs the WHOLE backward search
(fmindex.rs:144-208 semantics, bit-identical to fm_device._search_kernel's
lax.scan) inside one Pallas invocation per query tile:

  - the byte-plane table lives in VMEM (one DMA per tile),
  - the per-step one-hot is built in VMEM and consumed immediately by a
    lane-major MXU matmul  T_t (7*WPR, SWt) @ onehot (SWt, 2*QTB),
  - popcount is SWAR int32 arithmetic (Mosaic has no population_count),
  - the (l, r, matched, flags) state stays in registers across the
    pattern-step fori loop — no HBM intermediates at all.

Table layout (built host-side in numpy): the BWT bit-planes are packed into
32-bit words; each table *row group* covers WPR consecutive words of one
symbol.  For word w of symbol s, table row = base[s] + w // WPR, and its
7 byte-planes (3 exclusive-checkpoint bytes for n < 2^24, then the 4 word
bytes) sit at columns  p * WPR + (w % WPR).  Byte values are exact in bf16
and a one-hot column selects a single product, so the MXU matmul is
bit-exact.  Symbols absent from the text share one zero row group.

Reference: fmindex.rs:144-208 (backward_search incl. the occ_r == 0
underflow guard of issue #606), bwt.rs:129-182 (Occ::get).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

I32 = jnp.int32
BF16 = jnp.bfloat16

# status codes (shared with fm_device)
ABSENT, PARTIAL, COMPLETE = 0, 1, 2

_VMEM_BUDGET = 12 * 2**20


def build_search_table(bits: np.ndarray, ckpt: np.ndarray, wpr: int):
    """Byte-plane table for the fused kernel.

    ``bits``/``ckpt``: (S, nw) uint32 / int32 per-symbol bit-planes and
    exclusive word checkpoints (fm_device._pack_bitplanes layout).

    Returns (T_t (7*wpr, swt_pad) bf16 ndarray, base (S,) int32, swt_pad).
    """
    S, nw = bits.shape
    present = bits.any(axis=1)
    order = np.nonzero(present)[0]
    G = -(-nw // wpr)
    n_groups = (len(order) + 1) * G  # + shared zero group for absent syms
    swt_pad = -(-n_groups // 128) * 128

    base = np.full(S, len(order) * G, np.int32)  # absent -> zero rows
    base[order] = np.arange(len(order), dtype=np.int32) * G

    T = np.zeros((swt_pad, 7 * wpr), np.uint8)
    pad = G * wpr - nw
    for oi, s in enumerate(order):
        bp = np.pad(bits[s], (0, pad)).reshape(G, wpr)
        cp = np.pad(ckpt[s].astype(np.uint32), (0, pad)).reshape(G, wpr)
        rows = slice(oi * G, (oi + 1) * G)
        for p in range(3):
            T[rows, p * wpr : (p + 1) * wpr] = (cp >> (8 * p)) & 0xFF
        for p in range(4):
            T[rows, (3 + p) * wpr : (4 + p) * wpr] = (bp >> (8 * p)) & 0xFF
    return np.ascontiguousarray(T.T).astype(jnp.bfloat16), base, swt_pad


def fused_search_feasible(n: int, nw: int):
    """Pick (wpr, qtb) for a text of n symbols / nw packed words, or None.

    The one-hot matmul retrieves a full WPR-word row group per query, so
    smaller WPR shrinks VPU column-select work but grows the one-hot height
    (SWt).  FLOPs are O(SWt * WPR) = O(nw) per query either way; past a few
    Mbp the table scan loses to the gather path and we bail out.
    """
    if n >= (1 << 23):  # 3-byte checkpoints
        return None
    best = None
    for wpr in (32, 64, 128):
        G = -(-nw // wpr)
        # worst-case 6 present symbol groups (DNA + sentinel + one more)
        swt = -(-(7 * G) // 128) * 128
        if swt > 4096:
            continue
        for qtb in (1024, 512, 256):
            q2 = 2 * qtb
            est = (
                swt * q2 * (2 + 4)  # one-hot bf16 + its iota/compare i32
                + 7 * wpr * q2 * 4 * 2  # R f32 + select temporaries
                + 7 * wpr * swt * 2  # table
                + 24 * q2 * 4  # state/word/mask temporaries
            )
            if est > _VMEM_BUDGET:
                continue
            # prefer the smallest table scan cost, then larger tiles
            cost = swt * wpr  # ∝ per-query FLOPs
            key = (cost, -qtb)
            if best is None or key < best[0]:
                best = (key, wpr, qtb)
            break  # larger qtb found for this wpr
    if best is None:
        return None
    return best[1], best[2]


def _swar_popcount(v):
    """Branch-free popcount of an int32 vector (SWAR, sign-safe)."""
    v = v - ((v >> 1) & 0x55555555)
    v = (v & 0x33333333) + ((v >> 2) & 0x33333333)
    v = (v + (v >> 4)) & 0x0F0F0F0F
    return (v + (v >> 8) + (v >> 16) + (v >> 24)) & 0x3F


def _kernel_fm_search(
    symcols_ref,  # (L, QTB) int32: right-aligned symbol index per step
    lesscols_ref,  # (L, QTB) int32: less[sym] per step
    basecols_ref,  # (L, QTB) int32: table row base per step (prep-hoisted)
    plens_ref,  # (1, QTB) int32
    Tt_ref,  # (7*WPR, SWT_PAD) bf16
    status_out,  # (1, QTB) int32
    lower_out,
    upper_out,
    mlen_out,
    *,
    L: int,
    WPR: int,
    SWT_PAD: int,
    n: int,
):
    QTB = plens_ref.shape[1]
    Q2 = 2 * QTB
    plens = plens_ref[:]
    log2_wpr = WPR.bit_length() - 1

    rows_iota = jax.lax.broadcasted_iota(I32, (SWT_PAD, Q2), 0)
    wiota = jax.lax.broadcasted_iota(I32, (1, WPR, Q2), 1)
    Tt = Tt_ref[:]

    def step(t, st):
        # t is a python int: the pattern loop is UNROLLED (a lax.fori_loop
        # here costs ~20 us of Mosaic loop overhead per iteration — more
        # than the whole step's compute)
        l, r, pl_, pr_, mlen, complete, done = st
        sym = symcols_ref[t : t + 1, :]  # (1, QTB)
        less_a = lesscols_ref[t : t + 1, :]
        base_v = basecols_ref[t : t + 1, :]
        active = (t < plens) & (done == 0)
        valid = sym >= 0

        pos2 = jnp.concatenate([r, l - 1], axis=1)  # (1, Q2)
        posc = jnp.maximum(pos2, 0)
        w = posc >> 5
        bitpos = posc & 31

        row = jnp.concatenate([base_v, base_v], axis=1) + (w >> log2_wpr)
        cw = w & (WPR - 1)

        onehot = (rows_iota == row).astype(BF16)  # (SWT_PAD, Q2)
        R = jax.lax.dot_general(
            Tt,
            onehot,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (7*WPR, Q2)
        sel = jnp.sum(
            jnp.where(
                wiota == cw.reshape(1, 1, Q2), R.reshape(7, WPR, Q2), 0.0
            ),
            axis=1,
        ).astype(I32)  # (7, Q2)
        ck = sel[0:1] + (sel[1:2] << 8) + (sel[2:3] << 16)
        word = (
            sel[3:4] | (sel[4:5] << 8) | (sel[5:6] << 16) | (sel[6:7] << 24)
        )

        # mask = low (bitpos+1) bits; variable left-shift is elementwise on
        # the VPU.  bitpos == 31 would shift 1 << 32 (undefined) — the -1
        # (all-ones) select covers it.
        mask = jnp.where(
            bitpos == 31,
            jnp.int32(-1),
            (jnp.int32(1) << jnp.minimum(bitpos + 1, 31)) - 1,
        )
        cnt = ck + _swar_popcount(word & mask)
        rank2 = jnp.where(pos2 < 0, 0, cnt)

        occ_r = jnp.where(valid, rank2[:, :QTB], 0)
        fail0 = occ_r == 0  # underflow guard (issue #606)
        occ_lm1 = jnp.where((l > 0) & valid, rank2[:, QTB:], 0)
        l_new = less_a + occ_lm1
        r_new = less_a + occ_r - 1
        fail = fail0 | (l_new > r_new)
        upd = active & ~fail
        pl_n = jnp.where(active, l, pl_)
        pr_n = jnp.where(active, r, pr_)
        l2 = jnp.where(upd, l_new, l)
        r2 = jnp.where(upd, r_new, r)
        mlen2 = jnp.where(upd, mlen + 1, mlen)
        complete2 = jnp.where(active & fail, 0, complete)
        done2 = jnp.where(active & fail, 1, done)
        return l2, r2, pl_n, pr_n, mlen2, complete2, done2

    zeros = jnp.zeros((1, QTB), I32)
    st = (
        zeros,
        jnp.full((1, QTB), n - 1, I32),
        zeros,
        jnp.full((1, QTB), n - 1, I32),
        zeros,
        jnp.ones((1, QTB), I32),
        zeros,
    )
    for t in range(L):
        st = step(t, st)
    l, r, pl_, pr_, mlen, complete, _ = st
    ok = complete == 1
    status_out[:] = jnp.where(
        mlen > 0, jnp.where(ok, COMPLETE, PARTIAL), ABSENT
    )
    lower_out[:] = jnp.where(ok, l, pl_)
    upper_out[:] = jnp.where(ok, r, pr_) + 1
    mlen_out[:] = mlen


@partial(jax.jit, static_argnames=("n", "wpr", "swt_pad", "qtb"))
def backward_search_fused(
    sym_cols, less_cols, base_cols, plens, Tt, *, n, wpr, swt_pad, qtb
):
    """Fused batched backward search.

    ``sym_cols``/``less_cols``/``base_cols``: (L, B) int32 right-aligned
    per-step symbol index (-1 = byte not in alphabet), less[sym], and the
    symbol's table row base; ``plens``: (B,); ``Tt``: build_search_table
    output.  B must be a multiple of ``qtb`` (callers pad with plens = 0
    lanes).

    Returns (status, lower, upper, mlen), each (B,) int32 — bit-identical
    to fm_device._search_kernel's lax.scan path.
    """
    L, B = sym_cols.shape
    grid = (B // qtb,)
    kern = partial(
        _kernel_fm_search,
        L=L,
        WPR=wpr,
        SWT_PAD=swt_pad,
        n=n,
    )
    outs = pl.pallas_call(
        kern,
        interpret=jax.default_backend() == "cpu",
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, qtb), lambda q: (0, q)),
            pl.BlockSpec((L, qtb), lambda q: (0, q)),
            pl.BlockSpec((L, qtb), lambda q: (0, q)),
            pl.BlockSpec((1, qtb), lambda q: (0, q)),
            pl.BlockSpec((7 * wpr, swt_pad), lambda q: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, qtb), lambda q: (0, q)) for _ in range(4)
        ],
        out_shape=[jax.ShapeDtypeStruct((1, B), jnp.int32) for _ in range(4)],
    )(sym_cols, less_cols, base_cols, plens.reshape(1, B), Tt)
    return tuple(o[0] for o in outs)
