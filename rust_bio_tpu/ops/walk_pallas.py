"""Pallas TPU kernel: column-sweep traceback walk (global mode).

The random-access walk (batched._walk_global) issues one device gather per
step; at ~0.1-0.5 ms per XLA gather dispatch a 150 bp path costs ~30 ms and
a 5 kb path several seconds. This kernel replaces random access with one
sequential reverse pass over the traceback tensor: columns stream HBM->VMEM
in descending order (a plain double-buffered pipeline), and every lane's
per-column actions are resolved with vectorized column-wide ops.

Key observation: within one DP column a global-mode walk emits
``[Ins x m][one exit op]`` — a vertical insertion run (possibly spanning
several gap opens) followed by exactly one of Match/Subst (diagonal exit),
Del (horizontal exit) or Start (done).  The insertion-run length is a
run-length prefix over the column's "continue in I-layer" predicate,
computed with log-step shifted maxima; the few per-lane cell reads become
masked reductions over the column (TPU-friendly, no scatter/gather).

Outputs are per-column run-length encoded ops: ``ins_cnt[j]`` and
``exit_op[j]`` per lane, plus the column-0 insertion tail, decoded
host-side into the exact op sequence the reference emits (bit-identical
order: the per-column emission order matches the sequential walk).

Cells use the 12-bit layer encoding of ``alignment/pairwise/batched.py``
(reference ``TracebackCell``, pairwise/mod.rs:1026-1047).  ``i``-layer
cells may carry the sentinel ``TB_REREAD`` (9) meaning "the gap-open
back-pointer is the s-bits of the cell above" — written by the block-row
engine whose kernels cannot see across row-block boundaries; resolved here
column-locally.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rust_bio_tpu.alignment.pairwise.scalar import (
    TB_DEL,
    TB_INS,
    TB_MATCH,
    TB_START,
    TB_SUBST,
    TB_YCLIP_PREFIX,
    TB_YCLIP_SUFFIX,
)

I32 = jnp.int32
TB_REREAD = 9  # i-layer sentinel: open back-pointer = s_bits of cell above

_NEGBIG = np.int32(-(2**20))


def _gather_row(col, idx):
    """col (X, BB) i32, idx (1, BB) i32 -> (1, BB): col[idx[b], b].

    Masked sublane reduction (values must be >= 0; out-of-range idx -> -1).
    """
    X, BB = col.shape
    rows = jax.lax.broadcasted_iota(I32, (X, BB), 0)
    return jnp.max(
        jnp.where(rows == idx, col, -1), axis=0, keepdims=True
    )


def _shift_down(a, fill, k: int = 1):
    """out[r] = a[r-k]; out[:k] = fill."""
    return jnp.concatenate(
        [jnp.full((k, a.shape[1]), fill, a.dtype), a[:-k]], axis=0
    )


def _kernel_sweep_walk_global(
    mlens_ref,  # (1, BB)
    nlens_ref,  # (1, BB)
    tb_ref,  # (K, X, BB) uint16 — DP columns, descending chunks
    ins_out,  # (K, 1, BB) uint16
    exit_out,  # (K, 1, BB) uint16
    ins0_out,  # (1, BB) uint16 — column-0 insertion tail
    icur,  # scratch (1, BB) i32
    jcur,
    carried,
    use_s,
    done,
):
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    K, X, BB = tb_ref.shape
    rows_x = jax.lax.broadcasted_iota(I32, (X, BB), 0)

    @pl.when(c == 0)
    def _init():
        icur[:] = mlens_ref[:]
        jcur[:] = nlens_ref[:]
        carried[:] = jnp.full((1, BB), TB_START, I32)
        use_s[:] = jnp.ones((1, BB), I32)
        done[:] = jnp.zeros((1, BB), I32)

    # this chunk covers DP columns [base+1, base+K], processed descending
    base = (n_chunks - 1 - c) * K

    def column(kk, st):
        i_s, j_s, ca_s, us_s, dn_s = st
        k = K - 1 - kk  # local row in the block, descending
        j = base + k + 1  # DP column index

        at = (j_s == j) & (dn_s == 0)  # (1, BB)
        col = tb_ref[k].astype(I32)  # (X, BB)

        # entry layer + del bits + capped ins-run length at (icur, j):
        # ONE raw-column gather — the scan pre-computed min(run, 15) into
        # tb bits 12-15 (this kernel only sees plain-engine tb, which has
        # no TB_REREAD); runs > 15 are finished by the re-gather chain,
        # which runs 0 iterations unless some lane sits on a full nibble
        g1 = _gather_row(col, i_s)
        sb_i = (g1 >> 8) & 0xF
        db_i = (g1 >> 4) & 0xF
        entry = jnp.where(us_s == 1, sb_i, ca_s)
        is_ins = at & (entry == TB_INS)

        m = jnp.where(is_ins, g1 >> 12, 0)

        def chain_cond(st):
            return jnp.any(st[1] == 1)

        def chain_body(st):
            mm, act = st
            g = _gather_row(col, i_s - mm)
            nib = g >> 12
            upd = act == 1
            # i32 carry: Mosaic cannot legalize a bool vector scf.yield
            return mm + jnp.where(upd, nib, 0), (upd & (nib == 15)).astype(I32)

        m, _ = jax.lax.while_loop(
            chain_cond, chain_body,
            (m, (is_ins & (m == 15)).astype(I32)),
        )
        ins_cnt = jnp.where(is_ins, m + 1, 0)

        # after-run reads at rows (icur - m) and (icur - m - 1): two
        # INDEPENDENT raw-column gathers (both depend only on m) instead
        # of a packed gather needing full-array ibv/dbv extractions
        ga = _gather_row(col, i_s - m)
        gb = _gather_row(col, i_s - m - 1)
        layer2 = jnp.where(is_ins, ga & 0xF, entry)
        db2 = jnp.where(is_ins, (gb >> 4) & 0xF, db_i)
        i2 = jnp.where(is_ins, i_s - m - 1, i_s)

        is_mm = (layer2 == TB_MATCH) | (layer2 == TB_SUBST)
        is_del = layer2 == TB_DEL
        finish = at & (layer2 == TB_START)
        exit_code = jnp.where(at & (is_mm | is_del), layer2, 0)

        ins_out[k] = ins_cnt.astype(jnp.uint16)
        exit_out[k] = exit_code.astype(jnp.uint16)

        new_i = jnp.where(at & is_mm, i2 - 1, jnp.where(at & is_del, i2, i_s))
        new_j = jnp.where(at & (is_mm | is_del), j - 1, j_s)
        new_ca = jnp.where(at & is_del, db2, ca_s)
        new_us = jnp.where(
            at, jnp.where(is_mm, 1, 0), us_s
        )
        new_dn = jnp.where(finish, 1, dn_s)
        return new_i, new_j, new_ca, new_us, new_dn

    st = jax.lax.fori_loop(
        0, K, column, (icur[:], jcur[:], carried[:], use_s[:], done[:])
    )
    icur[:], jcur[:], carried[:], use_s[:], done[:] = st

    @pl.when(c == n_chunks - 1)
    def _column0():
        # column 0 is the analytic init column: s_bits = Ins (i >= 1) /
        # Start (i = 0); a lane arriving here emits icur Ins then Start.
        # (pairwise/mod.rs:597-672 with clips disabled)
        live = done[:] == 0
        ins0_out[:] = jnp.where(live, icur[:], 0).astype(jnp.uint16)


def _pick_block_walk(B: int, X: int, N: int):
    """(block_b, K): WIDEST feasible lane block under the VMEM budget.

    The walk is LATENCY-bound: every column step is a chain of dependent
    cross-sublane ops whose latency barely grows with the lane count, so
    total time ~ (B / block_b) * N * per-column-latency — doubling the
    lanes nearly halves wall time (measured 512 -> 2048: global walk
    4.6 -> 3.0 ms, custom 6.0 -> 4.5 ms at B=8192, X=151).  K (columns
    per grid step) only amortizes grid overhead; the DMA pipeline hides
    small K."""
    budget = 12 * 2**20 + 2**19
    Xp = -(-X // 8) * 8
    cands = [bb for bb in (2048, 1024, 512, 256, 128) if B % bb == 0]
    if B <= 2048 and B not in cands:
        cands.append(B)
    for bb in cands:
        lanes = -(-bb // 128) * 128
        # ~8 live (X, bb) i32 column temporaries + small state
        fixed = 8 * Xp * lanes * 4
        perk = 2 * Xp * lanes * 2  # tb u16, double-buffered
        if budget - fixed < perk:
            continue
        K = min(N, (budget - fixed) // perk)
        # prefer a K dividing N: the pad branch below it is a full copy of
        # the tb tensor (uint16, often hundreds of MB); shrinking K only
        # adds a few cheap grid steps, so take any divisor >= K/4
        for kd in range(K, 0, -1):
            if N % kd == 0:
                if kd * 4 >= K:
                    K = kd
                break
        return bb, K
    raise AssertionError(f"no feasible walk block for B={B} X={X} N={N}")


def _pick_block_walk_seg(B: int, X: int, N: int, SEGR: int):
    """(block_b, K) for the segmented walk (temporaries are SEGR-sized)."""
    budget = 11 * 2**20
    best = None
    cands = [bb for bb in (512, 256, 128) if B % bb == 0]
    if B <= 512:
        cands.append(B)
    for bb in cands:
        lanes = -(-bb // 128) * 128
        fixed = 10 * SEGR * lanes * 4
        perk = 2 * X * lanes * 2  # tb u16, double-buffered
        if budget - fixed < perk:
            continue
        K = min(N, (budget - fixed) // perk)
        steps = (B // bb) * -(-N // K)
        if best is None or steps < best[0]:
            best = (steps, bb, K)
    assert best is not None, f"no feasible seg walk for B={B} X={X} N={N}"
    return best[1], best[2]


def sweep_walk_global(tb_cols, mlens, nlens, ins_nib: bool = True):
    """Reverse column-sweep walk over a global-mode traceback tensor.

    ``tb_cols``: (Np, X, B) uint16, DP column j at axis-0 row j-1 (rows of
    axis 1 are DP rows 0..X-1; only rows <= mlens are meaningful).

    Returns (ins_cnt (Np, B) u16, exit_op (Np, B) u16, ins0 (B,) u16):
    per DP column j (1-based -> row j-1), the lane emitted ``ins_cnt`` Ins
    ops then the single exit op (TB_MATCH/TB_SUBST/TB_DEL; 0 = lane not at
    this column / finished), walking end -> start; ``ins0`` is the final
    vertical run in column 0.

    X <= 1024 uses the whole-column kernel; larger X the segmented one.
    """
    Np, X, B = tb_cols.shape
    if X > 1024 or not ins_nib:
        # the segmented kernel computes ins runs itself and resolves
        # TB_REREAD — required for block-row tb (no run nibble, REREAD
        # i-cells) regardless of X; the whole-column kernel below assumes
        # plain-engine tb with the bits 12-15 ins-run nibble
        return _sweep_walk_global_seg(tb_cols, mlens, nlens)
    block_b, K = _pick_block_walk(B, X, Np)
    n_chunks = -(-Np // K)
    Npad = n_chunks * K
    if Npad != Np:
        # pad HIGH columns (processed first, no lane is ever there)
        tb_cols = jnp.pad(tb_cols, ((0, Npad - Np), (0, 0), (0, 0)))
    grid = (B // block_b, n_chunks)
    out = pl.pallas_call(
        _kernel_sweep_walk_global,
        interpret=jax.default_backend() == "cpu",
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_b), lambda b, c: (0, b)),
            pl.BlockSpec((1, block_b), lambda b, c: (0, b)),
            pl.BlockSpec(
                (K, X, block_b), lambda b, c, n=n_chunks: (n - 1 - c, 0, b)
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (K, 1, block_b), lambda b, c, n=n_chunks: (n - 1 - c, 0, b)
            ),
            pl.BlockSpec(
                (K, 1, block_b), lambda b, c, n=n_chunks: (n - 1 - c, 0, b)
            ),
            pl.BlockSpec((1, block_b), lambda b, c: (0, b)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Npad, 1, B), jnp.uint16),
            jax.ShapeDtypeStruct((Npad, 1, B), jnp.uint16),
            jax.ShapeDtypeStruct((1, B), jnp.uint16),
        ],
        scratch_shapes=[pltpu.VMEM((1, block_b), I32) for _ in range(5)],
    )(
        mlens.reshape(1, B),
        nlens.reshape(1, B),
        tb_cols,
    )
    ins_cnt, exit_op, ins0 = out
    return ins_cnt[:Np, 0], exit_op[:Np, 0], ins0[0]


# ---------------------------------------------------------------------------
# Segmented variant for long sequences (X too large for whole-column temps)
# ---------------------------------------------------------------------------
#
# Identical semantics to _kernel_sweep_walk_global, but each column is
# processed in SEGR-row segments with carried state: the run-length chain
# (lz/RL) carries across segment boundaries, and the per-lane cell reads
# become accumulated masked reductions.  Two passes per column: pass A
# resolves the entry layer + insertion-run length (and the chain-break row),
# pass B reads the exit cell at the chain-break row.


def _make_seg_walk_kernel(SEGR: int):
    def kernel(
        mlens_ref,
        nlens_ref,
        tb_ref,  # (K, X, BB) uint16, descending chunks
        ins_out,
        exit_out,
        ins0_out,
        icur,
        jcur,
        carried,
        use_s,
        done,
    ):
        c = pl.program_id(1)
        n_chunks = pl.num_programs(1)
        K, X, BB = tb_ref.shape
        S_full = X // SEGR
        assert S_full * SEGR == X

        @pl.when(c == 0)
        def _init():
            icur[:] = mlens_ref[:]
            jcur[:] = nlens_ref[:]
            carried[:] = jnp.full((1, BB), TB_START, I32)
            use_s[:] = jnp.ones((1, BB), I32)
            done[:] = jnp.zeros((1, BB), I32)

        base = (n_chunks - 1 - c) * K

        def column(kk, st):
            i_s, j_s, ca_s, us_s, dn_s = st
            k = K - 1 - kk
            j = base + k + 1
            at = (j_s == j) & (dn_s == 0)

            # ---- pass A: entry bits, run-length chain, chain-break row
            def passA(s, acc):
                g1, rl_i, lzrow_i, sb_c, lz_c = acc
                seg = tb_ref[k, pl.ds(s * SEGR, SEGR)].astype(I32)
                ibv = seg & 0xF
                dbv = (seg >> 4) & 0xF
                sbv = (seg >> 8) & 0xF
                grow = (
                    jax.lax.broadcasted_iota(I32, (SEGR, BB), 0) + s * SEGR
                )
                g1 = jnp.maximum(
                    g1,
                    jnp.max(
                        jnp.where(grow == i_s, sbv | (dbv << 4), -1),
                        axis=0,
                        keepdims=True,
                    ),
                )
                sb_above = jnp.concatenate([sb_c, sbv[:-1]], axis=0)
                nl = jnp.where(ibv == TB_REREAD, sb_above, ibv)
                cont = (nl == TB_INS).astype(I32)
                z = jnp.where(cont == 0, grow, _NEGBIG)
                kstep = 1
                lz = z
                while kstep < SEGR:
                    lz = jnp.maximum(lz, _shift_down(lz, _NEGBIG, kstep))
                    kstep *= 2
                lzg = jnp.maximum(lz, lz_c)  # global last-zero (or -1)
                rl = jnp.where(cont == 1, grow - lzg, 0)
                rl_i = jnp.maximum(
                    rl_i,
                    jnp.max(
                        jnp.where(grow == i_s, rl, -1), axis=0, keepdims=True
                    ),
                )
                lzrow_i = jnp.maximum(
                    lzrow_i,
                    jnp.max(
                        jnp.where(grow == i_s, lzg, -1), axis=0, keepdims=True
                    ),
                )
                return (g1, rl_i, lzrow_i, sbv[-1:], lzg[-1:])

            neg1 = jnp.full((1, BB), -1, I32)
            g1, rl_i, lzrow_i, _, _ = jax.lax.fori_loop(
                0,
                S_full,
                passA,
                (
                    neg1,
                    neg1,
                    neg1,
                    jnp.full((1, BB), TB_START, I32),
                    neg1,
                ),
            )
            sb_i = g1 & 0xF
            db_i = (g1 >> 4) & 0xF
            entry = jnp.where(us_s == 1, sb_i, ca_s)
            is_ins = at & (entry == TB_INS)
            m = jnp.where(is_ins, rl_i, 0)
            ins_cnt = jnp.where(is_ins, m + 1, 0)
            g2row = lzrow_i  # == icur - m: the chain-break row

            # ---- pass B: exit cell read at the chain-break row (carrying
            # the previous segment's last sbv/dbv row across the boundary)
            def passB(s, acc):
                g2, sb_c, db_c = acc
                seg = tb_ref[k, pl.ds(s * SEGR, SEGR)].astype(I32)
                ibv = seg & 0xF
                dbv = (seg >> 4) & 0xF
                sbv = (seg >> 8) & 0xF
                grow = (
                    jax.lax.broadcasted_iota(I32, (SEGR, BB), 0) + s * SEGR
                )
                sb_above = jnp.concatenate([sb_c, sbv[:-1]], axis=0)
                db_above = jnp.concatenate([db_c, dbv[:-1]], axis=0)
                nl = jnp.where(ibv == TB_REREAD, sb_above, ibv)
                packed = nl | (db_above << 4)
                g2 = jnp.maximum(
                    g2,
                    jnp.max(
                        jnp.where(grow == g2row, packed, -1),
                        axis=0,
                        keepdims=True,
                    ),
                )
                return (g2, sbv[-1:], dbv[-1:])

            g2, _, _ = jax.lax.fori_loop(
                0,
                S_full,
                passB,
                (
                    neg1,
                    jnp.full((1, BB), TB_START, I32),
                    jnp.zeros((1, BB), I32),
                ),
            )

            layer2 = jnp.where(is_ins, g2 & 0xF, entry)
            db2 = jnp.where(is_ins, (g2 >> 4) & 0xF, db_i)
            i2 = jnp.where(is_ins, i_s - m - 1, i_s)

            is_mm = (layer2 == TB_MATCH) | (layer2 == TB_SUBST)
            is_del = layer2 == TB_DEL
            finish = at & (layer2 == TB_START)
            exit_code = jnp.where(at & (is_mm | is_del), layer2, 0)

            ins_out[k] = ins_cnt.astype(jnp.uint16)
            exit_out[k] = exit_code.astype(jnp.uint16)

            new_i = jnp.where(
                at & is_mm, i2 - 1, jnp.where(at & is_del, i2, i_s)
            )
            new_j = jnp.where(at & (is_mm | is_del), j - 1, j_s)
            new_ca = jnp.where(at & is_del, db2, ca_s)
            new_us = jnp.where(at, jnp.where(is_mm, 1, 0), us_s)
            new_dn = jnp.where(finish, 1, dn_s)
            return new_i, new_j, new_ca, new_us, new_dn

        st = jax.lax.fori_loop(
            0, K, column, (icur[:], jcur[:], carried[:], use_s[:], done[:])
        )
        icur[:], jcur[:], carried[:], use_s[:], done[:] = st

        @pl.when(c == n_chunks - 1)
        def _column0():
            live = done[:] == 0
            ins0_out[:] = jnp.where(live, icur[:], 0).astype(jnp.uint16)

    return kernel


def _sweep_walk_global_seg(tb_cols, mlens, nlens):
    """Segmented column-sweep walk for long sequences (X > 1024)."""
    Np, X, B = tb_cols.shape
    # pad the row axis to a SEGR multiple: an awkward X (e.g. 5101) would
    # otherwise force SEGR=8 -> ~640 tiny carried-chain steps per column
    # (pad rows are all-zero: ibv 0 != TB_INS, never gathered — lanes'
    # rows stay <= mlens < X)
    SEGR = 512 if X >= 512 else next(
        s for s in (256, 128, 64, 8) if X % s == 0
    )
    Xp = -(-X // SEGR) * SEGR
    if Xp != X:
        tb_cols = jnp.pad(tb_cols, ((0, 0), (0, Xp - X), (0, 0)))
        X = Xp
    block_b, K = _pick_block_walk_seg(B, X, Np, SEGR)
    n_chunks = -(-Np // K)
    Npad = n_chunks * K
    if Npad != Np:
        tb_cols = jnp.pad(tb_cols, ((0, Npad - Np), (0, 0), (0, 0)))
    grid = (B // block_b, n_chunks)
    out = pl.pallas_call(
        _make_seg_walk_kernel(SEGR),
        interpret=jax.default_backend() == "cpu",
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_b), lambda b, c: (0, b)),
            pl.BlockSpec((1, block_b), lambda b, c: (0, b)),
            pl.BlockSpec(
                (K, X, block_b), lambda b, c, n=n_chunks: (n - 1 - c, 0, b)
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (K, 1, block_b), lambda b, c, n=n_chunks: (n - 1 - c, 0, b)
            ),
            pl.BlockSpec(
                (K, 1, block_b), lambda b, c, n=n_chunks: (n - 1 - c, 0, b)
            ),
            pl.BlockSpec((1, block_b), lambda b, c: (0, b)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Npad, 1, B), jnp.uint16),
            jax.ShapeDtypeStruct((Npad, 1, B), jnp.uint16),
            jax.ShapeDtypeStruct((1, B), jnp.uint16),
        ],
        scratch_shapes=[pltpu.VMEM((1, block_b), I32) for _ in range(5)],
    )(
        mlens.reshape(1, B),
        nlens.reshape(1, B),
        tb_cols,
    )
    ins_cnt, exit_op, ins0 = out
    return ins_cnt[:Np, 0], exit_op[:Np, 0], ins0[0]


# ---------------------------------------------------------------------------
# Semiglobal variant
# ---------------------------------------------------------------------------
#
# Same reverse column sweep, with the semiglobal family's y-clip layers:
# the walk STARTS in the suffix-fixed final column (tbfix, which packs
# Ly(i) above the 12-bit cell and is the only place TB_YCLIP_SUFFIX
# s/i-bits occur), resolved vectorized in XLA before the sweep; sweep
# columns may additionally exit via TB_YCLIP_PREFIX (a jump to column 0,
# length = the column index).  Emission order per lane is bit-identical
# to the sequential ``batched._walk_semiclip``.


def _resolve_fixed_column(tbfix, mlens, nlens):
    """Entry resolution at j == nlens over ``tbfix`` (B, Mp1) int32.

    Returns (fix_ins, fix_exit, fix_ly, i1, j1, ca1, us1, dn1, ystart0,
    yend0) — all (B,) int32."""
    B, Mp1 = tbfix.shape
    cols = jnp.arange(Mp1, dtype=I32)[None, :]
    bidx = jnp.arange(B)
    ib = tbfix & 0xF
    db = (tbfix >> 4) & 0xF
    sb = (tbfix >> 8) & 0xF
    ly = tbfix >> 12

    entry_sb = sb[bidx, mlens]

    # vertical Ins-run lengths: continue while the i-bits chain stays Ins
    cont = ib == TB_INS
    z = jnp.where(~cont, cols, jnp.int32(-(2**20)))
    k = 1
    lz = z
    while k < Mp1:
        shifted = jnp.concatenate(
            [jnp.full((B, k), -(2**20), I32), lz[:, :-k]], axis=1
        )
        lz = jnp.maximum(lz, shifted)
        k *= 2
    rl = jnp.where(cont, cols - lz, 0)

    is_ins = entry_sb == TB_INS
    m = jnp.where(is_ins, rl[bidx, mlens], 0)
    fix_ins = jnp.where(is_ins, m + 1, 0)
    i2 = jnp.where(is_ins, mlens - m - 1, mlens)
    layer2 = jnp.where(is_ins, ib[bidx, jnp.maximum(mlens - m, 0)], entry_sb)
    db2 = db[bidx, i2]
    ly2 = ly[bidx, i2]

    is_mm = (layer2 == TB_MATCH) | (layer2 == TB_SUBST)
    is_del = layer2 == TB_DEL
    is_ycs = layer2 == TB_YCLIP_SUFFIX
    is_ycp = layer2 == TB_YCLIP_PREFIX
    is_start = layer2 == TB_START

    fix_exit = jnp.where(is_start, 0, layer2)
    fix_ly = jnp.where(is_ycs, ly2, jnp.where(is_ycp, nlens, 0))
    i1 = jnp.where(is_mm, i2 - 1, i2)
    j1 = jnp.where(
        is_mm | is_del,
        nlens - 1,
        jnp.where(is_ycs, nlens - ly2, jnp.where(is_ycp, 0, nlens)),
    )
    ca1 = jnp.where(is_del, db2, TB_START)
    us1 = jnp.where(is_del, 0, 1)
    dn1 = is_start.astype(I32)
    ystart0 = jnp.where(is_ycp, nlens, 0)
    yend0 = jnp.where(is_ycs, nlens - ly2, nlens)
    return fix_ins, fix_exit, fix_ly, i1, j1, ca1, us1, dn1, ystart0, yend0


def _kernel_sweep_walk_semi(
    i1_ref,
    j1_ref,
    ca1_ref,
    us1_ref,
    dn1_ref,
    tb_ref,  # (K, X, BB) uint16, descending chunks
    ins_out,
    exit_out,
    ins0_out,
    icur,
    jcur,
    carried,
    use_s,
    done,
):
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    K, X, BB = tb_ref.shape
    rows_x = jax.lax.broadcasted_iota(I32, (X, BB), 0)

    @pl.when(c == 0)
    def _init():
        icur[:] = i1_ref[:]
        jcur[:] = j1_ref[:]
        carried[:] = ca1_ref[:]
        use_s[:] = us1_ref[:]
        done[:] = dn1_ref[:]

    base = (n_chunks - 1 - c) * K

    def column(kk, st):
        i_s, j_s, ca_s, us_s, dn_s = st
        k = K - 1 - kk
        j = base + k + 1

        at = (j_s == j) & (dn_s == 0)
        col = tb_ref[k].astype(I32)

        # entry layer + del bits + capped ins-run nibble, one raw gather
        # (scan wrote min(run, 15) into bits 12-15; chain finishes > 15)
        g1 = _gather_row(col, i_s)
        sb_i = (g1 >> 8) & 0xF
        db_i = (g1 >> 4) & 0xF
        entry = jnp.where(us_s == 1, sb_i, ca_s)
        is_ins = at & (entry == TB_INS)

        m = jnp.where(is_ins, g1 >> 12, 0)

        def chain_cond(st):
            return jnp.any(st[1] == 1)

        def chain_body(st):
            mm, act = st
            g = _gather_row(col, i_s - mm)
            nib = g >> 12
            upd = act == 1
            # i32 carry: Mosaic cannot legalize a bool vector scf.yield
            return mm + jnp.where(upd, nib, 0), (upd & (nib == 15)).astype(I32)

        m, _ = jax.lax.while_loop(
            chain_cond, chain_body,
            (m, (is_ins & (m == 15)).astype(I32)),
        )
        ins_cnt = jnp.where(is_ins, m + 1, 0)

        # two independent raw-column gathers replace the packed gather
        # (no full-array ibv/dbv extractions; both only depend on m)
        ga = _gather_row(col, i_s - m)
        gb = _gather_row(col, i_s - m - 1)
        layer2 = jnp.where(is_ins, ga & 0xF, entry)
        db2 = jnp.where(is_ins, (gb >> 4) & 0xF, db_i)
        i2 = jnp.where(is_ins, i_s - m - 1, i_s)

        is_mm = (layer2 == TB_MATCH) | (layer2 == TB_SUBST)
        is_del = layer2 == TB_DEL
        is_ycp = layer2 == TB_YCLIP_PREFIX
        finish = at & (layer2 == TB_START)
        exit_code = jnp.where(at & (is_mm | is_del | is_ycp), layer2, 0)

        ins_out[k] = ins_cnt.astype(jnp.uint16)
        exit_out[k] = exit_code.astype(jnp.uint16)

        new_i = jnp.where(
            at & is_mm, i2 - 1, jnp.where(at & (is_del | is_ycp), i2, i_s)
        )
        new_j = jnp.where(
            at & (is_mm | is_del), j - 1, jnp.where(at & is_ycp, 0, j_s)
        )
        new_ca = jnp.where(at & is_del, db2, ca_s)
        new_us = jnp.where(at, jnp.where(is_mm | is_ycp, 1, 0), us_s)
        new_dn = jnp.where(finish, 1, dn_s)
        return new_i, new_j, new_ca, new_us, new_dn

    st = jax.lax.fori_loop(
        0, K, column, (icur[:], jcur[:], carried[:], use_s[:], done[:])
    )
    icur[:], jcur[:], carried[:], use_s[:], done[:] = st

    @pl.when(c == n_chunks - 1)
    def _column0():
        # column 0 in semiglobal mode: s_bits = Ins (i >= 1) / Start,
        # same analytic column as global (x-clips are MIN by contract)
        live = done[:] == 0
        ins0_out[:] = jnp.where(live, icur[:], 0).astype(jnp.uint16)


def sweep_walk_semiglobal(tb_cols, tbfix, mlens, nlens):
    """Column-sweep walk for the semiglobal family.

    ``tb_cols``: (Np, X, B) uint16 raw kernel columns; ``tbfix``:
    (B, X) int32 suffix-fixed final column with Ly << 12.

    Returns (ins_cnt (Np, B), exit_op (Np, B), ins0 (B,), fix_ins,
    fix_exit, fix_ly, ystart, yend) — decode with
    ``batched._decode_ops_colrle_semi``."""
    Np, X, B = tb_cols.shape
    (
        fix_ins, fix_exit, fix_ly, i1, j1, ca1, us1, dn1, ystart0, yend0
    ) = _resolve_fixed_column(tbfix, mlens, nlens)

    block_b, K = _pick_block_walk(B, X, Np)
    n_chunks = -(-Np // K)
    Npad = n_chunks * K
    if Npad != Np:
        tb_cols = jnp.pad(tb_cols, ((0, Npad - Np), (0, 0), (0, 0)))
    grid = (B // block_b, n_chunks)
    out = pl.pallas_call(
        _kernel_sweep_walk_semi,
        interpret=jax.default_backend() == "cpu",
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_b), lambda b, c: (0, b))
            for _ in range(5)
        ]
        + [
            pl.BlockSpec(
                (K, X, block_b), lambda b, c, n=n_chunks: (n - 1 - c, 0, b)
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (K, 1, block_b), lambda b, c, n=n_chunks: (n - 1 - c, 0, b)
            ),
            pl.BlockSpec(
                (K, 1, block_b), lambda b, c, n=n_chunks: (n - 1 - c, 0, b)
            ),
            pl.BlockSpec((1, block_b), lambda b, c: (0, b)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Npad, 1, B), jnp.uint16),
            jax.ShapeDtypeStruct((Npad, 1, B), jnp.uint16),
            jax.ShapeDtypeStruct((1, B), jnp.uint16),
        ],
        scratch_shapes=[pltpu.VMEM((1, block_b), I32) for _ in range(5)],
    )(
        i1.reshape(1, B),
        j1.reshape(1, B),
        ca1.reshape(1, B),
        us1.reshape(1, B),
        dn1.reshape(1, B),
        tb_cols,
    )
    ins_cnt, exit_op, ins0 = out
    ins_cnt = ins_cnt[:Np, 0]
    exit_op = exit_op[:Np, 0]

    # ystart: the (at most one) YCLIP_PREFIX exit's column index
    jcols = jnp.arange(1, Np + 1, dtype=I32)[:, None]
    ystart = jnp.max(
        jnp.where(exit_op == TB_YCLIP_PREFIX, jcols, 0), axis=0
    )
    ystart = jnp.maximum(ystart, ystart0)
    return (
        ins_cnt, exit_op, ins0[0], fix_ins, fix_exit, fix_ly, ystart, yend0
    )


# ---------------------------------------------------------------------------
# General-clip (local/custom) variant
# ---------------------------------------------------------------------------
#
# All clip layers live.  Within one DP column a lane's walk is at most
# ``[Xclip-suffix][Ins x m][exit][after-XCP op]``: an XCLIP_SUFFIX s-bit
# occurs only at row mlens (jump up by the streamed per-column Lx), an
# XCLIP_PREFIX exit jumps to row 0 of the SAME column whose cell then
# yields one more op (Del / Yclip-prefix / Start), and YCLIP_SUFFIX occurs
# only in the suffix-fixed final column (resolved in the XLA prelude).
# Column 0 (the analytic init column's tb) is swept like any other
# column: its cells only hold Ins chains / clip opens / Start, which the
# generic body already resolves.  Emission order per lane is
# bit-identical to ``batched._walk_fullclip``.

from rust_bio_tpu.alignment.pairwise.scalar import (  # noqa: E402
    TB_XCLIP_PREFIX,
    TB_XCLIP_SUFFIX,
)


def _resolve_fixed_column_custom(tbfix, lx_n, mlens, nlens):
    """Entry resolution at j == nlens with every clip layer live.

    Returns (fix_codes (B, 4), fix_lens (B, 4) — op slots in emission
    (end -> start) order, 0-padded — plus i1, j1, ca1, us1, dn1, xstart0,
    ystart0, xend0, yend0)."""
    B, Mp1 = tbfix.shape
    cols = jnp.arange(Mp1, dtype=I32)
    bidx = jnp.arange(B)
    ib = tbfix & 0xF
    db = (tbfix >> 4) & 0xF
    sb = (tbfix >> 8) & 0xF
    ly = tbfix >> 12

    # vertical Ins-run lengths down the fixed column (i-bit chain)
    cont = ib == TB_INS
    z = jnp.where(~cont, cols[None, :], jnp.int32(-(2**20)))
    k = 1
    lz = z
    while k < Mp1:
        shifted = jnp.concatenate(
            [jnp.full((B, k), -(2**20), I32), lz[:, :-k]], axis=1
        )
        lz = jnp.maximum(lz, shifted)
        k *= 2
    rl = jnp.where(cont, cols[None, :] - lz, 0)

    i = mlens
    j = nlens
    carried = jnp.full(B, TB_START, I32)
    use_s = jnp.ones(B, bool)
    done = jnp.zeros(B, bool)
    left = jnp.zeros(B, bool)  # moved out of the fixed column
    xstart = jnp.zeros(B, I32)
    ystart = jnp.zeros(B, I32)
    xend = mlens
    yend = nlens
    fix_codes = jnp.zeros((B, 4), I32)
    fix_lens = jnp.zeros((B, 4), I32)
    nslot = jnp.zeros(B, I32)

    def emit(fc, fl, ns, act, code, length):
        oh = (jnp.arange(4)[None, :] == ns[:, None]) & act[:, None]
        fc = jnp.where(oh, code[:, None], fc)
        fl = jnp.where(oh, length[:, None], fl)
        return fc, fl, ns + act

    for _ in range(3):
        act = (~done) & (~left)
        entry = jnp.where(use_s, sb[bidx, i], carried)
        # Xclip-suffix (row mlens only)
        is_xs = act & (entry == TB_XCLIP_SUFFIX)
        fix_codes, fix_lens, nslot = emit(
            fix_codes, fix_lens, nslot, is_xs,
            jnp.full(B, TB_XCLIP_SUFFIX, I32), lx_n,
        )
        i = jnp.where(is_xs, i - lx_n, i)
        xend = jnp.where(is_xs, i, xend)
        use_s = jnp.where(is_xs, True, use_s)
        entry = jnp.where(is_xs, sb[bidx, i], entry)
        # vertical Ins run
        is_ins = act & (entry == TB_INS)
        m = jnp.where(is_ins, rl[bidx, i], 0)
        cnt = jnp.where(is_ins, m + 1, 0)
        fix_codes, fix_lens, nslot = emit(
            fix_codes, fix_lens, nslot, is_ins,
            jnp.full(B, TB_INS, I32), cnt,
        )
        i2 = jnp.where(is_ins, i - m - 1, i)
        layer2 = jnp.where(is_ins, ib[bidx, jnp.maximum(i - m, 0)], entry)
        db2 = db[bidx, i2]
        ly2 = ly[bidx, i2]

        is_mm = act & ((layer2 == TB_MATCH) | (layer2 == TB_SUBST))
        is_del = act & (layer2 == TB_DEL)
        is_ycs = act & (layer2 == TB_YCLIP_SUFFIX)
        is_ycp = act & (layer2 == TB_YCLIP_PREFIX)
        is_xcp = act & (layer2 == TB_XCLIP_PREFIX)
        is_start = act & (layer2 == TB_START)

        do_emit = is_mm | is_del | is_ycs | is_ycp | is_xcp
        code = jnp.where(do_emit, layer2, 0)
        length = jnp.where(
            is_ycs, ly2,
            jnp.where(is_ycp, j, jnp.where(is_xcp, i2, 0)),
        )
        fix_codes, fix_lens, nslot = emit(
            fix_codes, fix_lens, nslot, do_emit, code, length
        )

        # state transitions
        i = jnp.where(is_mm, i2 - 1, jnp.where(is_xcp, 0, i2))
        yend = jnp.where(is_ycs, j - ly2, yend)
        ystart = jnp.where(is_ycp, j, ystart)
        xstart = jnp.where(is_xcp, i2, xstart)
        carried = jnp.where(is_del, db2, carried)
        use_s = jnp.where(is_del, False, jnp.where(do_emit, True, use_s))
        done = done | is_start
        left_now = is_mm | is_del
        j = jnp.where(left_now, j - 1, jnp.where(is_ycp, 0, jnp.where(is_ycs, j - ly2, j)))
        left = left | left_now | is_ycp | is_ycs
    return (
        fix_codes, fix_lens, i, j, carried, use_s, done,
        xstart, ystart, xend, yend,
    )


def _kernel_sweep_walk_local(
    i1_ref,  # (1, BB) i32 — entry state from the fixed-column prolog
    j1_ref,
    ca1_ref,
    us1_ref,
    dn1_ref,
    xs0_ref,  # (1, BB) i32 — coords for lanes finished in the prolog
    ys0_ref,
    tb_ref,  # (K, X, BB) uint16, descending chunks (incl. column 0)
    ins_out,  # (K, 1, BB) u16
    exit_out,  # (K, 1, BB) u16 (TB_MATCH/TB_SUBST/TB_DEL; 0 = none)
    xs_out,  # (1, BB) u16 — xstart resolved at the finish cell
    ys_out,  # (1, BB) u16
    icur,
    jcur,
    carried,
    use_s,
    done,
    xs_s,
    ys_s,
):
    """LOCAL-mode specialization of the custom sweep walk.

    With all four clip penalties zero AND strictly negative gap steps
    (gap_open + gap_extend < 0 — asserted by the dispatcher), an on-path
    interior cell can never carry TB_XCLIP_SUFFIX (a del-run past a free
    x-suffix clip would score strictly worse than clipping directly), and
    TB_XCLIP_PREFIX / TB_YCLIP_PREFIX / TB_START are all terminal (the
    path start).  That removes the custom kernel's speculative clip
    gather, the lx stream, and 3 of its 5 output streams — per-column
    work drops to the lean global kernel's 3 gathers / 2 streams (the
    custom walk costs 2.3 ms more than the global walk per 8192x150
    batch; PARITY.md "Local-engine VMEM ceiling" (b))."""
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    K, X, BB = tb_ref.shape

    @pl.when(c == 0)
    def _init():
        icur[:] = i1_ref[:]
        jcur[:] = j1_ref[:]
        carried[:] = ca1_ref[:]
        use_s[:] = us1_ref[:]
        done[:] = dn1_ref[:]
        xs_s[:] = xs0_ref[:]
        ys_s[:] = ys0_ref[:]

    base = (n_chunks - 1 - c) * K

    def column(kk, st):
        i_s, j_s, ca_s, us_s, dn_s, xs_c, ys_c = st
        k = K - 1 - kk
        j = base + k  # DP column index, 0-based (column 0 included)

        at = (j_s == j) & (dn_s == 0)
        col = tb_ref[k].astype(I32)

        g1 = _gather_row(col, i_s)
        entry = jnp.where(us_s == 1, (g1 >> 8) & 0xF, ca_s)
        is_ins = at & (entry == TB_INS)
        m = jnp.where(is_ins, g1 >> 12, 0)

        def chain_cond(st):
            return jnp.any(st[1] == 1)

        def chain_body(st):
            mm, act = st
            g = _gather_row(col, i_s - mm)
            nib = g >> 12
            upd = act == 1
            return mm + jnp.where(upd, nib, 0), (upd & (nib == 15)).astype(I32)

        m, _ = jax.lax.while_loop(
            chain_cond, chain_body,
            (m, (is_ins & (m == 15)).astype(I32)),
        )
        ins_cnt = jnp.where(is_ins, m + 1, 0)

        ga = _gather_row(col, i_s - m)
        gb = _gather_row(col, i_s - m - 1)
        layer2 = jnp.where(is_ins, ga & 0xF, entry)
        db2 = jnp.where(is_ins, (gb >> 4) & 0xF, (g1 >> 4) & 0xF)
        i2 = jnp.where(is_ins, i_s - m - 1, i_s)

        is_mm = (layer2 == TB_MATCH) | (layer2 == TB_SUBST)
        is_del = layer2 == TB_DEL
        # terminal codes: Start at (0,0), Xclip-prefix (xstart = i2, the
        # clip length), Yclip-prefix (row 0 only: xstart = i2 = 0)
        finish = at & (
            (layer2 == TB_START)
            | (layer2 == TB_XCLIP_PREFIX)
            | (layer2 == TB_YCLIP_PREFIX)
        )
        exit_code = jnp.where(at & (is_mm | is_del), layer2, 0)

        ins_out[k] = ins_cnt.astype(jnp.uint16)
        exit_out[k] = exit_code.astype(jnp.uint16)

        new_i = jnp.where(at & is_mm, i2 - 1, jnp.where(at, i2, i_s))
        new_j = jnp.where(at & (is_mm | is_del), j - 1, j_s)
        new_ca = jnp.where(at & is_del, db2, ca_s)
        new_us = jnp.where(at, jnp.where(is_mm, 1, 0), us_s)
        new_dn = jnp.where(finish, 1, dn_s)
        # max-merge: the prolog may already have resolved an Xclip/Yclip
        # prefix (leaving the lane live for a trailing column-0 Start);
        # at most one source of each coordinate is ever nonzero
        new_xs = jnp.where(finish, jnp.maximum(i2, xs_c), xs_c)
        new_ys = jnp.where(finish, jnp.maximum(j, ys_c), ys_c)
        return new_i, new_j, new_ca, new_us, new_dn, new_xs, new_ys

    st = jax.lax.fori_loop(
        0, K, column,
        (icur[:], jcur[:], carried[:], use_s[:], done[:], xs_s[:], ys_s[:]),
    )
    icur[:], jcur[:], carried[:], use_s[:], done[:], xs_s[:], ys_s[:] = st

    @pl.when(c == n_chunks - 1)
    def _fin():
        xs_out[:] = xs_s[:].astype(jnp.uint16)
        ys_out[:] = ys_s[:].astype(jnp.uint16)


def sweep_walk_local(tb_cols0, tbfix, lx_cols0, lx_n, mlens, nlens):
    """Local-mode column-sweep walk (all clips 0, strict negative gaps).

    Same inputs as ``sweep_walk_custom``; returns (ins_cnt, exit_op —
    (Np+1, B) — fix_codes (B, 4), fix_lens (B, 4), xstart, ystart, xend,
    yend).  The interior streams carry NO clip ops: Xclip/Yclip prefixes
    are terminal in local mode and resolve to (xstart, ystart) directly;
    suffix clips live in the fixed-column prolog's slots.  The dispatcher
    must guarantee gap_open + gap_extend < 0 (see the kernel docstring)."""
    Nc, X, B = tb_cols0.shape
    (
        fix_codes, fix_lens, i1, j1, ca1, us1, dn1,
        xstart0, ystart0, xend0, yend0,
    ) = _resolve_fixed_column_custom(tbfix, lx_n, mlens, nlens)

    # lanes that left the fixed column via a y-suffix clip land at
    # (mlens, yend) in the S layer, whose code may be an x-suffix clip:
    # resolve it here (one two-axis cell gather) so the kernel needs no
    # clip machinery.  Rows below mlens never hold TB_XCLIP_SUFFIX.
    bidx = jnp.arange(B)
    live = (~dn1) & us1 & (j1 < nlens) & (j1 > 0)
    jg = jnp.where(live, j1, 0)
    cell = tb_cols0[jg, jnp.where(live, i1, 0), bidx].astype(I32)
    sbj = (cell >> 8) & 0xF
    lxj = lx_cols0[jg, bidx]
    is_xs = live & (sbj == TB_XCLIP_SUFFIX)
    i1 = jnp.where(is_xs, i1 - lxj, i1)
    xend = jnp.where(is_xs, i1, xend0)
    # the x-suffix clip is recorded in a free fix slot so the decode can
    # emit it in order (slot order is end -> start; it follows the y-clip)
    nslot = jnp.sum(fix_codes != 0, axis=1)
    oh = (jnp.arange(4)[None, :] == nslot[:, None]) & is_xs[:, None]
    fix_codes = jnp.where(oh, TB_XCLIP_SUFFIX, fix_codes)
    fix_lens = jnp.where(oh, lxj[:, None], fix_lens)

    block_b, K = _pick_block_walk(B, X, Nc)
    n_chunks = -(-Nc // K)
    Npad = n_chunks * K
    if Npad != Nc:
        tb_cols0 = jnp.pad(tb_cols0, ((0, Npad - Nc), (0, 0), (0, 0)))
    grid = (B // block_b, n_chunks)
    out = pl.pallas_call(
        _kernel_sweep_walk_local,
        interpret=jax.default_backend() == "cpu",
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_b), lambda b, c: (0, b))
            for _ in range(7)
        ]
        + [
            pl.BlockSpec(
                (K, X, block_b), lambda b, c, n=n_chunks: (n - 1 - c, 0, b)
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (K, 1, block_b), lambda b, c, n=n_chunks: (n - 1 - c, 0, b)
            )
            for _ in range(2)
        ]
        + [pl.BlockSpec((1, block_b), lambda b, c: (0, b)) for _ in range(2)],
        out_shape=[
            jax.ShapeDtypeStruct((Npad, 1, B), jnp.uint16) for _ in range(2)
        ]
        + [jax.ShapeDtypeStruct((1, B), jnp.uint16) for _ in range(2)],
        scratch_shapes=[pltpu.VMEM((1, block_b), I32) for _ in range(7)],
    )(
        i1.reshape(1, B),
        j1.reshape(1, B),
        ca1.reshape(1, B),
        us1.astype(I32).reshape(1, B),
        dn1.astype(I32).reshape(1, B),
        xstart0.reshape(1, B),
        ystart0.reshape(1, B),
        tb_cols0,
    )
    ins_cnt, exit_op, xs_u, ys_u = out
    return (
        ins_cnt[:Nc, 0],
        exit_op[:Nc, 0],
        fix_codes,
        fix_lens,
        xs_u[0].astype(I32),
        ys_u[0].astype(I32),
        xend,
        yend0,
    )


def _kernel_sweep_walk_custom(
    i1_ref,
    j1_ref,
    ca1_ref,
    us1_ref,
    dn1_ref,
    mlens_ref,
    tb_ref,  # (K, X, BB) uint16, descending chunks (incl. column 0)
    lx_ref,  # (K, 1, BB) int32 per-column Lx (incl. Lx[0])
    pre_out,  # (K, 1, BB) u16: Xclip-suffix length (0 = none)
    ins_out,
    exit_out,
    elen_out,  # exit length (XCP: i2; YCP: j)
    post_out,  # after-XCP op at row 0 (TB_DEL / TB_YCLIP_PREFIX, 0 = none)
    icur,
    jcur,
    carried,
    use_s,
    done,
):
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    K, X, BB = tb_ref.shape
    rows_x = jax.lax.broadcasted_iota(I32, (X, BB), 0)

    @pl.when(c == 0)
    def _init():
        icur[:] = i1_ref[:]
        jcur[:] = j1_ref[:]
        carried[:] = ca1_ref[:]
        use_s[:] = us1_ref[:]
        done[:] = dn1_ref[:]

    base = (n_chunks - 1 - c) * K

    def column(kk, st):
        i_s, j_s, ca_s, us_s, dn_s = st
        k = K - 1 - kk
        j = base + k  # DP column index, 0-based (column 0 included)

        at = (j_s == j) & (dn_s == 0)
        col = tb_ref[k].astype(I32)
        lx = lx_ref[k]

        # raw-column gathers: bits 8-11 = s_bits, 4-7 = d_bits, 12-15 =
        # capped ins-run nibble (written by the custom/local scans in
        # sweep mode).  Gather 1 reads the entry row; the Xclip-suffix
        # pre-op (row mlens only) jumps to row i_s - lx, whose gather gx
        # depends only on carried state, so it issues in PARALLEL with g1
        # (speculative: cheaper than the while_loop this replaces, whose
        # any-cond paid a cross-lane reduction every column).
        g1 = _gather_row(col, i_s)
        gx = _gather_row(col, i_s - lx)
        entry0 = jnp.where(us_s == 1, (g1 >> 8) & 0xF, ca_s)

        is_xs = at & (entry0 == TB_XCLIP_SUFFIX)
        pre_len = jnp.where(is_xs, lx, 0)
        i_p = jnp.where(is_xs, i_s - lx, i_s)
        g1b = jnp.where(is_xs, gx, g1)
        entry = jnp.where(is_xs, (g1b >> 8) & 0xF, entry0)

        is_ins = at & (entry == TB_INS)
        m = jnp.where(is_ins, g1b >> 12, 0)

        def chain_cond(st):
            return jnp.any(st[1] == 1)

        def chain_body(st):
            mm, act = st
            g = _gather_row(col, i_p - mm)
            nib = g >> 12
            upd = act == 1
            # i32 carry: Mosaic cannot legalize a bool vector scf.yield
            return mm + jnp.where(upd, nib, 0), (upd & (nib == 15)).astype(I32)

        m, _ = jax.lax.while_loop(
            chain_cond, chain_body,
            (m, (is_ins & (m == 15)).astype(I32)),
        )
        ins_cnt = jnp.where(is_ins, m + 1, 0)

        # after-run reads: the opener's i-bits at row i_p - m and the del
        # bits of the row below it — two INDEPENDENT raw-column gathers
        # (both depend only on m), replacing a packed gather that needed
        # full-array ibv/dbv extractions plus a sublane shift
        ga = _gather_row(col, i_p - m)
        gb = _gather_row(col, i_p - m - 1)
        layer2 = jnp.where(is_ins, ga & 0xF, entry)
        db2 = jnp.where(is_ins, (gb >> 4) & 0xF, (g1b >> 4) & 0xF)
        i2 = jnp.where(is_ins, i_p - m - 1, i_p)

        is_mm = (layer2 == TB_MATCH) | (layer2 == TB_SUBST)
        is_del = layer2 == TB_DEL
        is_ycp = layer2 == TB_YCLIP_PREFIX
        is_xcp = layer2 == TB_XCLIP_PREFIX
        finish = at & (layer2 == TB_START)
        exit_code = jnp.where(
            at & (is_mm | is_del | is_ycp | is_xcp), layer2, 0
        )
        exit_len = jnp.where(
            at & is_xcp, i2, jnp.where(at & is_ycp, j, 0)
        )

        # after-XCP op: row 0 of this column (cheap (1, BB) slices)
        sb0 = (col[0:1] >> 8) & 0xF
        db0 = (col[0:1] >> 4) & 0xF
        post = jnp.where(at & is_xcp, sb0, 0)

        pre_out[k] = pre_len.astype(jnp.uint16)
        ins_out[k] = ins_cnt.astype(jnp.uint16)
        exit_out[k] = exit_code.astype(jnp.uint16)
        elen_out[k] = exit_len.astype(jnp.uint16)
        post_out[k] = post.astype(jnp.uint16)

        post_del = at & is_xcp & (sb0 == TB_DEL)
        post_ycp = at & is_xcp & (sb0 == TB_YCLIP_PREFIX)
        post_start = at & is_xcp & (sb0 == TB_START)

        new_i = jnp.where(
            at & is_mm, i2 - 1,
            jnp.where(at & is_xcp, 0, jnp.where(at, i2, i_s)),
        )
        new_j = jnp.where(
            at & (is_mm | is_del | post_del), j - 1,
            jnp.where(at & (is_ycp | post_ycp), 0, j_s),
        )
        new_ca = jnp.where(
            at & is_del, db2, jnp.where(post_del, db0, ca_s)
        )
        new_us = jnp.where(
            at, jnp.where(is_del | post_del, 0, 1), us_s
        )
        new_dn = jnp.where(finish | post_start, 1, dn_s)
        return new_i, new_j, new_ca, new_us, new_dn

    st = jax.lax.fori_loop(
        0, K, column, (icur[:], jcur[:], carried[:], use_s[:], done[:])
    )
    icur[:], jcur[:], carried[:], use_s[:], done[:] = st


def sweep_walk_custom(tb_cols0, tbfix, lx_cols0, lx_n, mlens, nlens):
    """Column-sweep walk with every clip layer live (local/custom modes).

    ``tb_cols0``: (Np+1, X, B) uint16 — column 0 (the init column's tb)
    followed by the kernel columns 1..N; ``lx_cols0``: (Np+1, B) int32
    per-column Lx including Lx[0]; ``lx_n``: (B,) the fixups-patched Lx
    at each lane's final column.

    Returns (pre, ins_cnt, exit_op, exit_len, post — all (Np+1, B) —
    fix_codes (B, 4), fix_lens (B, 4), xstart, ystart, xend, yend)."""
    Nc, X, B = tb_cols0.shape
    (
        fix_codes, fix_lens, i1, j1, ca1, us1, dn1,
        xstart0, ystart0, xend0, yend0,
    ) = _resolve_fixed_column_custom(tbfix, lx_n, mlens, nlens)

    block_b, K = _pick_block_walk(B, X, Nc)
    n_chunks = -(-Nc // K)
    Npad = n_chunks * K
    if Npad != Nc:
        tb_cols0 = jnp.pad(tb_cols0, ((0, Npad - Nc), (0, 0), (0, 0)))
        lx_cols0 = jnp.pad(lx_cols0, ((0, Npad - Nc), (0, 0)))
    grid = (B // block_b, n_chunks)
    out = pl.pallas_call(
        _kernel_sweep_walk_custom,
        interpret=jax.default_backend() == "cpu",
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_b), lambda b, c: (0, b))
            for _ in range(6)
        ]
        + [
            pl.BlockSpec(
                (K, X, block_b), lambda b, c, n=n_chunks: (n - 1 - c, 0, b)
            ),
            pl.BlockSpec(
                (K, 1, block_b), lambda b, c, n=n_chunks: (n - 1 - c, 0, b)
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (K, 1, block_b), lambda b, c, n=n_chunks: (n - 1 - c, 0, b)
            )
            for _ in range(5)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Npad, 1, B), jnp.uint16) for _ in range(5)
        ],
        scratch_shapes=[pltpu.VMEM((1, block_b), I32) for _ in range(5)],
    )(
        i1.reshape(1, B),
        j1.reshape(1, B),
        ca1.reshape(1, B),
        us1.astype(I32).reshape(1, B),
        dn1.astype(I32).reshape(1, B),
        mlens.reshape(1, B),
        tb_cols0,
        lx_cols0[:, None, :],
    )
    pre, ins_cnt, exit_op, elen, post = (o[:Nc, 0] for o in out)

    jcols = jnp.arange(Nc, dtype=I32)[:, None]
    xcp_hit = exit_op == TB_XCLIP_PREFIX
    xstart = jnp.max(jnp.where(xcp_hit, elen.astype(I32), 0), axis=0)
    xstart = jnp.maximum(xstart, xstart0)
    xs_hit = pre > 0
    xend = jnp.where(
        jnp.any(xs_hit, axis=0),
        mlens - jnp.max(jnp.where(xs_hit, pre.astype(I32), 0), axis=0),
        xend0,
    )
    ycp_hit = (exit_op == TB_YCLIP_PREFIX) | (post == TB_YCLIP_PREFIX)
    ystart = jnp.max(jnp.where(ycp_hit, jcols, 0), axis=0)
    ystart = jnp.maximum(ystart, ystart0)
    return (
        pre, ins_cnt, exit_op, elen, post,
        fix_codes, fix_lens, xstart, ystart, xend, yend0,
    )
