"""Pallas TPU kernel: batched scaled linear-space PairHMM forward.

The XLA scan path (stats/pairhmm/device.py) materializes every
``associative_scan`` stage through HBM (~40 ops/row); this kernel keeps
the three state rows VMEM-resident across the whole read loop — the
gpuPairHMM structure mapped to TPU: DP columns on sublanes, batch on
lanes, the in-row Y-state recurrence ``f[j] = A[j] + B*f[j-1]`` as a
log-step prefix composition of affine maps in registers.

Numerics: f32 probability space with per-row rescaling (one log per row).
Lanes whose probability underflows the f32 dynamic range relative to the
dominant path return -inf; the caller (BatchPairHMMLinear) recomputes
those with the exact log-space kernel.

Orientation note (reference pairhmm.rs semantics): semiglobal mode frees
start/end gaps in X and consumes all of Y — for GATK-style likelihoods
P(read | haplotype), pass x = HAPLOTYPE, y = READ (a read passed as x
forces a giant gap run and underflows into the exact-kernel fallback).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
I32 = jnp.int32


def _prefix_affine(A, B):
    """f[j] = A[j] + B[j] * f[j-1], f[-1] = 0, along axis 0 (sublanes)."""
    n = A.shape[0]
    k = 1
    while k < n:
        As = jnp.concatenate([jnp.zeros((k,) + A.shape[1:], A.dtype), A[:-k]], 0)
        Bs = jnp.concatenate([jnp.ones((k,) + B.shape[1:], B.dtype), B[:-k]], 0)
        A = A + B * As
        B = B * Bs
        k *= 2
    return A


def _kernel(par_ref, xt_ref, yt_ref, xl_ref, yl_ref, out_ref, FM, FX, FY, LS, ACC, semiglobal: int):
    ng = par_ref[0]
    ngx = par_ref[1]
    ngy = par_ref[2]
    gx = par_ref[3]
    gy = par_ref[4]
    gxe = par_ref[5]
    gye = par_ref[6]
    pm = par_ref[7]
    pmm = par_ref[8]
    pge = par_ref[9]

    M, BB = xt_ref.shape
    Np1 = FM.shape[0]
    N = Np1 - 1
    rows = jax.lax.broadcasted_iota(I32, (Np1, BB), 0)
    xlens = xl_ref[:]  # (1, BB)
    ylens = yl_ref[:]
    yt = yt_ref[:]  # (N, BB)
    is_end = rows == ylens  # (Np1, BB)

    FM[:] = jnp.where(rows == 0, 1.0, 0.0).astype(F32)
    FX[:] = jnp.zeros((Np1, BB), F32)
    FY[:] = jnp.zeros((Np1, BB), F32)
    LS[:] = jnp.zeros((1, BB), F32)
    ACC[:] = jnp.zeros((1, BB), F32)
    Bext = jnp.full((N, BB), pge * gxe, F32)  # hoisted loop invariant

    def row(i, _):
        fm, fx, fy = FM[:], FX[:], FY[:]
        active = i < xlens  # (1, BB)

        if semiglobal:
            unit = jnp.exp(-LS[:])  # probability 1 in current scale
            bound = jnp.where(i == 0, 2.0 * unit, unit)
            fm = jnp.where(
                (rows == 0) & active, jnp.broadcast_to(bound, (Np1, BB)), fm
            )

        xi = xt_ref[pl.ds(i, 1)]  # (1, BB)
        eq = (yt == xi).astype(F32)  # (N, BB)
        emit = pmm + (pm - pmm) * eq

        zero = jnp.zeros((1, BB), F32)
        m_in = ng * fm[:-1] + ngx * fx[:-1] + ngy * fy[:-1]
        fm_new = jnp.concatenate([zero, emit * m_in], 0)
        fx_new = jnp.concatenate(
            [zero, pge * (gy * fm[1:] + gye * fx[1:])], 0
        )
        A = pge * gx * fm_new[:-1]
        fy_new = jnp.concatenate([zero, _prefix_affine(A, Bext)], 0)

        if semiglobal:
            row_p = jnp.sum(
                jnp.where(is_end, fm_new + fx_new + fy_new, 0.0),
                axis=0, keepdims=True,
            )
            ACC[:] = ACC[:] + jnp.where(active, row_p, 0.0)

        mx = jnp.max(
            jnp.maximum(jnp.maximum(fm_new, fx_new), fy_new),
            axis=0, keepdims=True,
        )
        scale = jnp.where(active, jnp.maximum(mx, 1e-30), 1.0)
        inv = 1.0 / scale
        FM[:] = jnp.where(active, fm_new * inv, fm)
        FX[:] = jnp.where(active, fx_new * inv, fx)
        FY[:] = jnp.where(active, fy_new * inv, fy)
        ACC[:] = ACC[:] * inv
        LS[:] = LS[:] + jnp.log(scale)
        return 0

    jax.lax.fori_loop(0, M, row, 0)

    if semiglobal:
        p_lin = ACC[:]
    else:
        p_lin = jnp.sum(
            jnp.where(is_end, FM[:] + FX[:] + FY[:], 0.0),
            axis=0, keepdims=True,
        )
    out_ref[:] = jnp.where(
        p_lin > 0,
        jnp.minimum(jnp.log(jnp.maximum(p_lin, 1e-38)) + LS[:], 0.0),
        jnp.float32(-3.0e38),
    )


@partial(jax.jit, static_argnames=("semiglobal", "block_b"))
def pairhmm_fwd_scaled(
    xs, ys, xlens, ylens, params, semiglobal: bool, block_b: int = 256
):
    """(B,) f32 log-likelihoods. ``params``: (10,) f32 probabilities
    [no_gap, no_gap_x_ext, no_gap_y_ext, gap_x, gap_y, gap_x_ext,
    gap_y_ext, p_match, p_mismatch, p_gap_emit]."""
    B, M = xs.shape
    N = ys.shape[1]
    assert B % block_b == 0
    xt = jnp.transpose(xs.astype(I32), (1, 0))
    yt = jnp.transpose(ys.astype(I32), (1, 0))
    out = pl.pallas_call(
        partial(_kernel, semiglobal=int(semiglobal)),
        interpret=jax.default_backend() == "cpu",
        grid=(B // block_b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((M, block_b), lambda b: (0, b)),
            pl.BlockSpec((N, block_b), lambda b: (0, b)),
            pl.BlockSpec((1, block_b), lambda b: (0, b)),
            pl.BlockSpec((1, block_b), lambda b: (0, b)),
        ],
        out_specs=pl.BlockSpec((1, block_b), lambda b: (0, b)),
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((N + 1, block_b), jnp.float32),
            pltpu.VMEM((N + 1, block_b), jnp.float32),
            pltpu.VMEM((N + 1, block_b), jnp.float32),
            pltpu.VMEM((1, block_b), jnp.float32),
            pltpu.VMEM((1, block_b), jnp.float32),
        ],
    )(
        jnp.asarray(params, jnp.float32),
        xt,
        yt,
        xlens.reshape(1, B).astype(I32),
        ylens.reshape(1, B).astype(I32),
    )
    return out[0]
