"""Sequence distances: Hamming and Levenshtein, scalar + batched device.

Reference parity: src/alignment/distance.rs — ``hamming`` (:25),
``levenshtein`` (:59, via the editdistancek crate), and the ``simd``
submodule (:101-182, triple_accel/exp-search) whose TPU-native equivalents
are the batched kernels here (``hamming_batch``/``levenshtein_batch``):
the SIMD registers of the reference become vector lanes over a pair batch.

Levenshtein is global edit distance; the batched device path runs the Myers
bit-vector recurrence per lane with a +1/-1 horizontal delta tracked at the
last row — identical numbers to the scalar DP (property-tested).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Sequence

import numpy as np

from rust_bio_tpu.utils.text import to_array, to_bytes


def hamming(alpha, beta) -> int:
    """Hamming distance of equal-length texts (distance.rs:25).

    >>> hamming(b"GTCTGCATGCG", b"TTTAGCTAGCG")
    5
    """
    a, b = to_array(alpha), to_array(beta)
    assert len(a) == len(b), (
        "hamming distance cannot be calculated for texts of different length "
        f"({len(a)}!={len(b)})"
    )
    return int(np.count_nonzero(a != b))


def levenshtein(alpha, beta) -> int:
    """Global edit distance (distance.rs:59).

    >>> levenshtein(b"ACCGTGGAT", b"AAAAACCGTTGAT")
    5
    """
    a, b = to_bytes(alpha), to_bytes(beta)
    if len(a) == 0:
        return len(b)
    if len(b) == 0:
        return len(a)
    # Myers bit-parallel global edit distance over unbounded Python ints:
    # score tracked at the last row of the DP matrix, column 0 starts at i.
    m = len(a)
    full = (1 << m) - 1
    bound = 1 << (m - 1)
    peq = [0] * 256
    for i, c in enumerate(a):
        peq[c] |= 1 << i
    pv, mv = full, 0
    dist = m
    for c in b:
        eq = peq[c]
        xv = eq | mv
        xh = ((((eq & pv) + pv) & full) ^ pv) | eq
        ph = mv | (~(xh | pv) & full)
        mh = pv & xh
        if ph & bound:
            dist += 1
        elif mh & bound:
            dist -= 1
        ph = (ph << 1) & full | 1  # column 0 of the global DP grows by 1
        mh = (mh << 1) & full
        pv = (mh | (~(xv | ph) & full)) & full
        mv = ph & xv
    return dist


def bounded_levenshtein(alpha, beta, k: int) -> Optional[int]:
    """Levenshtein distance if <= k, else None (distance.rs:165)."""
    a, b = to_bytes(alpha), to_bytes(beta)
    if abs(len(a) - len(b)) > k:
        return None
    d = levenshtein(a, b)
    return d if d <= k else None


# ---------------------------------------------------------------------------
# Batched device path (the reference simd module's TPU equivalent)
# ---------------------------------------------------------------------------


def hamming_batch(alphas: Sequence, betas: Sequence) -> np.ndarray:
    """Batched Hamming distance over equal-length pair lanes."""
    import jax.numpy as jnp

    a0 = to_array(alphas[0])
    n = len(a0)
    B = len(alphas)
    ab = np.zeros((B, n), dtype=np.uint8)
    bb = np.zeros((B, n), dtype=np.uint8)
    for i, (x, y) in enumerate(zip(alphas, betas)):
        x, y = to_array(x), to_array(y)
        assert len(x) == len(y) == n, "hamming_batch requires uniform lengths"
        ab[i], bb[i] = x, y
    return np.asarray(
        jnp.sum(jnp.asarray(ab) != jnp.asarray(bb), axis=1, dtype=jnp.int32)
    )


@lru_cache(maxsize=8)
def _lev_kernel(W: int):
    import jax
    import jax.numpy as jnp
    from rust_bio_tpu.pattern_matching.myers_device import _add_words, _shl1

    U32 = jnp.uint32
    I32 = jnp.int32

    @jax.jit
    def kernel(peq, bound, ms, texts, tlens):
        B = peq.shape[0]
        bidx = jnp.arange(B)

        def step(carry, xs):
            pv, mv, dist = carry
            a, j = xs
            active = j < tlens
            eq = peq[bidx, a.astype(I32)]
            eqw = [eq[:, w] for w in range(W)]
            pvw = [pv[:, w] for w in range(W)]
            mvw = [mv[:, w] for w in range(W)]
            xv = [e | m for e, m in zip(eqw, mvw)]
            summed = _add_words([e & p for e, p in zip(eqw, pvw)], pvw)
            xh = [(s ^ p) | e for s, p, e in zip(summed, pvw, eqw)]
            ph = [m | ~(x | p) for m, x, p in zip(mvw, xh, pvw)]
            mh = [p & x for p, x in zip(pvw, xh)]
            phb = jnp.zeros(B, bool)
            mhb = jnp.zeros(B, bool)
            for w in range(W):
                phb = phb | ((ph[w] & bound[:, w]) != 0)
                mhb = mhb | ((mh[w] & bound[:, w]) != 0)
            dist2 = dist + phb.astype(I32) - mhb.astype(I32)
            ph = _shl1(ph)
            ph[0] = ph[0] | jnp.uint32(1)  # global mode: column 0 cost grows
            mh = _shl1(mh)
            pv_n = jnp.stack(
                [m | ~(x | p) for m, x, p in zip(mh, xv, ph)], axis=1
            )
            mv_n = jnp.stack([p & x for p, x in zip(ph, xv)], axis=1)
            keep = active[:, None]
            return (
                jnp.where(keep, pv_n, pv),
                jnp.where(keep, mv_n, mv),
                jnp.where(active, dist2, dist),
            ), None

        N = texts.shape[1]
        pv0 = jnp.full(peq.shape[:1] + (W,), jnp.uint32(0xFFFFFFFF), dtype=U32)
        mv0 = jnp.zeros_like(pv0)
        (pv, mv, dist), _ = jax.lax.scan(
            step,
            (pv0, mv0, ms),
            (jnp.swapaxes(texts, 0, 1), jnp.arange(N, dtype=I32)),
        )
        return dist

    return kernel


def levenshtein_batch(alphas: Sequence, betas: Sequence) -> np.ndarray:
    """Batched global edit distance (the reference simd::levenshtein)."""
    import jax.numpy as jnp

    pats = [to_bytes(a) for a in alphas]
    texts = [to_bytes(b) for b in betas]
    B = len(pats)
    out = np.zeros(B, dtype=np.int32)
    # empty-side lanes short-circuit (kernel requires m >= 1)
    run_idx = [i for i in range(B) if len(pats[i]) > 0 and len(texts[i]) > 0]
    for i in range(B):
        if len(pats[i]) == 0:
            out[i] = len(texts[i])
        elif len(texts[i]) == 0:
            out[i] = len(pats[i])
    if not run_idx:
        return out

    ms = np.array([len(pats[i]) for i in run_idx], dtype=np.int32)
    W = int((ms.max() + 31) // 32)
    Bk = len(run_idx)
    peq = np.zeros((Bk, 256, W), dtype=np.uint32)
    for k, i in enumerate(run_idx):
        for pos, c in enumerate(pats[i]):
            peq[k, c, pos >> 5] |= np.uint32(1) << np.uint32(pos & 31)
    bound = np.zeros((Bk, W), dtype=np.uint32)
    bound[np.arange(Bk), (ms - 1) >> 5] = np.uint32(1) << (
        (ms - 1) & 31
    ).astype(np.uint32)
    N = max(len(texts[i]) for i in run_idx)
    tb = np.zeros((Bk, N), dtype=np.uint8)
    tlens = np.zeros(Bk, dtype=np.int32)
    for k, i in enumerate(run_idx):
        t = texts[i]
        tb[k, : len(t)] = np.frombuffer(t, dtype=np.uint8)
        tlens[k] = len(t)

    dist = np.asarray(
        _lev_kernel(W)(
            jnp.asarray(peq),
            jnp.asarray(bound),
            jnp.asarray(ms),
            jnp.asarray(tb),
            jnp.asarray(tlens),
        )
    )
    out[run_idx] = dist
    return out


def bounded_levenshtein_batch(alphas, betas, k: int) -> list:
    """Batched bounded distance; None where > k."""
    d = levenshtein_batch(alphas, betas)
    return [int(x) if x <= k else None for x in d]


# the reference exposes these under a `simd` submodule; mirror that surface
class simd:
    hamming = staticmethod(hamming)
    levenshtein = staticmethod(levenshtein)
    bounded_levenshtein = staticmethod(bounded_levenshtein)
    hamming_batch = staticmethod(hamming_batch)
    levenshtein_batch = staticmethod(levenshtein_batch)
    bounded_levenshtein_batch = staticmethod(bounded_levenshtein_batch)
