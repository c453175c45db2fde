"""Batched HMM inference on TPU (discrete emissions).

TPU-native redesign of the reference's sequential viterbi/forward/backward
(hmm/mod.rs:375-519): B observation sequences advance in lockstep through
one ``lax.scan`` over time; the per-step state update is an (S, S)
transition matrix contraction, so for realistic state counts the work
lands on the VPU/MXU instead of Python loops. Variable sequence lengths
are handled with freeze masks; outputs match the host oracle
(``stats.hmm.viterbi/forward/backward``) to float tolerance and the
Viterbi path exactly (argmax ties broken toward the lowest state index,
like ``np.argmax``).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

F32 = jnp.float32
NEG = -3.0e38


def _lae(a, b):
    hi = jnp.maximum(a, b)
    lo = jnp.minimum(a, b)
    out = hi + jnp.log1p(jnp.exp(jnp.maximum(lo - hi, -87.0)))
    return jnp.where(lo <= NEG / 2, hi, out)


def _lse_last(x):
    """ln-sum-exp over the last axis, NEG-surrogate safe."""
    hi = jnp.max(x, axis=-1, keepdims=True)
    s = jnp.sum(jnp.exp(jnp.maximum(x - hi, -87.0)), axis=-1)
    out = hi[..., 0] + jnp.log(s)
    return jnp.where(hi[..., 0] <= NEG / 2, hi[..., 0], out)


def _emission_rows(obs, Bm):
    """(T, B, S) emission rows for int observations via one one-hot einsum
    (the per-step ``Bm[:, o]`` gather scalarizes inside ``lax.scan``)."""
    V = Bm.shape[1]
    oh = jax.nn.one_hot(obs, V, dtype=Bm.dtype)  # (B, T, V)
    return jnp.einsum("btv,sv->tbs", oh, Bm)


def _backtrack_paths(frms, last):
    """Viterbi path from stored argmax tables in LOG depth.

    The sequential backtrack ``path[t] = frms[t][path[t+1]]`` is a
    composition of integer maps {0..S-1} -> {0..S-1}; map composition is
    associative and exact, so a reverse ``associative_scan`` replaces the
    T-step pointer chase with ~log2(T) vectorized gather passes.  Tie
    semantics are untouched (the maps themselves are the scan's argmax
    output).  ``frms``: (T-1, B, S); ``last``: (B,).  Returns (B, T)."""

    S = frms.shape[-1]
    ks = jnp.arange(S, dtype=frms.dtype)

    def compose(f, g):
        # under reverse=True the scan feeds the HIGHER-t operand first, so
        # the lower-t map g applies after f: h[s] = g[f[s]] (verified
        # against the sequential pointer chase in tests/test_hmm.py).
        # gathers scalarize on TPU — blend arithmetically over the S
        # possible values instead (exact: integer masks on integer maps)
        h = jnp.zeros_like(f)
        for k in range(S):
            h = h + jnp.where(f == ks[k], g[..., k : k + 1], 0)
        return h

    suffix = jax.lax.associative_scan(compose, frms, reverse=True)
    # path[t] = suffix[t][last] for t in 0..T-2, then the final state —
    # again a masked sum instead of a lane gather
    path_head = jnp.zeros(suffix.shape[:2], dtype=frms.dtype)
    for k in range(S):
        path_head = path_head + jnp.where(
            last[None, :] == ks[k], suffix[..., k], 0
        )
    path = jnp.concatenate([path_head, last[None, :]], axis=0)
    return jnp.swapaxes(path, 0, 1)


class BatchDiscreteHMM:
    """Batched inference for one discrete-emission HMM over B sequences.

    ``transition`` (S, S), ``observation`` (S, V), ``initial`` (S,): log
    probabilities (ln(0) may be -inf; converted to a finite surrogate).
    """

    def __init__(self, transition, observation, initial, end=None) -> None:
        def fin(a):
            a = np.asarray(a, np.float64)
            return jnp.asarray(np.where(np.isneginf(a), NEG, a), F32)

        self.A = fin(transition)  # (S, S) ln P(from -> to)
        self.Bm = fin(observation)  # (S, V)
        self.pi = fin(initial)  # (S,)
        S = self.A.shape[0]
        self.end = fin(end) if end is not None else jnp.zeros(S, F32)

    @partial(jax.jit, static_argnums=0)
    def _viterbi(self, obs, lens):
        A, Bm, pi = self.A, self.Bm, self.pi
        B, T = obs.shape
        S = A.shape[0]
        # all emissions in ONE one-hot contraction before the scan (MXU):
        # a per-step Bm[:, o] gather inside lax.scan scalarizes on TPU
        e_all = _emission_rows(obs, Bm)  # (T, B, S)

        def step(carry, xs):
            v, t, e = carry, xs[0], xs[1]
            # cand[b, k, j] = v[b, k] + A[k, j]
            cand = v[:, :, None] + A[None, :, :]
            best = jnp.max(cand, axis=1) + e  # (B, S)
            frm = jnp.argmax(cand, axis=1)  # (B, S)
            active = (t < lens)[:, None]
            v_new = jnp.where(active, best, v)
            # frozen steps store the identity map so the suffix composition
            # below passes the held state straight through
            ident = jnp.broadcast_to(
                jnp.arange(S, dtype=frm.dtype)[None, :], frm.shape
            )
            return v_new, jnp.where(active, frm, ident)

        v0 = pi[None, :] + e_all[0]
        v_fin, frms = jax.lax.scan(
            step,
            v0,
            (jnp.arange(1, T, dtype=jnp.int32), e_all[1:]),
            unroll=8,
        )
        v_end = v_fin + self.end[None, :]
        last = jnp.argmax(v_end, axis=1)  # (B,)
        prob = jnp.take_along_axis(v_end, last[:, None], 1)[:, 0]
        path = _backtrack_paths(frms, last)
        return path, prob

    @partial(jax.jit, static_argnums=0)
    def _forward(self, obs, lens):
        A, Bm, pi = self.A, self.Bm, self.pi
        B, T = obs.shape
        e_all = _emission_rows(obs, Bm)  # (T, B, S)

        def step(v, xs):
            t, e = xs
            # lse over source k of v[b, k] + A[k, j]
            cand = jnp.swapaxes(v[:, :, None] + A[None, :, :], 1, 2)
            nxt = _lse_last(cand) + e  # (B, S)
            active = (t < lens)[:, None]
            v = jnp.where(active, nxt, v)
            return v, v

        v0 = pi[None, :] + e_all[0]
        v_fin, vs = jax.lax.scan(
            step,
            v0,
            (jnp.arange(1, T, dtype=jnp.int32), e_all[1:]),
            unroll=8,
        )
        tot = _lse_last(v_fin + self.end[None, :])
        vals = jnp.concatenate([v0[None], vs], axis=0)  # (T, B, S)
        return jnp.swapaxes(vals, 0, 1), tot

    @partial(jax.jit, static_argnums=0)
    def _backward(self, obs, lens):
        A, Bm = self.A, self.Bm
        B, T = obs.shape
        S = A.shape[0]

        # b[t, k] = lse_j A[k, j] + e_j(o[t+1]) + b[t+1, j]
        def step(v, xs):
            t, o = xs  # o = obs at time t+1
            e = Bm[:, o].T  # (B, S)
            nxt = _lse_last(A[None, :, :] + (e + v)[:, None, :])  # (B, S)
            # sequences shorter than t+2 have not started: keep v
            active = ((t + 1) < lens)[:, None]
            return jnp.where(active, nxt, v), None

        # run on reversed padded time; for per-lane lengths, align obs so
        # the recursion only fires while t+1 < len (padding is frozen)
        v = jnp.zeros((B, S), F32)  # ln(1) at the last position
        vals = [v]
        ts = jnp.arange(T - 2, -1, -1, dtype=jnp.int32)

        def scan_step(v, t):
            o = obs[jnp.arange(B), jnp.minimum(t + 1, lens - 1)]
            nv, _ = step(v, (t, o))
            return nv, nv

        v_fin, vs = jax.lax.scan(scan_step, v, ts)
        vals = jnp.concatenate([jnp.zeros((1, B, S), F32), vs], axis=0)
        tot = _lse_last(
            v_fin + self.pi[None, :] + Bm[:, obs[:, 0]].T
        )
        return jnp.swapaxes(vals, 0, 1), tot  # rows in reverse time order

    def _pad(self, seqs):
        B = len(seqs)
        T = max(len(s) for s in seqs)
        obs = np.zeros((B, T), np.int32)
        lens = np.zeros(B, np.int32)
        for i, s in enumerate(seqs):
            obs[i, : len(s)] = np.asarray(s, np.int32)
            lens[i] = len(s)
        return jnp.asarray(obs), jnp.asarray(lens)

    def viterbi_batch(self, seqs) -> Tuple[np.ndarray, np.ndarray]:
        """(paths (B, T) int32 [padded tail repeats the last state],
        log-probs (B,))."""
        obs, lens = self._pad(seqs)
        paths, prob = self._viterbi(obs, lens)
        return np.asarray(paths), np.asarray(prob, np.float64)

    def forward_batch(self, seqs) -> Tuple[np.ndarray, np.ndarray]:
        obs, lens = self._pad(seqs)
        vals, tot = self._forward(obs, lens)
        return np.asarray(vals, np.float64), np.asarray(tot, np.float64)

    def backward_batch(self, seqs) -> Tuple[np.ndarray, np.ndarray]:
        obs, lens = self._pad(seqs)
        vals, tot = self._backward(obs, lens)
        return np.asarray(vals, np.float64), np.asarray(tot, np.float64)


class BatchGaussianHMM(BatchDiscreteHMM):
    """Batched inference for univariate-Gaussian emissions.

    ``params``: list of (mean, std) per state; observations are float
    sequences. Emission log-densities are computed on the fly, so the
    discrete kernels are reused by substituting the emission lookup.
    """

    def __init__(self, transition, params, initial, end=None) -> None:
        S = len(params)
        super().__init__(
            transition, np.zeros((S, 1)), initial, end
        )  # observation table unused
        mu = np.array([m for m, _ in params], np.float64)
        sd = np.array([s for _, s in params], np.float64)
        self.mu = jnp.asarray(mu, F32)
        self.log_norm = jnp.asarray(
            -0.5 * np.log(2 * np.pi) - np.log(sd), F32
        )
        self.inv2var = jnp.asarray(0.5 / (sd * sd), F32)

    def _emit(self, o):
        """(B,) float obs -> (B, S) log densities."""
        d = o[:, None] - self.mu[None, :]
        return self.log_norm[None, :] - d * d * self.inv2var[None, :]

    @partial(jax.jit, static_argnums=0)
    def _viterbi(self, obs, lens):
        A, pi = self.A, self.pi
        B, T = obs.shape

        S = A.shape[0]

        def step(carry, xs):
            v, t = carry, xs[0]
            e = self._emit(xs[1])
            cand = v[:, :, None] + A[None, :, :]
            best = jnp.max(cand, axis=1) + e
            frm = jnp.argmax(cand, axis=1)
            active = (t < lens)[:, None]
            v_new = jnp.where(active, best, v)
            ident = jnp.broadcast_to(
                jnp.arange(S, dtype=frm.dtype)[None, :], frm.shape
            )
            return v_new, jnp.where(active, frm, ident)

        v0 = pi[None, :] + self._emit(obs[:, 0])
        v_fin, frms = jax.lax.scan(
            step, v0,
            (jnp.arange(1, T, dtype=jnp.int32), jnp.swapaxes(obs[:, 1:], 0, 1)),
            unroll=8,
        )
        v_end = v_fin + self.end[None, :]
        last = jnp.argmax(v_end, axis=1)
        prob = jnp.take_along_axis(v_end, last[:, None], 1)[:, 0]
        path = _backtrack_paths(frms, last)
        return path, prob

    @partial(jax.jit, static_argnums=0)
    def _forward(self, obs, lens):
        A, pi = self.A, self.pi
        B, T = obs.shape

        def step(v, xs):
            t, o = xs
            e = self._emit(o)
            cand = jnp.swapaxes(v[:, :, None] + A[None, :, :], 1, 2)
            nxt = _lse_last(cand) + e
            v = jnp.where((t < lens)[:, None], nxt, v)
            return v, v

        v0 = pi[None, :] + self._emit(obs[:, 0])
        v_fin, vs = jax.lax.scan(
            step, v0,
            (jnp.arange(1, T, dtype=jnp.int32), jnp.swapaxes(obs[:, 1:], 0, 1)),
        )
        tot = _lse_last(v_fin + self.end[None, :])
        vals = jnp.concatenate([v0[None], vs], axis=0)
        return jnp.swapaxes(vals, 0, 1), tot

    def _pad(self, seqs):
        B = len(seqs)
        T = max(len(s) for s in seqs)
        obs = np.zeros((B, T), np.float32)
        lens = np.zeros(B, np.int32)
        for i, s in enumerate(seqs):
            obs[i, : len(s)] = np.asarray(s, np.float32)
            lens[i] = len(s)
        return jnp.asarray(obs), jnp.asarray(lens)


def baum_welch_batch(
    model: BatchDiscreteHMM, seqs, n_iter: int = 1, vocab: Optional[int] = None
):
    """Multi-sequence Baum-Welch (standard extension of hmm/mod.rs:520).

    E-steps run on the batched device forward/backward kernels; expected
    counts aggregate across sequences in f64 on the host (the reference's
    single-sequence update is the B == 1 specialization). Returns
    (trained BatchDiscreteHMM, per-iteration total log-likelihoods).
    """
    A = np.asarray(model.A, np.float64)
    Bm = np.asarray(model.Bm, np.float64)
    pi = np.asarray(model.pi, np.float64)
    S, V = Bm.shape
    if vocab is not None:
        V = vocab
        Bm = Bm[:, :V]
    lens = np.array([len(s) for s in seqs])
    T = int(lens.max())
    Bsz = len(seqs)
    obs = np.zeros((Bsz, T), np.int64)
    for i, s in enumerate(seqs):
        obs[i, : len(s)] = np.asarray(s)
    lls = []

    def lse(a, axis=None):
        with np.errstate(divide="ignore"):
            hi = np.max(a, axis=axis, keepdims=True)
            out = hi + np.log(np.sum(np.exp(a - hi), axis=axis, keepdims=True))
            out = np.where(np.isfinite(hi), out, hi)
        return np.squeeze(out, axis=axis) if axis is not None else float(out)

    m = model
    for _ in range(n_iter):
        f, ftot = m.forward_batch(seqs)  # (B, T, S), (B,)
        bv, _ = m.backward_batch(seqs)
        # backward rows come in reverse time order with short lanes at the
        # END of the padded axis (row T-1-t = time t), so one flip aligns
        # every lane; rows t >= len are garbage and masked below
        btab = bv[:, ::-1]
        tmask = np.arange(T)[None, :] < lens[:, None]  # (B, T)
        ab = f + btab  # (B, T, S)
        probx = ftot  # (B,) total ln P(x)
        lls.append(float(np.sum(probx)))
        gamma = ab - probx[:, None, None]
        gamma = np.where(tmask[:, :, None], gamma, -np.inf)

        # expected transition counts: xi[b,t,j,i], t >= 1
        with np.errstate(invalid="ignore"):
            emis = Bm.T[obs[:, 1:]]  # (B, T-1, S): ln B[i, o_t]
            xi = (
                f[:, :-1, :, None]
                + A[None, None, :, :]
                + (btab[:, 1:, :] + emis)[:, :, None, :]
                - probx[:, None, None, None]
            )
        xi = np.where(tmask[:, 1:, None, None], xi, -np.inf)

        # aggregate in probability domain across sequences and time
        trans_num = lse(xi.reshape(-1, S, S), axis=0)  # (S, S) logs
        gamma_sum = lse(gamma.reshape(-1, S), axis=0)  # (S,)
        last = gamma[np.arange(Bsz), lens - 1]  # (B, S) end mass
        end_mass = lse(last, axis=0)
        with np.errstate(divide="ignore", invalid="ignore"):
            denom = np.log(
                np.maximum(np.exp(gamma_sum) - np.exp(end_mass), 1e-300)
            )
        A_new = trans_num - denom[:, None]

        obs_hat = np.full((S, V), -np.inf)
        for v in range(V):
            sel = np.where((obs == v)[:, :, None] & tmask[:, :, None], gamma, -np.inf)
            obs_hat[:, v] = lse(sel.reshape(-1, S), axis=0)
        B_new = obs_hat - gamma_sum[:, None]
        pi_new = lse(gamma[:, 0, :], axis=0) - np.log(Bsz)

        A, Bm, pi = A_new, B_new, pi_new
        m = BatchDiscreteHMM(A, Bm, pi)
    return m, lls
