"""Pallas SW kernels vs the XLA batched oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rust_bio_tpu.alignment.pairwise.batched import BatchAligner
from rust_bio_tpu.alignment.pairwise.scoring import Scoring
from rust_bio_tpu.ops.sw_pallas import (
    subs_tensor,
    sw_scores_global,
    sw_scores_global_matchparams,
)


def _rand_batch(rng, B, M, N):
    xb = rng.integers(0, 4, size=(B, M)).astype(np.uint8) + ord("A")
    yb = rng.integers(0, 4, size=(B, N)).astype(np.uint8) + ord("A")
    mlens = rng.integers(1, M + 1, size=B).astype(np.int32)
    nlens = rng.integers(1, N + 1, size=B).astype(np.int32)
    return xb, yb, mlens, nlens


def _oracle_scores(scoring, xb, yb, mlens, nlens):
    ba = BatchAligner(scoring)
    xs = [xb[i, : mlens[i]].tobytes() for i in range(len(xb))]
    ys = [yb[i, : nlens[i]].tobytes() for i in range(len(yb))]
    return ba.scores(xs, ys, "global")


def test_pallas_matchparams_matches_oracle():
    rng = np.random.default_rng(0)
    B, M, N = 256, 20, 26
    xb, yb, mlens, nlens = _rand_batch(rng, B, M, N)
    scoring = Scoring.from_scores(-5, -1, 2, -2)
    got = np.asarray(
        sw_scores_global_matchparams(
            jnp.asarray(xb), jnp.asarray(yb),
            jnp.asarray(mlens), jnp.asarray(nlens),
            2, -2, -5, -1, block_b=128,
        )
    )
    want = _oracle_scores(scoring, xb, yb, mlens, nlens)
    np.testing.assert_array_equal(got, want)


def test_pallas_subs_tensor_kernel_matches_oracle():
    rng = np.random.default_rng(1)
    B, M, N = 128, 16, 18
    xb, yb, mlens, nlens = _rand_batch(rng, B, M, N)
    scoring = Scoring.from_scores(-3, -1, 1, -1)
    lut = jnp.asarray(scoring.dense_lut())
    subs = subs_tensor(jnp.asarray(xb), jnp.asarray(yb), lut)
    got = np.asarray(
        sw_scores_global(
            subs, jnp.asarray(mlens), jnp.asarray(nlens), -3, -1, block_b=128
        )
    )
    want = _oracle_scores(scoring, xb, yb, mlens, nlens)
    np.testing.assert_array_equal(got, want)
