"""Parity suite for HMM (reference: hmm/mod.rs tests)."""

import math

import numpy as np
import pytest

from rust_bio_tpu.stats.hmm import (
    DiscreteEmissionModel,
    DiscreteEmissionOptEndModel,
    GaussianModel,
    backward,
    baum_welch,
    forward,
    viterbi,
)

TRANS = [[0.5, 0.5], [0.4, 0.6]]
OBS = [[0.2, 0.3, 0.3, 0.2], [0.3, 0.2, 0.2, 0.3]]
INIT = [0.5, 0.5]


def _toy():
    return DiscreteEmissionModel.with_float(TRANS, OBS, INIT)


def test_discrete_viterbi_toy_example():
    path, log_prob = viterbi(_toy(), [2, 2, 1, 0, 1, 3, 2, 0, 0])
    assert path == [0, 0, 0, 1, 1, 1, 1, 1, 1]
    assert math.exp(log_prob) == pytest.approx(4.25e-8, abs=1e-9)


def test_discrete_forward_toy_example():
    _, log_prob = forward(_toy(), [2, 2, 1, 0])
    assert math.exp(log_prob) == pytest.approx(0.0038432, abs=0.0001)


def test_discrete_backward_toy_example():
    _, log_prob = backward(_toy(), [2, 2, 1, 0])
    assert math.exp(log_prob) == pytest.approx(0.0038432, abs=0.0001)


def test_discrete_forward_equals_backward():
    hmm = _toy()
    rng = np.random.default_rng(0)
    for n in range(1, 10):
        for _ in range(8):
            seq = rng.integers(0, 2, size=n).tolist()
            pf = math.exp(forward(hmm, seq)[1])
            pb = math.exp(backward(hmm, seq)[1])
            assert pf == pytest.approx(pb, abs=1e-5)


def _gauss():
    return GaussianModel.with_float(
        TRANS, [(0.0, 1.0), (2.0, 1.0)], INIT
    )


def test_gaussian_viterbi():
    path, log_prob = viterbi(
        _gauss(), [-0.1, 0.1, -0.2, 0.5, 0.8, 1.1, 1.2, 1.5, 0.5, 0.2]
    )
    assert path == [0, 0, 0, 0, 0, 1, 1, 1, 0, 0]
    assert math.exp(log_prob) == pytest.approx(2.64e-8, abs=1e-9)


def test_gaussian_forward_backward():
    obs = [0.1, 1.5, 1.8, 2.2, 0.5]
    assert math.exp(forward(_gauss(), obs)[1]) == pytest.approx(7.820e-4, abs=1e-5)
    assert math.exp(backward(_gauss(), obs)[1]) == pytest.approx(7.820e-4, abs=1e-5)


ICES = [1, 2, 2, 1, 2, 1, 2, 1, 1, 2, 0, 2, 2, 0, 0, 0, 1, 0, 0, 0, 2, 0,
        1, 0, 0, 0, 1, 2, 2, 1, 2, 1, 1]


def test_discrete_opt_end_backward():
    hmm = DiscreteEmissionOptEndModel.with_float(TRANS, OBS, INIT, None)
    _, log_prob = backward(hmm, [2, 2, 1, 0])
    assert math.exp(log_prob) == pytest.approx(0.0038432, abs=0.0001)


def test_discrete_with_end_backward():
    hmm = DiscreteEmissionOptEndModel.with_float(
        [[0.8, 0.1], [0.1, 0.8]],
        [[0.7, 0.2, 0.1], [0.1, 0.2, 0.7]],
        [0.5, 0.5],
        [0.1, 0.1],
    )
    _, log_prob = backward(hmm, ICES)
    assert math.exp(log_prob) == pytest.approx(0.912e-18, abs=0.1e-20)


def test_baum_welch_step_valid_distributions():
    hmm = DiscreteEmissionOptEndModel.with_float(
        [[0.8, 0.1], [0.1, 0.8]],
        [[0.7, 0.2, 0.1], [0.1, 0.2, 0.7]],
        [0.3, 0.7],
        [0.1, 0.1],
    )
    pi, A, B, E = baum_welch(hmm, ICES)
    # pi sums to 1, each B row sums to 1
    assert math.fsum(np.exp(pi)) == pytest.approx(1.0, abs=1e-3)
    for row in B:
        assert math.fsum(np.exp(row)) == pytest.approx(1.0, abs=1e-3)


def test_baum_welch_training_improves_likelihood():
    hmm = DiscreteEmissionOptEndModel.with_float(
        [[0.8, 0.1], [0.1, 0.8]],
        [[0.7, 0.2, 0.1], [0.1, 0.2, 0.7]],
        [0.3, 0.7],
        [0.1, 0.1],
    )
    _, p0 = forward(hmm, ICES)
    hmm.train_baum_welch([ICES], n_iter=5)
    _, p1 = forward(hmm, ICES)
    assert float(p1) >= float(p0) - 1e-9


# ---- device batch kernels vs host oracle ----

def test_batch_device_matches_host():
    import numpy as np

    from rust_bio_tpu.stats import hmm as H
    from rust_bio_tpu.stats.hmm.device import BatchDiscreteHMM

    rng = np.random.default_rng(41)
    S, V = 3, 4
    A = rng.dirichlet(np.ones(S), size=S)
    Bm = rng.dirichlet(np.ones(V), size=S)
    pi = rng.dirichlet(np.ones(S))
    model = H.DiscreteEmissionModel.with_float(A, Bm, pi)
    dev = BatchDiscreteHMM(np.log(A), np.log(Bm), np.log(pi))

    seqs = [
        list(rng.integers(0, V, size=int(rng.integers(1, 12))))
        for _ in range(9)
    ]
    paths, vprob = dev.viterbi_batch(seqs)
    fvals, ftot = dev.forward_batch(seqs)
    bvals, btot = dev.backward_batch(seqs)
    T = paths.shape[1]

    for b, s in enumerate(seqs):
        L = len(s)
        w_path, w_prob = H.viterbi(model, s)
        assert paths[b, :L].tolist() == w_path, (b, s)
        assert vprob[b] == pytest.approx(float(w_prob), rel=1e-4, abs=1e-4)

        w_fvals, w_ftot = H.forward(model, s)
        np.testing.assert_allclose(fvals[b, :L], w_fvals, rtol=1e-4, atol=1e-4)
        assert ftot[b] == pytest.approx(float(w_ftot), rel=1e-4, abs=1e-4)

        w_bvals, w_btot = H.backward(model, s)
        np.testing.assert_allclose(
            bvals[b, T - L :], w_bvals, rtol=1e-4, atol=1e-4
        )
        assert btot[b] == pytest.approx(float(w_btot), rel=1e-4, abs=1e-4)


def test_batch_gaussian_device_matches_host():
    import numpy as np

    from rust_bio_tpu.stats import hmm as H
    from rust_bio_tpu.stats.hmm.device import BatchGaussianHMM

    rng = np.random.default_rng(47)
    S = 3
    A = rng.dirichlet(np.ones(S), size=S)
    pi = rng.dirichlet(np.ones(S))
    params = [(0.0, 1.0), (5.0, 2.0), (-3.0, 0.5)]
    model = H.GaussianModel.with_float(A, params, pi)
    dev = BatchGaussianHMM(np.log(A), params, np.log(pi))

    seqs = [
        list(rng.normal(0, 4, size=int(rng.integers(1, 10))))
        for _ in range(7)
    ]
    paths, vprob = dev.viterbi_batch(seqs)
    fvals, ftot = dev.forward_batch(seqs)
    for b, s in enumerate(seqs):
        s32 = [float(np.float32(v)) for v in s]  # device pads in f32
        w_path, w_prob = H.viterbi(model, s32)
        assert paths[b, : len(s)].tolist() == w_path, (b, s)
        assert vprob[b] == pytest.approx(float(w_prob), rel=1e-3, abs=1e-3)
        w_fvals, w_ftot = H.forward(model, s32)
        np.testing.assert_allclose(
            fvals[b, : len(s)], w_fvals, rtol=1e-3, atol=1e-3
        )
        assert ftot[b] == pytest.approx(float(w_ftot), rel=1e-3, abs=1e-3)


def test_baum_welch_batch_single_seq_matches_host():
    import numpy as np

    from rust_bio_tpu.stats import hmm as H
    from rust_bio_tpu.stats.hmm.device import BatchDiscreteHMM, baum_welch_batch

    rng = np.random.default_rng(59)
    S, V = 2, 3
    A = rng.dirichlet(np.ones(S), size=S)
    Bm = rng.dirichlet(np.ones(V), size=S)
    pi = rng.dirichlet(np.ones(S))
    model = H.DiscreteEmissionModel.with_float(A, Bm, pi)
    seq = [0, 1, 2, 1, 0, 0, 2, 1]

    pi_h, A_h, B_h, _ = H.baum_welch(model, seq)
    dev = BatchDiscreteHMM(np.log(A), np.log(Bm), np.log(pi))
    m2, lls = baum_welch_batch(dev, [seq], n_iter=1, vocab=V)
    np.testing.assert_allclose(np.asarray(m2.A), A_h, atol=2e-3)
    np.testing.assert_allclose(np.asarray(m2.pi), pi_h, atol=2e-3)
    # host keys emissions by distinct observed symbol (all of 0..V-1 here)
    np.testing.assert_allclose(np.asarray(m2.Bm), B_h, atol=2e-3)


def test_baum_welch_batch_likelihood_increases():
    import numpy as np

    from rust_bio_tpu.stats.hmm.device import BatchDiscreteHMM, baum_welch_batch

    rng = np.random.default_rng(61)
    S, V = 3, 4
    A = rng.dirichlet(np.ones(S), size=S)
    Bm = rng.dirichlet(np.ones(V), size=S)
    pi = rng.dirichlet(np.ones(S))
    seqs = [list(rng.integers(0, V, size=int(rng.integers(4, 12)))) for _ in range(6)]
    dev = BatchDiscreteHMM(np.log(A), np.log(Bm), np.log(pi))
    m2, lls = baum_welch_batch(dev, seqs, n_iter=4, vocab=V)
    _, lls2 = baum_welch_batch(m2, seqs, n_iter=1, vocab=V)
    assert lls2[0] >= lls[0] - 1e-3
    assert all(b >= a - 1e-3 for a, b in zip(lls, lls[1:]))
