import numpy as np
import pytest

from rust_bio_tpu.utils import Interval, fastexp, prescan, scan
from rust_bio_tpu.utils.interval import IntervalError


def test_scan():
    assert scan([1, 0, 0, 1], lambda a, b: a + b) == [1, 1, 1, 2]


def test_prescan():
    assert prescan([1, 0, 0, 1], 0, lambda a, b: a + b) == [0, 1, 1, 1]


def test_interval():
    iv = Interval(2, 5)
    assert len(iv) == 3
    assert 2 in iv and 4 in iv and 5 not in iv
    with pytest.raises(IntervalError):
        Interval(5, 2)


def test_fastexp_matches_reference_tolerances():
    # mirrors reference src/utils/fastexp.rs tests
    assert np.isclose(fastexp(np.log(1e-15)), 1e-15, rtol=1e-8)
    assert abs(fastexp(np.log(1e-8)) - 1e-8) < 2e-14
    assert abs(fastexp(np.log(0.5)) - 0.5) < 0.01
    x = -159.000_000_023_278_6
    assert np.isclose(fastexp(x), np.exp(x), rtol=1e-6)


def test_fastexp_jax_bit_parity_with_numpy():
    import jax

    from rust_bio_tpu.utils import fastexp_jax

    xs = np.linspace(-300, 10, 1001)
    a = fastexp(xs)
    with jax.enable_x64(True):
        b = np.asarray(fastexp_jax(xs))
    np.testing.assert_array_equal(a, b)
