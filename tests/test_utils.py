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


def test_profiling_stats_and_checked():
    import jax.numpy as jnp
    import numpy as np
    import pytest as _pytest

    from rust_bio_tpu.utils.profiling import Stats, annotate, checked

    st = Stats()
    st.record(reads=100, seconds=0.5)
    st.record(reads=300, seconds=1.5)
    s = st.summary()
    assert s["reads"] == 400 and s["batches"] == 2
    assert s["reads_per_s"] == _pytest.approx(200.0)

    with annotate("region"):
        pass

    def bad(x):
        return jnp.log(x)  # NaN for negative input

    good = checked(bad)
    assert np.isfinite(float(good(jnp.asarray(2.0))))
    with _pytest.raises(Exception):
        checked(lambda x: jnp.sqrt(x) / jnp.int32(0) if False else jnp.asarray([1.0, 2.0])[jnp.int32(5)])(jnp.asarray(0.0))
