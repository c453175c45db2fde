"""Bit-exact reimplementation of the reference's fast exp approximation.

Reference parity: src/utils/fastexp.rs (Kopczynski 2017 polynomial +
exponent-bit construction). The reference's ``LogProb`` arithmetic
(``ln_sum_exp`` etc.) uses this approximation, so log-likelihood parity
requires reproducing it exactly — including the truncation-towards-zero of
``x as i64`` and the coefficient values.

Two variants: a numpy one (host / oracle) and a JAX one (device kernels).
Both are vectorized over arrays.
"""

from __future__ import annotations

import numpy as np

_COEFF_0 = 1.0
_COEFF_1 = 4.831_794_110
_COEFF_2 = 0.143_440_676
_COEFF_3 = 0.019_890_581
_COEFF_4 = 0.006_935_931
_ONEBYLOG2 = 1.442_695_041
_OFFSET_F64 = 1023
_FRACTION_F64 = 52
_MIN_VAL = -500.0


def fastexp(v):
    """Vectorized numpy fastexp, bit-identical to the reference for f64."""
    v = np.asarray(v, dtype=np.float64)
    x = _ONEBYLOG2 * np.where(v > _MIN_VAL, v, _MIN_VAL)  # -inf masked below
    # Rust `x as i64` truncates toward zero.
    bits = np.trunc(x).astype(np.int64)
    x = x - bits.astype(np.float64)
    f2 = x.copy()
    x_tmp = x.copy()

    bits = (bits + _OFFSET_F64) << _FRACTION_F64

    f2 = f2 * _COEFF_4
    x_tmp = x_tmp + _COEFF_1
    f2 = f2 + _COEFF_3
    x_tmp = x_tmp * x
    f2 = f2 * x
    f2 = f2 + _COEFF_2
    f2 = f2 * x_tmp
    f2 = f2 + _COEFF_0

    pow2 = bits.view(np.uint64).view(np.float64)
    out = pow2 * f2
    return np.where(v > _MIN_VAL, out, 0.0)


def fastexp_jax(v):
    """JAX fastexp (f64; requires jax_enable_x64 for bit parity)."""
    import jax.numpy as jnp
    from jax import lax

    v = jnp.asarray(v, dtype=jnp.float64)
    x = _ONEBYLOG2 * v
    bits = jnp.trunc(x).astype(jnp.int64)
    x = x - bits.astype(jnp.float64)
    f2 = x
    x_tmp = x

    bits = (bits + _OFFSET_F64) << _FRACTION_F64

    f2 = f2 * _COEFF_4
    x_tmp = x_tmp + _COEFF_1
    f2 = f2 + _COEFF_3
    x_tmp = x_tmp * x
    f2 = f2 * x
    f2 = f2 + _COEFF_2
    f2 = f2 * x_tmp
    f2 = f2 + _COEFF_0

    pow2 = lax.bitcast_convert_type(bits, jnp.float64)
    out = pow2 * f2
    return jnp.where(v > _MIN_VAL, out, 0.0)
