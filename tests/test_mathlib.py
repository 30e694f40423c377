"""matematicose-equivalent toolbox tests (SURVEY §2 #9)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_smc import mathlib as m


def test_variance_matches_reference_formula():
    a = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    # E[x^2] - E[x]^2 (population variance), matematicose.c:97-104
    assert float(m.variance(a)) == pytest.approx(np.var([1, 2, 3, 4]))


def test_secant_finds_root():
    f = lambda x: x * x - 2.0
    x = m.secant(f, 0.0, 1.0, 2.0)
    assert float(x) == pytest.approx(np.sqrt(2.0), abs=1e-8)


def test_secant_with_offset_c():
    f = lambda x: x ** 3
    x = m.secant(f, 8.0, 1.0, 3.0)  # solve x^3 = 8
    assert float(x) == pytest.approx(2.0, abs=1e-8)


def test_find_zero_last_picks_rightmost():
    f = lambda x: jnp.sin(x)
    # zeros at pi and 2pi within [2, 7]; scanning down from 7 -> 2pi
    x = m.find_zero_last(f, 0.0, 2.0, 7.0)
    assert float(x) == pytest.approx(2 * np.pi, abs=1e-6)


def test_fast_bessel_recurrence():
    # spherical Bessel j_l at x=1: j0 = sin(1), j1 = sin1 - cos1
    x = 1.0
    j0 = np.sin(x) / x
    j1 = np.sin(x) / x**2 - np.cos(x) / x
    out = m.fast_bessel(jnp.asarray(x), 4, jnp.asarray([j0, j1]))
    j2 = (3 / x**2 - 1) * np.sin(x) / x - 3 * np.cos(x) / x**2
    assert float(out[2]) == pytest.approx(j2, rel=1e-10)


def test_der5_c_derivative():
    f = lambda x: x ** 3
    assert float(m.der5_c(f, 2.0, 1e-3)) == pytest.approx(12.0, rel=1e-8)


def test_simpson_integral():
    xs = np.linspace(0, np.pi, 101)
    vals = jnp.asarray(np.sin(xs))
    assert float(m.simpson(vals, xs[1] - xs[0])) == pytest.approx(2.0, rel=1e-6)


def test_grad_descent_finds_minimum():
    f = lambda x: (x - 1.5) ** 2
    x = m.grad_descent_1d(f, 0.0, 4.0)
    assert float(x) == pytest.approx(1.5, abs=1e-4)


def test_stochastic_grad_descent_multistart():
    # double well: global min at x = 3
    f = lambda x: (x * x - 1) ** 2 * 0.1 + (x - 3) ** 2 * 0.05
    x = m.stochastic_grad_descent_1d(f, -4.0, 4.0, n_starts=16)
    assert np.isfinite(float(x))
