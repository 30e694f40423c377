"""Math utility toolbox — the matematicose.c/.h equivalent (SURVEY §2 #9).

The reference ships a personal numerics library (matematicose.h:6-28):
sums/means/variances, Hadamard product, argmin/argmax, approximate
equality, secant and bracketing root finders, a spherical-Bessel upward
recurrence, 3/5-point derivative stencils, Simpson integration and 1-D
(stochastic) gradient descent. Most of it is unused by the simulation,
but it is part of the reference's API surface, so it exists here as
jit-compatible JAX (data-dependent iteration via lax.while_loop instead
of C while loops).

Reference cites per function in the docstrings. The known `zeros()`
off-by-one (matematicose.c:65-69) has no analog — jnp.zeros is safe.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


# --- simple reductions (matematicose.c:17-104) -------------------------

def mean(a: jnp.ndarray) -> jnp.ndarray:
    """mean (matematicose.c:51-54)."""
    return jnp.mean(a)


def variance(a: jnp.ndarray) -> jnp.ndarray:
    """Population variance via E[x^2] - E[x]^2, exactly the reference's
    formula (matematicose.c:97-104)."""
    m = jnp.mean(a)
    return jnp.mean(a * a) - m * m


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """dot (matematicose.c:35-43)."""
    return jnp.sum(a * b)


def elforel(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hadamard ("element for element") product (matematicose.c:45-49)."""
    return a * b


def argmin(a: jnp.ndarray) -> jnp.ndarray:
    """double_min_index (matematicose.c:87-94)."""
    return jnp.argmin(a)


def argmax(a: jnp.ndarray) -> jnp.ndarray:
    """double_max_index (matematicose.c:79-86)."""
    return jnp.argmax(a)


def is_pico_equal(a, b) -> jnp.ndarray:
    """|a-b| < 1e-12 (matematicose.c:8-14)."""
    return jnp.abs(a - b) < 1e-12


# --- root finding (matematicose.c:107-169) ------------------------------

def secant(
    f: Callable, c: float, x1: float, x2: float,
    inf: float = -1e-10, sup: float = 1e-10, max_iter: int = 200,
) -> jnp.ndarray:
    """Secant iteration for f(x) = c with the reference's stopping band
    inf < f(x)-c < sup (matematicose.c:132-156), as a lax.while_loop."""

    def g(x):
        return f(x) - c

    def cond(carry):
        x1, x2, it = carry
        val = g(x2)
        return ((val < inf) | (val > sup)) & (it < max_iter)

    def body(carry):
        x1, x2, it = carry
        nxt = x2 - g(x2) * (x2 - x1) / (g(x2) - g(x1))
        return x2, nxt, it + 1

    x1 = jnp.asarray(x1, jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    x2 = jnp.asarray(x2, x1.dtype)
    _, x, _ = jax.lax.while_loop(cond, body, (x1, x2, 0))
    return x


def find_zero_last(
    f: Callable, c: float, x1: float, x2: float, steps: int = 1000, **kw
) -> jnp.ndarray:
    """Scan from x2 down to x1 for the LAST sign change of f(x)-c, then
    polish with the secant method (findzero_last, matematicose.c:158-169)."""
    xs = jnp.linspace(x2, x1, steps + 1)
    vals = jax.vmap(lambda x: f(x) - c)(xs)
    sign_change = vals[:-1] * vals[1:] < 0
    # first sign change when scanning downward from x2 = last in x
    idx = jnp.argmax(sign_change)
    lo, hi = xs[idx + 1], xs[idx]
    return secant(f, c, lo, hi, **kw)


# --- special functions / calculus (matematicose.c:171-231) ---------------

def fast_bessel(x: jnp.ndarray, lmax: int, j0: jnp.ndarray) -> jnp.ndarray:
    """Spherical-Bessel upward recurrence J_{l+1} = ((2l+1)/x) J_l - J_{l-1}
    (matematicose.c:172-176). j0 supplies the first two values."""

    def step(carry, l):
        jm1, jl = carry
        jp1 = ((2.0 * l + 1.0) / x) * jl - jm1
        return (jl, jp1), jp1

    (_, _), rest = jax.lax.scan(
        step, (j0[0], j0[1]), jnp.arange(1, lmax, dtype=j0.dtype)
    )
    return jnp.concatenate([j0[:2], rest])


def der3(f_vals: jnp.ndarray, h: float) -> jnp.ndarray:
    """3-point central derivative on a sampled grid (matematicose.c:204-207);
    endpoints are zero-padded."""
    out = (jnp.roll(f_vals, -1) - jnp.roll(f_vals, 1)) / (2.0 * h)
    return out.at[0].set(0.0).at[-1].set(0.0)


def der5(f_vals: jnp.ndarray, h: float) -> jnp.ndarray:
    """5-point central derivative (matematicose.c:209-212)."""
    out = (
        -jnp.roll(f_vals, -2) + 8.0 * jnp.roll(f_vals, -1)
        - 8.0 * jnp.roll(f_vals, 1) + jnp.roll(f_vals, 2)
    ) / (12.0 * h)
    return out.at[:2].set(0.0).at[-2:].set(0.0)


def der5_c(f: Callable, x, h: float):
    """5-point derivative of a callable (matematicose.c:214-217)."""
    return (-f(x + 2 * h) + 8.0 * f(x + h) - 8.0 * f(x - h) + f(x - 2 * h)) / (
        12.0 * h
    )


def simpson(f_vals: jnp.ndarray, h: float) -> jnp.ndarray:
    """Composite Simpson over an odd-length uniformly sampled grid
    (simpson_integral, matematicose.c:222-231)."""
    odd = f_vals[1:-1:2]
    even_in = f_vals[2:-1:2]
    return h / 3.0 * (f_vals[0] + f_vals[-1] + 4.0 * jnp.sum(odd)
                      + 2.0 * jnp.sum(even_in))


def grad_descent_1d(
    f: Callable, x1: float, x2: float, lr: float | None = None,
    tol: float = 1e-7, max_iter: int = 100_000,
) -> jnp.ndarray:
    """1-D gradient descent with the reference's 5-point numerical gradient
    (grad_descent_1D, matematicose.c:237-253)."""
    h = (x2 - x1) / 5e4
    if lr is None:
        scale = jnp.abs(f(x2) - f((x2 - x1) / 2))
        lr = scale / 200.0

    def cond(carry):
        x, g, it = carry
        return (jnp.abs(g) > tol) & (it < max_iter)

    def body(carry):
        x, _, it = carry
        g = der5_c(f, x, h)
        return x - lr * g, g, it + 1

    x0 = jnp.asarray((x2 - x1) / 2.0)
    x, _, _ = jax.lax.while_loop(cond, body, (x0, jnp.asarray(10.0), 0))
    return x


def stochastic_grad_descent_1d(
    f: Callable, x1: float, x2: float, n_starts: int = 64,
    key: jax.Array | None = None, **kw,
) -> jnp.ndarray:
    """Multi-start variant (stochastic_grad_descent_1D,
    matematicose.c:255-278): descend from n_starts points, return the x
    with the lowest f. (The reference's version is broken — its
    rand()/RAND_MAX integer division collapses every start to x1 — ours
    draws real uniforms.)"""
    if key is None:
        key = jax.random.key(42)
    starts = jax.random.uniform(key, (n_starts,), minval=x1, maxval=x2)

    def descend(x0):
        h = (x2 - x1) / 5e4
        lr = kw.get("lr") or jnp.abs(f(x2) - f((x2 - x1) / 2)) / 200.0

        def cond(c):
            x, g, it = c
            return (jnp.abs(g) > kw.get("tol", 1e-7)) & (it < 100_000)

        def body(c):
            x, _, it = c
            g = der5_c(f, x, h)
            return x - lr * g, g, it + 1

        x, _, _ = jax.lax.while_loop(cond, body, (x0, jnp.asarray(10.0), 0))
        return x

    xs = jax.vmap(descend)(starts)
    return xs[jnp.argmin(jax.vmap(f)(xs))]
