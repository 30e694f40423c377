"""Widom test-particle insertion: excess chemical potential mu_ex.

Beyond-reference capability (the C code has no free-energy machinery):
ghost particles are inserted at uniform random positions and the
Boltzmann factor of their interaction energy is averaged,

    exp(-beta * mu_ex) = < exp(-beta * dU_ghost) >_{NVT, uniform s}

(Widom 1963). For the wall slab the insertion density is uniform over
the full box volume, so the scalar estimate is the volume-averaged
activity; the z-RESOLVED profile mu_ex(z) = -T ln <exp(-beta dU)>_z is
the physically interesting object near the walls. At equilibrium the
total chemical potential is constant across the slab,

    T ln rho(z) + mu_ex(z) = const   (+ T ln Lambda^3, z-independent),

which ties this estimator to the driver's existing z-density profile —
tests/test_widom.py asserts that constancy on a thermalized run.

The ghost energy reuses the sampler's own fused single-particle energy
(`potentials.energy_force_single` with index -1 so no particle is
excluded — pair + wall terms, the exact oneParticleMoves arithmetic,
SMC.c:300-304). Insertions never touch the chain state or its RNG key:
the stream is derived by folding a constant into the chain's current
key, so enabling Widom sampling leaves trajectories bitwise unchanged.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import SMCConfig
from .potentials import energy_force_single

# Fold constant separating the Widom stream from every sampler use of the
# chain key (sampler.py folds small move indices; 0x5EED marks offset
# streams in ensemble.py).
_WIDOM_FOLD = 0x57D0


def widom_delta_u(
    r: jnp.ndarray,
    w: jax.Array,
    cfg: SMCConfig,
    key: jax.Array,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Energies of `k` ghost insertions into configuration `r`.

    Positions are uniform over the box: x,y in [-L/2, L/2), z across the
    full slab (walls) or periodic box (bulk). Returns (du[k], z[k]).
    du can be +inf (ghost on top of a particle / at wall contact) — the
    estimators treat non-finite as a zero Boltzmann factor, which is the
    correct limit.
    """
    dtype = cfg.jnp_dtype
    kx, kz = jax.random.split(jax.random.fold_in(key, _WIDOM_FOLD))
    xy = jax.random.uniform(
        kx, (k, 2), dtype, -cfg.box_l / 2.0, cfg.box_l / 2.0
    )
    z = jax.random.uniform(
        kz, (k,), dtype, -cfg.box_lz / 2.0, cfg.box_lz / 2.0
    )
    ghosts = jnp.concatenate([xy, z[:, None]], axis=1)

    def one(g):
        return energy_force_single(r, jnp.int32(-1), g, w, cfg)[0]

    return jax.vmap(one)(ghosts), z


def _boltz(du: np.ndarray, temperature: float) -> np.ndarray:
    """exp(-du/T) with non-finite du mapped to weight 0 (hard overlap)."""
    du = np.asarray(du, np.float64)
    out = np.zeros_like(du)
    ok = np.isfinite(du)
    # exp underflow to 0.0 is exactly the right limit; suppress warnings.
    with np.errstate(over="ignore", under="ignore"):
        out[ok] = np.exp(-du[ok] / float(temperature))
    return out


def mu_ex(
    du: np.ndarray,
    temperature: float,
    n_boot: int = 200,
    seed: int = 0,
) -> Tuple[float, float]:
    """Scalar mu_ex with a bootstrap error over the CHAIN axis.

    du: [samples..., chains, k] — the chain axis is the independent unit
    (chains never communicate), so resampling it is statistically sound
    even though samples within a chain are correlated.
    Returns (mu_ex, err); (nan, nan) if there is no data.
    """
    du = np.asarray(du)
    if du.size == 0:
        return float("nan"), float("nan")
    b = _boltz(du, temperature)
    # -> [chains, everything-else]: per-chain mean Boltzmann factor.
    # Single-chain runs bootstrap over the leading (gather) axis instead —
    # weaker (gathers are correlated) but the only spread available.
    if b.shape[-2] == 1 and b.ndim >= 3 and b.shape[0] > 1:
        b = np.moveaxis(b, 0, -2)
    per_chain = np.moveaxis(b, -2, 0).reshape(b.shape[-2], -1).mean(axis=1)
    mean = float(per_chain.mean())
    if mean <= 0.0:
        return float("inf"), float("nan")
    mu = -float(temperature) * np.log(mean)
    rng = np.random.default_rng(seed)
    c = per_chain.shape[0]
    boots = np.empty(n_boot)
    for i in range(n_boot):
        m = per_chain[rng.integers(0, c, c)].mean()
        boots[i] = -temperature * np.log(m) if m > 0 else np.nan
    return mu, float(np.nanstd(boots))


def mu_ex_profile(
    du: np.ndarray,
    z: np.ndarray,
    temperature: float,
    cfg: SMCConfig,
    nbins: int = 64,
    n_boot: int = 200,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """mu_ex(z): bin insertions on the z-density profile's uniform grid.

    du, z: [..., chains, k] paired arrays. Returns
    (centers[nbins], mu[nbins], err[nbins], counts[nbins]); bins with no
    insertions (or zero mean weight) are nan. Bootstrap over chains.
    """
    du = np.asarray(du)
    z = np.asarray(z)
    lz = float(cfg.box_lz)
    dz = lz / nbins
    centers = -lz / 2 + dz * (np.arange(nbins) + 0.5)
    if du.size == 0:
        nanv = np.full(nbins, np.nan)
        return centers, nanv, nanv.copy(), np.zeros(nbins)

    b = _boltz(du, temperature)
    zb = np.clip(((z / lz + 0.5) * nbins).astype(np.int64), 0, nbins - 1)
    if b.shape[-2] == 1 and b.ndim >= 3 and b.shape[0] > 1:
        # single chain: resample gathers instead (see mu_ex)
        b = np.moveaxis(b, 0, -2)
        zb = np.moveaxis(zb, 0, -2)
    c = b.shape[-2]
    # Per-chain per-bin sums and counts: [chains, nbins].
    bc = np.moveaxis(b, -2, 0).reshape(c, -1)
    ic = np.moveaxis(zb, -2, 0).reshape(c, -1)
    sums = np.zeros((c, nbins))
    cnts = np.zeros((c, nbins))
    for ci in range(c):
        sums[ci] = np.bincount(ic[ci], weights=bc[ci], minlength=nbins)
        cnts[ci] = np.bincount(ic[ci], minlength=nbins)

    def est(s, n):
        with np.errstate(divide="ignore", invalid="ignore"):
            m = s.sum(axis=0) / n.sum(axis=0)
            return np.where(m > 0, -temperature * np.log(m), np.nan)

    mu = est(sums, cnts)
    rng = np.random.default_rng(seed)
    boots = np.empty((n_boot, nbins))
    for i in range(n_boot):
        pick = rng.integers(0, c, c)
        boots[i] = est(sums[pick], cnts[pick])
    err = np.nanstd(boots, axis=0)
    return centers, mu, err, cnts.sum(axis=0)


def mu_ex_reweighted(
    du_k: list[np.ndarray],
    e_k: list[np.ndarray],
    temps: np.ndarray,
    t_grid: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """Continuous mu_ex(T) from ladder samples via MBAR.

    du_k[l]: [M_l, k] ghost energies paired SAMPLE-FOR-SAMPLE with the
    level's configuration energies e_k[l]: [M_l] (same order). At a
    target T' both factors reweight exactly:

        <exp(-beta' dU)>_{T'} = sum_m W_m(beta') * mean_j exp(-beta' du_mj)

    with W_m(beta') the MBAR configuration weights — exact at any T',
    no histogram discretization. Returns (mu[t_grid], ess[t_grid])
    where ess is the configuration-weight effective sample size.
    """
    from .reweight import mbar_free_energies

    _, log_denom, e_shifted, _, _ = mbar_free_energies(
        e_k, 1.0 / np.asarray(temps, np.float64)
    )
    du = np.concatenate([np.asarray(d, np.float64) for d in du_k], axis=0)
    mus = np.empty(len(t_grid))
    esss = np.empty(len(t_grid))
    log_denom = np.asarray(log_denom, np.float64)
    e_shifted = np.asarray(e_shifted, np.float64)
    for i, t in enumerate(np.asarray(t_grid, np.float64)):
        beta = 1.0 / t
        logw = -beta * e_shifted - log_denom
        logw -= logw.max()
        wgt = np.exp(logw)
        wgt /= wgt.sum()
        mean_b = float(wgt @ _boltz(du, t).mean(axis=1))
        mus[i] = -t * np.log(mean_b) if mean_b > 0 else np.inf
        esss[i] = 1.0 / float((wgt**2).sum())
    return mus, esss


def second_virial(temperature: float, n_grid: int = 4096,
                  r_max: float = 12.0) -> float:
    """LJ second virial coefficient B2(T) = -2 pi int (e^{-bu} - 1) r^2 dr.

    Host-side validation helper: to first order in density,
    beta * mu_ex = 2 * rho * B2(T) + O(rho^2), which pins the Widom
    estimator against an independent quadrature in the dilute-bulk test.
    """
    r = np.linspace(1e-6, r_max, n_grid)
    u = 4.0 * (r**-12.0 - r**-6.0)
    with np.errstate(over="ignore"):
        f = np.expm1(-np.minimum(u / temperature, 700.0))
    trapz = getattr(np, "trapezoid", None) or np.trapz
    integ = trapz(f * r * r, r)
    return -2.0 * np.pi * integ
