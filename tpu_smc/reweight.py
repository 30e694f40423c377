"""MBAR reweighting across the temperature ladder.

Beyond-reference capability: the reference measures each temperature in
its own process invocation (argv, main.c:18) and can only report
observables AT the simulated temperatures. The ladder drivers here
(tsweep.py / pt.py) collect per-gather potential-energy samples from
every temperature at once; this module combines them with the
multistate Bennett acceptance ratio estimator (MBAR, Shirts & Chodera
2008) so mean energy, heat capacity and relative free energy can be
evaluated at ANY temperature inside (or near) the ladder — a continuous
E(T)/c_v(T)/f(T) curve from one run, instead of one point per process.

TPU-native shape: the self-consistent MBAR iteration is a dense
[K states x M samples] log-sum-exp fixed point — pure matrix work,
jitted as one XLA program (lax.while_loop), no Python in the loop.

Statistical conventions match the rest of the framework:
  - samples are the per-gather POTENTIAL energies (the same trace
    data.csv stores, with the 3NT/2 kinetic offset added only at
    output, SMC.c:210-211);
  - cv = var(E)/T^2 (SMC.c:249-250), evaluated under the reweighted
    ensemble (the constant kinetic offset drops out of the variance);
  - the effective sample size per target (1/sum w^2) is reported so
    extrapolation beyond the ladder's support is visible, not silent.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .config import SMCConfig

__all__ = [
    "ReweightResults", "mbar_free_energies", "reweight_observables",
    "reweight_paired_field", "reweight_from_ladder", "write_reweight_csv",
    "write_reweight_profile_csv", "parse_t_grid", "pmf_from_profile",
    "subset_ladder_replicas", "reweight_disorder_ladder",
]


class ReweightResults(NamedTuple):
    temps: np.ndarray          # [G] target temperatures
    mean_energy: np.ndarray    # [G] incl. the 3NT/2 kinetic offset
    cv: np.ndarray             # [G] var(E)/T^2 under the reweighted ensemble
    ess: np.ndarray            # [G] effective sample size 1/sum(w^2)
    free_energy: np.ndarray    # [G] dimensionless f = -ln Z, f(temps[0]) = 0
    ladder_f: np.ndarray       # [K] converged MBAR free energies (f[0] = 0)
    iterations: int            # self-consistent iterations used
    # replica-bootstrap standard errors (None unless n_boot > 0):
    # resampling whole ladder REPLICAS keeps within-replica correlation
    # intact, so these are honest errors for correlated chains
    err_energy: np.ndarray | None = None   # [G]
    err_cv: np.ndarray | None = None       # [G]
    err_f: np.ndarray | None = None        # [G]
    # P(T) incl. ideal rho*T, from paired (P, E) samples (None when the
    # ladder run collected no pressure samples)
    pressure: np.ndarray | None = None     # [G]
    err_pressure: np.ndarray | None = None  # [G]
    # continuous density FIELDS from paired per-configuration histograms
    # (None unless the ladder run sampled them: gr_bins/z_bins > 0).
    # rho(z; T) completes the observable set the reference can only
    # produce at the simulated T (plotting.jl:123-201 density maps).
    gr: np.ndarray | None = None           # [G, gr_bins]
    zprofile: np.ndarray | None = None     # [G, z_bins]
    err_gr: np.ndarray | None = None       # [G, gr_bins]
    err_zprofile: np.ndarray | None = None  # [G, z_bins]
    # in-plane structure factor S(k; T) on the shell grid (sk_kmax > 0)
    sk: np.ndarray | None = None           # [G, shells]
    err_sk: np.ndarray | None = None       # [G, shells]
    # reweighted pressure-tensor profiles + the wall tension
    # gamma(T) = 1/2 int (P_N - P_T) dz per target T (ptensor_bins > 0)
    pn: np.ndarray | None = None           # [G, nb]
    pt: np.ndarray | None = None           # [G, nb]
    gamma: np.ndarray | None = None        # [G]
    err_gamma: np.ndarray | None = None    # [G]
    # Widom excess chemical potential mu_ex(T) from paired ghost
    # energies (widom_k > 0): the insertion Boltzmann factor is
    # re-evaluated at each target beta', so the curve is exact MBAR,
    # not an interpolation (widom.mu_ex_reweighted)
    mu_ex: np.ndarray | None = None        # [G]
    err_mu_ex: np.ndarray | None = None    # [G]


@partial(jax.jit, static_argnames=("max_iter",))
def _mbar_fixed_point(u_kn, log_n_k, tol, max_iter):
    """Self-consistent MBAR iteration.

    u_kn [K, M]: reduced potential of every pooled sample m under every
    state k (here u_kn = beta_k * E_m). log_n_k [K]: log sample counts.
    Returns (f_k [K] with f[0] = 0, iterations, final residual).
    """

    def log_denom(f_k):
        # log sum_k N_k exp(f_k - u_kn[k, m])  -> [M]
        return jax.nn.logsumexp(
            log_n_k[:, None] + f_k[:, None] - u_kn, axis=0)

    def step(carry):
        f_k, i, _ = carry
        f_new = -jax.nn.logsumexp(-u_kn - log_denom(f_k)[None, :], axis=1)
        f_new = f_new - f_new[0]
        return f_new, i + 1, jnp.max(jnp.abs(f_new - f_k))

    def cond(carry):
        _, i, resid = carry
        return (i < max_iter) & (resid > tol)

    f0 = jnp.zeros(u_kn.shape[0], u_kn.dtype)
    f_k, iters, resid = jax.lax.while_loop(
        cond, step, (f0, jnp.int32(0), jnp.asarray(jnp.inf, u_kn.dtype)))
    return f_k, iters, resid


def mbar_free_energies(e_k: Sequence[np.ndarray], betas,
                       tol: float = 2e-6, max_iter: int = 5_000):
    """Solve the MBAR equations for a temperature ladder.

    e_k: per-state 1-D arrays of potential-energy samples (lengths may
    differ). betas: [K] inverse temperatures. Returns
    (f_k, log_denom_m, e_shifted, shift, iterations):
      f_k        — converged free energies in the UNSHIFTED energy
                   convention (f[0] = 0), float64;
      e_shifted  — pooled samples with `shift` subtracted (f32; the form
                   all weight computations must use);
      shift      — the pooled f64 mean energy subtracted before forming
                   u_kn. Subtracting it cancels exactly in every weight
                   and free-energy difference but restores the mantissa
                   bits beta*E rounding destroys at |E| ~ 1e4 (N=1024
                   ladders: f32 rounding of beta*E is ~1e-3, straight
                   into exp-weight ratios).
    """
    betas64 = np.asarray(betas, np.float64)
    betas = jnp.asarray(betas, jnp.float32)
    # everything runs in f32 (TPU-native), so the fixed-point residual
    # plateaus around the f32 logsumexp noise floor (~1e-6 on the f_k
    # scale): a tighter tol would just spin to max_iter without gaining
    # accuracy — the default stops at the plateau
    e_all = [np.asarray(e, np.float64).reshape(-1) for e in e_k]
    n_k = np.asarray([e.size for e in e_all], np.int64)
    if (n_k <= 0).any():
        raise ValueError("every ladder state needs at least one sample")
    shift = float(np.mean(np.concatenate(e_all)))
    e_shifted = jnp.concatenate(
        [jnp.asarray(e - shift, jnp.float32) for e in e_all])
    log_n_k = jnp.asarray(np.log(n_k), jnp.float32)
    u_kn = betas[:, None] * e_shifted[None, :]         # [K, M]
    f_s, iters, _ = _mbar_fixed_point(u_kn, log_n_k, jnp.float32(tol),
                                      max_iter)
    log_denom = jax.nn.logsumexp(
        log_n_k[:, None] + f_s[:, None] - u_kn, axis=0)  # [M]
    # Z(beta) = exp(-beta*shift) * Z_shifted(beta), so the unshifted
    # convention (the physical LJ energy zero) is restored exactly by
    # f_k = f_shifted + (beta_k - beta_0) * shift  (f64 on host)
    f_k = (np.asarray(f_s, np.float64)
           + (betas64 - betas64[0]) * shift)
    return f_k, log_denom, e_shifted, shift, int(iters)


@jax.jit
def _reweight_one(beta, e_pooled, log_denom):
    """Weights, moments and diagnostics at one target beta."""
    logw = -beta * e_pooled - log_denom
    logw = logw - jax.nn.logsumexp(logw)
    w = jnp.exp(logw)
    e_mean = jnp.sum(w * e_pooled)
    e_var = jnp.sum(w * (e_pooled - e_mean) ** 2)
    ess = 1.0 / jnp.sum(w * w)
    # dimensionless free energy -ln Z(beta) up to the ladder's constant
    f = -jax.nn.logsumexp(-beta * e_pooled - log_denom)
    return e_mean, e_var, ess, f


def reweight_observables(
    e_k: Sequence[np.ndarray],
    temps,
    t_grid,
    cfg: SMCConfig | None = None,
    max_samples_per_state: int = 1 << 17,
) -> ReweightResults:
    """MBAR estimates of E(T), c_v(T), f(T) on `t_grid` from ladder
    samples `e_k` taken at `temps`.

    Samples beyond `max_samples_per_state` are strided down (the MBAR
    point estimate is consistent under correlated samples; capping M
    bounds the [K, M] matrix). Mean energy includes 3NT/2 when `cfg` is
    given (SMC.c:210-211); cv is var(E)/T^2 like SMC.c:249.
    """
    temps = np.asarray(temps, np.float64)
    t_grid = np.atleast_1d(np.asarray(t_grid, np.float64))
    e_k = [np.asarray(e).reshape(-1) for e in e_k]
    e_k = [
        e[:: max(1, -(-len(e) // max_samples_per_state))] for e in e_k
    ]
    f_k, log_denom, e_shifted, shift, iters = mbar_free_energies(
        e_k, 1.0 / temps)

    means, cvs, esss, fs = [], [], [], []
    for t in t_grid:
        e_mean, e_var, ess, f = _reweight_one(
            jnp.float32(1.0 / t), e_shifted, log_denom)
        # e_mean/f come back in the shifted convention; var/ess/weights
        # are shift-invariant. Restore the physical zero in f64.
        means.append(float(e_mean) + shift)
        cvs.append(float(e_var) / t ** 2)
        esss.append(float(ess))
        fs.append(float(f) + shift / t)
    kinetic = 1.5 * cfg.n * t_grid if cfg is not None else 0.0
    fs = np.asarray(fs)
    return ReweightResults(
        temps=t_grid,
        mean_energy=np.asarray(means) + kinetic,
        cv=np.asarray(cvs),
        ess=np.asarray(esss),
        free_energy=fs - fs[0],
        ladder_f=np.asarray(f_k),
        iterations=iters,
    )


def reweight_paired_observable(
    e_k: Sequence[np.ndarray],
    o_k: Sequence[np.ndarray],
    temps,
    t_grid,
) -> np.ndarray:
    """<O>(T) on `t_grid` from PAIRED samples: o_k[k][m] was measured on
    the same configuration as e_k[k][m]. MBAR is solved on the paired
    set's energies (a subset/coarser cadence than the full energy trace
    is fine — the estimator only needs the pairs to be equilibrium
    samples of their states)."""
    temps = np.asarray(temps, np.float64)
    t_grid = np.atleast_1d(np.asarray(t_grid, np.float64))
    # the constant energy shift cancels in the normalized weights
    _, log_denom, e_shifted, _, _ = mbar_free_energies(e_k, 1.0 / temps)
    o_pooled = jnp.concatenate(
        [jnp.asarray(o, jnp.float32).reshape(-1) for o in o_k])
    out = []
    for t in t_grid:
        logw = -jnp.float32(1.0 / t) * e_shifted - log_denom
        logw = logw - jax.nn.logsumexp(logw)
        out.append(float(jnp.sum(jnp.exp(logw) * o_pooled)))
    return np.asarray(out)


def reweight_paired_field(
    e_k: Sequence[np.ndarray],
    f_k: Sequence[np.ndarray],
    temps,
    t_grid,
) -> np.ndarray:
    """<F(x)>(T) on `t_grid` for a VECTOR observable: f_k[k] is
    [M_k, B] with row m the per-configuration field (e.g. a rho(z) or
    g(r) histogram) paired with energy sample e_k[k][m]. Returns
    [G, B] — the same MBAR weights as the scalar case applied to every
    bin at once (one [G, M] x [M, B] matmul; MXU work, not a loop)."""
    temps = np.asarray(temps, np.float64)
    t_grid = np.atleast_1d(np.asarray(t_grid, np.float64))
    _, log_denom, e_shifted, _, _ = mbar_free_energies(e_k, 1.0 / temps)
    f_pooled = jnp.concatenate(
        [jnp.asarray(f, jnp.float32).reshape(-1, np.shape(f)[-1])
         for f in f_k])                                   # [M, B]
    betas = jnp.asarray(1.0 / t_grid, jnp.float32)        # [G]
    logw = -betas[:, None] * e_shifted[None, :] - log_denom[None, :]
    logw = logw - jax.nn.logsumexp(logw, axis=1, keepdims=True)
    return np.asarray(jnp.exp(logw) @ f_pooled, np.float64)  # [G, B]


def pmf_from_profile(temps, field, err=None):
    """Potential of mean force from a reweighted density surface:
    F(x; T) = -T ln rho(x; T), shifted so min_x F(x; T) = 0 per T
    (the standard PMF convention). Empty bins (rho <= 0 — regions the
    ladder never visited) become NaN rather than +inf so downstream
    CSVs/plots stay finite-aware. Errors propagate by the delta method,
    err_F = T * err_rho / rho.

    Derived observable the reference workflow has no analog for: its
    density maps exist only at the simulated T (plotting.jl:123-201),
    and it never converts density to a free-energy profile at all.

    Returns (pmf [G, B], err_pmf [G, B] | None)."""
    temps = np.atleast_1d(np.asarray(temps, np.float64))
    field = np.asarray(field, np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        pmf = np.where(field > 0.0,
                       -temps[:, None] * np.log(np.where(field > 0.0,
                                                         field, 1.0)),
                       np.nan)
        if np.isnan(pmf).all(axis=1).any():
            raise ValueError("a target temperature has an all-empty "
                             "density profile; cannot form a PMF")
        pmf = pmf - np.nanmin(pmf, axis=1, keepdims=True)
        err_pmf = None
        if err is not None:
            err = np.asarray(err, np.float64)
            err_pmf = np.where(field > 0.0,
                               temps[:, None] * err
                               / np.where(field > 0.0, field, 1.0),
                               np.nan)
    return pmf, err_pmf


def reweight_from_ladder(res, cfg: SMCConfig, t_grid,
                         n_boot: int = 0, seed: int = 0) -> ReweightResults:
    """Reweight from a TSweepResults/PTResults carrying energy_samples
    ([gathers, n_t, chains_per_t] potential energies).

    n_boot > 0 adds replica-bootstrap standard errors: whole ladder
    replicas (the chains_per_t independent ladder instances — the unit
    that is independent even under parallel tempering, where levels of
    one instance exchange configurations) are resampled with
    replacement and the full MBAR estimate recomputed per draw.
    """
    ts = getattr(res, "tsweep", res)
    if ts.energy_samples is None or ts.energy_samples.size == 0:
        raise ValueError("ladder results carry no energy samples")
    e_s = ts.energy_samples  # [gathers, n_t, R]
    p_s = getattr(ts, "pressure_samples", None)
    e_p = getattr(ts, "energy_at_pressure", None)
    have_p = p_s is not None and e_p is not None and p_s.size > 0
    gr_s = getattr(ts, "gr_samples", None)
    zp_s = getattr(ts, "zprofile_samples", None)
    sk_s = getattr(ts, "sk_samples", None)
    wd_s = getattr(ts, "widom_samples", None)
    pn_s = getattr(ts, "ptensor_n_samples", None)
    pt_s = getattr(ts, "ptensor_t_samples", None)
    pr_s = getattr(ts, "ptensor_rho_samples", None)
    have_gr = gr_s is not None and e_p is not None and gr_s.size > 0
    have_zp = zp_s is not None and e_p is not None and zp_s.size > 0
    have_sk = sk_s is not None and e_p is not None and sk_s.size > 0
    have_wd = wd_s is not None and e_p is not None and wd_s.size > 0
    have_pt2 = (pn_s is not None and pt_s is not None
                and pr_s is not None
                and e_p is not None and pn_s.size > 0)
    t_grid = np.atleast_1d(np.asarray(t_grid, np.float64))
    ideal = cfg.rho * t_grid   # ideal-gas term, like data.csv (SMC.c:207)

    def split(arr, idx=None):
        a = arr if idx is None else arr[:, :, idx]
        tail = a.shape[3:]   # field samples carry a trailing [bins] axis
        return [a[:, k].reshape((-1,) + tail) for k in range(a.shape[1])]

    def estimate(idx=None):
        out = reweight_observables(split(e_s, idx), ts.temps, t_grid,
                                   cfg=cfg)
        if have_p:
            pv = reweight_paired_observable(
                split(e_p, idx), split(p_s, idx), ts.temps, t_grid)
            out = out._replace(pressure=pv + ideal)
        if have_gr:
            out = out._replace(gr=reweight_paired_field(
                split(e_p, idx), split(gr_s, idx), ts.temps, t_grid))
        if have_zp:
            out = out._replace(zprofile=reweight_paired_field(
                split(e_p, idx), split(zp_s, idx), ts.temps, t_grid))
        if have_sk:
            out = out._replace(sk=reweight_paired_field(
                split(e_p, idx), split(sk_s, idx), ts.temps, t_grid))
        if have_wd:
            from .widom import mu_ex_reweighted

            mus, _ = mu_ex_reweighted(
                split(wd_s, idx), split(e_p, idx), ts.temps, t_grid)
            out = out._replace(mu_ex=mus)
        if have_pt2:
            # virial-only parts reweight as paired fields; the ideal
            # term is rho(z; T') * T' — the TARGET temperature, exactly
            # like the scalar P(T) adds rho*t_grid after reweighting
            pn_g = reweight_paired_field(
                split(e_p, idx), split(pn_s, idx), ts.temps, t_grid)
            pt_g = reweight_paired_field(
                split(e_p, idx), split(pt_s, idx), ts.temps, t_grid)
            rho_g = reweight_paired_field(
                split(e_p, idx), split(pr_s, idx), ts.temps, t_grid)
            ideal_z = rho_g * t_grid[:, None]
            pn_g = ideal_z + pn_g
            pt_g = ideal_z + pt_g
            dz = cfg.box_lz / pn_g.shape[1]
            out = out._replace(
                pn=pn_g, pt=pt_g,
                gamma=0.5 * (pn_g - pt_g).sum(axis=1) * dz)
        return out

    out = estimate()
    if n_boot <= 0:
        return out
    r = e_s.shape[2]
    rng = np.random.default_rng(seed)
    draws = []
    for _ in range(n_boot):
        draws.append(estimate(rng.integers(0, r, size=r)))
    return out._replace(
        err_energy=np.std([d.mean_energy for d in draws], axis=0),
        err_cv=np.std([d.cv for d in draws], axis=0),
        err_f=np.std([d.free_energy for d in draws], axis=0),
        err_pressure=(np.std([d.pressure for d in draws], axis=0)
                      if have_p else None),
        err_gr=(np.std([d.gr for d in draws], axis=0)
                if have_gr else None),
        err_zprofile=(np.std([d.zprofile for d in draws], axis=0)
                      if have_zp else None),
        err_sk=(np.std([d.sk for d in draws], axis=0)
                if have_sk else None),
        err_mu_ex=(np.std([d.mu_ex for d in draws], axis=0)
                   if have_wd else None),
        err_gamma=(np.std([d.gamma for d in draws], axis=0)
                   if have_pt2 else None),
    )


def subset_ladder_replicas(res, sl):
    """Restrict a TSweepResults' sample arrays to a replica slice
    ([gathers, n_t, R] -> [gathers, n_t, R[sl]]); used to reweight one
    quenched wall-disorder realization at a time (the realization axis
    lives in the replica index)."""
    ts = getattr(res, "tsweep", res)

    def cut(a):
        return None if a is None else a[:, :, sl]

    return ts._replace(
        energy_samples=cut(ts.energy_samples),
        pressure_samples=cut(ts.pressure_samples),
        energy_at_pressure=cut(ts.energy_at_pressure),
        gr_samples=cut(ts.gr_samples),
        zprofile_samples=cut(ts.zprofile_samples),
        sk_samples=cut(ts.sk_samples),
        widom_samples=cut(ts.widom_samples),
        ptensor_n_samples=cut(ts.ptensor_n_samples),
        ptensor_t_samples=cut(ts.ptensor_t_samples),
        ptensor_rho_samples=cut(ts.ptensor_rho_samples),
    )


def reweight_disorder_ladder(res, cfg: SMCConfig, t_grid, k_real: int
                             ) -> tuple[ReweightResults, list]:
    """Quenched-disorder MBAR: one MBAR solve PER wall realization
    (mixing realizations inside a level would violate MBAR's
    same-Boltzmann-state assumption — each realization is a different
    Hamiltonian), then the quenched average over realizations.

    Averaging the per-realization free-energy curves IS the quenched
    free energy -<ln Z>_disorder; the err_* fields carry the
    between-realization standard errors (the honest disorder error bar).
    ESS is summed (independent solves). Returns (combined, per_k list).
    """
    ts = getattr(res, "tsweep", res)
    r = ts.energy_samples.shape[2]
    if k_real < 1 or r % k_real:
        raise ValueError(f"replicas per level ({r}) must divide by the "
                         f"realization count ({k_real})")
    g = r // k_real
    parts = [
        reweight_from_ladder(
            subset_ladder_replicas(ts, slice(i * g, (i + 1) * g)),
            cfg, t_grid)
        for i in range(k_real)
    ]

    def stack(name):
        vals = [getattr(p, name) for p in parts]
        return None if any(v is None for v in vals) else np.stack(vals)

    def avg_se(name):
        s = stack(name)
        if s is None:
            return None, None
        se = (s.std(axis=0, ddof=1) / np.sqrt(k_real) if k_real > 1
              else np.zeros_like(s[0]))
        return s.mean(axis=0), se

    e, e_se = avg_se("mean_energy")
    cv, cv_se = avg_se("cv")
    f, f_se = avg_se("free_energy")
    p, p_se = avg_se("pressure")
    gr, gr_se = avg_se("gr")
    zp, zp_se = avg_se("zprofile")
    sk, sk_se = avg_se("sk")
    mu, mu_se = avg_se("mu_ex")
    pn2, _ = avg_se("pn")
    pt2, _ = avg_se("pt")
    gm, gm_se = avg_se("gamma")
    combined = ReweightResults(
        temps=parts[0].temps,
        mean_energy=e, cv=cv,
        ess=stack("ess").sum(axis=0),
        free_energy=f,
        ladder_f=stack("ladder_f").mean(axis=0),
        iterations=max(pt.iterations for pt in parts),
        err_energy=e_se, err_cv=cv_se, err_f=f_se,
        pressure=p, err_pressure=p_se,
        gr=gr, err_gr=gr_se,
        zprofile=zp, err_zprofile=zp_se,
        sk=sk, err_sk=sk_se,
        mu_ex=mu, err_mu_ex=mu_se,
        pn=pn2, pt=pt2, gamma=gm, err_gamma=gm_se,
    )
    return combined, parts


def write_reweight_disorder_csv(d, cfg: SMCConfig, parts) -> "Path":
    """Long-format per-realization reweight curves behind the quenched
    average: one row per (realization k, target T) with the same
    observable columns as reweight_*.csv (header-driven: optional
    columns appear when every realization computed them)."""
    from .io import _fname

    p = _fname(d, "reweight_disorder", cfg)
    have_p = all(pt.pressure is not None for pt in parts)
    have_mu = all(pt.mu_ex is not None for pt in parts)
    with open(p, "w") as f:
        f.write("k, T, E_mean, cv" + (", P" if have_p else "")
                + (", mu_ex" if have_mu else "")
                + ", ess, f\n")
        for k, pt in enumerate(parts):
            for g in range(len(pt.temps)):
                row = (f"{k}, {pt.temps[g]:0.4f}, "
                       f"{pt.mean_energy[g]:0.9f}, {pt.cv[g]:0.9f}")
                if have_p:
                    row += f", {pt.pressure[g]:0.9f}"
                if have_mu:
                    row += f", {pt.mu_ex[g]:0.9f}"
                row += f", {pt.ess[g]:0.1f}, {pt.free_energy[g]:0.9f}"
                f.write(row + "\n")
    return p


def parse_t_grid(spec: str) -> np.ndarray:
    """CLI grid spec: 'tmin:tmax:num' (inclusive linspace) or a comma
    list 'T1,T2,...'."""
    if ":" in spec:
        parts = spec.split(":")
        if len(parts) != 3:
            raise ValueError(f"bad T grid spec {spec!r} "
                             "(want tmin:tmax:num or T1,T2,...)")
        lo, hi, num = float(parts[0]), float(parts[1]), int(parts[2])
        if num < 1 or hi < lo or lo <= 0:
            raise ValueError(f"bad T grid spec {spec!r} "
                             "(need 0 < tmin <= tmax, num >= 1)")
        return np.linspace(lo, hi, num)
    grid = np.asarray([float(v) for v in spec.split(",")], np.float64)
    if (grid <= 0).any():
        # beta = 1/T at T <= 0 silently poisons the whole free-energy
        # column through the f - f[0] normalization
        raise ValueError(f"temperatures must be positive: {spec!r}")
    return grid


def write_reweight_profile_csv(d, cfg: SMCConfig, stem: str,
                               axis_name: str, centers, res: ReweightResults,
                               field: np.ndarray, err: np.ndarray | None):
    """Long-format reweighted field: one row per (target T, bin).
    Header `T, <axis>, value[, err]` — e.g. reweight_zprofile_*.csv with
    `T, z, density`: the rho(z; T) surface on the continuous T grid."""
    from .io import _fname

    p = _fname(d, stem, cfg)
    with open(p, "w") as f:
        f.write(f"T, {axis_name}, value" + (", err" if err is not None
                                            else "") + "\n")
        for g in range(len(res.temps)):
            for b in range(field.shape[1]):
                row = f"{res.temps[g]:0.4f}, {centers[b]:0.6f}, " \
                      f"{field[g, b]:0.9f}"
                if err is not None:
                    row += f", {err[g, b]:0.9f}"
                f.write(row + "\n")
    return p


def write_reweight_csv(d, cfg: SMCConfig, res: ReweightResults):
    from .io import _fname

    p = _fname(d, "reweight", cfg)
    # header-driven schema: optional columns appear when computed
    cols = [("T", res.temps, "0.4f"), ("E_mean", res.mean_energy, "0.9f")]
    if res.err_energy is not None:
        cols.append(("E_err", res.err_energy, "0.9f"))
    cols.append(("cv", res.cv, "0.9f"))
    if res.err_cv is not None:
        cols.append(("cv_err", res.err_cv, "0.9f"))
    if res.pressure is not None:
        cols.append(("P", res.pressure, "0.9f"))
        if res.err_pressure is not None:
            cols.append(("P_err", res.err_pressure, "0.9f"))
    if res.mu_ex is not None:
        cols.append(("mu_ex", res.mu_ex, "0.9f"))
        if res.err_mu_ex is not None:
            cols.append(("mu_ex_err", res.err_mu_ex, "0.9f"))
    if res.gamma is not None:
        cols.append(("gamma", res.gamma, "0.9f"))
        if res.err_gamma is not None:
            cols.append(("gamma_err", res.err_gamma, "0.9f"))
    cols += [("ess", res.ess, "0.1f"), ("f", res.free_energy, "0.9f")]
    with open(p, "w") as f:
        f.write(", ".join(name for name, _, _ in cols) + "\n")
        for i in range(len(res.temps)):
            f.write(", ".join(format(vals[i], fmt)
                              for _, vals, fmt in cols) + "\n")
    return p
