"""MBAR reweighting (tpu_smc/reweight.py).

Validated three ways: analytically on a system with a known density of
states (3-dof harmonic well: g(E) ~ sqrt(E), so E | T ~ Gamma(3/2, T)
with <E> = 1.5 T, var = 1.5 T^2, f(beta) = 1.5 ln(beta) + const);
self-consistently (reweighting AT a ladder temperature must reproduce
that state's sample mean); and end-to-end through the temperature-sweep
driver (an interpolated temperature must land near a direct simulation
at that temperature).
"""

import jax
import numpy as np
import pytest

from tpu_smc.config import RunParams, SMCConfig
from tpu_smc.reweight import (
    mbar_free_energies,
    parse_t_grid,
    reweight_from_ladder,
    reweight_observables,
)

TEMPS = np.array([0.8, 1.0, 1.25])


def _gamma_samples(temps, m=40_000, seed=0):
    """Per-T energy samples of the 3-dof harmonic well: Gamma(3/2, T)."""
    rng = np.random.default_rng(seed)
    return [rng.gamma(1.5, t, m) for t in temps]


class TestAnalytic:
    def test_interpolated_moments_and_free_energy(self):
        e_k = _gamma_samples(TEMPS)
        grid = np.array([0.8, 0.9, 1.1, 1.25])
        res = reweight_observables(e_k, TEMPS, grid)
        # <E> = 1.5 T, cv = var/T^2 = 1.5, both at interior points the
        # ladder never sampled directly.
        np.testing.assert_allclose(res.mean_energy, 1.5 * grid, rtol=0.02)
        np.testing.assert_allclose(res.cv, 1.5, rtol=0.05)
        # f(beta) = 1.5 ln(beta) + const (Z ~ beta^-1.5), relative to
        # the grid's first point.
        f_exact = 1.5 * np.log(1.0 / grid)
        np.testing.assert_allclose(
            res.free_energy, f_exact - f_exact[0], atol=0.02)
        # interpolation should keep a healthy effective sample size
        assert np.all(res.ess > 10_000)
        assert res.iterations > 0

    def test_ladder_free_energies_match_analytic(self):
        e_k = _gamma_samples(TEMPS, seed=3)
        f_k, *_ = mbar_free_energies(e_k, 1.0 / TEMPS)
        f_exact = 1.5 * np.log(1.0 / TEMPS)
        np.testing.assert_allclose(
            np.asarray(f_k), f_exact - f_exact[0], atol=0.02)

    def test_large_energy_offset_keeps_precision(self):
        """ADVICE r2: at |E| ~ 1e4 (N=1024 ladders) f32 rounding of
        beta*E is ~1e-3; the internal mean-energy shift must cancel a
        constant offset exactly. Moments, cv and free-energy
        DIFFERENCES of offset samples must match the unoffset ones to
        well under that rounding floor, and the offset itself must
        round-trip through mean_energy."""
        e_k = _gamma_samples(TEMPS, seed=5)
        off = 1.0e4
        grid = np.array([0.85, 1.0, 1.15])
        base = reweight_observables(e_k, TEMPS, grid)
        moved = reweight_observables([e + off for e in e_k], TEMPS, grid)
        np.testing.assert_allclose(
            moved.mean_energy - off, base.mean_energy, rtol=0, atol=2e-3)
        np.testing.assert_allclose(moved.cv, base.cv, rtol=1e-3)
        np.testing.assert_allclose(moved.ess, base.ess, rtol=1e-3)
        # f(beta) picks up beta*off (physical zero moved); differences
        # relative to the grid's first point shift by (1/T - 1/T0)*off
        beta = 1.0 / grid
        expect = base.free_energy + (beta - beta[0]) * off
        np.testing.assert_allclose(
            moved.free_energy, expect, rtol=0, atol=2e-2 * off * 1e-3)

    def test_self_consistency_at_ladder_temps(self):
        """Reweighting AT a sampled temperature ~ that state's own mean
        (MBAR pools all states, so it differs from the raw mean only by
        statistical noise)."""
        e_k = _gamma_samples(TEMPS, seed=1)
        res = reweight_observables(e_k, TEMPS, TEMPS)
        raw_means = np.array([e.mean() for e in e_k])
        np.testing.assert_allclose(res.mean_energy, raw_means, rtol=0.02)

    def test_sample_cap_strides_not_truncates(self):
        e_k = _gamma_samples(TEMPS, m=8_000, seed=2)
        res = reweight_observables(e_k, TEMPS, np.array([1.0]),
                                   max_samples_per_state=1_000)
        np.testing.assert_allclose(res.mean_energy, [1.5], rtol=0.05)
        assert res.ess[0] <= 3 * 1_000 + 3  # the cap actually applied


def test_parse_t_grid():
    np.testing.assert_allclose(parse_t_grid("0.8:1.2:5"),
                               [0.8, 0.9, 1.0, 1.1, 1.2])
    np.testing.assert_allclose(parse_t_grid("1.0,1.3"), [1.0, 1.3])
    with pytest.raises(ValueError):
        parse_t_grid("1.2:0.8:5")
    with pytest.raises(ValueError):
        parse_t_grid("0.8:1.2")
    # T <= 0 would poison the whole free-energy column (beta = 1/T)
    with pytest.raises(ValueError):
        parse_t_grid("0:1.2:4")
    with pytest.raises(ValueError):
        parse_t_grid("1.0,-0.5")


def test_reweight_from_ladder_end_to_end():
    """tsweep at [1.0, 1.2] -> MBAR at 1.1 must land near a direct
    simulation at 1.1 (and strictly between the ladder endpoints).
    MBAR assumes equilibrium samples, so the ladder gets a real
    thermalization phase (the analytic tests above isolate the
    estimator; this one exercises the full driver path)."""
    from tpu_smc.tsweep import simulate_temperature_sweep

    cfg = SMCConfig(n=16, box_l=12.0, box_lz=40.0, dtype="float32")
    params = RunParams(eqsteps=200, maxsteps=400, numdata=100)
    _, res = simulate_temperature_sweep(
        cfg, params, [1.0, 1.2], jax.random.key(0), chains_per_t=32)
    assert res.energy_samples is not None
    assert res.energy_samples.shape[1:] == (2, 32)

    rw = reweight_from_ladder(res, cfg, [1.0, 1.1, 1.2])
    # endpoints reproduce the driver's own per-T means up to the
    # (correlated-sample) replica spread
    for j, k in ((0, 0), (2, 1)):
        tol = max(6 * res.err_energy[k], 0.3)
        assert abs(rw.mean_energy[j] - res.mean_energy[k]) < tol

    _, direct = simulate_temperature_sweep(
        cfg, params, [1.1], jax.random.key(1), chains_per_t=32)
    lo, hi = sorted(res.mean_energy)
    assert lo < rw.mean_energy[1] < hi
    # statistical agreement with the direct run (few, correlated
    # samples -> generous bound driven by the direct run's replica err)
    tol = max(8 * direct.err_energy[0], 0.5)
    assert abs(rw.mean_energy[1] - direct.mean_energy[0]) < tol


def test_reweight_needs_samples():
    from tpu_smc.tsweep import TSweepResults

    empty = TSweepResults(
        temps=np.array([1.0]), mean_energy=np.zeros(1),
        err_energy=np.zeros(1), acceptance=np.zeros(1), cv=np.zeros(1))
    with pytest.raises(ValueError):
        reweight_from_ladder(empty, SMCConfig(), [1.0])


def test_reweight_cli_writes_artifact(tmp_path):
    from tpu_smc.cli import main

    rc = main(["30", "60", "30", "1.10", "--n", "12",
               "--temperatures", "1.0,1.2", "--chains-per-t", "4",
               "--reweight", "1.0:1.2:3", "--seed", "5",
               "--platform", "cpu", "--data-dir", str(tmp_path)])
    assert rc == 0
    run = next(tmp_path.iterdir())
    rw_file = next(p for p in run.iterdir()
                   if p.name.startswith("reweight_"))
    lines = rw_file.read_text().strip().splitlines()
    assert lines[0] == "T, E_mean, E_err, cv, cv_err, P, P_err, ess, f"
    assert len(lines) == 4
    # first grid point is T=1.0: its f is the reference zero
    assert float(lines[1].split(",")[8]) == 0.0
    assert float(lines[1].split(",")[2]) > 0  # bootstrap error present


def test_paired_observable_analytic():
    """<O>(T) from paired samples: with O = E^2 on the Gamma(3/2, T)
    model, <E^2> = var + mean^2 = 1.5 T^2 + 2.25 T^2 = 3.75 T^2 —
    checked at an interpolated temperature."""
    from tpu_smc.reweight import reweight_paired_observable

    e_k = _gamma_samples(TEMPS, seed=4)
    o_k = [e * e for e in e_k]
    got = reweight_paired_observable(e_k, o_k, TEMPS, [0.9, 1.1])
    np.testing.assert_allclose(got, 3.75 * np.array([0.9, 1.1]) ** 2,
                               rtol=0.04)


def test_ladder_pressure_reweighting():
    """tsweep collects paired (P, E) call-boundary samples; the
    reweighted P(T) at the ladder endpoints must agree with the direct
    per-T pressure sample means (+ ideal rho*T)."""
    from tpu_smc.tsweep import simulate_temperature_sweep

    cfg = SMCConfig(n=16, box_l=12.0, box_lz=40.0, dtype="float32")
    params = RunParams(eqsteps=60, maxsteps=200, numdata=100)
    _, res = simulate_temperature_sweep(
        cfg, params, [1.0, 1.2], jax.random.key(3), chains_per_t=32)
    assert res.pressure_samples is not None
    assert res.pressure_samples.shape == res.energy_at_pressure.shape
    assert res.pressure_samples.shape[1:] == (2, 32)

    rw = reweight_from_ladder(res, cfg, [1.0, 1.1, 1.2], n_boot=8)
    assert rw.pressure is not None and rw.err_pressure is not None
    direct = (res.pressure_samples.mean(axis=(0, 2))
              + cfg.rho * res.temps)
    for j, k in ((0, 0), (2, 1)):
        tol = max(6 * rw.err_pressure[j], 0.2 * abs(direct[k]))
        assert abs(rw.pressure[j] - direct[k]) < tol, (rw.pressure, direct)
    # interpolated point sits between the endpoint estimates
    lo, hi = sorted(direct)
    assert lo - 3 * rw.err_pressure[1] < rw.pressure[1] \
        < hi + 3 * rw.err_pressure[1]


def test_bootstrap_errors_scale_with_replicas():
    """Replica-bootstrap errors: present, positive, and shrinking as
    more independent replicas are pooled (~1/sqrt(R))."""
    from tpu_smc.tsweep import TSweepResults

    rng = np.random.default_rng(0)

    def fake_ladder(r):
        g = 200
        e = np.stack([rng.gamma(1.5, t, (g, r)) for t in [1.0, 1.2]],
                     axis=1)                      # [g, 2, r]
        return TSweepResults(
            temps=np.array([1.0, 1.2]), mean_energy=np.zeros(2),
            err_energy=np.zeros(2), acceptance=np.zeros(2),
            cv=np.zeros(2), energy_samples=e)

    small = reweight_from_ladder(fake_ladder(8), SMCConfig(n=2),
                                 [1.1], n_boot=24, seed=1)
    big = reweight_from_ladder(fake_ladder(64), SMCConfig(n=2),
                               [1.1], n_boot=24, seed=2)
    assert small.err_energy[0] > 0 and big.err_energy[0] > 0
    assert big.err_energy[0] < small.err_energy[0]
    assert small.err_cv[0] > 0 and small.err_f[0] >= 0
    # no-bootstrap call keeps the fields None
    plain = reweight_from_ladder(fake_ladder(8), SMCConfig(n=2), [1.1])
    assert plain.err_energy is None


def test_paired_field_analytic():
    """Vector observables reweight bin-by-bin exactly like scalars:
    a 2-column field [E, E^2] must reproduce the scalar paired results
    (<E> = 1.5 T, <E^2> = 3.75 T^2) at interpolated temperatures."""
    from tpu_smc.reweight import reweight_paired_field

    e_k = _gamma_samples(TEMPS, seed=6)
    f_k = [np.stack([e, e * e], axis=1) for e in e_k]
    got = reweight_paired_field(e_k, f_k, TEMPS, [0.9, 1.1])
    assert got.shape == (2, 2)
    t = np.array([0.9, 1.1])
    np.testing.assert_allclose(got[:, 0], 1.5 * t, rtol=0.04)
    np.testing.assert_allclose(got[:, 1], 3.75 * t ** 2, rtol=0.04)


def test_paired_field_single_state_is_plain_mean():
    """K=1 ladder at its own temperature: MBAR weights are exactly
    uniform, so the reweighted field is the plain sample mean."""
    from tpu_smc.reweight import reweight_paired_field

    rng = np.random.default_rng(7)
    e = rng.gamma(1.5, 1.1, 500)
    f = rng.uniform(size=(500, 6))
    got = reweight_paired_field([e], [f], [1.1], [1.1])
    np.testing.assert_allclose(got[0], f.mean(axis=0), rtol=2e-5)


def test_ladder_density_field_reweighting():
    """rho(z; T) / g(r; T) through the full driver: mass conservation is
    EXACT at every target T (each per-configuration histogram integrates
    to N, so any convex reweighting does too), and the reweighted
    profile at a ladder endpoint tracks that level's own mean profile."""
    from tpu_smc.tsweep import simulate_temperature_sweep

    cfg = SMCConfig(n=16, box_l=12.0, box_lz=40.0, dtype="float32")
    params = RunParams(eqsteps=100, maxsteps=300, numdata=100)
    _, res = simulate_temperature_sweep(
        cfg, params, [1.0, 1.2], jax.random.key(4), chains_per_t=32,
        z_bins=12, gr_bins=8, sk_kmax=3)
    assert res.zprofile_samples is not None
    assert res.zprofile_samples.shape[1:] == (2, 32, 12)
    assert res.gr_samples.shape[1:] == (2, 32, 8)
    from tpu_smc.observables import structure_factor

    shells = int(structure_factor(jax.numpy.zeros((cfg.n, 3)), cfg,
                                  n_kmax=3)[0].shape[0])
    assert res.sk_samples.shape[1:] == (2, 32, shells)

    rw = reweight_from_ladder(res, cfg, [1.0, 1.1, 1.2], n_boot=4)
    assert rw.zprofile.shape == (3, 12) and rw.gr.shape == (3, 8)
    assert rw.err_zprofile is not None and rw.err_gr is not None
    assert rw.sk.shape == (3, shells) and rw.err_sk is not None
    assert (rw.sk > 0).all()   # S(k) is a non-negative power spectrum
    # endpoint self-consistency for S(k), like the zprofile check below
    lvl = res.sk_samples[:, 0].reshape(-1, shells)
    spread = lvl.mean(axis=0).std() + lvl.std(axis=0).max()
    assert np.abs(rw.sk[0] - lvl.mean(axis=0)).max() < spread

    dz = cfg.box_lz / 12
    mass = rw.zprofile.sum(axis=1) * dz * cfg.box_l ** 2
    np.testing.assert_allclose(mass, cfg.n, rtol=1e-5)

    # endpoint self-consistency: compare against the level's own mean,
    # tolerance from the cross-replica spread of the level means
    level = res.zprofile_samples[:, 0].reshape(-1, 12)
    spread = level.mean(axis=0).std() + level.std(axis=0).max()
    assert np.abs(rw.zprofile[0] - level.mean(axis=0)).max() < spread


def test_pmf_from_profile_recovers_the_potential():
    """Boltzmann closure: for rho(z; T) = C(T) exp(-U(z)/T) the PMF
    -T ln rho, min-shifted, is exactly U(z) - min U at every T —
    independent of the normalization C(T)."""
    from tpu_smc.reweight import pmf_from_profile

    z = np.linspace(-1, 1, 17)
    u = 3.0 * z ** 2 + 0.5 * np.sin(4 * z)          # arbitrary potential
    temps = np.asarray([0.7, 1.0, 1.6])
    rho = np.asarray([np.exp(-u / t) / (0.3 + t) for t in temps])
    pmf, err = pmf_from_profile(temps, rho)
    assert err is None
    for g in range(len(temps)):
        np.testing.assert_allclose(pmf[g], u - u.min(), atol=1e-10)

    # delta-method error propagation: err_F = T * err_rho / rho
    err_rho = 0.05 * rho
    _, perr = pmf_from_profile(temps, rho, err_rho)
    np.testing.assert_allclose(perr, np.full_like(rho, 0.05)
                               * temps[:, None], atol=1e-12)

    # never-visited bins become NaN, and the min-shift ignores them
    rho2 = rho.copy()
    rho2[:, 0] = 0.0
    pmf2, perr2 = pmf_from_profile(temps, rho2, err_rho)
    assert np.isnan(pmf2[:, 0]).all() and np.isnan(perr2[:, 0]).all()
    assert np.nanmin(pmf2, axis=1).max() == 0.0
    np.testing.assert_allclose(pmf2[:, 1:], pmf[:, 1:] - pmf[:, 1:].min(
        axis=1, keepdims=True), atol=1e-10)

    with pytest.raises(ValueError, match="all-empty"):
        pmf_from_profile(temps, np.zeros_like(rho))


def test_reweight_cli_writes_profile_artifacts(tmp_path):
    from tpu_smc.cli import main

    rc = main(["30", "60", "30", "1.10", "--n", "12",
               "--temperatures", "1.0,1.2", "--chains-per-t", "4",
               "--reweight", "1.0:1.2:3", "--seed", "5", "--z-bins", "8",
               "--gr-bins", "6", "--sk-kmax", "2", "--platform", "cpu",
               "--data-dir", str(tmp_path)])
    assert rc == 0
    run = next(tmp_path.iterdir())
    zp = next(p for p in run.iterdir()
              if p.name.startswith("reweight_zprofile"))
    lines = zp.read_text().strip().splitlines()
    assert lines[0] == "T, z, value, err"
    assert len(lines) == 1 + 3 * 8   # 3 grid temperatures x 8 z bins
    gr = next(p for p in run.iterdir()
              if p.name.startswith("reweight_gr"))
    glines = gr.read_text().strip().splitlines()
    assert glines[0] == "T, r, value, err"
    assert len(glines) == 1 + 3 * 6

    # S(k; T) surface: same long-format schema on the k-shell grid
    from tpu_smc.observables import structure_factor

    cfg12 = SMCConfig.for_n(12, temperature=1.10)
    shells = int(structure_factor(np.zeros((12, 3)), cfg12,
                                  n_kmax=2)[0].shape[0])
    sk = next(p for p in run.iterdir()
              if p.name.startswith("reweight_sk"))
    klines = sk.read_text().strip().splitlines()
    assert klines[0] == "T, k, value, err"
    assert len(klines) == 1 + 3 * shells

    # PMF surface: same schema, consistent with -T ln rho of the
    # zprofile file row by row (min-shifted per T, NaN where rho = 0)
    pmf = next(p for p in run.iterdir()
               if p.name.startswith("reweight_pmf"))
    plines = pmf.read_text().strip().splitlines()
    assert plines[0] == "T, z, value, err"
    assert len(plines) == 1 + 3 * 8
    zrows = np.genfromtxt(zp, delimiter=",", skip_header=1)
    prows = np.genfromtxt(pmf, delimiter=",", skip_header=1)
    np.testing.assert_allclose(prows[:, :2], zrows[:, :2])  # same grid
    for t in np.unique(prows[:, 0]):
        rho = zrows[zrows[:, 0] == t][:, 2]
        got = prows[prows[:, 0] == t][:, 2]
        # compare where the CSV's 9-decimal rounding of rho stays below
        # ~1e-5 after the log's 1/rho amplification
        ok = rho > 1e-4
        assert ok.any()
        want = -t * np.log(rho[ok])
        shift = want.min()   # the global min lives in a well-visited bin
        np.testing.assert_allclose(got[ok], want - shift, atol=1e-4)
        assert np.nanmin(got) == pytest.approx(0.0, abs=1e-5)


def test_reweight_gamma_surface():
    """ptensor samples ride the ladder pairing: reweighting AT a ladder
    temperature reproduces that level's own sample average (the MBAR
    weights concentrate there), and the gamma column lands in the CSV."""
    import dataclasses

    from tpu_smc.reweight import reweight_from_ladder, write_reweight_csv
    from tpu_smc.tsweep import simulate_temperature_sweep

    cfg = dataclasses.replace(
        SMCConfig.for_n(32, temperature=1.1, dtype="float32"),
        box_l=6.0, box_lz=14.0)
    temps = [1.0, 1.3]
    _, res = simulate_temperature_sweep(
        cfg, RunParams(eqsteps=60, maxsteps=240, numdata=60), temps,
        jax.random.key(2), chains_per_t=6, ptensor_bins=10)
    assert res.ptensor_n_samples is not None
    assert res.ptensor_n_samples.shape[1:] == (2, 6, 10)

    rw = reweight_from_ladder(res, cfg, np.asarray(temps), n_boot=8)
    assert rw.gamma is not None and rw.gamma.shape == (2,)
    assert rw.err_gamma is not None
    # at a sampled temperature the reweighted profile ~ the level's own
    # mean (not exact: MBAR borrows strength from the other level). The
    # samples are VIRIAL-only; the level average adds rho(z) * T_level —
    # the exact point of the ideal-term fix: the ideal part must carry
    # the LEVEL temperature, not cfg.temperature (= 1.1 here, neither
    # level's T)
    lvl = (res.ptensor_n_samples[:, 0].mean(axis=(0, 1))
           + res.ptensor_rho_samples[:, 0].mean(axis=(0, 1)) * temps[0])
    scale = np.abs(lvl).mean() + 1e-4
    assert np.abs(rw.pn[0] - lvl).mean() < 0.5 * scale, (rw.pn[0], lvl)

    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as td:
        p = write_reweight_csv(Path(td), cfg, rw)
        hdr = p.read_text().splitlines()[0]
        assert "gamma" in hdr and "gamma_err" in hdr
