"""Umbrella sampling + MBAR unbiasing (tpu_smc/umbrella.py).

Three-level validation: the biased sampler reduces bitwise to the plain
one at zero spring (exact-MH plumbing); a strong spring localizes the
tagged particle at its window center (the bias acts, and only on the
tag); and the MBAR unbiasing recovers a KNOWN analytic potential from
exactly-distributed synthetic window samples (the estimator math,
independent of the sampler).
"""

import jax
import numpy as np
import pytest

from tpu_smc.config import RunParams, SMCConfig
from tpu_smc.sampler import sweep
from tpu_smc.state import init_chain_state
from tpu_smc.umbrella import (UmbrellaResults, parse_centers,
                              simulate_umbrella, umbrella_pmf)

CFG = SMCConfig(n=16, box_l=12.0, box_lz=40.0, dtype="float32")


def test_zero_spring_is_bitwise_unbiased():
    state, w = init_chain_state(CFG, jax.random.key(1))
    r1, e1, k1, a1 = sweep(state.r, state.energy, state.key, w, CFG,
                           CFG.proposal_a)
    r2, e2, k2, a2 = sweep(state.r, state.energy, state.key, w, CFG,
                           CFG.proposal_a, umbrella=(0, 0.0, -3.0))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    assert int(a1) == int(a2)


def test_strong_spring_localizes_only_the_tag():
    """K windows at distinct centers: each window's tagged particle ends
    near its own center; untagged particles are unaffected by window
    (they see identical physics and identical noise streams)."""
    params = RunParams(eqsteps=150, maxsteps=150, numdata=30)
    centers = [-12.0, 0.0, 12.0]
    _, res = simulate_umbrella(
        CFG, params, centers, jax.random.key(2), k_spring=20.0, tag=3,
        replicas=4)
    # [gathers, K, R] tagged z: mean per window within ~2 sigma_bias of
    # its center (sigma ~ sqrt(T/k) ~ 0.23 here; allow wall/LJ pull)
    zmean = res.z_samples[len(res.z_samples) // 2:].mean(axis=(0, 2))
    assert np.abs(zmean - np.asarray(centers)).max() < 1.5
    assert (res.acceptance > 0.5).all()


def test_umbrella_pmf_recovers_analytic_potential():
    """Exactly-distributed synthetic samples: U(z) = c2 z^2 + c1 z with
    harmonic windows gives Gaussian window distributions
    N((k z0 - c1)/(2 c2 + k), T/(2 c2 + k)); MBAR must reconstruct
    U(z) - min U on the covered grid."""
    t, c2, c1, k_spr = 1.2, 0.8, 0.5, 6.0
    centers = np.linspace(-2.0, 2.0, 9)
    rng = np.random.default_rng(3)
    var = t / (2.0 * c2 + k_spr)
    m = 4000
    reps = 4
    z = np.stack([
        rng.normal((k_spr * z0 - c1) / (2.0 * c2 + k_spr),
                   np.sqrt(var), size=(m // reps, reps))
        for z0 in centers
    ], axis=1)                                    # [g, K, R]
    res = UmbrellaResults(
        centers=centers, k_spring=k_spr, tag=0, temperature=t,
        z_samples=z, acceptance=np.ones(len(centers)))
    res = umbrella_pmf(res, n_bins=40, z_range=(-2.5, 2.5), n_boot=8)
    u = c2 * res.z_grid ** 2 + c1 * res.z_grid
    want = u - u.min()
    # compare inside the window-covered range (tail bins beyond the
    # outermost centers hold a handful of effective samples and are
    # legitimately noisy); align shapes at the best-sampled bin
    ok = np.isfinite(res.pmf) & (np.abs(res.z_grid) <= 2.0)
    assert ok.sum() > 25
    ref = np.nanargmin(res.pmf)
    diff = (res.pmf[ok] - res.pmf[ref]) - (want[ok] - want[ref])
    assert np.abs(diff).max() < 0.12, np.abs(diff).max()
    assert res.err_pmf is not None and np.nanmax(res.err_pmf) < 0.2
    # window free energies are monotone-symmetric-ish around the tilt
    assert np.isfinite(res.window_f).all()


def test_umbrella_matches_direct_histogram_in_overlap():
    """A short biased run vs the direct -T ln rho(z_tag) histogram from
    an UNBIASED ensemble of the same system: the PMFs must agree within
    a loose statistical budget in the well-sampled overlap region."""
    from tpu_smc.reweight import pmf_from_profile

    cfg = SMCConfig(n=4, box_l=10.0, box_lz=16.0, dtype="float32")
    params = RunParams(eqsteps=200, maxsteps=600, numdata=300)
    centers = np.linspace(-6.0, 6.0, 7)
    _, res = simulate_umbrella(
        cfg, params, centers, jax.random.key(4), k_spring=1.0, tag=1,
        replicas=8)
    res = umbrella_pmf(res, n_bins=24, z_range=(-7.0, 7.0), n_boot=0)

    # unbiased reference through the SAME jitted driver: one window at
    # zero spring is exactly the plain sampler (bitwise identity above)
    _, flat = simulate_umbrella(
        cfg, RunParams(200, 300, 150), [0.0],
        jax.random.key(5), k_spring=0.0, tag=1, replicas=64)
    hist, edges = np.histogram(flat.z_samples.reshape(-1),
                               bins=24, range=(-7.0, 7.0))
    direct, _ = pmf_from_profile([cfg.temperature],
                                 hist[None, :].astype(np.float64))
    both = np.isfinite(res.pmf) & np.isfinite(direct[0]) & (hist > 50)
    assert both.sum() >= 5
    a = res.pmf[both]
    b = direct[0][both]
    # align at the common minimum-F bin and compare shapes; both sides
    # are short correlated runs, so this is a loose statistical budget
    # that still catches sign/localization/weighting bugs (those are
    # multiple T-units off)
    r0 = np.argmin(b)
    assert np.abs((a - a[r0]) - (b - b[r0])).max() < 1.5


def test_parse_centers_and_cli(tmp_path, capsys):
    assert len(parse_centers("-5:5:6")) == 6
    assert list(parse_centers("1.0,2.5")) == [1.0, 2.5]
    with pytest.raises(ValueError):
        parse_centers("5:-5:4")

    from tpu_smc.cli import main

    rc = main(["40", "120", "40", "1.10", "--n", "12",
               "--umbrella=-8:8:5", "--umbrella-replicas", "3",
               "--umbrella-spring", "6.0", "--umbrella-tag", "2",
               "--umbrella-bins", "20", "--seed", "7",
               "--platform", "cpu", "--data-dir", str(tmp_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Umbrella sampling: 5 windows x 3 replicas" in out
    assert "PMF resolved over" in out
    run = next(tmp_path.iterdir())
    pf = next(p for p in run.iterdir()
              if p.name.startswith("umbrella_pmf"))
    lines = pf.read_text().strip().splitlines()
    assert lines[0] == "z, F, err"
    data_rows = [l for l in lines[1:] if not l.startswith("#")]
    assert len(data_rows) == 20
    win_rows = [l for l in lines if l.startswith("# ") and "," in l]
    assert len(win_rows) == 5 + 1   # header + 5 windows

    # the PMF panel renders on the PURE umbrella run dir (load_run
    # treats the standard trace/local artifacts as optional)
    from tpu_smc.analysis import load_run, render_all

    written = render_all(load_run(run), tmp_path / "plots")
    assert any(p.name.startswith("umbrella_pmf_") for p in written)
    assert any(p.name.startswith("wall_") for p in written)
    assert not any(p.name.startswith("traces_") for p in written)

    # guards
    with pytest.raises(SystemExit):
        main(["10", "20", "4", "1.10", "--umbrella=-5:5:3",
              "--temperatures", "1.0,1.2", "--platform", "cpu",
              "--data-dir", str(tmp_path / "x")])
    with pytest.raises(SystemExit):
        main(["10", "20", "4", "1.10", "--umbrella=-5:5:3", "--bulk",
              "--n", "32", "--platform", "cpu",
              "--data-dir", str(tmp_path / "y")])
