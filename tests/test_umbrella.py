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


@pytest.fixture(scope="module", autouse=True)
def _fresh_compiler_state():
    """The XLA CPU compiler has segfaulted on a FRESH large compile late
    in a long pytest session (observed twice, both times in this module
    after 250+ green tests; each time the module passes in isolation —
    an upstream compiler-state bug, not a physics failure). Dropping the
    accumulated executables/caches before this module's compiles dodges
    the conditions; the recompile cost is only this module's own."""
    jax.clear_caches()
    yield


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


def test_reus_exchange_step_slot_semantics():
    """Window exchange: bias stays with the slot, configuration (r, E,
    rbin) travels; a swap between windows i and j never changes the
    PHYSICAL energy; forced swaps (identical z) accept with probability
    one; disjoint windows with huge bias gaps reject."""
    import jax.numpy as jnp

    from tpu_smc.state import batch_chain_state, init_chain_state
    from tpu_smc.umbrella import exchange_windows_step

    cfg = SMCConfig(n=8, box_l=10.0, box_lz=30.0, dtype="float32")
    st0, w = init_chain_state(cfg, jax.random.key(6))
    st = batch_chain_state(st0, 6)     # 3 windows x 2 replicas
    centers = jnp.asarray([-5.0, 0.0, 5.0], jnp.float32)
    # all slots hold the same configuration -> delta = 0 -> accept all
    new, acc, att = exchange_windows_step(
        st, centers, 10.0, 0, 1.0 / cfg.temperature, 2,
        jax.random.key(0), 0)
    assert int(att.sum()) > 0
    assert int(acc[0]) == int(att[0])  # identical z: log P = 0, accept
    np.testing.assert_array_equal(np.asarray(new.energy),
                                  np.asarray(st.energy))

    # localized configurations + strong springs: swapping costs
    # k*|dz0|*|dz| >> T -> every attempt rejected
    z_slot = jnp.asarray(np.repeat([-5.0, 0.0, 5.0], 2), jnp.float32)
    st2 = st._replace(r=st.r.at[:, 0, 2].set(z_slot))
    _, acc2, att2 = exchange_windows_step(
        st2, centers, 50.0, 0, 1.0 / cfg.temperature, 2,
        jax.random.key(1), 0)
    assert int(att2.sum()) > 0 and int(acc2.sum()) == 0


def test_reus_run_swaps_and_matches_plain_pmf():
    """A REUS run reports nonzero swap acceptance for overlapping
    windows, and its MBAR PMF agrees with the no-exchange run's in the
    covered range (the estimator is attribution-based, so exchanges must
    not shift the answer)."""
    cfg = SMCConfig(n=8, box_l=10.0, box_lz=24.0, dtype="float32")
    params = RunParams(eqsteps=150, maxsteps=450, numdata=150)
    centers = np.linspace(-8.0, 8.0, 9)
    _, plain = simulate_umbrella(
        cfg, params, centers, jax.random.key(7), k_spring=1.0, tag=0,
        replicas=6)
    _, reus = simulate_umbrella(
        cfg, params, centers, jax.random.key(7), k_spring=1.0, tag=0,
        replicas=6, exchange_interval=3)
    assert reus.swap_acceptance is not None
    assert reus.exchange_interval == 3
    assert reus.swap_acceptance.mean() > 0.05   # overlapping windows swap

    rng = (-9.0, 9.0)
    p1 = umbrella_pmf(plain, n_bins=18, z_range=rng, n_boot=0)
    p2 = umbrella_pmf(reus, n_bins=18, z_range=rng, n_boot=0)
    both = np.isfinite(p1.pmf) & np.isfinite(p2.pmf)
    assert both.sum() >= 10
    a, b = p1.pmf[both], p2.pmf[both]
    r0 = np.argmin(a)
    assert np.abs((a - a[r0]) - (b - b[r0])).max() < 1.0


def test_parse_centers_and_cli(tmp_path, capsys):
    assert len(parse_centers("-5:5:6")) == 6
    assert list(parse_centers("1.0,2.5")) == [1.0, 2.5]
    with pytest.raises(ValueError):
        parse_centers("5:-5:4")

    from tpu_smc.cli import main

    rc = main(["40", "120", "40", "1.10", "--n", "12",
               "--umbrella=-8:8:5", "--umbrella-replicas", "3",
               "--umbrella-spring", "6.0", "--umbrella-tag", "2",
               "--umbrella-bins", "20", "--umbrella-exchange", "5",
               "--seed", "7",
               "--platform", "cpu", "--data-dir", str(tmp_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Umbrella sampling: 5 windows x 3 replicas" in out
    assert "Window-exchange swap acceptance (REUS, every 5 sweeps)" in out
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
