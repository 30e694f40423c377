"""Grand-canonical MC (tpu_smc/gcmc.py): masked-physics exactness,
bookkeeping, the ideal-gas limit, and the Widom <-> GCMC closed loop
(mu measured at fixed N reproduces that N when imposed)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_smc import gcmc
from tpu_smc.config import SMCConfig
from tpu_smc.gcmc import _with_n, total_energy_masked
from tpu_smc.potentials import total_energy
from tpu_smc.state import init_chain_state


def test_masked_energy_matches_dense_on_full_set():
    """active = all ones reduces the masked physics to potentials.py."""
    for mk in (lambda: SMCConfig.for_n(108, dtype="float64"),
               lambda: SMCConfig.bulk(n=32, rho=0.2, dtype="float64")):
        cfg = mk()
        st, w = init_chain_state(cfg, jax.random.key(1))
        act = jnp.ones((cfg.n,), bool)
        e_m = float(total_energy_masked(st.r, act, w, cfg))
        e_d = float(total_energy(st.r, w, cfg))
        np.testing.assert_allclose(e_m, e_d, rtol=1e-12, atol=1e-10)


def test_masked_energy_ignores_parked_overlaps():
    """Parked slots may hold exact overlaps; they must contribute
    nothing (mask applied before 1/dr2)."""
    cfg = SMCConfig.bulk(n=8, rho=0.1, dtype="float64")
    st, w = init_chain_state(cfg, jax.random.key(2))
    r = st.r.at[6].set(st.r[0]).at[7].set(st.r[1])  # overlap parked slots
    act = jnp.arange(8) < 6
    e = float(total_energy_masked(r, act, w, cfg))
    cfg6 = _with_n(cfg, 6)
    e6 = float(total_energy(st.r[:6], w, cfg6))
    np.testing.assert_allclose(e, e6, rtol=1e-12, atol=1e-10)
    assert np.isfinite(e)


def test_gcmc_bookkeeping_and_counts():
    """Running energy tracks the exact masked recompute through
    displacement + insertion + deletion moves (gc_block directly — the
    driver additionally re-syncs at chunk boundaries); counters sane.
    Also guards the init fix: a cap whose OWN lattice degenerates
    (cap=24 -> na=1, wrapped overlapping layers) must still start from
    a clean n0-sized lattice."""
    t = 1.5
    cfg = SMCConfig.bulk(n=16, temperature=t, rho=0.05, dtype="float32")
    mu = t * math.log(4.0 / gcmc.box_volume(cfg))
    cfgc = _with_n(cfg, 24)
    st, w = gcmc.init_gcmc_state(cfg, jax.random.key(3), 24)
    assert abs(float(st.energy)) < 100.0, \
        "initial active set overlaps (lattice sized for cap, not n0)"
    for _ in range(3):
        st, tr = gcmc.gc_block(st, w, cfgc, mu, cfg.proposal_a, 25, 6)
    e_exact = float(total_energy_masked(st.r, st.active, w, cfgc))
    drift = abs(float(st.energy) - e_exact)
    assert drift < 1e-3, drift
    n_tr = np.asarray(tr[0])
    assert int(n_tr[-1]) == int(np.asarray(st.active).sum())
    assert np.all(n_tr >= 0) and np.all(n_tr <= 24)
    assert int(st.ins_acc) > 0 and int(st.del_acc) > 0

    # the driver path: final results consistent with the final state
    st2, res = gcmc.simulate_gcmc(cfg, mu, cap=24, eqsteps=30,
                                  maxsteps=60, key=jax.random.key(3),
                                  n_chains=2, chunk=30)
    assert int(res.n_trace[-1, 0]) == int(np.asarray(st2.active)[0].sum())
    assert 0 < res.insert_acceptance <= 1
    assert 0 < res.delete_acceptance <= 1


@pytest.mark.slow
def test_gcmc_dilute_matches_ideal_gas():
    """z -> 0: <N> -> z V (weak attractive correction at T=2 keeps it
    slightly ABOVE ideal; gate both direction-agnostically and tight)."""
    t = 2.0
    cfg = SMCConfig.bulk(n=32, temperature=t, rho=0.05, dtype="float32")
    target = 6.0
    mu = t * math.log(target / gcmc.box_volume(cfg))
    st, res = gcmc.simulate_gcmc(cfg, mu, cap=32, eqsteps=300,
                                 maxsteps=600, key=jax.random.key(0),
                                 n_chains=4)
    assert abs(res.mean_n - target) < 4 * res.err_n + 0.05 * target, \
        (res.mean_n, res.err_n)
    # dilute limit: Poisson number statistics -> kappa_T = 1/(rho T)
    ideal_k = 1.0 / (res.mean_density * t)
    assert abs(res.kappa_t - ideal_k) < 0.25 * ideal_k, \
        (res.kappa_t, ideal_k)


@pytest.mark.slow
def test_widom_gcmc_closed_loop():
    """Measure mu = T ln rho + mu_ex on an NVT run (Widom), impose it
    on a GCMC run: the density must come back. Supercritical state
    point (T=2 > Tc ~ 1.2 for this truncation) — near coexistence
    mu(rho) is non-monotonic and the loop genuinely has two solutions
    (observed at T=1.0, rho=0.1: GCMC settles on the vapor branch)."""
    from tpu_smc.config import RunParams
    from tpu_smc.driver import ObservableOptions
    from tpu_smc.driver_ensemble import simulate_ensemble
    from tpu_smc.state import init_ensemble_state
    from tpu_smc.widom import mu_ex

    t, rho = 2.0, 0.15
    cfg = SMCConfig.bulk(n=32, temperature=t, rho=rho, dtype="float32")
    st, w = init_ensemble_state(cfg, jax.random.key(5), n_chains=8)
    # fluid-scale mobility: the bulk reference A=4e-8 leaves the lattice
    # frozen, and mu_ex must be measured on the melted fluid
    opts = ObservableOptions(pressure=False, clusters=False,
                             collect_sweep_trace=False, widom_k=64,
                             proposal_a=0.1)
    st, nvt = simulate_ensemble(
        cfg, RunParams(eqsteps=150, maxsteps=700, numdata=140), st, w,
        opts=opts, max_fault_retries=0)
    muex, muerr = mu_ex(nvt.widom_du, t)
    mu = t * math.log(rho) + muex   # Lambda = 1 reduced units

    gst, res = gcmc.simulate_gcmc(cfg, mu, cap=64, eqsteps=400,
                                  maxsteps=1200, key=jax.random.key(6),
                                  n_chains=6)
    rho_gc = res.mean_density
    # dN/dmu ~ <dN^2>/T: propagate the Widom error + statistical slack
    dn = res.n_trace.var() / t * muerr
    tol = (4 * res.err_n + dn + 0.06 * rho * gcmc.box_volume(cfg))
    assert abs(res.mean_n - rho * gcmc.box_volume(cfg)) < tol, \
        (res.mean_n, rho * gcmc.box_volume(cfg), tol, muex, muerr)
    # and the run's own insertion attempts close the identity too:
    # T ln <rho> + mu_ex(in-run) == the imposed mu
    mu_back = t * math.log(res.mean_density) + res.mu_ex
    assert abs(mu_back - mu) < 0.1, (mu_back, mu, res.mu_ex)


def test_gcmc_walls_smoke():
    """Slab mode: insertions across the full z range, wall term in every
    acceptance; N stays bounded and the profile has the right shape."""
    cfg = SMCConfig.for_n(64, temperature=1.3, dtype="float32")
    import dataclasses

    cfg = dataclasses.replace(cfg, box_l=7.0, box_lz=20.0)
    mu = -2.0
    st, res = gcmc.simulate_gcmc(cfg, mu, cap=48, eqsteps=40,
                                 maxsteps=80, key=jax.random.key(7),
                                 n_chains=2, z_bins=10, chunk=40)
    assert res.zprofile is not None and res.zprofile.shape == (10,)
    assert np.all(res.n_trace <= 48) and np.isfinite(res.mean_energy)


def test_gcmc_isotherm_cli(tmp_path):
    """--gcmc-grid: one compiled isotherm; monotone <N>(mu) in the
    dilute regime and a well-formed CSV."""
    import os
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    env = dict(os.environ, PYTHONPATH=str(repo), JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "-m", "tpu_smc", "60", "200", "40", "2.0",
         "--platform", "cpu", "--bulk", "--n", "32",
         "--gcmc-grid=-9.5:-7:3", "--chains", "2", "--seed", "6",
         "--data-dir", str(tmp_path / "Data")],
        cwd=tmp_path, env=env, capture_output=True, text=True,
        timeout=500,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "Adsorption isotherm" in proc.stdout
    f = next((tmp_path / "Data").glob("*/gcmc_isotherm_*.csv"))
    rows = np.genfromtxt(f, delimiter=",", skip_header=1)
    assert rows.shape == (3, 4)
    n = rows[:, 1]
    assert np.all(np.diff(n) > 0), n  # dilute branch: strictly rising


def test_gcmc_checkpoint_resume_bitwise():
    """30+30 resumed sweeps reproduce an unbroken 60-sweep run exactly:
    the per-sweep key stream lives in the state, and no acceptance reads
    the tracked energy, so chunking/resync can't perturb trajectories."""
    import tempfile
    from pathlib import Path

    t = 1.5
    cfg = SMCConfig.bulk(n=16, temperature=t, rho=0.05, dtype="float32")
    mu = t * math.log(4.0 / gcmc.box_volume(cfg))

    st_a, _ = gcmc.simulate_gcmc(cfg, mu, cap=24, eqsteps=10,
                                 maxsteps=60, key=jax.random.key(9),
                                 n_chains=2, chunk=25)
    st_b, _ = gcmc.simulate_gcmc(cfg, mu, cap=24, eqsteps=10,
                                 maxsteps=30, key=jax.random.key(9),
                                 n_chains=2, chunk=25)
    with tempfile.TemporaryDirectory() as td:
        p = gcmc.save_gcmc_checkpoint(Path(td) / "ck.npz", st_b, cfg)
        st_r, cfg_r = gcmc.load_gcmc_checkpoint(p)
        assert cfg_r.temperature == cfg.temperature
        st_c, _ = gcmc.simulate_gcmc(cfg, mu, cap=24, eqsteps=0,
                                     maxsteps=30, key=jax.random.key(1),
                                     n_chains=2, chunk=25, state0=st_r)
    np.testing.assert_array_equal(np.asarray(st_a.r), np.asarray(st_c.r))
    np.testing.assert_array_equal(np.asarray(st_a.active),
                                  np.asarray(st_c.active))


@pytest.mark.slow
def test_gcmc_gr_matches_nvt_at_same_density():
    """Ensemble equivalence: the grand-canonical pair structure at <rho>
    equals the canonical structure at the same density (well-sampled
    bins, statistical tolerance). Also pins the pair-weighted g(r)
    normalization for fluctuating N."""
    import jax.numpy as jnp

    from tpu_smc.config import RunParams
    from tpu_smc.driver import ObservableOptions
    from tpu_smc.driver_ensemble import simulate_ensemble
    from tpu_smc.observables import radial_distribution
    from tpu_smc.state import init_ensemble_state

    t, rho = 2.0, 0.15
    cfg = SMCConfig.bulk(n=32, temperature=t, rho=rho, dtype="float32")
    # mu tuned so <N> lands near 32 (the NVT comparison point must be
    # FCC-friendly: arbitrary N degenerates the reference lattice
    # builder in a cubic box — the same trap init_gcmc_state dodges)
    mu = t * math.log(rho) - 0.54
    st, res = gcmc.simulate_gcmc(cfg, mu, cap=64, eqsteps=250,
                                 maxsteps=900, key=jax.random.key(4),
                                 n_chains=6, gr_bins=24)
    assert res.gr is not None and res.gr.shape == (24,)
    n_match = 32
    assert abs(res.mean_n - n_match) < 3.0, res.mean_n  # same state

    cfg_n = cfg  # same N=32 box: identical geometry and normalization
    stn, w = init_ensemble_state(cfg_n, jax.random.key(5), n_chains=6)
    # the bulk variant's reference mobility is A=4e-8 (frozen on NVT
    # timescales — GCMC melts via exchanges instead); give the NVT
    # comparison a fluid-scale mobility so its lattice actually melts
    opts = ObservableOptions(pressure=False, clusters=False,
                             collect_sweep_trace=False, gr_bins=24,
                             proposal_a=0.1)
    stn, nvt = simulate_ensemble(
        cfg_n, RunParams(eqsteps=250, maxsteps=900, numdata=180), stn,
        w, opts=opts, max_fault_retries=0)

    ok = (nvt.gr > 0.2) & (res.gr > 0.2)   # well-sampled shells
    assert ok.sum() >= 8
    diff = np.abs(res.gr[ok] - nvt.gr[ok])
    assert diff.mean() < 0.12, (res.gr[ok], nvt.gr[ok])
    assert diff.max() < 0.35, (res.gr[ok], nvt.gr[ok])
