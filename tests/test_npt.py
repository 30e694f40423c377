"""Constant-pressure (NPT) engine tests — npt.py.

Validation axes (all four were used to debug the engine into shape, in
order of increasing physics):
  1. frozen-volume runs are BITWISE the NVT bulk sampler;
  2. the ideal-gas limit reproduces the exact Gamma(N+1, T/P) volume
     law (injectable energy function);
  3. the NVT-virial closed loop: NPT at P_vir(rho0) + T/V0 (the exact
     finite-N offset of the V^(N+1) lnV-sampling weight) recovers rho0;
  4. fluctuation-dissipation: Var(V) = -T d<V>/dP (exact NPT identity).
The reference has no constant-pressure mode (SMC.c is NVT-only); the
engine is beyond-reference like gcmc.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_smc import npt
from tpu_smc.config import SMCConfig
from tpu_smc.potentials import pair_energy_force_single, pair_energy_total
from tpu_smc.sampler import run_sweeps
from tpu_smc.state import init_chain_state


def bulk_cfg(**kw):
    kw.setdefault("n", 32)
    kw.setdefault("temperature", 2.0)
    kw.setdefault("rho", 0.3)
    kw.setdefault("gamma", 0.02)
    kw.setdefault("lj_cutoff", 1.8)
    kw.setdefault("lj_shift", True)
    return SMCConfig.bulk(**kw)


def test_frozen_volume_bitwise_nvt():
    """dlnv=0 proposes the identity volume move (scale = exp(0) = 1.0
    exactly), so the position trajectory is BITWISE the NVT bulk
    sampler's — displacement sweeps consume the same key stream and
    volume moves live on a separate one."""
    cfg = bulk_cfg(temperature=0.9)
    key = jax.random.key(7)
    # same never-overlapping grid start the NPT init uses
    from tpu_smc.gcmc import cubic_grid
    chain, w = init_chain_state(cfg, key, r0=cubic_grid(cfg, cfg.n))
    nvt_end, _ = run_sweeps(chain, w, cfg, cfg.proposal_a, 25)

    st = npt.init_npt_state(cfg, key)

    @jax.jit
    def blk(st):
        def body(s, _):
            return npt.npt_sweep(s, cfg, 1.0, cfg.proposal_a, 0.0), None

        return jax.lax.scan(body, st, None, length=25)[0]

    st_end = blk(st)
    np.testing.assert_array_equal(np.asarray(st_end.r),
                                  np.asarray(nvt_end.r))
    # box untouched; identity moves all accept (dU resync only)
    assert float(st_end.l) == pytest.approx(cfg.box_l, rel=1e-6)
    assert int(st_end.vol_acc) == int(st_end.vol_att) == 25


def test_volume_move_ideal_gas_gamma_law():
    """U = 0: the NPT volume is exactly Gamma(N+1, T/P) under the lnV
    walk — <V> = (N+1)T/P, Var = (N+1)(T/P)^2. Injected zero energy
    isolates the volume-move machinery (acceptance exponent, Jacobian
    factor, key stream). The tiny cutoff pushes the hard-wall volume
    floor (V >= (2 rc)^3 = 1) far below the Gamma mass — with the
    bulk_cfg default rc=1.8 the floor (46.7) would truncate the very
    distribution under test."""
    cfg = bulk_cfg(n=8, temperature=1.3, rho=0.1, lj_cutoff=0.5)
    n, t, p = 8, 1.3, 0.7
    zero_u = lambda r, box: jnp.zeros((), cfg.jnp_dtype)

    @jax.jit
    def vol_chain(key):
        r = jnp.zeros((n, 3), cfg.jnp_dtype)
        l0 = jnp.asarray(cfg.box_l, cfg.jnp_dtype)

        def body(carry, _):
            r, l, e, k = carry
            r, l, e, k, _ = npt.volume_move(
                r, l, e, k, cfg, jnp.asarray(p, cfg.jnp_dtype),
                jnp.asarray(0.4, cfg.jnp_dtype),
                temperature=jnp.asarray(t, cfg.jnp_dtype), pair_u=zero_u)
            return (r, l, e, k), l ** 3

        _, vs = jax.lax.scan(
            body, (r, l0, jnp.zeros((), cfg.jnp_dtype), key), None,
            length=3000)
        return vs

    vs = np.asarray(jax.vmap(vol_chain)(
        jax.random.split(jax.random.key(1), 16)))[:, 800:].ravel()
    mean_th = (n + 1) * t / p
    var_th = (n + 1) * (t / p) ** 2
    assert vs.mean() == pytest.approx(mean_th, rel=0.05)
    assert vs.var() == pytest.approx(var_th, rel=0.25)


def test_lj_shift_changes_energy_not_forces():
    """cfg.lj_shift subtracts u(rc) per in-cutoff pair: U drops by
    count * u_rc, F is bitwise untouched."""
    cfg = bulk_cfg(lj_shift=False)
    cfg_s = bulk_cfg(lj_shift=True)
    r = np.asarray(init_chain_state(cfg, jax.random.key(3))[0].r)
    u0, f0 = pair_energy_force_single(jnp.asarray(r), 0, jnp.asarray(r[0]),
                                      cfg)
    u1, f1 = pair_energy_force_single(jnp.asarray(r), 0, jnp.asarray(r[0]),
                                      cfg_s)
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))
    rc6 = cfg.cutoff2 ** 3
    u_rc = 4.0 * (1.0 / (rc6 * rc6) - 1.0 / rc6)
    d = r[None, 0, :] - r
    d[:, :2] -= cfg.box_l * np.rint(d[:, :2] / cfg.box_l)
    d[:, 2] -= cfg.box_lz * np.rint(d[:, 2] / cfg.box_lz)
    cnt = int(((d ** 2).sum(-1)[1:] < cfg.cutoff2).sum())
    assert float(u0 - u1) == pytest.approx(cnt * u_rc, rel=1e-5)


def test_init_guards():
    with pytest.raises(ValueError, match="bulk-only"):
        npt.init_npt_state(SMCConfig.for_n(108), jax.random.key(0))
    with pytest.raises(ValueError, match="headroom"):
        # the bulk default rc = L/2 leaves no compression room
        npt.init_npt_state(SMCConfig.bulk(n=32, rho=0.3),
                           jax.random.key(0))


def test_volume_floor_never_crossed():
    """The hard-wall prior V >= (2 rc)^3: even a crushing external
    pressure cannot push the box below two cutoffs (min-image +
    truncation consistency)."""
    cfg = bulk_cfg(n=8, rho=0.15, lj_cutoff=1.6)
    st, res = npt.simulate_npt(cfg, pressure=50.0, eqsteps=50,
                               maxsteps=300, key=jax.random.key(2),
                               n_chains=4, dlnv=0.3, chunk=100)
    v_floor = (2.0 * cfg.lj_cutoff) ** 3
    assert res.volume_trace.min() >= v_floor - 1e-3
    # and the run really was pressed against the floor
    assert res.volume_trace.min() <= v_floor * 1.35


def test_tracked_energy_matches_recompute():
    """One raw npt_block (no driver resync): the incrementally-tracked
    energy stays within f32 drift of the exact recompute at the final
    (r, L)."""
    cfg = bulk_cfg()
    st = npt.init_npt_state(cfg, jax.random.key(9))
    st2, _ = npt.npt_block(st, cfg, 0.7, cfg.proposal_a, 0.1, 150)
    exact = float(pair_energy_total(st2.r, cfg, box=st2.l))
    assert float(st2.energy) == pytest.approx(exact, abs=5e-2)


def test_isobar_family_runs_per_chain_pressures():
    """Per-chain pressure vector: one compiled program advances an
    isobar family; densities must be monotone in P."""
    cfg = bulk_cfg(n=16, rho=0.25)
    ps = np.asarray([0.35, 0.9, 2.0])
    st, res = npt.simulate_npt(cfg, pressure=ps, eqsteps=600,
                               maxsteps=1200, key=jax.random.key(4),
                               n_chains=3, dlnv=0.15, chunk=300)
    rho = (cfg.n / res.volume_trace).mean(axis=0)
    assert rho[0] < rho[1] < rho[2]


def test_checkpoint_resume_bitwise(tmp_path):
    """save -> load -> continue equals the unbroken run bitwise (both
    key streams live in the state; chunk re-sync is deterministic)."""
    cfg = bulk_cfg(n=16, rho=0.25)
    key = jax.random.key(11)
    # unbroken: 200 + 200 production sweeps (chunk-aligned)
    st_a, _ = npt.simulate_npt(cfg, 0.7, eqsteps=100, maxsteps=400,
                               key=key, n_chains=2, dlnv=0.1, chunk=200)
    # split at 200, checkpoint, resume
    st_b, _ = npt.simulate_npt(cfg, 0.7, eqsteps=100, maxsteps=200,
                               key=key, n_chains=2, dlnv=0.1, chunk=200)
    p = npt.save_npt_checkpoint(tmp_path / "ck.npz", st_b, cfg)
    st_l, cfg_l = npt.load_npt_checkpoint(p)
    assert cfg_l == cfg
    st_c, _ = npt.simulate_npt(cfg_l, 0.7, eqsteps=0, maxsteps=200,
                               key=jax.random.key(0), n_chains=2,
                               dlnv=0.1, chunk=200, state0=st_l)
    for f in ("r", "l", "energy"):
        np.testing.assert_array_equal(np.asarray(getattr(st_a, f)),
                                      np.asarray(getattr(st_c, f)), f)


def test_isobar_reweight_self_consistent():
    """MBAR over the pressure axis evaluated AT a sampled pressure
    reproduces that group's direct average (the pooled estimator is
    consistent); ESS is healthy on the ladder and collapses on a wild
    extrapolation."""
    cfg = bulk_cfg(n=16, rho=0.25)
    ps = np.repeat([0.5, 1.4], 3)     # 2 states x 3 replicas
    _, res = npt.simulate_npt(cfg, pressure=ps, eqsteps=400,
                              maxsteps=800, key=jax.random.key(3),
                              n_chains=6, dlnv=0.12, chunk=400)
    rw = npt.reweight_isobars(res.energy_trace, res.volume_trace, ps,
                              cfg.temperature, [0.5, 1.4, 8.0], cfg.n)
    direct = (cfg.n / res.volume_trace).mean(axis=0)
    rho_05 = direct[:3].mean()
    rho_14 = direct[3:].mean()
    assert rw.rho[0] == pytest.approx(rho_05, rel=0.05)
    assert rw.rho[1] == pytest.approx(rho_14, rel=0.05)
    m = res.volume_trace.size
    assert rw.ess[0] > 0.1 * m and rw.ess[1] > 0.1 * m
    # P=8 is far outside the bracket: the ESS must collapse RELATIVE to
    # the ladder points (an absolute floor is wrong here — the V >= (2
    # rc)^3 hard wall squeezes the high-P volume distribution, so even
    # a wild extrapolation keeps weight on the many floor-adjacent
    # samples; measured ~10% of M)
    assert rw.ess[2] < 0.3 * min(rw.ess[0], rw.ess[1])
    assert rw.f_k[0] == 0.0 and len(rw.p_k) == 2


def test_isobar_reweight_matches_direct_offgrid():
    """The MBAR rho at an off-grid pressure matches a direct NPT run
    there (the continuous-EOS claim, statistical)."""
    cfg = bulk_cfg(n=16, rho=0.25)
    grid = np.repeat([0.45, 0.8, 1.5], 6)
    _, res = npt.simulate_npt(cfg, pressure=grid, eqsteps=1200,
                              maxsteps=2500, key=jax.random.key(12),
                              n_chains=18, dlnv=0.12, chunk=250)
    rw = npt.reweight_isobars(res.energy_trace, res.volume_trace, grid,
                              cfg.temperature, [1.1], cfg.n)
    _, direct = npt.simulate_npt(cfg, pressure=1.1, eqsteps=1200,
                                 maxsteps=2500, key=jax.random.key(13),
                                 n_chains=12, dlnv=0.12, chunk=250)
    assert rw.rho[0] == pytest.approx(direct.mean_density, abs=0.012)
    # kappa too: the fluctuation estimator under MBAR weights vs direct
    assert rw.kappa_t[0] == pytest.approx(direct.kappa_t, rel=0.5)


def test_tp_grid_and_2d_reweight():
    """A per-chain (T, P) state grid advances as one program; the 2-D
    MBAR (u_kn = beta_k (E + P_k V)) evaluated AT a sampled pair
    reproduces that group's direct mean, an off-grid pair matches a
    direct run there, and ESS collapses outside the bracket in the
    TEMPERATURE field too."""
    cfg = bulk_cfg(n=16, rho=0.25)
    t_grid = np.asarray([1.6, 2.4])
    p_grid = np.asarray([0.5, 1.2])
    reps = 4
    pairs = np.asarray([(t, p) for t in t_grid for p in p_grid])
    temps_c = np.repeat(pairs[:, 0], reps)
    press_c = np.repeat(pairs[:, 1], reps)
    _, res = npt.simulate_npt(
        cfg, press_c, eqsteps=1000, maxsteps=2000,
        key=jax.random.key(21), n_chains=len(temps_c), dlnv=0.12,
        chunk=250, temperatures=temps_c)
    # per-chain T really acts: at P=0.5, the hot state is less dense
    rho_chain = (cfg.n / res.volume_trace).mean(axis=0)
    rho_16_05 = rho_chain[0:4].mean()     # (1.6, 0.5)
    rho_24_05 = rho_chain[8:12].mean()    # (2.4, 0.5)
    assert rho_24_05 < rho_16_05

    targets = [(1.6, 0.5), (2.0, 0.8), (1.6, 30.0), (8.0, 0.8)]
    tg, rho, vm, kap, em, ess = npt.reweight_tp(
        res.energy_trace, res.volume_trace, temps_c, press_c,
        targets, cfg.n)
    assert rho[0] == pytest.approx(rho_16_05, rel=0.05)
    m = res.volume_trace.size
    assert ess[0] > 0.05 * m
    assert ess[2] < 0.3 * ess[0]          # P far outside
    assert ess[3] < 0.3 * ess[0]          # T far outside
    # off-grid (2.0, 0.8) vs direct simulation
    cfg2 = bulk_cfg(n=16, rho=0.25, temperature=2.0)
    _, direct = npt.simulate_npt(cfg2, 0.8, eqsteps=1000,
                                 maxsteps=2000, key=jax.random.key(22),
                                 n_chains=8, dlnv=0.12, chunk=250)
    assert rho[1] == pytest.approx(direct.mean_density, abs=0.015)


def test_npt_sharded_mesh():
    """mesh= shards the chain batch (and the per-chain pressures) over
    the 8 virtual devices. A single-sweep block is BITWISE the
    unsharded one (the math is identical); longer scans acquire
    ULP-level schedule noise from the GSPMD compilation (measured
    1e-7 after 30 sweeps) which Metropolis decisions then amplify —
    so the driver check is statistical, not bitwise."""
    from functools import partial

    from jax.sharding import NamedSharding, PartitionSpec as P

    from tpu_smc.ensemble import make_mesh

    cfg = bulk_cfg(n=16, rho=0.25)
    mesh = make_mesh(8)
    put = lambda x: jax.device_put(x, NamedSharding(mesh, P("chains")))
    keys = jax.random.split(jax.random.key(8), 8)
    st = jax.tree.map(lambda *xs: jnp.stack(xs),
                      *[npt.init_npt_state(cfg, k) for k in keys])
    ps = jnp.linspace(0.5, 1.2, 8).astype(cfg.jnp_dtype)
    run1 = jax.jit(jax.vmap(partial(
        lambda s, p: npt.npt_block(s, cfg, p, cfg.proposal_a, 0.1, 1))))
    a, _ = run1(st, ps)
    b, _ = run1(jax.tree.map(put, st), put(ps))
    for f in ("r", "l", "energy"):
        np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                      np.asarray(getattr(b, f)), f)
    # driver level: same sampler, same distribution
    psn = np.full(8, 0.8)
    kw = dict(eqsteps=150, maxsteps=400, key=jax.random.key(9),
              n_chains=8, dlnv=0.1, chunk=200)
    _, r1 = npt.simulate_npt(cfg, psn, **kw)
    _, r8 = npt.simulate_npt(cfg, psn, mesh=mesh, **kw)
    assert r8.mean_density == pytest.approx(
        r1.mean_density, abs=3 * (r1.err_density + r8.err_density))


def _run_cli(tmp_path, *extra, timeout=500):
    import os
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    env = dict(os.environ, PYTHONPATH=str(repo), JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, "-m", "tpu_smc", *extra, "--platform", "cpu",
         "--data-dir", str(tmp_path / "Data")],
        cwd=tmp_path, env=env, capture_output=True, text=True,
        timeout=timeout)


def test_npt_cli_run_and_resume(tmp_path):
    """--npt: full CLI drive — implied --bulk, results block, npt_*.csv
    + npt_gr_*.csv, checkpoint written and resumable."""
    common = ["2.0", "--npt", "0.7", "--n", "16", "--rho", "0.25",
              "--gamma", "0.02", "--chains", "2", "--seed", "5",
              "--gr-bins", "16"]
    proc = _run_cli(tmp_path, "60", "120", "20", *common,
                    "--checkpoint", str(tmp_path / "ck.npz"))
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "Constant-pressure results" in proc.stdout
    assert "--bulk implied" in proc.stdout
    f = next((tmp_path / "Data").glob("*/npt_N16_*.csv"))
    rows = np.genfromtxt(f, delimiter=",", skip_header=2)
    assert rows.shape == (120, 4) and np.isfinite(rows).all()
    assert next((tmp_path / "Data").glob("*/npt_gr_N16_*.csv"))
    proc2 = _run_cli(tmp_path, "0", "40", "10", *common,
                     "--resume", str(tmp_path / "ck.npz"))
    assert proc2.returncode == 0, proc2.stderr[-2000:]
    assert "Resuming NPT" in proc2.stdout


def test_npt_cli_isobar_grid(tmp_path):
    """--npt-grid: the compiled equation-of-state family; monotone
    rho(P) and a well-formed npt_isobar CSV."""
    proc = _run_cli(tmp_path, "250", "500", "40", "2.0",
                    "--npt-grid", "0.3:2.5:3", "--n", "16", "--rho",
                    "0.25", "--gamma", "0.02", "--chains", "2",
                    "--seed", "9", "--npt-reweight", "0.3:2.5:9")
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "Equation of state" in proc.stdout
    f = next((tmp_path / "Data").glob("*/npt_isobar_*.csv"))
    rows = np.genfromtxt(f, delimiter=",", skip_header=1)
    assert rows.shape == (3, 5)
    assert np.all(np.diff(rows[:, 1]) > 0), rows[:, 1]  # rho rises in P
    # the MBAR continuous curve landed too, monotone across the bracket
    assert "MBAR over the pressure axis" in proc.stdout
    frw = next((tmp_path / "Data").glob("*/npt_reweight_*.csv"))
    rw = np.genfromtxt(frw, delimiter=",", skip_header=1)
    assert rw.shape == (9, 6) and np.isfinite(rw).all()
    assert np.all(np.diff(rw[:, 1]) > 0), rw[:, 1]


# ---------------------------------------------------------------------
# statistical end-to-ends (full suite only — excluded from `quick`)
# ---------------------------------------------------------------------

def test_nvt_npt_closed_loop():
    """Ensemble equivalence: measure the canonical virial pressure at
    rho0, run NPT at P_vir + T/V0 (the exact finite-N offset of the
    V^(N+1) weight), recover rho0. Calibration run (this seed):
    NVT P(0.300) = 0.703 +- 0.015, NPT rho = 0.300 +- 0.002."""
    from tpu_smc import ensemble as ens
    from tpu_smc.potentials import pair_virial_pressure
    from tpu_smc.state import init_ensemble_state

    rho0, t = 0.3, 2.0
    cfg = bulk_cfg()
    state, w = init_ensemble_state(cfg, jax.random.key(0), 24)
    state, _ = ens.ensemble_sweeps(state, w, cfg, 2 * cfg.proposal_a, 500)
    vir = jax.jit(jax.vmap(lambda r: pair_virial_pressure(r, cfg)))
    ps = []
    for _ in range(60):
        state, _ = ens.ensemble_sweeps(state, w, cfg, cfg.proposal_a, 15)
        ps.append(np.asarray(vir(state.r)))
    chain_p = rho0 * t + np.asarray(ps).mean(axis=0)
    p_vir = float(chain_p.mean())
    p_err = float(chain_p.std() / np.sqrt(23))
    assert p_err < 0.03, "NVT leg too noisy to gate on"

    v0 = cfg.n / rho0
    st, res = npt.simulate_npt(cfg, pressure=p_vir + t / v0,
                               eqsteps=2500, maxsteps=5000,
                               key=jax.random.key(1), n_chains=24,
                               dlnv=0.1, chunk=250)
    # tolerance: NVT-leg error propagated through dP/drho ~ 3 plus the
    # NPT trace error (~0.002) and higher-order 1/N terms
    assert res.mean_density == pytest.approx(rho0, abs=0.02)


def test_volume_fluctuation_dissipation():
    """Exact NPT identity Var(V) = -T d<V>/dP, checked between two
    pressures (central difference). Calibration (these seeds):
    slope -122, Var 230 +- ~15%."""
    cfg = bulk_cfg()
    out = {}
    for p, seed in ((0.64, 21), (0.76, 22)):
        st, res = npt.simulate_npt(cfg, pressure=p, eqsteps=2500,
                                   maxsteps=6000, key=jax.random.key(seed),
                                   n_chains=32, dlnv=0.1, chunk=250)
        out[p] = res
    slope = (out[0.76].mean_v - out[0.64].mean_v) / 0.12
    var_pred = -2.0 * slope
    var_meas = 0.5 * (out[0.76].volume_trace.var()
                      + out[0.64].volume_trace.var())
    assert var_meas == pytest.approx(var_pred, rel=0.35)
    # and the compressibility field is populated sanely
    assert 0.5 < out[0.76].kappa_t < 2.0
