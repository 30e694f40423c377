"""Widom insertion (tpu_smc/widom.py): unit exactness, trajectory
isolation, and two physics validations — the dilute-bulk second-virial
limit and the exact bin-level activity identity

    <rho>_bin = z_act * <exp(-beta dU)>_bin        (any bin width)

which is the binned form of rho(z) = z_act <exp(-beta dU(z))> at
equilibrium (constant chemical potential across the slab). The reference
has no free-energy machinery; these tests validate the layer against
quadrature and against the simulation's own density profile instead.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_smc import widom
from tpu_smc.config import RunParams, SMCConfig
from tpu_smc.driver import ObservableOptions, simulate
from tpu_smc.driver_ensemble import simulate_ensemble
from tpu_smc.state import init_chain_state, init_ensemble_state


def _brute_ghost_energy(r, w, g, cfg):
    """Independent numpy evaluation of the ghost energy (pair + wall)."""
    r = np.asarray(r, np.float64)
    g = np.asarray(g, np.float64)
    L, Lz = cfg.box_l, cfg.box_lz
    d = g[None, :] - r
    d[:, 0] -= L * np.round(d[:, 0] / L)
    d[:, 1] -= L * np.round(d[:, 1] / L)
    if cfg.pbc_z:
        d[:, 2] -= Lz * np.round(d[:, 2] / Lz)
    dr2 = (d * d).sum(1)
    m = dr2 < cfg.cutoff2
    inv6 = 1.0 / dr2[m] ** 3
    u = 4.0 * np.sum(inv6 * inv6 - inv6)
    if not cfg.use_walls:
        return u
    # wall: uniform planar term + grid sites (potentials.py conventions)
    from tpu_smc.potentials import wall_site_positions

    dz = g[2] + Lz / 2.0
    dz -= Lz * np.round(dz / Lz)
    if g[2] <= -Lz / 2.0:
        dz = cfg.contact_dz
    elif g[2] >= Lz / 2.0:
        dz = -cfg.contact_dz
    uw = cfg.a0 / dz**12 - cfg.b0 / dz**6
    sites = np.asarray(wall_site_positions(cfg), np.float64)
    dx = g[0] - sites[:, 0]
    dx -= L * np.round(dx / L)
    dy = g[1] - sites[:, 1]
    dy -= L * np.round(dy / L)
    dr2w = dx * dx + dy * dy + dz * dz
    mw = dr2w < cfg.cutoff2
    a, b = np.asarray(w, np.float64)[mw, 0], np.asarray(w, np.float64)[mw, 1]
    inv6w = 1.0 / dr2w[mw] ** 3
    uw += np.sum(a * inv6w * inv6w - b * inv6w)
    return u + 4.0 * uw


def test_widom_delta_u_matches_brute():
    cfg = SMCConfig.for_n(108, dtype="float64")
    st, w = init_chain_state(cfg, jax.random.key(7))
    du, z = jax.jit(
        widom.widom_delta_u, static_argnames=("cfg", "k")
    )(st.r, w, cfg, st.key, 16)
    du, z = np.asarray(du), np.asarray(z)
    assert np.all(np.abs(z) <= cfg.box_lz / 2)
    # reconstruct the ghost positions from the same key to cross-check
    kx, kz = jax.random.split(jax.random.fold_in(st.key, widom._WIDOM_FOLD))
    xy = np.asarray(jax.random.uniform(
        kx, (16, 2), jnp.float64, -cfg.box_l / 2, cfg.box_l / 2))
    zz = np.asarray(jax.random.uniform(
        kz, (16,), jnp.float64, -cfg.box_lz / 2, cfg.box_lz / 2))
    np.testing.assert_array_equal(z, zz)
    for j in range(16):
        g = np.array([xy[j, 0], xy[j, 1], zz[j]])
        ref = _brute_ghost_energy(st.r, w, g, cfg)
        np.testing.assert_allclose(du[j], ref, rtol=1e-10, atol=1e-12)


def test_widom_delta_u_bulk_matches_brute():
    cfg = SMCConfig.bulk(n=32, temperature=1.0, rho=0.2, dtype="float64")
    st, w = init_chain_state(cfg, jax.random.key(3))
    du, z = widom.widom_delta_u(st.r, w, cfg, st.key, 8)
    kx, kz = jax.random.split(jax.random.fold_in(st.key, widom._WIDOM_FOLD))
    xy = np.asarray(jax.random.uniform(
        kx, (8, 2), jnp.float64, -cfg.box_l / 2, cfg.box_l / 2))
    zz = np.asarray(jax.random.uniform(
        kz, (8,), jnp.float64, -cfg.box_lz / 2, cfg.box_lz / 2))
    for j in range(8):
        g = np.array([xy[j, 0], xy[j, 1], zz[j]])
        ref = _brute_ghost_energy(st.r, w, g, cfg)
        np.testing.assert_allclose(np.asarray(du)[j], ref, rtol=1e-10)


def test_widom_sampling_leaves_trajectory_untouched():
    """Enabling insertions must not perturb the chain (the stream is a
    fold of the key, never a consumption of it)."""
    cfg = SMCConfig.for_n(108, dtype="float64")
    params = RunParams(eqsteps=4, maxsteps=20, numdata=10)
    outs = []
    for k in (0, 8):
        st, w = init_chain_state(cfg, jax.random.key(11))
        opts = ObservableOptions(pressure=False, clusters=False,
                                 collect_sweep_trace=False, widom_k=k)
        st, res = simulate(cfg, params, st, w, opts=opts,
                           max_fault_retries=0)
        outs.append(np.asarray(st.r))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_widom_window_split_invariance():
    """Insertion streams key on the ABSOLUTE gather index: splitting the
    run into different window sizes must reproduce identical samples."""
    import dataclasses

    cfg = SMCConfig.for_n(108, dtype="float64")
    dus = []
    for stor in (3, 10):
        c = dataclasses.replace(cfg, storage_time=stor)
        st, w = init_chain_state(c, jax.random.key(5))
        opts = ObservableOptions(pressure=False, clusters=False,
                                 collect_sweep_trace=False, widom_k=4)
        st, res = simulate(c, RunParams(0, 20, 10), st, w, opts=opts,
                           max_fault_retries=0)
        dus.append(res.widom_du)
    np.testing.assert_array_equal(dus[0], dus[1])


def test_mu_ex_estimator_exactness():
    """Known inputs: mu_ex = -T ln(mean exp(-du/T)); inf du drops out."""
    t = 1.7
    du = np.array([[[0.0, 1.0, np.inf, 2.0]]] * 3).reshape(1, 3, 4)
    b = np.exp(-np.array([0.0, 1.0, 2.0]) / t).sum() / 4.0
    mu, err = widom.mu_ex(du, t)
    np.testing.assert_allclose(mu, -t * np.log(b), rtol=1e-12)
    assert err < 1e-10  # identical chains -> zero bootstrap spread


def test_mu_ex_profile_binning():
    cfg = SMCConfig.for_n(108)
    lz = cfg.box_lz
    # two insertions in the first bin, one in the last; distinct energies
    du = np.array([[[1.0, 1.0, 3.0]]])
    z = np.array([[[-lz / 2 + 0.01, -lz / 2 + 0.02, lz / 2 - 0.01]]])
    centers, mu, err, counts = widom.mu_ex_profile(du, z, 2.0, cfg, nbins=8)
    assert counts[0] == 2 and counts[-1] == 1 and counts[1:-1].sum() == 0
    np.testing.assert_allclose(mu[0], 1.0, rtol=1e-10)   # -T ln e^{-1/T}
    np.testing.assert_allclose(mu[-1], 3.0, rtol=1e-10)
    assert np.isnan(mu[3])


@pytest.mark.slow
def test_dilute_bulk_matches_second_virial():
    """beta mu_ex -> 2 rho B2(T) as rho -> 0 (B2 truncated at the run's
    cutoff, matching the sampled potential)."""
    t = 2.0
    cfg = SMCConfig.bulk(n=32, temperature=t, rho=0.02, dtype="float32")
    state, w = init_ensemble_state(cfg, jax.random.key(0), n_chains=16)
    opts = ObservableOptions(pressure=False, clusters=False,
                             collect_sweep_trace=False, widom_k=256)
    params = RunParams(eqsteps=100, maxsteps=400, numdata=100)
    state, res = simulate_ensemble(cfg, params, state, w, opts=opts,
                                   max_fault_retries=0)
    mu, err = widom.mu_ex(res.widom_du, t)
    b2 = widom.second_virial(t, r_max=float(np.sqrt(cfg.cutoff2)))
    pred = 2.0 * cfg.rho * b2 * t
    # O(rho^2) corrections ~ few % at rho=0.02; gate at 4 sigma + 15%
    assert abs(mu - pred) < 4 * err + 0.15 * abs(pred), (mu, err, pred)


@pytest.mark.slow
def test_activity_identity_across_z():
    """<rho>_bin / <exp(-beta dU)>_bin is one global constant (the
    activity) in every populated bin — the binned form of the constant
    chemical potential across the slab. A thin slab (Lz=20) so local
    moves actually equilibrate it; the wall-contact bins (deep adsorbed
    layer + shoulder, slowest modes) are excluded; interior bins agree."""
    import dataclasses

    t = 1.1
    cfg = dataclasses.replace(
        SMCConfig.for_n(64, temperature=t, dtype="float32"),
        box_l=7.0, box_lz=20.0)
    nb = 40
    state, w = init_ensemble_state(cfg, jax.random.key(2), n_chains=24)
    opts = ObservableOptions(pressure=False, clusters=False,
                             collect_sweep_trace=False,
                             widom_k=128, z_bins=nb)
    params = RunParams(eqsteps=400, maxsteps=1200, numdata=300)
    state, res = simulate_ensemble(cfg, params, state, w, opts=opts,
                                   max_fault_retries=0)
    rho = res.zprofile                      # [nb], gather+chain mean
    du, z = res.widom_du, res.widom_z       # [G, C, k]
    b = np.where(np.isfinite(du), np.exp(-np.minimum(du, 700 * t) / t), 0.0)
    zb = np.clip(((z / cfg.box_lz + 0.5) * nb).astype(int), 0, nb - 1)
    boltz = np.zeros(nb)
    cnt = np.zeros(nb)
    np.add.at(boltz, zb.ravel(), b.ravel())
    np.add.at(cnt, zb.ravel(), 1.0)
    centers = -cfg.box_lz / 2 + (np.arange(nb) + 0.5) * cfg.box_lz / nb
    nsamp = len(du) * du.shape[1]
    ok = ((cnt > 500) & (boltz > 1e-3)
          & (rho * cfg.box_l**2 * (cfg.box_lz / nb) * nsamp > 400)
          & (np.abs(centers) < cfg.box_lz / 2 - 4.0))
    assert ok.sum() >= 10, f"too few populated bins: {ok.sum()}"
    act = rho[ok] / (boltz[ok] / cnt[ok])
    # per-bin activity estimates agree with their median within 15%
    # (statistical scatter only; the identity itself is exact)
    med = np.median(act)
    assert med > 0
    assert np.all(np.abs(act / med - 1.0) < 0.15), act / med


# ----------------------------------------------------------------------
# Ladder composition: paired Widom samples + MBAR mu_ex(T)
# ----------------------------------------------------------------------

def test_ladder_collects_paired_widom_samples():
    from tpu_smc.tsweep import simulate_temperature_sweep

    cfg = SMCConfig.bulk(n=32, temperature=1.0, rho=0.1, dtype="float32")
    temps = [0.9, 1.1]
    state, res = simulate_temperature_sweep(
        cfg, RunParams(eqsteps=10, maxsteps=40, numdata=10), temps,
        jax.random.key(0), chains_per_t=4, widom_k=8)
    assert res.widom_samples is not None
    b, n_t, cpt, k = res.widom_samples.shape
    assert (n_t, cpt, k) == (2, 4, 8)
    assert b == res.energy_at_pressure.shape[0]  # paired boundaries
    assert np.isfinite(res.widom_samples).mean() > 0.9


def test_pt_collects_paired_widom_samples():
    from tpu_smc.pt import simulate_parallel_tempering

    cfg = SMCConfig.bulk(n=32, temperature=1.0, rho=0.1, dtype="float32")
    state, res = simulate_parallel_tempering(
        cfg, RunParams(eqsteps=10, maxsteps=60, numdata=10),
        [0.9, 1.1, 1.3], jax.random.key(1), chains_per_t=4,
        exchange_interval=10, widom_k=4)
    ts = res.tsweep
    assert ts.widom_samples is not None
    assert ts.widom_samples.shape[1:] == (3, 4, 4)
    assert ts.widom_samples.shape[0] == ts.energy_at_pressure.shape[0]


@pytest.mark.slow
def test_reweighted_mu_ex_matches_direct_simulation():
    """mu_ex(T') from the MBAR-reweighted ladder (config weights AND
    insertion factors re-evaluated at beta') agrees with a direct
    simulation at T' — the free-energy surface is consistent with the
    sampler it came from."""
    from tpu_smc.reweight import reweight_from_ladder
    from tpu_smc.tsweep import simulate_temperature_sweep

    rho, t_mid = 0.1, 1.0
    cfg = SMCConfig.bulk(n=32, temperature=t_mid, rho=rho,
                         dtype="float32")
    temps = [0.85, 1.0, 1.15]   # t_mid ON a level would be too easy;
    # reweight from the BRACKETING levels only
    state, res = simulate_temperature_sweep(
        cfg, RunParams(eqsteps=150, maxsteps=900, numdata=150), temps,
        jax.random.key(3), chains_per_t=8, widom_k=64)
    rw = reweight_from_ladder(res, cfg, np.asarray([t_mid]),
                              n_boot=32, seed=0)
    assert rw.mu_ex is not None and rw.err_mu_ex is not None
    mu_rw, err_rw = float(rw.mu_ex[0]), float(rw.err_mu_ex[0])

    # direct run at t_mid
    cfg_d = SMCConfig.bulk(n=32, temperature=t_mid, rho=rho,
                           dtype="float32")
    st, w = init_ensemble_state(cfg_d, jax.random.key(9), n_chains=8)
    opts = ObservableOptions(pressure=False, clusters=False,
                             collect_sweep_trace=False, widom_k=64)
    st, dres = simulate_ensemble(
        cfg_d, RunParams(eqsteps=150, maxsteps=900, numdata=150),
        st, w, opts=opts, max_fault_retries=0)
    mu_d, err_d = widom.mu_ex(dres.widom_du, t_mid)

    tol = 4.0 * np.hypot(err_rw, err_d) + 0.05 * abs(mu_d)
    assert abs(mu_rw - mu_d) < tol, (mu_rw, err_rw, mu_d, err_d)
    # the signal is real: mu_ex is strongly nonzero at this density
    assert mu_d < -0.5
