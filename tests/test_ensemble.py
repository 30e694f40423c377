"""Multi-chain / multi-device tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tpu_smc.config import SMCConfig
from tpu_smc import ensemble as ens
from tpu_smc.potentials import total_energy
from tpu_smc.state import init_ensemble_state, init_chain_state

CFG = SMCConfig(dtype="float64")


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_ensemble_block_runs_sharded():
    mesh = ens.make_mesh(8)
    state, w = init_ensemble_state(CFG, jax.random.key(0), n_chains=16)
    state = ens.shard_ensemble(state, mesh)
    state, mean_e, acc = ens.ensemble_block(state, w, CFG, n_sweeps=5, a_scale=2.0)
    state = jax.block_until_ready(state)
    assert np.isfinite(float(mean_e))
    assert 0.5 < float(acc) <= 1.0
    # chains decorrelate: energies not all identical after a few sweeps
    assert np.std(np.asarray(state.energy)) > 0


def test_sharded_matches_single_device():
    """The same ensemble advanced sharded vs unsharded is bit-identical
    (chains are independent; sharding must not change the math)."""
    state, w = init_ensemble_state(CFG, jax.random.key(1), n_chains=8)
    mesh = ens.make_mesh(8)
    sharded = ens.shard_ensemble(state, mesh)
    s1, e1, a1 = ens.ensemble_block(state, w, CFG, n_sweeps=3)
    s2, e2, a2 = ens.ensemble_block(sharded, w, CFG, n_sweeps=3)
    np.testing.assert_array_equal(np.asarray(s1.r), np.asarray(s2.r))
    np.testing.assert_allclose(float(e1), float(e2), rtol=1e-14)


def test_chains_are_independent_streams():
    """Distinct fold_in keys -> distinct trajectories."""
    state, w = init_ensemble_state(CFG, jax.random.key(2), n_chains=4)
    state, _, _ = ens.ensemble_block(state, w, CFG, n_sweeps=3)
    r = np.asarray(state.r)
    for a in range(4):
        for b in range(a + 1, 4):
            assert not np.allclose(r[a], r[b])


def test_particle_sharded_energy_matches_dense():
    cfg = SMCConfig(dtype="float64", n=64)
    state, w = init_chain_state(cfg, jax.random.key(3))
    # spread particles so pair terms are non-trivial
    rng = np.random.default_rng(0)
    r = jnp.asarray(
        rng.uniform(-0.45, 0.45, (64, 3))
        * np.array([6.0, 6.0, 6.0])
        + np.array([0.0, 0.0, -cfg.box_lz / 2 + 4.0])
    )
    mesh = ens.make_mesh(8, axis_names=("particles",))
    e_sharded = ens.particle_sharded_energy(r, w, cfg, mesh)
    e_dense = total_energy(r, w, cfg)
    np.testing.assert_allclose(float(e_sharded), float(e_dense), rtol=1e-12)


def test_two_axis_mesh_chains_and_particles():
    """dp x tp: chains sharded over one axis while the particle-sharded
    energy reduces over the other."""
    cfg = SMCConfig(dtype="float64", n=32, box_l=20.0, box_lz=120.0)
    mesh = ens.make_mesh(8, axis_names=("chains", "particles"), shape=(4, 2))
    state, w = init_ensemble_state(cfg, jax.random.key(4), n_chains=8)
    state = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("chains"))), state
    )
    state, mean_e, acc = ens.ensemble_block(state, w, cfg, n_sweeps=2, a_scale=2.0)
    assert np.isfinite(float(mean_e))

    # particle-sharded energy on the same mesh's second axis
    rng = np.random.default_rng(1)
    r = jnp.asarray(rng.uniform(-4.0, 4.0, (32, 3)))
    e_sharded = ens.particle_sharded_energy(r, w, cfg, mesh, axis="particles")
    e_dense = total_energy(r, w, cfg)
    np.testing.assert_allclose(float(e_sharded), float(e_dense), rtol=1e-12)


def test_ensemble_chunk_invariance_xla():
    """Seeded ensemble trajectories must be bitwise independent of how
    sweeps are split into device calls (ADVICE r1: the offset schedule
    derives from the per-sweep key chain, not from call boundaries)."""
    from tpu_smc.ensemble import ensemble_sweeps

    cfg = SMCConfig(n=12, box_l=10.0, box_lz=30.0, dtype="float64")
    state, w = init_ensemble_state(cfg, jax.random.key(3), 4)

    s_one, _ = ensemble_sweeps(state, w, cfg, cfg.proposal_a, 6)
    s_split = state
    for k in (1, 3, 2):
        s_split, _ = ensemble_sweeps(s_split, w, cfg, cfg.proposal_a, k)
    np.testing.assert_array_equal(np.asarray(s_one.r), np.asarray(s_split.r))
    np.testing.assert_array_equal(
        np.asarray(s_one.energy), np.asarray(s_split.energy))
    np.testing.assert_array_equal(
        np.asarray(s_one.accepted), np.asarray(s_split.accepted))


def test_ensemble_chunk_invariance_pallas():
    """The Pallas path's per-sweep PRNG seeds/offsets fold the ABSOLUTE
    sweep counter, so the RNG SCHEDULE is chunk-invariant: 6 sweeps ==
    1+3+2 sweeps bitwise. NOTE this bitwise form of the test requires a
    box whose f32 x*(1/L)*L round trip is exact (box_l=10 here): for
    general L the kernel's x/y pre-scale rounds once per call boundary,
    so trajectories depend on the (deterministic) chunk layout — seeded
    reproducibility is guaranteed by driver.therm_chunk's deterministic
    sizing instead (docs/DEVIATIONS.md A6)."""
    from jax.experimental.pallas import tpu as pltpu

    from tpu_smc.ensemble import ensemble_sweeps_pallas

    cfg = SMCConfig(n=12, box_l=10.0, box_lz=30.0, dtype="float32")
    state, w = init_ensemble_state(cfg, jax.random.key(4), 128)

    with pltpu.force_tpu_interpret_mode():
        s_one, _ = ensemble_sweeps_pallas(
            state, w, cfg, cfg.proposal_a, 6, c_tile=128)
        s_split = state
        for k in (1, 3, 2):
            s_split, _ = ensemble_sweeps_pallas(
                s_split, w, cfg, cfg.proposal_a, k, c_tile=128)
    np.testing.assert_array_equal(np.asarray(s_one.r), np.asarray(s_split.r))
    np.testing.assert_array_equal(
        np.asarray(s_one.energy), np.asarray(s_split.energy))
    np.testing.assert_array_equal(
        np.asarray(s_one.accepted), np.asarray(s_split.accepted))


def test_shared_offset_chains_stay_independent():
    """DEVIATIONS A3: all chains share the per-sweep cyclic offset (a visit
    SCHEDULE, for the 13x dynamic-slice layout win) while noise/uniforms
    stay per-chain. Chains must remain statistically independent: the
    cross-chain correlation of per-sweep energy increments under the
    shared schedule must match the per-chain-offset ground truth and be
    consistent with zero.

    Bound: S sweeps give per-pair corr s.e. ~ 1/sqrt(S); the mean over
    P = C(C-1)/2 pairs has s.e. ~ 1/sqrt(S*P). With S=400, C=16 we assert
    |mean| < 0.02 (~4 sigma) and max |corr| < 4.5/sqrt(S)."""
    from tpu_smc.ensemble import ensemble_sweeps
    from tpu_smc.sampler import sweep_state

    cfg = SMCConfig(n=12, box_l=10.0, box_lz=30.0, dtype="float64")
    n_chains, n_sweeps = 16, 400

    def offdiag_corr(e_tr):
        d = np.diff(np.asarray(e_tr), axis=0)        # [S-1, C] increments
        d = d - d.mean(axis=0, keepdims=True)
        sd = d.std(axis=0)
        corr = (d.T @ d) / (len(d) * np.outer(sd, sd))
        mask = ~np.eye(n_chains, dtype=bool)
        return corr[mask]

    # shared-offset path (the production ensemble engine)
    state, w = init_ensemble_state(cfg, jax.random.key(11), n_chains)
    state, _ = ensemble_sweeps(state, w, cfg, cfg.proposal_a, 100)  # equil
    _, tr = ensemble_sweeps(state, w, cfg, cfg.proposal_a, n_sweeps,
                            collect_trace=True)
    shared = offdiag_corr(tr.energy)

    # ground truth: per-chain offsets (each chain draws its own)
    state2, _ = init_ensemble_state(cfg, jax.random.key(11), n_chains)
    import jax as _jax

    def block(st, n):
        def body(s, _):
            s, stats = _jax.vmap(
                lambda c: sweep_state(c, w, cfg, cfg.proposal_a))(s)
            return s, stats
        return _jax.lax.scan(body, st, None, length=n)

    state2, _ = _jax.jit(block, static_argnums=1)(state2, 100)
    _, tr2 = _jax.jit(block, static_argnums=1)(state2, n_sweeps)
    control = offdiag_corr(tr2.energy)

    s_lim = 4.5 / np.sqrt(n_sweeps - 1)
    assert abs(shared.mean()) < 0.02, shared.mean()
    assert np.abs(shared).max() < s_lim, np.abs(shared).max()
    # shared schedule must not add correlation over the per-chain control
    assert abs(shared.mean() - control.mean()) < 0.02
    assert np.abs(shared).mean() < np.abs(control).mean() + 0.01


def test_zsorted_ragged_row_block_autoshrink():
    """zsorted must handle particle counts whose n_pad is not a multiple
    of the requested row block (auto-shrinks to a divisor) instead of
    asserting (review r2 finding)."""
    from jax.experimental.pallas import tpu as pltpu

    cfg = SMCConfig(n=200, box_l=20.0, box_lz=80.0, dtype="float32")
    state, w = init_ensemble_state(cfg, jax.random.key(0), 128)
    with pltpu.force_tpu_interpret_mode():
        st2, tr = ens.ensemble_sweeps_zsorted(
            state, w, cfg, cfg.proposal_a, 1, c_tile=128,
            row_block_rows=128)  # 200 % 128 != 0 -> shrinks to 40
    assert bool(np.all(np.isfinite(np.asarray(st2.energy))))
    acc = np.asarray(tr.accepted)
    assert np.all(acc >= 0) and np.all(acc <= cfg.n)


def test_simulate_ensemble_sharded_xla_matches_single_device():
    """Auto-sharded ensemble driver (mesh over the 8 virtual devices):
    GSPMD partitioning must not change the XLA engine's results — the
    sharded run reproduces the single-device run exactly."""
    from tpu_smc.config import RunParams
    from tpu_smc.driver import ObservableOptions
    from tpu_smc.driver_ensemble import simulate_ensemble
    from tpu_smc.ensemble import make_mesh, shard_ensemble
    from tpu_smc.state import init_ensemble_state

    cfg = SMCConfig(n=12, box_l=10.0, box_lz=30.0, dtype="float64")
    params = RunParams(eqsteps=4, maxsteps=16, numdata=8)
    opts = ObservableOptions(pressure=True, clusters=False)

    state0, w = init_ensemble_state(cfg, jax.random.key(3), 16)
    _, agg_single = simulate_ensemble(cfg, params, state0, w, opts=opts)

    mesh = make_mesh(8, axis_names=("chains",))
    state1, _ = init_ensemble_state(cfg, jax.random.key(3), 16)
    state1 = shard_ensemble(state1, mesh)
    st, agg_mesh = simulate_ensemble(cfg, params, state1, w, opts=opts,
                                     mesh=mesh)

    assert agg_mesh.mean_energy == pytest.approx(agg_single.mean_energy,
                                                 rel=1e-12)
    assert agg_mesh.acceptance_ratio == agg_single.acceptance_ratio
    for cs, cm in zip(agg_single.chains, agg_mesh.chains):
        np.testing.assert_allclose(cm.r_final, cs.r_final, rtol=1e-12)


def test_simulate_ensemble_sharded_pallas_runs():
    """The pallas engine under a mesh goes through the shard_map wrapper
    inside the windowed driver (interpret mode on the virtual devices)."""
    from jax.experimental.pallas import tpu as pltpu

    from tpu_smc.config import RunParams
    from tpu_smc.driver import ObservableOptions
    from tpu_smc.driver_ensemble import simulate_ensemble
    from tpu_smc.ensemble import make_mesh, shard_ensemble
    from tpu_smc.state import init_ensemble_state

    cfg = SMCConfig(n=16, box_l=12.0, box_lz=40.0, dtype="float32")
    params = RunParams(eqsteps=1, maxsteps=4, numdata=4)
    mesh = make_mesh(8, axis_names=("chains",))
    state, w = init_ensemble_state(cfg, jax.random.key(1), 8 * 128)
    state = shard_ensemble(state, mesh)
    with pltpu.force_tpu_interpret_mode():
        st, agg = simulate_ensemble(
            cfg, params, state, w, mesh=mesh,
            opts=ObservableOptions(pressure=False, clusters=False,
                                   sampler="pallas"))
    assert np.isfinite(agg.mean_energy)
    assert 0.0 <= agg.acceptance_ratio <= 1.0
    assert int(np.asarray(st.sweeps)[0]) == 5


def test_cli_ensemble_shards_over_virtual_devices(tmp_path, capsys):
    """CLI --chains auto-shards over the 8 virtual CPU devices."""
    from tpu_smc.cli import main

    rc = main(["10", "40", "4", "1.1", "--n", "12", "--chains", "8",
               "--seed", "3", "--dtype", "float64", "--no-trace",
               "--data-dir", str(tmp_path)])
    assert rc == 0
    outp = capsys.readouterr().out
    assert "Sharding 8 chains over 8 devices" in outp
