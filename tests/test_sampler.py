"""Sampler correctness: determinism, invariances, statistical behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_smc.config import RunParams, SMCConfig
from tpu_smc.driver import ObservableOptions, simulate
from tpu_smc.potentials import total_energy
from tpu_smc.sampler import run_sweeps, sweep
from tpu_smc.state import init_chain_state

CFG = SMCConfig(dtype="float64")


def test_sweep_deterministic():
    state, w = init_chain_state(CFG, jax.random.key(0))
    f = jax.jit(lambda r, e, k: sweep(r, e, k, w, CFG, CFG.proposal_a))
    out1 = f(state.r, state.energy, state.key)
    out2 = f(state.r, state.energy, state.key)
    for a, b in zip(out1, out2):
        if jnp.issubdtype(a.dtype, jax.dtypes.prng_key):
            a, b = jax.random.key_data(a), jax.random.key_data(b)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_incremental_energy_tracks_recompute():
    """After many sweeps the carried energy equals an exact recompute to
    fp accuracy (the drift guard of SURVEY §7.4.5)."""
    state, w = init_chain_state(CFG, jax.random.key(1))
    state, _ = jax.jit(
        lambda s: run_sweeps(s, w, CFG, 2 * CFG.proposal_a, 200, collect_trace=False)
    )(state)
    exact = float(total_energy(state.r, w, CFG))
    assert abs(float(state.energy) - exact) < 1e-9


def test_acceptance_count_consistent_with_position_changes():
    state, w = init_chain_state(CFG, jax.random.key(2))
    r0 = np.asarray(state.r)
    new, stats = jax.jit(lambda s: run_sweeps(s, w, CFG, CFG.proposal_a, 1))(state)
    moved = np.sum(np.any(np.asarray(new.r) != r0, axis=1))
    # every accepted move changes its particle's position (a.s.)
    assert moved <= int(np.asarray(stats.accepted)[0])
    assert int(np.asarray(stats.accepted)[0]) <= CFG.n


def test_wrap_keeps_xy_in_box():
    state, w = init_chain_state(CFG, jax.random.key(3))
    state, _ = jax.jit(
        lambda s: run_sweeps(s, w, CFG, 2 * CFG.proposal_a, 100, collect_trace=False)
    )(state)
    r = np.asarray(state.r)
    assert np.all(np.abs(r[:, 0]) <= CFG.box_l / 2 + 1e-9)
    assert np.all(np.abs(r[:, 1]) <= CFG.box_l / 2 + 1e-9)


def test_walls_confine_z():
    state, w = init_chain_state(CFG, jax.random.key(4))
    state, _ = jax.jit(
        lambda s: run_sweeps(s, w, CFG, 2 * CFG.proposal_a, 300, collect_trace=False)
    )(state)
    r = np.asarray(state.r)
    assert np.all(np.abs(r[:, 2]) < CFG.box_lz / 2)


def test_float32_statistics_match_float64():
    """The TPU dtype must not shift the sampled distribution measurably."""
    params = RunParams(eqsteps=500, maxsteps=1500, numdata=50)
    accs, means = [], []
    for dtype in ("float64", "float32"):
        cfg = SMCConfig(dtype=dtype)
        state, w = init_chain_state(cfg, jax.random.key(5))
        _, res = simulate(cfg, params, state, w,
                          opts=ObservableOptions(clusters=False))
        accs.append(res.acceptance_ratio)
        means.append(res.mean_energy)
    assert abs(accs[0] - accs[1]) < 0.01
    assert abs(means[0] - means[1]) < 3.0


@pytest.mark.slow
def test_smart_mc_samples_boltzmann_harmonic_analog():
    """Sanity: with interactions off (single particle far from walls in a
    huge box) Smart MC must preserve detailed balance — the free-particle
    acceptance is exactly 1 for the force-free case."""
    cfg = SMCConfig(n=2, box_l=1000.0, box_lz=4000.0, dtype="float64",
                    use_walls=False)
    # two particles far apart: no forces, pure diffusion, ap == 1
    r0 = np.asarray([[0.0, 0.0, 0.0], [100.0, 100.0, 100.0]])
    state, w = init_chain_state(cfg, jax.random.key(6), r0=r0)
    state, stats = jax.jit(
        lambda s: run_sweeps(s, w, cfg, cfg.proposal_a, 200)
    )(state)
    assert int(np.sum(np.asarray(stats.accepted))) == 200 * 2
