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


def test_reference_noise_mode_reproduces_c_moments():
    """SMCConfig(reference_noise=True) must generate noise with the C
    vecBoxMuller's dependence structure: marginally normal, but
    E[n1 * n2^2] ~ 0.275 * sigma^3 within pairs (matematicose.c:190-191;
    docs/DEVIATIONS.md F0)."""
    import jax

    from tpu_smc.rng import GlibcRandom

    cfg = SMCConfig(dtype="float64", reference_noise=True, n=108)
    # extract the noise exactly as sweep builds it
    a = cfg.proposal_a
    npairs = (3 * cfg.n + 1) // 2
    ks = jax.random.split(jax.random.key(0), 3000)
    sig = np.sqrt(2.0 * a)

    def gen(k):
        u = jax.random.uniform(k, (2, npairs), jnp.float64)
        d0 = sig * jnp.sqrt(-2.0 * jnp.log1p(-u[0])) * jnp.cos(
            2.0 * jnp.pi * u[1])
        d1 = sig * jnp.sqrt(-2.0 * jnp.log1p(-u[1])) * jnp.sin(
            2.0 * jnp.pi * u[0])
        return d0, d1

    d0, d1 = jax.vmap(gen)(ks)
    d0 = np.asarray(d0).ravel()
    d1 = np.asarray(d1).ravel()

    # the same statistic from the actual glibc-rand Box-Muller
    g = GlibcRandom(777)
    ref = g.box_muller(sig, 400_000).reshape(-1, 2)

    ours = np.mean(d0 * d1 ** 2) / sig ** 3
    theirs = np.mean(ref[:, 0] * ref[:, 1] ** 2) / sig ** 3
    assert ours == pytest.approx(theirs, abs=0.01)
    assert abs(ours - 0.275) < 0.02
    # marginals stay standard normal
    assert np.std(d0) == pytest.approx(sig, rel=0.01)
    assert np.std(d1) == pytest.approx(sig, rel=0.01)


def test_iid_noise_has_no_pair_coupling():
    """Default mode: E[n1 * n2^2] = 0 (the correct sampler)."""
    import jax

    k = jax.random.key(1)
    z = np.asarray(jax.random.normal(k, (2, 500_000), jnp.float64))
    assert abs(np.mean(z[0] * z[1] ** 2)) < 0.01
