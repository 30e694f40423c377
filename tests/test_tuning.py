"""Proposal-mobility auto-tuning (tpu_smc/tuning.py).

Verified: the bisection actually reaches the requested acceptance (at
two different targets, with the tuned A ordered correctly between them);
the drivers honor the override on both engines; and the CLI flag runs
end-to-end. Detailed-balance safety is structural — tuning finishes
before production and the drivers hold opts.proposal_a fixed — and the
energy bookkeeping under an override is asserted against an exact
recompute.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from tpu_smc.config import RunParams, SMCConfig
from tpu_smc.state import init_ensemble_state
from tpu_smc.tuning import tune_mobility

CFG = SMCConfig(n=16, box_l=12.0, box_lz=40.0, dtype="float32")


def _state(c=64, seed=0):
    return init_ensemble_state(CFG, jax.random.key(seed), c)


def test_tune_reaches_target():
    state, w = _state()
    state, tr = tune_mobility(CFG, state, w, target=0.6, tol=0.02)
    # measured acceptance at the returned A (tol + measurement noise)
    assert abs(tr.acceptance - 0.6) < 0.05, tr.history
    assert tr.proposal_a > CFG.proposal_a  # 0.97 default -> larger moves
    assert tr.gamma == pytest.approx(tr.proposal_a / CFG.temperature)
    assert tr.sweeps_used == 25 * (len(tr.history) + 2)  # incl. burn-in


def test_tune_targets_are_ordered():
    """Lower target acceptance needs a LARGER mobility. (Targets chosen
    reachable under the sqrt(2A) <= L/2 proposal cap on this small
    system: at the cap its acceptance floor is ~0.57.)"""
    s1, w = _state(seed=1)
    s2, _ = _state(seed=2)
    _, lo = tune_mobility(CFG, s1, w, target=0.65, tol=0.03)
    _, hi = tune_mobility(CFG, s2, w, target=0.9, tol=0.03)
    assert lo.proposal_a > hi.proposal_a
    assert abs(lo.acceptance - 0.65) < 0.06
    assert abs(hi.acceptance - 0.9) < 0.06


def test_tune_respects_proposal_cap():
    """A target below the system's acceptance floor pins A at the
    sqrt(2A) = L/2 cap instead of diverging to meaningless move sizes."""
    state, w = _state(seed=7)
    _, tr = tune_mobility(CFG, state, w, target=0.1, tol=0.02,
                          max_blocks=10)
    a_cap = (CFG.box_l / 2.0) ** 2 / 2.0
    assert tr.proposal_a == pytest.approx(a_cap)
    assert tr.acceptance > 0.1  # honest report: target not reached


def test_tune_rejects_bad_target():
    state, w = _state(c=8)
    with pytest.raises(ValueError):
        tune_mobility(CFG, state, w, target=1.5)


def test_driver_honors_override_xla():
    """simulate_ensemble with a big proposal_a override must land at a
    visibly lower acceptance than the default, with the carried energy
    still exact."""
    from tpu_smc.driver import ObservableOptions
    from tpu_smc.driver_ensemble import simulate_ensemble
    from tpu_smc.potentials import total_energy

    params = RunParams(eqsteps=4, maxsteps=20, numdata=10)
    base = ObservableOptions(pressure=False, clusters=False)
    state, w = _state(c=32, seed=3)
    _, res_def = simulate_ensemble(CFG, params, state, w, opts=base)

    state2, _ = _state(c=32, seed=3)
    big = dataclasses.replace(base, proposal_a=20.0 * CFG.proposal_a)
    st2, res_big = simulate_ensemble(CFG, params, state2, w, opts=big)
    assert res_big.acceptance_ratio < res_def.acceptance_ratio - 0.05
    exact = jax.vmap(lambda r: total_energy(r, w, CFG))(st2.r)
    np.testing.assert_allclose(np.asarray(exact), np.asarray(st2.energy),
                               rtol=1e-4, atol=1e-3)


def test_pallas_override_routes_through_ladder_rows():
    """The pallas engine with proposal_a set must run the ladder-mode
    kernel (uniform (A, T) data rows) and keep exact energy bookkeeping
    (interpret mode on CPU)."""
    from tpu_smc.driver import ObservableOptions
    from tpu_smc.driver_ensemble import simulate_ensemble
    from tpu_smc.potentials import total_energy

    params = RunParams(eqsteps=2, maxsteps=4, numdata=4)
    opts = ObservableOptions(pressure=False, clusters=False,
                             sampler="pallas",
                             proposal_a=3.0 * CFG.proposal_a)
    state, w = _state(c=128, seed=4)
    with pltpu.force_tpu_interpret_mode():
        st2, agg = simulate_ensemble(CFG, params, state, w, opts=opts)
    assert np.isfinite(agg.mean_energy)
    assert 0.0 < agg.acceptance_ratio <= 1.0
    exact = jax.vmap(lambda r: total_energy(r, w, CFG))(st2.r)
    np.testing.assert_allclose(np.asarray(exact), np.asarray(st2.energy),
                               rtol=1e-4, atol=1e-3)


def test_tune_mobility_pallas_engine():
    """tune_mobility(sampler='pallas') through the kernel (interpret).
    Interpret-mode PRNG is lane-replicated, so only structural properties
    are asserted (the hardware statistics are covered by the xla tests +
    the per-chain-AT kernel equivalence tests in test_pallas)."""
    state, w = _state(c=128, seed=5)
    with pltpu.force_tpu_interpret_mode():
        state, tr = tune_mobility(CFG, state, w, target=0.6,
                                  sampler="pallas", max_blocks=3,
                                  sweeps_per_block=2, burn_in_blocks=1)
    assert tr.proposal_a > 0 and np.isfinite(tr.acceptance)
    assert len(tr.history) <= 3
    assert int(np.asarray(state.sweeps)[0]) == 2 * (len(tr.history) + 1)


def test_tune_ladder_per_level():
    """Every temperature level reaches the target with its OWN mobility;
    the tuned A differs across levels (hotter levels accept more at a
    given A, so they need larger moves)."""
    from tpu_smc.tuning import tune_mobility_ladder

    lt = tune_mobility_ladder(CFG, [0.9, 1.4], jax.random.key(8),
                              chains_per_t=32, target=0.7, tol=0.03)
    assert lt.a_per_t.shape == (2,)
    a_cap = (CFG.box_l / 2.0) ** 2 / 2.0
    for i in range(2):
        pinned = lt.a_per_t[i] >= a_cap * 0.999
        assert abs(lt.acceptance[i] - 0.7) < 0.06 or pinned, \
            (lt.acceptance, lt.a_per_t)
    assert lt.a_per_t[0] != lt.a_per_t[1]


def test_tsweep_honors_a_per_t():
    """The ladder driver run with a tuned a_per_t must land each level's
    production acceptance visibly below the gamma*T default (~0.97 on
    this system) and no higher than the tuned estimate + drift margin
    (the short production run starts from a fresher state than the
    equilibrated tuning ensemble, which inflates acceptance), with sane
    physics (E rises with T)."""
    from tpu_smc.tsweep import simulate_temperature_sweep
    from tpu_smc.tuning import tune_mobility_ladder

    temps = [0.9, 1.4]
    lt = tune_mobility_ladder(CFG, temps, jax.random.key(9),
                              chains_per_t=32, target=0.7, tol=0.03)
    params = RunParams(eqsteps=150, maxsteps=150, numdata=75)
    _, res = simulate_temperature_sweep(
        CFG, params, temps, jax.random.key(10), chains_per_t=32,
        a_per_t=lt.a_per_t)
    assert res.mean_energy[1] > res.mean_energy[0]
    for i in range(2):
        assert res.acceptance[i] < 0.9, res.acceptance
        assert res.acceptance[i] > lt.acceptance[i] - 0.12, \
            (res.acceptance, lt.acceptance)


def test_pt_honors_a_per_t():
    from tpu_smc.pt import simulate_parallel_tempering
    from tpu_smc.tuning import tune_mobility_ladder

    temps = [1.0, 1.2]
    lt = tune_mobility_ladder(CFG, temps, jax.random.key(11),
                              chains_per_t=16, target=0.7, tol=0.03)
    params = RunParams(eqsteps=10, maxsteps=40, numdata=20)
    _, res = simulate_parallel_tempering(
        CFG, params, temps, jax.random.key(12), chains_per_t=16,
        exchange_interval=5, a_per_t=lt.a_per_t)
    ts = res.tsweep
    assert np.all(np.isfinite(ts.mean_energy))
    # default gamma*T would sit ~0.97; the tuned ladder must not
    assert np.all(ts.acceptance < 0.9)
    assert int(res.swap_attempts.sum()) > 0


def test_cli_target_acceptance(tmp_path, capsys):
    from tpu_smc.cli import main

    rc = main(["10", "40", "8", "1.10", "--n", "12", "--seed", "6",
               "--target-acceptance", "0.6", "--platform", "cpu",
               "--data-dir", str(tmp_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Auto-tuned proposal mobility" in out


def test_cli_target_acceptance_ensemble(tmp_path, capsys):
    from tpu_smc.cli import main

    rc = main(["10", "30", "6", "1.10", "--n", "12", "--seed", "6",
               "--chains", "4", "--target-acceptance", "0.6",
               "--platform", "cpu", "--data-dir", str(tmp_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Auto-tuned proposal mobility" in out
