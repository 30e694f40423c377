"""Parallel tempering (replica exchange, tpu_smc/pt.py).

The exchange rule P = min(1, exp((beta_i - beta_j)(E_i - E_j))) is
verified structurally (configurations are PERMUTED between temperature
slots, never altered), on its limits (equal temperatures always swap;
an energy ordering that makes delta large and negative never swaps),
and end-to-end through the driver (per-T statistics finite, swap rates
counted, seeded reproducibility).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_smc.config import RunParams, SMCConfig
from tpu_smc.pt import exchange_step, simulate_parallel_tempering
from tpu_smc.state import init_ensemble_state

CFG = SMCConfig(n=12, box_l=10.0, box_lz=30.0, dtype="float64")


def _ladder_state(cfg, n_t, chains_per_t, seed=0, decorrelate=True):
    from tpu_smc.ensemble import ensemble_sweeps

    state, w = init_ensemble_state(cfg, jax.random.key(seed),
                                   n_t * chains_per_t)
    if decorrelate:
        state, _ = ensemble_sweeps(state, w, cfg, cfg.proposal_a, 5)
    return state, w


def test_exchange_permutes_configurations():
    """A swap must move whole configurations between slots: the multiset
    of (r, energy) rows is invariant, and each slot's energy stays
    consistent with its positions."""
    from tpu_smc.potentials import total_energy_jit

    n_t, r = 4, 3
    state, w = _ladder_state(CFG, n_t, r)
    betas = jnp.asarray(1.0 / np.array([0.8, 1.0, 1.3, 1.7]))
    new, acc, att = exchange_step(state, betas, r, jax.random.key(7), 0)

    old_r = np.asarray(state.r)
    new_r = np.asarray(new.r)
    # Multiset invariance: every new row is one of the old rows.
    old_sorted = np.sort(old_r.reshape(old_r.shape[0], -1), axis=0)
    new_sorted = np.sort(new_r.reshape(new_r.shape[0], -1), axis=0)
    np.testing.assert_array_equal(old_sorted, new_sorted)
    # Energy travels with its configuration.
    for c in range(new_r.shape[0]):
        e = float(total_energy_jit(new.r[c], w, CFG))
        assert abs(e - float(new.energy[c])) < 1e-8
    # Counter shapes/bounds.
    assert acc.shape == (n_t - 1,) and att.shape == (n_t - 1,)
    assert int(att.sum()) == 2 * r  # parity 0, n_t=4: pairs (0,1),(2,3)
    assert 0 <= int(acc.sum()) <= int(att.sum())


def test_exchange_equal_temperatures_always_swaps():
    """beta_i == beta_j => delta = 0 => P = 1: every attempted pair must
    swap, and non-attempted levels must be untouched."""
    n_t, r = 4, 2
    state, w = _ladder_state(CFG, n_t, r)
    betas = jnp.ones((n_t,)) / 1.1
    new, acc, att = exchange_step(state, betas, r, jax.random.key(3), 1)

    assert np.array_equal(np.asarray(acc), np.asarray(att))
    lv = np.asarray(state.r).reshape(n_t, r, CFG.n, 3)
    nv = np.asarray(new.r).reshape(n_t, r, CFG.n, 3)
    # Parity 1: pair (1,2) swaps; levels 0 and 3 stay.
    np.testing.assert_array_equal(nv[0], lv[0])
    np.testing.assert_array_equal(nv[3], lv[3])
    np.testing.assert_array_equal(nv[1], lv[2])
    np.testing.assert_array_equal(nv[2], lv[1])


def test_exchange_rejects_when_delta_very_negative():
    """Force delta << 0 by handing the LOW-beta slot the much higher
    energy: (beta_lo - beta_hi) > 0 times (E_lo - E_hi) < 0."""
    n_t, r = 2, 3
    state, w = _ladder_state(CFG, n_t, r)
    # Slot 0 (high beta = low T) gets a huge energy bonus downward so
    # E_0 - E_1 is hugely negative.
    e = state.energy.reshape(n_t, r)
    e = e.at[0].add(-1e6)
    state = state._replace(energy=e.reshape(-1))
    betas = jnp.asarray([10.0, 0.1])
    new, acc, att = exchange_step(state, betas, r, jax.random.key(11), 0)
    assert int(att.sum()) == r
    assert int(acc.sum()) == 0
    np.testing.assert_array_equal(np.asarray(new.r), np.asarray(state.r))


def test_exchange_accepts_when_delta_positive():
    """delta > 0 => P = 1 deterministically."""
    n_t, r = 2, 3
    state, w = _ladder_state(CFG, n_t, r)
    e = state.energy.reshape(n_t, r)
    e = e.at[0].add(+1e6)   # E_lo >> E_hi with beta_lo > beta_hi
    state = state._replace(energy=e.reshape(-1))
    betas = jnp.asarray([10.0, 0.1])
    new, acc, att = exchange_step(state, betas, r, jax.random.key(11), 0)
    assert int(acc.sum()) == r
    lv = np.asarray(state.r).reshape(n_t, r, CFG.n, 3)
    nv = np.asarray(new.r).reshape(n_t, r, CFG.n, 3)
    np.testing.assert_array_equal(nv[0], lv[1])
    np.testing.assert_array_equal(nv[1], lv[0])


def test_pt_driver_end_to_end():
    temps = [0.9, 1.1, 1.4]
    params = RunParams(eqsteps=20, maxsteps=60, numdata=12)
    _, res = simulate_parallel_tempering(
        CFG, params, temps, jax.random.key(0), chains_per_t=4,
        exchange_interval=5)
    ts = res.tsweep
    assert np.all(np.isfinite(ts.mean_energy))
    assert np.all((ts.acceptance > 0) & (ts.acceptance <= 1))
    assert res.swap_acceptance.shape == (2,)
    assert np.all((res.swap_acceptance >= 0) & (res.swap_acceptance <= 1))
    # 60 sweeps / interval 5 = 12 production cycles; even/odd alternation
    # gives each adjacent pair 6 attempts x 4 ladders = 24.
    assert np.array_equal(res.swap_attempts, [24, 24])
    # LJ fluid: mean potential+kinetic energy rises with T.
    assert ts.mean_energy[-1] > ts.mean_energy[0]


def test_pt_driver_zero_production_does_not_crash():
    """ADVICE r2: maxsteps=0 used to crash in the cv line (reshape -1 on
    a size-0 array). It must return empty-sample results instead."""
    import warnings

    params = RunParams(eqsteps=8, maxsteps=0, numdata=4)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)  # nanmean of []
        _, res = simulate_parallel_tempering(
            CFG, params, [1.0, 1.3], jax.random.key(2), chains_per_t=2,
            exchange_interval=4)
    ts = res.tsweep
    assert ts.energy_samples.shape[0] == 0
    assert ts.cv.shape == (2,)


def test_pt_driver_seeded_reproducibility():
    temps = [1.0, 1.3]
    params = RunParams(eqsteps=8, maxsteps=24, numdata=6)

    def run():
        _, res = simulate_parallel_tempering(
            CFG, params, temps, jax.random.key(42), chains_per_t=2,
            exchange_interval=4)
        return res

    a, b = run(), run()
    np.testing.assert_array_equal(a.tsweep.mean_energy,
                                  b.tsweep.mean_energy)
    np.testing.assert_array_equal(a.swap_acceptance, b.swap_acceptance)


def test_pt_cli_writes_artifacts(tmp_path):
    from tpu_smc.cli import main

    rc = main(["40", "80", "8", "1.10", "--n", "12",
               "--temperatures", "1.0,1.2", "--chains-per-t", "2",
               "--pt-exchange", "10", "--seed", "5", "--platform", "cpu",
               "--data-dir", str(tmp_path)])
    assert rc == 0
    runs = list(tmp_path.iterdir())
    assert len(runs) == 1
    names = {p.name.split("_N")[0] for p in runs[0].iterdir()}
    assert "tsweep" in names and "pt" in names
    pt_file = next(p for p in runs[0].iterdir()
                   if p.name.startswith("pt_"))
    lines = pt_file.read_text().strip().splitlines()
    assert lines[0] == "T_lo, T_hi, swap_acceptance, attempts"
    assert len(lines) == 2


def test_pt_long_interval_chunked_path():
    """exchange_interval larger than the watchdog sweep budget takes the
    chunked path (sweep sub-blocks + exchange-only device calls) instead
    of one oversized device call."""
    from unittest import mock

    from tpu_smc import driver as drv

    temps = [1.0, 1.3]
    params = RunParams(eqsteps=6, maxsteps=12, numdata=6)
    # force a tiny per-call budget so interval=4 > budget=3
    with mock.patch.object(drv, "therm_chunk", lambda cfg, sampler="xla": 3):
        _, res = simulate_parallel_tempering(
            CFG, params, temps, jax.random.key(1), chains_per_t=2,
            exchange_interval=4)
    ts = res.tsweep
    assert np.all(np.isfinite(ts.mean_energy))
    assert np.all((ts.acceptance > 0) & (ts.acceptance <= 1))
    # 12 sweeps / interval 4 = 3 production cycles after ceil(6/4)=2 therm
    # cycles: absolute cycles 2,3,4 -> parities 0,1,0 -> pair (0,1)
    # attempted twice x 2 ladders
    assert np.array_equal(res.swap_attempts, [4])


def test_resolve_sampler_accounts_for_sharding():
    """--sampler auto must gate on the PER-DEVICE chain count: a global
    count that fills 128 lanes can still leave sub-lane shards."""
    from tpu_smc.cli import _resolve_sampler

    cfg32 = SMCConfig(dtype="float32")
    # CPU backend here -> always xla on auto; explicit choice passes through
    assert _resolve_sampler("pallas", cfg32, 256, n_dev=8) == "pallas"
    assert _resolve_sampler("xla", cfg32, 1024) == "xla"
    assert _resolve_sampler("auto", cfg32, 1024) == "xla"  # cpu backend

    # the gate arithmetic itself (independent of backend)
    assert 256 // 8 % 128 != 0          # the r2 finding: sub-lane shards
    assert 1024 // 8 % 128 == 0


def test_choose_exchange_interval_calibration():
    """The rule must land inside the measured-optimal band on the
    recorded v5e profile (6 levels 0.8-1.5, swap acceptances 0.58-0.92,
    measured optimum interval 10 — docs/ARCHITECTURE.md)."""
    from tpu_smc.pt import choose_exchange_interval

    measured = [0.58, 0.72, 0.81, 0.88, 0.92]
    got = choose_exchange_interval(measured)
    assert got == 10, got            # reproduces the measured optimum
    # monotone in the bottleneck acceptance; menu-quantized; clipped
    low = choose_exchange_interval([0.10, 0.9])
    high = choose_exchange_interval([0.95, 0.99])
    assert low <= got <= high
    assert low == 2                  # 0.10/0.06 = 1.7 -> clip lo=2
    assert high in (10, 20)
    for p in ([0.3], [0.6, 0.4], [0.99]):
        assert choose_exchange_interval(p) in (2, 5, 10, 20, 50)
    assert choose_exchange_interval([]) == 50  # no pairs


def test_pt_auto_interval_end_to_end():
    temps = [0.9, 1.1]
    params = RunParams(eqsteps=10, maxsteps=40, numdata=8)
    _, res = simulate_parallel_tempering(
        CFG, params, temps, jax.random.key(2), chains_per_t=4,
        exchange_interval="auto")
    assert res.probe_acceptance is not None
    assert res.probe_acceptance.shape == (1,)
    assert 0.0 <= res.probe_acceptance[0] <= 1.0
    assert res.exchange_interval in (2, 5, 10, 20, 50)
    ts = res.tsweep
    assert np.all(np.isfinite(ts.mean_energy))
    assert ts.mean_energy[-1] > ts.mean_energy[0]


def test_pt_exchange_cli_arg_parses_auto():
    from tpu_smc.cli import build_parser

    args = build_parser().parse_args(
        ["1", "2", "1", "1.0", "--pt-exchange", "auto"])
    assert args.pt_exchange == "auto"
    args = build_parser().parse_args(
        ["1", "2", "1", "1.0", "--pt-exchange", "7"])
    assert args.pt_exchange == 7


def test_pt_rejects_bad_interval_spec():
    import pytest

    with pytest.raises(ValueError, match="auto"):
        simulate_parallel_tempering(
            CFG, RunParams(2, 4, 2), [0.9, 1.1], jax.random.key(0),
            chains_per_t=2, exchange_interval="fastest")
