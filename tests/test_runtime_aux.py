"""Auxiliary runtime subsystems: profiling, guards, graceful stop."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_smc.config import RunParams, SMCConfig
from tpu_smc.driver import ObservableOptions, simulate
from tpu_smc.guards import HealthError, check_state, state_health_jit
from tpu_smc.profiling import PhaseTimer, ThroughputMeter, estimate_completion
from tpu_smc.state import init_chain_state

CFG = SMCConfig(dtype="float64", storage_time=2)


def test_phase_timer_report():
    t = PhaseTimer()
    with t.phase("thermalization"):
        time.sleep(0.01)
    with t.phase("production"):
        time.sleep(0.01)
    rep = t.report(sweeps={"production": 1000})
    assert "thermalization" in rep and "per million" in rep
    assert t.seconds("production") > 0


def test_throughput_meter():
    m = ThroughputMeter()
    m.add(100, chains=8)
    assert m.chain_sweeps == 800
    assert m.sweeps_per_second > 0


def test_estimate_completion_matches_reference_formula():
    # SMC.c:131: 1.03 * sim_time * maxsteps / eqsteps / 60
    assert estimate_completion(60.0, 1000, 10000) == pytest.approx(
        1.03 * 60.0 * 10 / 60
    )


def test_health_clean_state():
    state, w = init_chain_state(CFG, jax.random.key(0))
    h = check_state(state, w, CFG)
    assert bool(np.asarray(h.finite))
    assert int(np.asarray(h.escaped_xy)) == 0
    assert float(np.asarray(h.energy_drift)) < 1e-9


def test_health_detects_nan_and_escape():
    state, w = init_chain_state(CFG, jax.random.key(1))
    bad = state._replace(r=state.r.at[0, 0].set(jnp.nan))
    with pytest.raises(HealthError):
        check_state(bad, w, CFG)
    esc = state._replace(r=state.r.at[1, 0].set(CFG.box_l))
    with pytest.raises(HealthError, match="Valhalla"):
        check_state(esc, w, CFG)


def test_health_detects_energy_drift():
    state, w = init_chain_state(CFG, jax.random.key(2))
    drifted = state._replace(energy=state.energy + 5.0)
    with pytest.raises(HealthError, match="drift"):
        check_state(drifted, w, CFG)


def test_on_window_stop_truncates_run():
    params = RunParams(eqsteps=5, maxsteps=40, numdata=8)  # 4 windows of 2
    state, w = init_chain_state(CFG, jax.random.key(3))
    calls = []

    def on_window(widx, st, out):
        calls.append(widx)
        return "stop" if widx == 1 else None

    state, res = simulate(CFG, params, state, w, on_window=on_window,
                          opts=ObservableOptions(clusters=False))
    assert calls == [0, 1]
    # traces cover only the completed windows (2 windows x 2 gathers x 5 sweeps)
    assert res.energy_trace.shape[0] == 2 * 2 * params.gather_lapse


def test_health_batched_ensemble():
    from tpu_smc.state import init_ensemble_state

    state, w = init_ensemble_state(CFG, jax.random.key(9), 4)
    h = check_state(state, w, CFG)
    assert bool(np.asarray(h.finite))
    bad = state._replace(r=state.r.at[2, 0, 2].set(CFG.box_lz))
    with pytest.raises(HealthError, match="wall"):
        check_state(bad, w, CFG)


def test_config_is_hashable_jit_key():
    cfgs = {SMCConfig(), SMCConfig(dtype="float64"), SMCConfig(n=32)}
    assert len(cfgs) == 3
    assert SMCConfig() == SMCConfig()


def test_ensemble_checkpoint_roundtrip(tmp_path):
    from tpu_smc import io as smcio
    from tpu_smc.state import init_ensemble_state

    state, w = init_ensemble_state(CFG, jax.random.key(10), 3)
    p = smcio.save_checkpoint(tmp_path / "e.npz", state, CFG)
    st2, cfg2 = smcio.load_checkpoint(p)
    assert st2.r.shape == (3, CFG.n, 3)
    np.testing.assert_array_equal(np.asarray(st2.r), np.asarray(state.r))


def test_seeded_cli_runs_bitwise_identical(tmp_path):
    """The ADVICE r1 reproducibility contract, end to end: two CLI runs
    with the same --seed must produce bitwise identical artifacts
    (deterministic therm chunking + per-sweep absolute-counter RNG)."""
    import filecmp

    from tpu_smc.cli import main as cli_main

    outs = []
    for i in (1, 2):
        d = tmp_path / f"run{i}"
        rc = cli_main(["30", "120", "12", "1.1", "--dtype", "float32",
                       "--seed", "42", "--data-dir", str(d)])
        assert rc == 0
        outs.append(next(d.iterdir()))
    names = sorted(p.name for p in outs[0].iterdir())
    assert names == sorted(p.name for p in outs[1].iterdir())
    for name in names:
        if name.startswith("info_"):
            continue  # carries wall-clock timestamps
        assert filecmp.cmp(outs[0] / name, outs[1] / name, shallow=False), \
            name
