"""Elastic recovery (SURVEY §5.3): device faults mid-window are caught,
the window replays from the host snapshot, and the run continues —
producing BITWISE the same results as an uninterrupted run (absolute
seeding makes replays exact). The reference has no recovery at all; its
closest analog is the warm-start file (main.c:98-113).
"""

import jax
import numpy as np
import pytest

import tpu_smc.driver as driver
import tpu_smc.driver_ensemble as de
from tpu_smc.config import RunParams, SMCConfig
from tpu_smc.driver import ObservableOptions, simulate
from tpu_smc.driver_ensemble import simulate_ensemble
from tpu_smc.state import batch_chain_state, init_chain_state


# Small windows (storage_time=2 over 8 gathers -> 4 windows) so the
# injected fault lands mid-run with committed windows before AND after it.
CFG = SMCConfig(dtype="float32", storage_time=2)
PARAMS = RunParams(eqsteps=5, maxsteps=40, numdata=8)


def _fresh_state():
    return init_chain_state(CFG, jax.random.key(11))


class _FaultOnce:
    """Wrap a window function: raise a device-fault-shaped error on the
    chosen call index, then delegate normally."""

    def __init__(self, fn, fail_on_call=1, times=1):
        self.fn = fn
        self.fail_on = fail_on_call
        self.times = times
        self.calls = 0

    def __call__(self, *a, **k):
        self.calls += 1
        if self.calls >= self.fail_on and self.times > 0:
            self.times -= 1
            raise jax.errors.JaxRuntimeError(
                "UNAVAILABLE: Lost connection: kernel fault (injected)")
        return self.fn(*a, **k)


def test_single_chain_recovers_bitwise(monkeypatch):
    state, w = _fresh_state()
    _, clean = simulate(CFG, PARAMS, state, w)

    state2, w2 = _fresh_state()
    inj = _FaultOnce(driver.simulate_window, fail_on_call=2)
    monkeypatch.setattr(driver, "simulate_window", inj)
    _, faulted = simulate(CFG, PARAMS, state2, w2)
    assert inj.times == 0, "fault was never injected"

    np.testing.assert_array_equal(clean.energy_trace, faulted.energy_trace)
    np.testing.assert_array_equal(clean.accept_trace, faulted.accept_trace)
    np.testing.assert_array_equal(clean.r_final, faulted.r_final)
    np.testing.assert_array_equal(clean.density, faulted.density)
    assert clean.acceptance_ratio == faulted.acceptance_ratio


def test_retry_budget_exhaustion_reraises(monkeypatch):
    state, w = _fresh_state()
    inj = _FaultOnce(driver.simulate_window, fail_on_call=1, times=99)
    monkeypatch.setattr(driver, "simulate_window", inj)
    with pytest.raises(jax.errors.JaxRuntimeError, match="UNAVAILABLE"):
        simulate(CFG, PARAMS, state, w, max_fault_retries=2)
    assert inj.calls == 3  # initial + 2 retries


def test_non_fault_errors_are_not_swallowed(monkeypatch):
    state, w = _fresh_state()

    def boom(*a, **k):
        raise TypeError("a programming error, not a device fault")

    monkeypatch.setattr(driver, "simulate_window", boom)
    with pytest.raises(TypeError):
        simulate(CFG, PARAMS, state, w)


def test_disabled_retries_reraise_immediately(monkeypatch):
    state, w = _fresh_state()
    inj = _FaultOnce(driver.simulate_window, fail_on_call=1)
    monkeypatch.setattr(driver, "simulate_window", inj)
    with pytest.raises(jax.errors.JaxRuntimeError):
        simulate(CFG, PARAMS, state, w, max_fault_retries=0)
    assert inj.calls == 1


def test_ensemble_recovers_bitwise(monkeypatch):
    state, w = _fresh_state()
    st = batch_chain_state(state, 4)
    opts = ObservableOptions(stream_seed=5)
    _, clean = simulate_ensemble(CFG, PARAMS, st, w, opts=opts)

    state2, w2 = _fresh_state()
    st2 = batch_chain_state(state2, 4)
    inj = _FaultOnce(de.simulate_window_batched, fail_on_call=2)
    monkeypatch.setattr(de, "simulate_window_batched", inj)
    _, faulted = simulate_ensemble(CFG, PARAMS, st2, w2, opts=opts)
    assert inj.times == 0

    for c_clean, c_faulted in zip(clean.chains, faulted.chains):
        np.testing.assert_array_equal(c_clean.energy_trace,
                                      c_faulted.energy_trace)
        np.testing.assert_array_equal(c_clean.r_final, c_faulted.r_final)


def test_is_device_fault_classification():
    assert driver.is_device_fault(
        jax.errors.JaxRuntimeError("UNAVAILABLE: kernel fault"))
    assert driver.is_device_fault(
        jax.errors.JaxRuntimeError("INTERNAL: device lost"))
    assert not driver.is_device_fault(ValueError("UNAVAILABLE"))
    assert not driver.is_device_fault(
        jax.errors.JaxRuntimeError("INVALID_ARGUMENT: shape mismatch"))
