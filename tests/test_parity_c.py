"""Statistical parity against the COMPILED C reference, run side by side.

The chain RNGs differ (libc rand vs threefry) so parity is statistical:
mean energy and acceptance ratio agree within sampling error (the
BASELINE.md contract; the full long-run 1e-3 validation lives in
scripts/validate_parity.py)."""

import re
import subprocess

import jax
import numpy as np
import pytest

from tpu_smc.config import RunParams, SMCConfig
from tpu_smc.driver import ObservableOptions, simulate
from tpu_smc.state import init_chain_state


def run_c_reference(exe, tmp_path, eqsteps, maxsteps, numdata, t):
    out = subprocess.run(
        [str(exe), str(eqsteps), str(maxsteps), str(numdata), f"{t:.2f}"],
        cwd=tmp_path, check=True, capture_output=True, text=True, timeout=600,
    ).stdout
    res = {}
    m = re.search(r"Mean energy: ([-\d.]+) .?.? ([-\d.]+)", out)
    res["mean_energy"], res["std_energy"] = float(m.group(1)), float(m.group(2))
    m = re.search(r"Average acceptance ratio: ([\d.]+)", out)
    res["acceptance"] = float(m.group(1))
    m = re.search(r"acceptance ratio ([\d.]+), mean energy ([-\d.]+)", out)
    if m:
        res["therm_acceptance"] = float(m.group(1))
    return res


@pytest.mark.c_reference
@pytest.mark.slow
def test_statistical_parity_n108(tmp_path):
    """Pooled-replica statistical parity (de-flaked per VERDICT r1 #2).

    A single C rep's mean energy wobbles across cold starts (the binary
    reseeds from time(NULL) per run, SMC.c:40; the cross-cold-start
    spread is far larger than the warm-rep spread), so a fixed absolute
    tolerance on one rep is a coin flip. Instead: K fully independent
    cold-start C reps, each in its own cwd (no shared last_state), each
    followed by a warm eqsteps=0 run (free of the F1 trace-offset bug,
    docs/DEVIATIONS.md) — and the tolerance derives from the measured
    rep spread: 5*s*sqrt(1/K + 1) covers the pooled-C error plus our own
    single-run error (same dynamics, same length), with a floor for
    small-K spread underestimates.
    """
    from parity.reference import build_reference_main

    eqsteps, maxsteps, numdata, t = 2000, 8000, 400, 1.1
    exe = build_reference_main(108)

    K = 5
    c_means, c_accs, c_therm_accs = [], [], []
    for i in range(K):
        cdir = tmp_path / f"c{i}"
        cdir.mkdir()
        # Cold run equilibrates and leaves last_state (mean discarded:
        # its trace carries the F1 offset); warm run is the estimate.
        c_cold = run_c_reference(exe, cdir, eqsteps, maxsteps, numdata, t)
        c = run_c_reference(exe, cdir, 0, maxsteps, numdata, t)
        c_means.append(c["mean_energy"])
        c_accs.append(c["acceptance"])
        c_therm_accs.append(c_cold["therm_acceptance"])
    c = {
        "mean_energy": float(np.mean(c_means)),
        "acceptance": float(np.mean(c_accs)),
        "therm_acceptance": float(np.mean(c_therm_accs)),
    }
    c_spread = float(np.std(c_means, ddof=1))
    tol_e = max(2.5, 5.0 * c_spread * float(np.sqrt(1.0 / K + 1.0)))

    # Bug-compatible comparison (docs/DEVIATIONS.md F0/F1): the C
    # reference proposes with DEPENDENT Box-Muller noise and reports an
    # energy trace offset by (E_lattice - E_postTherm) because its
    # production trace restarts from the pre-thermalization E[0].
    cfg = SMCConfig(dtype="float64", reference_noise=True)
    params = RunParams(eqsteps, maxsteps, numdata)
    state, w = init_chain_state(cfg, jax.random.key(123))
    _, res = simulate(cfg, params, state, w,
                      opts=ObservableOptions(clusters=False))

    # acceptance: per-move s.e. ~ 1e-3 at this length, pooled over K
    # reps; allow 5x for stream-level correlation
    assert abs(res.acceptance_ratio - c["acceptance"]) < 0.01, (
        res.acceptance_ratio, c_accs)
    assert abs(res.therm_acceptance - c["therm_acceptance"]) < 0.015

    # unbiased mean energies: ours vs the pooled C estimate, tolerance
    # from the measured cross-rep spread
    assert abs(res.mean_energy - c["mean_energy"]) < tol_e, (
        res.mean_energy, c["mean_energy"], c_spread, tol_e, c_means)
