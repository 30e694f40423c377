#!/usr/bin/env python
"""Long-run statistical parity validation — the BASELINE.json contract:
mean energy and acceptance ratio vs the compiled C reference to 1e-3
(relative / absolute respectively) on identical configs.

Runs BOTH sides long enough that sampling error drops below the
tolerance, then compares. This is the heavyweight companion to
tests/test_parity_c.py (which uses short runs + loose bounds so CI stays
fast).

Usage:
    python scripts/validate_parity.py [--sweeps 200000] [--eqsteps 20000]
                                      [--platform cpu|tpu] [--chains 64]

Our side runs a chain ENSEMBLE so the Monte Carlo error on the ensemble
mean is sqrt(chains) smaller per sweep — this is the point of the TPU
build. The C side is one chain (its only mode), so the C estimate
dominates the combined error; we run the C binary `--c-reps` times with
different time seeds and pool.
"""

from __future__ import annotations

import argparse
import json
import re
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def run_c(exe, eqsteps, maxsteps, numdata, t, cwd):
    out = subprocess.run(
        [str(exe), str(eqsteps), str(maxsteps), str(numdata), f"{t:.2f}"],
        cwd=cwd, check=True, capture_output=True, text=True,
    ).stdout
    e = float(re.search(r"Mean energy: ([-\d.]+)", out).group(1))
    acc = float(re.search(r"Average acceptance ratio: ([\d.]+)", out).group(1))
    return e, acc


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweeps", type=int, default=100_000)
    ap.add_argument("--eqsteps", type=int, default=10_000)
    ap.add_argument("--numdata", type=int, default=1_000)
    ap.add_argument("--chains", type=int, default=64)
    ap.add_argument("--c-reps", type=int, default=3)
    ap.add_argument("--temperature", type=float, default=1.1)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--sampler", choices=("xla", "pallas", "zsorted"),
                    default="xla",
                    help="sweep engine to validate; zsorted is the "
                         "production auto default at N >= 1024, so the "
                         "1e-3 contract can be run through it directly "
                         "(hardware only — interpret-mode pallas PRNG "
                         "is lane-replicated)")
    ap.add_argument("--ks-gate", action="store_true",
                    help="also gate on the two-sample KS statistic of the "
                         "tau-decorrelated energy histograms (1%% critical "
                         "value); informational otherwise")
    ap.add_argument("--correct-noise", action="store_true",
                    help="use true i.i.d. Gaussian proposals instead of the "
                         "bug-compatible reference_noise mode. The C "
                         "reference's vecBoxMuller produces DEPENDENT pairs "
                         "(DEVIATIONS.md F0), so the apples-to-apples parity "
                         "contract runs with reference_noise=True; this flag "
                         "compares the CORRECTED sampler instead (expect "
                         "~+0.5 mean energy, +0.002 acceptance vs C).")
    ap.add_argument("--fixed-noise-c", action="store_true",
                    help="compare against the DEFECT-CORRECTED C binary "
                         "(build_reference_main(fixed_noise=True): standard "
                         "Box-Muller displacement noise, stock wall "
                         "geometry). Implies --correct-noise — both sides "
                         "then sample the same correct ensemble, which is "
                         "the strict contract for engines that cannot "
                         "reproduce the F0 pair structure (the z-sorted "
                         "production engine permutes move order and noise "
                         "rows; docs/DEVIATIONS.md A8).")
    args = ap.parse_args()
    if args.fixed_noise_c:
        args.correct_noise = True
    if args.sampler == "zsorted" and not args.correct_noise:
        ap.error(
            "--sampler zsorted cannot run the bug-compatible contract: "
            "z-sorted move order permutes the reference_noise pair "
            "structure and does NOT reproduce the C F0 ensemble "
            "(measured +0.45 E offset, 5.1 sigma — docs/DEVIATIONS.md "
            "A8). Run it with --fixed-noise-c (strict contract vs the "
            "defect-corrected C binary) or --correct-noise.")

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.dtype == "float64":
        jax.config.update("jax_enable_x64", True)

    from parity.reference import build_reference_main

    from tpu_smc.config import RunParams, SMCConfig
    from tpu_smc.driver import ObservableOptions
    from tpu_smc.driver_ensemble import simulate_ensemble
    from tpu_smc.state import init_ensemble_state

    t = args.temperature

    # C protocol: the reference's production energy trace restarts from
    # the PRE-thermalization E[0] (SMC.c:48,116,194 — deviation F1 in
    # docs/DEVIATIONS.md), biasing its reported mean by
    # (E_lattice - E_postTherm) ~ +4 on this system. To measure the C
    # code's true equilibrium we (1) run once to equilibrate and write
    # last_state, then (2) take measurement runs warm-started from it with
    # eqsteps=0 — the offset is then exactly zero.
    print(f"[C] building reference"
          f"{' (fixed-noise variant)' if args.fixed_noise_c else ''}; "
          "equilibration chain ...", flush=True)
    exe = build_reference_main(108, fixed_noise=args.fixed_noise_c)
    td_obj = tempfile.TemporaryDirectory()
    td = td_obj.name
    # Long equilibration chain; every later run warm-starts from its
    # last_state (and extends it — C overwrites last_state at exit).
    run_c(exe, args.eqsteps, max(20000, args.eqsteps), 100, t, td)
    from tpu_smc import io as smcio
    from tpu_smc.config import SMCConfig as _Cfg

    run_dirs = list((Path(td) / "Data").iterdir())
    warm0 = smcio.load_last_state(run_dirs[0], _Cfg(temperature=t))
    assert warm0 is not None, "C equilibration produced no last_state"

    # JAX phase FIRST (before the long C measurement subprocesses — the
    # TPU tunnel goes stale if the device sits idle behind minutes of
    # host-side subprocess work and then faults with UNAVAILABLE).
    print(f"[jax] running {args.chains} chains of {args.sweeps} sweeps "
          f"({args.dtype}, {args.sampler} sampler) ...", flush=True)
    # Our chains start from the SAME equilibrated configuration the C
    # measurement runs started from (the C equilibration chain's
    # last_state). This pins slow-mode (wall adsorption) metastability:
    # both samplers measure the same basin. CRITICAL SYMMETRY DETAIL:
    # the chains decorrelate via PRODUCTION-mobility sweeps, NOT the
    # driver's reference-faithful doubled-A thermalization — the C warm
    # reps run with eqsteps=0 (no doubled phase), and a doubled-A phase
    # on our side alone kicks chains out of a metastable shared basin
    # that the C chain stays in (observed: C three reps stable at
    # E~171.1 after its equilibration wandered into a minority basin,
    # ours re-escaped to 173.6 -> a 19-sigma protocol artifact, not a
    # sampler difference).
    ref_noise = not args.correct_noise
    cfg = SMCConfig(dtype=args.dtype, temperature=t,
                    reference_noise=ref_noise)
    params = RunParams(0, args.sweeps, args.numdata)
    state, w = init_ensemble_state(cfg, jax.random.key(int(time.time())),
                                   args.chains, r0=warm0)
    import jax as _jax

    from tpu_smc.driver import therm_chunk
    from tpu_smc.ensemble import ensemble_sweeps

    decor = jax.jit(
        lambda s, k: ensemble_sweeps(s, w, cfg, cfg.proposal_a, k)[0],
        static_argnums=1)
    left = min(args.eqsteps, 2000)
    while left > 0:
        k = min(left, therm_chunk(cfg))
        state = decor(state, k)
        np.asarray(state.energy[:1])
        left -= k
    state = state._replace(
        accepted=_jax.numpy.zeros_like(state.accepted))
    state, agg = simulate_ensemble(
        cfg, params, state, w,
        opts=ObservableOptions(pressure=False, clusters=False,
                               collect_sweep_trace=True,
                               sampler=args.sampler),
    )
    j_e = agg.mean_energy
    j_e_err = agg.std_energy / max(1, args.chains - 1) ** 0.5
    j_acc = agg.acceptance_ratio

    print(f"[jax] E={j_e:.4f} acc={j_acc:.5f}; now {args.c_reps} C warm "
          "measurement runs ...", flush=True)
    c_es, c_accs = [], []
    for rep in range(args.c_reps):
        e, acc = run_c(exe, 0, args.sweeps, args.numdata, t, td)
        print(f"[C] rep {rep}: E={e:.4f} acc={acc:.5f}", flush=True)
        c_es.append(e)
        c_accs.append(acc)
        time.sleep(1.1)  # srand(time(NULL)) needs a fresh second
    c_e = float(np.mean(c_es))
    c_acc = float(np.mean(c_accs))
    c_e_err = float(np.std(c_es) / max(1, len(c_es) - 1) ** 0.5)

    # Distribution-level comparison: two-sample KS on the per-gather
    # energy samples. Each side is subsampled by its OWN measured
    # integrated autocorrelation time (in gather units): a single C
    # chain carries slow basin modes with tau far beyond the in-basin
    # energy tau, and striding it by OUR tau leaves correlated samples
    # that make the KS statistic spuriously large for the effective
    # sample count (observed: KS 0.088 on a run whose means agreed at
    # 2 sigma). Per-side tau striding sizes the critical value to what
    # the data can actually resolve.
    ks_d = float("nan")
    ks_crit = float("nan")
    try:
        from tpu_smc.observables import tau_int

        c_samples = []
        for dcsv in (Path(td) / "Data").glob("*/data_*_rank0.csv"):
            rows = dcsv.read_text().strip().splitlines()[1:]
            c_samples.extend(float(rr.split(",")[0]) for rr in rows)
        c_samples = np.asarray(c_samples)
        per_chain_g = [ch.energy_trace[:: max(1, params.gather_lapse)]
                       for ch in agg.chains[:8]]
        stride_c = max(1, int(np.ceil(2.0 * tau_int(c_samples))))
        # our tau in gather units, from ONE chain (tau on a
        # concatenation would be broken by the chain boundaries)
        stride_j = max(1, int(np.ceil(2.0 * tau_int(per_chain_g[0]))))
        a_s = np.sort(c_samples[::stride_c])
        b_s = np.sort(np.concatenate(
            [g[::stride_j] for g in per_chain_g]))
        grid = np.concatenate([a_s, b_s])
        cdf_a = np.searchsorted(a_s, grid, side="right") / len(a_s)
        cdf_b = np.searchsorted(b_s, grid, side="right") / len(b_s)
        ks_d = float(np.max(np.abs(cdf_a - cdf_b)))
        # two-sample KS critical value at alpha = 1% (c(0.01) = 1.63),
        # valid for the tau-decorrelated subsamples
        na, nb = len(a_s), len(b_s)
        if na and nb:
            ks_crit = 1.63 * ((na + nb) / (na * nb)) ** 0.5
    except Exception:
        pass

    de = abs(j_e - c_e)
    dacc = abs(j_acc - c_acc)
    rel = de / abs(c_e)
    combined = (c_e_err ** 2 + j_e_err ** 2) ** 0.5
    c_acc_err = float(np.std(c_accs) / max(1, len(c_accs) - 1) ** 0.5)

    # Honest gating (ADVICE r1): the strict 1e-3 criteria are reported as
    # themselves; statistical consistency within the run's error bars is a
    # SEPARATE verdict, and "the run was too short to resolve 1e-3" is
    # called out instead of being folded into a PASS.
    strict_e = bool(rel < 1e-3)
    strict_acc = bool(dacc < 1e-3)
    consistent_e = bool(de < 3 * combined)
    consistent_acc = bool(dacc < 3 * max(c_acc_err, 1e-4))
    resolved_e = bool(combined < abs(c_e) * 1e-3 / 3)
    resolved_acc = bool(max(c_acc_err, 1e-4) < 1e-3 / 3)
    report = {
        "c": {"mean_energy": c_e, "err": c_e_err, "acceptance": c_acc,
              "acceptance_err": c_acc_err,
              "fixed_noise_binary": args.fixed_noise_c},
        "jax": {"mean_energy": j_e, "err": j_e_err, "acceptance": j_acc,
                "sweeps_per_s": agg.sweeps_per_second,
                "reference_noise": ref_noise, "sampler": args.sampler},
        "delta_energy": de,
        "delta_energy_rel": rel,
        "delta_energy_sigmas": de / combined if combined else float("nan"),
        "delta_acceptance": dacc,
        "ks_statistic_energy": ks_d,
        "ks_critical_1pct": ks_crit,
        "ks_within_critical": bool(ks_d < ks_crit)
        if np.isfinite(ks_d) and np.isfinite(ks_crit) else None,
        "strict_energy_1e-3_rel": strict_e,
        "strict_acceptance_1e-3_abs": strict_acc,
        "consistent_energy_3sigma": consistent_e,
        "consistent_acceptance_3sigma": consistent_acc,
        "resolved_at_1e-3": {"energy": resolved_e, "acceptance": resolved_acc},
    }
    print(json.dumps(report, indent=2))
    ks_ok = report["ks_within_critical"]
    if args.ks_gate and ks_ok is None:
        # the user asked for the distribution gate; a gate that could
        # not run must not silently pass
        print("PARITY: FAIL (--ks-gate requested but the KS statistic "
              "could not be computed)")
        return 1
    if args.ks_gate and ks_ok is False:
        # distribution-level gate (ROADMAP: promoted once the strict
        # energy criterion resolved): the tau-decorrelated energy
        # histograms must agree at the 1% KS level
        print(f"PARITY: FAIL (KS {ks_d:.4f} > critical {ks_crit:.4f})")
        return 1
    if strict_e and strict_acc:
        extra = (f", KS {ks_d:.4f} < {ks_crit:.4f}"
                 if args.ks_gate and ks_ok else "")
        print(f"PARITY: PASS (strict 1e-3{extra})")
        return 0
    if consistent_e and consistent_acc:
        sig = de / combined if combined else float("nan")
        print(f"PARITY: CONSISTENT (within {sig:.2f} sigma; run too short "
              f"to resolve the strict 1e-3 criterion"
              f"{'' if resolved_e else ' for energy'})")
        return 0
    print("PARITY: FAIL")
    return 1


if __name__ == "__main__":
    sys.exit(main())
