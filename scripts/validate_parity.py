#!/usr/bin/env python
"""Long-run statistical parity validation — the BASELINE.json contract:
mean energy and acceptance ratio vs the compiled C reference to 1e-3
(relative / absolute respectively) on identical configs, plus the
distribution-level KS gate and the spatial z-profile gate.

Runs BOTH sides long enough that sampling error drops below the
tolerance, then compares. This is the heavyweight companion to
tests/test_parity_c.py (which uses short runs + loose bounds so CI stays
fast).

Usage (single shot, the round-2..4 protocol):
    python scripts/validate_parity.py [--sweeps 200000] [--eqsteps 20000]
                                      [--platform cpu|tpu] [--chains 64]
                                      [--n 1024]

Phased (long campaigns — the C side at N=1024 runs ~55 sweeps/s, so the
measurement reps take hours; the phases let the TPU-holding JAX process
exit while the C reps grind on in the background):
    python scripts/validate_parity.py --workdir /tmp/par1024 --phase eq ...
    python scripts/validate_parity.py --workdir /tmp/par1024 --phase jax ...
    python scripts/validate_parity.py --workdir /tmp/par1024 --phase c --c-reps 1
    ... (repeat / background the c phase; reps accumulate)
    python scripts/validate_parity.py --workdir /tmp/par1024 --phase report

Our side runs a chain ENSEMBLE so the Monte Carlo error on the ensemble
mean is sqrt(chains) smaller per sweep — this is the point of the TPU
build. The C side is one chain (its only mode), so the C estimate
dominates the combined error; we run the C binary `--c-reps` times with
different time seeds and pool. Each C rep warm-starts from the previous
rep's last_state (one continuing chain measured in consecutive
segments), and its artifacts are harvested into the workdir before the
next rep overwrites the shared run directory (main.c:52-58 keys the dir
on (N, M, rho, T) only).
"""

from __future__ import annotations

import argparse
import json
import re
import shutil
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


def _c_run_dir(workdir: Path) -> Path:
    run_dirs = sorted((workdir / "c_run" / "Data").iterdir())
    assert len(run_dirs) == 1, f"expected one C run dir, got {run_dirs}"
    return run_dirs[0]


def _harvest_rep(workdir: Path, rep: int) -> None:
    """Copy the C run artifacts the report phase needs before the next
    rep overwrites them (same (N,M,rho,T) -> same dir, main.c:52-58).
    last_state rides along since round 5: it is the warm-start chain's
    only carrier, and a corrupted write (observed once at N=1024: a
    fused pair at r=0.23 entered the chain at a rep boundary and E
    pinned at +4.4e7 for every later segment) is unrecoverable without
    the previous rep's copy."""
    src = _c_run_dir(workdir)
    dst = workdir / f"c_rep_{rep:03d}"
    dst.mkdir(exist_ok=True)
    for pat in ("data_*_rank0.csv", "local_N*_rank0.csv",
                "last_state_*.csv"):
        for f in src.glob(pat):
            shutil.copy2(f, dst / f.name)


def _zmarginal_from_local_csv(path: Path, ncx: int, ncz: int) -> np.ndarray:
    """z-marginal voxel counts [ncz] from a reference local_*.csv
    (rows 'i, j, k, D, Mu' — SMC.c:218-225; D accumulates one count per
    particle per gather, SMC.c:141,912-927)."""
    z = np.zeros(ncz, dtype=np.float64)
    for line in path.read_text().strip().splitlines():
        parts = line.split(",")
        if len(parts) != 5:
            continue
        try:
            k = int(parts[2])
            d = float(parts[3])
        except ValueError:
            continue  # header
        z[k] += d
    return z


def _phase_eq(args, workdir: Path) -> None:
    from parity.reference import build_reference_main

    t = args.temperature
    print(f"[C] building reference (N={args.n})"
          f"{' (fixed-noise variant)' if args.fixed_noise_c else ''}; "
          "equilibration chain ...", flush=True)
    exe = build_reference_main(args.n, fixed_noise=args.fixed_noise_c)
    c_run = workdir / "c_run"
    c_run.mkdir(parents=True, exist_ok=True)
    if args.n > 150:
        # Warm-start the C binary from OUR lattice: its own initializer
        # leaves surplus particles overlapping at the origin for non-
        # cubic-FCC N (SMC.c:427-428 only perror()s), and the
        # overlapping start SIGSEGVs the 8-slot clusterAnalysis buffer
        # at N=1024 (observed; same dodge bench.py uses). fcc_lattice
        # and write_last_state are numpy-only — no TPU claim here.
        from tpu_smc import io as smcio
        from tpu_smc.config import SMCConfig, default_box
        from tpu_smc.system import fcc_lattice

        box_l, box_lz = default_box(args.n)
        cfg = SMCConfig(n=args.n, box_l=box_l, box_lz=box_lz,
                        temperature=t)
        d = smcio.run_dir(cfg, c_run / "Data")
        smcio.write_last_state(d, cfg, fcc_lattice(cfg))
    # Long equilibration chain; every later run warm-starts from its
    # last_state (and extends it — C overwrites last_state at exit).
    t0 = time.time()
    run_c(exe, args.eqsteps, max(20000, args.eqsteps), 100, t, c_run)
    dt = time.time() - t0
    sweeps = args.eqsteps + max(20000, args.eqsteps)
    meta = {
        "n": args.n, "temperature": t, "eqsteps": args.eqsteps,
        "sweeps": args.sweeps, "numdata": args.numdata,
        "chains": args.chains, "sampler": args.sampler,
        "dtype": args.dtype, "fixed_noise_c": args.fixed_noise_c,
        "correct_noise": args.correct_noise, "exe": str(exe),
        "decor_sweeps": args.decor_sweeps,
        "c_sweeps_per_s_measured": sweeps / dt,
    }
    (workdir / "meta.json").write_text(json.dumps(meta, indent=2))
    print(f"[C] equilibration done ({sweeps} sweeps in {dt:.0f} s = "
          f"{sweeps / dt:.1f} sweeps/s); meta saved", flush=True)


def _phase_jax(args, workdir: Path) -> None:
    meta = json.loads((workdir / "meta.json").read_text())
    t = meta["temperature"]

    import jax

    # persistent compilation cache: the zsorted N>=1024 Mosaic variants
    # are committed warm in .jax_cache/ — without this a phased campaign
    # pays ~5 min of cold Mosaic per invocation
    jax.config.update("jax_compilation_cache_dir",
                      str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if meta["dtype"] == "float64":
        jax.config.update("jax_enable_x64", True)

    from tpu_smc import io as smcio
    from tpu_smc.config import RunParams, SMCConfig, default_box
    from tpu_smc.driver import ObservableOptions, therm_chunk
    from tpu_smc.driver_ensemble import simulate_ensemble
    from tpu_smc.ensemble import ensemble_sweeps
    from tpu_smc.state import init_ensemble_state

    box_l, box_lz = default_box(meta["n"])
    ref_noise = not meta["correct_noise"]
    cfg = SMCConfig(n=meta["n"], box_l=box_l, box_lz=box_lz,
                    dtype=meta["dtype"], temperature=t,
                    reference_noise=ref_noise)
    warm0 = smcio.load_last_state(_c_run_dir(workdir), cfg)
    assert warm0 is not None, "C equilibration produced no last_state"

    chains = meta["chains"]
    print(f"[jax] running {chains} chains of {meta['sweeps']} sweeps "
          f"({meta['dtype']}, {meta['sampler']} sampler, N={meta['n']}) ...",
          flush=True)
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
    params = RunParams(0, meta["sweeps"], meta["numdata"])
    state, w = init_ensemble_state(cfg, jax.random.key(int(time.time())),
                                   chains, r0=warm0)
    # decorrelation runs through the SAME engine under test at
    # PRODUCTION mobility (cfg.proposal_a — the compile key the
    # committed warm cache already holds for zsorted at N>=1024)
    if meta["sampler"] == "zsorted":
        from tpu_smc.ensemble import ensemble_sweeps_zsorted

        decor = jax.jit(
            lambda s, k: ensemble_sweeps_zsorted(
                s, w, cfg, cfg.proposal_a, k, c_tile=128)[0],
            static_argnums=1)
    elif meta["sampler"] == "pallas":
        from tpu_smc.ensemble import ensemble_sweeps_pallas

        decor = jax.jit(
            lambda s, k: ensemble_sweeps_pallas(
                s, w, cfg, cfg.proposal_a, k)[0],
            static_argnums=1)
    else:
        decor = jax.jit(
            lambda s, k: ensemble_sweeps(s, w, cfg, cfg.proposal_a, k)[0],
            static_argnums=1)
    left = min(meta["eqsteps"], meta["decor_sweeps"])
    while left > 0:
        k = min(left, therm_chunk(cfg, sampler=meta["sampler"]))
        state = decor(state, k)
        np.asarray(state.energy[:1])
        left -= k
    state = state._replace(
        accepted=jax.numpy.zeros_like(state.accepted))
    state, agg = simulate_ensemble(
        cfg, params, state, w,
        opts=ObservableOptions(pressure=False, clusters=False,
                               collect_sweep_trace=True,
                               sampler=meta["sampler"]),
    )
    # per-chain gathered energy traces (KS input) + per-chain z-marginal
    # voxel counts (spatial-profile gate input; density field layout
    # [ncx, ncx, ncz], byte-exact vs the C localDensityAndMobility on
    # fixed configs — tests/test_observables.py)
    per_chain_g = np.stack(
        [np.asarray(ch.energy_trace[:: max(1, params.gather_lapse)])
         for ch in agg.chains[:8]])
    zmarg = np.stack(
        [np.asarray(ch.density).sum(axis=(0, 1)) for ch in agg.chains])
    np.savez(
        workdir / "jax_results.npz",
        mean_energy=agg.mean_energy,
        err=agg.std_energy / max(1, chains - 1) ** 0.5,
        acceptance=agg.acceptance_ratio,
        sweeps_per_s=agg.sweeps_per_second,
        per_chain_gathered=per_chain_g,
        zmarginal_chains=zmarg,
    )
    print(f"[jax] E={agg.mean_energy:.4f} acc={agg.acceptance_ratio:.5f} "
          f"({agg.sweeps_per_second:.0f} agg sweeps/s); results saved",
          flush=True)


def _phase_c(args, workdir: Path) -> None:
    meta = json.loads((workdir / "meta.json").read_text())
    t = meta["temperature"]
    exe = Path(meta["exe"])
    c_run = workdir / "c_run"
    results_path = workdir / "c_results.json"
    results = (json.loads(results_path.read_text())
               if results_path.exists() else [])
    for _ in range(args.c_reps):
        rep = len(results)
        t0 = time.time()
        e, acc = run_c(exe, 0, meta["sweeps"], meta["numdata"], t, c_run)
        dt = time.time() - t0
        print(f"[C] rep {rep}: E={e:.4f} acc={acc:.5f} "
              f"({meta['sweeps'] / dt:.1f} sweeps/s)", flush=True)
        _harvest_rep(workdir, rep)
        # Blow-up guard (round 5): a corrupted warm chain (fused pair,
        # E pinned at ~1e7) must not silently poison every later rep.
        # Stop the campaign and point at the last clean harvested
        # last_state; the operator restores it or re-equilibrates.
        clean = [r["e"] for r in results if abs(r["e"]) < 1e6]
        if abs(e) > 1e6 or (clean and abs(e - np.mean(clean))
                            > 0.5 * abs(np.mean(clean))):
            results.append({"e": e, "acc": acc, "wall_s": dt,
                            "excluded": "blow-up guard"})
            results_path.write_text(json.dumps(results, indent=2))
            print(f"[C] rep {rep} BLEW UP (E={e:.4g}); campaign "
                  f"stopped — restore c_rep_{rep - 1:03d}/last_state "
                  f"or rerun --phase eq", flush=True)
            sys.exit(3)
        results.append({"e": e, "acc": acc, "wall_s": dt})
        results_path.write_text(json.dumps(results, indent=2))
        time.sleep(1.1)  # srand(time(NULL)) needs a fresh second
    print(f"[C] {len(results)} reps total in {workdir}", flush=True)


def _profile_gate(args, workdir: Path, meta: dict) -> dict:
    """Spatial z-profile parity: the z-marginal of the reference's voxel
    density field (local_*.csv, SMC.c:912-927 counted per gather at
    SMC.c:141, dumped at 218-225) vs ours, both normalized to per-gather
    particle counts. Error model: between-rep SE on the C side (R reps
    = consecutive warm segments of one chain) vs between-chain SE on
    ours; gate on max per-bin |z| against the Sidak-corrected t critical
    value with R-1 dof (the thin-rep analog of the
    EVIDENCE_ZSORTED_BIAS.json 64-bin gate)."""
    from tpu_smc.config import SMCConfig

    ncx = SMCConfig().ncx
    ncz = SMCConfig().ncz
    numdata = meta["numdata"]
    reps = sorted(workdir.glob("c_rep_[0-9][0-9][0-9]"))
    c_profiles = []
    for rd in reps:
        locals_ = list(rd.glob("local_N*_rank0.csv"))
        if not locals_:
            continue
        c_profiles.append(
            _zmarginal_from_local_csv(locals_[0], ncx, ncz) / numdata)
    if len(c_profiles) < 3:
        return {"ran": False,
                "reason": f"only {len(c_profiles)} harvested local CSVs"}
    cp = np.stack(c_profiles)            # [R, ncz]
    jz = np.load(workdir / "jax_results.npz")["zmarginal_chains"] / numdata
    r_reps = cp.shape[0]
    c_mean = cp.mean(axis=0)
    c_se = cp.std(axis=0, ddof=1) / np.sqrt(r_reps)
    j_mean = jz.mean(axis=0)
    j_se = jz.std(axis=0, ddof=1) / np.sqrt(jz.shape[0])
    # Poisson floor on the combined sigma: a bin both sides visit only a
    # handful of times per run has an unresolvable empirical SE
    pool = (c_mean + j_mean) / 2
    floor = np.sqrt(np.maximum(pool, 1e-12) / (numdata * r_reps))
    sigma = np.sqrt(c_se ** 2 + j_se ** 2)
    sigma = np.maximum(sigma, floor)
    both_empty = (c_mean == 0) & (j_mean == 0)
    zsc = np.where(both_empty, 0.0, (j_mean - c_mean) / sigma)
    nbins_live = int((~both_empty).sum())
    # two-sided Sidak at alpha=1% over the live bins, t with R-1 dof
    alpha_bin = 1.0 - (1.0 - 0.01) ** (1.0 / max(1, nbins_live))
    try:
        from scipy import stats as _st
        t_crit = float(_st.t.ppf(1 - alpha_bin / 2, df=r_reps - 1))
    except Exception:  # pragma: no cover - scipy ships with jax
        from statistics import NormalDist
        zq = NormalDist().inv_cdf(1 - alpha_bin / 2)
        # crude t-vs-normal tail inflation for small rep counts
        infl = {2: 5.0, 3: 3.0, 4: 2.2, 5: 1.9, 6: 1.7, 7: 1.6,
                8: 1.5, 9: 1.45, 10: 1.4}.get(r_reps - 1, 1.3)
        t_crit = zq * infl
    max_abs_z = float(np.max(np.abs(zsc)))
    l1_rel = float(np.abs(j_mean - c_mean).sum() / c_mean.sum())
    return {
        "ran": True,
        "c_reps": r_reps,
        "nbins_live": nbins_live,
        "max_abs_z": max_abs_z,
        "t_critical": t_crit,
        "mean_abs_z": float(np.mean(np.abs(zsc[~both_empty]))),
        "l1_rel": l1_rel,
        "pass": bool(max_abs_z < t_crit),
        "c_profile": c_mean.tolist(),
        "jax_profile": j_mean.tolist(),
        "z_scores": zsc.tolist(),
    }


def _phase_report(args, workdir: Path) -> int:
    meta = json.loads((workdir / "meta.json").read_text())
    jaxr = np.load(workdir / "jax_results.npz")
    c_results = json.loads((workdir / "c_results.json").read_text())
    j_e = float(jaxr["mean_energy"])
    j_e_err = float(jaxr["err"])
    j_acc = float(jaxr["acceptance"])
    c_results = [r for r in c_results if "excluded" not in r]
    c_es = [r["e"] for r in c_results]
    c_accs = [r["acc"] for r in c_results]
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
    # the data can actually resolve. C samples pool over ALL harvested
    # reps (pre-round-5 the shared run dir meant only the last rep's
    # data CSV survived to this point).
    ks_d = float("nan")
    ks_crit = float("nan")
    try:
        from tpu_smc.observables import tau_int

        c_samples = []
        for dcsv in sorted(workdir.glob(
                "c_rep_[0-9][0-9][0-9]/data_*_rank0.csv")):
            rows = dcsv.read_text().strip().splitlines()[1:]
            c_samples.extend(float(rr.split(",")[0]) for rr in rows)
        c_samples = np.asarray(c_samples)
        per_chain_g = jaxr["per_chain_gathered"]
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
        "config": {"n": meta["n"], "temperature": meta["temperature"],
                   "sweeps": meta["sweeps"], "numdata": meta["numdata"],
                   "chains": meta["chains"],
                   "decor_sweeps": meta["decor_sweeps"]},
        "c": {"mean_energy": c_e, "err": c_e_err, "acceptance": c_acc,
              "acceptance_err": c_acc_err, "reps": len(c_es),
              "fixed_noise_binary": meta["fixed_noise_c"]},
        "jax": {"mean_energy": j_e, "err": j_e_err, "acceptance": j_acc,
                "sweeps_per_s": float(jaxr["sweeps_per_s"]),
                "reference_noise": not meta["correct_noise"],
                "sampler": meta["sampler"]},
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
    if args.profile_gate:
        report["z_profile_gate"] = _profile_gate(args, workdir, meta)
    print(json.dumps(report, indent=2))
    if args.out:
        Path(args.out).write_text(json.dumps(report, indent=2))
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
    if args.profile_gate:
        pg = report["z_profile_gate"]
        if not pg.get("ran"):
            print(f"PARITY: FAIL (--profile-gate requested but it could "
                  f"not run: {pg.get('reason')})")
            return 1
        if not pg["pass"]:
            print(f"PARITY: FAIL (z-profile max |z| {pg['max_abs_z']:.2f}"
                  f" > t critical {pg['t_critical']:.2f})")
            return 1
    if strict_e and strict_acc:
        extra = (f", KS {ks_d:.4f} < {ks_crit:.4f}"
                 if args.ks_gate and ks_ok else "")
        if args.profile_gate:
            pg = report["z_profile_gate"]
            extra += (f", z-profile max|z| {pg['max_abs_z']:.2f} < "
                      f"{pg['t_critical']:.2f}")
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweeps", type=int, default=100_000)
    ap.add_argument("--eqsteps", type=int, default=10_000)
    ap.add_argument("--numdata", type=int, default=1_000)
    ap.add_argument("--chains", type=int, default=64)
    ap.add_argument("--n", type=int, default=108,
                    help="system size; the box follows the reference's "
                         "per-N table (main.c:35-44 via config.default_box)")
    ap.add_argument("--c-reps", type=int, default=3)
    ap.add_argument("--temperature", type=float, default=1.1)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--decor-sweeps", type=int, default=2000,
                    help="production-mobility sweeps decorrelating our "
                         "chains from the shared warm start (capped by "
                         "--eqsteps); raise for slow spatial modes")
    ap.add_argument("--workdir", default=None,
                    help="persistent phase state dir (default: a "
                         "tempdir, single-shot --phase all only)")
    ap.add_argument("--phase", default="all",
                    choices=("all", "eq", "jax", "c", "report"))
    ap.add_argument("--out", default=None,
                    help="also write the report JSON here")
    ap.add_argument("--profile-gate", action="store_true",
                    help="gate on the spatial z-profile (the z-marginal "
                         "of the reference's voxel density field vs "
                         "ours, between-rep vs between-chain errors)")
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
    if args.workdir is None and args.phase != "all":
        ap.error("--phase other than 'all' requires --workdir")

    td_obj = None
    if args.workdir is None:
        td_obj = tempfile.TemporaryDirectory()
        workdir = Path(td_obj.name)
    else:
        workdir = Path(args.workdir)
        workdir.mkdir(parents=True, exist_ok=True)

    if args.phase in ("all", "eq"):
        _phase_eq(args, workdir)
    if args.phase in ("all", "jax"):
        _phase_jax(args, workdir)
    if args.phase in ("all", "c"):
        _phase_c(args, workdir)
    if args.phase in ("all", "report"):
        return _phase_report(args, workdir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
