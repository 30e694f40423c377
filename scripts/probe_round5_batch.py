#!/usr/bin/env python
"""Round-5 hardware evidence batch (VERDICT r4 #3/#5/#8).

Stages, each its own fail-soft record in docs/EVIDENCE_ROUND5_HW.json
(merged like probe_round4_batch.py — existing stage records are kept
unless re-executed). Run per-stage isolated processes (a device fault
kills the in-process PJRT client, so later stages in the same process
would fail instantly):

    for s in tiny pt_warmers_warm roofline1024 roofline16k \
             ptgain1024 tungain1024; do
      timeout -k 10 1800 python scripts/probe_round5_batch.py --stage $s
    done

  tiny             device sanity + first-dispatch latency record.
  pt_warmers_warm  VERDICT #8: the round-4 pt_warmers stage recorded
                   wall_s only (compile-only probes, 40-sweep runs too
                   short to time) — rerun each exchange-interval chunk
                   {2,4,5,10} at a measurable length and fill the null
                   chunk_*_agg_sweeps_per_s fields in
                   docs/EVIDENCE_ROUND4_HW.json in place.
  roofline1024     VERDICT #3: equilibrate the bench shape
                   (N=1024 x 512 zsorted), then measure the kernel-true
                   and ideal processed-block fraction bands over one
                   sort cadence plus the in-plane headroom ceilings
                   (profiling.zskip_inplane_headroom) on the
                   equilibrated configuration.
  roofline16k      same at N=16384 x 128 (HBM-streamed engine,
                   rho-matched box — the bench quaternary shape).
  ptgain1024       VERDICT #5: PT vs no-exchange tau_int at N=1024
                   through the zsorted engine
                   (scripts/measure_pt_gain.py --n 1024, subprocess so
                   the TPU client is theirs alone).
  tungain1024      VERDICT #5: tuned-vs-default effective samples/s at
                   N=1024 zsorted (scripts/measure_tuning_gain.py).
"""

from __future__ import annotations

import argparse
import contextlib
import io as _io
import json
import re
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

T0 = time.time()
EV_PATH = REPO / "docs" / "EVIDENCE_ROUND5_HW.json"
R4_PATH = REPO / "docs" / "EVIDENCE_ROUND4_HW.json"
try:
    EV: dict = json.loads(EV_PATH.read_text())
    EV.setdefault("stages", {})
except Exception:  # noqa: BLE001 — absent or corrupt: start fresh
    EV = {"stages": {}}

STAGES: dict = {}


def log(msg: str) -> None:
    print(f"[{time.time() - T0:8.1f}s] {msg}", flush=True)


def flush_ev() -> None:
    EV_PATH.write_text(json.dumps(EV, indent=2) + "\n")


def stage(name):
    def deco(fn):
        def run():
            log(f"=== stage {name} ===")
            t0 = time.time()
            try:
                out = fn() or {}
                out["ok"] = True
            except Exception as exc:  # noqa: BLE001
                out = {"ok": False, "error": f"{type(exc).__name__}: {exc}"}
                log(f"stage {name} FAILED: {out['error']}")
            out["wall_s"] = round(time.time() - t0, 1)
            EV["stages"][name] = out
            flush_ev()
            log(f"=== stage {name} done in {out['wall_s']}s ===")
        STAGES[name] = run
        return run
    return deco


def run_cli(argv: list[str]) -> str:
    """Drive cli.main in-process, echoing output while capturing it."""
    from tpu_smc.cli import main as cli_main

    buf = _io.StringIO()

    class Tee:
        def write(self, s):
            buf.write(s)
            sys.__stdout__.write(s)
            return len(s)

        def flush(self):
            sys.__stdout__.flush()

    with contextlib.redirect_stdout(Tee()):
        rc = cli_main(argv)
    if rc not in (0, None):
        raise RuntimeError(f"cli.main rc={rc} for {argv}")
    return buf.getvalue()


def agg_sps(text: str) -> float | None:
    m = re.search(r"Aggregate throughput: ([\d,]+) sweeps/s", text)
    return float(m.group(1).replace(",", "")) if m else None


def _sync(state):
    np.asarray(state.energy[:1])


@stage("tiny")
def s_tiny():
    import jax

    t0 = time.time()
    dev = jax.devices()
    x = jax.numpy.zeros((8, 128)) + 1.0
    s = float(x.sum())
    return {"devices": [str(d) for d in dev], "tiny_sum": s,
            "first_dispatch_s": round(time.time() - t0, 1)}


@stage("pt_warmers_warm")
def s_pt_warmers_warm():
    out = {}
    for k in (2, 4, 5, 10):
        t0 = time.time()
        text = run_cli(["0", "200", "2", "1.1", "--n", "1024",
                        "--temperatures", "1.0,1.1",
                        "--chains-per-t", "256", "--pt-exchange", str(k),
                        "--sampler", "zsorted", "--seed", "13",
                        "--no-trace",
                        "--data-dir", f"/tmp/r5hw/ptk{k}/Data"])
        out[f"chunk_{k}_wall_s"] = round(time.time() - t0, 1)
        out[f"chunk_{k}_agg_sweeps_per_s"] = agg_sps(text)
    out["note"] = ("warm 200-sweep ladder runs (512 chains, N=1024, "
                   "zsorted, exchange intervals {2,4,5,10}) — the "
                   "measured rates that the round-4 compile-only "
                   "pt_warmers stage left null")
    # VERDICT r4 #8: fill the round-4 nulls in place, marked as round-5
    # warm measurements.
    try:
        r4 = json.loads(R4_PATH.read_text())
        st = r4["stages"]["pt_warmers"]
        for k in (2, 4, 5, 10):
            st[f"chunk_{k}_agg_sweeps_per_s"] = out[
                f"chunk_{k}_agg_sweeps_per_s"]
        st["note"] = (st.get("note", "") +
                      "; null throughput fields were compile-only probes "
                      "(40-sweep runs) — filled with round-5 warm "
                      "200-sweep measurements (EVIDENCE_ROUND5_HW.json "
                      "pt_warmers_warm)")
        R4_PATH.write_text(json.dumps(r4, indent=2) + "\n")
        out["round4_nulls_filled"] = True
    except Exception as exc:  # noqa: BLE001
        out["round4_nulls_filled"] = f"failed: {exc}"
    return out


def _roofline(cfg, chains, eq_sweeps, call_len, seed0):
    import jax

    from tpu_smc import ensemble as ens
    from tpu_smc.ensemble import zsort_cadence
    from tpu_smc.profiling import (zskip_inplane_headroom,
                                   zskip_kernel_fraction_band,
                                   zskip_processed_fraction_band)
    from tpu_smc.state import init_ensemble_state

    state, w = init_ensemble_state(cfg, jax.random.key(7), chains)
    done = 0
    t0 = time.time()
    while done < eq_sweeps:
        state, _ = ens.ensemble_sweeps_zsorted(
            state, w, cfg, cfg.proposal_a, call_len,
            seed=seed0 + done, c_tile=128)
        _sync(state)
        done += call_len
        log(f"  equilibrated {done}/{eq_sweeps} sweeps "
            f"({time.time() - t0:.1f}s)")
    # timed cadence chunk: r_pre at a sort point, r_post one cadence on
    cad = zsort_cadence(cfg.n)
    r_pre = np.asarray(state.r)
    t0 = time.time()
    state, tr = ens.ensemble_sweeps_zsorted(
        state, w, cfg, cfg.proposal_a, cad, seed=seed0 + 999_983,
        c_tile=128)
    _sync(state)
    cad_wall = time.time() - t0
    r_post = np.asarray(state.r)
    kn = zskip_kernel_fraction_band(r_pre, r_post, cfg, c_tile=128,
                                    row_block_rows=128)
    ideal = zskip_processed_fraction_band(r_pre, r_post, cfg,
                                          row_block_rows=128)
    head = zskip_inplane_headroom(r_pre, cfg, c_tile=128,
                                  row_block_rows=128, sample_i=256)
    acc = float(np.asarray(tr.accepted).mean()) / cfg.n
    return {
        "kernel_fraction_band": [round(kn[0], 4), round(kn[1], 4)],
        "ideal_fraction_band": [round(ideal[0], 4), round(ideal[1], 4)],
        "inplane_headroom": {k: (round(v, 4) if isinstance(v, float)
                                 else v)
                             for k, v in head.items()},
        "acceptance": round(acc, 4),
        "cadence_sweeps": cad,
        "cadence_call_wall_s": round(cad_wall, 2),
        "eq_sweeps": eq_sweeps,
    }


@stage("roofline1024")
def s_roofline1024():
    from tpu_smc.config import SMCConfig

    cfg = SMCConfig.for_n(1024, dtype="float32")
    return _roofline(cfg, 512, 1920, 192, seed0=100)


@stage("roofline16k")
def s_roofline16k():
    from tpu_smc.config import SMCConfig

    n = 16384
    l = (n / (5.7e-3 * 240.0)) ** 0.5
    cfg = SMCConfig(n=n, box_l=l, box_lz=240.0, dtype="float32")
    return _roofline(cfg, 128, 192, 24, seed0=200)


def _run_script(argv: list[str], timeout_s: int) -> str:
    log(f"  subprocess: {' '.join(argv)}")
    p = subprocess.run([sys.executable] + argv, cwd=REPO,
                       capture_output=True, text=True, timeout=timeout_s)
    sys.__stdout__.write(p.stdout + p.stderr)
    if p.returncode != 0:
        raise RuntimeError(f"rc={p.returncode}: {p.stderr[-400:]}")
    return p.stdout


@stage("ptgain1024")
def s_ptgain1024():
    text = _run_script(
        ["scripts/measure_pt_gain.py", "--n", "1024",
         "--sampler", "zsorted", "--chains-per-t", "128",
         "--temps", "0.9,1.0,1.1,1.2", "--sweeps", "4000",
         "--eqsteps", "2000", "--interval", "10"], 1700)
    taus = re.findall(r"tau_int\(T=[\d.]+\) = ([\d.]+) sweeps", text)
    m = re.search(r"\(([\d.]+)x faster decorrelation\)", text)
    sw = re.search(r"swap acceptance per pair: (\[.*\])", text)
    return {
        "protocol": "measure_pt_gain --n 1024 --sampler zsorted "
                    "--chains-per-t 128 --temps 0.9,1.0,1.1,1.2 "
                    "--sweeps 4000 --interval 10",
        "tau_int_cold_no_exchange": float(taus[0]) if taus else None,
        "tau_int_cold_pt": float(taus[1]) if len(taus) > 1 else None,
        "decorrelation_speedup": float(m.group(1)) if m else None,
        "swap_acceptance": json.loads(sw.group(1)) if sw else None,
    }


@stage("tungain1024")
def s_tungain1024():
    text = _run_script(
        ["scripts/measure_tuning_gain.py", "--n", "1024",
         "--sampler", "zsorted", "--chains", "512",
         "--sweeps", "4000", "--therm", "2000", "--block", "192"], 1700)
    rows = re.findall(
        r"A=([\d.e+-]+)\s+agg=([\d,]+) sweeps/s\s+tau_int=([\d.]+) "
        r"sweeps\s+->\s+([\d,]+) effective", text)
    m = re.search(r"tuning gain: ([\d.]+)x", text)
    out = {"protocol": "measure_tuning_gain --n 1024 --sampler zsorted "
                       "--chains 512 --sweeps 4000"}
    if len(rows) == 2:
        for label, row in zip(("default", "tuned"), rows):
            out[f"{label}_a"] = float(row[0])
            out[f"{label}_agg_sweeps_per_s"] = float(
                row[1].replace(",", ""))
            out[f"{label}_tau_int_sweeps"] = float(row[2])
            out[f"{label}_eff_samples_per_s"] = float(
                row[3].replace(",", ""))
    out["tuning_gain_eff_samples"] = float(m.group(1)) if m else None
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default=None,
                    help="comma-separated stage names (grouping amortizes "
                         "the per-process tunnel attach, ~1-10 min; a "
                         "device fault still kills the rest of the "
                         "group); default runs all in order")
    args = ap.parse_args()
    if args.stage:
        for name in args.stage.split(","):
            if name not in STAGES:
                ap.error(f"unknown stage {name!r} (have {sorted(STAGES)})")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    EV.setdefault("host", {})["started"] = time.strftime(
        "%Y-%m-%d %H:%M:%S")
    order = ["tiny", "pt_warmers_warm", "roofline1024", "roofline16k",
             "ptgain1024", "tungain1024"]
    for name in (args.stage.split(",") if args.stage else order):
        STAGES[name]()
    return 0


if __name__ == "__main__":
    sys.exit(main())
