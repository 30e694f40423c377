#!/usr/bin/env python
"""Round-4 hardware closure batch (VERDICT #3 + #7, ROADMAP runbook
items 2/3/5/6) — ONE process so the axon tunnel's erratic first-dispatch
latency is paid once (docs/ROADMAP.md environment watch).

Stages, each fail-soft (a stage failure records the error and moves on;
the evidence JSON is rewritten after every stage so a mid-batch tunnel
death still leaves a record):

  1 tiny        backend init + tiny dispatch (bounds tunnel latency)
  2 n1024x512   the FULL production CLI at N=1024 x 512 chains — the
                exact config whose observable-OOM + watchdog fixes
                landed after the round-3 tunnel death
                (docs/PERF_NOTES.md "large-N driver memory + watchdog
                model" caveat). Records the cost-model prediction
                (driver.gathers_per_call) next to the measured run.
  3 n4096       a recorded N=4096 full-driver CLI run with artifacts.
                CNA live: one pass at 32 chains is ~180 s of MXU time
                (p_pad*N^2 MACs/chain), so this exercises the HOISTED
                cluster-analysis path (driver.cna_hoist) — the pass
                leaves the fused window and runs as ~10 bounded device
                calls, none near the ~100 s runtime watchdog.
  4 disorder    quenched wall disorder on the production engine
                (runbook #5): warm uniform baseline, then the cold
                per_chain_w compile + measured overhead (PERF_NOTES
                predicts within run-to-run variance).
  5 pt_warmers  ladder PT zsorted variants for chunk lengths
                {2,4,5,10} at the bench shape (N=1024, 512 chains) —
                the auto-PT exchange-interval menu (runbook #3);
                16 is already cached. Commits nothing itself; commit
                .jax_cache/ entries after a clean run.
  6 stream16k_ladder  per-chain (A, T) ladder rows through the
                HBM-streamed kernel at N=16384 (runbook #6) — plumbed
                and interpret-tested, never run on hardware. Riskiest
                (fresh large compile), so last.

Run: timeout 3500 python scripts/probe_round4_batch.py
or, per-stage isolated processes (post-mortem of the 2026-08-19 batch:
a device fault in one stage kills the in-process PJRT client, so every
LATER stage fails instantly — per-stage processes give each stage a
fresh client at the cost of one first-dispatch each):
     for s in n1024x512 n4096 disorder pt_warmers stream16k_ladder; do
       timeout -k 10 1500 python scripts/probe_round4_batch.py --stage $s
     done
Writes docs/EVIDENCE_ROUND4_HW.json (merged: an existing file's stage
records are kept unless this run re-executes that stage).
"""

from __future__ import annotations

import json
import re
import time
import io as _io
import contextlib
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

T0 = time.time()
EV_PATH = REPO / "docs" / "EVIDENCE_ROUND4_HW.json"
try:
    EV: dict = json.loads(EV_PATH.read_text())
    EV.setdefault("stages", {})
except Exception:  # noqa: BLE001 — absent or corrupt: start fresh
    EV = {"stages": {}}


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


@stage("tiny")
def s_tiny():
    import jax

    dev = jax.devices()
    x = jax.numpy.zeros((8, 128)) + 1.0
    return {"devices": [str(d) for d in dev],
            "tiny_sum": float(x.sum())}


@stage("n1024x512")
def s_n1024():
    from tpu_smc.config import SMCConfig
    from tpu_smc.driver import gathers_per_call

    cfg = SMCConfig(n=1024, box_l=33.0, box_lz=240.0, dtype="float32")
    gpc = gathers_per_call(cfg, lapse=20, chains=512, clusters=True)
    text = run_cli(["500", "2000", "100", "1.1", "--n", "1024",
                    "--chains", "512", "--sampler", "zsorted",
                    "--seed", "11", "--gr-bins", "64", "--z-bins", "64",
                    "--data-dir", "/tmp/r4hw/n1024/Data"])
    calls = -(-100 // gpc)
    return {
        "protocol": "python -m tpu_smc 500 2000 100 1.1 --n 1024 "
                    "--chains 512 --sampler zsorted (full driver: CNA, "
                    "density/mobility, g(r), z-profile, traces)",
        "gathers_per_call_predicted": gpc,
        "device_calls": calls,
        "aggregate_sweeps_per_s": agg_sps(text),
        "device_faults": text.count("[elastic] device fault"),
    }


@stage("n4096")
def s_n4096():
    from tpu_smc.config import SMCConfig
    from tpu_smc.driver import cna_hoist, gathers_per_call, warn_cna_spike

    cfg = SMCConfig(n=4096, box_l=33.0, box_lz=240.0, dtype="float32",
                    lca_time=25)
    # One CNA pass at N=4096 x 32 chains is ~180 s of MXU time
    # (p_pad*N^2 MACs per chain at the measured 2.5e13 MACs/s) — far
    # past the ~100 s watchdog as a single call, so the driver must
    # hoist it into bounded calls (driver.cna_hoist). lca_time=25 keeps
    # the probe to 2 passes (gathers 25 and 50).
    assert cna_hoist(cfg, 32, True), "hoist must engage at this scale"
    gpc = gathers_per_call(cfg, lapse=20, chains=32, clusters=False)
    text = run_cli(["200", "1000", "50", "1.1", "--n", "4096",
                    "--chains", "32", "--sampler", "auto",
                    "--lca-time", "25",
                    "--seed", "12", "--gr-bins", "64", "--z-bins", "64",
                    "--data-dir", "/tmp/r4hw/n4096/Data"])
    return {
        "protocol": "python -m tpu_smc 200 1000 50 1.1 --n 4096 "
                    "--chains 32 --sampler auto --lca-time 25 (CNA "
                    "live through the HOISTED path: ~180 s of MXU per "
                    "pass split into ~10 bounded device calls)",
        "cna_pass_seconds_est": round(warn_cna_spike(cfg, 32), 1),
        "gathers_per_call_predicted_scan": gpc,
        "aggregate_sweeps_per_s": agg_sps(text),
        "device_faults": text.count("[elastic] device fault"),
    }


@stage("disorder")
def s_disorder():
    base = ["50", "200", "10", "1.1", "--n", "1024", "--chains", "512",
            "--sampler", "zsorted", "--no-trace"]
    t0 = time.time()
    text_u = run_cli(base + ["--seed", "14",
                             "--data-dir", "/tmp/r4hw/dis_uniform/Data"])
    t_uniform = time.time() - t0
    t0 = time.time()
    text_d = run_cli(base + ["--seed", "14", "--wall-realizations", "4",
                             "--data-dir", "/tmp/r4hw/dis_quenched/Data"])
    t_disorder = time.time() - t0
    return {
        "uniform_agg_sweeps_per_s": agg_sps(text_u),
        "disorder4_agg_sweeps_per_s": agg_sps(text_d),
        "uniform_wall_s": round(t_uniform, 1),
        "disorder_wall_s_incl_cold_compile": round(t_disorder, 1),
        "note": "PERF_NOTES predicts disorder overhead within "
                "run-to-run variance once compiled (same VMEM tile "
                "reads; only the DMA source block index changes)",
    }


@stage("pt_warmers")
def s_pt_warmers():
    out = {}
    for k in (2, 4, 5, 10):
        t0 = time.time()
        text = run_cli(["0", "40", "2", "1.1", "--n", "1024",
                        "--temperatures", "1.0,1.1",
                        "--chains-per-t", "256", "--pt-exchange", str(k),
                        "--sampler", "zsorted", "--seed", "13",
                        "--no-trace",
                        "--data-dir", f"/tmp/r4hw/ptk{k}/Data"])
        out[f"chunk_{k}_wall_s"] = round(time.time() - t0, 1)
        out[f"chunk_{k}_agg_sweeps_per_s"] = agg_sps(text)
    out["note"] = ("auto-PT exchange-interval menu {2,4,5,10} now "
                   "Mosaic-cached at the bench shape (512 chains, "
                   "N=1024, ladder (A,T) rows); 16 was already warm")
    return out


@stage("stream16k_ladder")
def s_stream_ladder():
    import jax

    from tpu_smc import ensemble as ens
    from tpu_smc.config import SMCConfig
    from tpu_smc.state import init_ensemble_state

    n4 = 16384
    l4 = (n4 / (5.7e-3 * 240.0)) ** 0.5
    cfg4 = SMCConfig(n=n4, box_l=l4, box_lz=240.0, dtype="float32")
    chains = 128
    state4, w4 = init_ensemble_state(cfg4, jax.random.key(0), chains)
    np.asarray(state4.energy[:1])
    # two-level ladder riding the per-chain (A, T) data rows — the
    # per_chain_at x hbm_stream composition (interpret-tested in
    # test_pallas; first hardware run here)
    temps = np.where(np.arange(chains) < chains // 2, 1.0, 1.2)
    a_rows = jax.numpy.asarray(1.0 * temps, cfg4.jnp_dtype)
    t_rows = jax.numpy.asarray(temps, cfg4.jnp_dtype)
    log("cold 1-sweep streamed LADDER call (fresh Mosaic compile)")
    t0 = time.time()
    state4, _ = ens.ensemble_sweeps_zsorted(
        state4, w4, cfg4, 0.0, 1, seed=50, c_tile=128,
        a_per_chain=a_rows, t_per_chain=t_rows)
    np.asarray(state4.energy[:1])
    cold_s = time.time() - t0
    log(f"cold call done in {cold_s:.1f}s")
    rates, acc = [], float("nan")
    for rep in range(2):
        t0 = time.time()
        state4, tr4 = ens.ensemble_sweeps_zsorted(
            state4, w4, cfg4, 0.0, 24, seed=51 + rep, c_tile=128,
            a_per_chain=a_rows, t_per_chain=t_rows)
        np.asarray(state4.energy[:1])
        dt = time.time() - t0
        rates.append(round(chains * 24 / dt, 1))
        acc = float(np.asarray(tr4.accepted).mean()) / n4
        log(f"rep {rep}: {dt:.1f}s = {rates[-1]:,.0f} agg sweeps/s, "
            f"acceptance {acc:.3f}")
    return {
        "n": n4, "chains": chains,
        "box": f"rho-matched 5.7e-3 (L={l4:.1f}, Lz=240)",
        "ladder": "two levels T=1.0/1.2 via per-chain (A, T) rows",
        "cold_1sweep_s": round(cold_s, 1),
        "warm_agg_sweeps_per_s": rates,
        "acceptance": round(acc, 4),
    }


STAGES = {
    "tiny": s_tiny,
    "n1024x512": s_n1024,
    "n4096": s_n4096,
    "disorder": s_disorder,
    "pt_warmers": s_pt_warmers,
    "stream16k_ladder": s_stream_ladder,
}


def main() -> int:
    import argparse

    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", action="append", choices=sorted(STAGES),
                    help="run only this stage (repeatable); default: all. "
                         "Each stage still runs 'tiny' first so the "
                         "per-process first-dispatch latency is recorded "
                         "separately from the stage wall time.")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    names = args.stage or list(STAGES)
    if "tiny" not in names:
        # pay + record first dispatch before the timed stage(s); file the
        # fresh attach under its own key so each process's latency is
        # visible without clobbering the batch-run "tiny" record
        prev_tiny = EV["stages"].get("tiny")
        s_tiny()
        EV["stages"][f"tiny_attach_{names[0]}"] = EV["stages"]["tiny"]
        if prev_tiny is not None:
            EV["stages"]["tiny"] = prev_tiny
        else:
            del EV["stages"]["tiny"]
        flush_ev()
    for name in names:
        STAGES[name]()
    log("BATCH DONE")
    print(json.dumps(EV, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
