#!/usr/bin/env python
"""Hardware graceful-stop -> resume drill (VERDICT r4 #7).

Protocol (the safe substitute for provoking a real kernel fault, which
can kill the axon tunnel permanently — docs/ROADMAP.md environment
watch):

  A. an uninterrupted windowed run (the oracle);
  B. the SAME run with --auto-checkpoint 1; SIGTERM it once the first
     window checkpoint lands — the driver finishes the in-flight
     window, checkpoints, and exits cleanly (cli._install_signal_stop);
  C. resume from B's checkpoint with the REMAINING maxsteps/numdata
     (the ChainState carries the absolute sweep counter; per-sweep
     absolute seeding makes the continuation bitwise within the
     engine's A6 scope — zsorted needs cadence-aligned splits, which
     gather lapses that are multiples of zsort_cadence(n) guarantee).

Byte-compared artifacts (per rank):
  * last_state_*.csv     — the final configuration (the trajectory);
  * local_*.csv          — cumulative voxel density/mobility (rides the
                           checkpoint inside ChainState);
  * data_*_rank*.csv     — C's gather rows == the TAIL of A's rows, on
                           the E and P columns. The jj column is
                           excluded BY THE REFERENCE'S OWN SEMANTICS:
                           data row k pairs E(sweep k*lapse) with
                           jj(sweep k) (the reproduced E-vs-jj index
                           mismatch, SURVEY §7.4) — jj's index is
                           run-relative, so a resumed segment reads a
                           different sweep's count just like a
                           warm-started reference run would;
  * positions_*.csv      — per-window snapshots: C's == A's tail.

Excluded by design: info (wall-clock), autocorrelation, gr/zprofile,
total_clusters and local_temp (computed over / accumulated across the
whole gather series on the HOST — a resumed process only holds its own
segment; the reference's warm start has the same property,
main.c:98-113).

    python scripts/resume_drill.py --platform cpu          # protocol test
    python scripts/resume_drill.py --n 1024 --chains 64 \
        --sampler zsorted                                  # the drill

Writes docs/EVIDENCE_RESUME_DRILL.json when --out is given.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def log(msg: str) -> None:
    print(f"[drill] {msg}", flush=True)


def run_cli(argv, cwd, env, timeout_s):
    p = subprocess.run([sys.executable, "-m", "tpu_smc"] + argv,
                       cwd=cwd, env=env, capture_output=True, text=True,
                       timeout=timeout_s)
    if p.returncode != 0:
        raise RuntimeError(
            f"rc={p.returncode}\n{p.stdout[-800:]}\n{p.stderr[-800:]}")
    return p.stdout


def one_run_dir(root: Path) -> Path:
    dirs = sorted((root / "Data").iterdir())
    assert len(dirs) == 1, dirs
    return dirs[0]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=108)
    ap.add_argument("--chains", type=int, default=8)
    ap.add_argument("--sampler", default="xla",
                    choices=("xla", "pallas", "zsorted"))
    ap.add_argument("--platform", default=None)
    ap.add_argument("--eqsteps", type=int, default=64)
    ap.add_argument("--maxsteps", type=int, default=1600)
    ap.add_argument("--numdata", type=int, default=100)
    ap.add_argument("--storage-time", type=int, default=20,
                    help="gathers per storage window (5 windows at the "
                         "defaults; --auto-checkpoint 1 checkpoints "
                         "each)")
    ap.add_argument("--seed", type=int, default=33)
    ap.add_argument("--workdir", default="/tmp/resume_drill")
    ap.add_argument("--timeout", type=int, default=1500)
    ap.add_argument("--out", default=None,
                    help="also write the evidence JSON here")
    args = ap.parse_args()

    lapse = args.maxsteps // args.numdata
    assert lapse * args.numdata == args.maxsteps
    wd = Path(args.workdir)
    if wd.exists():
        import shutil

        shutil.rmtree(wd)
    wd.mkdir(parents=True)
    # Inherit the environment UNCHANGED. History: one harness image
    # required PYTHONPATH to be unset for the axon plugin to register;
    # the current image does the opposite (the plugin LOADS from
    # PYTHONPATH=/root/.axon_site, and stripping it yields "Backend
    # 'axon' is not in the list of known backends"). Don't touch it
    # either way — the CLI imports tpu_smc via cwd=REPO.
    env = dict(os.environ)

    common = [str(args.eqsteps), str(args.maxsteps), str(args.numdata),
              "1.10", "--n", str(args.n), "--chains", str(args.chains),
              "--sampler", args.sampler, "--seed", str(args.seed),
              "--storage-time", str(args.storage_time),
              "--gr-bins", "0", "--z-bins", "0"]
    if args.platform:
        common += ["--platform", args.platform]

    # ---- run A: uninterrupted oracle -------------------------------
    log("run A (uninterrupted) ...")
    t0 = time.time()
    run_cli(common + ["--data-dir", str(wd / "A" / "Data")],
            cwd=REPO, env=env, timeout_s=args.timeout)
    wall_a = time.time() - t0
    log(f"run A done in {wall_a:.1f}s")

    # ---- run B: SIGTERM after the first window checkpoint ----------
    ck = wd / "ckB.npz"
    log("run B (to be SIGTERMed mid-flight) ...")
    pb = subprocess.Popen(
        [sys.executable, "-m", "tpu_smc"] + common +
        ["--data-dir", str(wd / "B" / "Data"),
         "--auto-checkpoint", "1", "--checkpoint", str(ck)],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)
    deadline = time.time() + args.timeout
    while not ck.exists():
        if pb.poll() is not None:
            out = pb.stdout.read()
            raise RuntimeError(
                f"run B exited before any checkpoint:\n{out[-800:]}")
        if time.time() > deadline:
            pb.kill()
            raise RuntimeError("run B never produced a checkpoint")
        time.sleep(0.5)
    log("first window checkpoint seen -> SIGTERM")
    pb.send_signal(signal.SIGTERM)
    out_b, _ = pb.communicate(timeout=args.timeout)
    if pb.returncode != 0:
        raise RuntimeError(f"run B rc={pb.returncode}:\n{out_b[-800:]}")
    sweeps_done = int(np.load(ck)["sweeps"].reshape(-1)[0])
    prod_done = sweeps_done - args.eqsteps
    gathers_done = prod_done // lapse
    log(f"run B stopped cleanly at {sweeps_done} sweeps "
        f"({gathers_done}/{args.numdata} gathers)")
    assert 0 < gathers_done < args.numdata, \
        "SIGTERM must land mid-run for the drill to mean anything"

    # ---- run C: resume with the remaining work ---------------------
    remaining_steps = args.maxsteps - prod_done
    remaining_gathers = args.numdata - gathers_done
    log(f"run C (resume): {remaining_steps} steps / "
        f"{remaining_gathers} gathers ...")
    run_cli(["0", str(remaining_steps), str(remaining_gathers), "1.10",
             "--n", str(args.n), "--chains", str(args.chains),
             "--sampler", args.sampler, "--seed", str(args.seed),
             "--storage-time", str(args.storage_time),
             "--gr-bins", "0", "--z-bins", "0"]
            + (["--platform", args.platform] if args.platform else [])
            + ["--resume", str(ck),
               "--data-dir", str(wd / "B" / "Data")],
            cwd=REPO, env=env, timeout_s=args.timeout)

    # ---- compare ----------------------------------------------------
    da, db = one_run_dir(wd / "A"), one_run_dir(wd / "B")
    report = {
        "config": {k: getattr(args, k) for k in
                   ("n", "chains", "sampler", "eqsteps", "maxsteps",
                    "numdata", "storage_time", "seed")},
        "platform": args.platform or "default (axon TPU)",
        "interrupted_at_sweeps": sweeps_done,
        "gathers_before_interrupt": gathers_done,
        "checks": {},
    }
    ok = True

    def check(name, good, detail=""):
        nonlocal ok
        report["checks"][name] = {"pass": bool(good), "detail": detail}
        ok &= bool(good)
        log(f"  {name}: {'PASS' if good else 'FAIL'} {detail}")

    # byte-identical final configuration + cumulative voxel fields
    for pat in ("last_state_*.csv", "local_N*_rank*.csv"):
        fa = sorted(da.glob(pat))
        fb = sorted(db.glob(pat))
        same_names = [f.name for f in fa] == [f.name for f in fb]
        same_bytes = same_names and all(
            a.read_bytes() == b.read_bytes() for a, b in zip(fa, fb))
        check(f"bytes:{pat}", same_bytes,
              f"{len(fa)} file(s)")

    # per-gather / per-window appended series: C's rows == A's tail
    # (positions append one block per storage window, SMC.c:158-189 —
    # a resumed process holds its own segment). The data CSV compares
    # E and P only: jj is run-relative by the reference's own E-vs-jj
    # index mismatch (see module docstring).
    def rows_of(f, strip_jj):
        lines = f.read_text().strip().splitlines()
        if strip_jj:
            lines = [",".join(ln.split(",")[:2]) for ln in lines]
        return lines[0], lines[1:]

    for pat, strip_jj in (("data_*_rank*.csv", True),
                          ("positions_*_rank*.csv", False)):
        fa = sorted(da.glob(pat))
        fb = sorted(db.glob(pat))
        good = len(fa) == len(fb) and len(fa) > 0
        worst = ""
        for a, b in zip(fa, fb):
            head_a, rows_a = rows_of(a, strip_jj)
            head_b, rows_b = rows_of(b, strip_jj)
            if head_a != head_b or rows_a[-len(rows_b):] != rows_b:
                good = False
                worst = a.name
                break
        check(f"tail:{pat}", good, worst or f"{len(fa)} file(s)")

    report["pass"] = ok
    print(json.dumps({k: v for k, v in report.items()
                      if k != "checks"} | {"checks": report["checks"]},
                     indent=2))
    if args.out:
        Path(args.out).write_text(json.dumps(report, indent=2) + "\n")
    print(f"RESUME DRILL: {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
