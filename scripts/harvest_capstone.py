#!/usr/bin/env python
"""Harvest the reference-scale production capstone run (round 4,
VERDICT #2) into docs/EVIDENCE_PRODUCTION.json.

The capstone is the reference's own suggested production workload
(/root/reference/main.c:15-18: eqsteps=4e6, maxsteps=16e6, numdata=4e5,
T=1.1) driven through the production CLI on one real TPU chip with a
128-chain ensemble — the multi-hour pipeline no test exercises end to
end: windowed driver + watchdog chunking, full-resolution trace memory,
checkpoint rotation (--auto-checkpoint), the KMAX-scale ACF
(/root/reference/SMC.h:61), and the 9-artifact CSV set.

Usage: python scripts/harvest_capstone.py /tmp/capstone /tmp/capstone.log
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def main() -> int:
    base = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/capstone")
    log_path = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/capstone.log")
    log = log_path.read_text()
    run_dirs = list((base / "Data").iterdir())
    assert len(run_dirs) == 1, run_dirs
    run = run_dirs[0]

    def grab(pat, cast=float):
        m = re.search(pat, log)
        return cast(m.group(1)) if m else None

    csvs = sorted(p.name for p in run.glob("*.csv"))
    data_csv = next(run.glob("data_*.csv"))
    n_rows = sum(1 for _ in data_csv.open()) - 1
    acf_csv = next(run.glob("autocorrelation_*.csv"), None)
    acf_rows = (sum(1 for _ in acf_csv.open()) - 1) if acf_csv else 0
    cks = sorted(base.glob("ck*.npz"))

    out = {
        "protocol": "python -m tpu_smc 4000000 16000000 400000 1.1 "
                    "--chains 128 --sampler zsorted --seed 42 --gr-bins 64 "
                    "--z-bins 64 --auto-checkpoint 20 (one real TPU chip)",
        "reference_anchor": "main.c:15-18 suggested production scale; "
                            "SMC.h:61 KMAX=2.5e6",
        "mean_energy": grab(r"Mean energy: ([-\d.]+)"),
        "energy_err": grab(r"Mean energy: [-\d.]+ ± ([\d.]+)"),
        "acceptance": grab(r"acceptance ratio: ([\d.]+)"),
        "therm_acceptance": grab(
            r"average acceptance ratio ([\d.]+)"),
        "cv": grab(r"heat capacity: ([-\w.]+)", str),
        "tau": grab(r"autocorrelation time: ([-\d.]+)"),
        "pressure": grab(r"Mean pressure: ([-\d.]+)"),
        "sim_minutes": grab(r"completed in ([\d.]+) mins"),
        "s_per_million": grab(r"([\d.]+) s per million steps"),
        "artifacts": csvs,
        "data_csv_rows": n_rows,
        "acf_rows": acf_rows,
        "checkpoints_on_disk": [p.name for p in cks],
        "device_faults_replayed": log.count("[elastic] device fault"),
        "watchdog_kernel_faults": log.count("kernel fault"),
        "total_sweeps_per_chain": 20_000_000,
        "chains": 128,
        "aggregate_production_sweeps": 16_000_000 * 128,
    }
    print(json.dumps(out, indent=2))
    (REPO / "docs" / "EVIDENCE_PRODUCTION.json").write_text(
        json.dumps(out, indent=2) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
