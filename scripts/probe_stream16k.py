#!/usr/bin/env python
"""De-risk the HBM-streamed kernel's cold path at N=16384 (round 4).

BENCH_r03 recorded ONE hang in the N=16384 quaternary's warmup on the
restored tunnel (docs/ROADMAP.md), unreproduced; the same probe later
ran clean inside the driver's bench. This probe re-exercises that path
deliberately, with stage timestamps so a hang is attributable:

  stage 1  backend init + first tiny dispatch (tunnel latency)
  stage 2  cold Mosaic compile of the streamed kernel at the
           rho-matched box bench.py now uses (VERDICT r3 #4 — a fresh
           compile key) via ONE 1-sweep call
  stage 3  warm 24-sweep calls x 3 (the bench shape), acceptance check

Each device call stays well under the ~100 s runtime watchdog (a
24-sweep call measured ~22 s at 142 agg sweeps/s). Run under `timeout`
from the shell; every stage prints BEFORE it starts so the log bounds
any hang. Writes docs/EVIDENCE_STREAM16K.json on success and commits
nothing itself (commit .jax_cache/ entries after a clean run).

Reference scale anchor: the C core extrapolates O(N^2) to 0.206
sweeps/s at this N (bench.py quaternary comment).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

T0 = time.time()


def log(msg: str) -> None:
    print(f"[{time.time() - T0:8.1f}s] {msg}", flush=True)


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tpu_smc import ensemble as ens
    from tpu_smc.config import SMCConfig
    from tpu_smc.state import init_ensemble_state

    log("stage 1: backend init + tiny dispatch")
    dev = jax.devices()
    log(f"devices: {dev}")
    x = jax.numpy.zeros((8, 128)) + 1.0
    log(f"tiny dispatch ok (sum={float(x.sum())})")

    n4 = 16384
    l4 = (n4 / (5.7e-3 * 240.0)) ** 0.5
    cfg4 = SMCConfig(n=n4, box_l=l4, box_lz=240.0, dtype="float32")
    log(f"stage 2: init {n4} particles x 128 chains (rho-matched "
        f"L={l4:.1f}, Lz=240)")
    state4, w4 = init_ensemble_state(cfg4, jax.random.key(0), 128)
    np.asarray(state4.energy[:1])
    log("init done; cold 1-sweep streamed call (Mosaic compile)")
    t0 = time.time()
    state4, _ = ens.ensemble_sweeps_zsorted(
        state4, w4, cfg4, cfg4.proposal_a, 1, seed=40, c_tile=128)
    np.asarray(state4.energy[:1])
    cold_s = time.time() - t0
    log(f"cold 1-sweep call done in {cold_s:.1f}s")

    log("stage 3: 3 x 24-sweep warm calls (the bench shape)")
    rates, acc = [], float("nan")
    for rep in range(3):
        t0 = time.time()
        state4, tr4 = ens.ensemble_sweeps_zsorted(
            state4, w4, cfg4, cfg4.proposal_a, 24, seed=41 + rep,
            c_tile=128)
        np.asarray(state4.energy[:1])
        dt = time.time() - t0
        rates.append(128 * 24 / dt)
        acc = float(np.asarray(tr4.accepted).mean()) / n4
        log(f"rep {rep}: {dt:.1f}s = {rates[-1]:,.0f} agg sweeps/s, "
            f"acceptance {acc:.3f}")

    out = {
        "n": n4, "box": f"rho-matched 5.7e-3 (L={l4:.1f}, Lz=240)",
        "cold_1sweep_s": round(cold_s, 1),
        "warm_agg_sweeps_per_s": [round(r, 1) for r in rates],
        "acceptance": round(acc, 4),
        "vs_c_core_extrapolated": round(max(rates) / 0.206, 1),
        "clean_cold_start": True,
    }
    print(json.dumps(out, indent=2))
    (REPO / "docs" / "EVIDENCE_STREAM16K.json").write_text(
        json.dumps(out, indent=2) + "\n")
    log("PROBE OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
