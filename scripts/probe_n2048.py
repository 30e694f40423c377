#!/usr/bin/env python
"""Place the dense/zsorted crossover at N=2048 WITH the sps=4 cadence.

The recorded crossover table (docs/PERF_NOTES.md) measured zskip c128 at
N=2048 BEFORE the fixed sort cadence landed (sps=1 equivalent): 5,976 vs
dense 7,701. The cadence bought 1.55x/1.38x over sps=1 at N=4096, so the
N=2048 verdict may flip. One warm probe settles the `--sampler auto`
threshold empirically (ROADMAP round-4 perf #1).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from tpu_smc import ensemble as ens
    from tpu_smc.config import SMCConfig
    from tpu_smc.state import init_ensemble_state

    def log(m):
        print(m, file=sys.stderr, flush=True)

    n, chains, sweeps = 2048, 256, 200
    cfg = SMCConfig.for_n(n, dtype="float32")
    state, w = init_ensemble_state(cfg, jax.random.key(0), chains)

    def sync(st):
        np.asarray(st.energy[:1])

    # Equilibrate a little so the zskip envelope sees realistic z layering.
    state, _ = ens.ensemble_sweeps_pallas(
        state, w, cfg, cfg.proposal_a, 50, seed=1)
    for k in range(7):
        state, _ = ens.ensemble_sweeps_pallas(
            state, w, cfg, cfg.proposal_a, 50, seed=2 + k)
    sync(state)
    log("equilibrated 400 sweeps")

    results = {}

    def time_engine(label, fn):
        st = state
        st, _ = fn(st, 11)  # warm/compile
        sync(st)
        best = float("inf")
        for rep in range(3):
            st2 = state
            t0 = time.time()
            st2, _ = fn(st2, 20 + rep)
            sync(st2)
            best = min(best, time.time() - t0)
        agg = chains * sweeps / best
        results[label] = round(agg, 1)
        log(f"{label}: {agg:,.0f} agg sweeps/s")

    time_engine("dense_c256", lambda st, sd: ens.ensemble_sweeps_pallas(
        st, w, cfg, cfg.proposal_a, sweeps, seed=sd))
    time_engine("zsorted_c128_sps4", lambda st, sd: ens.ensemble_sweeps_zsorted(
        st, w, cfg, cfg.proposal_a, sweeps, seed=sd, c_tile=128,
        sweeps_per_sort=4))
    time_engine("zsorted_c128_sps8", lambda st, sd: ens.ensemble_sweeps_zsorted(
        st, w, cfg, cfg.proposal_a, sweeps, seed=sd, c_tile=128,
        sweeps_per_sort=8))

    print(json.dumps({"n": n, "chains": chains, "sweeps_per_call": sweeps,
                      "agg_sweeps_per_s": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
