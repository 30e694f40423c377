#!/usr/bin/env python
"""Full dense/zsorted crossover matrix with the fixed sort cadence.

probe_n2048.py showed the pre-cadence crossover table (PERF_NOTES.md) is
stale: at N=2048, zsorted c128 sps=4 is 1.69x dense (13,333 vs 7,868)
and sps=8 is 1.90x. This sweeps N x sps to place the `--sampler auto`
threshold and cadence empirically, including whether the N=1024 PRIMARY
bench config should switch engines.

Usage: python scripts/probe_crossover.py [--quick]
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

    def sync(st):
        np.asarray(st.energy[:1])

    results = {}
    for n, chains in ((1024, 512), (2048, 256), (4096, 256)):
        cfg = SMCConfig.for_n(n, dtype="float32")
        state, w = init_ensemble_state(cfg, jax.random.key(0), chains)
        # Equilibrate so the z envelope sees realistic wall layering.
        for k in range(8):
            state, _ = ens.ensemble_sweeps_pallas(
                state, w, cfg, cfg.proposal_a, 50, seed=1 + k)
        sync(state)
        log(f"N={n}: equilibrated 400 sweeps")

        def time_engine(label, fn):
            st, _ = fn(state, 11)  # warm/compile
            sync(st)
            best = float("inf")
            for rep in range(3):
                st2 = state
                t0 = time.time()
                st2, _ = fn(st2, 20 + rep)
                sync(st2)
                best = min(best, time.time() - t0)
            agg = chains * 200 / best
            results[f"n{n}_{label}"] = round(agg, 1)
            log(f"N={n} {label}: {agg:,.0f} agg sweeps/s")

        time_engine("dense_c256", lambda st, sd: ens.ensemble_sweeps_pallas(
            st, w, cfg, cfg.proposal_a, 200, seed=sd))
        for sps in (4, 8, 16):
            time_engine(
                f"zsorted_c128_sps{sps}",
                lambda st, sd, sps=sps: ens.ensemble_sweeps_zsorted(
                    st, w, cfg, cfg.proposal_a, 200, seed=sd, c_tile=128,
                    sweeps_per_sort=sps))
        # At the bench-primary size also try the wider tile for zsorted.
        if n == 1024:
            time_engine(
                "zsorted_c256_sps8",
                lambda st, sd: ens.ensemble_sweeps_zsorted(
                    st, w, cfg, cfg.proposal_a, 200, seed=sd, c_tile=256,
                    sweeps_per_sort=8))

    print(json.dumps({"sweeps_per_call": 200, "agg_sweeps_per_s": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
