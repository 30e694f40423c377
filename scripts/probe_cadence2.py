#!/usr/bin/env python
"""Second cadence probe: push the N=1024 winner (zsorted c128 sps16 =
47.2k vs dense 29.5k) further — sps32, rb64 — and place the LOW end of
the crossover (N=512, N=256) so `--sampler auto` can route every size to
the fastest engine with evidence.
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

    def run_size(n, chains, variants):
        cfg = SMCConfig.for_n(n, dtype="float32")
        state, w = init_ensemble_state(cfg, jax.random.key(0), chains)
        for k in range(8):
            state, _ = ens.ensemble_sweeps_pallas(
                state, w, cfg, cfg.proposal_a, 50, seed=1 + k)
        sync(state)
        log(f"N={n}: equilibrated")

        def time_engine(label, fn):
            st, _ = fn(state, 11)
            sync(st)
            best = float("inf")
            for rep in range(3):
                st2 = state
                t0 = time.time()
                st2, _ = fn(st2, 20 + rep)
                sync(st2)
                best = min(best, time.time() - t0)
            agg = chains * 192 / best
            results[f"n{n}_{label}"] = round(agg, 1)
            log(f"N={n} {label}: {agg:,.0f} agg sweeps/s")

        for label, kw in variants:
            if label == "dense":
                time_engine("dense_c256",
                            lambda st, sd: ens.ensemble_sweeps_pallas(
                                st, w, cfg, cfg.proposal_a, 192, seed=sd))
            else:
                time_engine(label,
                            lambda st, sd, kw=kw: ens.ensemble_sweeps_zsorted(
                                st, w, cfg, cfg.proposal_a, 192, seed=sd,
                                **kw))

    # N=1024: chase the sps/rb optimum (192-sweep calls: divisible by 4,
    # 8, 16, 32, 48 and 64 so every cadence runs tail-free).
    run_size(1024, 512, [
        ("zsorted_c128_sps32", dict(c_tile=128, sweeps_per_sort=32)),
        ("zsorted_c128_sps64", dict(c_tile=128, sweeps_per_sort=64)),
        ("zsorted_c128_sps16_rb64",
         dict(c_tile=128, sweeps_per_sort=16, row_block_rows=64)),
    ])
    # Low end of the crossover.
    run_size(512, 512, [
        ("dense", None),
        ("zsorted_c128_sps16", dict(c_tile=128, sweeps_per_sort=16)),
        ("zsorted_c128_sps32", dict(c_tile=128, sweeps_per_sort=32)),
    ])
    run_size(256, 512, [
        ("dense", None),
        ("zsorted_c128_sps16", dict(c_tile=128, sweeps_per_sort=16)),
    ])

    print(json.dumps({"sweeps_per_call": 192, "agg_sweeps_per_s": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
