#!/usr/bin/env python
"""Hardware crossover probe: temperature-ladder sweeps through the dense
pallas engine vs the zsorted engine (both via per-chain (A, T) rows).

Round 3 (cont.) wired ladders and tuned mobilities through the zsorted
engine's ladder-mode data rows; `--sampler auto` still resolves ladders
to dense pallas pending this measurement. Rule: if zsorted wins at the
ladder sizes it already wins for plain ensembles (N >= 1024), flip the
auto gate (cli._resolve_sampler `ladder` argument).

Writes the measurement into docs/PERF_NOTES.md by hand afterwards.

Usage: python scripts/probe_ladder_zsorted.py [--n 1024] [--sweeps 192]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--sweeps", type=int, default=192)
    ap.add_argument("--chains-per-t", type=int, default=128)
    ap.add_argument("--temps", type=str, default="0.9,1.1,1.3,1.5")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from tpu_smc import ensemble as ens
    from tpu_smc.config import SMCConfig
    from tpu_smc.state import init_ensemble_state

    def log(m):
        print(m, file=sys.stderr, flush=True)

    temps = [float(v) for v in args.temps.split(",")]
    cfg = SMCConfig.for_n(args.n, dtype="float32")
    c = len(temps) * args.chains_per_t
    state0, w = init_ensemble_state(cfg, jax.random.key(0), c)
    t_c = jnp.asarray(np.repeat(np.asarray(temps, np.float32),
                                args.chains_per_t))
    a_c = cfg.gamma * t_c

    # Equilibrate once through the dense ladder engine.
    st = state0
    for k in range(8):
        st, _ = ens.ensemble_sweeps_pallas(
            st, w, cfg, 0.0, 50, seed=100 + k,
            a_per_chain=2.0 * a_c, t_per_chain=t_c)
    np.asarray(st.energy[:1])
    log("equilibrated 400 ladder sweeps (dense, 2A)")

    out = {"n": args.n, "chains": c, "temps": temps,
           "sweeps_per_call": args.sweeps}
    for name, fn in (
        ("pallas", lambda s, seed: ens.ensemble_sweeps_pallas(
            s, w, cfg, 0.0, args.sweeps, seed=seed,
            a_per_chain=a_c, t_per_chain=t_c)),
        ("zsorted", lambda s, seed: ens.ensemble_sweeps_zsorted(
            s, w, cfg, 0.0, args.sweeps, seed=seed, c_tile=128,
            a_per_chain=a_c, t_per_chain=t_c)),
    ):
        s = st
        t0 = time.time()
        s, _ = fn(s, 1)
        np.asarray(s.energy[:1])
        warm = time.time() - t0
        best = float("inf")
        for rep in range(3):
            t0 = time.time()
            s, tr = fn(s, 2 + rep)
            np.asarray(s.energy[:1])
            best = min(best, time.time() - t0)
        agg = c * args.sweeps / best
        acc = float(np.asarray(tr.accepted).mean()) / cfg.n
        out[name] = {"agg_sweeps_per_s": round(agg, 1),
                     "warmup_s": round(warm, 1),
                     "acceptance": round(acc, 4)}
        log(f"{name}: {agg:,.0f} agg sweeps/s (warmup {warm:.1f}s, "
            f"acc {acc:.3f})")
    out["ratio_zsorted_over_pallas"] = round(
        out["zsorted"]["agg_sweeps_per_s"]
        / out["pallas"]["agg_sweeps_per_s"], 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
