#!/usr/bin/env python
"""Measure what acceptance tuning actually buys: effective samples/sec.

Smart-MC at the reference's A = gamma*T accepts ~97% of moves — the
moves are tiny and the chain decorrelates slowly. Tuning A up trades
acceptance for step size. The figure of merit is effective independent
samples per second: (aggregate sweeps/s) / (2 * tau_int), with tau_int
the integrated autocorrelation time of the energy in SWEEPS.

Runs the N=108 pallas ensemble at the default and at a tuned mobility,
same chains/sweeps, and prints both tau and the effective rate.

    python scripts/measure_tuning_gain.py [--chains 512] [--sweeps 4000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=512)
    ap.add_argument("--sweeps", type=int, default=4000)
    ap.add_argument("--therm", type=int, default=2000)
    ap.add_argument("--block", type=int, default=200)
    ap.add_argument("--target", type=float, default=0.6)
    ap.add_argument("--n", type=int, default=108,
                    help="system size (box from the reference's per-N "
                         "table); VERDICT r4 #5 runs this at N=1024 "
                         "through the zsorted production engine")
    ap.add_argument("--sampler", default="pallas",
                    choices=("pallas", "zsorted"))
    args = ap.parse_args()

    import jax

    cache = os.path.join(REPO, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from tpu_smc import ensemble as ens
    from tpu_smc.config import SMCConfig
    from tpu_smc.observables import tau_int
    from tpu_smc.state import init_ensemble_state
    from tpu_smc.tuning import tune_mobility

    cfg = SMCConfig.for_n(args.n, dtype="float32")
    t = float(cfg.temperature)
    sweeps_fn = (ens.ensemble_sweeps_zsorted if args.sampler == "zsorted"
                 else ens.ensemble_sweeps_pallas)

    def run(label, a_val):
        state, w = init_ensemble_state(cfg, jax.random.key(0), args.chains)
        # thermalize at 2A like the drivers
        done = 0
        while done < args.therm:
            k = min(args.block, args.therm - done)
            state, _ = sweeps_fn(
                state, w, cfg, 0.0, k, uniform_at=(2.0 * a_val, t))
            done += k
        np.asarray(state.energy[:1])
        traces = []
        t0 = time.time()
        done = 0
        while done < args.sweeps:
            k = min(args.block, args.sweeps - done)
            state, stats = sweeps_fn(
                state, w, cfg, 0.0, k, uniform_at=(a_val, t))
            traces.append(np.asarray(stats.energy))
            done += k
        dt = time.time() - t0
        e_tr = np.concatenate(traces)            # [S, C]
        agg = args.chains * args.sweeps / dt
        # integrated tau averaged over a spread of chains
        tau = float(np.mean([
            tau_int(e_tr[:, c])
            for c in range(0, args.chains, max(1, args.chains // 64))
        ]))
        eff = agg / max(2.0 * tau, 1.0)
        print(f"{label}: A={a_val:.4g}  agg={agg:,.0f} sweeps/s  "
              f"tau_int={tau:.1f} sweeps  ->  {eff:,.0f} effective "
              f"samples/s")
        return eff

    print(f"devices = {jax.devices()}", file=sys.stderr)
    # tune on a small ensemble first (kernel engine, ladder-mode rows)
    st, w0 = init_ensemble_state(cfg, jax.random.key(9),
                                 min(256, args.chains))
    st, tr = tune_mobility(cfg, st, w0, target=args.target,
                           sampler=args.sampler)
    print(f"tuned: A={tr.proposal_a:.4g} at acceptance "
          f"{tr.acceptance:.3f} (target {args.target})")

    eff_def = run("default gamma*T", float(cfg.proposal_a))
    eff_tun = run("tuned          ", float(tr.proposal_a))
    print(f"tuning gain: {eff_tun / eff_def:.2f}x effective samples/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
