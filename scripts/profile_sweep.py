#!/usr/bin/env python
"""Kernel timing/profiling harness for the Pallas whole-sweep kernel.

Times ensemble_sweeps_pallas at a given (N, chains, sweeps, c_tile) on the
real TPU, optionally capturing a jax.profiler trace. Used for the per-op
fusion work (VERDICT r1 #5); findings in docs/PERF_NOTES.md.

Usage:
    python scripts/profile_sweep.py [--n 1024] [--chains 512] [--sweeps 20]
                                    [--c-tile 0] [--trace DIR] [--reps 3]
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
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--chains", type=int, default=512)
    ap.add_argument("--sweeps", type=int, default=20)
    ap.add_argument("--c-tile", type=int, default=0, help="0 = auto")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--trace", default=None, help="jax.profiler trace dir")
    ap.add_argument("--sampler", choices=("pallas", "banded", "zsorted"),
                    default="pallas")
    ap.add_argument("--row-block", type=int, default=128,
                    help="zsorted j-block rows")
    ap.add_argument("--sweeps-per-sort", type=int, default=1)
    args = ap.parse_args()

    import jax

    cache = os.path.join(REPO, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from tpu_smc import ensemble as ens
    from tpu_smc.config import SMCConfig
    from tpu_smc.state import init_ensemble_state

    print(f"devices = {jax.devices()}", file=sys.stderr)
    cfg = SMCConfig.for_n(args.n, dtype="float32")
    state, w = init_ensemble_state(cfg, jax.random.key(0), args.chains)
    ctile = args.c_tile or None

    def run(st, seed):
        if args.sampler == "banded":
            st, tr, fb = ens.ensemble_sweeps_banded(
                st, w, cfg, cfg.proposal_a, args.sweeps, c_tile=ctile or 128)
            return st, tr, float(fb)
        if args.sampler == "zsorted":
            st, tr = ens.ensemble_sweeps_zsorted(
                st, w, cfg, cfg.proposal_a, args.sweeps, seed=seed,
                c_tile=ctile, sweeps_per_sort=args.sweeps_per_sort,
                row_block_rows=args.row_block)
            return st, tr, None
        st, tr = ens.ensemble_sweeps_pallas(
            st, w, cfg, cfg.proposal_a, args.sweeps, seed=seed, c_tile=ctile)
        return st, tr, None

    def sync(st):
        np.asarray(st.energy[:1])

    t0 = time.time()
    state, _, _ = run(state, 1)
    sync(state)
    print(f"compile+first: {time.time() - t0:.1f}s", file=sys.stderr)

    best = float("inf")
    for rep in range(args.reps):
        t0 = time.time()
        state, trace, fb = run(state, 2 + rep)
        sync(state)
        dt = time.time() - t0
        best = min(best, dt)
        print(f"rep {rep}: {dt:.3f}s", file=sys.stderr)

    if args.trace:
        with jax.profiler.trace(args.trace):
            state, trace, fb = run(state, 99)
            sync(state)
        print(f"trace written to {args.trace}", file=sys.stderr)

    agg = args.chains * args.sweeps / best
    acc = float(np.asarray(trace.accepted).mean()) / cfg.n
    extra = f" fallback_frac={fb:.3f}" if fb is not None else ""
    print(f"N={args.n} chains={args.chains} c_tile={ctile}: "
          f"{agg:,.0f} agg sweeps/s, acceptance {acc:.4f}{extra}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
