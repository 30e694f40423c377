#!/usr/bin/env python
"""Hardware statistical validation of the large-N sweep variants
(cited from kernels/sweep_banded.py and kernels/sweep_pallas.py zskip).

Runs the SAME equilibrated ensemble through:
  * the standard dense Pallas whole-sweep kernel (reference engine),
  * the z-sorted block-skipping kernel (ensemble_sweeps_zsorted) — must
    agree EXACTLY in distribution (the skip is provably zero-contribution;
    only visit-order relabeling differs),
  * optionally the archived z-banded random-scan kernel (--banded).

Reports mean energy / acceptance with ensemble error bars and fails if
zsorted deviates from dense beyond 4 combined sigma.

Usage:
    python scripts/validate_banded.py [--n 1024] [--chains 256]
                                      [--sweeps 200] [--banded]
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
    ap.add_argument("--chains", type=int, default=256)
    ap.add_argument("--sweeps", type=int, default=200)
    ap.add_argument("--eq", type=int, default=100)
    ap.add_argument("--row-block", type=int, default=128)
    ap.add_argument("--banded", action="store_true")
    args = ap.parse_args()

    import jax

    cache = os.path.join(REPO, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from tpu_smc import ensemble as ens
    from tpu_smc.config import SMCConfig
    from tpu_smc.state import init_ensemble_state

    cfg = SMCConfig.for_n(args.n, dtype="float32")
    state0, w = init_ensemble_state(cfg, jax.random.key(0), args.chains)

    def sync(st):
        np.asarray(st.energy[:1])

    print(f"[eq] {args.eq} dense sweeps ...", file=sys.stderr, flush=True)
    state0, _ = ens.ensemble_sweeps_pallas(
        state0, w, cfg, cfg.proposal_a, args.eq, seed=1)
    sync(state0)

    def measure(name, fn):
        st, tr = fn()   # warm-up/compile with identical static args
        sync(st)
        t0 = time.time()
        st, tr = fn()
        sync(st)
        dt = time.time() - t0
        e = np.asarray(st.energy)
        acc = float(np.asarray(tr.accepted).mean()) / cfg.n
        res = {
            "mean_E": float(e.mean()),
            "err_E": float(e.std() / max(1, len(e) - 1) ** 0.5),
            "acceptance": acc,
            "agg_sweeps_per_s": args.chains * args.sweeps / dt,
        }
        print(f"[{name}] E={res['mean_E']:.3f}±{res['err_E']:.3f} "
              f"acc={acc:.4f} {res['agg_sweeps_per_s']:,.0f} sweeps/s",
              file=sys.stderr, flush=True)
        return res

    out = {"config": {"n": args.n, "chains": args.chains,
                      "sweeps": args.sweeps}}
    out["dense"] = measure("dense", lambda: ens.ensemble_sweeps_pallas(
        state0, w, cfg, cfg.proposal_a, args.sweeps, seed=7))
    out["zsorted"] = measure("zsorted", lambda: ens.ensemble_sweeps_zsorted(
        state0, w, cfg, cfg.proposal_a, args.sweeps, seed=7,
        row_block_rows=args.row_block))
    if args.banded:
        def run_banded():
            st, tr, fb = ens.ensemble_sweeps_banded(
                state0, w, cfg, cfg.proposal_a, args.sweeps)
            print(f"[banded] fallback_frac={float(fb):.3f}",
                  file=sys.stderr)
            return st, tr
        out["banded"] = measure("banded", run_banded)

    de = abs(out["zsorted"]["mean_E"] - out["dense"]["mean_E"])
    sig = (out["zsorted"]["err_E"] ** 2 + out["dense"]["err_E"] ** 2) ** 0.5
    dacc = abs(out["zsorted"]["acceptance"] - out["dense"]["acceptance"])
    out["delta_E_sigmas"] = de / sig if sig else float("nan")
    out["delta_acceptance"] = dacc
    out["speedup_zsorted"] = (out["zsorted"]["agg_sweeps_per_s"]
                              / out["dense"]["agg_sweeps_per_s"])
    ok = de < 4 * sig and dacc < 0.01
    out["pass"] = bool(ok)
    print(json.dumps(out, indent=2))
    print("VALIDATION:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
