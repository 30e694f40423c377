#!/usr/bin/env python
"""Hardware probe for the 2-D (z-band, x-slice) zsorted refinement
(VERDICT r4 #4): throughput vs the production 1-D zsorted engine.

The round-5 roofline stages measured where the remaining pair-pass
headroom lives (docs/EVIDENCE_ROUND5_HW.json): at N=1024 the kernel
admits ~312 rows/move where the true sphere needs 1.6 (in-plane ceiling
box_over_admitted 0.0065); at rho-matched N=16384 the z envelope
SATURATES (z-perfect only 1.7x below admitted) while in-plane-perfect
is 390x below. This probe prices what the implemented conservative 2-D
scheme (kernels/sweep_pallas.pair_terms_2d) actually recovers.

Shapes: the bench pair (N=1024 x 512, N=4096 x 256, reference per-N
boxes — z-dilute) plus the rho-matched N=4096 box where in-plane
should pay most. Warm best-of-3 on 192-sweep calls, cadence = the
production default; xslices in {4, 8}.

    python scripts/probe_xsort.py [--quick]

Writes docs/EVIDENCE_XSORT.json (merge-by-key, fail-soft per variant).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EV = os.path.join(REPO, "docs", "EVIDENCE_XSORT.json")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="N=1024 only (compile-risk smoke)")
    ap.add_argument("--sweeps", type=int, default=192)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from tpu_smc import ensemble as ens
    from tpu_smc.config import SMCConfig
    from tpu_smc.state import init_ensemble_state

    try:
        results = json.load(open(EV))
    except Exception:  # noqa: BLE001
        results = {}

    def log(m):
        print(m, file=sys.stderr, flush=True)

    def sync(st):
        np.asarray(st.energy[:1])

    def flush():
        results["host_ts"] = time.strftime("%Y-%m-%d %H:%M:%S")
        with open(EV, "w") as f:
            json.dump(results, f, indent=2)
            f.write("\n")

    shapes = [("n1024", SMCConfig.for_n(1024, dtype="float32"), 512,
               1920)]
    if not args.quick:
        shapes.append(("n4096", SMCConfig.for_n(4096, dtype="float32"),
                       256, 768))
        lr = (4096 / (5.7e-3 * 240.0)) ** 0.5
        shapes.append(
            ("n4096_rho", SMCConfig(n=4096, box_l=lr, box_lz=240.0,
                                    dtype="float32"), 256, 768))

    sw = args.sweeps
    for name, cfg, chains, eq in shapes:
        cad = ens.zsort_cadence(cfg.n)
        state, w = init_ensemble_state(cfg, jax.random.key(0), chains)
        t0 = time.time()
        done = 0
        while done < eq:
            state, _ = ens.ensemble_sweeps_zsorted(
                state, w, cfg, cfg.proposal_a, min(192, eq - done),
                seed=1 + done, c_tile=128)
            sync(state)
            done += min(192, eq - done)
        log(f"{name}: equilibrated {eq} sweeps ({time.time() - t0:.0f}s)"
            f" acc so far n/a; cadence {cad}")

        def time_engine(label, xsl):
            key = f"{name}_{label}"
            try:
                t0 = time.time()
                st, _ = ens.ensemble_sweeps_zsorted(
                    state, w, cfg, cfg.proposal_a, sw, seed=11,
                    c_tile=128, xsort_slices=xsl)
                sync(st)
                compile_s = time.time() - t0
                best = float("inf")
                for rep in range(3):
                    t0 = time.time()
                    st2, tr = ens.ensemble_sweeps_zsorted(
                        state, w, cfg, cfg.proposal_a, sw,
                        seed=20 + rep, c_tile=128, xsort_slices=xsl)
                    sync(st2)
                    best = min(best, time.time() - t0)
                agg = chains * sw / best
                results[key] = {
                    "agg_sweeps_per_s": round(agg, 1),
                    "first_call_s": round(compile_s, 1),
                    # tr.accepted is [S, C] per-sweep accept counts
                    "acceptance": round(
                        float(np.asarray(tr.accepted).mean()) / cfg.n,
                        4),
                }
                log(f"{name} {label}: {agg:,.0f} agg sweeps/s "
                    f"(first call {compile_s:.0f}s)")
            except Exception as exc:  # noqa: BLE001
                results[key] = {"error": f"{type(exc).__name__}: "
                                         f"{str(exc)[:300]}"}
                log(f"{name} {label} FAILED: {results[key]['error']}")
            flush()

        time_engine("zsorted", 0)
        for xsl in (4, 8):
            time_engine(f"xsort{xsl}", xsl)

    flush()
    print(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
