#!/usr/bin/env python
"""Paired z-profile bias gate: zsorted engine vs dense at N=1024.

The zsorted engine's in-sweep visit order is the current z-rank
(docs/DEVIATIONS.md A7) and since round 3 it is the `--sampler auto`
default at N>=1024 — so the deviation is the default sampling behavior.
The existing gate compares equilibrium mean energies (1.4 sigma). This
script sharpens it with the observable a surface-adsorption user
actually reads: the z density profile, compared BIN BY BIN between the
two engines from a common equilibrated start.

Protocol (all on the real chip):
  1. equilibrate one 512-chain ensemble with the DENSE engine;
  2. from that same state, run production with each engine separately,
     snapshotting positions every call;
  3. per chain: mean z-histogram over snapshots -> [C, bins]; the
     chain axis gives independent samples, so the per-bin standard
     error is std-over-chains / sqrt(C) (autocorrelation within a
     chain is folded into its per-chain mean);
  4. report the max per-bin |delta|/sigma and the mean-energy delta.

Gate: with ~64 bins, the max of 64 roughly-standard-normal deviates has
expectation ~2.2 and P(max > 4) < 0.5% (look-elsewhere included), so
max_z < 4 passes; mean-energy |delta| < 3 sigma passes.

Writes docs/EVIDENCE_ZSORTED_BIAS.json.

Usage: python scripts/validate_zsorted_bias.py [--eq 2000] [--snaps 40]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = 1024
CHAINS = 512
BINS = 64
SWEEPS_PER_SNAP = 48   # 3 zsorted cadence chunks; dense uses the same


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--eq", type=int, default=2000)
    ap.add_argument("--snaps", type=int, default=40)
    args = ap.parse_args()

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

    cfg = SMCConfig.for_n(N, dtype="float32")
    state0, w = init_ensemble_state(cfg, jax.random.key(0), CHAINS)

    # 1. common equilibration (dense engine, watchdog-safe 50-sweep calls)
    t0 = time.time()
    for k in range(args.eq // 50):
        state0, _ = ens.ensemble_sweeps_pallas(
            state0, w, cfg, cfg.proposal_a, 50, seed=1000 + k)
    sync(state0)
    log(f"equilibrated {args.eq} sweeps (dense) in {time.time() - t0:.0f}s")

    edges = np.linspace(-cfg.box_lz / 2, cfg.box_lz / 2, BINS + 1)

    def production(engine: str):
        st = state0
        prof = np.zeros((CHAINS, BINS))
        e_sum = np.zeros(CHAINS)
        t0 = time.time()
        for k in range(args.snaps):
            if engine == "dense":
                st, _ = ens.ensemble_sweeps_pallas(
                    st, w, cfg, cfg.proposal_a, SWEEPS_PER_SNAP,
                    seed=5000 + k)
            else:
                st, _ = ens.ensemble_sweeps_zsorted(
                    st, w, cfg, cfg.proposal_a, SWEEPS_PER_SNAP,
                    seed=5000 + k, c_tile=128)
            z = np.asarray(st.r[..., 2])               # [C, N]
            for c in range(CHAINS):
                prof[c] += np.histogram(z[c], bins=edges)[0]
            e_sum += np.asarray(st.energy)
        dt = time.time() - t0
        log(f"{engine}: {args.snaps} snapshots x {SWEEPS_PER_SNAP} sweeps "
            f"in {dt:.0f}s")
        return prof / args.snaps, e_sum / args.snaps

    prof_d, e_d = production("dense")
    prof_z, e_z = production("zsorted")

    # 3-4. per-bin z-scores from chain-to-chain scatter
    mean_d = prof_d.mean(axis=0)
    mean_z = prof_z.mean(axis=0)
    se = np.sqrt(prof_d.var(axis=0, ddof=1) / CHAINS
                 + prof_z.var(axis=0, ddof=1) / CHAINS)
    occupied = (mean_d + mean_z) > 1e-3        # skip empty mid-gap bins
    zs = np.abs(mean_d - mean_z)[occupied] / np.maximum(se[occupied], 1e-12)
    max_z = float(zs.max())

    de = e_d.mean() - e_z.mean()
    se_e = float(np.sqrt(e_d.var(ddof=1) / CHAINS + e_z.var(ddof=1) / CHAINS))
    e_sig = abs(de) / se_e

    out = {
        "config": {"n": N, "chains": CHAINS, "eq_sweeps": args.eq,
                   "prod_sweeps": args.snaps * SWEEPS_PER_SNAP,
                   "bins": BINS, "occupied_bins": int(occupied.sum())},
        "zprofile_max_abs_z": round(max_z, 3),
        "zprofile_mean_abs_z": round(float(zs.mean()), 3),
        "energy_delta_per_n": round(float(de) / N, 8),
        "energy_delta_sigmas": round(e_sig, 3),
        "pass": bool(max_z < 4.0 and e_sig < 3.0),
    }
    with open(os.path.join(REPO, "docs", "EVIDENCE_ZSORTED_BIAS.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0 if out["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
