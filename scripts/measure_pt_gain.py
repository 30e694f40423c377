#!/usr/bin/env python
"""Measure parallel tempering's mixing win on hardware.

Runs the same temperature ladder twice — without exchanges (tsweep) and
with them (PT) — and reports the integrated autocorrelation time of the
energy at the COLDEST temperature slot, where mixing is hardest. The
recorded v5e result (N=108, 6 levels 0.8-1.5 x 64 chains, exchange
every 10 sweeps): tau_int 127.2 -> 82.4 sweeps, a 1.54x decorrelation
speedup at swap acceptances 0.58-0.92 (docs/ARCHITECTURE.md).

    python scripts/measure_pt_gain.py [--chains-per-t 64] [--sweeps 4000]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains-per-t", type=int, default=64)
    ap.add_argument("--sweeps", type=int, default=4000)
    ap.add_argument("--eqsteps", type=int, default=2000)
    ap.add_argument("--interval", type=int, default=10)
    ap.add_argument("--temps", default="0.8,0.94,1.08,1.22,1.36,1.5")
    ap.add_argument("--sampler", default="pallas",
                    choices=("pallas", "xla", "zsorted"))
    ap.add_argument("--n", type=int, default=108,
                    help="system size (box from the reference's per-N "
                         "table); VERDICT r4 #5 runs this at N=1024 "
                         "through the zsorted production engine")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from tpu_smc.config import RunParams, SMCConfig
    from tpu_smc.observables import tau_int
    from tpu_smc.pt import simulate_parallel_tempering
    from tpu_smc.tsweep import simulate_temperature_sweep

    cfg = SMCConfig.for_n(args.n, dtype="float32")
    temps = [float(v) for v in args.temps.split(",")]
    # numdata = maxsteps -> per-sweep energy samples (lapse 1)
    params = RunParams(eqsteps=args.eqsteps, maxsteps=args.sweeps,
                       numdata=args.sweeps)

    def tau_cold(samples):
        e = samples[:, 0, :]            # coldest slot [S, R]
        return float(np.mean([tau_int(e[:, c])
                              for c in range(e.shape[1])]))

    print(f"devices = {jax.devices()}", file=sys.stderr)
    _, ts = simulate_temperature_sweep(
        cfg, params, temps, jax.random.key(1),
        chains_per_t=args.chains_per_t, sampler=args.sampler)
    t0 = tau_cold(ts.energy_samples)
    print(f"no exchange : tau_int(T={temps[0]}) = {t0:.1f} sweeps")

    _, pt = simulate_parallel_tempering(
        cfg, params, temps, jax.random.key(1),
        chains_per_t=args.chains_per_t, exchange_interval=args.interval,
        sampler=args.sampler)
    t1 = tau_cold(pt.tsweep.energy_samples)
    print(f"PT every {args.interval:3d}: tau_int(T={temps[0]}) = "
          f"{t1:.1f} sweeps  ({t0 / t1:.2f}x faster decorrelation)")
    print("swap acceptance per pair:",
          np.round(pt.swap_acceptance, 3).tolist())
    return 0


if __name__ == "__main__":
    sys.exit(main())
