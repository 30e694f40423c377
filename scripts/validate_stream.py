#!/usr/bin/env python
"""Hardware validation + throughput of the HBM-streamed zsorted engine.

Checks on the real chip:
  1. bitwise: streamed vs VMEM-resident zskip on the same N=4096 state,
     seeds and cadence (the interpret-mode tests pin this on CPU; this
     confirms the Mosaic lowering, DMA aliasing included);
  2. capacity: N=16384 and N=32768 runs with finite physics — sizes the
     resident kernel cannot compile (VMEM) and the reference C program
     cannot reach (O(N^2) at ~0.05/s extrapolated);
  3. throughput at N=8192/16384/32768, recorded for PERF_NOTES.md.

Writes docs/EVIDENCE_STREAM.json.

Usage: python scripts/validate_stream.py [--skip-bitwise]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-bitwise", action="store_true")
    ap.add_argument("--skip-32k", action="store_true")
    ap.add_argument("--sizes", type=str, default=None,
                    help="comma-separated N subset to (re)measure, e.g. "
                         "'32768'; existing JSON entries are preserved")
    ap.add_argument("--rho-matched", action="store_true",
                    help="add the density-matched N=32768 probe (real "
                         "dynamics instead of the jammed fixed box)")
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

    path = os.path.join(REPO, "docs", "EVIDENCE_STREAM.json")
    out = {}
    if os.path.exists(path):  # merge: keep entries not re-measured
        with open(path) as f:
            out = json.load(f)
    out["device"] = str(jax.devices()[0])

    def flush_out():
        with open(path, "w") as f:
            json.dump(out, f, indent=1)

    # ---- 1. bitwise: streamed vs resident at N=4096 ------------------
    if not args.skip_bitwise:
        cfg = SMCConfig.for_n(4096, dtype="float32")
        state, w = init_ensemble_state(cfg, jax.random.key(0), 128)
        state, _ = ens.ensemble_sweeps_pallas(
            state, w, cfg, cfg.proposal_a, 50, seed=1)
        sync(state)
        sa, _ = ens.ensemble_sweeps_zsorted(
            state, w, cfg, cfg.proposal_a, 8, seed=7, c_tile=128,
            sweeps_per_sort=4, hbm_stream=False)
        sb, _ = ens.ensemble_sweeps_zsorted(
            state, w, cfg, cfg.proposal_a, 8, seed=7, c_tile=128,
            sweeps_per_sort=4, hbm_stream=True)
        bit_r = bool(np.array_equal(np.asarray(sa.r), np.asarray(sb.r)))
        bit_e = bool(np.array_equal(np.asarray(sa.energy),
                                    np.asarray(sb.energy)))
        out["bitwise_r"] = bit_r
        out["bitwise_energy"] = bit_e
        log(f"bitwise streamed==resident at N=4096: r={bit_r} e={bit_e}")
        flush_out()
        if not (bit_r and bit_e):
            print(json.dumps(out))
            return 1

    # ---- 2+3. capacity & throughput at large N -----------------------
    sizes = [(8192, 128, 48), (16384, 128, 24)]
    if not args.skip_32k:
        sizes.append((32768, 128, 16))
    if args.sizes:
        keep = {int(s) for s in args.sizes.split(",")}
        sizes = [s for s in sizes if s[0] in keep]
    probes = [(f"n{n}", SMCConfig.for_n(n, dtype="float32"), n, c, s)
              for n, c, s in sizes]
    if args.rho_matched:
        # The fixed reference box (default_box: 33x240 for all N>=150)
        # makes N>=16384 unphysically dense (acceptance ~0 — nothing
        # moves, so throughput alone doesn't evidence correct dynamics).
        # This probe scales the x/y box to the reference DENSITY
        # (rho = N/(L^2 Lz) = 5.7e-3, the N=1024 value) so the streamed
        # kernel is exercised with real accepted moves + energy drift.
        n = 32768
        l = math.sqrt(n / (5.7e-3 * 240.0))
        cfgm = SMCConfig(n=n, box_l=l, box_lz=240.0, dtype="float32")
        probes.append((f"n{n}_rho_matched", cfgm, n, 128, 16))
    for tag, cfg, n, chains, sweeps in probes:
        state, w = init_ensemble_state(cfg, jax.random.key(1), chains)
        t0 = time.time()
        state, _ = ens.ensemble_sweeps_zsorted(
            state, w, cfg, cfg.proposal_a, sweeps, seed=3, c_tile=128,
            sweeps_per_sort=8)
        sync(state)
        warm = time.time() - t0
        log(f"N={n}: warmup/compile {warm:.1f}s")
        best = float("inf")
        for rep in range(2):
            t0 = time.time()
            state, tr = ens.ensemble_sweeps_zsorted(
                state, w, cfg, cfg.proposal_a, sweeps, seed=4 + rep,
                c_tile=128, sweeps_per_sort=8)
            sync(state)
            best = min(best, time.time() - t0)
        agg = chains * sweeps / best
        e_n = float(np.asarray(state.energy).mean()) / n
        acc = float(np.asarray(tr.accepted).mean()) / n
        finite = bool(np.all(np.isfinite(np.asarray(state.energy))))
        # Physics check with no resident kernel to compare against at
        # these sizes: the kernel's incrementally-tracked energy vs an
        # exact XLA recompute of the final configurations (first 4
        # chains). A wrong pair term / skipped block would show up here.
        from tpu_smc.potentials import total_energy_jit

        e_exact = np.array([
            float(total_energy_jit(state.r[c_], w, cfg))
            for c_ in range(4)
        ])
        e_tracked = np.asarray(state.energy[:4], dtype=np.float64)
        drift = float(np.max(np.abs(e_exact - e_tracked)
                             / np.maximum(np.abs(e_exact), 1.0)))
        log(f"N={n}: tracked-vs-exact energy rel drift {drift:.2e}")
        # O(N^2) extrapolated C core: 4744 sweeps/s at N=108 on one core.
        c_rate = 4744.0 * (108.0 / n) ** 2
        out[tag] = {
            "agg_sweeps_per_s": round(agg, 1),
            "e_per_n": round(e_n, 4),
            "acceptance": round(acc, 4),
            "finite": finite,
            "vs_c_core_extrapolated": round(agg / c_rate, 1),
            "warmup_s": round(warm, 1),
            "tracked_vs_exact_rel": drift,
        }
        log(f"N={n}: {agg:,.0f} agg sweeps/s, E/N={e_n:.3f}, "
            f"acc={acc:.3f}, {agg / c_rate:,.0f}x C-core")
        flush_out()

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
