#!/usr/bin/env python
"""Hardware validation of the large-N (N=4096) path with real observables
(VERDICT r2 #6): a recorded pallas run producing energy / acceptance /
g(r) / rho(z), cross-checked against the XLA engine on a short window,
plus the one unexplored skip variant (zskip at c_tile=128).

Checks:
  1. pallas vs XLA engine: mean energy and acceptance agree within
     combined statistical error on the same equilibrated start;
  2. incremental-energy integrity: the carried per-chain energy matches
     an exact O(N^2) recompute after the production window;
  3. physics sanity: g(r) ~ 0 inside the core, rho(z) mass = N;
  4. perf: dense vs zskip (c_tile 128 and 256) throughput, recorded for
     PERF_NOTES.md.

Usage:  python scripts/validate_n4096.py [--chains 256] [--sweeps 200]
Writes docs/EVIDENCE_N4096.json next to the printed report.
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
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--chains", type=int, default=256)
    ap.add_argument("--sweeps", type=int, default=200)
    ap.add_argument("--eq", type=int, default=800)
    ap.add_argument("--xla-chains", type=int, default=16)
    ap.add_argument("--xla-sweeps", type=int, default=32)
    ap.add_argument("--skip-zskip", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from tpu_smc import ensemble as ens
    from tpu_smc.config import SMCConfig
    from tpu_smc.observables import radial_distribution, z_density_profile
    from tpu_smc.potentials import total_energy
    from tpu_smc.state import init_ensemble_state

    def log(m):
        print(m, file=sys.stderr, flush=True)

    cfg = SMCConfig.for_n(args.n, dtype="float32")
    log(f"devices = {jax.devices()}; N={cfg.n} box {cfg.box_l}x{cfg.box_lz}"
        f" rho={cfg.rho:.4f} A={cfg.proposal_a}")
    t0 = time.time()
    np.asarray(jax.numpy.ones((8, 128)) + 1.0)   # absorb tunnel first-dispatch
    log(f"first-dispatch {time.time() - t0:.1f}s")

    state0, w = init_ensemble_state(cfg, jax.random.key(0), args.chains)

    def sync(st):
        np.asarray(st.energy[:1])

    # watchdog-safe equilibration chunks
    log(f"[eq] {args.eq} dense pallas sweeps ...")
    done = 0
    state = state0
    while done < args.eq:
        k = min(100, args.eq - done)
        state, _ = ens.ensemble_sweeps_pallas(
            state, w, cfg, cfg.proposal_a, k, seed=(1, done))
        sync(state)
        done += k

    out = {"config": {"n": args.n, "chains": args.chains,
                      "sweeps": args.sweeps, "eq": args.eq}}

    # --- production window through the pallas engine, with observables.
    # Warm-up call first (same statics) so the timed window measures the
    # kernel, not executable load.
    wstate, _ = ens.ensemble_sweeps_pallas(
        state, w, cfg, cfg.proposal_a, args.sweeps, seed=6)
    sync(wstate)
    del wstate
    t0 = time.time()
    pstate, ptr = ens.ensemble_sweeps_pallas(
        state, w, cfg, cfg.proposal_a, args.sweeps, seed=7)
    sync(pstate)
    dt = time.time() - t0
    e = np.asarray(pstate.energy)
    acc_tr = np.asarray(ptr.accepted)                     # [S, C]
    e_tr = np.asarray(ptr.energy)                         # [S, C]
    # exact recompute vs carried incremental energy (drift check).
    # lax.map, NOT vmap: a vmapped O(N^2) pass materializes
    # [C, N, N, 3] = 48 GB at this size; sequential per chain each
    # displacement tensor is ~200 MB.
    e_exact = np.asarray(jax.jit(lambda rs: jax.lax.map(
        lambda r: total_energy(r, w, cfg), rs))(pstate.r))
    gr_c, gr = jax.jit(lambda r: radial_distribution(r[0], cfg, nbins=64))(
        pstate.r)
    zp_c, zp = jax.jit(lambda r: z_density_profile(r[0], cfg, nbins=64))(
        pstate.r)
    gr, zp = np.asarray(gr), np.asarray(zp)
    mass = float(np.asarray(zp).sum() * (cfg.box_lz / 64)
                 * cfg.box_l ** 2)
    out["pallas"] = {
        "mean_E_per_particle": float(e.mean() / cfg.n),
        "err_E_per_particle": float(e.std() / len(e) ** 0.5 / cfg.n),
        "acceptance": float(acc_tr.mean() / cfg.n),
        "agg_sweeps_per_s": args.chains * args.sweeps / dt,
        "energy_trace_drop": float(e_tr[-1].mean() - e_tr[0].mean()),
        "incremental_vs_exact_max_abs":
            float(np.abs(e - e_exact).max()),
        "incremental_vs_exact_rel":
            float(np.abs(e - e_exact).max() / np.abs(e_exact).max()),
        "gr_core_max": float(gr[gr_c < 0.8].max()),
        "zprofile_mass": mass,
    }
    log(f"[pallas] E/N={out['pallas']['mean_E_per_particle']:.4f}"
        f"±{out['pallas']['err_E_per_particle']:.4f} "
        f"acc={out['pallas']['acceptance']:.4f} "
        f"{out['pallas']['agg_sweeps_per_s']:,.0f} sweeps/s "
        f"drift={out['pallas']['incremental_vs_exact_rel']:.2e}")

    # --- XLA engine cross-check on a short window from the same start
    xstate = jax.tree.map(lambda x: x[:args.xla_chains], state)
    done = 0
    xacc = 0.0
    t0 = time.time()
    while done < args.xla_sweeps:
        k = min(8, args.xla_sweeps - done)
        xstate, xtr = ens.ensemble_sweeps(
            xstate, w, cfg, cfg.proposal_a, k, collect_trace=True,
            stream_seed=7)
        sync(xstate)
        xacc += float(np.asarray(xtr.accepted).mean(axis=1).sum())
        done += k
    xdt = time.time() - t0
    xe = np.asarray(xstate.energy)
    out["xla"] = {
        "chains": args.xla_chains,
        "sweeps": args.xla_sweeps,
        "mean_E_per_particle": float(xe.mean() / cfg.n),
        "err_E_per_particle": float(xe.std() / len(xe) ** 0.5 / cfg.n),
        "acceptance": xacc / (args.xla_sweeps * cfg.n),
        "agg_sweeps_per_s": args.xla_chains * args.xla_sweeps / xdt,
    }
    log(f"[xla]    E/N={out['xla']['mean_E_per_particle']:.4f}"
        f"±{out['xla']['err_E_per_particle']:.4f} "
        f"acc={out['xla']['acceptance']:.4f} "
        f"{out['xla']['agg_sweeps_per_s']:,.0f} sweeps/s")

    # --- zskip variant sweep (PERF_NOTES: c_tile 128 halves the 256-lane
    # envelope dilution — the one unexplored configuration)
    if not args.skip_zskip:
        for ct in (128, 256):
            st, tr = ens.ensemble_sweeps_zsorted(   # warm
                state, w, cfg, cfg.proposal_a, args.sweeps, seed=7,
                c_tile=ct)
            sync(st)
            t0 = time.time()
            st, tr = ens.ensemble_sweeps_zsorted(
                state, w, cfg, cfg.proposal_a, args.sweeps, seed=7,
                c_tile=ct)
            sync(st)
            rate = args.chains * args.sweeps / (time.time() - t0)
            ez = np.asarray(st.energy)
            out[f"zskip_c{ct}"] = {
                "agg_sweeps_per_s": rate,
                "mean_E_per_particle": float(ez.mean() / cfg.n),
                "acceptance":
                    float(np.asarray(tr.accepted).mean() / cfg.n),
            }
            log(f"[zskip c_tile={ct}] {rate:,.0f} sweeps/s "
                f"E/N={out[f'zskip_c{ct}']['mean_E_per_particle']:.4f}")

    # --- verdicts. The E comparison is at the SAME sweep horizon (the
    # XLA window is shorter than the pallas one; comparing endpoints
    # would fold any residual equilibration drift into the check).
    e_h = e_tr[args.xla_sweeps - 1] / cfg.n               # [C] at horizon
    out["pallas"]["mean_E_at_horizon"] = float(e_h.mean())
    out["pallas"]["err_E_at_horizon"] = float(e_h.std()
                                              / len(e_h) ** 0.5)
    acc_h = acc_tr[:args.xla_sweeps].mean() / cfg.n       # same horizon
    out["pallas"]["acceptance_at_horizon"] = float(acc_h)
    de = abs(out["pallas"]["mean_E_at_horizon"]
             - out["xla"]["mean_E_per_particle"])
    sig = (out["pallas"]["err_E_at_horizon"] ** 2
           + out["xla"]["err_E_per_particle"] ** 2) ** 0.5
    dacc = abs(float(acc_h) - out["xla"]["acceptance"])
    out["cross_check"] = {
        "delta_E_per_particle": de, "combined_sigma": sig,
        "delta_E_sigmas": de / sig if sig else float("nan"),
        "delta_acceptance": dacc,
    }
    out["pass"] = bool(_verdict(out, args.eq + args.sweeps, cfg.n))
    with open(os.path.join(REPO, "docs", "EVIDENCE_N4096.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    print("VALIDATION:", "PASS" if out["pass"] else "FAIL")
    return 0 if out["pass"] else 1


def _verdict(out, total_sweeps, n) -> bool:
    """Gates applied to a recorded measurement set.

    The incremental-energy gate is the f32 accumulation floor, not a
    fixed constant: each accepted move adds dU with rounding error
    ~eps_f32 * |E| (~6e-8 * 1.2e3 ~ 7e-5 here), and S sweeps * N moves
    random-walk to ~7e-5 * sqrt(S*N) — at 1000 sweeps * 4096 that is
    ~0.14 absolute (1.2e-4 relative), exactly what the run measures.
    The gate allows 3x that floor; the production driver resyncs with
    an exact recompute at cfg.recompute_every anyway (SMC.c:194,341 —
    the reference never resyncs at all)."""
    cc = out["cross_check"]
    floor = 3.0 * 7e-5 * (total_sweeps * n) ** 0.5
    e_scale = abs(out["pallas"]["mean_E_per_particle"]) * n
    ok = (cc["delta_E_sigmas"] < 4.0
          and cc["delta_acceptance"] < 0.02
          and out["pallas"]["incremental_vs_exact_max_abs"] < floor
          and out["pallas"]["incremental_vs_exact_rel"] < floor / e_scale
          and out["pallas"]["gr_core_max"] < 0.05
          and abs(out["pallas"]["zprofile_mass"] - n) / n < 1e-3)
    # DEVIATIONS A7: the zsorted engine's state-dependent visit order is
    # accepted on evidence — its equilibrium energy must track the
    # fixed-label dense engine (same production horizon, independent
    # streams; both chain-mean errors ~ pallas err).
    if "zskip_c128" in out:
        sig2 = out["pallas"]["err_E_per_particle"] * 2.0 ** 0.5
        dz = abs(out["zskip_c128"]["mean_E_per_particle"]
                 - out["pallas"]["mean_E_per_particle"])
        cc["zskip_vs_dense_sigmas"] = dz / sig2 if sig2 else float("nan")
        ok = ok and cc["zskip_vs_dense_sigmas"] < 5.0
    return ok


def reverdict(path) -> int:
    """Re-apply the gates to a recorded evidence JSON (no hardware)."""
    with open(path) as f:
        out = json.load(f)
    total = out["config"]["eq"] + out["config"]["sweeps"]
    out["pass"] = bool(_verdict(out, total, out["config"]["n"]))
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["cross_check"], indent=2))
    print("VALIDATION:", "PASS" if out["pass"] else "FAIL")
    return 0 if out["pass"] else 1


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--reverdict":
        sys.exit(reverdict(sys.argv[2]))
    sys.exit(main())
