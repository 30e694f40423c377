"""Ensemble-equivalence triangle for the isothermal compressibility.

Three INDEPENDENT routes to kappa_T at one bulk state point (rho, T),
one per ensemble engine — a cross-validation the strictly-NVT reference
cannot attempt (SMC_noMPI_noWall.c has no constant-P or constant-mu
mode):

  NVT   thermodynamic definition  kappa = 1/(rho dP/drho), with dP/drho
        from the virial pressure (potentials.pair_virial_pressure +
        the ideal rho T term) at rho (1 +- eps) — central difference;
  NPT   volume fluctuations       kappa = Var(V) / (T <V>)   (npt.py)
        at P = P_vir(rho) + T/V0 (the exact finite-N offset of the
        V^(N+1) lnV-sampling weight — see test_npt);
  muVT  number fluctuations       kappa = V Var(N) / (T <N>^2) (gcmc.py)
        at mu = T ln rho + mu_ex with mu_ex measured by Widom insertion
        (widom.py) on the NVT leg's own configurations.

The fluctuation routes are exact in their ensembles; the three agree up
to O(1/N) finite-size corrections and sampling error. Default gate:
each fluctuation route within --tol (35%) of the NVT thermodynamic
value, and both imposed-field runs must land on the target density.

CPU-friendly (a few minutes at the defaults); pass --json to record
docs/EVIDENCE_KAPPA.json like the other validation scripts.

Usage:
    python scripts/validate_kappa.py [--rho 0.3] [--t 2.0] [--n 32]
                                     [--json docs/EVIDENCE_KAPPA.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def measure_nvt(cfg, key, chains, therm, gathers, stride, widom_k=0):
    """Equilibrate an NVT ensemble at cfg's density; return
    (P_mean, P_err, widom_du [G, C, K]). Chunked device calls."""
    import jax
    import jax.numpy as jnp

    from tpu_smc import ensemble as ens
    from tpu_smc.potentials import pair_virial_pressure
    from tpu_smc.state import init_ensemble_state
    from tpu_smc.widom import widom_delta_u

    state, w = init_ensemble_state(cfg, key, chains)
    done = 0
    while done < therm:
        k = min(200, therm - done)
        state, _ = ens.ensemble_sweeps(state, w, cfg,
                                       2.0 * cfg.proposal_a, k)
        np.asarray(state.energy)
        done += k
    vir = jax.jit(jax.vmap(lambda r: pair_virial_pressure(r, cfg)))
    ghost = jax.jit(jax.vmap(
        lambda r, kk: widom_delta_u(r, w, cfg, kk, widom_k)[0]
    )) if widom_k else None
    ps, dus = [], []
    for g in range(gathers):
        state, _ = ens.ensemble_sweeps(state, w, cfg, cfg.proposal_a,
                                       stride)
        ps.append(np.asarray(vir(state.r)))
        if ghost is not None:
            keys = jax.vmap(lambda c: jax.random.fold_in(
                jax.random.fold_in(jax.random.key(777), g), c))(
                    jnp.arange(chains))
            dus.append(np.asarray(ghost(state.r, keys)))
    chain_p = cfg.rho * cfg.temperature + np.asarray(ps).mean(axis=0)
    p_mean = float(chain_p.mean())
    p_err = float(chain_p.std() / np.sqrt(max(1, chains - 1)))
    du = np.stack(dus) if dus else None
    return p_mean, p_err, du


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__.splitlines()[0], allow_abbrev=False)
    ap.add_argument("--rho", type=float, default=0.3)
    ap.add_argument("--t", type=float, default=2.0)
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--chains", type=int, default=24)
    ap.add_argument("--eps", type=float, default=0.08,
                    help="density half-step of the NVT finite difference")
    ap.add_argument("--rc", type=float, default=1.8)
    ap.add_argument("--gamma", type=float, default=0.02)
    ap.add_argument("--therm", type=int, default=1200)
    ap.add_argument("--gathers", type=int, default=70)
    ap.add_argument("--stride", type=int, default=15)
    ap.add_argument("--npt-sweeps", type=int, default=6000)
    ap.add_argument("--gcmc-sweeps", type=int, default=4000)
    ap.add_argument("--widom-k", type=int, default=64)
    ap.add_argument("--tol", type=float, default=0.35,
                    help="relative gate vs the NVT route")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--json", default=None,
                    help="write the evidence record here")
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from tpu_smc import npt
    from tpu_smc.config import SMCConfig
    from tpu_smc.gcmc import simulate_gcmc
    from tpu_smc.widom import mu_ex as widom_mu_ex

    def bulk(rho):
        return SMCConfig.bulk(n=args.n, temperature=args.t, rho=rho,
                              gamma=args.gamma, lj_cutoff=args.rc,
                              lj_shift=True)

    t0 = time.time()
    rho0, t = args.rho, args.t
    key = jax.random.key(args.seed)

    # ---- NVT leg: P(rho (1 +- eps)) + Widom du at rho0 -------------
    print(f"NVT leg: virial P at rho = {rho0:g} (1 +- {args.eps:g}), "
          f"{args.chains} chains x {args.gathers * args.stride} sweeps")
    legs = {}
    du0 = None
    for tag, rho in (("-", rho0 * (1 - args.eps)), ("0", rho0),
                     ("+", rho0 * (1 + args.eps))):
        p, perr, du = measure_nvt(
            bulk(rho), jax.random.fold_in(key, hash(tag) % 1000),
            args.chains, args.therm, args.gathers, args.stride,
            widom_k=args.widom_k if tag == "0" else 0)
        legs[tag] = (rho, p, perr)
        if tag == "0":
            du0 = du
        print(f"  rho = {rho:0.5f}:  P = {p:0.5f} +- {perr:0.5f}")
    drho = legs["+"][0] - legs["-"][0]
    dp_drho = (legs["+"][1] - legs["-"][1]) / drho
    dp_err = np.hypot(legs["+"][2], legs["-"][2]) / drho
    kappa_nvt = 1.0 / (rho0 * dp_drho)
    kappa_nvt_err = kappa_nvt * dp_err / dp_drho
    print(f"  dP/drho = {dp_drho:0.4f} +- {dp_err:0.4f}  ->  "
          f"kappa_NVT = {kappa_nvt:0.5f} +- {kappa_nvt_err:0.5f}")

    mu_x, mu_x_err = widom_mu_ex(du0, t)
    mu = t * np.log(rho0) + mu_x
    print(f"  Widom: mu_ex = {mu_x:0.4f} +- {mu_x_err:0.4f}  ->  "
          f"mu = T ln rho + mu_ex = {mu:0.4f}")

    # ---- NPT leg at the virial pressure (exact finite-N offset) ----
    cfg0 = bulk(rho0)
    v0 = args.n / rho0
    p_target = legs["0"][1] + t / v0
    print(f"NPT leg: P = {p_target:0.5f} (= P_vir + T/V0), "
          f"{args.chains} chains x {args.npt_sweeps} sweeps")
    _, nres = npt.simulate_npt(
        cfg0, pressure=p_target, eqsteps=args.npt_sweeps // 2,
        maxsteps=args.npt_sweeps, key=jax.random.fold_in(key, 101),
        n_chains=args.chains, dlnv=0.1, chunk=250)
    print(f"  rho = {nres.mean_density:0.5f} +- {nres.err_density:0.5f}"
          f"  (target {rho0:g});  kappa_NPT = {nres.kappa_t:0.5f}")

    # ---- GCMC leg at the Widom-closed mu ---------------------------
    cap = 2 * args.n
    print(f"GCMC leg: mu = {mu:0.4f}, capacity {cap}, "
          f"{args.chains} chains x {args.gcmc_sweeps} sweeps")
    _, gres = simulate_gcmc(
        cfg0, float(mu), cap, args.gcmc_sweeps // 2, args.gcmc_sweeps,
        jax.random.fold_in(key, 202), n_chains=args.chains, chunk=200)
    print(f"  rho = {gres.mean_density:0.5f}  (target {rho0:g});  "
          f"kappa_GCMC = {gres.kappa_t:0.5f}")

    # ---- verdict ----------------------------------------------------
    rel_npt = abs(nres.kappa_t - kappa_nvt) / kappa_nvt
    rel_gcmc = abs(gres.kappa_t - kappa_nvt) / kappa_nvt
    rho_ok = (abs(nres.mean_density - rho0) < 0.1 * rho0
              and abs(gres.mean_density - rho0) < 0.15 * rho0)
    ok = rel_npt < args.tol and rel_gcmc < args.tol and rho_ok
    print("\n###  kappa_T triangle  ###")
    print(f"NVT  (1/(rho dP/drho))   : {kappa_nvt:0.5f} "
          f"+- {kappa_nvt_err:0.5f}")
    print(f"NPT  (Var V / T <V>)     : {nres.kappa_t:0.5f}   "
          f"[{100 * rel_npt:0.1f}% off NVT]")
    print(f"GCMC (V Var N / T <N>^2) : {gres.kappa_t:0.5f}   "
          f"[{100 * rel_gcmc:0.1f}% off NVT]")
    print(f"densities recovered: NPT {nres.mean_density:0.4f}, "
          f"GCMC {gres.mean_density:0.4f} (target {rho0:g})")
    print(f"{'PASS' if ok else 'FAIL'} (gate: both within "
          f"{100 * args.tol:0.0f}% of NVT + densities on target; "
          f"{time.time() - t0:0.0f} s)")

    if args.json:
        rec = {
            "state_point": {"rho": rho0, "t": t, "n": args.n,
                            "rc": args.rc, "lj_shift": True},
            "nvt": {"kappa": kappa_nvt, "err": kappa_nvt_err,
                    "p_vir": legs["0"][1], "dp_drho": dp_drho},
            "npt": {"kappa": float(nres.kappa_t),
                    "rho": nres.mean_density,
                    "p_imposed": float(p_target)},
            "gcmc": {"kappa": float(gres.kappa_t),
                     "rho": gres.mean_density, "mu_imposed": float(mu),
                     "mu_ex_widom": float(mu_x)},
            "rel_off_nvt": {"npt": rel_npt, "gcmc": rel_gcmc},
            "tol": args.tol, "ok": bool(ok),
            "chains": args.chains, "seed": args.seed,
            "elapsed_s": round(time.time() - t0, 1),
        }
        Path(args.json).write_text(json.dumps(rec, indent=1))
        print(f"evidence -> {args.json}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
