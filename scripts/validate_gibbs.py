"""Gibbs-ensemble coexistence evidence: binodal points of the
truncated-and-shifted LJ fluid (rc as configured) measured directly by
the two-box engine, with the in-run chemical-equilibrium gate.

At each temperature below T_c the boxes must bifurcate into a vapor
and a liquid branch; the per-box chemical potentials (measured by the
transfer ghosts, mu = T ln rho + mu_ex) must agree at equilibrium; the
one supercritical control temperature must NOT bifurcate. The gate is
qualitative-shape + internal-consistency — there is no external
baseline because the reference cannot do coexistence at all.

    python scripts/validate_gibbs.py [--json docs/EVIDENCE_GIBBS.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__.splitlines()[0], allow_abbrev=False)
    ap.add_argument("--n", type=int, default=96)
    ap.add_argument("--rho", type=float, default=0.3)
    ap.add_argument("--rc", type=float, default=1.8)
    ap.add_argument("--temps", default="0.65,0.72,2.0",
                    help="comma list; the last must be supercritical. "
                         "At rc=1.8 (truncated-shifted) T=0.8 is "
                         "already near-critical for N=96 — the "
                         "measured binodal closes between 0.72 and "
                         "0.8 (docs/EVIDENCE_GIBBS.json)")
    ap.add_argument("--chains", type=int, default=6)
    ap.add_argument("--eq", type=int, default=3000)
    ap.add_argument("--prod", type=int, default=4000)
    ap.add_argument("--mu-tol", type=float, default=0.5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from tpu_smc.config import SMCConfig
    from tpu_smc.gibbs import simulate_gibbs

    temps = [float(v) for v in args.temps.split(",")]
    l0 = ((args.n / 2) / args.rho) ** (1.0 / 3.0)
    t0 = time.time()
    points = []
    for i, t in enumerate(temps):
        cfg = dataclasses.replace(
            SMCConfig.bulk(n=args.n, temperature=t, gamma=0.02,
                           lj_cutoff=args.rc, lj_shift=True),
            box_l=l0, box_lz=l0)
        _, res = simulate_gibbs(
            cfg, args.eq, args.prod,
            jax.random.key(args.seed + i), cap=args.n,
            n_chains=args.chains, dlnv=0.08,
            n_transfer=args.n // 4, chunk=250)
        two = res.rho_hi > 2.0 * res.rho_lo
        dmu = float(abs(res.mu_box[0] - res.mu_box[1]))
        points.append({
            "t": t, "rho_v": res.rho_lo, "rho_l": res.rho_hi,
            "err_v": res.err_lo, "err_l": res.err_hi,
            "two_phase": bool(two), "dmu": dmu,
            "mu_box": [float(m) for m in res.mu_box],
            "acc": {"disp": res.disp_acceptance,
                    "vol": res.vol_acceptance,
                    "transfer": res.transfer_acceptance},
        })
        print(f"T = {t:g}: rho_v = {res.rho_lo:0.4f} ± "
              f"{res.err_lo:0.4f}, rho_l = {res.rho_hi:0.4f} ± "
              f"{res.err_hi:0.4f}  "
              f"{'TWO-PHASE' if two else 'one phase'}  |dmu| = {dmu:0.3f}")

    sub = points[:-1]
    sup = points[-1]
    ok = all(p["two_phase"] for p in sub) and not sup["two_phase"]
    # binodal widens on cooling: vapor thinner, liquid denser
    for a, b in zip(sub, sub[1:]):
        ok &= a["rho_v"] <= b["rho_v"] + 2 * (a["err_v"] + b["err_v"])
        ok &= a["rho_l"] >= b["rho_l"] - 2 * (a["err_l"] + b["err_l"])
    mu_ok = all(p["dmu"] < args.mu_tol for p in sub)
    print(f"\nshape gate: {'ok' if ok else 'FAIL'}; chemical "
          f"equilibrium |dmu| < {args.mu_tol:g}: "
          f"{'ok' if mu_ok else 'FAIL'}  "
          f"({time.time() - t0:0.0f} s)")
    print("PASS" if ok and mu_ok else "FAIL")
    if args.json:
        Path(args.json).write_text(json.dumps({
            "n": args.n, "rho_overall": args.rho, "rc": args.rc,
            "lj_shift": True, "points": points,
            "ok": bool(ok and mu_ok), "seed": args.seed,
            "chains": args.chains,
            "elapsed_s": round(time.time() - t0, 1)}, indent=1))
        print(f"evidence -> {args.json}")
    return 0 if ok and mu_ok else 1


if __name__ == "__main__":
    sys.exit(main())
