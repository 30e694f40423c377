"""Command-line entry point — the main.c equivalent.

Usage (positional args exactly like the reference, main.c:13-19):

    python -m tpu_smc EQSTEPS MAXSTEPS NUMDATA T [options]

e.g. `python -m tpu_smc 4000000 16000000 400000 1.1`. Options extend the
reference's compile-time choices (particle count, dtype, chain count,
observables) without recompiling anything by hand — jit recompiles.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="tpu_smc",
        description="TPU-native Smart Monte Carlo of a confined LJ fluid",
    )
    p.add_argument("eqsteps", type=int, nargs="?", default=None,
                   help="equilibration sweeps (ref: 4e6); prompted "
                        "interactively when omitted (main.c:20-30)")
    p.add_argument("maxsteps", type=int, nargs="?", default=None,
                   help="production sweeps (ref: 16e6)")
    p.add_argument("numdata", type=int, nargs="?", default=None,
                   help="number of gathers (ref: 4e5)")
    p.add_argument("temperature", type=float, nargs="?", default=None,
                   help="temperature (ref: 1.1)")
    p.add_argument("--n", type=int, default=108, help="particles (SMC.h:29)")
    p.add_argument("--m", type=int, default=3, help="wall grid per dim (SMC.h:26)")
    p.add_argument("--wall-seed", type=int, default=42, metavar="S",
                   help="wall disorder seed (the reference hard-codes "
                        "srand(42), SMC.c:477; any other value draws a fresh "
                        "realization from the same site distribution)")
    p.add_argument("--wall-realizations", type=int, default=1, metavar="K",
                   help="quenched wall-disorder ensemble: --chains (or "
                        "--chains-per-t in ladder mode) split into K "
                        "groups, group k simulating wall seed S+k in ONE "
                        "compiled program; per-realization and "
                        "disorder-averaged results (K must divide the "
                        "chain count; every engine)")
    p.add_argument("--lca-time", type=int, default=None, metavar="G",
                   help="gathers between cluster analyses (LCA_TIME, "
                        "SMC.h:48 — a compile-time macro there). At "
                        "large N*chains one CNA pass is minutes of MXU "
                        "time (p_pad*N^2 MACs per chain: ~5.6 s/chain "
                        "at N=4096); the driver hoists big passes into "
                        "watchdog-bounded device calls automatically, "
                        "and this cadence is the knob that thins how "
                        "often they run")
    p.add_argument("--storage-time", type=int, default=None, metavar="G",
                   help="gathers between position/density-window dumps "
                        "(STORAGE_TIME, SMC.h:45)")
    p.add_argument("--gamma", type=float, default=None,
                   help="A = gamma*T (main.c:51; default 1.0, or the bulk "
                        "variant's A=4e-8 equivalent under --bulk)")
    p.add_argument("--dtype", choices=("float32", "float64"), default="float32")
    p.add_argument("--bulk", action="store_true",
                   help="bulk LJ fluid (SMC_noMPI_noWall.c variant)")
    p.add_argument("--data-dir", default="Data", help="output root (main.c:55)")
    p.add_argument("--seed", type=int, default=None,
                   help="chain seed (default: time, like srand(time(NULL)))")
    p.add_argument("--chains", type=int, default=1,
                   help="independent chains (replaces MPI ranks)")
    p.add_argument("--gr-bins", type=int, default=0, help="accumulate g(r)")
    p.add_argument("--z-bins", type=int, default=0, help="accumulate z profile")
    p.add_argument("--widom", type=int, default=0, metavar="K",
                   help="Widom test-particle insertion: K ghost insertions "
                        "per chain per gather. Prints the excess chemical "
                        "potential mu_ex and writes widom_*.csv with the "
                        "z-resolved profile mu_ex(z). Trajectories are "
                        "unaffected (the ghosts never enter the chain).")
    p.add_argument("--widom-bins", type=int, default=64, metavar="B",
                   help="z bins for the mu_ex(z) profile (default 64)")
    p.add_argument("--ptensor-bins", type=int, default=0, metavar="B",
                   help="accumulate the normal/tangential pressure "
                        "profile P_N(z)/P_T(z) (Harasima midpoint "
                        "convention) and report the wall tension "
                        "integral 1/2 int (P_N - P_T) dz; writes "
                        "ptensor_*.csv")
    p.add_argument("--gcmc", type=float, default=None, metavar="MU",
                   help="grand-canonical mode: sample N at chemical "
                        "potential MU (Lambda=1 reduced units — a Widom-"
                        "measured mu = T ln rho + mu_ex plugs straight "
                        "in). Prints <N>/density/acceptances and writes "
                        "gcmc_*.csv; --z-bins adds the density profile. "
                        "eqsteps/maxsteps count GC sweeps")
    p.add_argument("--gcmc-cap", type=int, default=0, metavar="CAP",
                   help="particle capacity (static shape; default 2x "
                        "--n). Insertions reject at capacity — size it "
                        "comfortably above the expected <N>")
    p.add_argument("--gcmc-exchanges", type=int, default=None,
                   metavar="K",
                   help="insertion/deletion attempts per sweep "
                        "(default cap//4)")
    p.add_argument("--gcmc-grid", default=None, metavar="MU1:MU2:K",
                   help="adsorption isotherm: K chemical potentials "
                        "(inclusive linspace, or a comma list), "
                        "--chains replicas each, ALL as one compiled "
                        "program (the mu axis rides the chain batch). "
                        "Writes gcmc_isotherm_*.csv. Negative mu needs "
                        "the = form: --gcmc-grid=-9:-6:7")
    p.add_argument("--npt", type=float, default=None, metavar="P",
                   help="constant-pressure mode (bulk; implies --bulk): "
                        "sample the volume at external pressure P — each "
                        "sweep is one smart-MC displacement pass plus one "
                        "lnV volume move (the reference is strictly NVT). "
                        "Prints <rho>/<V>/enthalpy/kappa_T and writes "
                        "npt_*.csv; --gr-bins adds g(r) pooled in reduced "
                        "separation. eqsteps/maxsteps count NPT sweeps")
    p.add_argument("--npt-grid", default=None, metavar="P1:P2:K",
                   help="equation of state: K pressures (inclusive "
                        "linspace, or a comma list) x --chains replicas, "
                        "ALL as one compiled program (the isobar axis "
                        "rides the chain batch). Writes npt_isobar_*.csv")
    p.add_argument("--npt-dlnv", type=float, default=0.1, metavar="D",
                   help="max lnV volume step (default 0.1)")
    p.add_argument("--gibbs", action="store_true",
                   help="Gibbs-ensemble mode (bulk; implies --bulk): "
                        "two coupled boxes exchange volume and "
                        "particles at fixed total N and V — direct "
                        "liquid-vapor coexistence with no imposed P or "
                        "mu. --n is the TOTAL count, --rho the OVERALL "
                        "density; --npt-dlnv sets the volume-exchange "
                        "step. Prints the vapor/liquid branch "
                        "densities and the per-box in-run chemical "
                        "potentials; writes gibbs_*.csv")
    p.add_argument("--gibbs-transfers", type=int, default=None,
                   metavar="K",
                   help="particle-transfer attempts per sweep "
                        "(default N/4)")
    p.add_argument("--gibbs-cap", type=int, default=0, metavar="CAP",
                   help="per-box capacity (static shape; default N, "
                        "i.e. either box may hold everything)")
    p.add_argument("--gibbs-temps", default=None, metavar="T1:T2:K",
                   help="with --gibbs: the whole COEXISTENCE CURVE "
                        "rho_v(T)/rho_l(T) as one compiled program — "
                        "K temperatures (inclusive linspace, or a "
                        "comma list) x --chains replicas each, the T "
                        "axis riding the chain batch. Writes "
                        "gibbs_binodal_*.csv + the binodal panel")
    p.add_argument("--npt-reweight", default=None, metavar="P1:P2:K",
                   help="with --npt-grid: MBAR over the pressure axis — "
                        "the CONTINUOUS equation of state rho(P)/"
                        "kappa_T(P)/H(P) at pressures the run never "
                        "simulated (npt_reweight_*.csv; check the ess "
                        "column before trusting an extrapolation)")
    p.add_argument("--rho", type=float, default=None,
                   help="bulk number density (default 0.1, "
                        "SMC_noMPI_noWall.c:77); sets the box (NVT/GCMC) "
                        "or the starting box (NPT)")
    p.add_argument("--lj-cutoff", type=float, default=None, metavar="RC",
                   help="pair cutoff (default: 3.0 with walls, L/2 bulk "
                        "— the reference conventions). NPT needs "
                        "RC < L0/2 (volume moves reject boxes below "
                        "2*RC); its default is min(2.5, 0.45 L0)")
    p.add_argument("--sk-kmax", type=int, default=0, metavar="K",
                   help="with --temperatures + --reweight: sample the "
                        "in-plane structure factor S(k) up to the (K, K) "
                        "reciprocal-lattice shell and emit the continuous "
                        "S(k; T) surface via MBAR (reweight_sk_*.csv)")
    p.add_argument("--no-trace", action="store_true",
                   help="skip per-sweep E/jj traces (big runs)")
    p.add_argument("--checkpoint", default=None,
                   help="write a full-state checkpoint here at the end")
    p.add_argument("--resume", default=None,
                   help="resume from a full-state checkpoint")
    p.add_argument("--acf-mode", choices=("reference", "circular", "unbiased"),
                   default="reference")
    p.add_argument("--auto-checkpoint", type=int, default=0, metavar="W",
                   help="write the full-state checkpoint every W storage "
                        "windows (failure recovery); also written on "
                        "SIGINT/SIGTERM before a clean stop")
    p.add_argument("--fault-retries", type=int, default=2, metavar="K",
                   help="elastic recovery: tolerate K consecutive device "
                        "faults per storage window, replaying the window "
                        "from an in-memory host snapshot (bitwise "
                        "continuation; 0 disables)")
    p.add_argument("--health-checks", action="store_true",
                   help="per-window device health pass (finite positions, "
                        "bounds, energy drift); warns like boundsCheck")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler device trace here")
    p.add_argument("--sampler", choices=("xla", "pallas", "zsorted", "auto"),
                   default="auto",
                   help="ensemble sweep engine (pallas needs TPU + float32 "
                        "+ chains %% 128 == 0; zsorted = pallas with exact "
                        "z-block skipping — 1.6-1.9x faster at N>=1024, "
                        "confined systems; tuned A and temperature ladders "
                        "ride its (A, T) data rows); single-chain runs "
                        "use xla")
    p.add_argument("--platform", default=None,
                   help="force a JAX backend (e.g. cpu, tpu); default auto")
    p.add_argument("--x64", action="store_true",
                   help="enable float64 (CPU parity runs)")
    p.add_argument("--temperatures", default=None, metavar="T1,T2,...",
                   help="temperature-sweep mode: run chains at EVERY "
                        "listed temperature in one compiled ensemble and "
                        "write tsweep_*.csv (E/acceptance/cv per T); the "
                        "positional T names the run directory")
    p.add_argument("--chains-per-t", type=int, default=16,
                   help="replicas per temperature in --temperatures mode")
    p.add_argument("--pt-exchange", type=_exchange_arg, default=None,
                   metavar="K|auto",
                   help="with --temperatures: parallel tempering — attempt "
                        "replica exchanges between adjacent temperatures "
                        "every K sweeps (on-device swaps; writes pt_*.csv "
                        "with per-pair swap acceptance). 'auto' measures "
                        "the swap acceptance on a short post-"
                        "thermalization probe and picks the interval "
                        "(pt.choose_exchange_interval)")
    p.add_argument("--target-acceptance", type=float, default=None,
                   metavar="ACC",
                   help="auto-tune the proposal mobility A before the run "
                        "to hit this acceptance ratio (bracketed bisection "
                        "on short blocks; production holds the tuned A "
                        "fixed). The reference's A = gamma*T lands at "
                        "~0.97; 0.5-0.7 decorrelates faster")
    p.add_argument("--umbrella", default=None, metavar="Z0MIN:Z0MAX:K",
                   help="umbrella-sampling mode: K harmonic windows "
                        "restraining a tagged particle's z at centers "
                        "spanning the range (inclusive linspace, or a "
                        "comma list); all windows x replicas run in one "
                        "compiled ensemble and MBAR stitches the biased "
                        "histograms into the unbiased adsorption PMF "
                        "F(z) (umbrella_pmf_*.csv) — resolves barriers "
                        "where the equilibrium density vanishes")
    p.add_argument("--umbrella-spring", type=float, default=4.0,
                   metavar="K", help="harmonic bias spring constant")
    p.add_argument("--umbrella-tag", type=int, default=0, metavar="I",
                   help="index of the restrained particle")
    p.add_argument("--umbrella-replicas", type=int, default=4,
                   metavar="R", help="independent chains per window")
    p.add_argument("--umbrella-bins", type=int, default=48, metavar="B",
                   help="z bins of the unbiased PMF grid")
    p.add_argument("--umbrella-exchange", type=int, default=None,
                   metavar="K",
                   help="replica exchange between adjacent windows every "
                        "K sweeps (REUS): configurations percolate along "
                        "the window ladder, decorrelating the restrained "
                        "samples; per-pair swap acceptance reported")
    p.add_argument("--reweight", default=None, metavar="TMIN:TMAX:NUM",
                   help="with --temperatures: MBAR-reweight the ladder's "
                        "energy samples onto this temperature grid "
                        "(inclusive linspace, or a comma list T1,T2,...) "
                        "and write reweight_*.csv with E/cv/free-energy "
                        "curves plus the effective sample size per point")
    p.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                   help="multi-process mode: jax.distributed coordinator "
                        "address (the reference's mpirun model done over "
                        "DCN collectives — one process per host, chains "
                        "split evenly, pooled stats allgathered; requires "
                        "--num-processes/--process-id and a fixed --seed)")
    p.add_argument("--num-processes", type=int, default=None,
                   help="total processes in the --coordinator job")
    p.add_argument("--process-id", type=int, default=None,
                   help="this process's index in the --coordinator job")
    p.add_argument("--global-ladder", action="store_true",
                   help="with --coordinator and --temperatures: run ONE "
                        "ladder whose chain axis shards over ALL processes' "
                        "devices (GSPMD over DCN) instead of complete "
                        "per-process ladders. PT exchanges then swap "
                        "configurations ACROSS processes mid-run (pod-scale "
                        "replica exchange; --pt-exchange auto allowed — the "
                        "probe is computed identically everywhere)")
    p.add_argument("--nonuniform-z", action="store_true",
                   help="non-uniform z voxel binning: layer_depth layers at"
                        " the walls, 3 thick central layers (createZRange,"
                        " SMC.c:1153-1169)")
    return p


def _exchange_arg(v: str):
    """--pt-exchange accepts an integer interval or 'auto'."""
    if v == "auto":
        return v
    return int(v)


def _resolve_sampler(requested: str, cfg, chains: int, n_dev: int = 1,
                     tuned: bool = False, ladder: bool = False) -> str:
    """--sampler auto: the pallas engine needs TPU + float32 and a
    PER-DEVICE chain count that fills the 128-lane width — after
    sharding, each device's kernel sees chains/n_dev chains, so the
    gate must look at the local count, not the global one.

    At N >= 1024 auto upgrades to the zsorted engine (measured 1.6x
    dense at N=1024, 1.9x at N=2048, 1.8x at N=4096 with the
    N-dependent sort cadence — docs/PERF_NOTES.md; dense still wins at
    N<=512) when its one constraint holds: confined (no pbc_z).
    TUNED runs (--target-acceptance) and temperature LADDERS
    (--temperatures, incl. PT) keep the fast engine too: A and T ride
    the ladder-mode (A, T) data rows, so the Mosaic compile key never
    varies with the tuned value or the ladder (probe: zsorted ladder
    1.76x the dense ladder at N=1024 — scripts/probe_ladder_zsorted.py).
    Multi-device runs use the shard_map wrapper like the dense
    engine. Beyond VMEM capacity (N>~10k) the zsorted wrapper further
    auto-routes to the HBM-streamed kernel."""
    del tuned, ladder   # both ride the (A, T) data rows — no downgrade
    if requested != "auto":
        if requested == "zsorted" and cfg.reference_noise:
            raise SystemExit(
                "--sampler zsorted cannot honor reference_noise=True: "
                "the engine's z-sorted move order permutes the "
                "bug-compatible noise-pair structure, so it does NOT "
                "reproduce the C reference's F0-biased ensemble "
                "(measured +0.45 energy offset — docs/DEVIATIONS.md A8, "
                "docs/EVIDENCE_ZSORTED_NOISE.json). Use --sampler "
                "pallas/xla for bug-compatible parity runs, or the "
                "default correct i.i.d. noise with zsorted.")
        return requested
    import jax

    local = chains // n_dev if (n_dev > 1 and chains % n_dev == 0) \
        else chains
    if not (jax.default_backend() == "tpu" and cfg.dtype == "float32"
            and local % 128 == 0):
        return "xla"
    if cfg.n >= 1024 and not cfg.pbc_z and not cfg.reference_noise:
        # reference_noise runs stay on the dense engine: its fixed-label
        # move order preserves the F0 pair semantics the mode exists for
        return "zsorted"
    return "pallas"


def _prompt_missing(args) -> None:
    """Interactive fallback when positionals are omitted — the reference
    asks via scanf when argc != 5 (main.c:20-30)."""
    prompts = (
        ("eqsteps", int, "Enter the number of equilibration steps: "),
        ("maxsteps", int, "Enter the number of simulation steps: "),
        ("numdata", int, "Enter the number of microstates to analyze: "),
        ("temperature", float,
         "Enter the temperature in normalized units: "),
    )
    for name, cast, text in prompts:
        if getattr(args, name) is None:
            print(text, end="", flush=True)
            setattr(args, name, cast(input()))


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    _prompt_missing(args)

    import jax

    if os.environ.get("TPU_SMC_PALLAS_INTERPRET") == "1":
        # Test escape: run every pallas kernel through the interpreter
        # so the kernel engines (dense/zsorted/stream) can be driven
        # end-to-end through the CLI on CPU. Interpret-mode PRNG is
        # lane-replicated (CLAUDE.md), so only bitwise engine-vs-engine
        # contracts are meaningful under this flag.
        if args.global_ladder and (args.num_processes or 1) > 1 \
                and args.sampler in ("pallas", "zsorted"):
            # Fail fast BEFORE the coordinator handshake: interpret-mode
            # pallas synchronizes the mesh devices with an IN-PROCESS
            # threading.Barrier (jax interpret_pallas_call), so a global
            # mesh spanning OS processes deadlocks at the first kernel
            # call — each process's barrier waits forever for the other
            # process's devices. Structural, not fixable here.
            sys.exit(
                "TPU_SMC_PALLAS_INTERPRET cannot span OS processes: "
                "interpret-mode pallas uses an in-process barrier, so a "
                "--global-ladder mesh over --num-processes > 1 would "
                "deadlock at the first kernel call. Drive the kernel "
                "engines multi-device in ONE process (XLA_FLAGS="
                "--xla_force_host_platform_device_count=K), or use "
                "--sampler xla for cross-process CPU runs.")
        from contextlib import ExitStack

        from jax.experimental.pallas import tpu as _pltpu

        _stack = ExitStack()
        _stack.enter_context(_pltpu.force_tpu_interpret_mode())

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.x64 or args.dtype == "float64":
        jax.config.update("jax_enable_x64", True)

    # Multi-process replica mode (SURVEY §5.8: one chain-set per OS
    # process, zero inter-chain traffic; here jax.distributed supplies
    # the global runtime and one end-of-run DCN collective replaces the
    # reference's offline per-rank-file aggregation). Must initialize
    # BEFORE any backend use.
    nproc, proc_id = 1, 0
    if args.global_ladder and not args.coordinator:
        # Fail fast: single-process, the flag would be a silent no-op —
        # a forgotten --coordinator must not masquerade as a pod run.
        sys.exit("--global-ladder needs --coordinator (it spans the "
                 "processes of a jax.distributed job); single-process "
                 "ladders already shard over all local devices")
    if args.coordinator:
        # All argument validation BEFORE initialize(): the coordinator
        # handshake blocks until every process connects, so a usage error
        # must fail fast, not hang the job.
        if args.num_processes is None or args.process_id is None:
            sys.exit("--coordinator needs --num-processes and --process-id")
        if args.resume:
            sys.exit("--coordinator with --resume is not supported; resume "
                     "single-process, then restart the multi-process run "
                     "from its last_state")
        if args.global_ladder and not args.temperatures:
            sys.exit("--global-ladder needs a --temperatures ladder")
        if args.temperatures and args.global_ladder:
            # ONE ladder spanning all processes: nothing splits here —
            # the chain axis shards over the union of devices after
            # initialize() (device count is unknown until then).
            pass
        elif args.temperatures:
            # Multi-process ladders: each process runs COMPLETE replica
            # ladders (all temperatures), exchanges stay process-local,
            # and the replica axis pools at the end.
            if args.pt_exchange == "auto":
                sys.exit("--coordinator ladders need a fixed "
                         "--pt-exchange interval (per-process probes "
                         "could choose different intervals) unless "
                         "--global-ladder (one shared probe); probe "
                         "single-process first, then pass the value")
            if args.chains_per_t < args.num_processes \
                    or args.chains_per_t % args.num_processes:
                sys.exit(f"--chains-per-t {args.chains_per_t} must "
                         f"divide evenly over {args.num_processes} "
                         "processes")
        elif args.chains < args.num_processes \
                or args.chains % args.num_processes:
            sys.exit(f"--chains {args.chains} must divide evenly over "
                     f"{args.num_processes} processes")
        if args.seed is None:
            sys.exit("--coordinator needs an explicit --seed (all "
                     "processes must agree on the key stream)")
        from .ensemble import init_distributed

        proc_id = init_distributed(args.coordinator, args.num_processes,
                                   args.process_id)
        nproc = jax.process_count()
        local_desc = (
            "a device shard of the ONE global ladder"
            if args.temperatures and args.global_ladder
            else f"{args.chains_per_t // nproc} of {args.chains_per_t} "
                 "replica ladders" if args.temperatures
            else f"{args.chains // nproc} of {args.chains} chains")
        print(f"Multi-process run: process {proc_id}/{nproc}, "
              f"{local_desc} locally "
              f"({len(jax.local_devices())} local devices)")

    from . import io as smcio
    from .config import RunParams, SMCConfig
    from .driver import ObservableOptions, simulate
    from .state import init_chain_state
    from .system import build_walls, fcc_lattice

    resume_state = None
    # GCMC/NPT checkpoints carry their own extra state (active mask /
    # fluctuating box + dedicated key streams); those branches load them
    # themselves, and the run config is built from the CLI args like a
    # fresh run.
    _gcmc_mode = args.gcmc is not None or args.gcmc_grid
    _npt_mode = args.npt is not None or args.npt_grid
    if (_npt_mode or args.gibbs) and not args.bulk:
        print(f"Note: {'--npt' if _npt_mode else '--gibbs'} is a bulk "
              "mode (volume moves rescale cubic periodic boxes); "
              "--bulk implied.")
        args.bulk = True
    if args.resume and not (_gcmc_mode or _npt_mode or args.gibbs):
        # The checkpoint's config is authoritative for a resumed chain —
        # simulating a [N_ck] state under CLI-sized physics would be wrong.
        resume_state, cfg = smcio.load_checkpoint(args.resume)
        if cfg.n != args.n or cfg.temperature != args.temperature:
            print(f"Note: resuming with the checkpoint's config "
                  f"(N={cfg.n}, T={cfg.temperature}); CLI values ignored.")
    else:
        gkw = {} if args.gamma is None else {"gamma": args.gamma}
        if args.nonuniform_z:
            gkw["nonuniform_z"] = True
        if args.lj_cutoff is not None:
            gkw["lj_cutoff"] = args.lj_cutoff
        if args.lca_time is not None:
            gkw["lca_time"] = args.lca_time
        if args.storage_time is not None:
            gkw["storage_time"] = args.storage_time
        if args.rho is not None:
            if not args.bulk:
                sys.exit("--rho sets the bulk box; it needs --bulk "
                         "(the slab geometry is fixed by --n/--m)")
            gkw["rho"] = args.rho
        if _npt_mode or args.gibbs:
            # constant-P/Gibbs runs equilibrate against the true
            # mechanical pressure: truncated-and-shifted potential, and
            # a fixed cutoff with compression headroom below the
            # starting box (npt.py / gibbs.py)
            gkw["lj_shift"] = True
            if args.gibbs:
                # --rho is the OVERALL density; each of the two boxes
                # starts with n/2 particles at that density, so the
                # per-box side is (n / (2 rho))^(1/3) — which is what
                # SMCConfig.bulk computes from a doubled rho
                gkw["rho"] = 2.0 * gkw.get("rho", 0.1)
            l0 = (args.n / gkw.get("rho", 0.1)) ** (1.0 / 3.0)
            gkw.setdefault("lj_cutoff", min(2.5, 0.45 * l0))
        if args.bulk:
            cfg = SMCConfig.bulk(n=args.n, temperature=args.temperature,
                                 dtype=args.dtype, **gkw)
        else:
            cfg = SMCConfig.for_n(args.n, temperature=args.temperature,
                                  dtype=args.dtype, m=args.m, **gkw)
    if cfg.dtype == "float64":
        jax.config.update("jax_enable_x64", True)
    params = RunParams(args.eqsteps, args.maxsteps, args.numdata)

    now = time.localtime()
    print(f"\n\n----  Starting the simulation at local time "
          f"{now.tm_hour:02d}:{now.tm_min:02d}  ----\n")

    d = smcio.run_dir(cfg, args.data_dir)
    wall_k = max(1, args.wall_realizations)
    w_k = None
    if wall_k > 1:
        # Quenched wall-disorder ensembles: beyond-reference — the C
        # code's wall is frozen at srand(42) for every run and rank
        # (SMC.c:477), so disorder averaging is impossible there.
        if args.bulk:
            sys.exit("--wall-realizations: bulk mode has no walls")
        if args.temperatures:
            if nproc > 1:
                sys.exit("--wall-realizations ladders are single-process "
                         "(use more chains-per-t instead)")
            if args.chains_per_t < wall_k or args.chains_per_t % wall_k:
                sys.exit(f"--chains-per-t {args.chains_per_t} must be a "
                         f"positive multiple of --wall-realizations "
                         f"{wall_k}")
        if args.resume:
            sys.exit("--wall-realizations cannot be combined with --resume "
                     "(restart the disorder run with the same seeds "
                     "instead)")
        if args.target_acceptance:
            sys.exit("--wall-realizations does not support "
                     "--target-acceptance yet (one tuned A would have to "
                     "serve every realization)")
        if not args.temperatures and (args.chains < wall_k
                                      or args.chains % wall_k):
            sys.exit(f"--chains {args.chains} must be a positive multiple "
                     f"of --wall-realizations {wall_k}")
        from .system import build_wall_ensemble

        w_k, x0, ym = build_wall_ensemble(cfg, wall_k,
                                          base_seed=args.wall_seed)
        w_np = w_k[0]   # seed-chain init; per-chain tables attach below
    else:
        w_np, x0, ym = build_walls(cfg, seed=args.wall_seed)
    if proc_id == 0:   # shared run dir: one writer for the shared files
        smcio.write_wall_csv(d, cfg, x0, ym)

    seed = args.seed if args.seed is not None else int(time.time())
    key = jax.random.key(seed)

    if args.reweight and not args.temperatures:
        print("Note: --reweight needs the --temperatures ladder; ignored.")
    if args.npt_reweight and not args.npt_grid:
        print("Note: --npt-reweight needs the --npt-grid isobar family; "
              "ignored.")
        args.npt_reweight = None
    if args.sk_kmax and not (args.temperatures and args.reweight):
        # don't silently pay the per-gather S(k) sampling for output
        # nothing will consume
        print("Note: --sk-kmax needs --temperatures AND --reweight; "
              "ignored.")
        args.sk_kmax = 0

    if args.gcmc is not None or args.gcmc_grid:
        from .gcmc import box_volume, simulate_gcmc, write_gcmc_csv

        if args.temperatures or args.umbrella or _npt_mode or args.gibbs:
            sys.exit("--gcmc is its own run mode (no --temperatures/"
                     "--umbrella/--npt/--gibbs)")
        if args.gcmc is not None and args.gcmc_grid:
            sys.exit("--gcmc and --gcmc-grid are exclusive")
        if nproc > 1:
            sys.exit("--gcmc is single-process (scale with --chains)")
        if wall_k > 1:
            sys.exit("--gcmc does not combine with --wall-realizations "
                     "yet")
        if args.target_acceptance:
            sys.exit("--gcmc does not support --target-acceptance yet")
        cap = args.gcmc_cap or 2 * cfg.n
        n_ch = args.chains
        state0 = None
        if args.resume:
            from .gcmc import load_gcmc_checkpoint

            if args.gcmc_grid:
                sys.exit("--gcmc-grid does not support --resume")
            # the checkpoint's config is authoritative, like every other
            # resume path (cli resume rule: simulating a restored state
            # under CLI-sized physics would be wrong)
            state0, ck_cfg = load_gcmc_checkpoint(args.resume)
            if (ck_cfg.n != cfg.n
                    or ck_cfg.temperature != cfg.temperature
                    or ck_cfg.dtype != cfg.dtype):
                print(f"Note: resuming with the checkpoint's config "
                      f"(N={ck_cfg.n}, T={ck_cfg.temperature}, "
                      f"{ck_cfg.dtype}); CLI values ignored.")
            cfg = ck_cfg
            d = smcio.run_dir(cfg, args.data_dir)
            n_ch, cap = state0.r.shape[0], state0.r.shape[1]
            print(f"Resuming GCMC from {args.resume}: {n_ch} chain(s), "
                  f"capacity {cap} (bitwise continuation)")
        for flag, name in ((args.widom, "--widom"),
                           (args.ptensor_bins, "--ptensor-bins")):
            if flag:
                print(f"Note: {name} does not apply to GCMC runs; "
                      "ignored.")
        if args.gcmc_grid:
            if args.z_bins:
                print("Note: --z-bins is not accumulated in isotherm "
                      "mode (per-mu states differ); ignored.")
            if args.checkpoint:
                print("Note: --checkpoint is not supported in isotherm "
                      "mode; ignored.")
            return _run_gcmc_isotherm(args, cfg, params, key, d, cap)
        if cfg.pbc_z and cfg.proposal_a < 1e-4:
            print("Note: the bulk reference mobility (A = 4e-8, "
                  "SMC_noMPI_noWall.c) freezes displacements — GCMC "
                  "mixing then comes entirely from insertion/deletion "
                  "turnover. Pass --gamma (e.g. --gamma 0.05) for "
                  "fluid-scale displacement moves.")
        print(f"Grand-canonical MC: mu = {args.gcmc:g}, capacity {cap}, "
              f"{n_ch} chain(s), "
              f"{args.gcmc_exchanges or max(1, cap // 4)} exchange "
              f"attempts/sweep (V = {box_volume(cfg):g})")
        gstate, gres = simulate_gcmc(
            cfg, args.gcmc, cap,
            0 if state0 is not None else params.eqsteps,
            params.maxsteps, key,
            n_chains=n_ch, n_exchange=args.gcmc_exchanges,
            z_bins=args.z_bins, gr_bins=args.gr_bins, state0=state0)
        print("\n###  Grand-canonical results  ###")
        print(f"Mean N: {gres.mean_n:f} ± {gres.err_n:f} "
              f"(density {gres.mean_density:g})")
        print(f"Mean potential energy: {gres.mean_energy:f}")
        print(f"Acceptance (displace/insert/delete): "
              f"{gres.disp_acceptance:0.4f} / "
              f"{gres.insert_acceptance:0.4f} / "
              f"{gres.delete_acceptance:0.4f}")
        if np.isfinite(gres.kappa_t):
            print(f"Isothermal compressibility (number fluctuations): "
                  f"kappa_T = {gres.kappa_t:0.6g}  "
                  f"(ideal-gas 1/(rho T) = "
                  f"{1.0 / max(gres.mean_density * cfg.temperature, 1e-12):0.6g})")
        if np.isfinite(gres.mu_ex) and gres.mean_density > 0:
            mu_back = (cfg.temperature * np.log(gres.mean_density)
                       + gres.mu_ex)
            print(f"Self-consistency: in-run Widom mu_ex = "
                  f"{gres.mu_ex:0.4f}, T ln(rho) + mu_ex = "
                  f"{mu_back:0.4f} (imposed mu {args.gcmc:g})")
        path = write_gcmc_csv(d, cfg, args.gcmc, gres)
        print(f"Written to {path}")
        if gres.zprofile is not None and args.z_bins:
            dz = cfg.box_lz / args.z_bins
            centers = -cfg.box_lz / 2 + dz * (np.arange(args.z_bins) + 0.5)
            zp = smcio.write_profile_csv(d, cfg, "gcmc_zprofile",
                                         centers, gres.zprofile,
                                         "z, density")
            print(f"Density profile written to {zp}")
        if gres.gr is not None and args.gr_bins:
            rmax = (cfg.lj_cutoff if cfg.lj_cutoff < cfg.box_l / 2
                    else cfg.box_l / 2)
            centers = (np.arange(args.gr_bins) + 0.5) * rmax / args.gr_bins
            gp = smcio.write_profile_csv(d, cfg, "gcmc_gr", centers,
                                         gres.gr, "r, g")
            print(f"g(r) written to {gp}")
        if args.checkpoint:
            from .gcmc import save_gcmc_checkpoint

            ck = save_gcmc_checkpoint(args.checkpoint, gstate, cfg)
            print(f"Full GCMC state checkpointed to {ck}")
        return 0

    if _npt_mode:
        from .npt import (load_npt_checkpoint, save_npt_checkpoint,
                          simulate_npt, write_npt_csv)

        if args.temperatures or args.umbrella or args.gibbs:
            sys.exit("--npt is its own run mode (no --temperatures/"
                     "--umbrella/--gibbs)")
        if args.npt is not None and args.npt_grid:
            sys.exit("--npt and --npt-grid are exclusive")
        if nproc > 1:
            sys.exit("--npt is single-process (scale with --chains)")
        if args.target_acceptance:
            sys.exit("--npt does not support --target-acceptance yet")
        for flag, name in ((args.widom, "--widom"),
                           (args.ptensor_bins, "--ptensor-bins"),
                           (args.z_bins, "--z-bins")):
            if flag:
                print(f"Note: {name} does not apply to NPT runs; "
                      "ignored.")
        if cfg.proposal_a < 1e-4:
            print("Note: the bulk reference mobility (A = 4e-8, "
                  "SMC_noMPI_noWall.c) freezes displacements — NPT "
                  "mixing then comes entirely from volume moves. Pass "
                  "--gamma (e.g. --gamma 0.05) for fluid-scale "
                  "displacement moves.")
        n_ch = args.chains
        state0 = None
        if args.resume:
            if args.npt_grid:
                sys.exit("--npt-grid does not support --resume")
            state0, ck_cfg = load_npt_checkpoint(args.resume)
            if (ck_cfg.n != cfg.n
                    or ck_cfg.temperature != cfg.temperature
                    or ck_cfg.dtype != cfg.dtype):
                print(f"Note: resuming with the checkpoint's config "
                      f"(N={ck_cfg.n}, T={ck_cfg.temperature}, "
                      f"{ck_cfg.dtype}); CLI values ignored.")
            cfg = ck_cfg
            d = smcio.run_dir(cfg, args.data_dir)
            n_ch = state0.r.shape[0]
            print(f"Resuming NPT from {args.resume}: {n_ch} chain(s) "
                  "(bitwise continuation)")
        if args.npt_grid:
            return _run_npt_isobars(args, cfg, params, key, d)
        mesh = _auto_chain_mesh(n_ch, "NPT")
        v_floor = (2.0 * cfg.lj_cutoff) ** 3
        print(f"Constant-pressure MC: P = {args.npt:g}, {n_ch} "
              f"chain(s), dlnV {args.npt_dlnv:g}, rc {cfg.lj_cutoff:g} "
              f"(hard volume floor {v_floor:g}), starting box "
              f"{cfg.box_l:g}^3")
        nstate, nres = simulate_npt(
            cfg, args.npt,
            0 if state0 is not None else params.eqsteps,
            params.maxsteps, key, n_chains=n_ch, dlnv=args.npt_dlnv,
            gr_bins=args.gr_bins, state0=state0, mesh=mesh)
        print("\n###  Constant-pressure results  ###")
        print(f"Mean density: {nres.mean_density:f} ± "
              f"{nres.err_density:f}  (<V> = {nres.mean_v:f})")
        print(f"Mean potential energy: {nres.mean_energy:f}  "
              f"(configurational enthalpy {nres.enthalpy:f})")
        if np.isfinite(nres.kappa_t):
            ideal = 1.0 / max(nres.mean_density * cfg.temperature, 1e-12)
            print(f"Isothermal compressibility (volume fluctuations): "
                  f"kappa_T = {nres.kappa_t:0.6g}  "
                  f"(ideal-gas 1/(rho T) = {ideal:0.6g})")
        print(f"Acceptance (displace/volume): "
              f"{nres.disp_acceptance:0.4f} / "
              f"{nres.vol_acceptance:0.4f}")
        path = write_npt_csv(d, cfg, args.npt, nres)
        print(f"Written to {path}")
        if args.checkpoint:
            ck = save_npt_checkpoint(args.checkpoint, nstate, cfg)
            print(f"Full NPT state checkpointed to {ck}")
        return 0

    if args.gibbs:
        from .gibbs import (load_gibbs_checkpoint, save_gibbs_checkpoint,
                            simulate_gibbs, write_gibbs_csv)

        if args.temperatures or args.umbrella or _npt_mode:
            sys.exit("--gibbs is its own run mode")
        if nproc > 1:
            sys.exit("--gibbs is single-process (scale with --chains)")
        if args.target_acceptance:
            sys.exit("--gibbs does not support --target-acceptance yet")
        for flag, name in ((args.widom, "--widom"),
                           (args.ptensor_bins, "--ptensor-bins"),
                           (args.z_bins, "--z-bins"),
                           (args.gr_bins, "--gr-bins")):
            if flag:
                print(f"Note: {name} does not apply to Gibbs runs; "
                      "ignored.")
        if cfg.proposal_a < 1e-4:
            print("Note: the bulk reference mobility freezes "
                  "displacements; pass --gamma (e.g. --gamma 0.05).")
        n_ch = args.chains
        gibbs_state0 = None
        if args.gibbs_temps:
            if args.resume:
                sys.exit("--gibbs-temps does not support --resume")
            return _run_gibbs_binodal(args, cfg, params, key, d)
        if args.resume:
            gibbs_state0, ck_cfg = load_gibbs_checkpoint(args.resume)
            if (ck_cfg.n != cfg.n
                    or ck_cfg.temperature != cfg.temperature
                    or ck_cfg.dtype != cfg.dtype):
                print(f"Note: resuming with the checkpoint's config "
                      f"(N={ck_cfg.n}, T={ck_cfg.temperature}, "
                      f"{ck_cfg.dtype}); CLI values ignored.")
            cfg = ck_cfg
            d = smcio.run_dir(cfg, args.data_dir)
            n_ch = gibbs_state0.r.shape[0]
            print(f"Resuming Gibbs from {args.resume}: {n_ch} "
                  "chain(s) (bitwise continuation)")
        cap = (gibbs_state0.r.shape[2] if gibbs_state0 is not None
               else args.gibbs_cap or cfg.n)
        n_tr = args.gibbs_transfers or max(1, cfg.n // 4)
        rho_all = cfg.n / (2.0 * cfg.box_l ** 3)
        print(f"Gibbs-ensemble MC: N = {cfg.n} total, overall rho = "
              f"{rho_all:g}, per-box start {cfg.box_l:g}^3, capacity "
              f"{cap}/box, {n_tr} transfers/sweep, dlnV "
              f"{args.npt_dlnv:g}, {n_ch} chain(s)")
        gstate, gres = simulate_gibbs(
            cfg, 0 if gibbs_state0 is not None else params.eqsteps,
            params.maxsteps, key, cap,
            n_chains=n_ch, dlnv=args.npt_dlnv, n_transfer=n_tr,
            state0=gibbs_state0, mesh=_auto_chain_mesh(n_ch, "Gibbs"))
        print("\n###  Gibbs-ensemble results  ###")
        print(f"Branch densities (sorted per sweep): vapor "
              f"{gres.rho_lo:f} ± {gres.err_lo:f}, liquid "
              f"{gres.rho_hi:f} ± {gres.err_hi:f}")
        if gres.rho_hi > 2.0 * gres.rho_lo:
            print("Two-phase: the boxes bifurcated (coexistence).")
        else:
            print("One-phase: densities coincide (supercritical or "
                  "single-phase state point).")
        print(f"In-run chemical potentials (T ln rho + Widom mu_ex "
              f"from transfer ghosts): box1 {gres.mu_box[0]:0.4f}, "
              f"box2 {gres.mu_box[1]:0.4f}")
        print(f"Acceptance (displace/volume/transfer): "
              f"{gres.disp_acceptance:0.4f} / "
              f"{gres.vol_acceptance:0.4f} / "
              f"{gres.transfer_acceptance:0.4f}")
        path = write_gibbs_csv(d, cfg, gres)
        print(f"Written to {path}")
        if args.checkpoint:
            ck = save_gibbs_checkpoint(args.checkpoint, gstate, cfg)
            print(f"Full Gibbs state checkpointed to {ck}")
        return 0

    if args.umbrella:
        from .umbrella import (parse_centers, simulate_umbrella,
                               umbrella_pmf, write_umbrella_csv)

        if args.temperatures:
            sys.exit("--umbrella and --temperatures are separate run "
                     "modes")
        if args.bulk:
            sys.exit("--umbrella needs the confined geometry (walls)")
        if nproc > 1:
            sys.exit("--umbrella is single-process (scale with "
                     "--umbrella-replicas)")
        if wall_k > 1:
            sys.exit("--umbrella does not combine with "
                     "--wall-realizations yet")
        if args.resume:
            sys.exit("--umbrella does not support --resume yet (rerun "
                     "the windows; they rethermalize inside their own "
                     "restraints)")
        if args.target_acceptance:
            sys.exit("--umbrella does not support --target-acceptance")
        if args.chains > 1:
            sys.exit("--umbrella sizes its own ensemble "
                     "(windows x --umbrella-replicas); drop --chains")
        for flag, name in ((args.widom, "--widom"),
                           (args.ptensor_bins, "--ptensor-bins"),
                           (args.gcmc_grid, "--gcmc-grid")):
            if flag:
                print(f"Note: {name} does not apply to umbrella runs; "
                      "ignored.")
        centers = parse_centers(args.umbrella)
        print(f"Umbrella sampling: {len(centers)} windows x "
              f"{args.umbrella_replicas} replicas, spring "
              f"{args.umbrella_spring}, tagged particle "
              f"{args.umbrella_tag} (one compiled ensemble)")
        r0 = smcio.load_last_state(d, cfg)
        if r0 is None:
            r0 = fcc_lattice(cfg)
        lstate, ures = simulate_umbrella(
            cfg, params, centers, key,
            k_spring=args.umbrella_spring, tag=args.umbrella_tag,
            replicas=args.umbrella_replicas, r0=r0, w=w_np,
            exchange_interval=args.umbrella_exchange)
        ures = umbrella_pmf(ures, n_bins=args.umbrella_bins, seed=seed)
        print("\n###  Umbrella windows  ###")
        print("z0        f_window   acceptance")
        for i, z0 in enumerate(ures.centers):
            print(f"{z0:8.3f}  {ures.window_f[i]:9.4f}   "
                  f"{ures.acceptance[i]:0.4f}")
        if ures.swap_acceptance is not None:
            print("\nWindow-exchange swap acceptance (REUS, every "
                  f"{ures.exchange_interval} sweeps):")
            for i in range(len(ures.swap_acceptance)):
                print(f"  z0 {ures.centers[i]:0.2f} <-> "
                      f"{ures.centers[i + 1]:0.2f}: "
                      f"{ures.swap_acceptance[i]:0.3f}")
        path = write_umbrella_csv(d, cfg, ures)
        fin = np.isfinite(ures.pmf)
        print(f"\nPMF resolved over {fin.sum()}/{len(fin)} bins "
              f"(z in [{ures.z_grid[fin].min():0.2f}, "
              f"{ures.z_grid[fin].max():0.2f}]); barrier "
              f"{np.nanmax(ures.pmf):0.3f} T-units")
        print(f"Written to {path}")
        if args.checkpoint:
            ck = smcio.save_checkpoint(args.checkpoint, lstate, cfg)
            print(f"Full ensemble state checkpointed to {ck}")
        return 0

    if args.temperatures:
        from .tsweep import simulate_temperature_sweep, write_tsweep_csv

        temps = [float(v) for v in args.temperatures.split(",")]
        cpt = args.chains_per_t
        # Tuning must use the PRE-salt key: every process must derive
        # the SAME per-level mobility, or the pooled statistics would
        # mix chains run at different proposal distributions (review r3)
        common_key = key
        global_ladder = nproc > 1 and args.global_ladder
        if nproc > 1 and not global_ladder:
            cpt //= nproc
            # distinct per-process replica streams (ladders are
            # independent; statistical pooling at the end)
            key = jax.random.fold_in(key, 0xD150 + proc_id)
        # global_ladder: every process keeps the COMMON key and the full
        # chains_per_t — all of them trace the identical global program,
        # sharded over the union of devices below.
        ladder_c = len(temps) * cpt
        # Validate the reweight grid BEFORE the (potentially hours-long)
        # ladder runs — a malformed spec must fail now, not at the end.
        rw_grid = None
        if args.reweight:
            from .reweight import parse_t_grid

            rw_grid = parse_t_grid(args.reweight)
        # Multi-device hosts: shard the flat ladder-chain axis, exactly
        # like the ensemble path (XLA engine: GSPMD incl. the PT
        # exchange collectives; pallas engine: shard_map sweeps).
        lmesh = None
        if global_ladder:
            # ONE mesh over every process's devices: sweeps stay local
            # to each shard, the PT exchange's configuration gathers
            # become DCN collectives (pod-scale replica exchange).
            from .ensemble import make_mesh

            n_dev = len(jax.devices())
            if ladder_c % n_dev:
                sys.exit(f"--global-ladder: {ladder_c} ladder chains "
                         f"(= {len(temps)} temps x {cpt}) must divide "
                         f"over the job's {n_dev} devices")
            lmesh = make_mesh(n_dev, axis_names=("chains",), local=False)
            print(f"Global ladder: {ladder_c} chains sharded over "
                  f"{n_dev} devices across {nproc} processes")
        else:
            n_dev = (len(jax.local_devices()) if nproc > 1
                     else len(jax.devices()))
            if n_dev > 1 and ladder_c % n_dev == 0:
                from .ensemble import make_mesh

                lmesh = make_mesh(n_dev, axis_names=("chains",),
                                  local=nproc > 1)
                print(f"Sharding {ladder_c} ladder chains over "
                      f"{n_dev} {'local ' if nproc > 1 else ''}devices")
            elif n_dev > 1:
                print(f"Note: {ladder_c} ladder chains do not divide over "
                      f"{n_dev} devices; running on one device")
        tsampler = _resolve_sampler(args.sampler, cfg, ladder_c,
                                    n_dev=n_dev if lmesh is not None else 1,
                                    ladder=True)
        w_ladder = w_np
        if wall_k > 1:
            # slot-indexed per-chain walls: realization = replica index
            # group, IDENTICAL across levels — PT swaps travel the
            # temperature axis within a replica column, so a swap never
            # crosses realizations (pt.exchange_step)
            g_rep = cpt // wall_k
            w_ladder = np.tile(np.repeat(w_k, g_rep, axis=0),
                               (len(temps), 1, 1))
            print(f"Quenched wall disorder ladder: {wall_k} realizations "
                  f"x {g_rep} replicas per level (wall seeds "
                  f"{args.wall_seed}..{args.wall_seed + wall_k - 1})")
        # zsorted works for ladders since round 3 (cont.): the (A, T)
        # ladder rows are chain-indexed, untouched by the engine's
        # particle sorts; measured 1.76x the dense ladder at N=1024, so
        # `auto` routes big ladders there too.
        print(f"Temperature sweep: {len(temps)} temperatures x "
              f"{cpt} chains, one compiled ensemble "
              f"({tsampler} engine)")
        a_per_t = None
        if args.target_acceptance:
            from .tuning import tune_mobility_ladder

            lt = tune_mobility_ladder(
                cfg, temps, jax.random.fold_in(common_key, 0x7E0), w=w_np,
                chains_per_t=cpt,
                target=args.target_acceptance, sampler=tsampler)
            a_per_t = lt.a_per_t
            print(f"Auto-tuned per-level mobility "
                  f"({lt.sweeps_used} tuning sweeps):")
            for i, t in enumerate(lt.temps):
                print(f"  T {t:0.3f}: A = {lt.a_per_t[i]:0.4g} "
                      f"(gamma = {lt.gamma_per_t[i]:0.3g}, "
                      f"acceptance {lt.acceptance[i]:0.3f})")
        lstate0 = None
        if resume_state is not None:
            lstate0 = resume_state
            print(f"Resumed ladder state from {args.resume} "
                  f"({int(np.asarray(resume_state.sweeps).reshape(-1)[0])} "
                  "sweeps done); chains are thermalized — consider "
                  "eqsteps 0.")
        if args.pt_exchange:
            from .pt import simulate_parallel_tempering, write_pt_csv

            if args.pt_exchange == "auto":
                print("Parallel tempering: auto exchange interval "
                      "(choosing from a post-thermalization probe)")
            else:
                print(f"Parallel tempering: exchange attempts every "
                      f"{args.pt_exchange} sweeps")
            lstate, pt_res = simulate_parallel_tempering(
                cfg, params, temps, key, chains_per_t=cpt,
                exchange_interval=args.pt_exchange, w=w_ladder,
                sampler=tsampler, a_per_t=a_per_t, mesh=lmesh,
                state0=lstate0,
                gr_bins=args.gr_bins, z_bins=args.z_bins,
                sk_kmax=args.sk_kmax, widom_k=args.widom,
                ptensor_bins=args.ptensor_bins)
            if nproc > 1 and not global_ladder:
                from .pt import pool_pt_across_processes

                pt_res = pool_pt_across_processes(pt_res, cfg)
            # global_ladder: results are already global — every process
            # computed the full-ladder statistics from allgathered
            # samples (ensemble.fetch); nothing to pool.
            res = pt_res.tsweep
            if proc_id == 0:
                pt_path = write_pt_csv(d, cfg, pt_res)
            if args.pt_exchange == "auto":
                pa = ", ".join(f"{v:0.3f}"
                               for v in pt_res.probe_acceptance)
                print(f"Auto-chosen exchange interval: "
                      f"{pt_res.exchange_interval} sweeps "
                      f"(probe swap acceptance [{pa}])")
            print("\n###  Replica-exchange swap acceptance  ###")
            for i in range(len(pt_res.pair_t_lo)):
                print(f"T {pt_res.pair_t_lo[i]:0.3f} <-> "
                      f"{pt_res.pair_t_hi[i]:0.3f}: "
                      f"{pt_res.swap_acceptance[i]:0.3f} "
                      f"({pt_res.swap_attempts[i]} attempts)")
            if proc_id == 0:
                print(f"Written to {pt_path}")
        else:
            lstate, res = simulate_temperature_sweep(
                cfg, params, temps, key, chains_per_t=cpt,
                w=w_ladder, sampler=tsampler, a_per_t=a_per_t, mesh=lmesh,
                state0=lstate0,
                gr_bins=args.gr_bins, z_bins=args.z_bins,
                sk_kmax=args.sk_kmax, widom_k=args.widom,
                ptensor_bins=args.ptensor_bins)
            if nproc > 1 and not global_ladder:
                # pooled replica axis: every process gets the full-R
                # statistics (reweighting below then sees P x samples)
                from .tsweep import pool_tsweep_across_processes

                res = pool_tsweep_across_processes(res, cfg)
        if args.checkpoint:
            if global_ladder:
                # ONE global state: gather the cross-process shards and
                # write a single suffix-free checkpoint from process 0
                # (resumable single-process or re-sharded).
                from .ensemble import gather_global_state

                lstate_h = gather_global_state(lstate)
                if proc_id == 0:
                    ck_path = smcio.save_checkpoint(
                        args.checkpoint, lstate_h, cfg)
                    print(f"Full ladder state checkpointed to {ck_path}")
            else:
                ck_path = smcio.save_checkpoint(
                    _ck_with_suffix(args.checkpoint,
                                    f".p{proc_id}" if nproc > 1 else ""),
                    lstate, cfg)
                print(f"Full ladder state checkpointed to {ck_path}")
        if proc_id == 0:
            path = write_tsweep_csv(d, cfg, res)
        if res.sweeps_per_second is not None:
            # pooled results sum the per-process rates (cpt was split
            # per process); a --global-ladder run counts its full
            # sharded ladder once
            n_ch = len(temps) * cpt * (1 if global_ladder else nproc)
            print(f"\n\nAggregate throughput: "
                  f"{res.sweeps_per_second:,.0f} sweeps/s across "
                  f"{n_ch} chains"
                  + (f" on {nproc} processes" if nproc > 1 else ""))
        print("\n###  Temperature sweep results  ###")
        print("T        E_mean      +-err     acc      cv")
        for i, t in enumerate(res.temps):
            print(f"{t:0.3f}  {res.mean_energy[i]:10.4f}  "
                  f"{res.err_energy[i]:8.4f}  {res.acceptance[i]:0.4f}  "
                  f"{res.cv[i]:8.4f}")
        if args.widom and res.widom_samples is not None:
            from .widom import mu_ex as _mu_ex_est

            print("\n###  Widom mu_ex per level  ###")
            for i, t in enumerate(res.temps):
                mu_l, me_l = _mu_ex_est(res.widom_samples[:, i], float(t))
                print(f"T {t:0.3f}: mu_ex = {mu_l:f} ± {me_l:f}")
        if proc_id == 0:
            print(f"\nWritten to {path}")
        # reweighting is pure post-processing: rank 0 only
        if rw_grid is not None and proc_id == 0:
            from .reweight import reweight_from_ladder, write_reweight_csv

            if wall_k > 1:
                # one MBAR solve per wall realization (mixing
                # realizations in a level would violate MBAR's
                # same-Hamiltonian assumption), quenched-averaged
                from .reweight import (reweight_disorder_ladder,
                                       write_reweight_disorder_csv)

                rw, rw_parts = reweight_disorder_ladder(res, cfg, rw_grid,
                                                        wall_k)
                rwd_path = write_reweight_disorder_csv(d, cfg, rw_parts)
                print(f"\n###  MBAR reweighting ({rw.iterations} "
                      f"iterations; quenched average over {wall_k} wall "
                      "realizations, errors = between-realization SE)"
                      "  ###")
                print(f"Per-realization curves written to {rwd_path}")
            else:
                rw = reweight_from_ladder(res, cfg, rw_grid,
                                          n_boot=16, seed=seed)
                print(f"\n###  MBAR reweighting ({rw.iterations} "
                      "iterations, 16 bootstrap draws)  ###")
            rw_path = write_reweight_csv(d, cfg, rw)
            has_p = rw.pressure is not None
            has_mu = rw.mu_ex is not None
            print("T        E_mean     +-err       cv   "
                  + ("      P      " if has_p else "")
                  + ("    mu_ex    " if has_mu else "")
                  + "   ESS       f")
            for i, t in enumerate(rw.temps):
                pcol = f"{rw.pressure[i]:12.6g} " if has_p else ""
                mcol = f"{rw.mu_ex[i]:12.6g} " if has_mu else ""
                print(f"{t:0.3f}  {rw.mean_energy[i]:10.4f}  "
                      f"{rw.err_energy[i]:8.4f}  "
                      f"{rw.cv[i]:8.4f} {pcol}{mcol} {rw.ess[i]:8.1f}  "
                      f"{rw.free_energy[i]:8.4f}")
            print(f"\nWritten to {rw_path}")
            # Reweighted density FIELDS on the continuous T grid —
            # rho(z; T) / g(r; T), which the reference's workflow can
            # only produce at the simulated T (plotting.jl:123-201).
            from .reweight import write_reweight_profile_csv

            if rw.pn is not None:
                dzp = cfg.box_lz / args.ptensor_bins
                zc_p = (-cfg.box_lz / 2
                        + dzp * (np.arange(args.ptensor_bins) + 0.5))
                pn_path = write_reweight_profile_csv(
                    d, cfg, "reweight_pn", "z", zc_p, rw, rw.pn, None)
                pt_path = write_reweight_profile_csv(
                    d, cfg, "reweight_pt", "z", zc_p, rw, rw.pt, None)
                print(f"P_N(z; T) / P_T(z; T) surfaces written to "
                      f"{pn_path} / {pt_path}")
                print("Wall tension gamma(T) = 1/2 int (P_N - P_T) dz:")
                for gi, tv in enumerate(rw.temps):
                    err = (f" ± {rw.err_gamma[gi]:0.6f}"
                           if rw.err_gamma is not None else "")
                    print(f"  T {tv:0.3f}: gamma = "
                          f"{rw.gamma[gi]:0.6f}{err}")
            if rw.zprofile is not None:
                dz = cfg.box_lz / args.z_bins
                zc = -cfg.box_lz / 2 + dz * (np.arange(args.z_bins) + 0.5)
                zp_path = write_reweight_profile_csv(
                    d, cfg, "reweight_zprofile", "z", zc, rw,
                    rw.zprofile, rw.err_zprofile)
                print(f"rho(z; T) surface written to {zp_path}")
                # Potential of mean force F(z; T) = -T ln rho(z; T):
                # the free-energy landscape of wall adsorption on the
                # same continuous T grid (no reference analog at all)
                from .reweight import pmf_from_profile

                pmf, pmf_err = pmf_from_profile(
                    rw.temps, rw.zprofile, rw.err_zprofile)
                pmf_path = write_reweight_profile_csv(
                    d, cfg, "reweight_pmf", "z", zc, rw, pmf, pmf_err)
                print(f"F(z; T) PMF surface written to {pmf_path}")
            if rw.gr is not None:
                from .observables import radial_distribution

                rc = np.asarray(radial_distribution(
                    jax.numpy.asarray(lstate.r[0], cfg.jnp_dtype), cfg,
                    nbins=args.gr_bins)[0])
                gr_path = write_reweight_profile_csv(
                    d, cfg, "reweight_gr", "r", rc, rw, rw.gr, rw.err_gr)
                print(f"g(r; T) surface written to {gr_path}")
            if rw.sk is not None:
                from .observables import structure_factor

                kc = np.asarray(structure_factor(
                    jax.numpy.asarray(lstate.r[0], cfg.jnp_dtype), cfg,
                    n_kmax=args.sk_kmax)[0])
                sk_path = write_reweight_profile_csv(
                    d, cfg, "reweight_sk", "k", kc, rw, rw.sk, rw.err_sk)
                print(f"S(k; T) surface written to {sk_path}")
        return 0

    if resume_state is not None:
        state = resume_state
        batched = state.r.ndim == 3
        sweeps_done = int(np.asarray(state.sweeps).reshape(-1)[0])
        print(f"Resumed full {'ensemble' if batched else 'chain'} state "
              f"from {args.resume} ({sweeps_done} sweeps done)")
        w = jax.numpy.asarray(w_np, cfg.jnp_dtype)
        if batched:
            if args.chains > 1 and args.chains != state.r.shape[0]:
                print(f"Note: checkpoint holds {state.r.shape[0]} chains; "
                      "--chains ignored.")
            return _run_ensemble(args, cfg, params, d, state, w,
                                 prebatched=True)
        if args.chains > 1:
            # Broadcasting a resumed chain to an ensemble must not
            # replicate its cumulative voxel counters into every chain
            # (the pre-resume history would pool C times, ADVICE r1).
            from .state import broadcast_resumed_chain

            state = broadcast_resumed_chain(state, args.chains)
            print(f"Note: resumed single chain broadcast to {args.chains} "
                  "chains; cumulative density/mobility history kept in "
                  "chain 0 only.")
            return _run_ensemble(args, cfg, params, d, state, w,
                                 prebatched=True)
    else:
        r0 = smcio.load_last_state(d, cfg)
        if r0 is not None:
            print("\nUsing previously saved particle configuration...")
        else:
            print("\nInitializing system...")
            r0 = fcc_lattice(cfg)
        state, w = init_chain_state(cfg, key, r0=r0, w=w_np)

    kinetic = 1.5 * cfg.n * cfg.temperature
    e0 = float(np.asarray(state.energy).reshape(-1)[0])
    print(f"\nSystem initialized, with energy E0 = {e0 + kinetic:f}.\n")
    print(f"Starting new run with {cfg.n} particles in "
          f"{cfg.box_l:0.1f}x{cfg.box_l:0.1f}x{cfg.box_lz:0.1f} box, "
          f"T={cfg.temperature:0.2f}, rho={cfg.rho:0.4f}, "
          f"A={cfg.proposal_a:0.3f}, for {params.maxsteps} steps...")

    if args.chains > 1:
        w_run = w
        if w_k is not None:
            reps = args.chains // wall_k
            w_all = np.repeat(w_k, reps, axis=0)        # [C_total, M*M, 2]
            c_local = args.chains // nproc
            w_run = jax.numpy.asarray(
                w_all[proc_id * c_local:(proc_id + 1) * c_local],
                cfg.jnp_dtype)
            print(f"Quenched wall disorder: {wall_k} realizations x "
                  f"{reps} chains (wall seeds {args.wall_seed}.."
                  f"{args.wall_seed + wall_k - 1})")
        return _run_ensemble(args, cfg, params, d, state, w_run,
                             nproc=nproc, proc_id=proc_id)

    tuned_a = None
    if args.target_acceptance:
        from .state import batch_chain_state
        from .tuning import tune_mobility

        st1, tr = tune_mobility(
            cfg, batch_chain_state(state, 1), w,
            target=args.target_acceptance)
        state = jax.tree.map(lambda x: x[0], st1)
        tuned_a = tr.proposal_a
        print(f"Auto-tuned proposal mobility: A = {tr.proposal_a:0.4g} "
              f"(gamma = {tr.gamma:0.3g}, acceptance {tr.acceptance:0.3f} "
              f"after {tr.sweeps_used} tuning sweeps)")

    pos_writer = smcio.PositionsWriter(d, cfg)
    pos_writer.append(np.asarray(state.r))
    temp_writer = smcio.LocalWriter(d, cfg, "local_temp")
    snap = {"d": np.zeros(cfg.n_voxels, np.uint64),
            "mu": np.zeros(cfg.n_voxels, np.uint64)}
    stopper = _install_signal_stop()

    def on_window(widx, st, out):
        pos_writer.append(np.asarray(st.r))
        dnow = np.asarray(st.density, np.uint64)
        munow = np.asarray(st.mobility, np.uint64)
        temp_writer.append(dnow - snap["d"], munow - snap["mu"])
        snap["d"], snap["mu"] = dnow, munow
        done = (widx + 1) * min(cfg.storage_time, params.gather_steps)
        print(f"\rStoring the latest density distribution at "
              f"~{done * params.gather_lapse} steps... ", end="")
        return _window_maintenance(args, cfg, widx, st, stopper, w)

    opts = ObservableOptions(
        gr_bins=args.gr_bins, z_bins=args.z_bins,
        collect_sweep_trace=not args.no_trace,
        proposal_a=tuned_a,
        widom_k=args.widom,
        ptensor_bins=args.ptensor_bins,
    )
    state, res = simulate(cfg, params, state, w, opts=opts,
                          on_window=on_window, acf_mode=args.acf_mode,
                          max_fault_retries=args.fault_retries)

    print(f"\n\nTime-equivalent throughput: {res.sweeps_per_second:,.0f} sweeps/s "
          f"({1e6 / max(res.sweeps_per_second, 1e-9):0.1f} s per million)")
    print("\n###  Final results  ###")
    print(f"Mean energy: {res.mean_energy:f} ± {res.std_energy:f}")
    print(f"Mean pressure: {res.mean_pressure:f} ± {res.std_pressure:f}")
    print(f"Approximate heat capacity: {res.cv:f}")
    print(f"Average autocorrelation time: {res.tau:f}")
    print(f"Average acceptance ratio: {res.acceptance_ratio:f}")

    smcio.write_data_csv(d, cfg, res.energy_trace_full, res.pressure_trace,
                         res.accept_trace, params.gather_lapse)
    local_writer = smcio.LocalWriter(d, cfg, "local")
    local_writer.append(res.density, res.mobility)
    smcio.write_total_clusters_csv(d, cfg, res.l1, res.l2, res.l3)
    smcio.write_autocorrelation_csv(d, cfg, res.acf)
    smcio.write_info_csv(d, cfg, params, res)
    smcio.write_last_state(d, cfg, res.r_final)
    if res.gr is not None:
        from .observables import radial_distribution

        centers = np.asarray(radial_distribution(
            jax.numpy.asarray(res.r_final, cfg.jnp_dtype), cfg,
            nbins=args.gr_bins)[0])
        smcio.write_profile_csv(d, cfg, "gr", centers, res.gr, "r, g")
    if res.zprofile is not None:
        dz = cfg.box_lz / args.z_bins
        centers = -cfg.box_lz / 2 + dz * (np.arange(args.z_bins) + 0.5)
        smcio.write_profile_csv(d, cfg, "zprofile", centers, res.zprofile,
                                "z, density")
    if res.widom_du is not None:
        _report_widom(d, cfg, res.widom_du, res.widom_z, args.widom_bins)
    if res.pn is not None:
        _report_ptensor(d, cfg, res.pn, res.pt, args.ptensor_bins)

    if args.checkpoint:
        ck_path = smcio.save_checkpoint(args.checkpoint, state, cfg)
        print(f"Full chain state checkpointed to {ck_path}")

    return 0


def _run_gcmc_isotherm(args, cfg, params, key, d, cap):
    """--gcmc-grid: the whole mu -> <N> isotherm as ONE compiled
    ensemble (per-chain mu; --chains replicas per grid point)."""
    import numpy as np

    from . import io as smcio
    from .gcmc import box_volume, simulate_gcmc

    # mu grids allow negatives (parse_t_grid guards positive T)
    spec = args.gcmc_grid
    if ":" in spec:
        pieces = spec.split(":")
        if len(pieces) != 3:
            sys.exit(f"bad mu grid spec {spec!r} "
                     "(want MU1:MU2:K or a comma list)")
        lo, hi, num = float(pieces[0]), float(pieces[1]), int(pieces[2])
        if num < 1:
            sys.exit("mu grid needs K >= 1")
        grid = np.linspace(lo, hi, num)
    else:
        grid = np.asarray([float(v) for v in spec.split(",")],
                          np.float64)
    reps = max(1, args.chains)
    mu_c = np.repeat(grid, reps)
    print(f"Grand-canonical isotherm: {len(grid)} chemical potentials "
          f"x {reps} replicas, capacity {cap}, one compiled ensemble "
          f"(V = {box_volume(cfg):g})")
    state, res = simulate_gcmc(
        cfg, mu_c, cap, params.eqsteps, params.maxsteps, key,
        n_chains=len(mu_c), n_exchange=args.gcmc_exchanges)
    n_chain = res.n_trace.mean(axis=0).reshape(len(grid), reps)
    n_mean = n_chain.mean(axis=1)
    n_err = (n_chain.std(axis=1) / np.sqrt(max(1, reps - 1))
             if reps > 1 else np.zeros(len(grid)))
    v = box_volume(cfg)
    print("\n###  Adsorption isotherm  ###")
    print("mu        <N>        +-err     density")
    for i, mu in enumerate(grid):
        print(f"{mu:8.3f}  {n_mean[i]:9.3f}  {n_err[i]:8.3f}  "
              f"{n_mean[i] / v:9.6f}")
    if n_mean.max() > 0.9 * cap:
        print(f"WARNING: <N> within 10% of capacity {cap} — raise "
              "--gcmc-cap (insertions reject at capacity, biasing the "
              "top of the isotherm)")
    p = smcio._fname(d, "gcmc_isotherm", cfg)
    with open(p, "w") as f:
        f.write("mu, N_mean, N_err, density\n")
        for i, mu in enumerate(grid):
            f.write(f"{mu:0.6f}, {n_mean[i]:0.6f}, {n_err[i]:0.6f}, "
                    f"{n_mean[i] / v:0.9f}\n")
    print(f"\nWritten to {p}")
    return 0


def _run_gibbs_binodal(args, cfg, params, key, d):
    """--gibbs-temps: the coexistence curve as ONE compiled ladder —
    per-chain temperatures ride the chain batch (gibbs.py)."""
    import numpy as np

    from .gibbs import (binodal_from_results, simulate_gibbs,
                        write_gibbs_binodal_csv)
    from .reweight import parse_t_grid

    try:
        grid = parse_t_grid(args.gibbs_temps)
    except ValueError as e:
        sys.exit(f"--gibbs-temps: {e}")
    reps = max(1, args.chains)
    temps_c = np.repeat(grid, reps)
    cap = args.gibbs_cap or cfg.n
    n_tr = args.gibbs_transfers or max(1, cfg.n // 4)
    rho_all = cfg.n / (2.0 * cfg.box_l ** 3)
    print(f"Gibbs coexistence curve: {len(grid)} temperatures x "
          f"{reps} replicas, N = {cfg.n} total, overall rho = "
          f"{rho_all:g}, capacity {cap}/box, {n_tr} transfers/sweep, "
          f"one compiled ensemble")
    state, res = simulate_gibbs(
        cfg, params.eqsteps, params.maxsteps, key, cap,
        n_chains=len(temps_c), dlnv=args.npt_dlnv, n_transfer=n_tr,
        temperatures=temps_c,
        mesh=_auto_chain_mesh(len(temps_c), "Gibbs ladder"))
    rows = binodal_from_results(state, res, temps_c, cfg)
    print("\n###  Coexistence curve  ###")
    print("T        rho_v      +-err     rho_l      +-err     |dmu|"
          "   phase")
    for r in rows:
        print(f"{r['t']:6.3f}  {r['rho_v']:9.5f}  {r['err_v']:8.5f}  "
              f"{r['rho_l']:9.5f}  {r['err_l']:8.5f}  "
              f"{r['dmu']:6.3f}   "
              f"{'two-phase' if r['two_phase'] else 'one-phase'}")
    p = write_gibbs_binodal_csv(d, cfg, rows)
    print(f"\nWritten to {p}")
    return 0


def _auto_chain_mesh(n_chains: int, label: str):
    """Pure data-parallel chain mesh for the NPT/Gibbs drivers when the
    host shows multiple devices (same policy as the ensemble CLI)."""
    import jax

    n_dev = len(jax.devices())
    if n_dev > 1 and n_chains % n_dev == 0:
        from .ensemble import make_mesh

        print(f"Sharding {n_chains} {label} chains over {n_dev} "
              "devices")
        return make_mesh(n_dev, axis_names=("chains",))
    if n_dev > 1:
        print(f"Note: {n_chains} chains do not divide over {n_dev} "
              "devices; running on one device")
    return None


def _run_npt_isobars(args, cfg, params, key, d):
    """--npt-grid: the whole P -> rho(P) equation of state as ONE
    compiled ensemble (per-chain pressure; --chains replicas per grid
    point — npt.simulate_npt broadcasts the pressure vector)."""
    import numpy as np

    from . import io as smcio
    from .npt import simulate_npt

    spec = args.npt_grid
    if ":" in spec:
        pieces = spec.split(":")
        if len(pieces) != 3:
            sys.exit(f"bad pressure grid spec {spec!r} "
                     "(want P1:P2:K or a comma list)")
        lo, hi, num = float(pieces[0]), float(pieces[1]), int(pieces[2])
        if num < 1:
            sys.exit("pressure grid needs K >= 1")
        grid = np.linspace(lo, hi, num)
    else:
        grid = np.asarray([float(v) for v in spec.split(",")],
                          np.float64)
    if (grid <= 0).any():
        sys.exit("pressures must be positive")
    reps = max(1, args.chains)
    p_c = np.repeat(grid, reps)
    print(f"Equation of state: {len(grid)} pressures x {reps} "
          f"replicas, one compiled ensemble (dlnV {args.npt_dlnv:g}, "
          f"rc {cfg.lj_cutoff:g}, starting box {cfg.box_l:g}^3)")
    _, res = simulate_npt(
        cfg, p_c, params.eqsteps, params.maxsteps, key,
        n_chains=len(p_c), dlnv=args.npt_dlnv,
        mesh=_auto_chain_mesh(len(p_c), "NPT isobar"))
    # per-point stats: group the [S, C] traces back into (K, reps)
    v_tr = res.volume_trace
    rho_chain = (cfg.n / v_tr).mean(axis=0).reshape(len(grid), reps)
    rho_mean = rho_chain.mean(axis=1)
    rho_err = (rho_chain.std(axis=1) / np.sqrt(max(1, reps - 1))
               if reps > 1 else np.zeros(len(grid)))
    v_grp = v_tr.reshape(v_tr.shape[0], len(grid), reps)
    v_mean = v_grp.mean(axis=(0, 2))
    kappa = (v_grp.var(axis=(0, 2))
             / (cfg.temperature * np.maximum(v_mean, 1e-12)))
    print("\n###  Equation of state  ###")
    print("P         rho        +-err     <V>        kappa_T")
    for i, p in enumerate(grid):
        print(f"{p:8.4f}  {rho_mean[i]:9.6f}  {rho_err[i]:8.6f}  "
              f"{v_mean[i]:9.3f}  {kappa[i]:9.5f}")
    v_floor = (2.0 * cfg.lj_cutoff) ** 3
    if v_mean.min() < 1.3 * v_floor:
        print(f"WARNING: <V> within 30% of the hard volume floor "
              f"{v_floor:g} — the top of the isobar is compressed "
              "against 2*rc; rerun with a smaller --lj-cutoff")
    path = smcio._fname(d, "npt_isobar", cfg)
    with open(path, "w") as f:
        f.write("P, rho_mean, rho_err, V_mean, kappa_T\n")
        for i, p in enumerate(grid):
            f.write(f"{p:0.6f}, {rho_mean[i]:0.9f}, {rho_err[i]:0.9f}, "
                    f"{v_mean[i]:0.6f}, {kappa[i]:0.9f}\n")
    print(f"\nWritten to {path}")
    if args.npt_reweight:
        from .npt import reweight_isobars, write_npt_reweight_csv
        from .reweight import parse_t_grid

        try:
            pg = parse_t_grid(args.npt_reweight)
        except ValueError as e:
            sys.exit(f"--npt-reweight: {e}")
        rw = reweight_isobars(res.energy_trace, res.volume_trace, p_c,
                              cfg.temperature, pg, cfg.n)
        print(f"\nMBAR over the pressure axis ({len(grid)} sampled "
              f"states -> {len(pg)} targets):")
        print("P         rho        kappa_T    H_conf      ess")
        for i, p in enumerate(pg):
            print(f"{p:8.4f}  {rw.rho[i]:9.6f}  {rw.kappa_t[i]:9.5f}  "
                  f"{rw.enthalpy[i]:9.3f}  {rw.ess[i]:8.0f}")
        lo, hi = grid.min(), grid.max()
        if (pg < lo).any() or (pg > hi).any():
            print(f"WARNING: targets outside the sampled bracket "
                  f"[{lo:g}, {hi:g}] are extrapolations — check ess")
        prw = write_npt_reweight_csv(d, cfg, rw)
        print(f"Written to {prw}")
    return 0


def _report_ptensor(d, cfg, pn, pt, nbins):
    """Write ptensor_*.csv and print the wall-tension integral."""
    from . import io as smcio

    dz = cfg.box_lz / nbins
    centers = -cfg.box_lz / 2 + dz * (np.arange(nbins) + 0.5)
    p = smcio._fname(d, "ptensor", cfg)
    with open(p, "w") as f:
        f.write("z, p_n, p_t\n")
        for i in range(nbins):
            f.write(f"{centers[i]:0.6f}, {pn[i]:0.9f}, {pt[i]:0.9f}\n")
    gamma = 0.5 * float(np.sum(pn - pt) * dz)
    print(f"Pressure-tensor profile written to {p}")
    print(f"Wall tension (per wall): gamma = 1/2 int (P_N - P_T) dz = "
          f"{gamma:0.6f}")


def _report_widom(d, cfg, du, z, nbins, rank: int = 0):
    """Print the scalar mu_ex and write the widom_*.csv profile."""
    from . import io as smcio
    from . import widom as _widom

    mu, merr = _widom.mu_ex(du, cfg.temperature)
    print(f"Widom excess chemical potential: mu_ex = {mu:f} ± {merr:f} "
          f"({du.size} insertions, volume-averaged)")
    centers, muz, ez, cnts = _widom.mu_ex_profile(
        du, z, cfg.temperature, cfg, nbins=nbins)
    pth = smcio.write_widom_csv(d, cfg, centers, muz, ez, cnts, mu, merr,
                                rank=rank)
    print(f"mu_ex(z) profile written to {pth}")


def _install_signal_stop():
    """SIGINT/SIGTERM set a flag; the driver stops cleanly at the next
    window boundary with a final checkpoint (elastic-recovery story —
    the reference has none, SURVEY §5.3)."""
    import signal

    flag = {"stop": False}

    def handler(signum, frame):
        print(f"\n[signal {signum}] finishing current window, "
              "checkpointing, and stopping...", flush=True)
        flag["stop"] = True

    for sig in (signal.SIGINT, signal.SIGTERM):
        try:
            signal.signal(sig, handler)
        except (ValueError, OSError):
            pass  # non-main thread / restricted env
    return flag


def _ck_with_suffix(ck: str, suffix: str) -> str:
    """Insert a per-process suffix before the extension — every rank of
    a multi-process run must write its OWN checkpoint (each holds only
    its local chains; a shared path would be clobbered down to one
    rank's half-ensemble)."""
    if not suffix:
        return ck
    root, dot, ext = ck.rpartition(".")
    return f"{root}{suffix}{dot}{ext}" if dot else ck + suffix


def _window_maintenance(args, cfg, widx, st, stopper, w=None, ck_suffix=""):
    """Auto-checkpoint, health checks, graceful stop. Returns "stop" to
    end the run at this window boundary."""
    from . import io as smcio

    ck = _ck_with_suffix(
        getattr(args, "checkpoint", None) or "autosave.npz", ck_suffix)
    if args.auto_checkpoint and (widx + 1) % args.auto_checkpoint == 0:
        smcio.save_checkpoint(ck, st, cfg)
    if getattr(args, "health_checks", False) and w is not None:
        from .guards import check_state

        check_state(st, w, cfg, strict=False)
    if stopper["stop"]:
        ck_path = smcio.save_checkpoint(ck, st, cfg)
        print(f"Checkpoint written to {ck_path}")
        return "stop"
    return None


def _run_ensemble(args, cfg, params, d, seed_state, w, prebatched=False,
                  nproc=1, proc_id=0) -> int:
    """Multi-chain run: per-chain output files (rank = chain, mirroring the
    reference's per-MPI-rank naming) + pooled ensemble summary.

    nproc > 1: this process owns chains [proc_id*C/P, (proc_id+1)*C/P);
    key streams use GLOBAL chain indices, so the ensemble is bitwise the
    single-process one split across processes. Pooled stats cross the
    process boundary via one allgather at the end."""
    import jax

    from . import io as smcio
    from .driver import ObservableOptions
    from .driver_ensemble import simulate_ensemble
    from .state import batch_chain_state

    if prebatched:
        state = seed_state
        c = state.r.shape[0]
    else:
        c = args.chains // nproc
        state = batch_chain_state(seed_state, c, chain_offset=proc_id * c)
    rank0 = proc_id * c
    if w.ndim == 3:
        # per-chain wall tables (quenched disorder): chains in different
        # realizations start at different wall energies — recompute E0
        # per chain with its own table (batch_chain_state broadcast the
        # seed chain's single-table energy)
        from .state import per_chain_wall_energy

        assert w.shape[0] == c, (w.shape, c)
        state = state._replace(energy=per_chain_wall_energy(
            state.r, w, cfg).astype(state.energy.dtype))

    pos_writers = [smcio.PositionsWriter(d, cfg, rank=rank0 + ci)
                   for ci in range(c)]
    for ci in range(c):
        pos_writers[ci].append(np.asarray(state.r[ci]))

    stopper = _install_signal_stop()

    ck_suffix = f".p{proc_id}" if nproc > 1 else ""

    def on_window(widx, st, out):
        r = np.asarray(st.r)
        for ci in range(c):
            pos_writers[ci].append(r[ci])
        print(f"\rWindow {widx + 1} done...", end="")
        return _window_maintenance(args, cfg, widx, st, stopper, w,
                                   ck_suffix=ck_suffix)

    # Multi-device hosts: shard the chain axis over every visible device
    # (zero cross-device traffic — the reference's replica model on ICI).
    # Decided BEFORE the engine: the pallas gate needs the per-device
    # chain count.
    mesh = None
    n_dev = len(jax.local_devices()) if nproc > 1 else len(jax.devices())
    if n_dev > 1 and c % n_dev == 0:
        from .ensemble import make_mesh, shard_ensemble

        mesh = make_mesh(n_dev, axis_names=("chains",), local=nproc > 1)
        state = shard_ensemble(state, mesh)
        print(f"Sharding {c} chains over {n_dev} "
              f"{'local ' if nproc > 1 else ''}devices")
    elif n_dev > 1:
        print(f"Note: {c} chains do not divide over {n_dev} devices; "
              "running on one device")
    sampler = _resolve_sampler(args.sampler, cfg, c,
                               n_dev=n_dev if mesh is not None else 1,
                               tuned=bool(getattr(args, "target_acceptance",
                                                  None)))
    if sampler == "zsorted" and cfg.pbc_z:
        sys.exit("--sampler zsorted assumes confined z (bulk pbc_z "
                 "runs need --sampler pallas)")
    # per-chain wall tables (quenched disorder) run on every engine:
    # the kernels take them as [s_pad, C] coefficient planes
    # --target-acceptance works on zsorted since round 3 (cont.): the
    # tuned A rides the ladder-mode (A, T) data rows, one compile key.
    print(f"Ensemble sweep engine: {sampler}")
    # Seeded runs derive the shared per-sweep streams (cyclic offsets /
    # kernel sweep seeds) from the run seed, making them invariant to the
    # process split (XLA engine: bitwise — test_distributed). The KERNEL
    # engines (pallas AND zsorted) draw per-chain noise from the lane
    # index inside the call, so multi-process kernel runs salt the seed
    # per process — without it every process would generate bitwise the
    # same chains (silent replica duplication). Equivalence to
    # single-process is statistical there.
    stream = None
    if getattr(args, "seed", None) is not None:
        stream = (int(args.seed) if (sampler == "xla" or nproc == 1)
                  else (int(args.seed), proc_id))
    opts = ObservableOptions(
        gr_bins=args.gr_bins, z_bins=args.z_bins,
        collect_sweep_trace=not args.no_trace,
        sampler=sampler,
        stream_seed=stream,
        widom_k=args.widom,
        ptensor_bins=args.ptensor_bins,
    )
    if getattr(args, "target_acceptance", None):
        import dataclasses

        from .tuning import tune_mobility

        state, tr = tune_mobility(
            cfg, state, w, target=args.target_acceptance,
            sampler=sampler, mesh=mesh)
        opts = dataclasses.replace(opts, proposal_a=tr.proposal_a)
        print(f"Auto-tuned proposal mobility: A = {tr.proposal_a:0.4g} "
              f"(gamma = {tr.gamma:0.3g}, acceptance {tr.acceptance:0.3f} "
              f"after {tr.sweeps_used} tuning sweeps)")
    state, agg = simulate_ensemble(
        cfg, params, state, w, opts=opts, on_window=on_window,
        acf_mode=args.acf_mode, mesh=mesh,
        max_fault_retries=getattr(args, "fault_retries", 2),
    )

    # Per-chain files: every process writes ITS chains under their global
    # rank (exactly the reference's per-MPI-rank file model, SMC.c:66-96).
    for ci, res in enumerate(agg.chains):
        rk = rank0 + ci
        smcio.write_data_csv(d, cfg, res.energy_trace_full, res.pressure_trace,
                             res.accept_trace, params.gather_lapse, rank=rk)
        smcio.LocalWriter(d, cfg, "local", rank=rk).append(res.density, res.mobility)
        smcio.write_total_clusters_csv(d, cfg, res.l1, res.l2, res.l3, rank=rk)
        smcio.write_autocorrelation_csv(d, cfg, res.acf, rank=rk)

    pooled_chains = agg.chains
    g_gr, g_zp = agg.gr, agg.zprofile
    g_grc, g_zpc = agg.gr_chains, agg.zprofile_chains
    g_wdu, g_wz = agg.widom_du, agg.widom_z
    g_pn, g_pt = agg.pn, agg.pt
    mean_e, std_e = agg.mean_energy, agg.std_energy
    mean_p, std_p = agg.mean_pressure, agg.std_pressure
    acc_mean = agg.acceptance_ratio
    sps = agg.sweeps_per_second
    if nproc > 1:
        # ONE cross-process collective pools what the reference's users
        # aggregated offline from per-rank CSVs.
        from types import SimpleNamespace

        from .ensemble import allgather_chain_axis

        summ = np.asarray([[r.mean_energy, r.mean_pressure,
                            r.acceptance_ratio, r.sweeps_per_second]
                           for r in agg.chains], np.float64)
        g_summ = allgather_chain_axis(summ)               # [C_total, 4]
        mean_e = float(g_summ[:, 0].mean())
        std_e = float(g_summ[:, 0].std())
        mean_p = float(g_summ[:, 1].mean())
        std_p = float(g_summ[:, 1].std())
        acc_mean = float(g_summ[:, 2].mean())
        sps = float(g_summ[:, 3].sum())
        # Agree on trace lengths FIRST: a graceful stop (signal) can
        # reach ranks at different windows, and an allgather over
        # unequal shapes errors on one rank while the others block
        # forever in the collective. Truncate everyone to the global
        # minimum; zero on any rank skips the trace pooling everywhere.
        lens = allgather_chain_axis(np.asarray(
            [[len(agg.chains[0].energy_trace_full),
              len(agg.chains[0].accept_trace),
              len(agg.chains[0].pressure_trace)]], np.int64))   # [P, 3]
        se, sa, sp_ = (int(v) for v in lens.min(axis=0))
        if se > 0:
            g_e = allgather_chain_axis(
                np.stack([r.energy_trace_full[:se] for r in agg.chains]))
            g_a = allgather_chain_axis(
                np.stack([r.accept_trace[:sa] for r in agg.chains]))
            g_p = allgather_chain_axis(
                np.stack([r.pressure_trace[:sp_] for r in agg.chains]))
            pooled_chains = [SimpleNamespace(energy_trace_full=g_e[i],
                                             accept_trace=g_a[i],
                                             pressure_trace=g_p[i])
                             for i in range(g_e.shape[0])]
        if g_gr is not None:
            g_gr = allgather_chain_axis(g_gr[None]).mean(axis=0)
        if g_zp is not None:
            g_zp = allgather_chain_axis(g_zp[None]).mean(axis=0)
        if g_pn is not None:
            g_pn = allgather_chain_axis(g_pn[None]).mean(axis=0)
            g_pt = allgather_chain_axis(g_pt[None]).mean(axis=0)
        if g_grc is not None:
            g_grc = allgather_chain_axis(g_grc)      # [C_total, bins]
        if g_zpc is not None:
            g_zpc = allgather_chain_axis(g_zpc)
        if g_wdu is not None:
            # pool the raw insertion samples over the chain axis so the
            # rank-0 bootstrap sees every process's chains. Agree on the
            # gather count first (a graceful stop can leave ranks at
            # different windows; unequal shapes would wedge the
            # collective — same hazard as the trace pooling above).
            sg = int(allgather_chain_axis(
                np.asarray([[len(g_wdu)]], np.int64)).min())
            if sg > 0:
                g_wdu = np.moveaxis(
                    allgather_chain_axis(np.moveaxis(g_wdu[:sg], 1, 0)),
                    0, 1)
                g_wz = np.moveaxis(
                    allgather_chain_axis(np.moveaxis(g_wz[:sg], 1, 0)),
                    0, 1)
            else:
                g_wdu = g_wz = None

    print(f"\n\nAggregate throughput: {sps:,.0f} sweeps/s "
          f"across {c * nproc} chains"
          + (f" on {nproc} processes" if nproc > 1 else ""))
    print("\n###  Final ensemble results  ###")
    print(f"Mean energy: {mean_e:f} ± {std_e:f} (chain spread)")
    print(f"Mean pressure: {mean_p:f} ± {std_p:f}")
    print(f"Average acceptance ratio: {acc_mean:f}")

    k_real = max(1, getattr(args, "wall_realizations", 1))
    if k_real > 1 and proc_id == 0:
        # quenched averaging: mean within each realization first, then
        # across realizations; the between-realization spread is the
        # honest disorder error bar
        e_chain = (g_summ[:, 0] if nproc > 1
                   else np.asarray([r.mean_energy for r in agg.chains]))
        e_k = e_chain.reshape(k_real, -1).mean(axis=1)
        print("\n###  Quenched wall-disorder summary  ###")
        for i, ek in enumerate(e_k):
            print(f"realization {i} (wall seed {args.wall_seed + i}): "
                  f"E = {ek:f}")
        se = (np.std(e_k, ddof=1) / np.sqrt(k_real)) if k_real > 1 else 0.0
        print(f"Disorder-averaged energy: {e_k.mean():f} ± {se:f} "
              "(between-realization SE)")
        # disorder-RESOLVED structure: per-realization profiles (the
        # pooled gr/zprofile CSVs above are the disorder averages)
        if g_zpc is not None and args.z_bins:
            prof = g_zpc.reshape(k_real, -1, g_zpc.shape[-1]).mean(axis=1)
            dz = cfg.box_lz / args.z_bins
            centers = -cfg.box_lz / 2 + dz * (np.arange(args.z_bins) + 0.5)
            pth = smcio.write_disorder_profile_csv(
                d, cfg, "zprofile_disorder", "z", centers, prof)
            print(f"Per-realization z profiles written to {pth}")
        if g_grc is not None and args.gr_bins:
            from .observables import radial_distribution

            prof = g_grc.reshape(k_real, -1, g_grc.shape[-1]).mean(axis=1)
            centers = np.asarray(radial_distribution(
                jax.numpy.asarray(agg.chains[0].r_final, cfg.jnp_dtype),
                cfg, nbins=args.gr_bins)[0])
            pth = smcio.write_disorder_profile_csv(
                d, cfg, "gr_disorder", "r", centers, prof)
            print(f"Per-realization g(r) written to {pth}")

    if proc_id == 0:
        if g_gr is not None:
            from .observables import radial_distribution

            centers = np.asarray(radial_distribution(
                jax.numpy.asarray(agg.chains[0].r_final, cfg.jnp_dtype), cfg,
                nbins=args.gr_bins)[0])
            smcio.write_profile_csv(d, cfg, "gr", centers, g_gr, "r, g")
        if g_zp is not None:
            dz = cfg.box_lz / args.z_bins
            centers = -cfg.box_lz / 2 + dz * (np.arange(args.z_bins) + 0.5)
            smcio.write_profile_csv(d, cfg, "zprofile", centers, g_zp,
                                    "z, density")
        if g_wdu is not None:
            _report_widom(d, cfg, g_wdu, g_wz, args.widom_bins)
        if g_pn is not None:
            _report_ptensor(d, cfg, g_pn, g_pt, args.ptensor_bins)
        smcio.write_ensemble_data_csv(d, cfg, pooled_chains,
                                      params.gather_lapse)
        smcio.write_info_csv(d, cfg, params, agg.chains[0])
        smcio.write_last_state(d, cfg, agg.chains[0].r_final)

    if args.checkpoint:
        ck_path = smcio.save_checkpoint(
            _ck_with_suffix(args.checkpoint, ck_suffix), state, cfg)
        print(f"Full ensemble state checkpointed to {ck_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
