"""Simulation driver — the reference's sMC (SMC.c:21-267), restructured for
a device-resident main loop.

Structure: the run is a sequence of *windows* (the reference's STORAGE_TIME
cadence, SMC.c:158-182). One window = one jitted `lax.scan` over gathers;
one gather = an inner `lax.scan` of `gather_lapse` sweeps followed by the
observable pass (pressure, voxel density/mobility, optional g(r)/z-profile,
cluster analysis at the LCA cadence via `lax.cond`). The host only touches
data between windows — never per sweep (SURVEY §5.8: no per-sweep host
sync).

Fixes over the reference, all documented in docs/DEVIATIONS.md:
  * observables are measured after each gather block completes —
    the reference gathers one sweep early and its P[k] indexing skips
    P[0] and writes one past the end at the final gather (SMC.c:49,140);
  * the incremental energy is re-synchronized by an exact recompute at a
    configurable cadence (the reference never recomputes, SMC.c:194,341);
  * cluster statistics accumulate real histograms (the reference's l1/l2/l3
    divide by a truncating integer and stay zero, SMC.c:149-153).
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, replace
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import RunParams, SMCConfig
from .observables import (
    autocorrelation,
    cluster_analysis,
    cluster_histograms,
    density_mobility_update,
    integrated_autocorrelation_time,
    radial_distribution,
    trace_mean_var,
    z_density_profile,
)
from .potentials import total_energy, total_energy_jit, total_pressure
from .sampler import run_sweeps
from .state import ChainState


def therm_chunk(cfg: SMCConfig, sampler: str = "xla") -> int:
    """Deterministic thermalization chunk (sweeps per device call).

    Machine-INDEPENDENT by design: the previous wall-clock probe sized
    chunks from host speed, so the same --seed could give different
    trajectories on different machines through the pallas engine's
    per-call boundary rounding (ADVICE r1). Sized from the O(N^2) sweep
    cost to stay far under the ~100 s device watchdog on v5e."""
    budget = 5e8 if sampler in ("pallas", "zsorted") else 1e8
    return max(50, min(2000, int(budget / (cfg.n * cfg.n))))


def gathers_per_call(cfg: SMCConfig, lapse: int, chains: int,
                     clusters: bool) -> int:
    """Watchdog-safe gathers per device call — DETERMINISTIC from the
    run parameters (A6: chunk sizes must never depend on wall clock or
    host speed, or seeded pallas/zsorted trajectories would vary by
    machine through per-call boundary rounding).

    Unit-cost model in pair-ops per gather: the sweep pass
    (lapse*C*N^2), the O(N^2) per-chain observables, and — when the CNA
    stays fused — its per-pair pass (C * p_pad * N^2 MACs amortized over
    the lca_time cadence, at the MEASURED fused-path rate: one VPU
    pair-op of window budget ~ 180 gather-serialized CNA MACs of wall
    time; CNA_FUSED_MACS_PER_S, round-4 postmortem). The 1e12 budget
    lands calls near 30-40 s on v5e; small systems stay at the
    configured max (200), so existing small-N call layouts are
    unchanged. Callers that HOIST the CNA out of the fused window
    (cna_hoist) pass clusters=False here — the scan no longer carries
    the pass."""
    per_gather = (lapse + 3) * chains * cfg.n * cfg.n
    if clusters:
        per_gather += (chains * _cna_pass_macs(cfg) // 180
                       // max(1, cfg.lca_time))
    return max(1, min(cfg.max_gathers_per_call,
                      int(1e12 // max(per_gather, 1))))


# Measured effective rate of the FUSED in-window CNA (the per-pair
# formulation with adj[lb] row gathers): the round-4 window-fault
# postmortem clocked one N=1024 x 512-chain pass (2.75e14 MACs) at
# >56 s inside the gather window — ~5e12 MACs/s, 5x below the MXU f32
# rate, because the 1M-row gathers serialize
# (docs/EVIDENCE_WINDOW_FAULT.json: noobs 16.1 s vs cna fault at
# 72.6 s with ONE pass in the program). Drives the hoist decision and
# the fused-path cost model; only small problems stay fused.
CNA_FUSED_MACS_PER_S = 5e12
# Rate anchor for the HOISTED gather-free tile executor (bf16 MXU
# matmuls, observables.cluster_histograms_tile_range), measured on the
# v5e (scripts/probe_cna_tiles.py, docs/EVIDENCE_CNA_TILES.json):
# 6.87e13 MACs/s at N=4096 x 8 chains (~70% of the bf16 MXU peak) and
# 2.17e13 at N=1024 x 512 incl. the cold compile — 2.5e13 is the
# conservative call-sizing anchor.
CNA_MACS_PER_S = 2.5e13
# Hoist the CNA out of the fused gather window when one full pass would
# exceed this much fused-path time (the runtime watchdog killed window
# programs at ~72 s over the axon tunnel; a kernel fault can take the
# tunnel down permanently — CLAUDE.md).
CNA_HOIST_SECONDS = 5.0
# Per-call MAC budget for the hoisted path (~12 s on the anchor rate).
CNA_CALL_MACS = 3e14
# Per-call operand-byte budget for the hoisted path: the [T*T, npad]
# bf16 tile tensor + its f32 dot output, times the vmapped chain count,
# must stay well inside the 16 GB HBM (the pre-round-4 MAC-only bound
# admitted a 16 GB operand at N=1024 x 512 chains).
CNA_CALL_BYTES = 1 << 31


def _cna_pass_macs(cfg: SMCConfig) -> int:
    """MACs of ONE chain's full CNA pass. The fused per-pair path and
    the hoisted tile path both spend ~p_pad * N^2 on the common-
    neighbour dot (the tile path's lower-triangle cover is the same
    pair count, padded to CNA_TILE tiles)."""
    p = cfg.n * (cfg.n - 1) // 2
    p_pad = max(8192, ((p + 8191) // 8192) * 8192)
    return p_pad * cfg.n * cfg.n


def cna_hoist(cfg: SMCConfig, chains: int, clusters: bool) -> bool:
    """True when the CNA must leave the fused gather window: one pass
    over all chains (chains * p_pad * N^2 MACs in a single program —
    the scan's lax.cond runs every chain's pass in the one call that
    hits the lca cadence) would exceed CNA_HOIST_SECONDS at the
    measured fused-path rate (CNA_FUSED_MACS_PER_S; the gathers there
    serialize well below the MXU rate — round-4 postmortem).
    Deterministic from (cfg, chains) only, so multi-process runs agree."""
    if not clusters:
        return False
    return (chains * _cna_pass_macs(cfg) / CNA_FUSED_MACS_PER_S
            > CNA_HOIST_SECONDS)


def _cna_call_plan(cfg: SMCConfig, chains: int):
    """(m, nt_main, calls_per_pass) for the hoisted executor: m chains
    per call (MAC- and byte-bounded) over nt_main-tile ranges."""
    from .observables import CNA_TILE, cna_tile_pairs

    n = cfg.n
    npad = -(-n // CNA_TILE) * CNA_TILE
    tiles_total = int(cna_tile_pairs(n).shape[0])
    macs_tile = CNA_TILE * CNA_TILE * npad * npad
    # per (chain, in-flight tile): the bf16 [T*T, npad] cn tensor + its
    # f32 dot output + the padded adjacency (f32 + bf16 copies)
    bytes_chain = 6 * CNA_TILE * CNA_TILE * npad + 6 * npad * npad
    macs_chain = tiles_total * macs_tile
    m_bytes = max(1, int(CNA_CALL_BYTES // bytes_chain))
    if macs_chain <= CNA_CALL_MACS:
        m = max(1, min(chains, int(CNA_CALL_MACS // macs_chain), m_bytes))
        nt_main = tiles_total
    else:
        m = 1
        nt_main = max(1, min(tiles_total,
                             int(CNA_CALL_MACS // macs_tile)))
    calls = math.ceil(chains / m) * math.ceil(tiles_total / nt_main)
    return m, nt_main, calls


def warn_cna_spike(cfg: SMCConfig, chains: int) -> float:
    """Print the hoisted-CNA advisory once per run and return the
    estimated seconds per full cluster-analysis pass (hoisted rate)."""
    est_fused = chains * _cna_pass_macs(cfg) / CNA_FUSED_MACS_PER_S
    est = chains * _cna_pass_macs(cfg) / CNA_MACS_PER_S
    if est_fused > CNA_HOIST_SECONDS:
        per_pass = _cna_call_plan(cfg, chains)[2]
        print(f"Cluster analysis at N={cfg.n} x {chains} chains is "
              f"~{est:.0f} s of MXU time per pass — hoisted out of the "
              f"fused gather window into {per_pass} bounded device "
              f"calls per pass (raise --lca-time, now {cfg.lca_time}, "
              f"to thin the cadence).", flush=True)
    return est


_CNA_JIT_CACHE: dict = {}


def cna_hoisted_histograms(r, cfg: SMCConfig):
    """One full cluster-analysis pass over the chain batch, split into
    device calls bounded by CNA_CALL_MACS *and* CNA_CALL_BYTES so no
    single program approaches the runtime watchdog (~72 s measured over
    the axon tunnel) or HBM capacity.

    r: [C, N, 3] (device array). Returns np (l1 [C], l2 [C, 7],
    l3 [C, 7]) — exactly cluster_histograms(cluster_analysis(...)) per
    chain (the gather-free tile partial sums are integer-exact; see
    observables.cluster_histograms_tile_range)."""
    from .observables import cluster_histograms_tile_range, cna_tile_pairs

    c, n = r.shape[0], cfg.n
    tiles_total = int(cna_tile_pairs(n).shape[0])
    m, nt_main, _ = _cna_call_plan(cfg, c)

    def run(rc, s0, nt):
        key = (cfg, rc.shape[0], int(nt))
        f = _CNA_JIT_CACHE.get(key)
        if f is None:
            f = jax.jit(
                lambda rr, ss: jax.vmap(
                    lambda ri: cluster_histograms_tile_range(
                        ri, cfg, ss, nt))(rr),
                static_argnums=(),
            )
            _CNA_JIT_CACHE[key] = f
        return f(rc, jnp.int32(s0))

    l1 = np.zeros((c,), np.int64)
    l2 = np.zeros((c, 7), np.int64)
    l3 = np.zeros((c, 7), np.int64)
    for i in range(0, c, m):
        rc = r[i : i + m]
        k = rc.shape[0]
        if k < m:  # pad the tail chunk to the compiled chain-batch shape
            rc = jnp.concatenate(
                [rc, jnp.broadcast_to(rc[:1], (m - k,) + rc.shape[1:])])
        s0 = 0
        while s0 < tiles_total:
            nt = min(nt_main, tiles_total - s0)
            p1, p2, p3 = run(rc, s0, nt)
            l1[i : i + k] += np.asarray(p1)[:k]
            l2[i : i + k] += np.asarray(p2)[:k]
            l3[i : i + k] += np.asarray(p3)[:k]
            s0 += nt
    return (l1.astype(np.int32), l2.astype(np.int32), l3.astype(np.int32))


def _sync(state: ChainState) -> ChainState:
    """Synchronize on the device computation WITHOUT touching the PRNG-key
    leaf: jax.block_until_ready on key arrays triggers device faults over
    the axon TPU tunnel (UNAVAILABLE "kernel fault"); blocking any data
    leaf of the same program is an equivalent barrier."""
    state.energy.block_until_ready()
    state.r.block_until_ready()
    return state


# ----------------------------------------------------------------------
# Elastic recovery (SURVEY §5.3) — the reference has nothing here; the
# TPU-realistic failure is the runtime watchdog killing a long device
# program ("UNAVAILABLE: ... kernel fault" over the axon tunnel). The
# drivers snapshot the full state to HOST memory at each window boundary
# and, on a device fault, re-upload and replay the window: seeding is
# absolute (keys live in the state; per-sweep streams fold the absolute
# sweep index), so a replayed window is bitwise the uninterrupted one.
# ----------------------------------------------------------------------

def is_device_fault(exc: BaseException) -> bool:
    """Runtime faults worth retrying, as opposed to trace/shape errors
    that would just recur (those re-raise after the retry budget)."""
    if not isinstance(exc, jax.errors.JaxRuntimeError):
        return False
    s = str(exc)
    return any(m in s for m in ("UNAVAILABLE", "DATA_LOSS", "ABORTED",
                                "INTERNAL", "kernel fault"))


def snapshot_to_host(state: ChainState) -> ChainState:
    """Full numpy copy of the state. Device buffers can be poisoned after
    a runtime fault, so recovery must restart from host memory — the
    in-memory analog of an --auto-checkpoint file, refreshed per window."""
    return ChainState(
        key=np.asarray(jax.random.key_data(state.key)),
        **{f: np.asarray(getattr(state, f))
           for f in ChainState._fields if f != "key"},
    )


def restore_from_host(snap: ChainState) -> ChainState:
    return ChainState(
        key=jax.random.wrap_key_data(jnp.asarray(snap.key)),
        **{f: jnp.asarray(getattr(snap, f))
           for f in ChainState._fields if f != "key"},
    )


class GatherOut(NamedTuple):
    """Per-gather scan outputs (one gather = gather_lapse sweeps)."""

    energy_trace: jax.Array   # [gather_lapse] running E per sweep
    accept_trace: jax.Array   # [gather_lapse] int32 accepted moves per sweep
    pressure: jax.Array       # virial pressure after the block (SMC.c:140)
    l1: jax.Array             # bonded pairs at this gather (0 off-cadence)
    l2: jax.Array             # [7] num2 histogram
    l3: jax.Array             # [7] num3 histogram
    gr: jax.Array             # [gr_bins] g(r) accumulator contribution
    zprof: jax.Array          # [z_bins] z-density contribution
    # Widom ghost-insertion samples ([widom_k] dU / z per gather; empty
    # arrays when disabled). None defaults keep import free of any
    # backend-touching array creation; the gather steps always fill them.
    widom_du: jax.Array | None = None
    widom_z: jax.Array | None = None
    # pressure-tensor profile contributions ([ptensor_bins] P_N / P_T
    # per gather; empty when disabled)
    pn: jax.Array | None = None
    pt: jax.Array | None = None


@dataclass(frozen=True)
class ObservableOptions:
    pressure: bool = True
    clusters: bool = True
    gr_bins: int = 0          # 0 disables g(r)
    z_bins: int = 0           # 0 disables the z profile
    collect_sweep_trace: bool = True  # full-resolution E/jj traces
    # Ensemble sweep engine: "xla" (sampler.sweep under vmap), "pallas"
    # (kernels/sweep_pallas whole-sweep kernel; TPU float32, chain count
    # tiling by 128), or "zsorted" (the same kernel with exact z-block
    # skipping — faster at N>=1024; tuned A rides the (A, T) data rows,
    # labels restored at call boundaries; PERF_NOTES.md). Single-chain
    # simulate() is "xla".
    sampler: str = "xla"
    # Production proposal mobility override (auto-tuned A, tuning.py).
    # None -> cfg.proposal_a. The pallas engine routes an override through
    # the ladder-mode (A, T) data rows so the tuned value never forces a
    # fresh Mosaic compile (A is a kernel compile-time static otherwise).
    proposal_a: float | None = None
    # Shared per-sweep stream seed (cyclic offsets / pallas sweep seeds).
    # None -> legacy derivation from local chain 0's key. An explicit run
    # seed makes the streams invariant to how the chain batch is split
    # across processes — required for multi-process (--coordinator) runs
    # to be bitwise identical to the single-process ensemble.
    stream_seed: int | None = None
    # Widom ghost insertions per chain per gather (0 disables). The
    # insertion stream folds the chain's CURRENT key with the absolute
    # gather index — trajectories are untouched (the key is read, never
    # replaced) and the samples are window-split invariant.
    widom_k: int = 0
    # z bins for the normal/tangential pressure profile (0 disables) —
    # the wall surface-tension integrand (observables.py)
    ptensor_bins: int = 0


def _gather_step(
    state: ChainState,
    w: jax.Array,
    cfg: SMCConfig,
    gather_lapse: int,
    gather_index: jax.Array,
    opts: ObservableOptions,
) -> tuple[ChainState, GatherOut]:
    """gather_lapse sweeps + one observable pass (SMC.c:137-195)."""
    dtype = cfg.jnp_dtype
    a_eff = cfg.proposal_a if opts.proposal_a is None else opts.proposal_a
    state, trace = run_sweeps(
        state, w, cfg, a_eff, gather_lapse,
        collect_trace=opts.collect_sweep_trace,
    )

    if cfg.recompute_every:
        # Resync cadence keyed to the ABSOLUTE chain time (state.sweeps
        # counts thermalization too and rides the checkpoint), not the
        # run-relative gather index: a resumed run then recomputes at
        # the same chain times as the uninterrupted one, so the gathered
        # E series is bitwise resume-invariant (the round-5 hardware
        # drill caught a 1-ulp first-row difference under the old
        # gather_index cadence). Same-lapse continuation assumed — the
        # same scope the zsorted cadence alignment already requires.
        state = jax.lax.cond(
            (state.sweeps // gather_lapse) % cfg.recompute_every == 0,
            lambda s: s._replace(energy=total_energy(s.r, w, cfg)),
            lambda s: s,
            state,
        )

    p = (
        total_pressure(state.r, w, cfg)
        if opts.pressure
        else jnp.zeros((), dtype)
    )

    rbin, density, mobility = density_mobility_update(
        state.r, state.rbin, state.density, state.mobility, cfg
    )
    state = state._replace(rbin=rbin, density=density, mobility=mobility)

    if opts.clusters:
        def do_lca(r):
            c = cluster_analysis(r, cfg)
            return cluster_histograms(c)

        def skip_lca(r):
            return (
                jnp.zeros((), jnp.int32),
                jnp.zeros((7,), jnp.int32),
                jnp.zeros((7,), jnp.int32),
            )

        l1, l2, l3 = jax.lax.cond(
            (gather_index + 1) % cfg.lca_time == 0, do_lca, skip_lca, state.r
        )
    else:
        l1 = jnp.zeros((), jnp.int32)
        l2 = jnp.zeros((7,), jnp.int32)
        l3 = jnp.zeros((7,), jnp.int32)

    gr = (
        radial_distribution(state.r, cfg, nbins=opts.gr_bins)[1]
        if opts.gr_bins
        else jnp.zeros((0,), jnp.float32)
    )
    zp = (
        z_density_profile(state.r, cfg, nbins=opts.z_bins)[1]
        if opts.z_bins
        else jnp.zeros((0,), jnp.float32)
    )

    if opts.collect_sweep_trace:
        e_tr, a_tr = trace.energy, trace.accepted
        if cfg.recompute_every:
            # Report the STATE's energy at the gather boundary
            # (post-resync when the cadence fired; bitwise no-op
            # otherwise) — matches what a checkpoint taken here stores,
            # making resumed data rows byte-identical to the
            # uninterrupted run's (round-5 hardware drill).
            e_tr = e_tr.at[-1].set(state.energy)
    else:
        e_tr = jnp.zeros((0,), dtype)
        a_tr = jnp.zeros((0,), jnp.int32)

    if opts.widom_k:
        from .widom import widom_delta_u

        wdu, wz = widom_delta_u(
            state.r, w, cfg,
            jax.random.fold_in(state.key, gather_index), opts.widom_k,
        )
    else:
        wdu = jnp.zeros((0,), dtype)
        wz = jnp.zeros((0,), dtype)

    if opts.ptensor_bins:
        from .observables import pressure_tensor_profile

        _, pn, pt = pressure_tensor_profile(state.r, cfg,
                                            nbins=opts.ptensor_bins)
    else:
        pn = jnp.zeros((0,), jnp.float32)
        pt = jnp.zeros((0,), jnp.float32)

    return state, GatherOut(e_tr, a_tr, p, l1, l2, l3, gr, zp, wdu, wz,
                            pn, pt)


@partial(
    jax.jit,
    static_argnames=("cfg", "gather_lapse", "n_gathers", "opts"),
)
def simulate_window(
    state: ChainState,
    w: jax.Array,
    cfg: SMCConfig,
    gather_lapse: int,
    n_gathers: int,
    gather_offset: jax.Array,
    opts: ObservableOptions,
) -> tuple[ChainState, GatherOut]:
    """One storage window: `n_gathers` gathers as a single compiled scan."""

    def body(carry, k):
        s, out = _gather_step(carry, w, cfg, gather_lapse, gather_offset + k, opts)
        return s, out

    return jax.lax.scan(body, state, jnp.arange(n_gathers))


class SimResults(NamedTuple):
    """The reference's struct Sim (SMC.h:76-88) plus the richer observables."""

    mean_energy: float        # mean E incl. 3NT/2 (SMC.c:210-211, 244)
    std_energy: float
    mean_pressure: float      # incl. ideal rho*T (SMC.c:207-208)
    std_pressure: float
    acceptance_ratio: float   # SMC.c:248
    cv: float                 # var(E)/T^2, naive correlated trace (SMC.c:250)
    cv_strided: float         # var over tau-strided samples / T^2 — the bulk
                              # variant's estimator (variance2/variance_corr,
                              # SMC_noMPI_noWall.c:244, SMC.c:1128-1142)
    tau: float                # sum of ACF (SMC.c:235)
    acf: np.ndarray
    r_final: np.ndarray
    l1: float                 # mean bonded pairs per LCA pass
    l2: np.ndarray            # [7] normalized num2 histogram
    l3: np.ndarray            # [7] normalized num3 histogram
    energy_trace: np.ndarray  # per-sweep E (+3NT/2), empty if not collected
    energy_trace_full: np.ndarray  # [maxsteps+1]: initial E prepended (SMC.c:47)
    accept_trace: np.ndarray
    pressure_trace: np.ndarray
    density: np.ndarray       # cumulative voxel density [ncx, ncx, ncz]
    mobility: np.ndarray
    gr: Optional[np.ndarray]
    zprofile: Optional[np.ndarray]
    therm_acceptance: float
    sweeps_per_second: float
    # Widom ghost-insertion samples, [gathers, 1, widom_k] (the singleton
    # is the chain axis the widom.py estimators bootstrap over); None
    # unless opts.widom_k was set.
    widom_du: Optional[np.ndarray] = None
    widom_z: Optional[np.ndarray] = None
    # gather-averaged pressure-tensor profiles [ptensor_bins]
    pn: Optional[np.ndarray] = None
    pt: Optional[np.ndarray] = None


def simulate(
    cfg: SMCConfig,
    params: RunParams,
    state: ChainState,
    w: jax.Array,
    opts: ObservableOptions = ObservableOptions(),
    on_window=None,
    acf_mode: str = "reference",
    max_fault_retries: int = 2,
) -> tuple[ChainState, SimResults]:
    """Full single-chain run: thermalization, windowed main loop,
    post-processing. The equivalent of sMC (SMC.c:21-267).

    `on_window(window_index, state, GatherOut)` is the host I/O hook,
    called once per storage window with stacked per-gather data.

    `max_fault_retries`: consecutive device faults tolerated per window —
    each retry re-uploads the window-start host snapshot and replays the
    window (bitwise-identical by absolute seeding). 0 disables snapshots.
    """
    lapse = params.gather_lapse
    gather_steps = params.gather_steps
    dtype = cfg.jnp_dtype

    # --- thermalization with doubled A (SMC.c:110-125) ---
    # Chunked DETERMINISTICALLY (therm_chunk) so no single device program
    # outruns the TPU watchdog (~100 s). Wall-clock-sized chunks would
    # make seeded runs depend on host speed (ADVICE r1): the XLA sampler
    # is chunk-invariant, but the pallas engine's x/y pre-scale rounds at
    # each call boundary, so chunk sizes must be machine-independent.
    therm_acc = 0.0
    a_eff = cfg.proposal_a if opts.proposal_a is None else opts.proposal_a
    if params.eqsteps:
        therm_step = jax.jit(
            lambda s, k: run_sweeps(
                s, w, cfg, 2.0 * a_eff, k, collect_trace=False
            )[0],
            static_argnums=1,
        )
        chunk = therm_chunk(cfg)
        done_eq = 0
        therm_moves = 0
        state = state._replace(accepted=jnp.zeros_like(state.accepted))
        while done_eq < params.eqsteps:
            k = min(chunk, params.eqsteps - done_eq)
            state = _sync(therm_step(state, k))
            therm_moves += int(state.accepted)
            state = state._replace(accepted=jnp.zeros_like(state.accepted))
            done_eq += k
        therm_acc = therm_moves / (params.eqsteps * cfg.n)
        # Re-sync the energy after thermalization. The reference instead
        # restarts its production trace from the PRE-thermalization E[0]
        # (SMC.c:48,116,194), leaving a constant offset on the whole trace —
        # fixed here (docs/DEVIATIONS.md).
        state = state._replace(energy=total_energy_jit(state.r, w, cfg))

    # E[0] of the production trace: energy at production start (SMC.c:48).
    e_begin = float(state.energy)

    # --- main loop, windowed at the storage cadence (SMC.c:134-196) ---
    # The device-side accepted counter is int32; harvest + reset it every
    # chunk so reference-scale runs (1.6e10 moves) can't overflow it.
    # Large CNA passes leave the fused window (cna_hoist): device calls
    # then align with the lca cadence and the pass runs chunked in its
    # own bounded programs on the call-boundary snapshot — identical
    # counts (integer-exact partial histograms), no single-call spike.
    hoist = cna_hoist(cfg, 1, opts.clusters)
    if opts.clusters:
        warn_cna_spike(cfg, 1)
    scan_opts = replace(opts, clusters=False) if hoist else opts
    prod_moves = 0
    state = state._replace(accepted=jnp.zeros_like(state.accepted))
    windows: list[GatherOut] = []
    done = 0
    t1 = time.perf_counter()
    widx = 0
    snap = snapshot_to_host(state) if max_fault_retries else None
    faults = 0
    while done < gather_steps:
        g = min(cfg.storage_time, gather_steps - done)
        # Split the window into device calls bounded by the runtime
        # watchdog (config.max_gathers_per_call); I/O cadence unchanged.
        # The window is TRANSACTIONAL: a device fault mid-window discards
        # its partial chunks, restores the window-start snapshot, and
        # replays; prod_moves only commits on window success.
        try:
            chunks = []
            cna_rows = []
            moves_w = 0
            sub_done = 0
            while sub_done < g:
                sub = min(gathers_per_call(cfg, lapse, 1,
                                           opts.clusters and not hoist),
                          g - sub_done)
                if hoist:
                    # end calls at every lca-cadence point so the pass
                    # runs on exactly the snapshot the fused scan saw
                    sub = min(sub, cfg.lca_time
                              - (done + sub_done) % cfg.lca_time)
                state, part = simulate_window(
                    state, w, cfg, lapse, sub, jnp.int32(done + sub_done),
                    scan_opts
                )
                state = _sync(state)
                moves_w += int(state.accepted)
                state = state._replace(accepted=jnp.zeros_like(state.accepted))
                if hoist and (done + sub_done + sub) % cfg.lca_time == 0:
                    h1, h2, h3 = cna_hoisted_histograms(state.r[None], cfg)
                    cna_rows.append((sub_done + sub - 1,
                                     h1[0], h2[0], h3[0]))
                chunks.append(part)
                sub_done += sub
            # The trace readback is device work too (concat + D2H): a
            # fault surfacing here must retry like one in the sweeps.
            out = (chunks[0] if len(chunks) == 1
                   else jax.tree.map(lambda *xs: jnp.concatenate(xs),
                                     *chunks))
            out = jax.tree.map(np.asarray, out)
            if cna_rows:
                l1n, l2n, l3n = (np.array(out.l1), np.array(out.l2),
                                 np.array(out.l3))
                for ridx, h1, h2, h3 in cna_rows:
                    l1n[ridx], l2n[ridx], l3n[ridx] = h1, h2, h3
                out = out._replace(l1=l1n, l2=l2n, l3=l3n)
        except Exception as exc:  # noqa: BLE001
            if snap is None or faults >= max_fault_retries \
                    or not is_device_fault(exc):
                raise
            faults += 1
            print(f"\n[elastic] device fault in window {widx} "
                  f"(retry {faults}/{max_fault_retries}): "
                  f"{str(exc).splitlines()[0][:120]}", flush=True)
            state = restore_from_host(snap)
            continue
        faults = 0
        prod_moves += moves_w
        verdict = on_window(widx, state, out) if on_window is not None else None
        windows.append(out)
        done += g
        widx += 1
        if snap is not None:
            snap = snapshot_to_host(state)
        if verdict == "stop":  # graceful early stop (signal/failure hook)
            gather_steps = done
            break
    elapsed = time.perf_counter() - t1
    total_sweeps = gather_steps * lapse
    sps = total_sweeps / elapsed if elapsed > 0 else float("nan")

    # --- post-processing (SMC.c:204-256) ---
    kinetic = 1.5 * cfg.n * cfg.temperature
    cat = lambda name: np.concatenate([getattr(o, name) for o in windows], axis=0)
    e_trace = (
        np.concatenate([o.energy_trace.reshape(-1) for o in windows]) + kinetic
        if opts.collect_sweep_trace
        else np.zeros((0,))
    )
    a_trace = (
        np.concatenate([o.accept_trace.reshape(-1) for o in windows])
        if opts.collect_sweep_trace
        else np.zeros((0,), np.int32)
    )
    p_trace = cat("pressure") + cfg.rho * cfg.temperature

    if opts.collect_sweep_trace and e_trace.size:
        e_full = np.concatenate([[e_begin + kinetic], e_trace])
        me, ve = float(np.mean(e_full)), float(np.var(e_full))
        acf = np.asarray(
            autocorrelation(np.asarray(e_full), cfg.kmax, mode=acf_mode)
        )
        tau = float(np.sum(acf))
        if not np.isfinite(tau):
            # zero-variance trace (dilute/tiny configs): the ACF is 0/0
            # (the reference would divide by C_H[0]=0 too, SMC.c:1085)
            tau = 0.0
        tauint = max(1, int(np.floor(abs(tau))))
        sub = e_full[::tauint]
        cv_strided = (
            float(np.sum((sub - me) ** 2) / max(1, len(sub) - 1))
            / cfg.temperature ** 2
        )
        acceptance = float(np.mean(a_trace)) / cfg.n
    else:
        e_full = np.zeros((0,))
        me = float(state.energy) + kinetic
        ve = float("nan")
        acf = np.zeros((0,))
        tau = float("nan")
        cv_strided = float("nan")
        acceptance = prod_moves / (total_sweeps * cfg.n)

    l1s = cat("l1")
    # number of LCA-cadence passes actually executed (SMC.c:143 cadence),
    # NOT the number that found bonded pairs — dilute systems mostly find
    # none and the mean must reflect that.
    lca_passes = max(1, gather_steps // cfg.lca_time)
    l2 = cat("l2").reshape(-1, 7).sum(axis=0) / lca_passes
    l3 = cat("l3").reshape(-1, 7).sum(axis=0) / lca_passes

    gr = cat("gr").reshape(gather_steps, -1).mean(axis=0) if opts.gr_bins else None
    zp = cat("zprof").reshape(gather_steps, -1).mean(axis=0) if opts.z_bins else None
    wdu = (cat("widom_du").reshape(gather_steps, 1, opts.widom_k)
           if opts.widom_k else None)
    wz = (cat("widom_z").reshape(gather_steps, 1, opts.widom_k)
          if opts.widom_k else None)
    pn_prof = (cat("pn").reshape(gather_steps, -1).mean(axis=0)
               if opts.ptensor_bins else None)
    pt_prof = (cat("pt").reshape(gather_steps, -1).mean(axis=0)
               if opts.ptensor_bins else None)

    results = SimResults(
        mean_energy=me,
        std_energy=float(np.sqrt(ve)),
        mean_pressure=float(np.mean(p_trace)),
        std_pressure=float(np.std(p_trace)),
        acceptance_ratio=acceptance,
        cv=ve / (cfg.temperature ** 2),
        cv_strided=cv_strided,
        tau=tau,
        acf=acf,
        r_final=np.asarray(state.r),
        l1=float(np.sum(l1s)) / lca_passes,
        l2=l2,
        l3=l3,
        energy_trace=e_trace,
        energy_trace_full=e_full,
        accept_trace=a_trace,
        pressure_trace=p_trace,
        density=np.asarray(state.density).reshape(cfg.ncx, cfg.ncx, cfg.ncz),
        mobility=np.asarray(state.mobility).reshape(cfg.ncx, cfg.ncx, cfg.ncz),
        gr=gr,
        zprofile=zp,
        therm_acceptance=therm_acc,
        sweeps_per_second=sps,
        widom_du=wdu,
        widom_z=wz,
        pn=pn_prof,
        pt=pt_prof,
    )
    return state, results
