"""Ensemble driver: many independent chains advanced together.

This is the product replacement for the reference's MPI replica model
(one chain per rank, per-rank output files, offline aggregation —
SURVEY §5.8). All chains run in one jitted program with a leading [C]
axis (shardable over a mesh); outputs keep the reference's per-rank file
naming with rank = chain index, plus the cross-chain aggregation the
reference left to offline scripts.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import RunParams, SMCConfig
from .driver import GatherOut, ObservableOptions, SimResults, _sync
from .ensemble import ensemble_sweeps, ensemble_sweeps_pallas
from .observables import (
    autocorrelation,
    cluster_analysis,
    cluster_histograms,
    density_mobility_update,
    radial_distribution,
    z_density_profile,
)
from .potentials import total_energy, total_energy_jit, total_pressure
from .state import ChainState



from .observables import wall_obs_chains as _wall_obs


def _gather_step_batched(
    state: ChainState,
    w: jax.Array,
    cfg: SMCConfig,
    gather_lapse: int,
    gather_index: jax.Array,
    opts: ObservableOptions,
    mesh=None,
) -> tuple[ChainState, GatherOut]:
    """Batched version of driver._gather_step: every observable vmapped
    over the chain axis. Trace shapes gain a trailing [C].

    `mesh`: multi-device runs. The XLA engine needs no special casing —
    the chain axis of the INPUT state is sharded and GSPMD partitions
    the whole program (chains never communicate). The pallas engine's
    kernel is a custom call GSPMD cannot split, so it goes through the
    shard_map wrapper explicitly; the observables around it still
    auto-partition."""
    dtype = cfg.jnp_dtype
    a_eff = cfg.proposal_a if opts.proposal_a is None else opts.proposal_a
    # A tuned override goes through the ladder-mode (A, T) data rows on
    # the pallas engine: the kernel's static `a` stays at its one
    # ladder-mode compile key instead of recompiling per tuned value.
    at = (None if opts.proposal_a is None
          else (opts.proposal_a, float(cfg.temperature)))
    if opts.sampler == "zsorted":
        # Large-N fast path (N>=1024 measured faster than dense —
        # docs/PERF_NOTES.md): exact z-block skipping, c_tile 128 (the
        # 256-lane tile dilutes the per-block z envelope), N-dependent
        # sort cadence (odd lapses cost one short final chunk, never a
        # cadence collapse), HBM-streamed kernel beyond VMEM capacity.
        # A tuned A routes through the ladder-mode (A, T) data rows, so
        # tuned runs keep the fast engine with ONE compile key.
        if mesh is not None:
            from .ensemble import ensemble_sweeps_zsorted_sharded

            state, trace = ensemble_sweeps_zsorted_sharded(
                state, w, cfg, a_eff, gather_lapse, seed=opts.stream_seed,
                mesh=mesh, c_tile=128, uniform_at=at,
            )
        else:
            from .ensemble import ensemble_sweeps_zsorted

            state, trace = ensemble_sweeps_zsorted(
                state, w, cfg, a_eff, gather_lapse, seed=opts.stream_seed,
                c_tile=128, uniform_at=at,
            )
    elif opts.sampler == "pallas":
        if mesh is not None:
            from .ensemble import ensemble_sweeps_pallas_sharded

            state, trace = ensemble_sweeps_pallas_sharded(
                state, w, cfg, a_eff, gather_lapse, seed=opts.stream_seed,
                mesh=mesh, uniform_at=at,
            )
        else:
            state, trace = ensemble_sweeps_pallas(
                state, w, cfg, a_eff, gather_lapse, seed=opts.stream_seed,
                uniform_at=at,
            )
    else:
        state, trace = ensemble_sweeps(
            state, w, cfg, a_eff, gather_lapse,
            collect_trace=opts.collect_sweep_trace,
            stream_seed=opts.stream_seed,
        )

    if cfg.recompute_every:
        # Resync cadence keyed to the ABSOLUTE chain time (state.sweeps
        # rides the checkpoint; all chains advance in lockstep), not the
        # run-relative gather index — a resumed run then resyncs at the
        # same chain times as the uninterrupted one (round-5 hardware
        # drill; see driver._gather_step for the full rationale).
        state = jax.lax.cond(
            (state.sweeps.reshape(-1)[0] // gather_lapse)
            % cfg.recompute_every == 0,
            lambda s: s._replace(
                energy=_wall_obs(lambda r, wc: total_energy(r, wc, cfg),
                                 s.r, w, cfg.n)
            ),
            lambda s: s,
            state,
        )

    # O(N^2) per-chain observables go through vmap_chains_bounded: the
    # [C, N, N] pair temporaries of a whole-ensemble vmap OOM HBM at
    # large N (52 GB at N=1024 x 512 chains, measured); small problems
    # keep the exact old single-vmap lowering (compile cache intact).
    from .observables import vmap_chains_bounded

    p = (
        _wall_obs(lambda r, wc: total_pressure(r, wc, cfg),
                  state.r, w, cfg.n)
        if opts.pressure
        else jnp.zeros((state.r.shape[0],), dtype)
    )

    rbin, density, mobility = jax.vmap(
        lambda r, b, d, m: density_mobility_update(r, b, d, m, cfg)
    )(state.r, state.rbin, state.density, state.mobility)
    state = state._replace(rbin=rbin, density=density, mobility=mobility)

    c = state.r.shape[0]
    if opts.clusters:
        from .observables import obs_chain_batch_cna

        def do_lca(r):
            return vmap_chains_bounded(
                lambda ri: cluster_histograms(cluster_analysis(ri, cfg)),
                r, cfg.n, batch=obs_chain_batch_cna(cfg.n))

        def skip_lca(r):
            return (
                jnp.zeros((c,), jnp.int32),
                jnp.zeros((c, 7), jnp.int32),
                jnp.zeros((c, 7), jnp.int32),
            )

        l1, l2, l3 = jax.lax.cond(
            (gather_index + 1) % cfg.lca_time == 0, do_lca, skip_lca, state.r
        )
    else:
        l1 = jnp.zeros((c,), jnp.int32)
        l2 = jnp.zeros((c, 7), jnp.int32)
        l3 = jnp.zeros((c, 7), jnp.int32)

    gr = (
        vmap_chains_bounded(
            lambda r: radial_distribution(r, cfg, nbins=opts.gr_bins)[1],
            state.r, cfg.n)
        if opts.gr_bins
        else jnp.zeros((c, 0), jnp.float32)
    )
    zp = (
        jax.vmap(lambda r: z_density_profile(r, cfg, nbins=opts.z_bins)[1])(
            state.r
        )
        if opts.z_bins
        else jnp.zeros((c, 0), jnp.float32)
    )

    if opts.collect_sweep_trace:
        e_tr, a_tr = trace.energy, trace.accepted  # [lapse, C]
        if cfg.recompute_every:
            # The gather-boundary trace entry reports the STATE's energy
            # at this chain time (post-resync when the cadence fired; a
            # bitwise no-op otherwise). This is also exactly what a
            # checkpoint taken here stores, so a resumed run's first
            # data row is byte-identical to the uninterrupted run's
            # (round-5 hardware drill: the old tracked-value row
            # differed from the resumed exact row by 1 f32 ulp).
            e_tr = e_tr.at[-1].set(state.energy)
    else:
        e_tr = jnp.zeros((0, c), dtype)
        a_tr = jnp.zeros((0, c), jnp.int32)

    if opts.widom_k:
        from .widom import widom_delta_u

        keys = jax.vmap(
            lambda kc: jax.random.fold_in(kc, gather_index)
        )(state.key)
        if w.ndim == 3:  # quenched per-chain wall tables [C, M*M, 2]
            wdu, wz = jax.vmap(
                lambda r, kc, wc: widom_delta_u(r, wc, cfg, kc, opts.widom_k)
            )(state.r, keys, w)
        else:
            wdu, wz = jax.vmap(
                lambda r, kc: widom_delta_u(r, w, cfg, kc, opts.widom_k)
            )(state.r, keys)
    else:
        wdu = jnp.zeros((c, 0), dtype)
        wz = jnp.zeros((c, 0), dtype)

    if opts.ptensor_bins:
        from .observables import pressure_tensor_profile

        pn, pt = vmap_chains_bounded(
            lambda ri: pressure_tensor_profile(
                ri, cfg, nbins=opts.ptensor_bins)[1:],
            state.r, cfg.n)
    else:
        pn = jnp.zeros((c, 0), jnp.float32)
        pt = jnp.zeros((c, 0), jnp.float32)

    return state, GatherOut(e_tr, a_tr, p, l1, l2, l3, gr, zp, wdu, wz,
                            pn, pt)


@partial(jax.jit, static_argnames=("cfg", "gather_lapse", "n_gathers",
                                   "opts", "mesh"))
def simulate_window_batched(
    state: ChainState,
    w: jax.Array,
    cfg: SMCConfig,
    gather_lapse: int,
    n_gathers: int,
    gather_offset: jax.Array,
    opts: ObservableOptions,
    mesh=None,
) -> tuple[ChainState, GatherOut]:
    def body(carry, k):
        return _gather_step_batched(
            carry, w, cfg, gather_lapse, gather_offset + k, opts, mesh=mesh
        )

    return jax.lax.scan(body, state, jnp.arange(n_gathers))


class EnsembleResults(NamedTuple):
    chains: list                    # per-chain SimResults
    mean_energy: float              # ensemble mean of chain means
    std_energy: float               # std of chain means (replica error bar)
    mean_pressure: float
    std_pressure: float
    acceptance_ratio: float
    gr: np.ndarray | None           # ensemble-pooled g(r)
    zprofile: np.ndarray | None
    therm_acceptance: float
    sweeps_per_second: float        # aggregate across chains
    # gather-averaged per-chain profiles [C, bins] (None unless sampled);
    # lets wall-disorder runs resolve structure per realization
    gr_chains: np.ndarray | None = None
    zprofile_chains: np.ndarray | None = None
    # Widom ghost samples [gathers, chains, widom_k] (None unless
    # opts.widom_k): feed widom.mu_ex / mu_ex_profile directly.
    widom_du: np.ndarray | None = None
    widom_z: np.ndarray | None = None
    # ensemble-pooled pressure-tensor profiles [ptensor_bins]
    pn: np.ndarray | None = None
    pt: np.ndarray | None = None


def simulate_ensemble(
    cfg: SMCConfig,
    params: RunParams,
    state: ChainState,
    w: jax.Array,
    opts: ObservableOptions = ObservableOptions(),
    on_window=None,
    acf_mode: str = "reference",
    mesh=None,
    max_fault_retries: int = 2,
) -> tuple[ChainState, EnsembleResults]:
    """Ensemble run: thermalization + windowed main loop + per-chain and
    pooled post-processing. `state` must carry a leading chain axis.

    `mesh`: chains sharded over the mesh's "chains" axis (state should be
    placed with ensemble.shard_ensemble first); zero cross-device traffic
    during sweeps, exactly the reference's replica model over ICI.

    `max_fault_retries`: per-window device-fault retries from a host
    snapshot (driver.snapshot_to_host semantics); 0 disables."""
    import time as _time

    lapse = params.gather_lapse
    gather_steps = params.gather_steps
    n_chains = state.r.shape[0]
    kinetic = 1.5 * cfg.n * cfg.temperature
    # per-chain wall tables (w [C, M*M, 2], quenched disorder) work on
    # every engine: the XLA path vmaps them, the kernel engines load
    # them as [s_pad, C] coefficient planes (sweep_pallas.per_chain_w)

    therm_acc = 0.0
    a_eff = cfg.proposal_a if opts.proposal_a is None else opts.proposal_a
    at2 = (None if opts.proposal_a is None
           else (2.0 * opts.proposal_a, float(cfg.temperature)))
    if params.eqsteps:
        # DETERMINISTIC chunks (driver.therm_chunk): the pallas engine's
        # per-call boundary rounding means wall-clock-sized chunks would
        # make seeded runs host-speed-dependent (ADVICE r1); each chunk
        # stays far under the TPU runtime watchdog by construction.
        if opts.sampler == "zsorted":
            # Tuned A rides the ladder-mode (A, T) rows (CLAUDE.md: a
            # run-varying mobility must never be the Mosaic static).
            def therm_step(s, k):
                if mesh is not None:
                    from .ensemble import ensemble_sweeps_zsorted_sharded

                    return ensemble_sweeps_zsorted_sharded(
                        s, w, cfg, 2.0 * a_eff, k, seed=opts.stream_seed,
                        mesh=mesh, c_tile=128, uniform_at=at2,
                    )[0]
                from .ensemble import ensemble_sweeps_zsorted

                return ensemble_sweeps_zsorted(
                    s, w, cfg, 2.0 * a_eff, k, seed=opts.stream_seed,
                    c_tile=128, uniform_at=at2,
                )[0]
        elif opts.sampler == "pallas":
            def therm_step(s, k):
                if mesh is not None:
                    from .ensemble import ensemble_sweeps_pallas_sharded

                    return ensemble_sweeps_pallas_sharded(
                        s, w, cfg, 2.0 * a_eff, k, seed=opts.stream_seed,
                        mesh=mesh, uniform_at=at2,
                    )[0]
                return ensemble_sweeps_pallas(
                    s, w, cfg, 2.0 * a_eff, k, seed=opts.stream_seed,
                    uniform_at=at2,
                )[0]
        else:
            def therm_step(s, k):
                return ensemble_sweeps(
                    s, w, cfg, 2.0 * a_eff, k, collect_trace=False,
                    stream_seed=opts.stream_seed,
                )[0]
        therm_step = jax.jit(therm_step, static_argnums=1)
        from .driver import therm_chunk

        chunk = therm_chunk(cfg, sampler=opts.sampler)
        done_eq = 0
        therm_moves = 0.0
        state = state._replace(accepted=jnp.zeros_like(state.accepted))
        while done_eq < params.eqsteps:
            k = min(chunk, params.eqsteps - done_eq)
            state = _sync(therm_step(state, k))
            therm_moves += float(np.asarray(state.accepted, np.int64).mean())
            state = state._replace(accepted=jnp.zeros_like(state.accepted))
            done_eq += k
        therm_acc = therm_moves / (params.eqsteps * cfg.n)
        # Post-therm exact resync — bounded like every other O(N^2)
        # observable (an unbounded whole-ensemble vmap is the 52 GB OOM).
        state = state._replace(
            energy=jax.jit(
                lambda r: _wall_obs(lambda ri, wc: total_energy(ri, wc, cfg),
                                    r, w, cfg.n))(state.r)
        )

    e_begin = np.asarray(state.energy)  # [C]
    # Harvest + reset the int32 accepted counters per chunk (overflow-safe
    # for reference-scale runs).
    prod_moves = np.zeros((n_chains,), np.int64)
    state = state._replace(accepted=jnp.zeros_like(state.accepted))

    windows: list[GatherOut] = []
    done = 0
    widx = 0
    t1 = _time.perf_counter()
    from .driver import is_device_fault, restore_from_host, snapshot_to_host

    # mesh runs: the snapshot restore below re-uploads with default
    # placement; re-shard so replayed windows keep the same layout.
    def _restore(s):
        s = restore_from_host(s)
        if mesh is not None:
            from .ensemble import shard_ensemble

            s = shard_ensemble(s, mesh)
        return s

    # Large CNA passes leave the fused window (driver.cna_hoist): calls
    # align with the lca cadence and each pass runs chunked in bounded
    # device programs on the call-boundary snapshot — identical counts
    # (integer-exact partial histograms), no single-call MXU spike near
    # the ~100 s runtime watchdog.
    from dataclasses import replace as _dc_replace

    from .driver import cna_hoist, cna_hoisted_histograms, warn_cna_spike

    hoist = cna_hoist(cfg, n_chains, opts.clusters)
    if opts.clusters:
        warn_cna_spike(cfg, n_chains)
    scan_opts = _dc_replace(opts, clusters=False) if hoist else opts
    snap = snapshot_to_host(state) if max_fault_retries else None
    faults = 0
    while done < gather_steps:
        g = min(cfg.storage_time, gather_steps - done)
        # Split the window into device calls bounded by the runtime
        # watchdog (config.max_gathers_per_call); I/O cadence unchanged.
        # Transactional per window: a device fault discards the partial
        # window, restores the host snapshot, and replays (see driver).
        try:
            chunks = []
            cna_rows = []
            moves_w = np.zeros_like(prod_moves)
            sub_done = 0
            while sub_done < g:
                from .driver import gathers_per_call

                sub = min(gathers_per_call(cfg, lapse, n_chains,
                                           opts.clusters and not hoist),
                          g - sub_done)
                if hoist:
                    # end calls at every lca-cadence point so the pass
                    # runs on exactly the snapshot the fused scan saw
                    sub = min(sub, cfg.lca_time
                              - (done + sub_done) % cfg.lca_time)
                state, part = simulate_window_batched(
                    state, w, cfg, lapse, sub, jnp.int32(done + sub_done),
                    scan_opts, mesh=mesh,
                )
                state = _sync(state)
                moves_w += np.asarray(state.accepted, np.int64)
                state = state._replace(accepted=jnp.zeros_like(state.accepted))
                if hoist and (done + sub_done + sub) % cfg.lca_time == 0:
                    cna_rows.append((sub_done + sub - 1,)
                                    + cna_hoisted_histograms(state.r, cfg))
                chunks.append(part)
                sub_done += sub
            # Trace readback is device work too — retryable (see driver).
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
            state = _restore(snap)
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
    elapsed = _time.perf_counter() - t1
    total_sweeps = gather_steps * lapse
    sps = total_sweeps * n_chains / elapsed if elapsed > 0 else float("nan")

    cat = lambda name, ax=0: np.concatenate(
        [getattr(o, name) for o in windows], axis=ax
    )
    p_traces = cat("pressure") + cfg.rho * cfg.temperature      # [G, C]
    l1s = cat("l1")                                             # [G, C]
    l2s = cat("l2").reshape(-1, n_chains, 7)
    l3s = cat("l3").reshape(-1, n_chains, 7)
    # LCA-cadence passes actually executed (not just those finding pairs).
    n_lca = max(1, gather_steps // cfg.lca_time)

    if opts.collect_sweep_trace:
        e_traces = (
            np.concatenate([o.energy_trace.reshape(-1, n_chains) for o in windows])
            + kinetic
        )                                                        # [S, C]
        a_traces = np.concatenate(
            [o.accept_trace.reshape(-1, n_chains) for o in windows]
        )
    else:
        e_traces = np.zeros((0, n_chains))
        a_traces = np.zeros((0, n_chains), np.int32)

    density = np.asarray(state.density).reshape(n_chains, cfg.ncx, cfg.ncx, cfg.ncz)
    mobility = np.asarray(state.mobility).reshape(
        n_chains, cfg.ncx, cfg.ncx, cfg.ncz
    )

    per_chain: list[SimResults] = []
    for ci in range(n_chains):
        if opts.collect_sweep_trace and e_traces.size:
            e_full = np.concatenate([[e_begin[ci] + kinetic], e_traces[:, ci]])
            me, ve = float(np.mean(e_full)), float(np.var(e_full))
            acf = np.asarray(
                autocorrelation(np.asarray(e_full), cfg.kmax, mode=acf_mode)
            )
            tau = float(np.sum(acf))
            if not np.isfinite(tau):
                # zero-variance trace (dilute/tiny configs): ACF is 0/0
                tau = 0.0
            tauint = max(1, int(np.floor(abs(tau))))
            sub = e_full[::tauint]
            cv_strided = (
                float(np.sum((sub - me) ** 2) / max(1, len(sub) - 1))
                / cfg.temperature ** 2
            )
            acc = float(np.mean(a_traces[:, ci])) / cfg.n
        else:
            e_full = np.zeros((0,))
            me = float(state.energy[ci]) + kinetic
            ve = float("nan")
            acf = np.zeros((0,))
            tau = float("nan")
            cv_strided = float("nan")
            acc = float(prod_moves[ci] / (total_sweeps * cfg.n))
        per_chain.append(
            SimResults(
                mean_energy=me,
                std_energy=float(np.sqrt(ve)),
                mean_pressure=float(np.mean(p_traces[:, ci])),
                std_pressure=float(np.std(p_traces[:, ci])),
                acceptance_ratio=acc,
                cv=ve / cfg.temperature ** 2,
                cv_strided=cv_strided,
                tau=tau,
                acf=acf,
                r_final=np.asarray(state.r[ci]),
                l1=float(np.sum(l1s[:, ci])) / n_lca,
                l2=l2s[:, ci].sum(axis=0) / n_lca,
                l3=l3s[:, ci].sum(axis=0) / n_lca,
                energy_trace=e_traces[:, ci] if e_traces.size else np.zeros((0,)),
                energy_trace_full=e_full,
                accept_trace=a_traces[:, ci] if a_traces.size else np.zeros((0,)),
                pressure_trace=p_traces[:, ci],
                density=density[ci],
                mobility=mobility[ci],
                gr=None,
                zprofile=None,
                therm_acceptance=therm_acc,
                sweeps_per_second=sps / n_chains,
            )
        )

    chain_means = np.asarray([c.mean_energy for c in per_chain])
    chain_ps = np.asarray([c.mean_pressure for c in per_chain])
    gr = gr_c = zp = zp_c = None
    if opts.gr_bins:
        g_all = cat("gr").reshape(-1, n_chains, opts.gr_bins)
        gr = g_all.mean(axis=(0, 1))
        gr_c = g_all.mean(axis=0)       # [C, bins]
    if opts.z_bins:
        z_all = cat("zprof").reshape(-1, n_chains, opts.z_bins)
        zp = z_all.mean(axis=(0, 1))
        zp_c = z_all.mean(axis=0)
    wdu = (cat("widom_du").reshape(-1, n_chains, opts.widom_k)
           if opts.widom_k else None)
    wz = (cat("widom_z").reshape(-1, n_chains, opts.widom_k)
          if opts.widom_k else None)
    pn_prof = (cat("pn").reshape(-1, n_chains, opts.ptensor_bins)
               .mean(axis=(0, 1)) if opts.ptensor_bins else None)
    pt_prof = (cat("pt").reshape(-1, n_chains, opts.ptensor_bins)
               .mean(axis=(0, 1)) if opts.ptensor_bins else None)

    agg = EnsembleResults(
        chains=per_chain,
        mean_energy=float(np.mean(chain_means)),
        std_energy=float(np.std(chain_means)),
        mean_pressure=float(np.mean(chain_ps)),
        std_pressure=float(np.std(chain_ps)),
        acceptance_ratio=float(np.mean([c.acceptance_ratio for c in per_chain])),
        gr=gr,
        zprofile=zp,
        therm_acceptance=therm_acc,
        sweeps_per_second=sps,
        gr_chains=gr_c,
        zprofile_chains=zp_c,
        widom_du=wdu,
        widom_z=wz,
        pn=pn_prof,
        pt=pt_prof,
    )
    return state, agg
