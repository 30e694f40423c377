"""Temperature-sweep driver: many temperatures, one compiled program.

The reference fixes T per process invocation (argv, main.c:18) — mapping
a phase curve E(T), acceptance(T), c_v(T) means one run per temperature.
Here temperature is a TRACED per-chain value in the sampler's
proposal/acceptance arithmetic (sampler.sweep(temperature=...)), so a
whole temperature ladder runs as ONE vmapped ensemble in one jitted
program: chains_per_t replicas at each of the len(temps) temperatures,
zero recompiles across T. The proposal mobility follows A = gamma * T
per chain (main.c:48-51), and thermalization doubles it (SMC.c:110,125).

Output: `tsweep_*.csv` with one row per temperature —
    T, E_mean, E_err, acceptance, cv
where E carries the reference's 3NT/2 kinetic offset (SMC.c:210-211),
E_err is the replica error bar (spread of chain means / sqrt(chains)),
and cv = var(E)/T^2 (SMC.c:249) pooled over the T's chains.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import RunParams, SMCConfig
from .sampler import sweep_state
from .state import ChainState, init_ensemble_state


class TSweepResults(NamedTuple):
    temps: np.ndarray          # [T]
    mean_energy: np.ndarray    # [T] incl. 3NT/2
    err_energy: np.ndarray     # [T] replica error bar
    acceptance: np.ndarray     # [T]
    cv: np.ndarray             # [T] var(E)/T^2 from the pooled trace
    # raw per-gather POTENTIAL energies [gathers, T, chains_per_t]
    # (no kinetic offset) — the input MBAR reweighting needs (reweight.py)
    energy_samples: np.ndarray | None = None
    # paired (virial pressure, energy) samples taken at device-call
    # boundaries [B, T, chains_per_t]: the coarser cadence is fine — MBAR
    # needs (E, O) PAIRS, and B x chains is plenty of pairs (reweight.py
    # turns them into P(T) curves; ideal rho*T added at output)
    pressure_samples: np.ndarray | None = None
    energy_at_pressure: np.ndarray | None = None
    # paired FIELD samples at the same boundaries (gr_bins/z_bins > 0):
    # per-configuration g(r) and rho(z) histograms, [B, T, chains_per_t,
    # bins] — reweight.py turns them into continuous g(r; T) / rho(z; T)
    # fields (the reference's density maps, plotting.jl:123-201, exist
    # only at the simulated T)
    gr_samples: np.ndarray | None = None
    zprofile_samples: np.ndarray | None = None
    # paired in-plane structure-factor samples [B, T, chains_per_t,
    # shells] (sk_kmax > 0) -> continuous S(k; T) via MBAR
    sk_samples: np.ndarray | None = None
    # paired pressure-tensor samples [B, T, chains_per_t, nb]
    # (ptensor_bins > 0): VIRIAL-ONLY P_N/P_T parts plus the matching
    # rho(z) histograms — reweight.py reassembles
    # P(z;T') = rho(z;T') T' + virial(z;T') so the ideal term carries
    # the TARGET temperature, and integrates the wall tension gamma(T)
    ptensor_n_samples: np.ndarray | None = None
    ptensor_t_samples: np.ndarray | None = None
    ptensor_rho_samples: np.ndarray | None = None
    # paired Widom ghost energies [B, T, chains_per_t, widom_k]
    # (widom_k > 0): both the configuration weight AND the insertion
    # factor reweight exactly to any T' (widom.mu_ex_reweighted), giving
    # a continuous mu_ex(T) — free-energy machinery with no reference
    # analog
    widom_samples: np.ndarray | None = None
    # aggregate production throughput, chain-sweeps/s across ALL ladder
    # chains (thermalization excluded — same semantics as
    # SimResults.sweeps_per_second; main.c:131's "s per million" analog)
    sweeps_per_second: float | None = None


# canonical per-chain-wall E0 recompute (shared by cli/pt/dryrun)
from .state import per_chain_wall_energy as _per_chain_energy


def _multi_t_sweeps(state, w, cfg, temps_c, a_scale, n_sweeps,
                    collect_trace, a_c=None):
    """n_sweeps sweeps with a PER-CHAIN temperature array temps_c [C];
    shared per-sweep offset like ensemble_sweeps (chunk-invariant).
    a_c [C]: per-chain base mobility (default gamma*T, main.c:48-51;
    a tuned ladder passes its own — tuning.tune_mobility_ladder)."""
    if a_c is None:
        a_c = cfg.gamma * temps_c

    def body(st, _):
        okey = jax.random.fold_in(st.key[0], 0x5EED)
        offset = jax.random.randint(okey, (), 0, cfg.n)
        if w.ndim == 3:
            # per-chain wall tables (quenched disorder ladders): the
            # realization axis lives in the replica index, so every
            # level of one ladder instance shares one wall and PT swaps
            # (which travel the temperature axis within a replica
            # column) never cross realizations
            st, stats = jax.vmap(
                lambda s, wc, t, a: sweep_state(
                    s, wc, cfg, a_scale * a, offset=offset,
                    temperature=t)
            )(st, w, temps_c, a_c)
        else:
            st, stats = jax.vmap(
                lambda s, t, a: sweep_state(
                    s, w, cfg, a_scale * a, offset=offset,
                    temperature=t)
            )(st, temps_c, a_c)
        return st, stats if collect_trace else None

    return jax.lax.scan(body, state, None, length=n_sweeps)


@partial(jax.jit, static_argnames=("cfg", "n_sweeps", "a_scale",
                                   "collect_trace"))
def _multi_t_block(state, w, cfg, temps_c, a_scale, n_sweeps,
                   collect_trace=False, a_c=None):
    return _multi_t_sweeps(state, w, cfg, temps_c, a_scale, n_sweeps,
                           collect_trace, a_c=a_c)


def _ladder_block(state, w, cfg, temps_c, a_scale, n_sweeps, sampler,
                  collect_trace=False, a_c=None, mesh=None):
    """One device block of the ladder through the chosen engine. The
    pallas engine runs the whole ladder via PER-CHAIN (A, T) kernel rows
    (ensemble.ensemble_sweeps_pallas a_per_chain/t_per_chain): one kernel
    compile covers every temperature and the thermalization doubling —
    and equally a per-level TUNED mobility ladder (a_c).

    mesh: chain axis sharded over the mesh. The XLA engine needs nothing
    special (state/temps arrive sharded; GSPMD partitions the program);
    the pallas engine goes through the shard_map wrapper with the (A, T)
    rows sharded alongside the state."""
    if sampler in ("pallas", "zsorted"):
        from . import ensemble as ens

        base = cfg.gamma * temps_c if a_c is None else a_c
        if sampler == "zsorted":
            # Ladder at zsorted speed: the (A, T) rows are CHAIN-indexed,
            # so the engine's per-chunk particle sorts never touch them
            # (ensemble_sweeps_zsorted docstring).
            if mesh is not None:
                state, stats = ens.ensemble_sweeps_zsorted_sharded(
                    state, w, cfg, 0.0, n_sweeps, seed=None, mesh=mesh,
                    c_tile=128,
                    a_per_chain=a_scale * base, t_per_chain=temps_c)
            else:
                state, stats = ens.ensemble_sweeps_zsorted(
                    state, w, cfg, 0.0, n_sweeps, c_tile=128,
                    a_per_chain=a_scale * base, t_per_chain=temps_c)
        elif mesh is not None:
            state, stats = ens.ensemble_sweeps_pallas_sharded(
                state, w, cfg, 0.0, n_sweeps, seed=None, mesh=mesh,
                a_per_chain=a_scale * base, t_per_chain=temps_c)
        else:
            state, stats = ens.ensemble_sweeps_pallas(
                state, w, cfg, 0.0, n_sweeps,
                a_per_chain=a_scale * base, t_per_chain=temps_c)
        return state, (stats if collect_trace else None)
    return _multi_t_block(state, w, cfg, temps_c, a_scale, n_sweeps,
                          collect_trace, a_c=a_c)


def simulate_temperature_sweep(
    cfg: SMCConfig,
    params: RunParams,
    temps,
    key: jax.Array,
    chains_per_t: int = 16,
    r0: np.ndarray | None = None,
    w: np.ndarray | None = None,
    sampler: str = "xla",
    a_per_t=None,
    mesh=None,
    state0: ChainState | None = None,
    gr_bins: int = 0,
    z_bins: int = 0,
    sk_kmax: int = 0,
    widom_k: int = 0,
    ptensor_bins: int = 0,
) -> tuple[ChainState, TSweepResults]:
    """Run the full ladder: thermalization (A doubled) + production with
    per-sweep energy traces, pooled per temperature.

    a_per_t [n_t]: per-level proposal mobility overriding gamma*T (from
    tuning.tune_mobility_ladder); held fixed through the run.

    mesh: shard the flat chain axis (temperature-major) over the mesh's
    "chains" axis — multi-chip ladders. XLA engine: GSPMD partitions the
    whole program from the input sharding; pallas engine: shard_map.

    state0: resume from a full ladder ChainState (io.load_checkpoint of
    a previous ladder run's final state; same temperature-major layout).
    Callers usually pass eqsteps=0 when resuming — the chains are
    already thermalized."""
    from .driver import therm_chunk

    temps = np.asarray(temps, dtype=np.float64)
    n_t = len(temps)
    c = n_t * chains_per_t
    per_chain_w = w is not None and np.ndim(w) == 3
    if per_chain_w:
        # supported on every engine (kernels: [s_pad, C] wall planes)
        if np.shape(w)[0] != c:
            raise ValueError(f"per-chain wall table rows ({np.shape(w)[0]})"
                             f" != ladder chains ({c})")
    if state0 is not None:
        if state0.r.shape[0] != c:
            raise ValueError(
                f"resumed ladder state has {state0.r.shape[0]} chains; "
                f"this ladder needs {c} (= {n_t} temps x {chains_per_t})")
        state = state0
        from .system import build_walls

        w_arr = jnp.asarray(
            w if w is not None else build_walls(cfg)[0], cfg.jnp_dtype)
    else:
        state, w_arr = init_ensemble_state(
            cfg, key, c, r0=r0, w=None if per_chain_w else w)
        if per_chain_w:
            w_arr = jnp.asarray(w, cfg.jnp_dtype)
            state = state._replace(energy=_per_chain_energy(
                state.r, w_arr, cfg).astype(state.energy.dtype))
    temps_c = jnp.asarray(np.repeat(temps, chains_per_t), cfg.jnp_dtype)
    a_c = (None if a_per_t is None else jnp.asarray(
        np.repeat(np.asarray(a_per_t, np.float64), chains_per_t),
        cfg.jnp_dtype))
    if mesh is not None:
        # global_shard_put: also valid when the mesh spans processes
        # (the --global-ladder mode); key leaves shard by key_data shape.
        from .ensemble import global_shard_put

        assert c % mesh.shape["chains"] == 0, (c, dict(mesh.shape))
        state = jax.tree.map(lambda x: global_shard_put(x, mesh), state)
        temps_c = global_shard_put(temps_c, mesh)
        if a_c is not None:
            a_c = global_shard_put(a_c, mesh)

    # Deterministic watchdog-safe chunks (driver.therm_chunk: sized from
    # the O(N^2) sweep cost, machine-independent — ADVICE r1).
    chunk = therm_chunk(cfg, sampler=sampler)
    from .ensemble import fetch

    done = 0
    while done < params.eqsteps:
        k = min(params.eqsteps - done, chunk)
        state, _ = _ladder_block(state, w_arr, cfg, temps_c, 2.0, k,
                                 sampler, a_c=a_c, mesh=mesh)
        fetch(state.energy[:1])  # sync
        done += k
    state = state._replace(accepted=jnp.zeros_like(state.accepted))

    # Production: energies SUBSAMPLED at the gather cadence (the per-sweep
    # [S, C] trace of a reference-scale run would be terabytes; the other
    # drivers also sample observables per gather — params.numdata rules),
    # acceptance from the cumulative counters (overflow-harvested).
    lapse = max(1, params.gather_lapse)
    chunk_g = max(lapse, (chunk // lapse) * lapse)
    e_samples = []
    p_samples, e_at_p = [], []
    gr_s, zp_s, sk_s, wd_s, pn_s, pt_s, pr_s = [], [], [], [], [], [], []
    press_fn = _pressure_fn(cfg)
    fields_fn = (_fields_fn(cfg, gr_bins, z_bins, sk_kmax,
                            widom_k=widom_k, ptensor_bins=ptensor_bins)
                 if (gr_bins or z_bins or sk_kmax or widom_k
                     or ptensor_bins) else None)
    prod_moves = np.zeros((c,), np.int64)
    done = 0
    import time as _time

    prod_t0 = _time.time()
    while done < params.maxsteps:
        k = min(params.maxsteps - done, chunk_g)
        state, stats = _ladder_block(
            state, w_arr, cfg, temps_c, 1.0, k, sampler,
            collect_trace=True, a_c=a_c, mesh=mesh)
        e_samples.append(fetch(stats.energy)[lapse - 1::lapse])
        # paired (P, E) sample at the call boundary (one O(N^2) pass per
        # device call — the per-sweep trace stays energy-only)
        p_samples.append(fetch(press_fn(state.r, w_arr)))
        e_at_p.append(fetch(state.energy))
        if fields_fn is not None:
            gr_b, zp_b, sk_b, wd_b, pnt_b = fields_fn(
                state.r, state.key, jnp.int32(done), w_arr)
            if gr_b is not None:
                gr_s.append(fetch(gr_b))
            if zp_b is not None:
                zp_s.append(fetch(zp_b))
            if sk_b is not None:
                sk_s.append(fetch(sk_b))
            if wd_b is not None:
                wd_s.append(fetch(wd_b))
            if pnt_b is not None:
                pn_s.append(fetch(pnt_b[0]))
                pt_s.append(fetch(pnt_b[1]))
                pr_s.append(fetch(pnt_b[2]))
        prod_moves += fetch(state.accepted).astype(np.int64)
        state = state._replace(accepted=jnp.zeros_like(state.accepted))
        done += k
    # the loop body fetches every block, so prod wall is device-synced
    prod_sps = done * c / max(_time.time() - prod_t0, 1e-9)
    e_tr = np.concatenate(e_samples)         # [gathers, C]

    kinetic = 1.5 * cfg.n * temps            # 3NT/2 per T (SMC.c:210-211)
    e_t = e_tr.reshape(len(e_tr), n_t, chains_per_t)
    chain_means = e_t.mean(axis=0)           # [T, chains]
    mean_e = chain_means.mean(axis=1) + kinetic
    err_e = chain_means.std(axis=1) / max(1, chains_per_t - 1) ** 0.5
    acc = (prod_moves.reshape(n_t, chains_per_t).mean(axis=1)
           / (done * cfg.n))
    cv = e_t.reshape(len(e_tr), n_t, -1).var(axis=(0, 2)) / temps ** 2

    shape_t = (-1, n_t, chains_per_t)
    shape_f = (-1, n_t, chains_per_t)
    return state, TSweepResults(
        temps=temps, mean_energy=mean_e, err_energy=err_e,
        acceptance=np.asarray(acc), cv=np.asarray(cv),
        energy_samples=e_t,
        pressure_samples=np.stack(p_samples).reshape(shape_t),
        energy_at_pressure=np.stack(e_at_p).reshape(shape_t),
        gr_samples=(np.stack(gr_s).reshape(*shape_f, gr_bins)
                    if gr_s else None),
        zprofile_samples=(np.stack(zp_s).reshape(*shape_f, z_bins)
                          if zp_s else None),
        sk_samples=(np.stack(sk_s).reshape(*shape_f, np.shape(sk_s[-1])[-1])
                    if sk_s else None),
        widom_samples=(np.stack(wd_s).reshape(*shape_f, widom_k)
                       if wd_s else None),
        ptensor_n_samples=(np.stack(pn_s).reshape(*shape_f, ptensor_bins)
                           if pn_s else None),
        ptensor_t_samples=(np.stack(pt_s).reshape(*shape_f, ptensor_bins)
                           if pt_s else None),
        ptensor_rho_samples=(np.stack(pr_s).reshape(*shape_f,
                                                    ptensor_bins)
                             if pr_s else None),
        sweeps_per_second=prod_sps,
    )


import functools


@functools.lru_cache(maxsize=None)
def _fields_fn(cfg: SMCConfig, gr_bins: int, z_bins: int,
               sk_kmax: int = 0, widom_k: int = 0,
               ptensor_bins: int = 0):
    """Jitted per-chain field sampler: per-configuration g(r) / rho(z)
    histograms, the in-plane structure factor S(k), and/or Widom ghost
    energies for paired-sample reweighting (reweight.py). Returns
    fn(r, key, idx, w) -> (gr [C, gr_bins] | None, zp [C, z_bins] | None,
     sk [C, shells] | None, wdu [C, widom_k] | None).

    `key`/`idx`: per-chain keys and the call-boundary counter seeding
    the insertion stream (read-only fold — trajectories untouched, and
    a key an engine left stale still yields fresh draws per boundary).
    `w`: wall table for the ghost wall term ([M*M, 2] shared or
    [C, M*M, 2] quenched per-chain) — a traced ARGUMENT, not part of
    this builder's lru_cache key (arrays don't hash)."""
    from .observables import (radial_distribution, structure_factor,
                              z_density_profile)

    @jax.jit
    def fn(r, key, idx, w):
        from .observables import vmap_chains_bounded

        gr = (vmap_chains_bounded(
            lambda ri: radial_distribution(ri, cfg, nbins=gr_bins)[1],
            r, cfg.n)
            if gr_bins else None)
        zp = (jax.vmap(
            lambda ri: z_density_profile(ri, cfg, nbins=z_bins)[1])(r)
            if z_bins else None)
        # HBM-bounded like gr: the phase matrix materializes [N, nk]
        # per chain (~14 GB whole-ensemble at N=16k x 512 x nk=144)
        sk = (vmap_chains_bounded(
            lambda ri: structure_factor(ri, cfg, n_kmax=sk_kmax)[1],
            r, cfg.n)
            if sk_kmax else None)
        pnt = None
        if ptensor_bins:
            from .observables import pressure_tensor_profile

            pnt = vmap_chains_bounded(
                lambda ri: pressure_tensor_profile(
                    ri, cfg, nbins=ptensor_bins,
                    include_ideal=False)[1:],
                r, cfg.n)
            rho_p = jax.vmap(
                lambda ri: z_density_profile(
                    ri, cfg, nbins=ptensor_bins)[1])(r)
            pnt = (pnt[0], pnt[1], rho_p)
        wdu = None
        if widom_k:
            from .widom import widom_delta_u

            keys = jax.vmap(
                lambda kc: jax.random.fold_in(kc, idx))(key)
            if w.ndim == 3:
                wdu = jax.vmap(
                    lambda ri, kc, wc: widom_delta_u(
                        ri, wc, cfg, kc, widom_k)[0])(r, keys, w)
            else:
                wdu = jax.vmap(
                    lambda ri, kc: widom_delta_u(
                        ri, w, cfg, kc, widom_k)[0])(r, keys)
        return gr, zp, sk, wdu, pnt

    return fn


@functools.lru_cache(maxsize=None)
def _pressure_fn(cfg: SMCConfig):
    """Jitted per-chain virial pressure (pressure + wallsPressure,
    SMC.c:140) for ladder-driver call-boundary sampling. Cached per cfg
    so repeated driver invocations reuse one compiled program."""
    from .potentials import total_pressure

    @jax.jit
    def fn(r, w):
        from .observables import wall_obs_chains

        return wall_obs_chains(
            lambda ri, wc: total_pressure(ri, wc, cfg), r, w, cfg.n)

    return fn


def pool_tsweep_across_processes(res: TSweepResults,
                                 cfg: SMCConfig) -> TSweepResults:
    """Pool per-process ladder results over jax.distributed.

    Multi-process ladders run R/P complete replica ladders per process
    (every process simulates EVERY temperature — exchanges stay local);
    pooling concatenates the replica axis and recomputes the per-T
    statistics from the full sample set, so reweighting downstream sees
    P× the samples. Symmetric: every process gets the pooled result."""
    from .ensemble import allgather_chain_axis

    def cat_replicas(a):
        if a is None or a.size == 0:
            return a
        moved = np.moveaxis(np.asarray(a), 2, 0)   # [R_local, G, n_t, ...]
        return np.moveaxis(allgather_chain_axis(moved), 0, 2)

    e_t = cat_replicas(res.energy_samples)          # [G, n_t, R_total]
    kinetic = 1.5 * cfg.n * res.temps
    chain_means = e_t.mean(axis=0)                  # [n_t, R_total]
    r_tot = chain_means.shape[1]
    acc = allgather_chain_axis(
        np.asarray(res.acceptance)[None]).mean(axis=0)
    return TSweepResults(
        temps=res.temps,
        mean_energy=chain_means.mean(axis=1) + kinetic,
        err_energy=chain_means.std(axis=1) / max(1, r_tot - 1) ** 0.5,
        acceptance=acc,
        cv=e_t.var(axis=(0, 2)) / res.temps ** 2,
        energy_samples=e_t,
        pressure_samples=cat_replicas(res.pressure_samples),
        energy_at_pressure=cat_replicas(res.energy_at_pressure),
        gr_samples=cat_replicas(res.gr_samples),
        zprofile_samples=cat_replicas(res.zprofile_samples),
        sk_samples=cat_replicas(res.sk_samples),
        widom_samples=cat_replicas(res.widom_samples),
        ptensor_n_samples=cat_replicas(res.ptensor_n_samples),
        ptensor_t_samples=cat_replicas(res.ptensor_t_samples),
        ptensor_rho_samples=cat_replicas(res.ptensor_rho_samples),
        # processes run their ladders concurrently: aggregate rate sums
        sweeps_per_second=(float(allgather_chain_axis(np.asarray(
            [[res.sweeps_per_second]])).sum())
            if res.sweeps_per_second is not None else None),
    )


def write_tsweep_csv(d, cfg: SMCConfig, res: TSweepResults):
    from .io import _fname

    p = _fname(d, "tsweep", cfg)
    with open(p, "w") as f:
        f.write("T, E_mean, E_err, acceptance, cv\n")
        for i in range(len(res.temps)):
            f.write(f"{res.temps[i]:0.4f}, {res.mean_energy[i]:0.9f}, "
                    f"{res.err_energy[i]:0.9f}, {res.acceptance[i]:0.6f}, "
                    f"{res.cv[i]:0.9f}\n")
    return p
