"""Parallel tempering (replica exchange) over the temperature ladder.

Beyond-reference capability, built on the temperature-sweep driver
(tsweep.py): the reference runs one temperature per process invocation
(argv, main.c:18) with zero inter-chain communication (SURVEY §5.8), so
it cannot exchange configurations across temperatures at all. Here the
whole ladder lives in ONE vmapped device program, so replica exchange is
a handful of on-device vector ops every `exchange_interval` sweeps:

  - the C chains are laid out [n_t, chains_per_t] (temperature-major,
    like tsweep): chains_per_t INDEPENDENT ladders run side by side;
  - an exchange step proposes swaps between adjacent temperature levels
    (i, i+1) of each ladder, alternating even/odd pairings per attempt
    (the deterministic-even-odd scheme), and accepts with the standard
    replica-exchange Metropolis rule
        P = min(1, exp((beta_i - beta_j) (E_i - E_j))),
    where E is the chain's running POTENTIAL energy (the same quantity
    the in-chain Metropolis test uses, SMC.c:329-341);
  - on accept, the CONFIGURATION (positions r, energy E, and the voxel
    tracker rbin, which is a pure function of r) swaps between the two
    temperature slots; the temperature, RNG key, acceptance counters and
    cumulative voxel accumulators stay with the slot, so per-T marginals
    and per-T observables keep their meaning.

Each temperature slot still samples its own Boltzmann distribution
(detailed balance holds per ladder), but configurations random-walk in
temperature, so low-T chains escape local minima through the high-T end
— the standard mixing win that motivates parallel tempering.

Seeded runs are chunk-invariant: the exchange key and the even/odd
parity derive from the ABSOLUTE cycle counter, not the block-local one
(same discipline as the per-sweep kernel seeds, ADVICE r1).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import RunParams, SMCConfig
from .state import ChainState, init_ensemble_state
from .tsweep import TSweepResults, _fields_fn, _multi_t_sweeps, _pressure_fn


def exchange_step(
    state: ChainState,
    betas_t: jax.Array,
    chains_per_t: int,
    key: jax.Array,
    parity: jax.Array | int,
) -> tuple[ChainState, jax.Array, jax.Array]:
    """One replica-exchange attempt across the ladder.

    `state` leaves carry a leading [C] axis with C = n_t * chains_per_t
    in temperature-major order (np.repeat(temps, chains_per_t), like
    tsweep). `betas_t` is 1/T per level, shape [n_t]. `parity` selects
    the even (0) or odd (1) adjacent pairing.

    Returns (state, accepts, attempts): per-PAIR accepted/attempted swap
    counts, shape [n_t - 1] each (summed over the chains_per_t ladders).
    """
    n_t = betas_t.shape[0]

    def lvl(x):
        return x.reshape((n_t, chains_per_t) + x.shape[1:])

    e = lvl(state.energy)                          # [n_t, R]
    idx = jnp.arange(n_t)
    parity = jnp.asarray(parity, jnp.int32)
    # Level i is the LOW side of a proposed pair (i, i+1) when its index
    # matches the parity and a partner above exists.
    is_lo = ((idx % 2) == (parity % 2)) & (idx + 1 < n_t)   # [n_t]
    up = jnp.minimum(idx + 1, n_t - 1)

    # P = min(1, exp((beta_i - beta_j)(E_i - E_j))): log u < delta.
    delta = (betas_t - betas_t[up])[:, None] * (e - e[up])  # [n_t, R]
    u = jax.random.uniform(key, (n_t, chains_per_t))
    accept_lo = is_lo[:, None] & (jnp.log(u) < delta)       # [n_t, R]

    # A level swaps UP if it accepted as the low side, DOWN if the level
    # below accepted; with an even/odd pairing these are disjoint.
    accept_from_below = jnp.pad(accept_lo, ((1, 0), (0, 0)))[:n_t]
    partner = jnp.where(
        accept_lo, idx[:, None] + 1,
        jnp.where(accept_from_below, idx[:, None] - 1, idx[:, None]),
    )                                                       # [n_t, R]

    def swap_leaf(x):
        xl = lvl(x)
        p = partner.reshape((n_t, chains_per_t) + (1,) * (xl.ndim - 2))
        out = jnp.take_along_axis(xl, jnp.broadcast_to(p, xl.shape), axis=0)
        return out.reshape(x.shape)

    new = state._replace(
        r=swap_leaf(state.r),
        energy=swap_leaf(state.energy),
        rbin=swap_leaf(state.rbin),
    )
    accepts = accept_lo.sum(axis=1)[:-1].astype(jnp.int32)   # [n_t-1]
    attempts = (is_lo.astype(jnp.int32) * chains_per_t)[:-1]
    return new, accepts, attempts


class PTResults(NamedTuple):
    tsweep: TSweepResults           # per-T E/err/acceptance/cv
    pair_t_lo: np.ndarray           # [n_t-1]
    pair_t_hi: np.ndarray           # [n_t-1]
    swap_acceptance: np.ndarray     # [n_t-1] accepted / attempted
    swap_attempts: np.ndarray       # [n_t-1] production attempts per pair
    exchange_interval: int          # the interval actually used ("auto":
                                    # the chosen one)
    # "auto" interval selection: per-pair swap acceptance measured on the
    # post-thermalization probe block (None for a fixed interval)
    probe_acceptance: np.ndarray | None = None


def choose_exchange_interval(pair_acceptance, target_rate: float = 0.06,
                             lo: int = 2, hi: int = 50) -> int:
    """Exchange interval from measured swap acceptance.

    Rule: hold the ACCEPTED-swap rate per pair per sweep at
    ~`target_rate` for the weakest pair — ladder round trips are driven
    by accepted swaps at the bottleneck pair, and attempts are nearly
    free on device (an energy-only Metropolis pass), so low acceptance
    is compensated with more frequent attempts:

        interval = clip(round(min(p) / target_rate), lo, hi)

    quantized to the menu {2, 5, 10, 20, 50} (log-nearest). The
    quantization bounds compile diversity: the pallas cycle program's
    sweep count is a Mosaic compile-time static, so a continuum of
    intervals would mean a cold multi-minute kernel compile per run —
    five menu values stay warm in the persistent cache.

    Calibration: the measured v5e optimum (docs/ARCHITECTURE.md — 1.54x
    tau_int gain, 6 levels 0.8-1.5, interval 10, acceptances 0.58-0.92)
    has min(p)/interval = 0.058; target_rate = 0.06 reproduces interval
    10 on that profile."""
    p = np.asarray(pair_acceptance, np.float64)
    if p.size == 0:       # single-level "ladder": no pairs to exchange
        return hi
    raw = np.clip(float(p.min()) / target_rate, lo, hi)
    menu = np.asarray([2, 5, 10, 20, 50], np.float64)
    menu = menu[(menu >= lo) & (menu <= hi)]
    return int(menu[np.argmin(np.abs(np.log(menu) - np.log(raw)))])


@partial(jax.jit, static_argnames=("cfg", "chains_per_t"))
def _exchange_block(state, betas_t, cfg, chains_per_t, abs_k):
    """One exchange attempt as its own device call (used when the
    exchange interval exceeds the watchdog-safe sweep budget); key and
    parity derive from the ABSOLUTE cycle index, exactly like the
    scanned path."""
    ekey = jax.random.fold_in(
        jax.random.fold_in(state.key[0], 0x9C0FFEE), abs_k)
    return exchange_step(state, betas_t, chains_per_t, ekey, abs_k % 2)


@partial(jax.jit, static_argnames=("cfg", "chains_per_t", "interval",
                                   "n_cycles", "a_scale", "collect_trace",
                                   "sampler"))
def _pt_block(state, w, cfg, temps_c, betas_t, a_scale, chains_per_t,
              interval, n_cycles, cycle0, collect_trace=False,
              sampler="xla", a_c=None):
    """n_cycles x (interval sweeps + one exchange attempt), fully on
    device. cycle0 is the absolute index of the first cycle (parity and
    exchange keys are chunk-invariant). sampler="pallas" runs the sweeps
    through the whole-sweep kernel with per-chain (A, T) rows. a_c [C]:
    per-chain base mobility overriding gamma*T (tuned ladders)."""
    n_t = betas_t.shape[0]

    def cycle(carry, k):
        st, nacc, natt = carry
        if sampler in ("pallas", "zsorted"):
            from . import ensemble as ens

            base = cfg.gamma * temps_c if a_c is None else a_c
            engine = (ens.ensemble_sweeps_zsorted if sampler == "zsorted"
                      else ens.ensemble_sweeps_pallas)
            kw = {"c_tile": 128} if sampler == "zsorted" else {}
            st, stats = engine(
                st, w, cfg, 0.0, interval,
                a_per_chain=a_scale * base,
                t_per_chain=temps_c, **kw)
            if not collect_trace:
                stats = None
        else:
            st, stats = _multi_t_sweeps(st, w, cfg, temps_c, a_scale,
                                        interval, collect_trace, a_c=a_c)
        abs_k = cycle0 + k
        ekey = jax.random.fold_in(
            jax.random.fold_in(st.key[0], 0x9C0FFEE), abs_k)
        st, acc, att = exchange_step(st, betas_t, chains_per_t, ekey,
                                     abs_k % 2)
        return (st, nacc + acc, natt + att), stats

    zeros = jnp.zeros((max(n_t - 1, 0),), jnp.int32)
    (state, nacc, natt), stats = jax.lax.scan(
        cycle, (state, zeros, zeros), jnp.arange(n_cycles))
    return state, nacc, natt, stats


def simulate_parallel_tempering(
    cfg: SMCConfig,
    params: RunParams,
    temps,
    key: jax.Array,
    chains_per_t: int = 16,
    exchange_interval: int | str = 10,
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
) -> tuple[ChainState, PTResults]:
    """Run the ladder with replica exchange every `exchange_interval`
    sweeps ("auto": measure the swap acceptance on a short
    post-thermalization probe and pick the interval with
    choose_exchange_interval; the choice and the probe's per-pair
    acceptance are reported in PTResults).
    eqsteps/maxsteps round UP to whole exchange cycles; swap
    statistics count production attempts only. Per-T statistics follow
    tsweep's conventions (E includes 3NT/2; cv = var(E)/T^2). a_per_t
    [n_t]: per-level tuned mobility overriding gamma*T. NOTE the mobility
    belongs to the temperature SLOT (like T itself), so configurations
    that swap slots always run under the slot's (A, T) pair.

    mesh: multi-chip PT — the chain axis shards over the mesh's "chains"
    axis. XLA engine: the whole cycle program (sweeps + exchange) is
    GSPMD-partitioned; the exchange's cross-shard configuration gathers
    become collectives (the neighbor-exchange pattern, validated in the
    driver dryrun). Pallas engine: sweeps run under shard_map and each
    exchange is its own GSPMD device call."""
    from .driver import therm_chunk
    from .ensemble import fetch

    temps = np.asarray(temps, dtype=np.float64)
    n_t = len(temps)
    # "auto": probe at the measured-optimal default (10), then choose
    # from the probe's swap acceptance (choose_exchange_interval). The
    # probe runs AFTER thermalization — pre-equilibrium energy gaps
    # would bias the acceptance the choice is based on.
    auto = exchange_interval == "auto"
    if isinstance(exchange_interval, str) and not auto:
        raise ValueError(f"exchange_interval must be an int or 'auto', "
                         f"got {exchange_interval!r}")
    interval = 10 if auto else max(1, int(exchange_interval))
    c = n_t * chains_per_t
    per_chain_w = w is not None and np.ndim(w) == 3
    if per_chain_w:
        # disorder PT is sound because exchange_step swaps (r, E, rbin)
        # along the TEMPERATURE axis within a replica column — with the
        # realization axis in the replica index, a swap never moves a
        # configuration to a different wall
        if np.shape(w)[0] != c:
            raise ValueError(f"per-chain wall table rows ({np.shape(w)[0]})"
                             f" != ladder chains ({c})")
    if state0 is not None:
        # resume a checkpointed ladder (same temperature-major layout;
        # pass eqsteps=0 — the chains are already thermalized)
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
            from .tsweep import _per_chain_energy

            w_arr = jnp.asarray(w, cfg.jnp_dtype)
            state = state._replace(energy=_per_chain_energy(
                state.r, w_arr, cfg).astype(state.energy.dtype))
    temps_c = jnp.asarray(np.repeat(temps, chains_per_t), cfg.jnp_dtype)
    betas_t = jnp.asarray(1.0 / temps, cfg.jnp_dtype)
    a_c = (None if a_per_t is None else jnp.asarray(
        np.repeat(np.asarray(a_per_t, np.float64), chains_per_t),
        cfg.jnp_dtype))
    if mesh is not None:
        # global_shard_put: also valid when the mesh spans processes
        # (the --global-ladder mode — cross-process replica exchange).
        from .ensemble import global_shard_put

        assert c % mesh.shape["chains"] == 0, (c, dict(mesh.shape))
        state = jax.tree.map(lambda x: global_shard_put(x, mesh), state)
        temps_c = global_shard_put(temps_c, mesh)
        if a_c is not None:
            a_c = global_shard_put(a_c, mesh)

    sweep_budget = therm_chunk(cfg, sampler=sampler)  # per device call
    # A sharded pallas/zsorted kernel is a shard_map custom call the
    # scanned cycle program cannot partition: run sweeps through the
    # sharded ladder wrapper and each exchange as its own (GSPMD) call.
    cycle_scan_ok = not (mesh is not None
                         and sampler in ("pallas", "zsorted"))

    def run_phase(state, total_sweeps, a_scale, cycle0, collect=False,
                  lapse=1, sweep0=0):
        """ceil(total_sweeps/interval) exchange cycles in watchdog-safe
        device calls; when collect, returns energies sampled at the
        ABSOLUTE gather cadence (sweep indices where (i+1) % lapse == 0).
        The int32 accepted counters are harvested (and reset) every call
        — overflow-safe for reference-scale runs, like tsweep."""
        cycles = -(-total_sweeps // interval)
        acc = np.zeros((max(n_t - 1, 0),), np.int64)
        att = np.zeros_like(acc)
        moves = np.zeros((c,), np.int64)
        samples = []
        p_samples, e_at_p = [], []
        gr_s, zp_s, sk_s, wd_s, pn_s, pt_s, pr_s = \
            [], [], [], [], [], [], []
        press_fn = _pressure_fn(cfg) if collect else None
        fields_fn = (_fields_fn(cfg, gr_bins, z_bins, sk_kmax,
                                widom_k=widom_k,
                                ptensor_bins=ptensor_bins)
                     if collect and (gr_bins or z_bins or sk_kmax
                                     or widom_k or ptensor_bins)
                     else None)
        n_harvest = 0

        def harvest(st):
            nonlocal moves, n_harvest
            moves += fetch(st.accepted).astype(np.int64)
            if collect:
                # paired (P, E) sample at the call boundary (reweight.py)
                p_samples.append(fetch(press_fn(st.r, w_arr)))
                e_at_p.append(fetch(st.energy))
                if fields_fn is not None:
                    gr_b, zp_b, sk_b, wd_b, pnt_b = fields_fn(
                        st.r, st.key, jnp.int32(n_harvest), w_arr)
                    n_harvest += 1
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
            return st._replace(accepted=jnp.zeros_like(st.accepted))

        def take(stats):
            nonlocal sweep0
            e_blk = fetch(stats.energy).reshape(-1, c)
            start = (lapse - 1 - sweep0) % lapse
            samples.append(e_blk[start::lapse])
            sweep0 += e_blk.shape[0]

        if interval <= sweep_budget and cycle_scan_ok:
            # Whole cycles scan on device, several per call.
            chunk_cycles = max(1, sweep_budget // interval)
            done_c = 0
            while done_c < cycles:
                k = min(cycles - done_c, chunk_cycles)
                state, a_blk, t_blk, stats = _pt_block(
                    state, w_arr, cfg, temps_c, betas_t, a_scale,
                    chains_per_t, interval, k, cycle0 + done_c,
                    collect_trace=collect, sampler=sampler, a_c=a_c)
                acc += fetch(a_blk).astype(np.int64)
                att += fetch(t_blk).astype(np.int64)
                if collect:
                    take(stats)
                state = harvest(state)  # also syncs under the watchdog
                done_c += k
        else:
            # One cycle spans several watchdog-safe calls: chunked sweeps
            # through the ladder engine, then an exchange-only call.
            from .tsweep import _ladder_block

            for ci in range(cycles):
                sub = 0
                while sub < interval:
                    k = min(sweep_budget, interval - sub)
                    state, stats = _ladder_block(
                        state, w_arr, cfg, temps_c, a_scale, k, sampler,
                        collect_trace=collect, a_c=a_c, mesh=mesh)
                    if collect:
                        take(stats)
                    state = harvest(state)
                    sub += k
                state, a_blk, t_blk = _exchange_block(
                    state, betas_t, cfg, chains_per_t,
                    jnp.int32(cycle0 + ci))
                acc += fetch(a_blk).astype(np.int64)
                att += fetch(t_blk).astype(np.int64)
        return (state, acc, att, samples, moves,
                (p_samples, e_at_p, gr_s, zp_s, sk_s, wd_s, pn_s, pt_s,
                 pr_s),
                cycle0 + cycles)

    # Thermalization: A doubled (SMC.c:110,125); exchanges run too (they
    # speed equilibration) but are not counted.
    state, _, _, _, _, _, cyc = run_phase(state, params.eqsteps, 2.0, 0)
    state = state._replace(accepted=jnp.zeros_like(state.accepted))

    probe_acc = None
    if auto:
        # Short production-mobility probe: ~40 cycles is enough for a
        # few-percent acceptance estimate per pair (chains_per_t
        # attempts per cycle per pair). NB run_phase reads `interval`
        # from this scope at call time — the probe runs at the probe
        # interval, the rebind below switches production to the choice.
        probe_cycles = 40
        state, acc_p, att_p, _, _, _, cyc = run_phase(
            state, probe_cycles * interval, 1.0, cyc)
        probe_acc = acc_p / np.maximum(att_p, 1)
        interval = choose_exchange_interval(probe_acc)
        state = state._replace(accepted=jnp.zeros_like(state.accepted))

    lapse = max(1, params.gather_lapse)
    import time as _time

    prod_t0 = _time.time()
    state, acc, att, samples, prod_moves, \
        (p_s, e_p, gr_s, zp_s, sk_s, wd_s, pn_s, pt_s, pr_s), _ = \
        run_phase(state, params.maxsteps, 1.0, cyc, collect=True,
                  lapse=lapse)
    prod_sweeps = -(-params.maxsteps // interval) * interval
    # run_phase fetches per block — the wall interval is device-synced
    prod_sps = prod_sweeps * c / max(_time.time() - prod_t0, 1e-9)

    e_tr = np.concatenate(samples) if samples else np.zeros((0, c))
    kinetic = 1.5 * cfg.n * temps
    e_t = e_tr.reshape(len(e_tr), n_t, chains_per_t)
    chain_means = e_t.mean(axis=0)
    mean_e = chain_means.mean(axis=1) + kinetic
    err_e = chain_means.std(axis=1) / max(1, chains_per_t - 1) ** 0.5
    acc_moves = (prod_moves.reshape(n_t, chains_per_t).mean(axis=1)
                 / (prod_sweeps * cfg.n))
    # e_t already carries explicit (samples, n_t, chains_per_t) dims; a
    # reshape(..., -1) here would raise on zero collected samples (numpy
    # cannot infer -1 for a size-0 array)
    cv = e_t.var(axis=(0, 2)) / temps ** 2

    shape_t = (-1, n_t, chains_per_t)
    ts = TSweepResults(
        temps=temps, mean_energy=mean_e, err_energy=err_e,
        acceptance=np.asarray(acc_moves), cv=np.asarray(cv),
        energy_samples=e_t,
        pressure_samples=np.stack(p_s).reshape(shape_t) if p_s else None,
        energy_at_pressure=np.stack(e_p).reshape(shape_t) if e_p else None,
        gr_samples=(np.stack(gr_s).reshape(-1, n_t, chains_per_t, gr_bins)
                    if gr_s else None),
        zprofile_samples=(np.stack(zp_s).reshape(-1, n_t, chains_per_t,
                                                 z_bins)
                          if zp_s else None),
        sk_samples=(np.stack(sk_s).reshape(
            -1, n_t, chains_per_t, np.shape(sk_s[-1])[-1])
            if sk_s else None),
        widom_samples=(np.stack(wd_s).reshape(-1, n_t, chains_per_t,
                                              widom_k)
                       if wd_s else None),
        ptensor_n_samples=(np.stack(pn_s).reshape(
            -1, n_t, chains_per_t, ptensor_bins) if pn_s else None),
        ptensor_t_samples=(np.stack(pt_s).reshape(
            -1, n_t, chains_per_t, ptensor_bins) if pt_s else None),
        ptensor_rho_samples=(np.stack(pr_s).reshape(
            -1, n_t, chains_per_t, ptensor_bins) if pr_s else None),
        sweeps_per_second=prod_sps)
    return state, PTResults(
        tsweep=ts,
        pair_t_lo=temps[:-1],
        pair_t_hi=temps[1:],
        swap_acceptance=acc / np.maximum(att, 1),
        swap_attempts=att,
        exchange_interval=interval,
        probe_acceptance=probe_acc,
    )


def pool_pt_across_processes(res: PTResults, cfg: SMCConfig) -> PTResults:
    """Pool per-process PT results over jax.distributed: replica axis
    concatenated (tsweep.pool_tsweep_across_processes) and the per-pair
    swap counters summed — exchanges are process-local by construction
    (each process owns complete ladder instances)."""
    from .ensemble import allgather_chain_axis
    from .tsweep import pool_tsweep_across_processes

    ts = pool_tsweep_across_processes(res.tsweep, cfg)
    att = allgather_chain_axis(
        np.asarray(res.swap_attempts, np.int64)[None])      # [P, n_t-1]
    acc = allgather_chain_axis(
        (np.asarray(res.swap_acceptance)
         * np.asarray(res.swap_attempts))[None])
    att_sum = att.sum(axis=0)
    return res._replace(
        tsweep=ts,
        swap_acceptance=acc.sum(axis=0) / np.maximum(att_sum, 1),
        swap_attempts=att_sum,
    )


def write_pt_csv(d, cfg: SMCConfig, res: PTResults):
    from .io import _fname

    p = _fname(d, "pt", cfg)
    with open(p, "w") as f:
        f.write("T_lo, T_hi, swap_acceptance, attempts\n")
        for i in range(len(res.pair_t_lo)):
            f.write(f"{res.pair_t_lo[i]:0.4f}, {res.pair_t_hi[i]:0.4f}, "
                    f"{res.swap_acceptance[i]:0.6f}, "
                    f"{res.swap_attempts[i]:d}\n")
    return p
