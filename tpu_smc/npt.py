"""Isothermal-isobaric (NPT) Monte Carlo: the bulk fluid at constant
pressure.

Beyond-reference capability completing the ensemble family: the
reference is strictly NVT (SMC.c; SMC_noMPI_noWall.c is the bulk NVT
variant), gcmc.py samples N at fixed (mu, V, T) — this samples V at
fixed (N, P, T). Together the three give the full closed loop of
ensemble-equivalence checks (NVT virial P -> NPT at that P recovers the
NVT density; test_npt.py pins it).

TPU-native design: the box side L becomes a per-chain TRACED scalar
riding the chain batch, exactly like temperature rides it in tsweep.py —
one compiled program advances chains at different instantaneous volumes
(and, with a per-chain `pressure`, a whole isobar family). The pair
physics takes L through the optional `box` override threaded into
potentials.py (Python-level branch: box=None callers keep their exact
jaxpr, so every existing compile cache survives). Positions stay
PHYSICAL; a volume move rescales them by (L'/L).

MC cycle per NPT sweep (standard Frenkel & Smit ch. 5.4):
  1. one smart-MC displacement sweep over all N particles at the chain's
     current L (sampler.sweep with box=L — same force-biased proposal
     and acceptance as the NVT engine, SMC.c:278-351);
  2. one volume move in ln V: ln V' = ln V + dlnv*(2u-1),
     accept with  min(1, exp(-(dU + P dV)/T + (N+1) ln(V'/V))).

The volume move recomputes U' exactly (pair_energy_total at box=L'), so
an accepted move also re-syncs the tracked energy — f32 drift can only
accumulate across consecutive rejected-volume sweeps and the driver
re-syncs per chunk anyway.

Key streams: displacement sweeps consume `key` EXACTLY like the NVT
sampler (same splits, same order); volume moves draw from a dedicated
`vkey` stream. With dlnv=0 every volume proposal is the identity
(V'=V, scale=1.0, r*1.0 bitwise r), so an NPT run with frozen volume
reproduces the NVT bulk trajectory BITWISE — the correctness pin for
the whole engine (test_npt.py).

The cutoff is STATIC (cfg.lj_cutoff), not the bulk NVT file's rc = L/2
convention (SMC_noMPI_noWall.c:519): a cutoff that follows the box
makes the potential itself a function of V and biases the ensemble
(measured 8.5% density error against the NVT-virial closed loop).
Volume moves reject any box below 2*rc — an exact hard-wall prior on V
— and init refuses a config with no compression headroom, so NPT runs
must choose rc < L0/2 (the CLI's --npt maps this).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import SMCConfig
from .potentials import pair_energy_total, pair_virial_pressure
from .sampler import sweep


class NPTState(NamedTuple):
    """One constant-pressure chain (vmap for ensembles)."""

    r: jax.Array        # [N, 3] physical positions in the CURRENT box
    l: jax.Array        # scalar: cubic box side (the fluctuating volume)
    energy: jax.Array   # running potential energy (exact after every
    #                     accepted volume move)
    key: jax.Array      # displacement-sweep stream (sampler-compatible)
    vkey: jax.Array     # volume-move stream (separate so dlnv=0 is
    #                     bitwise the NVT sampler)
    sweeps: jax.Array   # int32
    accepted: jax.Array  # int32: accepted displacement moves
    vol_acc: jax.Array  # int32: accepted volume moves
    vol_att: jax.Array  # int32: attempted volume moves


def volume_move(
    r: jax.Array,
    l: jax.Array,
    energy: jax.Array,
    vkey: jax.Array,
    cfg: SMCConfig,
    pressure: jax.Array,
    dlnv: jax.Array,
    temperature: jax.Array | None = None,
    pair_u=None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """One ln-V volume move. Returns (r, l, energy, vkey, accepted).

    `pair_u(r, box)`: total potential at a traced box — injectable so
    the ideal-gas limit (U = 0) can be tested exactly against the
    Gamma(N+1, T/P) volume distribution (test_npt.py)."""
    dtype = cfg.jnp_dtype
    n = r.shape[0]
    t = jnp.asarray(
        cfg.temperature if temperature is None else temperature, dtype)
    if pair_u is None:
        pair_u = lambda rr, box: pair_energy_total(rr, cfg, box=box)

    vkey, k_step, k_acc = jax.random.split(vkey, 3)
    step = dlnv * (2.0 * jax.random.uniform(k_step, (), dtype) - 1.0)
    # scale from the STEP, not exp(lnv'/3): exp(0) == 1.0 exactly, so a
    # frozen-volume run (dlnv=0) rescales by bitwise 1.0 and the NVT
    # equivalence pin holds to the bit (module docstring).
    scale = jnp.exp(step / 3.0)
    l_new = l * scale
    r_new = r * scale
    u_new = pair_u(r_new, l_new)
    dv = l_new ** 3 - l ** 3
    log_ap = (-(u_new - energy + pressure * dv) / t
              + (n + 1.0) * step)
    unif = jax.random.uniform(k_acc, (), dtype)
    accept = (unif < jnp.exp(jnp.minimum(log_ap, 0.0))) | (log_ap >= 0.0)
    # hard-wall prior V >= (2 rc)^3: the cutoff is STATIC (see
    # potentials.pair_energy_force_single), so boxes smaller than two
    # cutoffs would break min-image + truncation consistency — reject
    # by construction (exact: a rejection, not a clamp)
    accept = accept & (l_new >= 2.0 * cfg.lj_cutoff)

    r = jnp.where(accept, r_new, r)
    l = jnp.where(accept, l_new, l)
    energy = jnp.where(accept, u_new, energy)
    return r, l, energy, vkey, accept


def npt_sweep(
    state: NPTState,
    cfg: SMCConfig,
    pressure: float | jax.Array,
    a: float | jax.Array,
    dlnv: float | jax.Array,
    temperature: float | jax.Array | None = None,
) -> NPTState:
    """One NPT sweep: N displacement moves at the current box, then one
    volume move."""
    dtype = cfg.jnp_dtype
    pressure = jnp.asarray(pressure, dtype)
    dlnv = jnp.asarray(dlnv, dtype)
    w = jnp.zeros((0,), dtype)   # bulk: no wall table

    r, e, key, acc = sweep(state.r, state.energy, state.key, w, cfg, a,
                           temperature=temperature, box=state.l)
    r, l, e, vkey, vacc = volume_move(
        r, state.l, e, state.vkey, cfg, pressure, dlnv,
        temperature=None if temperature is None
        else jnp.asarray(temperature, dtype))
    return NPTState(
        r=r, l=l, energy=e, key=key, vkey=vkey,
        sweeps=state.sweeps + 1,
        accepted=state.accepted + acc,
        vol_acc=state.vol_acc + vacc.astype(jnp.int32),
        vol_att=state.vol_att + jnp.int32(1),
    )


def init_npt_state(cfg: SMCConfig, key: jax.Array) -> NPTState:
    """Fresh chain at the cfg box (cubic bulk), never-overlapping
    simple-cubic start (gcmc.cubic_grid — the reference FCC builder
    degenerates for arbitrary (n, box) combinations and can seed
    catastrophic overlaps, measured E0 ~ 8e9 at n=8, rho=0.15, which an
    NPT run 'relaxes' by runaway expansion). Requires a bulk config
    (pbc_z, no walls, cubic)."""
    if cfg.use_walls or not cfg.pbc_z:
        raise ValueError("NPT engine is bulk-only (SMCConfig.bulk)")
    if abs(cfg.box_l - cfg.box_lz) > 1e-9:
        raise ValueError("NPT engine needs a cubic box (box_l == box_lz)")
    if 2.0 * cfg.lj_cutoff >= cfg.box_l:
        raise ValueError(
            f"NPT needs compression headroom: lj_cutoff "
            f"({cfg.lj_cutoff:g}) must be < box_l/2 ({cfg.box_l / 2:g})"
            " — volume moves reject boxes below 2*cutoff (pass a "
            "smaller --lj-cutoff; the bulk default rc = L/2 leaves "
            "none)")
    from .gcmc import cubic_grid
    from .state import init_chain_state

    chain, _ = init_chain_state(cfg, key, r0=cubic_grid(cfg, cfg.n))
    vkey = jax.random.fold_in(chain.key, 0x4E5054)  # "NPT"
    return NPTState(
        r=chain.r,
        l=jnp.asarray(cfg.box_l, cfg.jnp_dtype),
        energy=chain.energy,
        key=chain.key,
        vkey=vkey,
        sweeps=jnp.zeros((), jnp.int32),
        accepted=jnp.zeros((), jnp.int32),
        vol_acc=jnp.zeros((), jnp.int32),
        vol_att=jnp.zeros((), jnp.int32),
    )


def _gr_hist_reduced(r, l, nbins: int):
    """Pair histogram in REDUCED separation x = dr/L in [0, 1/2] —
    the natural coordinate when the box fluctuates: the ideal-gas
    shell weight N(N-1)/2 * 4 pi x^2 dx is L-independent, so
    histograms from different volumes pool exactly (normalization on
    the host; the r-axis is reported as x * <L>)."""
    n = r.shape[0]
    d = r[:, None, :] - r[None, :, :]
    d = d - l * jnp.round(d / l)
    dr = jnp.sqrt(jnp.sum(d * d, axis=-1))
    iu = jnp.triu_indices(n, k=1)
    x = dr[iu] / l
    b = jnp.clip((x * 2.0 * nbins).astype(jnp.int32), 0, nbins)
    return jnp.zeros((nbins + 1,), jnp.float32).at[b].add(1.0)[:nbins]


@partial(jax.jit, static_argnames=("cfg", "n_sweeps", "gr_bins",
                                   "track_virial"))
def npt_block(state: NPTState, cfg: SMCConfig, pressure, a, dlnv,
              n_sweeps: int, temperature=None, gr_bins: int = 0,
              track_virial: bool = False):
    """n_sweeps NPT sweeps as one compiled scan; per-sweep traces
    (E, V[, gr-hist][, virial P]). `pressure`/`temperature` may be
    per-chain under vmap (isobar / isotherm families in one program)."""

    def body(st, _):
        st = npt_sweep(st, cfg, pressure, a, dlnv,
                       temperature=temperature)
        vol = st.l ** 3
        gh = (_gr_hist_reduced(st.r, st.l, gr_bins) if gr_bins
              else jnp.zeros((0,), jnp.float32))
        pv = (pair_virial_pressure(st.r, cfg, box=st.l)
              if track_virial else jnp.zeros((), cfg.jnp_dtype))
        return st, (st.energy, vol, gh, pv)

    return jax.lax.scan(body, state, None, length=n_sweeps)


class NPTResults(NamedTuple):
    mean_density: float      # <N/V> (the observable NVT fixes by hand)
    err_density: float       # chain-spread (ensembles) / trace error
    mean_v: float
    mean_energy: float
    enthalpy: float          # configurational H = <U> + P <V>
    # isothermal compressibility from the volume fluctuations,
    # kappa_T = <dV^2> / (T <V>) — the NPT route to the quantity GCMC
    # gets from number fluctuations (ensemble-equivalence triangle,
    # scripts/validate_kappa.py). Correlated-trace point estimate.
    kappa_t: float
    disp_acceptance: float
    vol_acceptance: float
    energy_trace: np.ndarray  # [S, C]
    volume_trace: np.ndarray  # [S, C]
    gr: np.ndarray | None     # pooled g(x * <L>) on the reduced grid
    gr_r: np.ndarray | None
    virial_trace: np.ndarray | None  # [S, C] instantaneous virial P
    r_final: np.ndarray
    l_final: np.ndarray


def simulate_npt(
    cfg: SMCConfig,
    pressure: float | np.ndarray,
    eqsteps: int,
    maxsteps: int,
    key: jax.Array,
    n_chains: int = 1,
    dlnv: float = 0.05,
    gr_bins: int = 0,
    track_virial: bool = False,
    chunk: int = 200,
    state0: NPTState | None = None,
    mesh=None,
    temperatures: float | np.ndarray | None = None,
) -> Tuple[NPTState, NPTResults]:
    """NPT driver: thermalization (A doubled, SMC.c:110-125 convention)
    + production, vmapped over independent chains; device calls chunked
    under the TPU watchdog.

    `pressure` may be a PER-CHAIN array [n_chains]: the isobar axis
    rides the chain batch like mu does in simulate_gcmc — a whole
    P -> rho(P) equation-of-state sweep runs as ONE compiled program.

    `mesh`: optional jax Mesh with a "chains" axis — the chain batch
    (and the pressure vector) are device_put sharded over it and GSPMD
    partitions every call (chains never communicate, so sharding is
    pure data parallelism; bitwise the single-device run,
    test_npt).

    `temperatures`: optional PER-CHAIN array [n_chains] — combined
    with a per-chain `pressure` a whole (T, P) STATE GRID advances as
    one compiled program; reweight_tp then fills the continuous
    rho(T, P) surface. The pooled scalar results mix states in that
    mode — post-process the traces per state instead."""
    a = cfg.proposal_a
    ps = jnp.broadcast_to(jnp.asarray(pressure, cfg.jnp_dtype),
                          (n_chains,))
    ts = jnp.broadcast_to(jnp.asarray(
        cfg.temperature if temperatures is None else temperatures,
        cfg.jnp_dtype), (n_chains,))

    if state0 is not None:
        if state0.r.shape[0] != n_chains:
            raise ValueError(
                f"checkpoint holds {state0.r.shape[0]} chains; run "
                f"asked {n_chains}")
        state = state0
    else:
        keys = jax.random.split(key, n_chains)
        states = [init_npt_state(cfg, k) for k in keys]
        state = jax.tree.map(lambda *xs: jnp.stack(xs), *states)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        put = lambda x: jax.device_put(
            x, NamedSharding(mesh, PartitionSpec("chains")))
        state = jax.tree.map(put, state)
        ps = put(ps)
        ts = put(ts)

    def block(st, p, tt, n, aa):
        return npt_block(st, cfg, p, aa, dlnv, n, gr_bins=gr_bins,
                         track_virial=track_virial, temperature=tt)

    run = jax.jit(jax.vmap(partial(block, n=chunk, aa=a)))
    run_therm = jax.jit(jax.vmap(partial(block, n=chunk, aa=2.0 * a)))

    def do(state, n_sweeps, collect, therm=False):
        traces = []
        done = 0
        while done < n_sweeps:
            k = min(chunk, n_sweeps - done)
            if k != chunk:
                aa = 2.0 * a if therm else a
                st_tr = jax.jit(jax.vmap(
                    partial(block, n=k, aa=aa)))(state, ps, ts)
            else:
                st_tr = (run_therm if therm else run)(state, ps, ts)
            state, tr = st_tr
            # exact per-chunk energy re-sync (rejected-volume sweeps
            # accumulate one f32 rounding per displacement move)
            state = state._replace(energy=jax.jit(jax.vmap(
                lambda rr, ll: pair_energy_total(rr, cfg, box=ll)))(
                    state.r, state.l))
            np.asarray(state.energy)   # sync (watchdog-safe chunks)
            if collect:
                traces.append(jax.tree.map(np.asarray, tr))
            done += k
        return state, traces

    state, _ = do(state, eqsteps, collect=False, therm=True)
    zero = jnp.zeros_like(state.accepted)
    state = state._replace(accepted=zero, vol_acc=zero, vol_att=zero)
    state, traces = do(state, maxsteps, collect=True)

    e_tr = np.concatenate([t[0] for t in traces], axis=1).T \
        if traces else np.zeros((0, n_chains))       # [S, C]
    v_tr = np.concatenate([t[1] for t in traces], axis=1).T \
        if traces else np.zeros((0, n_chains))
    p_tr = (np.concatenate([t[3] for t in traces], axis=1).T
            if traces and track_virial else None)

    n = cfg.n
    rho_tr = n / v_tr if v_tr.size else v_tr
    chain_rho = rho_tr.mean(axis=0) if rho_tr.size else np.zeros(n_chains)
    if v_tr.size:
        kappa = float(v_tr.var()) / (cfg.temperature * float(v_tr.mean()))
    else:
        kappa = float("nan")

    gr = gr_r = None
    if gr_bins and traces:
        gh = np.concatenate([t[2] for t in traces],
                            axis=1).sum(axis=(0, 1))
        s_tot = v_tr.size    # snapshots pooled (chains x sweeps)
        x_edges = np.linspace(0.0, 0.5, gr_bins + 1)
        shell = (4.0 / 3.0) * np.pi * (x_edges[1:] ** 3
                                       - x_edges[:-1] ** 3)
        # reduced coords: ideal count per snapshot = Npairs * shell
        # (V cancels; see _gr_hist_reduced)
        npairs = n * (n - 1) / 2.0
        gr = gh / max(s_tot, 1) / (npairs * shell)
        mean_l = float(v_tr.mean() ** (1.0 / 3.0)) if v_tr.size else 1.0
        gr_r = 0.5 * (x_edges[1:] + x_edges[:-1]) * mean_l

    def rate(acc, att):
        acc = int(np.asarray(acc).sum())
        att = int(np.asarray(att).sum())
        return acc / att if att else float("nan")

    mean_p_imposed = float(np.asarray(ps).mean())
    res = NPTResults(
        mean_density=float(chain_rho.mean()),
        err_density=float(chain_rho.std()
                          / np.sqrt(max(1, n_chains - 1)))
        if n_chains > 1
        else float(rho_tr.std() / np.sqrt(max(1, rho_tr.size))),
        mean_v=float(v_tr.mean()) if v_tr.size else float("nan"),
        mean_energy=float(e_tr.mean()) if e_tr.size else float("nan"),
        enthalpy=(float(e_tr.mean()) + mean_p_imposed * float(v_tr.mean())
                  if v_tr.size else float("nan")),
        kappa_t=kappa,
        # counters were zeroed after thermalization, so attempts are
        # exactly the production sweeps x N per chain
        disp_acceptance=rate(state.accepted, maxsteps * n_chains * n),
        vol_acceptance=rate(state.vol_acc, state.vol_att),
        energy_trace=e_tr,
        volume_trace=v_tr,
        gr=gr,
        gr_r=gr_r,
        virial_trace=p_tr,
        r_final=np.asarray(state.r),
        l_final=np.asarray(state.l),
    )
    return state, res


def save_npt_checkpoint(path, state: NPTState, cfg: SMCConfig):
    """Full NPT (ensemble) state -> npz (gcmc.py's format family).
    Resume is BITWISE: both key streams live in the state and the
    tracked energy is re-synced identically at every chunk boundary."""
    import json
    from pathlib import Path

    path = Path(path)
    if path.suffix != ".npz":
        path = path.with_name(path.name + ".npz")
    path.parent.mkdir(parents=True, exist_ok=True)
    arrays = {f: np.asarray(getattr(state, f)) for f in state._fields
              if f not in ("key", "vkey")}
    arrays["key"] = np.asarray(jax.random.key_data(state.key))
    arrays["vkey"] = np.asarray(jax.random.key_data(state.vkey))
    cfg_json = json.dumps(
        {f: getattr(cfg, f) for f in cfg.__dataclass_fields__})
    from .io import atomic_savez

    atomic_savez(path, __config__=np.frombuffer(cfg_json.encode(),
                                                dtype=np.uint8),
                 __npt__=np.asarray(1), **arrays)
    return path


def load_npt_checkpoint(path):
    """-> (NPTState, SMCConfig)."""
    import json

    data = np.load(path)
    if "__npt__" not in data:
        raise ValueError(f"{path} is not an NPT checkpoint")
    cfg = SMCConfig(**json.loads(bytes(data["__config__"]).decode()))
    if cfg.dtype == "float64" and not jax.config.jax_enable_x64:
        jax.config.update("jax_enable_x64", True)
    dtype = cfg.jnp_dtype
    ints = {"sweeps", "accepted", "vol_acc", "vol_att"}
    fields = {}
    for f in NPTState._fields:
        if f in ("key", "vkey"):
            fields[f] = jax.random.wrap_key_data(jnp.asarray(data[f]))
        elif f in ints:
            fields[f] = jnp.asarray(data[f], jnp.int32)
        else:
            fields[f] = jnp.asarray(data[f], dtype)
    return NPTState(**fields), cfg


class IsobarReweight(NamedTuple):
    """Continuous equation of state from MBAR over the pressure axis."""

    p_grid: np.ndarray     # [G] target pressures
    rho: np.ndarray        # [G] N/<V>(P)
    v_mean: np.ndarray     # [G]
    kappa_t: np.ndarray    # [G] Var(V)/(T <V>) under the MBAR weights
    enthalpy: np.ndarray   # [G] <E> + P <V> (configurational)
    ess: np.ndarray        # [G] effective sample size
    f_k: np.ndarray        # [K] per-state dimensionless free energies
    p_k: np.ndarray        # [K] the sampled ladder pressures


def reweight_isobars(e_tr, v_tr, pressures, temperature, p_grid,
                     n: int, max_samples_per_state: int = 1 << 17):
    """MBAR over the PRESSURE axis at constant T: the continuous
    equation of state rho(P) from a sampled isobar family.

    e_tr/v_tr [S, C]: production traces from `simulate_npt` run with a
    per-chain `pressures` [C] vector (the --npt-grid layout, K
    pressures x replicas). Chains are grouped by unique pressure and
    pooled. Each NPT state's configurational distribution is
    p_k(r, V) ∝ J(V) exp(-beta (U + P_k V)) where J is the lnV-walk
    Jacobian V^(N+1) — J is the SAME for every k, so it folds into the
    base measure and the reduced potential differences MBAR needs are
    exactly u_kn = beta (E_m + P_k V_m). The temperature-ladder
    machinery (reweight._mbar_fixed_point) solves the fixed point on
    that matrix unchanged — pressure is just a different linear field
    multiplying a per-sample quantity (V instead of E).

    No reference analog: the C code has no constant-pressure mode, let
    alone observables at pressures it never simulated.

    Returns IsobarReweight on `p_grid`. ESS collapses when a target
    extrapolates outside the sampled pressure bracket — check `.ess`.
    """
    from .reweight import _mbar_fixed_point

    beta = 1.0 / float(temperature)
    pressures = np.asarray(pressures, np.float64).reshape(-1)
    e_tr = np.asarray(e_tr, np.float64)
    v_tr = np.asarray(v_tr, np.float64)
    if e_tr.shape != v_tr.shape or e_tr.shape[1] != pressures.size:
        raise ValueError(
            f"trace/pressure shapes disagree: {e_tr.shape}, "
            f"{v_tr.shape}, {pressures.shape}")
    p_k, inv = np.unique(pressures, return_inverse=True)
    e_s, v_s = [], []
    for k in range(p_k.size):
        cols = np.flatnonzero(inv == k)
        e = e_tr[:, cols].reshape(-1)
        v = v_tr[:, cols].reshape(-1)
        step = max(1, -(-e.size // max_samples_per_state))
        e_s.append(e[::step])
        v_s.append(v[::step])
    n_k = np.asarray([e.size for e in e_s], np.int64)
    if (n_k <= 0).any():
        raise ValueError("every pressure state needs samples")
    e_m = np.concatenate(e_s)
    v_m = np.concatenate(v_s)
    # one scalar shift keeps beta*(E + P V) small in f32; a constant
    # offset cancels identically in every weight and f_k difference
    u64 = beta * (e_m[None, :] + p_k[:, None] * v_m[None, :])
    shift = float(u64.mean())
    u_kn = jnp.asarray(u64 - shift, jnp.float32)
    log_n_k = jnp.asarray(np.log(n_k), jnp.float32)
    f_k, _, _ = _mbar_fixed_point(u_kn, log_n_k, jnp.float32(2e-6),
                                  5_000)
    log_denom = jax.nn.logsumexp(
        log_n_k[:, None] + f_k[:, None] - u_kn, axis=0)   # [M]

    e_j = jnp.asarray(e_m, jnp.float32)
    v_j = jnp.asarray(v_m, jnp.float32)

    @jax.jit
    def at(p):
        logw = -(jnp.float32(beta) * (e_j + p * v_j)
                 - jnp.float32(shift)) - log_denom
        logw = logw - jax.nn.logsumexp(logw)
        w = jnp.exp(logw)
        vm = jnp.sum(w * v_j)
        vv = jnp.sum(w * (v_j - vm) ** 2)
        em = jnp.sum(w * e_j)
        ess = 1.0 / jnp.sum(w * w)
        return vm, vv, em, ess

    p_grid = np.atleast_1d(np.asarray(p_grid, np.float64))
    vm = np.empty_like(p_grid)
    kap = np.empty_like(p_grid)
    hh = np.empty_like(p_grid)
    ess = np.empty_like(p_grid)
    for i, p in enumerate(p_grid):
        v_i, vv_i, e_i, ess_i = at(jnp.float32(p))
        vm[i] = float(v_i)
        kap[i] = float(vv_i) / (float(temperature) * max(float(v_i),
                                                         1e-12))
        hh[i] = float(e_i) + p * float(v_i)
        ess[i] = float(ess_i)
    return IsobarReweight(
        p_grid=p_grid, rho=n / np.maximum(vm, 1e-12), v_mean=vm,
        kappa_t=kap, enthalpy=hh, ess=ess,
        f_k=np.asarray(f_k, np.float64), p_k=p_k)


def reweight_tp(e_tr, v_tr, temps_c, press_c, targets, n: int,
                max_samples_per_state: int = 1 << 17):
    """MBAR over BOTH thermodynamic fields at once: the continuous
    rho(T, P) surface from one sampled (temperature, pressure) grid.

    e_tr/v_tr [S, C]: production traces from `simulate_npt` run with
    per-chain `temperatures` AND `pressure`. States are the unique
    (T, P) pairs; the reduced potential is u_kn = beta_k (E_m +
    P_k V_m) — exactly the isobar case (reweight_isobars) with beta
    varying per state too; the lnV Jacobian is state-independent and
    cancels as before. `targets`: array-like of (T, P) rows.

    Returns (targets [G, 2], rho [G], v_mean [G], kappa_t [G],
    e_mean [G], ess [G]). ESS collapses outside the sampled bracket in
    EITHER field."""
    from .reweight import _mbar_fixed_point

    temps_c = np.asarray(temps_c, np.float64).reshape(-1)
    press_c = np.asarray(press_c, np.float64).reshape(-1)
    e_tr = np.asarray(e_tr, np.float64)
    v_tr = np.asarray(v_tr, np.float64)
    if not (e_tr.shape == v_tr.shape
            and e_tr.shape[1] == temps_c.size == press_c.size):
        raise ValueError("trace/temperature/pressure shapes disagree")
    tp = np.stack([temps_c, press_c], axis=1)
    pairs, inv = np.unique(tp, axis=0, return_inverse=True)
    e_s, v_s = [], []
    for k in range(len(pairs)):
        cols = np.flatnonzero(inv == k)
        e = e_tr[:, cols].reshape(-1)
        v = v_tr[:, cols].reshape(-1)
        step = max(1, -(-e.size // max_samples_per_state))
        e_s.append(e[::step])
        v_s.append(v[::step])
    n_k = np.asarray([e.size for e in e_s], np.int64)
    e_m = np.concatenate(e_s)
    v_m = np.concatenate(v_s)
    beta_k = 1.0 / pairs[:, 0]
    u64 = beta_k[:, None] * (e_m[None, :]
                             + pairs[:, 1][:, None] * v_m[None, :])
    shift = float(u64.mean())
    u_kn = jnp.asarray(u64 - shift, jnp.float32)
    log_n_k = jnp.asarray(np.log(n_k), jnp.float32)
    f_k, _, _ = _mbar_fixed_point(u_kn, log_n_k, jnp.float32(2e-6),
                                  5_000)
    log_denom = jax.nn.logsumexp(
        log_n_k[:, None] + f_k[:, None] - u_kn, axis=0)
    e_j = jnp.asarray(e_m, jnp.float32)
    v_j = jnp.asarray(v_m, jnp.float32)

    @jax.jit
    def at(beta, p):
        logw = -(beta * (e_j + p * v_j) - jnp.float32(shift)) \
            - log_denom
        logw = logw - jax.nn.logsumexp(logw)
        w = jnp.exp(logw)
        vm = jnp.sum(w * v_j)
        vv = jnp.sum(w * (v_j - vm) ** 2)
        em = jnp.sum(w * e_j)
        return vm, vv, em, 1.0 / jnp.sum(w * w)

    targets = np.atleast_2d(np.asarray(targets, np.float64))
    g = len(targets)
    vm = np.empty(g)
    kap = np.empty(g)
    em = np.empty(g)
    ess = np.empty(g)
    for i, (t, p) in enumerate(targets):
        v_i, vv_i, e_i, ess_i = at(jnp.float32(1.0 / t),
                                   jnp.float32(p))
        vm[i] = float(v_i)
        kap[i] = float(vv_i) / (t * max(float(v_i), 1e-12))
        em[i] = float(e_i)
        ess[i] = float(ess_i)
    return targets, n / np.maximum(vm, 1e-12), vm, kap, em, ess


def write_npt_reweight_csv(d, cfg: SMCConfig, rw: IsobarReweight):
    """npt_reweight_*.csv: the continuous MBAR equation of state."""
    from .io import _fname

    p = _fname(d, "npt_reweight", cfg)
    with open(p, "w") as f:
        f.write("P, rho, V_mean, kappa_T, H_conf, ess\n")
        for i in range(len(rw.p_grid)):
            f.write(f"{rw.p_grid[i]:0.6f}, {rw.rho[i]:0.9f}, "
                    f"{rw.v_mean[i]:0.6f}, {rw.kappa_t[i]:0.9f}, "
                    f"{rw.enthalpy[i]:0.6f}, {rw.ess[i]:0.1f}\n")
    return p


def write_npt_csv(d, cfg: SMCConfig, pressure: float, res: NPTResults):
    """npt_*.csv: run summary in the header comment, then the pooled
    per-sweep (V, rho, E) trace (chain means)."""
    from .io import _fname

    p = _fname(d, "npt", cfg)
    with open(p, "w") as f:
        f.write(f"# P, {pressure:0.9f}, mean_density, "
                f"{res.mean_density:0.9f}, err_density, "
                f"{res.err_density:0.9f}, mean_V, {res.mean_v:0.6f}, "
                f"E, {res.mean_energy:0.6f}, H_conf, "
                f"{res.enthalpy:0.6f}, kappa_T, {res.kappa_t:0.6f}, "
                f"acc_disp, {res.disp_acceptance:0.4f}, acc_vol, "
                f"{res.vol_acceptance:0.4f}\n")
        f.write("sweep, V_mean, rho_mean, E_mean\n")
        v_m = res.volume_trace.mean(axis=1)
        e_m = res.energy_trace.mean(axis=1)
        for i in range(len(v_m)):
            f.write(f"{i}, {v_m[i]:0.6f}, {cfg.n / v_m[i]:0.9f}, "
                    f"{e_m[i]:0.6f}\n")
    if res.gr is not None:
        pg = _fname(d, "npt_gr", cfg)
        with open(pg, "w") as f:
            f.write("r, g\n")
            for ri, gi in zip(res.gr_r, res.gr):
                f.write(f"{ri:0.6f}, {gi:0.6f}\n")
    return p
