"""Grand-canonical Monte Carlo: adsorption isotherms from a chemical
potential.

Beyond-reference capability closing the loop the Widom layer opened
(widom.py measures mu at fixed N; this samples N at fixed mu — together
they give isotherms mu <-> coverage, the core question a wall-adsorption
code exists to answer). The reference is strictly NVT (SMC.c).

TPU-native design: XLA needs static shapes, so the particle count is a
CAPACITY `cap` with an active mask — all pair physics is mask algebra
on fixed [cap] arrays, insertions claim the first free slot, deletions
clear one. Everything stays inside jit (`lax.fori_loop` over moves,
fixed-shape scans over sweeps); chains vmap exactly like ensemble.py.

Moves per GC sweep: one smart-MC displacement pass over the capacity
(inactive slots are masked no-ops — same force-biased proposal and
acceptance as sampler.sweep, SMC.c:278-351) followed by `n_exchange`
insertion/deletion attempts with the standard textbook acceptances
(Frenkel & Smit ch. 5; Lambda = 1 reduced units):

    insert: min(1, z V / (N+1) * exp(-dU/T))
    delete: min(1, N / (z V)   * exp(+dU/T)),      z = exp(mu/T)

V is the full box volume L*L*Lz (insertion positions are uniform over
it; identical convention to widom.widom_delta_u, so a Widom-measured
mu = T ln rho + mu_ex feeds straight back in — tests/test_gcmc.py
closes that loop numerically).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import SMCConfig
from .potentials import energy_force_single, pair_energy_force_single
from .potentials import wall_energy_force_single
from .sampler import _wrap_proposal


class GCMCState(NamedTuple):
    """One grand-canonical chain (vmap for ensembles)."""

    r: jax.Array        # [cap, 3] positions (parked slots hold stale data)
    active: jax.Array   # [cap] bool
    energy: jax.Array   # running potential energy of the ACTIVE set
    key: jax.Array
    sweeps: jax.Array       # int32
    disp_acc: jax.Array     # int32 accepted displacement moves
    disp_att: jax.Array     # int32 attempted (= active count per sweep)
    ins_acc: jax.Array      # int32
    ins_att: jax.Array
    del_acc: jax.Array
    del_att: jax.Array
    # Widom-for-free: every insertion attempt is a ghost sample, so the
    # run measures its own mu_ex = -T ln <exp(-dU/T)> as it goes —
    # mu = T ln rho + mu_ex is an in-run self-consistency identity
    boltz_sum: jax.Array    # f32/f64 running sum of exp(-dU/T)
    boltz_cnt: jax.Array    # int32 insertion attempts counted


def _pair_masked(r, active, i, ri, cfg: SMCConfig, box=None):
    """Active-subset pair energy/force: the SHARED parity-tested kernel
    (potentials.pair_energy_force_single) with its optional active
    mask — single-sourced LJ arithmetic, nothing re-implemented here.
    `box`: optional traced cubic side (the Gibbs engine's fluctuating
    boxes, gibbs.py; Python-level branch like everywhere else)."""
    return pair_energy_force_single(r, i, ri, cfg, active=active,
                                    box=box)


def _site_energy_force(r, active, i, ri, w, cfg: SMCConfig, box=None):
    return energy_force_single(r, i, ri, w, cfg, active=active, box=box)


def total_energy_masked(r, active, w, cfg: SMCConfig,
                        box=None) -> jax.Array:
    """Exact active-set energy (bookkeeping cross-check)."""
    cap = r.shape[0]

    def row(i):
        u, _ = _pair_masked(r, active, i, r[i], cfg, box=box)
        return jnp.where(active[i], u, 0.0)

    u = 0.5 * jnp.sum(jax.vmap(row)(jnp.arange(cap)))
    if cfg.use_walls:
        uw = jax.vmap(
            lambda ri: wall_energy_force_single(ri, w, cfg)[0])(r)
        u = u + jnp.sum(jnp.where(active, uw, 0.0))
    return u


def masked_disp_pass(r, active, energy, w, cfg: SMCConfig, a, t,
                     noise, unif, offset, box=None):
    """One smart-MC displacement pass over the capacity with inactive
    slots masked to no-ops (the displacement half of gc_sweep, factored
    so the Gibbs engine reuses it verbatim per box). `noise` [cap, 3],
    `unif` [cap], `offset` scalar are drawn by the caller — the key
    discipline stays theirs. Returns (r, energy, accepted)."""
    dtype = cfg.jnp_dtype
    cap = r.shape[0]

    def move(nn, carry):
        r, active, energy, acc = carry
        i = (nn + offset) % cap
        ri = r[i]
        um, fm = _site_energy_force(r, active, i, ri, w, cfg, box=box)
        delta = fm * (a / t) + noise[i]
        rp = _wrap_proposal(ri + delta, cfg, box=box)
        un, fn = _site_energy_force(r, active, i, rp, w, cfg, box=box)
        df = fn - fm
        dw = (jnp.sum(df * df) + 2.0 * jnp.sum(df * fm)) * a / (4.0 * t)
        log_ap = -(un - um + 0.5 * jnp.sum(delta * (fn + fm)) + dw) / t
        accept = (unif[nn] < jnp.exp(jnp.minimum(log_ap, 0.0))) \
            | (log_ap >= 0.0)
        accept = accept & active[i]
        r = r.at[i].set(jnp.where(accept, rp, ri))
        energy = energy + jnp.where(accept, un - um, jnp.zeros((), dtype))
        acc = acc + accept.astype(jnp.int32)
        return r, active, energy, acc

    r, active, energy, acc = jax.lax.fori_loop(
        0, cap, move, (r, active, energy, jnp.zeros((), jnp.int32)))
    return r, energy, acc


def box_volume(cfg: SMCConfig) -> float:
    return float(cfg.box_l * cfg.box_l * cfg.box_lz)


def gc_sweep(
    state: GCMCState,
    w: jax.Array,
    cfg: SMCConfig,
    mu: float | jax.Array,
    a: float | jax.Array,
    n_exchange: int,
) -> GCMCState:
    """One grand-canonical sweep: a masked smart-MC displacement pass
    over the capacity, then `n_exchange` insert/delete attempts."""
    dtype = cfg.jnp_dtype
    cap = state.r.shape[0]
    t = jnp.asarray(cfg.temperature, dtype)
    a = jnp.asarray(a, dtype)
    mu = jnp.asarray(mu, dtype)
    vol = jnp.asarray(box_volume(cfg), dtype)

    key, k_noise, k_unif, k_off, k_ex = jax.random.split(state.key, 5)
    noise = jnp.sqrt(2.0 * a) * jax.random.normal(k_noise, (cap, 3), dtype)
    unif = jax.random.uniform(k_unif, (cap,), dtype)
    offset = jax.random.randint(k_off, (), 0, cap)

    # --- displacement pass (sampler.sweep with the active mask) ---
    r, energy, dacc = masked_disp_pass(
        state.r, state.active, state.energy, w, cfg, a, t,
        noise, unif, offset)
    active = state.active

    # --- insertion / deletion attempts ---
    ex_kind = jax.random.bernoulli(
        jax.random.fold_in(k_ex, 0), 0.5, (n_exchange,))
    ex_pos_xy = jax.random.uniform(
        jax.random.fold_in(k_ex, 1), (n_exchange, 2), dtype,
        -cfg.box_l / 2.0, cfg.box_l / 2.0)
    ex_pos_z = jax.random.uniform(
        jax.random.fold_in(k_ex, 2), (n_exchange,), dtype,
        -cfg.box_lz / 2.0, cfg.box_lz / 2.0)
    ex_unif = jax.random.uniform(
        jax.random.fold_in(k_ex, 3), (n_exchange,), dtype)
    ex_pick = jax.random.uniform(
        jax.random.fold_in(k_ex, 4), (n_exchange,), dtype)

    def attempt(carry, j):
        r, active, energy, ia, it, da, dt, bs, bc = carry
        n = jnp.sum(active).astype(dtype)

        def do_insert(_):
            gi = jnp.concatenate([ex_pos_xy[j], ex_pos_z[j][None]])
            du, _ = _site_energy_force(r, active, jnp.int32(-1), gi, w,
                                       cfg)
            slot = jnp.argmin(active)   # first free slot (False < True)
            room = ~active[slot]        # full capacity -> auto-reject
            log_ap = (jnp.log(vol) - jnp.log1p(n) + (mu - du) / t)
            ok = room & ((ex_unif[j] < jnp.exp(jnp.minimum(log_ap, 0.0)))
                         | (log_ap >= 0.0))
            r2 = r.at[slot].set(jnp.where(ok, gi, r[slot]))
            act2 = active.at[slot].set(active[slot] | ok)
            e2 = energy + jnp.where(ok, du, jnp.zeros((), dtype))
            # the attempt doubles as a Widom ghost sample. Only a
            # genuine overlap (du = +inf -> exp -> 0, or nan) has
            # weight 0; a DEEP well overflowing exp must clamp to a
            # large finite weight, not vanish — mapping overflow to 0
            # would delete exactly the highest-weight samples and bias
            # mu_ex upward at strong adsorption.
            lw = -du / t
            bw = jnp.exp(jnp.minimum(lw, jnp.asarray(80.0, dtype)))
            bw = jnp.where(jnp.isnan(lw), jnp.zeros((), dtype), bw)
            return (r2, act2, e2, ia + ok.astype(jnp.int32),
                    it + jnp.int32(1), da, dt, bs + bw,
                    bc + jnp.int32(1))

        def do_delete(_):
            # the k-th active particle, k uniform in [0, n)
            k = jnp.floor(ex_pick[j] * n).astype(jnp.int32)
            slot = jnp.argmax(jnp.cumsum(active.astype(jnp.int32))
                              == k + 1)
            have = n > 0.5
            du, _ = _site_energy_force(r, active, slot, r[slot], w, cfg)
            log_ap = (jnp.log(jnp.maximum(n, 1.0)) - jnp.log(vol)
                      + (du - mu) / t)
            ok = have & ((ex_unif[j] < jnp.exp(jnp.minimum(log_ap, 0.0)))
                         | (log_ap >= 0.0))
            act2 = active.at[slot].set(active[slot] & ~ok)
            e2 = energy - jnp.where(ok, du, jnp.zeros((), dtype))
            return (r, act2, e2, ia, it, da + ok.astype(jnp.int32),
                    dt + jnp.int32(1), bs, bc)

        out = jax.lax.cond(ex_kind[j], do_insert, do_delete, None)
        return out, None

    init = (r, active, energy, jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.int32), jnp.zeros((), dtype),
            jnp.zeros((), jnp.int32))
    (r, active, energy, ia, it, da, dt, bs, bc), _ = jax.lax.scan(
        attempt, init, jnp.arange(n_exchange))

    return GCMCState(
        r=r, active=active, energy=energy, key=key,
        sweeps=state.sweeps + 1,
        disp_acc=state.disp_acc + dacc,
        disp_att=state.disp_att + jnp.sum(state.active).astype(jnp.int32),
        ins_acc=state.ins_acc + ia, ins_att=state.ins_att + it,
        del_acc=state.del_acc + da, del_att=state.del_att + dt,
        boltz_sum=state.boltz_sum + bs,
        boltz_cnt=state.boltz_cnt + bc,
    )


def cubic_grid(cfg: SMCConfig, n0: int) -> np.ndarray:
    """Never-overlapping simple-cubic start: ceil(n0^(1/3))^3 sites
    sized to the box, first n0 taken. Shared by the GCMC and NPT
    engines, whose arbitrary (n, box) combinations degenerate the
    reference FCC builder (see init_gcmc_state)."""
    import math

    m = max(1, math.ceil(n0 ** (1.0 / 3.0)))
    ax_xy = (np.arange(m) + 0.5) / m * cfg.box_l - cfg.box_l / 2.0
    zspan = cfg.box_lz if cfg.pbc_z else max(cfg.box_lz - 2.0, 1.0)
    ax_z = (np.arange(m) + 0.5) / m * zspan - zspan / 2.0
    grid = np.stack(np.meshgrid(ax_xy, ax_xy, ax_z,
                                indexing="ij"), axis=-1).reshape(-1, 3)
    return grid[:n0]


def init_gcmc_state(cfg: SMCConfig, key: jax.Array, cap: int,
                    n0: int | None = None) -> Tuple[GCMCState, jax.Array]:
    """Start from n0 active particles (default cap//2) on a simple-cubic
    grid sized to the box. The reference FCC builder (fcc_lattice,
    SMC.c:413-465) assumes the slab geometry and degenerates for
    arbitrary (n, box) combinations — its wrapped z-layers can land on
    top of each other, and hard overlaps among the initial ACTIVE set
    leave a permanent f32 cancellation offset in the tracked energy
    (measured: drift 0.88 at cap=24 in a cubic box). A ceil(n0^(1/3))^3
    grid never overlaps; equilibration erases the init anyway. Parked
    slots repeat active positions; they are masked out of all physics
    until an insertion overwrites them."""
    from .state import init_chain_state

    cfg_cap = _with_n(cfg, cap)
    n0 = cap // 2 if n0 is None else n0
    if not 0 < n0 <= cap:
        raise ValueError(f"n0 ({n0}) must be in (0, cap={cap}]")
    r0 = cubic_grid(cfg, n0)
    # keys/wall table from the standard initializer, grid positions
    chain, w = init_chain_state(_with_n(cfg, n0), key, r0=r0)
    reps = -(-cap // n0)
    r = jnp.asarray(np.tile(r0, (reps, 1))[:cap], cfg.jnp_dtype)
    active = jnp.arange(cap) < n0
    st = GCMCState(
        r=r, active=active,
        energy=total_energy_masked(r, active, w, cfg_cap),
        key=chain.key,
        sweeps=jnp.zeros((), jnp.int32),
        disp_acc=jnp.zeros((), jnp.int32),
        disp_att=jnp.zeros((), jnp.int32),
        ins_acc=jnp.zeros((), jnp.int32),
        ins_att=jnp.zeros((), jnp.int32),
        del_acc=jnp.zeros((), jnp.int32),
        del_att=jnp.zeros((), jnp.int32),
        boltz_sum=jnp.zeros((), cfg.jnp_dtype),
        boltz_cnt=jnp.zeros((), jnp.int32),
    )
    return st, w


def _with_n(cfg: SMCConfig, cap: int) -> SMCConfig:
    import dataclasses

    return dataclasses.replace(cfg, n=cap)


def _masked_gr_hist(r, active, cfg: SMCConfig, nbins: int):
    """Pair-distance histogram over ACTIVE pairs (min-image like
    radial_distribution), [nbins] counts + the active pair count —
    normalization happens on the host over the whole trace."""
    cap = r.shape[0]
    rmax = (cfg.lj_cutoff if cfg.lj_cutoff < cfg.box_l / 2
            else cfg.box_l / 2)
    d = r[:, None, :] - r[None, :, :]
    dx = d[..., 0] - cfg.box_l * jnp.round(d[..., 0] / cfg.box_l)
    dy = d[..., 1] - cfg.box_l * jnp.round(d[..., 1] / cfg.box_l)
    dz = d[..., 2]
    if cfg.pbc_z:
        dz = dz - cfg.box_lz * jnp.round(dz / cfg.box_lz)
    dr = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    iu = jnp.triu_indices(cap, k=1)
    pair_ok = (active[iu[0]] & active[iu[1]]).astype(jnp.float32)
    b = jnp.clip((dr[iu] / rmax * nbins).astype(jnp.int32), 0, nbins)
    hist = jnp.zeros((nbins + 1,), jnp.float32).at[b].add(
        pair_ok)[:nbins]
    n = jnp.sum(active).astype(jnp.float32)
    return hist, n * (n - 1.0) / 2.0


@partial(jax.jit, static_argnames=("cfg", "n_sweeps", "n_exchange",
                                   "z_bins", "gr_bins"))
def gc_block(state: GCMCState, w, cfg: SMCConfig, mu, a, n_sweeps: int,
             n_exchange: int, z_bins: int = 0, gr_bins: int = 0):
    """n_sweeps GC sweeps as one compiled scan; traces
    (N, E[, z-hist][, gr-hist, n-pairs]) per sweep — profiles accumulate
    over EVERY production sweep like the NVT drivers' bins, not from one
    snapshot."""

    def body(st, _):
        st = gc_sweep(st, w, cfg, mu, a, n_exchange)
        if z_bins:
            zb = jnp.clip(((st.r[:, 2] / cfg.box_lz + 0.5)
                           * z_bins).astype(jnp.int32), 0, z_bins - 1)
            h = jnp.zeros((z_bins,), jnp.float32).at[zb].add(
                st.active.astype(jnp.float32))
        else:
            h = jnp.zeros((0,), jnp.float32)
        if gr_bins:
            gh, npr = _masked_gr_hist(st.r, st.active, cfg, gr_bins)
        else:
            gh = jnp.zeros((0,), jnp.float32)
            npr = jnp.zeros((), jnp.float32)
        return st, (jnp.sum(st.active).astype(jnp.int32), st.energy, h,
                    gh, npr)

    return jax.lax.scan(body, state, None, length=n_sweeps)


class GCMCResults(NamedTuple):
    mean_n: float
    err_n: float            # chain-spread error bar (ensemble runs)
    mean_density: float     # <N>/V
    mean_energy: float      # potential E (no kinetic: N fluctuates)
    disp_acceptance: float
    insert_acceptance: float
    delete_acceptance: float
    n_trace: np.ndarray     # [sweeps, C]
    energy_trace: np.ndarray
    zprofile: np.ndarray | None
    gr: np.ndarray | None
    r_final: np.ndarray
    active_final: np.ndarray
    # mu_ex from the insertion attempts themselves (Widom-for-free);
    # T ln(density) + mu_ex should reproduce the imposed mu — printed
    # by the CLI as an in-run self-consistency check. Shared-mu runs
    # only (per-chain-mu isotherms pool chains at different states).
    mu_ex: float = float("nan")
    # isothermal compressibility from the number fluctuations,
    # kappa_T = V <dN^2> / (T <N>^2) — the grand-canonical route to a
    # quantity the reference cannot touch (NVT fixes N). The trace is
    # correlated, so this is a point estimate; dilute limit is Poisson
    # (<dN^2> = <N> -> kappa_T = 1/(rho T), pinned in test_gcmc).
    kappa_t: float = float("nan")


def simulate_gcmc(
    cfg: SMCConfig,
    mu: float | np.ndarray,
    cap: int,
    eqsteps: int,
    maxsteps: int,
    key: jax.Array,
    n_chains: int = 1,
    n_exchange: int | None = None,
    n0: int | None = None,
    z_bins: int = 0,
    gr_bins: int = 0,
    chunk: int = 200,
    state0: GCMCState | None = None,
) -> Tuple[GCMCState, GCMCResults]:
    """Grand-canonical driver: thermalization + production, vmapped over
    independent chains; device calls chunked under the TPU watchdog.
    `n_exchange` defaults to cap//4 attempts per sweep.

    `mu` may be a PER-CHAIN array [n_chains]: the chemical-potential
    axis rides the chain batch exactly like temperature ladders do
    (tsweep.py) — a whole adsorption isotherm mu -> <N> runs as ONE
    compiled program (examples/adsorption_isotherm.py). The pooled
    scalar summary fields only average meaningfully for a shared mu;
    isotherm runs read the per-chain `n_trace` columns."""
    if n_exchange is None:
        n_exchange = max(1, cap // 4)
    cfg_cap = _with_n(cfg, cap)
    a = cfg.proposal_a
    mus = jnp.broadcast_to(
        jnp.asarray(mu, cfg.jnp_dtype), (n_chains,))

    if state0 is not None:
        # resume (load_gcmc_checkpoint): batched state as saved; the
        # wall table is deterministic per cfg
        if state0.r.shape[0] != n_chains or state0.r.shape[1] != cap:
            raise ValueError(
                f"checkpoint holds {state0.r.shape[0]} chains x "
                f"cap {state0.r.shape[1]}; run asked "
                f"{n_chains} x {cap}")
        state = state0
        w = init_gcmc_state(cfg, jax.random.key(0), cap, n0=n0)[1]
    else:
        keys = jax.random.split(key, n_chains)
        pairs = [init_gcmc_state(cfg, k, cap, n0=n0) for k in keys]
        state = jax.tree.map(lambda *xs: jnp.stack(xs),
                             *[p[0] for p in pairs])
        w = pairs[0][1]

    run = jax.jit(jax.vmap(
        lambda st, m: gc_block(st, w, cfg_cap, m, a, chunk, n_exchange,
                               z_bins=z_bins, gr_bins=gr_bins)),
        static_argnums=())
    # O(cap^2) per-chain recompute: HBM-bounded like every other pair
    # observable (CLAUDE.md: a whole-ensemble vmap materializes
    # [C, cap, cap] and OOMs at production sizes)
    from .observables import vmap_chains_bounded

    resync = jax.jit(lambda r, act: vmap_chains_bounded(
        lambda ra: total_energy_masked(ra[0], ra[1], w, cfg_cap),
        (r, act), cap))

    def do(state, n_sweeps, collect):
        traces = []
        done = 0
        while done < n_sweeps:
            k = min(chunk, n_sweeps - done)
            if k != chunk:
                st_tr = jax.jit(jax.vmap(
                    lambda st, m: gc_block(
                        st, w, cfg_cap, m, a, k, n_exchange,
                        z_bins=z_bins, gr_bins=gr_bins)))(state, mus)
            else:
                st_tr = run(state, mus)
            state, tr = st_tr
            # Exact energy re-sync per chunk (the NVT drivers'
            # recompute_every analog): every insertion/deletion adds one
            # f32 rounding at the CURRENT energy scale, and a long run
            # would accumulate it into the acceptance arithmetic.
            state = state._replace(energy=resync(state.r, state.active))
            np.asarray(state.energy)  # sync (watchdog-safe chunks)
            if collect:
                traces.append(jax.tree.map(np.asarray, tr))
            done += k
        return state, traces

    state, _ = do(state, eqsteps, collect=False)
    zero = jnp.zeros_like(state.disp_acc)
    state = state._replace(disp_acc=zero, disp_att=zero, ins_acc=zero,
                           ins_att=zero, del_acc=zero, del_att=zero,
                           boltz_sum=jnp.zeros_like(state.boltz_sum),
                           boltz_cnt=zero)
    state, traces = do(state, maxsteps, collect=True)

    n_tr = np.concatenate([t[0] for t in traces], axis=1).T \
        if traces else np.zeros((0, n_chains))   # [S, C]
    e_tr = np.concatenate([t[1] for t in traces], axis=1).T \
        if traces else np.zeros((0, n_chains))

    chain_n = n_tr.mean(axis=0) if n_tr.size else np.zeros(n_chains)
    zp = None
    if z_bins and traces:
        # per-sweep histograms [C, S, nb] -> production mean density
        h = np.concatenate([t[2] for t in traces], axis=1)
        zp = h.mean(axis=(0, 1)) / (cfg.box_l ** 2
                                    * (cfg.box_lz / z_bins))
    gr = None
    if gr_bins and traces:
        # pair-weighted g(r): sum of pair histograms over the whole
        # trace, normalized by the summed active-pair counts per shell
        # (the fluctuating-N generalization of V/(N(N-1)/2) * h/shell)
        gh = np.concatenate([t[3] for t in traces],
                            axis=1).sum(axis=(0, 1))
        npr = float(np.concatenate([t[4] for t in traces],
                                   axis=1).sum())
        rmax = (cfg.lj_cutoff if cfg.lj_cutoff < cfg.box_l / 2
                else cfg.box_l / 2)
        edges = np.linspace(0.0, rmax, gr_bins + 1)
        shell = (4.0 / 3.0) * np.pi * (edges[1:] ** 3 - edges[:-1] ** 3)
        v = box_volume(cfg)
        gr = (gh / max(npr, 1.0)) * v / shell

    def rate(acc, att):
        acc = int(np.asarray(acc).sum())
        att = int(np.asarray(att).sum())
        return acc / att if att else float("nan")

    bsum = float(np.asarray(state.boltz_sum, np.float64).sum())
    bcnt = int(np.asarray(state.boltz_cnt).sum())
    mu_ex_run = (-cfg.temperature * np.log(bsum / bcnt)
                 if bcnt and bsum > 0 else float("nan"))
    if n_tr.size and n_tr.mean() > 0:
        kappa = (box_volume(cfg) * float(n_tr.var())
                 / (cfg.temperature * float(n_tr.mean()) ** 2))
    else:
        kappa = float("nan")

    res = GCMCResults(
        mean_n=float(chain_n.mean()),
        err_n=float(chain_n.std() / np.sqrt(max(1, n_chains - 1)))
        if n_chains > 1 else float(n_tr.std() / np.sqrt(max(1, len(n_tr)))),
        mean_density=float(chain_n.mean()) / box_volume(cfg),
        mean_energy=float(e_tr.mean()) if e_tr.size else float("nan"),
        disp_acceptance=rate(state.disp_acc, state.disp_att),
        insert_acceptance=rate(state.ins_acc, state.ins_att),
        delete_acceptance=rate(state.del_acc, state.del_att),
        n_trace=n_tr,
        energy_trace=e_tr,
        zprofile=zp,
        gr=gr,
        r_final=np.asarray(state.r),
        active_final=np.asarray(state.active),
        mu_ex=mu_ex_run,
        kappa_t=kappa,
    )
    return state, res


def save_gcmc_checkpoint(path, state: GCMCState, cfg: SMCConfig):
    """Full GCMC (ensemble) state -> npz, io.save_checkpoint's format
    with the active mask and exchange counters. Resume is BITWISE: the
    per-sweep key stream lives in the state and no acceptance reads the
    tracked energy, so chunking/resync cannot perturb trajectories."""
    import json
    from pathlib import Path

    path = Path(path)
    if path.suffix != ".npz":
        path = path.with_name(path.name + ".npz")
    path.parent.mkdir(parents=True, exist_ok=True)
    arrays = {f: np.asarray(getattr(state, f)) for f in state._fields
              if f != "key"}
    arrays["key"] = np.asarray(jax.random.key_data(state.key))
    cfg_json = json.dumps(
        {f: getattr(cfg, f) for f in cfg.__dataclass_fields__})
    from .io import atomic_savez

    atomic_savez(path, __config__=np.frombuffer(cfg_json.encode(),
                                                dtype=np.uint8),
                 __gcmc__=np.asarray(1), **arrays)
    return path


def load_gcmc_checkpoint(path):
    """-> (GCMCState, SMCConfig); cfg.n is the run's base n (the
    capacity is the checkpoint's r.shape[-2])."""
    import json

    from .config import SMCConfig

    data = np.load(path)
    if "__gcmc__" not in data:
        raise ValueError(f"{path} is not a GCMC checkpoint")
    cfg = SMCConfig(**json.loads(bytes(data["__config__"]).decode()))
    if cfg.dtype == "float64" and not jax.config.jax_enable_x64:
        jax.config.update("jax_enable_x64", True)
    dtype = cfg.jnp_dtype
    ints = {"sweeps", "disp_acc", "disp_att", "ins_acc", "ins_att",
            "del_acc", "del_att", "boltz_cnt"}
    fields = {}
    for f in GCMCState._fields:
        if f == "key":
            fields[f] = jax.random.wrap_key_data(jnp.asarray(data["key"]))
        elif f == "active":
            fields[f] = jnp.asarray(data[f], bool)
        elif f in ints:
            fields[f] = jnp.asarray(data[f], jnp.int32)
        else:
            fields[f] = jnp.asarray(data[f], dtype)
    return GCMCState(**fields), cfg


def write_gcmc_csv(d, cfg: SMCConfig, mu: float, res: GCMCResults):
    """gcmc_*.csv: run summary in the header comment, then the pooled
    per-sweep (N, E) trace (chain means)."""
    from .io import _fname

    p = _fname(d, "gcmc", cfg)
    with open(p, "w") as f:
        f.write(f"# mu, {mu:0.9f}, mean_N, {res.mean_n:0.6f}, "
                f"err_N, {res.err_n:0.6f}, density, "
                f"{res.mean_density:0.9f}, acc_disp, "
                f"{res.disp_acceptance:0.4f}, acc_ins, "
                f"{res.insert_acceptance:0.4f}, acc_del, "
                f"{res.delete_acceptance:0.4f}, mu_ex_run, "
                f"{res.mu_ex:0.6f}\n")
        f.write("sweep, N_mean, E_mean\n")
        n_m = res.n_trace.mean(axis=1)
        e_m = res.energy_trace.mean(axis=1)
        for i in range(len(n_m)):
            f.write(f"{i}, {n_m[i]:0.4f}, {e_m[i]:0.6f}\n")
    return p
