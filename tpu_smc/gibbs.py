"""Gibbs-ensemble Monte Carlo: direct liquid-vapor coexistence in two
coupled boxes (Panagiotopoulos 1987).

Completes the ensemble family — NVT (the reference, SMC.c), muVT
(gcmc.py), NPT (npt.py), and now the two-box Gibbs ensemble: total
N = N1 + N2 and total V = V1 + V2 are fixed while particles and volume
exchange between the boxes until the two phases coexist at equal
pressure and chemical potential, WITHOUT ever specifying either. The
strictly-NVT reference cannot pose the coexistence question at all.

TPU-native composition of the two ensemble tricks already in the tree:
  - GCMC's capacity + active-mask shape discipline (each box is a
    static [cap, 3] array with an active mask; transfers clear a donor
    slot and claim the acceptor's first free slot) — the displacement
    pass is literally gcmc.masked_disp_pass;
  - NPT's traced box side (each box's cubic L is data riding the chain
    batch; the `box` override threads the same potentials.py code
    paths).
The box pair is a leading axis of size 2, vmapped per chain; chains
vmap into ensembles exactly like every other engine.

Moves per Gibbs sweep (Frenkel & Smit ch. 8):
  1. one masked smart-MC displacement pass in EACH box at its current L
     (independent key streams per box);
  2. one coupled volume exchange, sampled in y = ln(V1/V2) at fixed
     Vtot: V1' = Vtot e^(y+s)/(1 + e^(y+s)), accepted with
       min(1, exp(-(dU1 + dU2)/T + (N1+1) ln(V1'/V1)
                                 + (N2+1) ln(V2'/V2)));
     V2' = Vtot - V1' by construction, so total volume CANNOT drift;
  3. `n_transfer` particle transfers: a uniformly-chosen active
     particle of a random donor box is proposed at a uniform position
     of the other box, accepted with
       min(1, N_don V_acc / ((N_acc + 1) V_don) * exp(-(dU_acc
            - dU_don)/T)).

Every transfer's ghost insertion doubles as a Widom sample of the
ACCEPTOR box (direction is config-independent, so the samples are
unbiased) — the run measures per-box mu = T ln rho + mu_ex as it goes,
and chemical equilibrium (mu1 == mu2) becomes an in-run diagnostic of
converged coexistence.

Like npt.py the pair cutoff is STATIC with a hard floor L >= 2 rc per
box (volume exchanges that would crush either box below two cutoffs
are rejected), and `cfg.lj_shift` should be on so the boxes
equilibrate against the true mechanical pressure.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import SMCConfig
from .gcmc import (cubic_grid, masked_disp_pass, total_energy_masked,
                   _site_energy_force)


class GibbsState(NamedTuple):
    """One two-box Gibbs chain (vmap for ensembles)."""

    r: jax.Array        # [2, cap, 3] positions (parked slots stale)
    active: jax.Array   # [2, cap] bool
    l: jax.Array        # [2] cubic box sides
    energy: jax.Array   # [2] running potential energies
    key: jax.Array      # displacement streams (split per box per sweep)
    vkey: jax.Array     # volume-exchange stream
    tkey: jax.Array     # transfer stream
    sweeps: jax.Array   # int32
    disp_acc: jax.Array  # int32
    vol_acc: jax.Array  # int32
    vol_att: jax.Array  # int32
    tr_acc: jax.Array   # int32
    tr_att: jax.Array   # int32
    # per-box Widom-for-free accumulators (transfer ghosts)
    boltz_sum: jax.Array  # [2]
    boltz_cnt: jax.Array  # [2] int32


def gibbs_sweep(
    state: GibbsState,
    cfg: SMCConfig,
    a: float | jax.Array,
    dlnv: float | jax.Array,
    n_transfer: int,
    temperature: float | jax.Array | None = None,
) -> GibbsState:
    """One Gibbs sweep: per-box displacement passes, one volume
    exchange, `n_transfer` particle transfers."""
    dtype = cfg.jnp_dtype
    cap = state.r.shape[1]
    t = jnp.asarray(
        cfg.temperature if temperature is None else temperature, dtype)
    a = jnp.asarray(a, dtype)
    dlnv = jnp.asarray(dlnv, dtype)
    w = jnp.zeros((0,), dtype)   # bulk: no wall table
    vtot = 2.0 * jnp.asarray(cfg.box_l, dtype) ** 3

    # --- 1. displacement pass per box (gcmc.masked_disp_pass) -------
    key, k1, k2 = jax.random.split(state.key, 3)

    def draw(k):
        kn, ku, ko = jax.random.split(k, 3)
        return (jnp.sqrt(2.0 * a)
                * jax.random.normal(kn, (cap, 3), dtype),
                jax.random.uniform(ku, (cap,), dtype),
                jax.random.randint(ko, (), 0, cap))

    noise, unif, offset = jax.tree.map(
        lambda *xs: jnp.stack(xs), *(draw(k1), draw(k2)))
    r, energy, dacc = jax.vmap(
        lambda rr, aa, ee, nn, uu, oo, ll: masked_disp_pass(
            rr, aa, ee, w, cfg, a, t, nn, uu, oo, box=ll)
    )(state.r, state.active, state.energy, noise, unif, offset, state.l)
    active = state.active

    # --- 2. coupled volume exchange in y = ln(V1/V2) ----------------
    vkey, k_step, k_vacc = jax.random.split(state.vkey, 3)
    s = dlnv * (2.0 * jax.random.uniform(k_step, (), dtype) - 1.0)
    v1 = state.l[0] ** 3
    v2 = state.l[1] ** 3
    y_new = jnp.log(v1) - jnp.log(v2) + s
    v1n = vtot * jax.nn.sigmoid(y_new)
    # frozen-exchange runs (dlnv = 0) must be the identity proposal
    # BITWISE (the two-independent-NVT pin, test_gibbs): the log/exp
    # round trip is not exact, so pin s == +-0.0 to the current pair
    v1n = jnp.where(s == 0.0, v1, v1n)
    v2n = jnp.where(s == 0.0, v2, vtot - v1n)
    # ... and the SIDES directly (cbrt(l^3) is not bitwise l)
    l1n = jnp.where(s == 0.0, state.l[0], jnp.cbrt(v1n))
    l2n = jnp.where(s == 0.0, state.l[1], jnp.cbrt(v2n))
    scale = jnp.stack([jnp.cbrt(v1n / v1), jnp.cbrt(v2n / v2)])
    l_new = jnp.stack([l1n, l2n])
    r_new = r * scale[:, None, None]
    u_new = jax.vmap(
        lambda rr, aa, ll: total_energy_masked(rr, aa, w, cfg, box=ll)
    )(r_new, active, l_new)
    n1 = jnp.sum(active[0]).astype(dtype)
    n2 = jnp.sum(active[1]).astype(dtype)
    log_ap = (-(jnp.sum(u_new) - jnp.sum(energy)) / t
              + (n1 + 1.0) * jnp.log(v1n / v1)
              + (n2 + 1.0) * jnp.log(v2n / v2))
    vunif = jax.random.uniform(k_vacc, (), dtype)
    vok = (vunif < jnp.exp(jnp.minimum(log_ap, 0.0))) | (log_ap >= 0.0)
    # hard floor: neither box may shrink below two cutoffs
    vok = vok & (l_new >= 2.0 * cfg.lj_cutoff).all()
    r = jnp.where(vok, r_new, r)
    l = jnp.where(vok, l_new, state.l)
    energy = jnp.where(vok, u_new, energy)

    # --- 3. particle transfers ---------------------------------------
    if n_transfer == 0:
        # static no-transfer mode (the two-independent-NVT pin): no
        # draws, no scan — tkey still advances so adding transfers
        # later doesn't silently reuse displacement streams
        tkey, _ = jax.random.split(state.tkey)
        return GibbsState(
            r=r, active=active, l=l, energy=energy,
            key=key, vkey=vkey, tkey=tkey,
            sweeps=state.sweeps + 1,
            disp_acc=state.disp_acc + jnp.sum(dacc, dtype=jnp.int32),
            vol_acc=state.vol_acc + vok.astype(jnp.int32),
            vol_att=state.vol_att + jnp.int32(1),
            tr_acc=state.tr_acc, tr_att=state.tr_att,
            boltz_sum=state.boltz_sum, boltz_cnt=state.boltz_cnt,
        )
    tkey, k_t = jax.random.split(state.tkey)
    t_dir = jax.random.bernoulli(jax.random.fold_in(k_t, 0), 0.5,
                                 (n_transfer,))
    t_pos = jax.random.uniform(jax.random.fold_in(k_t, 1),
                               (n_transfer, 3), dtype) - 0.5
    t_unif = jax.random.uniform(jax.random.fold_in(k_t, 2),
                                (n_transfer,), dtype)
    t_pick = jax.random.uniform(jax.random.fold_in(k_t, 3),
                                (n_transfer,), dtype)

    def attempt(carry, j):
        r, active, energy, ta, bs, bc = carry
        don = t_dir[j].astype(jnp.int32)
        acc_b = 1 - don
        n_don = jnp.sum(active[don]).astype(dtype)
        n_acc = jnp.sum(active[acc_b]).astype(dtype)
        l_don, l_acc = l[don], l[acc_b]
        # donor particle: the k-th active slot, k uniform in [0, n_don)
        k = jnp.floor(t_pick[j] * jnp.maximum(n_don, 1.0)) \
            .astype(jnp.int32)
        slot_d = jnp.argmax(jnp.cumsum(active[don].astype(jnp.int32))
                            == k + 1)
        du_d, _ = _site_energy_force(r[don], active[don], slot_d,
                                     r[don, slot_d], w, cfg, box=l_don)
        # acceptor ghost at a uniform position of the acceptor box
        gi = t_pos[j] * l_acc
        du_a, _ = _site_energy_force(r[acc_b], active[acc_b],
                                     jnp.int32(-1), gi, w, cfg,
                                     box=l_acc)
        slot_a = jnp.argmin(active[acc_b])
        room = ~active[acc_b, slot_a]
        have = n_don > 0.5
        log_ap = (jnp.log(jnp.maximum(n_don, 1.0)) - jnp.log1p(n_acc)
                  + 3.0 * (jnp.log(l_acc) - jnp.log(l_don))
                  - (du_a - du_d) / t)
        ok = (have & room
              & ((t_unif[j] < jnp.exp(jnp.minimum(log_ap, 0.0)))
                 | (log_ap >= 0.0)))
        active = active.at[don, slot_d].set(active[don, slot_d] & ~ok)
        active = active.at[acc_b, slot_a].set(
            active[acc_b, slot_a] | ok)
        r = r.at[acc_b, slot_a].set(
            jnp.where(ok, gi, r[acc_b, slot_a]))
        energy = energy.at[don].add(
            jnp.where(ok, -du_d, jnp.zeros((), dtype)))
        energy = energy.at[acc_b].add(
            jnp.where(ok, du_a, jnp.zeros((), dtype)))
        # Widom-for-free on the acceptor box (gcmc.py's clamp rule:
        # only a genuine overlap gets weight 0; deep wells clamp large)
        lw = -du_a / t
        bw = jnp.exp(jnp.minimum(lw, jnp.asarray(80.0, dtype)))
        bw = jnp.where(jnp.isnan(lw), jnp.zeros((), dtype), bw)
        bs = bs.at[acc_b].add(bw)
        bc = bc.at[acc_b].add(1)
        return (r, active, energy, ta + ok.astype(jnp.int32), bs, bc), \
            None

    (r, active, energy, ta, bs, bc), _ = jax.lax.scan(
        attempt,
        (r, active, energy, jnp.zeros((), jnp.int32),
         jnp.zeros((2,), dtype), jnp.zeros((2,), jnp.int32)),
        jnp.arange(n_transfer))

    return GibbsState(
        r=r, active=active, l=l, energy=energy,
        key=key, vkey=vkey, tkey=tkey,
        sweeps=state.sweeps + 1,
        disp_acc=state.disp_acc + jnp.sum(dacc, dtype=jnp.int32),
        vol_acc=state.vol_acc + vok.astype(jnp.int32),
        vol_att=state.vol_att + jnp.int32(1),
        tr_acc=state.tr_acc + ta,
        tr_att=state.tr_att + jnp.int32(n_transfer),
        boltz_sum=state.boltz_sum + bs,
        boltz_cnt=state.boltz_cnt + bc,
    )


def init_gibbs_state(cfg: SMCConfig, key: jax.Array, cap: int,
                     n1: int | None = None,
                     n2: int | None = None) -> GibbsState:
    """Two boxes at the cfg side, N = cfg.n split (evenly by default)
    on never-overlapping grids. `cap` bounds either box's count; size
    it near N so a strongly one-sided coexistence still fits."""
    if cfg.use_walls or not cfg.pbc_z:
        raise ValueError("the Gibbs engine is bulk-only (SMCConfig.bulk)")
    if abs(cfg.box_l - cfg.box_lz) > 1e-9:
        raise ValueError("the Gibbs engine needs cubic boxes")
    if 2.0 * cfg.lj_cutoff >= cfg.box_l:
        raise ValueError(
            f"Gibbs needs volume-exchange headroom: lj_cutoff "
            f"({cfg.lj_cutoff:g}) must be < box_l/2 ({cfg.box_l / 2:g})")
    n1 = cfg.n // 2 if n1 is None else n1
    n2 = cfg.n - n1 if n2 is None else n2
    if n1 + n2 != cfg.n:
        raise ValueError(f"n1 + n2 ({n1}+{n2}) must equal cfg.n ({cfg.n})")
    if max(n1, n2) > cap:
        raise ValueError(f"cap ({cap}) below the initial split "
                         f"({n1}, {n2})")
    dtype = cfg.jnp_dtype
    r = np.zeros((2, cap, 3), np.float64)
    active = np.zeros((2, cap), bool)
    for b, nb in enumerate((n1, n2)):
        g = cubic_grid(cfg, max(nb, 1))
        reps = -(-cap // max(nb, 1))
        r[b] = np.tile(g, (reps, 1))[:cap]
        active[b, :nb] = True
    r = jnp.asarray(r, dtype)
    active = jnp.asarray(active)
    l = jnp.full((2,), cfg.box_l, dtype)
    w = jnp.zeros((0,), dtype)
    energy = jax.vmap(
        lambda rr, aa, ll: total_energy_masked(rr, aa, w, cfg, box=ll)
    )(r, active, l)
    k_d, k_v, k_t = jax.random.split(key, 3)
    z32 = jnp.zeros((), jnp.int32)
    return GibbsState(
        r=r, active=active, l=l, energy=energy,
        key=k_d, vkey=jax.random.fold_in(k_v, 0x474d43),
        tkey=jax.random.fold_in(k_t, 0x545246),
        sweeps=z32, disp_acc=z32, vol_acc=z32, vol_att=z32,
        tr_acc=z32, tr_att=z32,
        boltz_sum=jnp.zeros((2,), dtype),
        boltz_cnt=jnp.zeros((2,), jnp.int32),
    )


@partial(jax.jit, static_argnames=("cfg", "n_sweeps", "n_transfer"))
def gibbs_block(state: GibbsState, cfg: SMCConfig, a, dlnv,
                n_transfer: int, n_sweeps: int, temperature=None):
    """n_sweeps Gibbs sweeps as one compiled scan; per-sweep traces
    (N1, V1, E1, E2). `temperature` may be a traced per-chain scalar
    under vmap — a whole COEXISTENCE CURVE rho_v(T)/rho_l(T) runs as
    one compiled program (the binodal the reference cannot draw)."""

    def body(st, _):
        st = gibbs_sweep(st, cfg, a, dlnv, n_transfer,
                         temperature=temperature)
        return st, (jnp.sum(st.active[0]).astype(jnp.int32),
                    st.l[0] ** 3, st.energy[0], st.energy[1])

    return jax.lax.scan(body, state, None, length=n_sweeps)


class GibbsResults(NamedTuple):
    # phase-resolved densities: per sweep/chain the two boxes are
    # sorted, so rho_lo/rho_hi are the vapor/liquid branch estimates
    # (which PHYSICAL box holds which phase is exchangeable)
    rho_lo: float
    rho_hi: float
    err_lo: float
    err_hi: float
    # in-run chemical equilibrium: mu = T ln rho + mu_ex per box
    mu_box: np.ndarray        # [2]
    mu_ex_box: np.ndarray     # [2]
    disp_acceptance: float
    vol_acceptance: float
    transfer_acceptance: float
    n1_trace: np.ndarray      # [S, C]
    v1_trace: np.ndarray      # [S, C]
    e_trace: np.ndarray       # [S, C, 2]
    rho_samples: np.ndarray   # [S, C, 2] both boxes' densities
    l_final: np.ndarray
    n_final: np.ndarray


def simulate_gibbs(
    cfg: SMCConfig,
    eqsteps: int,
    maxsteps: int,
    key: jax.Array,
    cap: int,
    n_chains: int = 1,
    dlnv: float = 0.05,
    n_transfer: int | None = None,
    chunk: int = 200,
    state0: GibbsState | None = None,
    mesh=None,
    temperatures: float | np.ndarray | None = None,
) -> Tuple[GibbsState, GibbsResults]:
    """Gibbs driver: thermalization (A doubled) + production, vmapped
    chains, watchdog-safe chunks. cfg.n is the TOTAL particle count;
    cfg.box_l the INITIAL per-box side (so the overall density is
    cfg.n / (2 box_l^3), conserved exactly).

    `mesh`: optional Mesh with a "chains" axis — pure data-parallel
    GSPMD sharding of the chain batch (each chain's box PAIR stays on
    one device; bitwise the single-device run, test_gibbs).

    `temperatures`: optional PER-CHAIN array [n_chains] — the
    temperature axis rides the chain batch like everywhere else, so a
    whole COEXISTENCE CURVE rho_v(T)/rho_l(T) runs as one compiled
    program (group with `binodal_from_results`). The pooled scalar
    results (rho_lo/rho_hi/mu_box) mix temperatures in that mode —
    use the grouping helper instead."""
    a = cfg.proposal_a
    n_transfer = max(1, cfg.n // 4) if n_transfer is None else n_transfer
    temps_c = jnp.broadcast_to(jnp.asarray(
        cfg.temperature if temperatures is None else temperatures,
        cfg.jnp_dtype), (n_chains,))

    if state0 is not None:
        state = state0
    else:
        keys = jax.random.split(key, n_chains)
        states = [init_gibbs_state(cfg, k, cap) for k in keys]
        state = jax.tree.map(lambda *xs: jnp.stack(xs), *states)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        put = lambda x: jax.device_put(
            x, NamedSharding(mesh, PartitionSpec("chains")))
        state = jax.tree.map(put, state)
        temps_c = put(temps_c)

    def block(st, tt, n, aa):
        return gibbs_block(st, cfg, aa, dlnv, n_transfer, n,
                           temperature=tt)

    run = jax.jit(jax.vmap(partial(block, n=chunk, aa=a)))
    run_t = jax.jit(jax.vmap(partial(block, n=chunk, aa=2.0 * a)))
    w = jnp.zeros((0,), cfg.jnp_dtype)
    resync = jax.jit(jax.vmap(jax.vmap(
        lambda rr, aa, ll: total_energy_masked(rr, aa, w, cfg, box=ll))))

    def do(state, n_sweeps, collect, therm=False):
        traces = []
        done = 0
        while done < n_sweeps:
            k = min(chunk, n_sweeps - done)
            if k != chunk:
                aa = 2.0 * a if therm else a
                st_tr = jax.jit(jax.vmap(
                    partial(block, n=k, aa=aa)))(state, temps_c)
            else:
                st_tr = (run_t if therm else run)(state, temps_c)
            state, tr = st_tr
            state = state._replace(
                energy=resync(state.r, state.active, state.l))
            np.asarray(state.energy)   # sync (watchdog-safe chunks)
            if collect:
                traces.append(jax.tree.map(np.asarray, tr))
            done += k
        return state, traces

    state, _ = do(state, eqsteps, collect=False, therm=True)
    z = jnp.zeros_like(state.disp_acc)
    state = state._replace(
        disp_acc=z, vol_acc=z, vol_att=z, tr_acc=z, tr_att=z,
        boltz_sum=jnp.zeros_like(state.boltz_sum),
        boltz_cnt=jnp.zeros_like(state.boltz_cnt))
    state, traces = do(state, maxsteps, collect=True)

    vtot = 2.0 * cfg.box_l ** 3
    n = cfg.n
    if traces:
        n1 = np.concatenate([t[0] for t in traces], axis=1).T  # [S, C]
        v1 = np.concatenate([t[1] for t in traces], axis=1).T
        e1 = np.concatenate([t[2] for t in traces], axis=1).T
        e2 = np.concatenate([t[3] for t in traces], axis=1).T
    else:
        n1 = v1 = e1 = e2 = np.zeros((0, max(1, n_chains)))
    v2 = vtot - v1
    rho = np.stack([n1 / np.maximum(v1, 1e-12),
                    (n - n1) / np.maximum(v2, 1e-12)], axis=-1)
    rho_sorted = np.sort(rho, axis=-1)          # [S, C, 2]
    if rho.size:
        chain_lo = rho_sorted[..., 0].mean(axis=0)
        chain_hi = rho_sorted[..., 1].mean(axis=0)
        err = lambda x: float(x.std() / np.sqrt(max(1, n_chains - 1))) \
            if n_chains > 1 else float("nan")
        rho_lo, rho_hi = float(chain_lo.mean()), float(chain_hi.mean())
        err_lo, err_hi = err(chain_lo), err(chain_hi)
    else:
        rho_lo = rho_hi = err_lo = err_hi = float("nan")

    bs = np.asarray(state.boltz_sum).reshape(-1, 2).sum(axis=0)
    bcn = np.asarray(state.boltz_cnt).reshape(-1, 2).sum(axis=0)
    with np.errstate(divide="ignore", invalid="ignore"):
        mu_ex = -cfg.temperature * np.log(bs / np.maximum(bcn, 1))
    # box-resolved densities for the mu identity (NOT phase-sorted: the
    # Widom accumulators live on physical boxes)
    rho_box = (np.stack([n1, n - n1], -1)
               / np.maximum(np.stack([v1, v2], -1), 1e-12))
    rho_box_mean = (rho_box.reshape(-1, 2).mean(axis=0)
                    if rho.size else np.full(2, np.nan))
    mu_box = cfg.temperature * np.log(
        np.maximum(rho_box_mean, 1e-12)) + mu_ex

    def rate(acc, att):
        acc = int(np.asarray(acc).sum())
        att = int(np.asarray(att).sum())
        return acc / att if att else float("nan")

    res = GibbsResults(
        rho_lo=rho_lo, rho_hi=rho_hi, err_lo=err_lo, err_hi=err_hi,
        mu_box=mu_box, mu_ex_box=mu_ex,
        disp_acceptance=rate(state.disp_acc, maxsteps * n_chains * n),
        vol_acceptance=rate(state.vol_acc, state.vol_att),
        transfer_acceptance=rate(state.tr_acc, state.tr_att),
        n1_trace=n1, v1_trace=v1,
        e_trace=np.stack([e1, e2], axis=-1),
        rho_samples=rho,
        l_final=np.asarray(state.l),
        n_final=np.asarray(
            jnp.sum(state.active, axis=-1).astype(jnp.int32)),
    )
    return state, res


def binodal_from_results(state: GibbsState, res: GibbsResults,
                         temps_c, cfg: SMCConfig):
    """Group a temperature-ladder Gibbs run by T: the coexistence
    curve. temps_c [C]: the per-chain temperatures the run used.
    Returns a list of dict rows (ascending T): t, rho_v/err_v,
    rho_l/err_l, dmu (per-box chemical-potential gap at that T),
    two_phase."""
    temps_c = np.asarray(temps_c, np.float64)
    t_vals, inv = np.unique(temps_c, return_inverse=True)
    rs = np.sort(res.rho_samples, axis=-1)       # [S, C, 2]
    bs = np.asarray(state.boltz_sum)             # [C, 2]
    bc = np.asarray(state.boltz_cnt)
    rows = []
    for k, t in enumerate(t_vals):
        cols = np.flatnonzero(inv == k)
        chain_lo = rs[:, cols, 0].mean(axis=0)
        chain_hi = rs[:, cols, 1].mean(axis=0)
        nrep = len(cols)

        def err(x):
            return (float(x.std() / np.sqrt(nrep - 1)) if nrep > 1
                    else float("nan"))

        with np.errstate(divide="ignore", invalid="ignore"):
            mu_ex = -t * np.log(bs[cols].sum(axis=0)
                                / np.maximum(bc[cols].sum(axis=0), 1))
        rho_box = res.rho_samples[:, cols, :].reshape(-1, 2).mean(axis=0)
        mu = t * np.log(np.maximum(rho_box, 1e-12)) + mu_ex
        lo, hi = float(chain_lo.mean()), float(chain_hi.mean())
        rows.append({
            "t": float(t), "rho_v": lo, "err_v": err(chain_lo),
            "rho_l": hi, "err_l": err(chain_hi),
            "dmu": float(abs(mu[0] - mu[1])),
            "two_phase": bool(hi > 2.0 * lo),
        })
    return rows


def write_gibbs_binodal_csv(d, cfg: SMCConfig, rows):
    """gibbs_binodal_*.csv: the coexistence curve from one ladder run."""
    from .io import _fname

    p = _fname(d, "gibbs_binodal", cfg)
    with open(p, "w") as f:
        f.write("T, rho_v, err_v, rho_l, err_l, dmu, two_phase\n")
        for r in rows:
            f.write(f"{r['t']:0.6f}, {r['rho_v']:0.9f}, "
                    f"{r['err_v']:0.9f}, {r['rho_l']:0.9f}, "
                    f"{r['err_l']:0.9f}, {r['dmu']:0.6f}, "
                    f"{int(r['two_phase'])}\n")
    return p


def save_gibbs_checkpoint(path, state: GibbsState, cfg: SMCConfig):
    """Full Gibbs (ensemble) state -> npz (npt.py's format family).
    Resume is BITWISE: all three key streams live in the state and the
    per-chunk energy re-sync is deterministic."""
    import json
    from pathlib import Path

    path = Path(path)
    if path.suffix != ".npz":
        path = path.with_name(path.name + ".npz")
    path.parent.mkdir(parents=True, exist_ok=True)
    keys = ("key", "vkey", "tkey")
    arrays = {f: np.asarray(getattr(state, f)) for f in state._fields
              if f not in keys}
    for f in keys:
        arrays[f] = np.asarray(jax.random.key_data(getattr(state, f)))
    cfg_json = json.dumps(
        {f: getattr(cfg, f) for f in cfg.__dataclass_fields__})
    from .io import atomic_savez

    atomic_savez(path, __config__=np.frombuffer(cfg_json.encode(),
                                                dtype=np.uint8),
                 __gibbs__=np.asarray(1), **arrays)
    return path


def load_gibbs_checkpoint(path):
    """-> (GibbsState, SMCConfig)."""
    import json

    data = np.load(path)
    if "__gibbs__" not in data:
        raise ValueError(f"{path} is not a Gibbs checkpoint")
    cfg = SMCConfig(**json.loads(bytes(data["__config__"]).decode()))
    if cfg.dtype == "float64" and not jax.config.jax_enable_x64:
        jax.config.update("jax_enable_x64", True)
    dtype = cfg.jnp_dtype
    keys = {"key", "vkey", "tkey"}
    ints = {"sweeps", "disp_acc", "vol_acc", "vol_att", "tr_acc",
            "tr_att", "boltz_cnt"}
    fields = {}
    for f in GibbsState._fields:
        if f in keys:
            fields[f] = jax.random.wrap_key_data(jnp.asarray(data[f]))
        elif f == "active":
            fields[f] = jnp.asarray(data[f], bool)
        elif f in ints:
            fields[f] = jnp.asarray(data[f], jnp.int32)
        else:
            fields[f] = jnp.asarray(data[f], dtype)
    return GibbsState(**fields), cfg


def write_gibbs_csv(d, cfg: SMCConfig, res: GibbsResults):
    """gibbs_*.csv: coexistence summary + pooled per-sweep traces."""
    from .io import _fname

    p = _fname(d, "gibbs", cfg)
    with open(p, "w") as f:
        f.write(f"# rho_lo, {res.rho_lo:0.9f}, err_lo, "
                f"{res.err_lo:0.9f}, rho_hi, {res.rho_hi:0.9f}, "
                f"err_hi, {res.err_hi:0.9f}, mu_box1, "
                f"{res.mu_box[0]:0.6f}, mu_box2, {res.mu_box[1]:0.6f}, "
                f"acc_disp, {res.disp_acceptance:0.4f}, acc_vol, "
                f"{res.vol_acceptance:0.4f}, acc_transfer, "
                f"{res.transfer_acceptance:0.4f}\n")
        f.write("sweep, N1_mean, V1_mean, rho_lo_mean, rho_hi_mean\n")
        n1m = res.n1_trace.mean(axis=1)
        v1m = res.v1_trace.mean(axis=1)
        rs = np.sort(res.rho_samples, axis=-1)
        lo = rs[..., 0].mean(axis=1)
        hi = rs[..., 1].mean(axis=1)
        for i in range(len(n1m)):
            f.write(f"{i}, {n1m[i]:0.3f}, {v1m[i]:0.6f}, "
                    f"{lo[i]:0.9f}, {hi[i]:0.9f}\n")
    return p
