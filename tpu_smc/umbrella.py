"""Umbrella sampling along z + MBAR unbiasing: wall-adsorption PMFs in
regions plain sampling never visits.

Beyond-reference method layer. The unbiased PMF route (-T ln rho(z; T),
reweight.pmf_from_profile) only resolves F(z) where the equilibrium
density is non-negligible; the interesting physics — the barrier between
the adsorbed layer and the slab interior, the contact region — is
exactly where rho vanishes. Umbrella sampling fixes that the standard
way: K harmonic windows b_k(z) = k_spring/2 (z_tag - z0_k)^2 bias a
TAGGED particle's z toward centers spanning the slab, each window
samples its neighborhood well, and MBAR stitches the overlapping biased
histograms into the unbiased F(z).

TPU-native shape, on the framework's existing rails:
  * the window axis IS the chain batch axis — per-chain window centers
    ride the sweep vmap exactly like per-chain temperatures (tsweep.py),
    so ALL windows x replicas advance in ONE compiled program;
  * the bias enters only the Metropolis acceptance (sampler.sweep
    `umbrella=`): the force-biased proposal is untouched, so each move
    stays an exact Metropolis-Hastings step for exp(-(U + b_k)/T);
  * unbiasing is the same [K x M] log-sum-exp MBAR fixed point the
    temperature ladder uses (reweight._mbar_fixed_point) — the common
    exp(-beta U) factor cancels sample-wise, so u_kn = beta * b_k(z_m)
    and the physical energy never needs to be stored.

Validated analytically (Gaussian windows over a known quadratic + tilt
potential recover it to ~1e-2 T) and against the direct -T ln rho(z_tag)
histogram in the well-sampled region (tests/test_umbrella.py).
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

__all__ = [
    "UmbrellaResults", "simulate_umbrella", "umbrella_pmf",
    "parse_centers", "write_umbrella_csv",
]


class UmbrellaResults(NamedTuple):
    centers: np.ndarray        # [K] window centers z0_k
    k_spring: float
    tag: int
    temperature: float
    z_samples: np.ndarray      # [gathers, K, replicas] tagged-particle z
    acceptance: np.ndarray     # [K] production acceptance per window
    # MBAR-unbiased PMF on a z grid (filled by umbrella_pmf)
    z_grid: np.ndarray | None = None       # [B] bin centers
    pmf: np.ndarray | None = None          # [B], min-shifted, NaN empty
    err_pmf: np.ndarray | None = None      # [B] replica-bootstrap SE
    window_f: np.ndarray | None = None     # [K] MBAR window free energies
    # replica exchange between windows (REUS; None without it)
    swap_acceptance: np.ndarray | None = None   # [K-1] per adjacent pair
    exchange_interval: int | None = None


def _umbrella_sweeps(state, w, cfg, z0_c, k_spring, tag, a, n_sweeps):
    """n_sweeps biased sweeps: vmap over chains with per-chain window
    centers; shared per-sweep cyclic offset like ensemble_sweeps."""

    def body(st, _):
        okey = jax.random.fold_in(st.key[0], 0x5EED)
        offset = jax.random.randint(okey, (), 0, cfg.n)
        st, _ = jax.vmap(
            lambda s, z0: sweep_state(
                s, w, cfg, a, offset=offset,
                umbrella=(tag, k_spring, z0))
        )(st, z0_c)
        return st, None

    state, _ = jax.lax.scan(body, state, None, length=n_sweeps)
    return state


_umbrella_block = jax.jit(
    _umbrella_sweeps,
    static_argnames=("cfg", "k_spring", "tag", "a", "n_sweeps"))


def exchange_windows_step(state, centers_w, k_spring, tag, beta,
                          replicas, key, parity):
    """One replica-exchange attempt between ADJACENT umbrella windows
    (REUS). Window-major [K, R] layout like pt.exchange_step's
    temperature-major one; the bias belongs to the SLOT, configurations
    travel. The physical U is unchanged by a swap, so the acceptance is
    purely the bias cross-difference:

        log P = -beta [ b_i(z_j) + b_j(z_i) - b_i(z_i) - b_j(z_j) ]
              = -beta k (z0_j - z0_i)(z_j - z_i)
              = +beta k (z0_i - z0_j)(z_j - z_i)

    (the quadratic terms cancel; sanity: z_i near z0_j and z_j near
    z0_i makes the swap favorable and log P > 0). Returns
    (state, accepts, attempts) per adjacent pair, shape [K-1]."""
    n_w = centers_w.shape[0]

    def lvl(x):
        return x.reshape((n_w, replicas) + x.shape[1:])

    z = lvl(state.r[:, tag, 2])                      # [K, R]
    idx = jnp.arange(n_w)
    parity = jnp.asarray(parity, jnp.int32)
    is_lo = ((idx % 2) == (parity % 2)) & (idx + 1 < n_w)
    up = jnp.minimum(idx + 1, n_w - 1)
    dz0 = (centers_w - centers_w[up])[:, None]       # z0_i - z0_j
    delta = beta * k_spring * dz0 * (z[up] - z)      # [K, R]
    u = jax.random.uniform(key, (n_w, replicas))
    accept_lo = is_lo[:, None] & (jnp.log(u) < delta)

    accept_from_below = jnp.pad(accept_lo, ((1, 0), (0, 0)))[:n_w]
    partner = jnp.where(
        accept_lo, idx[:, None] + 1,
        jnp.where(accept_from_below, idx[:, None] - 1, idx[:, None]))

    def swap_leaf(x):
        xl = lvl(x)
        p = partner.reshape((n_w, replicas) + (1,) * (xl.ndim - 2))
        out = jnp.take_along_axis(xl, jnp.broadcast_to(p, xl.shape),
                                  axis=0)
        return out.reshape(x.shape)

    new = state._replace(
        r=swap_leaf(state.r),
        energy=swap_leaf(state.energy),   # U unchanged by the swap
        rbin=swap_leaf(state.rbin),
    )
    accepts = accept_lo.sum(axis=1)[:-1].astype(jnp.int32)
    attempts = (is_lo.astype(jnp.int32) * replicas)[:-1]
    return new, accepts, attempts


@partial(jax.jit, static_argnames=("cfg", "k_spring", "tag", "a",
                                   "replicas", "interval", "n_cycles"))
def _umbrella_reus_window(state, w, cfg, z0_c, centers_w, k_spring, tag,
                          a, replicas, interval, n_cycles, cycle0):
    """n_cycles x (interval biased sweeps + one window exchange), fully
    on device; z sampled once per cycle (the REUS gather cadence).
    Exchange keys/parity fold the ABSOLUTE cycle counter — chunk-
    invariant like pt._pt_block."""
    beta = 1.0 / cfg.temperature

    def cycle(carry, k):
        st, nacc, natt = carry
        st = _umbrella_sweeps(st, w, cfg, z0_c, k_spring, tag, a,
                              interval)
        abs_k = cycle0 + k
        ekey = jax.random.fold_in(
            jax.random.fold_in(st.key[0], 0xB1A5), abs_k)
        st, acc, att = exchange_windows_step(
            st, centers_w, k_spring, tag, beta, replicas, ekey,
            abs_k % 2)
        return (st, nacc + acc, natt + att), st.r[:, tag, 2]

    n_w = centers_w.shape[0]
    zeros = jnp.zeros((max(n_w - 1, 0),), jnp.int32)
    (state, acc, att), z_tr = jax.lax.scan(
        cycle, (state, zeros, zeros), jnp.arange(n_cycles))
    return state, acc, att, z_tr


@partial(jax.jit, static_argnames=("cfg", "k_spring", "tag", "a",
                                   "lapse", "n_gathers"))
def _umbrella_window(state, w, cfg, z0_c, k_spring, tag, a, lapse,
                     n_gathers):
    def gather(st, _):
        st = _umbrella_sweeps(st, w, cfg, z0_c, k_spring, tag, a, lapse)
        return st, st.r[:, tag, 2]

    return jax.lax.scan(gather, state, None, length=n_gathers)


def simulate_umbrella(
    cfg: SMCConfig,
    params: RunParams,
    centers,
    key: jax.Array,
    k_spring: float = 4.0,
    tag: int = 0,
    replicas: int = 4,
    r0: np.ndarray | None = None,
    w: np.ndarray | None = None,
    exchange_interval: int | None = None,
) -> tuple[ChainState, UmbrellaResults]:
    """Run K umbrella windows x `replicas` chains each, all in one
    compiled ensemble (window-major layout like tsweep's temperature-
    major one). Thermalization doubles A (SMC.c:110,125) WITH the bias
    on, so each window equilibrates inside its own restraint.

    z samples are taken at the gather cadence (params.numdata rules,
    like every other driver).

    exchange_interval: replica exchange between ADJACENT windows every
    that many sweeps (REUS) — configurations percolate along the window
    ladder, decorrelating each window's restrained samples; the bias
    stays with the slot so the MBAR attribution is unchanged. The z
    cadence then follows the exchange cycles (one sample per cycle)."""
    from .driver import therm_chunk
    from .ensemble import fetch

    centers = np.asarray(centers, np.float64)
    n_w = len(centers)
    c = n_w * replicas
    half = cfg.box_lz / 2.0
    if np.any(np.abs(centers) >= half):
        raise ValueError(f"umbrella centers must lie inside the slab "
                         f"(|z0| < {half})")
    if not 0 <= tag < cfg.n:
        raise ValueError(f"--umbrella-tag must be in [0, {cfg.n})")
    state, w_arr = init_ensemble_state(cfg, key, c, r0=r0, w=w)
    z0_c = jnp.asarray(np.repeat(centers, replicas), cfg.jnp_dtype)

    chunk = therm_chunk(cfg)
    done = 0
    while done < params.eqsteps:
        k = min(params.eqsteps - done, chunk)
        state = _umbrella_block(
            state, w_arr, cfg, z0_c, float(k_spring), int(tag),
            2.0 * float(cfg.proposal_a), k)
        fetch(state.energy[:1])
        done += k
    state = state._replace(accepted=jnp.zeros_like(state.accepted))

    swap_acc = None
    if exchange_interval:
        interval = max(1, int(exchange_interval))
        cycles = max(1, params.maxsteps // interval)
        per_call = max(1, chunk // interval)
        centers_w = jnp.asarray(centers, cfg.jnp_dtype)
        z_rows = []
        acc_sw = np.zeros((max(n_w - 1, 0),), np.int64)
        att_sw = np.zeros_like(acc_sw)
        done_c = 0
        while done_c < cycles:
            g = min(cycles - done_c, per_call)
            state, a_blk, t_blk, z_blk = _umbrella_reus_window(
                state, w_arr, cfg, z0_c, centers_w, float(k_spring),
                int(tag), float(cfg.proposal_a), replicas, interval, g,
                jnp.int32(done_c))
            z_rows.append(fetch(z_blk))
            acc_sw += fetch(a_blk).astype(np.int64)
            att_sw += fetch(t_blk).astype(np.int64)
            done_c += g
        z_all = np.concatenate(z_rows)
        total_sweeps = cycles * interval
        swap_acc = acc_sw / np.maximum(att_sw, 1)
    else:
        lapse = max(1, params.gather_lapse)
        n_gathers = max(1, params.maxsteps // lapse)
        # watchdog-safe: bound gathers per call like the main driver
        per_call = max(1, chunk // lapse)
        z_rows = []
        left = n_gathers
        while left > 0:
            g = min(left, per_call)
            state, z_blk = _umbrella_window(
                state, w_arr, cfg, z0_c, float(k_spring), int(tag),
                float(cfg.proposal_a), lapse, g)
            z_rows.append(fetch(z_blk))          # [g, C]
            left -= g
        z_all = np.concatenate(z_rows)           # [gathers, C]
        total_sweeps = n_gathers * lapse
    moves = fetch(state.accepted).astype(np.int64)
    acc = (moves.reshape(n_w, replicas).mean(axis=1)
           / (total_sweeps * cfg.n))
    return state, UmbrellaResults(
        centers=centers, k_spring=float(k_spring), tag=int(tag),
        temperature=float(cfg.temperature),
        z_samples=z_all.reshape(-1, n_w, replicas),
        acceptance=np.asarray(acc),
        swap_acceptance=swap_acc,
        exchange_interval=(int(exchange_interval)
                           if exchange_interval else None),
    )


def umbrella_pmf(res: UmbrellaResults, n_bins: int = 48,
                 z_range: tuple | None = None,
                 n_boot: int = 16, seed: int = 0) -> UmbrellaResults:
    """MBAR-unbias the window samples into F(z) on a regular z grid.

    u_kn = beta * b_k(z_m) (the physical energy cancels sample-wise —
    every window shares the same U and T). The unbiased weight of sample
    m is 1/sum_k N_k exp(f_k - u_km); binned weights give p(z) and
    F = -T ln p, min-shifted, NaN where no sample landed
    (reweight.pmf_from_profile conventions). Errors: replica bootstrap
    (whole chains resampled, correlation-safe)."""
    from .reweight import _mbar_fixed_point, pmf_from_profile

    t = res.temperature
    beta = 1.0 / t
    k_spr = res.k_spring
    centers = np.asarray(res.centers, np.float64)
    g, n_w, reps = res.z_samples.shape
    if z_range is None:
        lo = float(res.z_samples.min())
        hi = float(res.z_samples.max())
        pad = 0.02 * (hi - lo + 1e-9)
        z_range = (lo - pad, hi + pad)
    edges = np.linspace(z_range[0], z_range[1], n_bins + 1)
    zc = 0.5 * (edges[:-1] + edges[1:])

    def estimate(idx):
        z = res.z_samples[:, :, idx]                    # [g, K, R']
        z_k = [z[:, k].reshape(-1) for k in range(n_w)]
        z_pooled = jnp.asarray(np.concatenate(z_k), jnp.float32)
        log_n = jnp.asarray(
            np.log([zk.size for zk in z_k]), jnp.float32)
        cj = jnp.asarray(centers, jnp.float32)
        u_kn = (0.5 * beta * k_spr) * (z_pooled[None, :]
                                       - cj[:, None]) ** 2
        f_k, _, _ = _mbar_fixed_point(u_kn, log_n, jnp.float32(2e-6),
                                      5_000)
        log_denom = jax.nn.logsumexp(
            log_n[:, None] + f_k[:, None] - u_kn, axis=0)   # [M]
        logw = -log_denom
        logw = logw - jax.nn.logsumexp(logw)
        wgt = np.asarray(jnp.exp(logw), np.float64)
        hist, _ = np.histogram(np.concatenate(z_k), bins=edges,
                               weights=wgt)
        p, _ = pmf_from_profile([t], hist[None, :] + 0.0)
        return p[0], np.asarray(f_k, np.float64)

    pmf, f_k = estimate(np.arange(reps))
    err = None
    if n_boot > 0 and reps > 1:
        rng = np.random.default_rng(seed)
        draws = [estimate(rng.integers(0, reps, size=reps))[0]
                 for _ in range(n_boot)]
        err = np.nanstd(np.stack(draws), axis=0)
    return res._replace(z_grid=zc, pmf=pmf, err_pmf=err, window_f=f_k)


def parse_centers(spec: str) -> np.ndarray:
    """CLI spec: 'zmin:zmax:num' (inclusive linspace) or 'z1,z2,...'."""
    if ":" in spec:
        parts = spec.split(":")
        if len(parts) != 3:
            raise ValueError(f"bad umbrella spec {spec!r} "
                             "(want zmin:zmax:num or z1,z2,...)")
        lo, hi, num = float(parts[0]), float(parts[1]), int(parts[2])
        if num < 2 or hi <= lo:
            raise ValueError(f"bad umbrella spec {spec!r} "
                             "(need zmin < zmax, num >= 2)")
        return np.linspace(lo, hi, num)
    return np.asarray([float(v) for v in spec.split(",")], np.float64)


def write_umbrella_csv(d, cfg: SMCConfig, res: UmbrellaResults):
    """umbrella_pmf csv: `z, F, err` (NaN = never visited), plus a
    window block `# window, z0, f, acceptance` as trailing comment rows
    so one file carries the full record."""
    from .io import _fname

    p = _fname(d, "umbrella_pmf", cfg)
    with open(p, "w") as f:
        f.write("z, F, err\n")
        for b in range(len(res.z_grid)):
            e = (res.err_pmf[b] if res.err_pmf is not None
                 else float("nan"))
            f.write(f"{res.z_grid[b]:0.6f}, {res.pmf[b]:0.9f}, "
                    f"{e:0.9f}\n")
        f.write("# window, z0, f, acceptance\n")
        for k in range(len(res.centers)):
            f.write(f"# {k}, {res.centers[k]:0.4f}, "
                    f"{res.window_f[k]:0.6f}, {res.acceptance[k]:0.4f}\n")
    return p
