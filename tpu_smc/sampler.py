"""The Smart (force-biased) Monte Carlo sampler — the hot kernel.

Reference: oneParticleMoves (SMC.c:278-351). One sweep makes N
single-particle moves in random cyclic order; each move proposes

    delta = F * A/T + xi,        xi ~ N(0, 2A)        (SMC.c:284, 307-309)

wraps the proposal in x,y (SMC.c:315-316), and accepts with the Smart-MC
probability

    ap = exp(-(dU + delta.(Fn+Fm)/2 + dW)/T)           (SMC.c:329)
    dW = (|Fn|^2 - |Fm|^2) * A/(4T)                    (SMC.c:326-327)

The in-sweep loop is inherently sequential — each move must see all prior
accepted moves (SURVEY §7.4.1) — so it stays a `lax.fori_loop` INSIDE jit.
Parallelism comes from everywhere else:

  * the O(N) physics of a single move is fully vectorized (potentials.py);
  * chains are vmapped: every [N] array becomes [C, N], so one TPU chip
    advances thousands of independent chains per sweep (this replaces the
    reference's one-chain-per-MPI-rank model, §5.8);
  * chains shard over a device mesh (ensemble.py).

RNG: one threefry split per sweep yields the 3N Gaussians, N uniforms and
the cyclic offset (the reference draws these sequentially from libc rand(),
SMC.c:284,290,335 — statistical, not bitwise, parity).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .config import SMCConfig
from .potentials import energy_force_single, total_energy
from .state import ChainState


class SweepStats(NamedTuple):
    """Per-sweep trace entries (the reference's E[n] and jj[n] arrays,
    SMC.c:47-50)."""

    energy: jax.Array    # running energy after the sweep
    accepted: jax.Array  # int32: accepted moves in this sweep (0..N)


def _wrap_proposal(rp: jax.Array, cfg: SMCConfig,
                   box: jax.Array | None = None) -> jax.Array:
    """Periodic wrap of a proposed position: x,y always (SMC.c:315-316);
    z only in the bulk variant (SMC_noMPI_noWall.c wraps all axes).

    `box`: traced cubic bulk box side overriding the static cfg dims
    (the NPT engine's fluctuating volume, npt.py)."""
    if box is not None:
        assert cfg.pbc_z, "traced box override is bulk-only"
        return rp - box * jnp.round(rp / box)
    l = cfg.box_l
    x = rp[0] - l * jnp.round(rp[0] / l)
    y = rp[1] - l * jnp.round(rp[1] / l)
    z = rp[2]
    if cfg.pbc_z:
        z = z - cfg.box_lz * jnp.round(z / cfg.box_lz)
    return jnp.stack([x, y, z])


def sweep(
    r: jax.Array,
    energy: jax.Array,
    key: jax.Array,
    w: jax.Array,
    cfg: SMCConfig,
    a: float | jax.Array,
    offset: jax.Array | None = None,
    temperature: float | jax.Array | None = None,
    umbrella: tuple | None = None,
    box: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """One SMC sweep over all N particles (oneParticleMoves, SMC.c:278-351).

    `a` is the proposal mobility — the driver doubles it during
    thermalization (SMC.c:110,125).

    `offset` is the random cyclic starting particle (SMC.c:290). When None
    it is drawn from this chain's key. Ensembles pass ONE offset shared by
    all chains instead: the visit order is then common across chains (each
    chain still uses its own noise/uniforms, so chains stay independent),
    and the per-move position read/write becomes a cheap dynamic slice
    instead of a per-chain gather/scatter — a large TPU win.

    `temperature` overrides cfg.temperature as a TRACED value (it only
    enters the proposal/acceptance arithmetic), enabling multi-T
    ensembles in one compiled program (tsweep.py) — the reference would
    need one recompiled binary per T.

    `umbrella` = (tag, k_spring, z0): harmonic umbrella bias
    b(z) = k/2 (z_tag - z0)^2 on the TAGGED particle's z (umbrella.py).
    `tag` is a static int; `k_spring`/`z0` may be traced (per-chain
    window centers under vmap). The bias enters ONLY the Metropolis
    acceptance — the force-biased proposal is unchanged, so the move is
    still an exact Metropolis-Hastings step for the biased target
    exp(-(U + b)/T) (the proposal log-ratio terms are what they always
    were). The carried `energy` stays the PHYSICAL U: the common
    exp(-beta U) factor cancels sample-wise in the umbrella MBAR, which
    therefore needs only b_k(z_m).

    `box` (bulk only): traced cubic box side overriding the static cfg
    dims — the constant-pressure engine's per-chain volume (npt.py).
    Python-level branch: box=None callers keep their exact jaxpr.

    Returns (r, energy, key, n_accepted).
    """
    dtype = cfg.jnp_dtype
    t = jnp.asarray(
        cfg.temperature if temperature is None else temperature, dtype)
    a = jnp.asarray(a, dtype)
    if umbrella is not None:
        u_tag, u_k, u_z0 = umbrella
        u_tag = int(u_tag)
        u_k = jnp.asarray(u_k, dtype)
        u_z0 = jnp.asarray(u_z0, dtype)

    key, k_noise, k_unif, k_off = jax.random.split(key, 4)
    # 3N Gaussians with sigma = sqrt(2A) (SMC.c:284)
    if cfg.reference_noise:
        # Bug-compatible mode: the reference's vecBoxMuller pair recipe
        # (matematicose.c:187-192) — marginally normal, pairwise DEPENDENT.
        npairs = (3 * cfg.n + 1) // 2
        u = jax.random.uniform(k_noise, (2, npairs), dtype)
        sig = jnp.sqrt(2.0 * a)
        d0 = sig * jnp.sqrt(-2.0 * jnp.log1p(-u[0])) * jnp.cos(
            2.0 * jnp.pi * u[1])
        d1 = sig * jnp.sqrt(-2.0 * jnp.log1p(-u[1])) * jnp.sin(
            2.0 * jnp.pi * u[0])
        noise = jnp.stack([d0, d1], axis=-1).reshape(-1)[: 3 * cfg.n]
        noise = noise.reshape(cfg.n, 3)
    else:
        noise = jnp.sqrt(2.0 * a) * jax.random.normal(k_noise, (cfg.n, 3), dtype)
    # N uniforms for the Metropolis tests (SMC.c:335)
    unif = jax.random.uniform(k_unif, (cfg.n,), dtype)
    # random cyclic offset (SMC.c:290)
    if offset is None:
        offset = jax.random.randint(k_off, (), 0, cfg.n)

    def move(nn, carry):
        r, energy, acc = carry
        i = (nn + offset) % cfg.n
        ri = r[i]

        # Current-state energy and force on particle i (SMC.c:300-304)
        um, fm = energy_force_single(r, i, ri, w, cfg, box=box)

        # Force-biased proposal (SMC.c:307-313). The acceptance uses the
        # UNWRAPPED displacement while the energy/force use the wrapped
        # position, exactly like the reference (delta computed at
        # SMC.c:307-309, wrap applied after at SMC.c:315-316). The noise
        # row is indexed by PARTICLE id like the reference's displ[3n]
        # (matters in reference_noise mode, where rows are correlated).
        delta = fm * (a / t) + noise[i]
        rp = _wrap_proposal(ri + delta, cfg, box=box)

        # Proposal-state energy and force (SMC.c:319-321)
        un, fn = energy_force_single(r, i, rp, w, cfg, box=box)

        # Smart-MC correction dW = (|Fn|^2 - |Fm|^2) A/(4T), written in the
        # reference's numerically-expanded form (SMC.c:326-327).
        df = fn - fm
        dw = (jnp.sum(df * df) + 2.0 * jnp.sum(df * fm)) * a / (4.0 * t)
        log_ap = -(un - um + 0.5 * jnp.sum(delta * (fn + fm)) + dw) / t
        if umbrella is not None:
            # harmonic window bias on the tagged particle's z: exact MH
            # correction -(b(z') - b(z))/T on its moves only
            db = 0.5 * u_k * ((rp[2] - u_z0) ** 2 - (ri[2] - u_z0) ** 2)
            log_ap = log_ap - jnp.where(i == u_tag, db, 0.0) / t

        # Metropolis test: u < ap  <=>  log(u) < log_ap; the exp form
        # matches the reference (SMC.c:329-335) and never overflows since
        # we compare in log space when log_ap is large.
        accept = unif[nn] < jnp.exp(jnp.minimum(log_ap, 0.0))
        accept = accept | (log_ap >= 0.0)

        r = r.at[i].set(jnp.where(accept, rp, ri))
        energy = energy + jnp.where(accept, un - um, jnp.zeros((), dtype))
        acc = acc + accept.astype(jnp.int32)
        return r, energy, acc

    r, energy, acc = jax.lax.fori_loop(
        0, cfg.n, move, (r, energy, jnp.zeros((), jnp.int32))
    )
    return r, energy, key, acc


def sweep_state(
    state: ChainState,
    w: jax.Array,
    cfg: SMCConfig,
    a: float | jax.Array,
    offset: jax.Array | None = None,
    temperature: float | jax.Array | None = None,
    umbrella: tuple | None = None,
) -> Tuple[ChainState, SweepStats]:
    """One sweep expressed on the ChainState pytree."""
    r, e, key, acc = sweep(state.r, state.energy, state.key, w, cfg, a,
                           offset=offset, temperature=temperature,
                           umbrella=umbrella)
    new = state._replace(
        r=r,
        energy=e,
        key=key,
        sweeps=state.sweeps + 1,
        accepted=state.accepted + acc,
    )
    return new, SweepStats(energy=e, accepted=acc)


def run_sweeps(
    state: ChainState,
    w: jax.Array,
    cfg: SMCConfig,
    a: float | jax.Array,
    n_sweeps: int,
    collect_trace: bool = True,
) -> Tuple[ChainState, SweepStats | None]:
    """`n_sweeps` consecutive sweeps as one `lax.scan` (the main loop body,
    SMC.c:134-196 without the gather branch).

    With collect_trace the per-sweep (E, jj) arrays are returned, matching
    the reference's full-resolution energy trace (SMC.c:47,194-195).
    """

    def body(carry, _):
        carry, stats = sweep_state(carry, w, cfg, a)
        return carry, stats if collect_trace else None

    state, trace = jax.lax.scan(body, state, None, length=n_sweeps)
    return state, trace


def recompute_energy(state: ChainState, w: jax.Array, cfg: SMCConfig) -> ChainState:
    """Replace the incrementally-tracked energy with an exact recompute.

    The reference never does this and accumulates floating-point drift over
    the whole run (SMC.c:194,341); in float32 we must (SURVEY §7.4.5).
    """
    return state._replace(energy=total_energy(state.r, w, cfg))


def thermalize(
    state: ChainState,
    w: jax.Array,
    cfg: SMCConfig,
    eqsteps: int,
    collect_trace: bool = True,
) -> Tuple[ChainState, SweepStats | None]:
    """Thermalization: eqsteps sweeps with A doubled (SMC.c:110-125)."""
    return run_sweeps(
        state, w, cfg, 2.0 * cfg.proposal_a, eqsteps, collect_trace=collect_trace
    )
