"""Runtime guards — the sanitizer/failure-detection layer (SURVEY §5.2/5.3).

The reference's only runtime checks are console warnings: boundsCheck's
"beta-carotene Valhalla" prints (SMC.c:529-543), perror on I/O, and an
LCA-cutoff warning (SMC.c:1038). Its real failure modes (NaN positions,
heap overruns, silent energy drift) go undetected. Here:

  * state_health — one fused device pass returning finite-ness, bounds
    violations and energy drift for a chain or ensemble state;
  * HealthError / check_state — raise (or warn) on violations, with the
    reference's wording kept as a homage;
  * checked_sweep — a jax.experimental.checkify wrapping of the sampler
    for debugging NaN sources under jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import SMCConfig
from .potentials import total_energy
from .state import ChainState


class StateHealth(NamedTuple):
    finite: jax.Array          # bool: all positions/energies finite
    escaped_xy: jax.Array      # int32: particles outside the periodic box
    through_wall: jax.Array    # int32: particles beyond +-Lz/2
    energy_drift: jax.Array    # |carried E - recomputed E| (max over chains)


def state_health(state: ChainState, w: jax.Array, cfg: SMCConfig) -> StateHealth:
    """Device-side health pass; works for single ([N,3]) or batched
    ([C,N,3]) states."""
    r = state.r
    batched = r.ndim == 3
    finite = jnp.all(jnp.isfinite(r)) & jnp.all(jnp.isfinite(state.energy))
    half_l = cfg.box_l / 2.0
    half_lz = cfg.box_lz / 2.0
    esc = jnp.sum(
        (jnp.abs(r[..., 0]) > half_l + 1e-6)
        | (jnp.abs(r[..., 1]) > half_l + 1e-6)
    ).astype(jnp.int32)
    wall = jnp.sum(jnp.abs(r[..., 2]) > half_lz).astype(jnp.int32)
    if batched:
        # bounded like every O(N^2) observable (52 GB OOM otherwise at
        # N=1024 x 512 chains — driver_ensemble); per-chain wall tables
        # (w [C, M*M, 2], quenched disorder) pair with their chains
        from .observables import wall_obs_chains

        exact = wall_obs_chains(lambda ri, wc: total_energy(ri, wc, cfg),
                                r, w, cfg.n)
    else:
        exact = total_energy(r, w, cfg)
    drift = jnp.max(jnp.abs(exact - state.energy))
    return StateHealth(finite, esc, wall, drift)


state_health_jit = jax.jit(state_health, static_argnames="cfg")


class HealthError(RuntimeError):
    pass


def check_state(state: ChainState, w: jax.Array, cfg: SMCConfig,
                drift_tol: float = 1e-2, strict: bool = True) -> StateHealth:
    """Host-side verdict on a health pass. With strict=False only prints
    warnings (the reference's behavior: warn and keep going)."""
    h = jax.tree.map(np.asarray, state_health_jit(state, w, cfg))
    problems = []
    if not bool(h.finite):
        problems.append("non-finite positions or energies")
    if int(h.escaped_xy):
        problems.append(
            f"{int(h.escaped_xy)} particles escaping to the "
            "beta-carotene Valhalla"  # boundsCheck wording, SMC.c:535
        )
    if int(h.through_wall):
        problems.append(f"{int(h.through_wall)} particles smashed through a wall")
    if float(h.energy_drift) > drift_tol:
        problems.append(f"energy drift {float(h.energy_drift):.3e} > {drift_tol}")
    if problems:
        msg = "; ".join(problems)
        if strict:
            raise HealthError(msg)
        print(f"WARNING: {msg}")
    return h


def checked_sweep(cfg: SMCConfig):
    """A checkify-instrumented sweep: returns (err, (r, e, key, acc)) so
    NaN/overflow sources surface with locations under jit (debug tool)."""
    from jax.experimental import checkify

    from .sampler import sweep

    def body(r, e, key, w, a):
        return sweep(r, e, key, w, cfg, a)

    return checkify.checkify(
        body, errors=checkify.float_checks | checkify.nan_checks
    )
