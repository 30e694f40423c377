"""Proposal-mobility auto-tuning: hit a target acceptance ratio.

The reference fixes the Smart-MC mobility at A = gamma*T with gamma = 1.0
(main.c:48-51), which lands the default system at ~0.97 acceptance —
robust, but far above the 0.5-0.7 band where force-biased MC decorrelates
fastest (moves are tiny, so the chain diffuses slowly). This module finds
the A that yields a requested acceptance BEFORE the run starts, by
bracketed bisection in log A on short measurement blocks; production then
runs with the tuned A held fixed, so detailed balance is untouched (the
tuning sweeps merely advance the chains, like extra thermalization).

Recompile economics (the TPU-specific part): A is a compile-time static
of the Pallas sweep kernel, and a tuned value differs every run — naively
each bisection probe AND the production run would pay a cold Mosaic
compile (minutes at N=1024). Both paths instead route the tuned A through
the per-chain (A, T) ladder-mode rows (`uniform_at`): A becomes kernel
DATA, every probe and the production run share the ONE ladder-mode
compile, and the measured cost of the rows is 0.1% (PERF_NOTES.md). The
XLA engine takes A as a traced scalar argument for the same reason.

Acceptance is measured over chains x sweeps x N moves, so even short
blocks give sub-percent noise; bisection converges to |acc - target| <=
tol in ~6-10 blocks.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import SMCConfig
from .sampler import sweep_state
from .state import ChainState


class LadderTuneResult(NamedTuple):
    temps: np.ndarray          # [n_t]
    a_per_t: np.ndarray        # [n_t] tuned mobility per level
    acceptance: np.ndarray     # [n_t] measured at the returned ladder
    gamma_per_t: np.ndarray    # [n_t] A_t / T_t
    sweeps_used: int


class TuneResult(NamedTuple):
    proposal_a: float          # tuned mobility
    acceptance: float          # measured at the returned A
    gamma: float               # tuned A / T (the reference's knob)
    history: list              # [(A, acceptance), ...] per probe block
    sweeps_used: int


@partial(jax.jit, static_argnames=("cfg", "n_sweeps"))
def _tune_block_xla(state, w, cfg, a, n_sweeps):
    """n_sweeps ensemble sweeps with a TRACED mobility `a` — one compile
    serves every bisection probe (sweep_state accepts array A, like the
    temperature-ladder path)."""

    def body(st, _):
        okey = jax.random.fold_in(st.key[0], 0x5EED)
        offset = jax.random.randint(okey, (), 0, cfg.n)
        st, _ = jax.vmap(
            lambda s: sweep_state(s, w, cfg, a, offset=offset)
        )(st)
        return st, None

    state, _ = jax.lax.scan(body, state, None, length=n_sweeps)
    return state


def tune_mobility(
    cfg: SMCConfig,
    state: ChainState,
    w: jax.Array,
    target: float = 0.5,
    sampler: str = "xla",
    mesh=None,
    sweeps_per_block: int = 25,
    max_blocks: int = 16,
    tol: float = 0.02,
    burn_in_blocks: int = 2,
) -> tuple[ChainState, TuneResult]:
    """Adaptive multiplicative search on A until the measured acceptance
    is within `tol` of `target`. `state` must carry a leading chain axis;
    the advanced state is returned (tuning doubles as thermalization
    burn-in).

    Acceptance is monotone decreasing in A at FIXED state, but the state
    itself equilibrates while tuning runs (a fresh lattice accepts far
    more than a thermalized fluid at the same A), so a sticky bisection
    bracket can be poisoned by stale early measurements. Instead: a
    burn-in at the starting A, then a multiplicative step whose factor
    shrinks (sqrt) on every direction reversal — a drift-tolerant line
    search that needs no bracket."""
    if not 0.0 < target < 1.0:
        raise ValueError(f"target acceptance must be in (0, 1): {target}")
    from . import ensemble as ens

    t = float(cfg.temperature)
    k = sweeps_per_block

    def measure(a_val: float) -> float:
        nonlocal state
        state = state._replace(accepted=jnp.zeros_like(state.accepted))
        if sampler in ("pallas", "zsorted"):
            # zsorted production tunes through the DENSE kernel's data
            # rows: acceptance is engine-independent (A7 gate), the short
            # probe blocks would otherwise add zsorted chunk-length
            # Mosaic compile keys, and dense probes are plenty fast.
            if mesh is not None:
                state, _ = ens.ensemble_sweeps_pallas_sharded(
                    state, w, cfg, 0.0, k, seed=None, mesh=mesh,
                    uniform_at=(a_val, t))
            else:
                state, _ = ens.ensemble_sweeps_pallas(
                    state, w, cfg, 0.0, k, uniform_at=(a_val, t))
        else:
            state = _tune_block_xla(
                state, w, cfg, jnp.asarray(a_val, cfg.jnp_dtype), k)
        moves = np.asarray(state.accepted, np.int64)
        return float(moves.mean()) / (k * cfg.n)

    # Physical cap: a proposal std of sqrt(2A) beyond L/2 is pointless
    # under the periodic wrap (near-ideal-gas systems can keep a target
    # acceptance at arbitrarily large A — stop at "uniform over the box").
    a_cap = (float(cfg.box_l) / 2.0) ** 2 / 2.0
    a = min(float(cfg.proposal_a), a_cap)
    for _ in range(burn_in_blocks):   # equilibrate before measuring
        measure(a)
    history = []
    blocks = 0
    factor = 4.0
    prev_up = None
    acc = measure(a)
    history.append((a, acc))
    blocks += 1
    while abs(acc - target) > tol and blocks < max_blocks:
        up = acc > target              # too much acceptance -> grow A
        if prev_up is not None and up != prev_up:
            factor = math.sqrt(factor)
        prev_up = up
        a = min(a * factor, a_cap) if up else a / factor
        if history and a == history[-1][0] == a_cap:
            break   # pinned at the cap: acceptance stays above target
        acc = measure(a)
        history.append((a, acc))
        blocks += 1
    state = state._replace(accepted=jnp.zeros_like(state.accepted))
    return state, TuneResult(
        proposal_a=a, acceptance=acc, gamma=a / t, history=history,
        sweeps_used=(blocks + burn_in_blocks) * k,
    )


def tune_mobility_ladder(
    cfg: SMCConfig,
    temps,
    key: jax.Array,
    w: np.ndarray | None = None,
    chains_per_t: int = 16,
    target: float = 0.5,
    sampler: str = "xla",
    sweeps_per_block: int = 25,
    max_blocks: int = 16,
    tol: float = 0.02,
    burn_in_blocks: int = 2,
) -> LadderTuneResult:
    """Per-TEMPERATURE-LEVEL mobility tuning for the ladder drivers
    (tsweep/pt): every level gets its own A_t hitting `target`, measured
    simultaneously on one [n_t x chains_per_t] ensemble (the acceptance
    of each level is its own chain group's counter — no extra runs).
    Per-level adaptive multiplicative search, same drift tolerance and
    sqrt(2A) <= L/2 cap as tune_mobility. Returns the tuned ladder; pass
    it to simulate_temperature_sweep / simulate_parallel_tempering as
    `a_per_t` (the production run re-equilibrates from its own state, so
    tuning here is purely a parameter search)."""
    if not 0.0 < target < 1.0:
        raise ValueError(f"target acceptance must be in (0, 1): {target}")
    from . import ensemble as ens
    from .state import init_ensemble_state
    from .tsweep import _multi_t_block

    temps = np.asarray(temps, np.float64)
    n_t = len(temps)
    state, w_arr = init_ensemble_state(cfg, key, n_t * chains_per_t, w=w)
    temps_c = jnp.asarray(np.repeat(temps, chains_per_t), cfg.jnp_dtype)
    k = sweeps_per_block
    a_cap = (float(cfg.box_l) / 2.0) ** 2 / 2.0

    def measure(a_t: np.ndarray) -> np.ndarray:
        nonlocal state
        state = state._replace(accepted=jnp.zeros_like(state.accepted))
        a_c = jnp.asarray(np.repeat(a_t, chains_per_t), cfg.jnp_dtype)
        if sampler in ("pallas", "zsorted"):
            # probes through the dense ladder rows for both kernel
            # engines (see tune_mobility.measure)
            state, _ = ens.ensemble_sweeps_pallas(
                state, w_arr, cfg, 0.0, k,
                a_per_chain=a_c, t_per_chain=temps_c)
        else:
            state = _multi_t_block(state, w_arr, cfg, temps_c, 1.0, k,
                                   a_c=a_c)[0]
        moves = np.asarray(state.accepted, np.int64)
        return moves.reshape(n_t, chains_per_t).mean(axis=1) / (k * cfg.n)

    a_t = np.minimum(cfg.gamma * temps, a_cap)
    for _ in range(burn_in_blocks):
        measure(a_t)
    factors = np.full(n_t, 4.0)
    prev_up = [None] * n_t
    blocks = 0
    acc_t = measure(a_t)
    blocks += 1
    while blocks < max_blocks:
        live = (np.abs(acc_t - target) > tol) \
            & ~((a_t >= a_cap) & (acc_t > target))   # cap-pinned levels
        if not live.any():
            break
        for i in np.flatnonzero(live):
            up = acc_t[i] > target
            if prev_up[i] is not None and up != prev_up[i]:
                factors[i] = math.sqrt(factors[i])
            prev_up[i] = up
            a_t[i] = min(a_t[i] * factors[i], a_cap) if up \
                else a_t[i] / factors[i]
        acc_t = measure(a_t)
        blocks += 1
    return LadderTuneResult(
        temps=temps, a_per_t=a_t, acceptance=acc_t,
        gamma_per_t=a_t / temps,
        sweeps_used=(blocks + burn_in_blocks) * k,
    )
