"""Chain state pytree.

The reference keeps its chain state in loose malloc'd arrays inside sMC
(SMC.c:44-60): positions R, running energy E, acceptance counters, the
per-particle voxel index Rbin and the cumulative density/mobility counters.
Here all of it is one NamedTuple pytree, so it vmaps over chains, shards
over meshes, and checkpoints as a unit — the full-state equivalent of the
reference's positions-only `last_state` file (main.c:163-171, §5.4).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import SMCConfig
from .system import build_walls, fcc_lattice


class ChainState(NamedTuple):
    """State of one Markov chain (add a leading [C] axis via vmap)."""

    r: jax.Array        # [N, 3] positions
    energy: jax.Array   # scalar: running potential energy (pair + wall)
    key: jax.Array      # threefry key driving this chain
    sweeps: jax.Array   # int32: sweeps completed (thermalization included)
    accepted: jax.Array  # int64-ish int32: total accepted moves
    rbin: jax.Array     # [N] int32: current voxel of each particle (SMC.c:52)
    density: jax.Array  # [Nc] uint32: cumulative voxel counts (SMC.c:53)
    mobility: jax.Array  # [Nc] uint32: cumulative cell-change counts (SMC.c:55)


def init_chain_state(
    cfg: SMCConfig,
    key: jax.Array,
    r0: np.ndarray | jax.Array | None = None,
    w: np.ndarray | jax.Array | None = None,
) -> tuple[ChainState, jax.Array]:
    """Build (state, wall_params) for a fresh chain.

    r0 defaults to the reference's FCC lattice; w to the reference's
    bit-exact wall table. The initial energy is computed from scratch
    (E[0] = energy + wallsEnergy, SMC.c:48).
    """
    from .potentials import total_energy_jit

    dtype = cfg.jnp_dtype
    if r0 is None:
        r0 = fcc_lattice(cfg)
    if w is None:
        w, _, _ = build_walls(cfg)
    r = jnp.asarray(r0, dtype=dtype)
    w = jnp.asarray(w, dtype=dtype)
    e0 = total_energy_jit(r, w, cfg)
    nvox = cfg.n_voxels
    state = ChainState(
        r=r,
        energy=e0.astype(dtype),
        key=key,
        sweeps=jnp.zeros((), jnp.int32),
        accepted=jnp.zeros((), jnp.int32),
        # Rbin starts calloc'd to 0 in the reference (SMC.c:52): particle 0's
        # first gather therefore usually counts as a "move" into its voxel.
        rbin=jnp.zeros((cfg.n,), jnp.int32),
        density=jnp.zeros((nvox,), jnp.uint32),
        mobility=jnp.zeros((nvox,), jnp.uint32),
    )
    return state, w


from functools import partial as _partial


@_partial(jax.jit, static_argnames="cfg")
def per_chain_wall_energy(r: jax.Array, w: jax.Array,
                          cfg: SMCConfig) -> jax.Array:
    """Per-chain total energy with per-chain wall tables [C, M*M, 2]
    (quenched disorder: chains of different realizations start at
    different wall energies — every driver recomputes E0 through this
    one helper). HBM-bounded like all O(N^2) observables."""
    from .observables import wall_obs_chains
    from .potentials import total_energy

    return wall_obs_chains(lambda ri, wc: total_energy(ri, wc, cfg),
                           r, w, cfg.n)


def batch_chain_state(state: ChainState, n_chains: int,
                      chain_offset: int = 0) -> ChainState:
    """Broadcast a single-chain state to [C, ...] with per-chain keys
    folded from the seed chain's key (replaces the per-process seeding of
    SMC.c:40).

    `chain_offset` shifts the fold indices: process p of a multi-process
    replica run batches its local chains with offset p*C_local, so the
    global key streams are IDENTICAL to a single-process run over the
    full ensemble — the process boundary cannot change trajectories."""
    keys = jax.vmap(lambda i: jax.random.fold_in(state.key, i))(
        jnp.arange(chain_offset, chain_offset + n_chains)
    )

    def rep(x):
        return jnp.broadcast_to(x, (n_chains,) + x.shape)

    return ChainState(
        r=rep(state.r),
        energy=rep(state.energy),
        key=keys,
        sweeps=rep(state.sweeps),
        accepted=rep(state.accepted),
        rbin=rep(state.rbin),
        density=rep(state.density),
        mobility=rep(state.mobility),
    )


def broadcast_resumed_chain(state: ChainState, n_chains: int) -> ChainState:
    """Broadcast a RESUMED single chain to an ensemble.

    Unlike batch_chain_state, the cumulative voxel counters are kept in
    chain 0 only — plain replication would count the pre-resume history
    C times in pooled density/mobility CSVs (ADVICE r1)."""
    batched = batch_chain_state(state, n_chains)
    return batched._replace(
        density=batched.density.at[1:].set(0),
        mobility=batched.mobility.at[1:].set(0),
    )


def init_ensemble_state(
    cfg: SMCConfig,
    key: jax.Array,
    n_chains: int,
    r0: np.ndarray | None = None,
    w: np.ndarray | None = None,
) -> tuple[ChainState, jax.Array]:
    """Batched state for `n_chains` independent chains ([C, ...] leading axis).

    All chains start from the same configuration (the reference starts every
    MPI rank from the common R0, SMC.c:43-45) but fold distinct per-chain
    keys, so the chains decorrelate after thermalization.
    """
    state, w_arr = init_chain_state(cfg, key, r0=r0, w=w)
    return batch_chain_state(state, n_chains), w_arr
