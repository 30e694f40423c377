"""Chain-ensemble and multi-chip parallelism.

The reference's distributed model is one Markov chain per MPI rank with
ZERO inter-rank communication (rank macro main.c:4, per-rank filenames
SMC.c:66-96, per-process seeds SMC.c:40; no MPI_* calls exist — SURVEY
§0, §5.8). The TPU-native replacement is two-level:

  * **chains** (`vmap`): C independent chains per chip — a [C, N, 3]
    batch. A 108-particle chain is far too small to fill an MXU/VPU; the
    chip is filled by the chain batch, which is exactly the reference's
    replica parallelism with the process boundary removed.
  * **devices** (mesh + sharding): the chain axis is sharded over the
    mesh's "chains" axis. Chains never communicate; XLA inserts the only
    collectives needed — psum/all_gather for observable reductions —
    when we reduce across the sharded axis.

For large N there is also a **particle axis** ("tp"-style): the O(N^2)
recompute/observable pass shards particle rows over a mesh axis, each
device all-gathers positions over ICI and reduces its row block
(`particle_sharded_energy`), the SURVEY §5.7 "sequence parallel" analog.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .config import SMCConfig
from .potentials import wall_energy_force_single, _pair_displacements
from .sampler import SweepStats, sweep_state
from .state import ChainState


def make_mesh(
    n_devices: int | None = None, axis_names: Tuple[str, ...] = ("chains",),
    shape: Tuple[int, ...] | None = None, local: bool = False,
) -> Mesh:
    """A device mesh over the first n_devices devices.

    `local=True` restricts to this process's devices — the multi-process
    replica mode runs each process's chains on its own chips (zero
    cross-process traffic during sweeps, like one MPI rank's chain)."""
    devs = jax.local_devices() if local else jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = np.asarray(devs[:n_devices])
    if shape is None:
        shape = (n_devices,)
    return Mesh(devs.reshape(shape), axis_names)


def shard_ensemble(state: ChainState, mesh: Mesh, axis: str = "chains") -> ChainState:
    """Place a [C, ...] ensemble state with the chain axis sharded."""
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P(axis)))

    return jax.tree.map(put, state)


def global_shard_put(x, mesh: Mesh, axis: str = "chains"):
    """device_put with the leading axis sharded over `mesh`, valid also
    when the mesh SPANS PROCESSES (the global-ladder mode, SURVEY §5.8):
    every process passes the SAME full host value and materializes only
    its addressable shards (jax.make_array_from_callback). Single-process
    meshes take the plain device_put path unchanged."""
    sh = NamedSharding(mesh, P(axis))
    me = jax.process_index()
    if all(d.process_index == me for d in mesh.devices.flat):
        return jax.device_put(x, sh)
    if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype,
                                                  jax.dtypes.prng_key):
        # typed PRNG keys round-trip through key_data (np can't view them)
        kd = np.asarray(jax.random.key_data(x))
        g = jax.make_array_from_callback(kd.shape, sh,
                                         lambda idx: kd[idx])
        return jax.random.wrap_key_data(g)
    arr = np.asarray(x)
    return jax.make_array_from_callback(arr.shape, sh, lambda idx: arr[idx])


def fetch(x) -> np.ndarray:
    """np.asarray for device values that also works when the value is
    sharded over a multi-process mesh: non-addressable shards are
    allgathered (DCN) first, so every process receives the full array.
    Single-process (and fully-replicated) arrays pass through on the
    normal path."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def gather_global_state(state: ChainState) -> ChainState:
    """Fetch a (possibly cross-process-sharded) ensemble state to host
    numpy on every process. The typed PRNG key leaf rides as key_data
    and is rewrapped, so io.save_checkpoint can serialize the result."""
    key = jax.random.wrap_key_data(
        jnp.asarray(fetch(jax.random.key_data(state.key))))
    return ChainState(
        r=fetch(state.r), energy=fetch(state.energy), key=key,
        sweeps=fetch(state.sweeps), accepted=fetch(state.accepted),
        rbin=fetch(state.rbin), density=fetch(state.density),
        mobility=fetch(state.mobility))


def ensemble_sweeps(
    state: ChainState,
    w: jax.Array,
    cfg: SMCConfig,
    a: float,
    n_sweeps: int,
    collect_trace: bool = False,
    stream_seed: int | None = None,
) -> Tuple[ChainState, SweepStats | None]:
    """n_sweeps sweeps of every chain: scan over sweeps, vmap over chains.

    Shape: all state leaves carry a leading [C] axis. Under a sharded jit
    the [C] axis is split across devices and the whole scan runs without
    any cross-device traffic (chains are independent).
    """

    # One offset stream shared by all chains (see sampler.sweep: turns the
    # per-move row access into a dynamic slice instead of a batched gather).
    # Two derivations:
    #   * stream_seed=None (legacy): from chain 0's CURRENT key each sweep
    #     — the key chain evolves once per sweep regardless of how a run
    #     is split into device calls, so seeded trajectories are bitwise
    #     independent of chunk boundaries (ADVICE r1), but they DO depend
    #     on which chain sits at local index 0.
    #   * stream_seed given: from the run seed + the ABSOLUTE sweep index
    #     — additionally invariant to how the chain batch is split across
    #     processes (chain 0 of a process's local batch may be any global
    #     chain), which is what makes a multi-process replica run bitwise
    #     identical to the single-process ensemble (test_distributed).
    skey = (None if stream_seed is None
            else jax.random.fold_in(jax.random.key(stream_seed), 0x5EED))

    def body(st, _):
        if skey is None:
            okey = jax.random.fold_in(st.key[0], 0x5EED)
        else:
            okey = jax.random.fold_in(skey, st.sweeps.reshape(-1)[0])
        offset = jax.random.randint(okey, (), 0, cfg.n)
        if w.ndim == 3:
            # per-chain wall tables [C, M*M, 2]: quenched disorder
            # realizations ride the chain vmap (system.build_wall_ensemble)
            st, stats = jax.vmap(
                lambda s, wc: sweep_state(s, wc, cfg, a, offset=offset)
            )(st, w)
        else:
            st, stats = jax.vmap(
                lambda s: sweep_state(s, w, cfg, a, offset=offset)
            )(st)
        return st, stats if collect_trace else None

    state, trace = jax.lax.scan(body, state, None, length=n_sweeps)
    return state, trace


@partial(jax.jit, static_argnames=("cfg", "n_sweeps", "a_scale"))
def ensemble_block(
    state: ChainState,
    w: jax.Array,
    cfg: SMCConfig,
    n_sweeps: int,
    a_scale: float = 1.0,
) -> Tuple[ChainState, jax.Array, jax.Array]:
    """One compiled block: n_sweeps sweeps for every chain plus the
    cross-chain observable reduction (the psum the reference never had).

    Returns (state, mean_energy_across_chains, acceptance_across_chains).
    """
    state, _ = ensemble_sweeps(
        state, w, cfg, a_scale * cfg.proposal_a, n_sweeps, collect_trace=False
    )
    mean_e = jnp.mean(state.energy)
    acc = jnp.mean(state.accepted / (state.sweeps * cfg.n))
    return state, mean_e, acc


def _auto_c_tile(cfg: SMCConfig, c: int, row_block_rows: int = 512) -> int:
    """Lane-tile width under the ~13 MB VMEM budget: 3 position planes
    [n_pad, c_tile] (+ a [3N, c_tile] noise plane in reference_noise
    mode) + ~10 j-blocked temporaries [row_block, c_tile]."""
    n_pad = ((cfg.n + 7) // 8) * 8
    row_blk = min(n_pad, row_block_rows)
    plane_rows = 3 * n_pad + (3 * n_pad if cfg.reference_noise else 0)
    c_tile = 256
    while c_tile > 128 and (
        (plane_rows + 10 * row_blk) * c_tile * 4 > 13 * 2 ** 20
    ):
        c_tile //= 2
    return min(c_tile, c)


def _check_c_tile(c: int, c_tile: int) -> int:
    # A request wider than the (possibly per-shard) chain count clamps to
    # it: small CPU/interpret ensembles (e.g. the --global-ladder x
    # hbm_stream composition test at 8 chains/device) keep working with
    # the drivers' hardware-optimal c_tile=128 request, and every run
    # with c >= 128 behaves exactly as before.
    c_tile = min(c_tile, c)
    while c % c_tile != 0 and c_tile > 128:
        c_tile //= 2
    if c % c_tile != 0:
        raise ValueError(
            f"pallas sampler needs the chain count ({c}) to be a multiple "
            f"of 128 (lane width); use the xla sampler otherwise"
        )
    return c_tile


def _per_sweep_randomness(state: ChainState, cfg: SMCConfig,
                          seed, n_sweeps: int):
    """Per-sweep PRNG seed words [n_sweeps, 2] and cyclic offsets
    [n_sweeps], derived from a base key folded with the ABSOLUTE sweep
    index (state.sweeps) — never from the call/block structure — so the
    per-sweep RNG SCHEDULE is identical however a run is chunked into
    device calls (ADVICE r1). Shared by the pallas and zsorted engines."""
    s0 = state.sweeps.reshape(-1)[0].astype(jnp.int32)
    if seed is None:
        base = jax.random.fold_in(state.key[0], 0x5EEDB1)
    else:
        seed_vec = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
        base = jax.random.key(seed_vec[0].astype(jnp.uint32))
        if seed_vec.shape[0] > 1:
            base = jax.random.fold_in(base, seed_vec[1].astype(jnp.uint32))
    sweep_ids = s0 + jnp.arange(n_sweeps, dtype=jnp.int32)
    per_sweep = jax.vmap(
        lambda i: jax.random.key_data(jax.random.fold_in(base, i)).reshape(-1)
    )(sweep_ids)
    sw_seeds = (per_sweep[:, -2:] & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
    okey_base = jax.random.fold_in(base, 0x0FF5E7)
    offsets = jax.vmap(
        lambda i: jax.random.randint(
            jax.random.fold_in(okey_base, i), (), 0, cfg.n, dtype=jnp.int32)
    )(sweep_ids)
    return sw_seeds, offsets


def ensemble_sweeps_pallas(
    state: ChainState,
    w: jax.Array,
    cfg: SMCConfig,
    a: float,
    n_sweeps: int,
    seed: int | jax.Array | None = None,
    c_tile: int | None = None,
    a_per_chain: jax.Array | None = None,
    t_per_chain: jax.Array | None = None,
    uniform_at: tuple | None = None,
) -> Tuple[ChainState, SweepStats]:
    """n_sweeps sweeps for every chain through the Pallas whole-sweep
    kernel (kernels/sweep_pallas.py): ensemble state resident in VMEM for
    the entire block. ~4x the XLA path at N=108 (measured on v5e).

    The kernel uses the on-core PRNG instead of the chains' threefry
    keys. Each sweep's stream is seeded from the chain key folded with
    the ABSOLUTE sweep counter (state.sweeps) — see _per_sweep_randomness
    — so the RNG schedule is identical however the run is chunked into
    device calls, and seeded runs are bitwise reproducible given the
    driver's (deterministic) chunk sizes. NOTE: unlike the XLA path,
    trajectories are not bitwise invariant ACROSS different chunkings —
    the kernel's x/y pre-scale rounds once per call boundary (f32
    `x*(1/L)*L` is not an exact round trip for general L). Traces come
    back exactly like run_sweeps: per-sweep E and accept counts, shape
    [n_sweeps, C].

    a_per_chain/t_per_chain ([C], both or neither): per-chain proposal
    mobility and temperature — runs a whole temperature LADDER through
    one kernel compile (tsweep/pt at kernel speed); `a` is then ignored.

    uniform_at=(A, T): the same ladder-mode routing with one (A, T) for
    every chain — (A, T) become kernel DATA rows, so a run whose mobility
    is not a config constant (auto-tuned A, tuning.py) reuses the single
    ladder-mode Mosaic compile instead of recompiling per value.
    """
    from .kernels import sweep_pallas as sp

    c = state.r.shape[0]
    if uniform_at is not None and a_per_chain is None:
        a_per_chain = jnp.full((c,), float(uniform_at[0]), jnp.float32)
        t_per_chain = jnp.full((c,), float(uniform_at[1]), jnp.float32)
    if c_tile is None:
        c_tile = _auto_c_tile(cfg, c)
    c_tile = _check_c_tile(c, c_tile)
    sw_seeds, offsets = _per_sweep_randomness(state, cfg, seed, n_sweeps)

    x, y, z = sp.to_planes(state.r, cfg)
    if w.ndim == 3:
        # per-chain wall tables (quenched disorder): [s_pad, C]
        # coefficient planes, chain-indexed like the (A, T) rows
        wa, wb = sp.wall_coeff_planes(w, cfg)
        pcw = True
    else:
        wa, wb = sp.wall_coeff_rows(w, cfg)
        pcw = False
    e = state.energy.reshape(1, c).astype(jnp.float32)

    kw = {}
    if a_per_chain is not None:
        kw = dict(
            a_row=jnp.asarray(a_per_chain, jnp.float32).reshape(1, c),
            invt_row=(1.0 / jnp.asarray(t_per_chain, jnp.float32)
                      ).reshape(1, c),
        )
        a = 0.0  # static `a` is unused in per-chain mode: one compile key

    x, y, z, e, e_trace, a_trace = sp.pallas_sweep_block(
        x, y, z, e, wa, wb, offsets, sw_seeds,
        cfg, n_sweeps, float(a), c_tile=c_tile, per_chain_w=pcw, **kw,
    )

    new_state = state._replace(
        r=sp.from_planes(x, y, z, cfg, dtype=cfg.jnp_dtype),
        energy=e.reshape(c).astype(cfg.jnp_dtype),
        sweeps=state.sweeps + n_sweeps,
        accepted=state.accepted + jnp.sum(a_trace, axis=0, dtype=jnp.int32),
    )
    return new_state, SweepStats(
        energy=e_trace.astype(cfg.jnp_dtype), accepted=a_trace
    )


def zsort_cadence(n: int) -> int:
    """Default sort cadence for the zsorted engine, by system size.

    Re-sorting every sweep costs more than its skipping saves once the
    identity row rides along (sps=1 measured ~1.0x dense at N=4096);
    staleness only reduces skip efficiency, never correctness (block
    bounds are live in-kernel). The measured optimum on v5e
    (scripts/probe_crossover.py + probe_cadence2.py, 192/200-sweep
    calls): N=1024 — sps16 47.2k vs sps8 44.1k vs sps4 36.0k agg
    sweeps/s; N=2048 — sps8 15.0k ~= sps16 15.0k > sps4 13.3k;
    N=4096 — sps8 4.26k > sps16 4.15k > sps4 3.99k. The wrapper handles
    call lengths that are not multiples of the cadence with a shorter
    final chunk, so the cadence never silently degrades on odd gather
    lapses."""
    return 16 if n <= 1024 else 8


def ensemble_sweeps_zsorted(
    state: ChainState,
    w: jax.Array,
    cfg: SMCConfig,
    a: float,
    n_sweeps: int,
    seed: int | jax.Array | None = None,
    c_tile: int | None = None,
    sweeps_per_sort: int | None = None,
    row_block_rows: int = 128,
    hbm_stream: bool | None = None,
    uniform_at: tuple | None = None,
    a_per_chain: jax.Array | None = None,
    t_per_chain: jax.Array | None = None,
    xsort_slices: int = 0,
) -> Tuple[ChainState, SweepStats]:
    """Large-N fast path: the whole-sweep kernel with EXACT z-block
    skipping (VERDICT r1 #4; SURVEY §5.7 — the sequence-parallel analog).

    xsort_slices > 1: the EXPERIMENTAL 2-D refinement — rows are
    additionally x-sorted within z-bands of `xsort_slices` row blocks,
    and the kernel culls blocks by live (z, x) bounds
    (docs/PERF_NOTES.md round-5). Same exact-skip contract as 1-D
    (admission is conservative, results bitwise the no-skip kernel on
    the same row order); requires the VMEM-resident kernel, i.i.d.
    noise, and n divisible by row_block * xsort_slices.

    The confined systems are dilute along z (cutoff 3 sigma vs Lz
    200-240), so a dense per-move pair pass wastes most of its work on
    out-of-range rows. Here rows are z-SORTED per chain between kernel
    calls; inside the kernel each j-block keeps live per-lane (zmin,
    zmax) bounds, and blocks provably beyond the moving particle's z
    cutoff are skipped. Unlike the parked round-1 banded kernel there is
    NO window heuristic, NO fallback and NO |dz| move rejection: skips
    happen only on provably-zero contributions, so results are bitwise
    identical to the same kernel with skipping disabled (tested), and
    the sampled chain is the standard one.

    Particle labels are PRESERVED across the call: the wrapper carries
    an identity row through the per-chunk sorts and scatters positions
    back to original order at the boundary, so Rbin mobility and
    positions-CSV identity work exactly like the dense engine (the
    archived banded experiment lacked this).

    hbm_stream (None = auto): route through the HBM-resident streamed
    kernel — position planes stay in HBM and pair passes stream z-window
    j-blocks through double-buffered VMEM buffers. Auto turns it on
    exactly when the VMEM-resident planes no longer fit (N beyond ~10k
    at c_tile 128); results are bitwise identical to the VMEM zskip
    kernel at the same row_block (test_pallas pins this), so the switch
    is a pure capacity/perf decision.

    uniform_at=(A, T) / a_per_chain+t_per_chain [C]: the ladder-mode
    (A, T) DATA-row routing, exactly like ensemble_sweeps_pallas — the
    kernel's static `a` pins to 0.0 so one compile key covers every
    tuned mobility and temperature ladder (a RUN-VARYING A as the
    static would cold-compile Mosaic each run). The rows are CHAIN-
    indexed, so the per-chunk particle sorts never touch them.
    """
    from .kernels import sweep_pallas as sp

    c = state.r.shape[0]
    if uniform_at is not None and a_per_chain is None:
        a_per_chain = jnp.full((c,), float(uniform_at[0]), jnp.float32)
        t_per_chain = jnp.full((c,), float(uniform_at[1]), jnp.float32)
    assert (a_per_chain is None) == (t_per_chain is None)
    at_kw = {}
    if a_per_chain is not None:
        at_kw = dict(
            a_row=jnp.asarray(a_per_chain, jnp.float32).reshape(1, c),
            invt_row=(1.0 / jnp.asarray(t_per_chain, jnp.float32)
                      ).reshape(1, c),
        )
        a = 0.0  # static `a` is unused in per-chain mode: one compile key
    n = cfg.n
    n_pad = ((n + 7) // 8) * 8
    # zskip needs n_pad % row_block == 0: shrink to the largest divisor
    # (multiple of 8) of n_pad at or below the request
    rb = min(n_pad, max(8, (row_block_rows // 8) * 8))
    while n_pad % rb != 0:
        rb -= 8
    row_block_rows = rb
    if c_tile is None:
        c_tile = _auto_c_tile(cfg, c, row_block_rows=row_block_rows)
    c_tile = _check_c_tile(c, c_tile)
    stream_ok = not (cfg.reference_noise or cfg.pbc_z)
    if hbm_stream is None:
        # VMEM ledger of the resident kernel: 3 planes (+ the [3N, C]
        # reference-noise scratch when enabled) + ~10 j-block
        # temporaries against the ~13 MB budget (_auto_c_tile's bound).
        rows = 3 * n_pad + (3 * n if cfg.reference_noise else 0)
        resident = (rows + 10 * row_block_rows) * c_tile * 4
        # auto only streams when the config supports it — an unsupported
        # config stays resident (and Mosaic reports VMEM exhaustion at
        # sizes truly beyond it) rather than raising mid-run.
        # TPU_SMC_FORCE_HBM_STREAM=1 forces the streamed route at any N
        # (test/composition escape: the stream<->resident switch is
        # bitwise, so forcing it at small N exercises the pod-scale
        # composition — e.g. --global-ladder x hbm_stream — cheaply).
        hbm_stream = stream_ok and (
            resident > 13 * 2 ** 20
            or os.environ.get("TPU_SMC_FORCE_HBM_STREAM") == "1")
    elif hbm_stream and not stream_ok:
        raise NotImplementedError(
            "hbm_stream engine requires walls and default (i.i.d.) noise")
    xsl = max(0, int(xsort_slices or 0))
    if xsl > 1:
        if hbm_stream:
            raise NotImplementedError(
                "xsort_slices: VMEM-resident kernel only (prototype)")
        if cfg.reference_noise:
            raise NotImplementedError("xsort_slices requires i.i.d. "
                                      "noise (DEVIATIONS A8 scope)")
        band_rows = row_block_rows * xsl
        if n != n_pad or n % band_rows:
            raise ValueError(
                f"xsort_slices {xsl}: n {n} must be a multiple of "
                f"row_block*xslices = {band_rows} (pad-free bands)")
    # Fixed cadence regardless of call length: n_full chunks of
    # `sweeps_per_sort`, plus one shorter final chunk for the remainder.
    # An odd gather lapse therefore costs at most one short chunk per
    # call instead of silently collapsing the whole call to sps=1.
    if sweeps_per_sort is None:
        sweeps_per_sort = zsort_cadence(n)
    sps = max(1, int(sweeps_per_sort))
    n_full = n_sweeps // sps
    rem = n_sweeps % sps
    assert n_sweeps >= 1, n_sweeps

    # Per-sweep randomness folds the ABSOLUTE counter, exactly like
    # ensemble_sweeps_pallas (shared helper).
    sw_seeds, offsets = _per_sweep_randomness(state, cfg, seed, n_sweeps)

    x, y, z = sp.to_planes(state.r, cfg)
    if w.ndim == 3:
        # per-chain wall tables (quenched disorder): chain-indexed
        # planes, untouched by the per-chunk PARTICLE sorts below
        wa, wb = sp.wall_coeff_planes(w, cfg)
        pcw = True
    else:
        wa, wb = sp.wall_coeff_rows(w, cfg)
        pcw = False
    e = state.energy.reshape(1, c).astype(jnp.float32)
    # Particle identity carried THROUGH the sorts: idx[j, c] = original
    # particle id of the row currently at position j in chain c. The
    # kernel only moves particles in place (row order is stable inside a
    # call), so composing idx with each chunk's permutation lets the
    # wrapper hand positions back in ORIGINAL particle order — label-
    # dependent bookkeeping (Rbin mobility, positions CSV identity)
    # survives, unlike the archived banded experiment.
    idx = jnp.tile(jnp.arange(n, dtype=jnp.int32)[:, None], (1, c))

    def block(x, y, z, e, idx, k0, length):
        # z-sort the real rows per chain (pads stay parked at the tail)
        perm = jnp.argsort(z[:n], axis=0)
        if xsl > 1:
            # 2-D order: x-sort WITHIN each z-band of xsl row blocks
            # (band z-extents only matter through the kernel's live
            # bounds, so equal-count bands are fine)
            nbnd = n // band_rows
            xz = jnp.take_along_axis(x[:n], perm, axis=0)
            xperm = jnp.argsort(xz.reshape(nbnd, band_rows, c), axis=1)
            perm = jnp.take_along_axis(
                perm.reshape(nbnd, band_rows, c), xperm, axis=1
            ).reshape(n, c)
        x = x.at[:n].set(jnp.take_along_axis(x[:n], perm, axis=0))
        y = y.at[:n].set(jnp.take_along_axis(y[:n], perm, axis=0))
        z = z.at[:n].set(jnp.take_along_axis(z[:n], perm, axis=0))
        idx = jnp.take_along_axis(idx, perm, axis=0)
        off = jax.lax.dynamic_slice(offsets, (k0,), (length,))
        sws = jax.lax.dynamic_slice(
            sw_seeds, (k0, jnp.int32(0)), (length, 2))
        x, y, z, e, etr, atr = sp.pallas_sweep_block(
            x, y, z, e, wa, wb, off, sws, cfg, length, float(a),
            c_tile=c_tile, zskip=True, row_block_rows=row_block_rows,
            hbm_stream=hbm_stream, per_chain_w=pcw, xslices=xsl,
            **at_kw,
        )
        return x, y, z, e, idx, etr, atr

    def chunk(carry, k):
        x, y, z, e, idx = carry
        x, y, z, e, idx, etr, atr = block(
            x, y, z, e, idx, (k * sps).astype(jnp.int32), sps)
        return (x, y, z, e, idx), (etr, atr)

    e_pieces, a_pieces = [], []
    carry = (x, y, z, e, idx)
    if n_full:
        carry, (etr, atr) = jax.lax.scan(
            chunk, carry, jnp.arange(n_full, dtype=jnp.int32))
        e_pieces.append(etr.reshape(n_full * sps, c))
        a_pieces.append(atr.reshape(n_full * sps, c))
    if rem:
        x, y, z, e, idx, etr, atr = block(
            *carry, jnp.int32(n_full * sps), rem)
        carry = (x, y, z, e, idx)
        e_pieces.append(etr.reshape(rem, c))
        a_pieces.append(atr.reshape(rem, c))
    x, y, z, e, idx = carry
    e_trace = e_pieces[0] if len(e_pieces) == 1 else jnp.concatenate(e_pieces)
    a_trace = a_pieces[0] if len(a_pieces) == 1 else jnp.concatenate(a_pieces)

    # Un-permute: row j holds particle idx[j] -> scatter rows back so
    # r_out[i] is particle i again (one scatter per call boundary).
    r_sorted = sp.from_planes(x, y, z, cfg, dtype=cfg.jnp_dtype)  # [C, n, 3]
    r_out = jax.vmap(
        lambda rs, ids: jnp.zeros_like(rs).at[ids].set(rs)
    )(r_sorted, idx.T)

    new_state = state._replace(
        r=r_out,
        energy=e.reshape(c).astype(cfg.jnp_dtype),
        sweeps=state.sweeps + n_sweeps,
        accepted=state.accepted + jnp.sum(a_trace, axis=0, dtype=jnp.int32),
    )
    return new_state, SweepStats(
        energy=e_trace.astype(cfg.jnp_dtype), accepted=a_trace
    )


def ensemble_sweeps_banded(
    state: ChainState,
    w: jax.Array,
    cfg: SMCConfig,
    a: float,
    n_sweeps: int,
    window: int = 128,
    d_z: float = 12.0,
    c_tile: int = 128,
) -> Tuple[ChainState, SweepStats, jax.Array]:
    """EXPERIMENTAL z-banded random-scan sampler (kernels/sweep_banded.py).

    Exact-by-construction variant for large confined systems: per-chain
    z-sort between sweeps + windowed pair pass with provable-sufficiency
    fallback + symmetric |delta_z| <= d_z rejection. NOTE: particle labels
    are permuted by the per-sweep sort (physically meaningless, but the
    Rbin mobility bookkeeping loses identity — density/g(r)/pressure/E are
    unaffected). Returns (state, SweepStats, fallback_fraction)."""
    from .kernels import sweep_banded as sb
    from .kernels import sweep_pallas as sp

    c = state.r.shape[0]
    assert c % c_tile == 0, (c, c_tile)
    wa, wb = sp.wall_coeff_rows(w, cfg)

    def body(carry, _):
        r, e, key = carry
        key, k_rows, k_seed = jax.random.split(key, 3)
        x, y, z, margin = sb.sort_and_margin(r, cfg, window)
        rows = jax.random.randint(k_rows, (cfg.n,), 0, cfg.n, dtype=jnp.int32)
        seed = jax.random.randint(k_seed, (), 0, 2 ** 31 - 1, dtype=jnp.int32)
        x, y, z, e, acc, fb = sb.banded_sweep_block(
            x, y, z, e, wa, wb, margin, rows, seed, cfg, cfg.n, float(a),
            c_tile=c_tile, window=window, d_z=d_z,
        )
        r_new = sp.from_planes(x, y, z, cfg, dtype=cfg.jnp_dtype)
        return (r_new, e, key), (e[0], acc[0], fb[0])

    e0 = state.energy.reshape(1, c).astype(jnp.float32)
    (r, e, key), (e_tr, a_tr, fb_tr) = jax.lax.scan(
        body, (state.r, e0, state.key[0]), None, length=n_sweeps)

    new_keys = jax.vmap(lambda k: jax.random.split(k, 1)[0])(state.key)
    new_state = state._replace(
        r=r,
        energy=e.reshape(c).astype(cfg.jnp_dtype),
        key=new_keys,
        sweeps=state.sweeps + n_sweeps,
        accepted=state.accepted + jnp.sum(a_tr, axis=0, dtype=jnp.int32),
    )
    fb_frac = jnp.mean(fb_tr) / cfg.n
    return new_state, SweepStats(energy=e_tr.astype(cfg.jnp_dtype),
                                 accepted=a_tr), fb_frac


def _device_salted_seed(seed, axis: str):
    """Per-device PRNG seed inside a shard_map body: fold the device's
    mesh index into EVERY provided seed word so shards decorrelate.
    Accepts None (caller derives from local chain keys — already
    distinct per shard), a scalar seed, or a 2-word (seed, salt) vector
    (the multi-process CLI salts per process; without folding the salt
    word here, two processes' devices would repeat streams)."""
    if seed is None:
        return None
    dev = jax.lax.axis_index(axis).astype(jnp.int32)
    seed_vec = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    w0 = seed_vec[0] + dev * jnp.int32(0x9E3779)
    w1 = dev if seed_vec.shape[0] == 1 \
        else seed_vec[1] * jnp.int32(1000003) + dev
    return jnp.stack([w0, w1])


def ensemble_sweeps_pallas_sharded(
    state: ChainState,
    w: jax.Array,
    cfg: SMCConfig,
    a: float,
    n_sweeps: int,
    seed: int | None,
    mesh: Mesh,
    axis: str = "chains",
    c_tile: int | None = None,
    uniform_at: tuple | None = None,
    a_per_chain: jax.Array | None = None,
    t_per_chain: jax.Array | None = None,
) -> Tuple[ChainState, SweepStats]:
    """Multi-chip Pallas path: the whole-sweep kernel under shard_map.

    Each device runs the kernel on its local chain shard (zero cross-chip
    traffic, faithful to the replica model); per-device PRNG streams are
    decorrelated by folding the device index into the seed. seed=None
    derives each shard's stream from its own first chain's key folded
    with the ABSOLUTE sweep counter (distinct across devices, and
    chunk-invariant like the single-chip engine).

    a_per_chain/t_per_chain ([C] global, sharded over `axis` like the
    state): per-chain (A, T) ladder rows — multi-chip temperature
    ladders at kernel speed; each shard's kernel sees its local rows."""
    nd = mesh.shape[axis]
    c = state.r.shape[0]
    assert c % nd == 0, f"chains {c} must divide over {nd} devices"
    per_chain = a_per_chain is not None
    pcw = w.ndim == 3   # per-chain wall tables shard with their chains

    def local(st, *ops):
        st = jax.tree.map(lambda x: x, st)
        wv, rows = (ops[0], ops[1:]) if pcw else (w, ops)
        kw = dict(a_per_chain=rows[0], t_per_chain=rows[1]) if per_chain \
            else dict(uniform_at=uniform_at)
        return ensemble_sweeps_pallas(
            st, wv, cfg, a, n_sweeps, seed=_device_salted_seed(seed, axis),
            c_tile=c_tile, **kw,
        )

    specs = ChainState(
        r=P(axis), energy=P(axis), key=P(axis), sweeps=P(axis),
        accepted=P(axis), rbin=P(axis), density=P(axis), mobility=P(axis),
    )
    in_specs = (specs,) + ((P(axis),) if pcw else ()) \
        + ((P(axis), P(axis)) if per_chain else ())
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=in_specs,
        out_specs=(specs, SweepStats(energy=P(None, axis),
                                     accepted=P(None, axis))),
        check_vma=False,  # pallas_call out_shapes carry no vma info
    )
    args = (state,) + ((w,) if pcw else ()) \
        + ((a_per_chain, t_per_chain) if per_chain else ())
    return fn(*args)


def ensemble_sweeps_zsorted_sharded(
    state: ChainState,
    w: jax.Array,
    cfg: SMCConfig,
    a: float,
    n_sweeps: int,
    seed: int | None,
    mesh: Mesh,
    axis: str = "chains",
    c_tile: int | None = None,
    row_block_rows: int = 128,
    sweeps_per_sort: int | None = None,
    hbm_stream: bool | None = None,
    uniform_at: tuple | None = None,
    a_per_chain: jax.Array | None = None,
    t_per_chain: jax.Array | None = None,
) -> Tuple[ChainState, SweepStats]:
    """Multi-chip zsorted path: the z-block-skipping kernel under
    shard_map — each device z-sorts and sweeps its local chain shard
    (the sort is per chain, so sharding the chain axis changes nothing),
    zero cross-chip traffic. Per-device PRNG streams decorrelate by
    folding the device index into the seed, exactly like
    ensemble_sweeps_pallas_sharded. uniform_at=(A, T): tuned-mobility
    routing through the ladder-mode data rows (each shard builds its
    local rows from the shared scalars); a_per_chain/t_per_chain ([C]
    global, sharded like the state): temperature-ladder rows — sharded
    ladders at zsorted speed."""
    nd = mesh.shape[axis]
    c = state.r.shape[0]
    assert c % nd == 0, f"chains {c} must divide over {nd} devices"
    per_chain = a_per_chain is not None
    pcw = w.ndim == 3   # per-chain wall tables shard with their chains

    def local(st, *ops):
        wv, rows = (ops[0], ops[1:]) if pcw else (w, ops)
        kw = dict(a_per_chain=rows[0], t_per_chain=rows[1]) if per_chain \
            else dict(uniform_at=uniform_at)
        return ensemble_sweeps_zsorted(
            st, wv, cfg, a, n_sweeps, seed=_device_salted_seed(seed, axis),
            c_tile=c_tile, row_block_rows=row_block_rows,
            sweeps_per_sort=sweeps_per_sort, hbm_stream=hbm_stream,
            **kw,
        )

    specs = ChainState(
        r=P(axis), energy=P(axis), key=P(axis), sweeps=P(axis),
        accepted=P(axis), rbin=P(axis), density=P(axis), mobility=P(axis),
    )
    in_specs = (specs,) + ((P(axis),) if pcw else ()) \
        + ((P(axis), P(axis)) if per_chain else ())
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=in_specs,
        out_specs=(specs, SweepStats(energy=P(None, axis),
                                     accepted=P(None, axis))),
        check_vma=False,  # pallas_call out_shapes carry no vma info
    )
    args = (state,) + ((w,) if pcw else ()) \
        + ((a_per_chain, t_per_chain) if per_chain else ())
    return fn(*args)


# ----------------------------------------------------------------------
# Particle-axis sharding (the "tensor/sequence parallel" analog, §5.7/§2)
# ----------------------------------------------------------------------

def particle_sharded_energy(
    r: jax.Array, w: jax.Array, cfg: SMCConfig, mesh: Mesh, axis: str = "particles"
) -> jax.Array:
    """Total energy with particle rows sharded over a mesh axis.

    Each device holds an [N/D, 3] row block, all-gathers the full position
    set over ICI, computes its block's pair rows + wall terms, and psums.
    For N in the thousands this turns the O(N^2) pass into O(N^2/D) per
    chip with one all-gather — the scaling-book recipe applied to the pair
    matrix instead of an attention matrix.
    """
    n = r.shape[0]
    nd = mesh.shape[axis]
    assert n % nd == 0, f"N={n} must divide over {nd} devices"

    def block(r_local):
        r_full = jax.lax.all_gather(r_local, axis, tiled=True)  # [N, 3]
        my = jax.lax.axis_index(axis)
        row0 = my * (n // nd)

        def row_energy(k, ri):
            i = row0 + k
            d, dr2 = _pair_displacements(ri, r_full, cfg)
            mask = (dr2 < cfg.cutoff2) & (jnp.arange(n) != i)
            safe = jnp.where(mask, dr2, jnp.ones_like(dr2))
            inv6 = 1.0 / (safe * safe * safe)
            u = 4.0 * jnp.sum(jnp.where(mask, inv6 * inv6 - inv6, 0.0))
            if cfg.use_walls:
                u_w, _ = wall_energy_force_single(ri, w, cfg)
            else:
                u_w = jnp.zeros((), r_local.dtype)
            return 0.5 * u + u_w

        u_block = jax.vmap(row_energy)(jnp.arange(n // nd), r_local)
        return jax.lax.psum(jnp.sum(u_block), axis)

    fn = jax.shard_map(
        block,
        mesh=mesh,
        in_specs=P(axis),
        out_specs=P(),
    )
    return fn(r)


# ----------------------------------------------------------------------
# Multi-host initialization (pod-scale runs)
# ----------------------------------------------------------------------

def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> int:
    """Initialize jax.distributed for multi-host pods and return the local
    process index. On single-host (or already-initialized) setups this is
    a no-op returning 0.

    Usage mirrors the reference's mpirun model — one process per host,
    zero inter-chain traffic — except the mesh then spans all hosts and
    observable reductions ride ICI/DCN collectives instead of the
    filesystem (SURVEY §5.8).
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        # Auto-detection mode tolerates single-host setups; an EXPLICIT
        # coordinator that fails to connect is a real error the caller
        # asked for.
        if coordinator is not None:
            raise
    return jax.process_index()


def allgather_chain_axis(x) -> np.ndarray:
    """Concatenate per-process host arrays along the leading (chain) axis
    across every jax.distributed process.

    This is the DCN-collective replacement for the reference's offline
    per-rank-file aggregation (SMC.c:66-96 writes `*_rank%d.csv`, pooled
    by hand afterwards): each process contributes its local chains' rows
    and every process receives the full [C_total, ...] array. Equal local
    shapes are required (chains split evenly across processes)."""
    from jax.experimental import multihost_utils

    x = np.asarray(x)
    g = multihost_utils.process_allgather(jnp.asarray(x))   # [P, C_local, ...]
    return np.asarray(g).reshape((-1,) + x.shape[1:])


# ----------------------------------------------------------------------
# Per-chain keys (replaces per-process srand(time(NULL)), SMC.c:40)
# ----------------------------------------------------------------------

def fold_chain_keys(base: jax.Array, n_chains: int) -> jax.Array:
    return jax.vmap(lambda i: jax.random.fold_in(base, i))(jnp.arange(n_chains))
