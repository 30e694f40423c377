"""Lennard-Jones pair and surface-wall physics, fused and vectorized.

Reference semantics reproduced (file:line cites into /root/reference):
  - pair energy of one particle:      SMC.c:557-583  (energySingle)
  - pair force on one particle:       SMC.c:589-618  (forceSingle)
  - total pair energy:                SMC.c:626-646  (energy)
  - virial pair pressure:             SMC.c:696-720  (pressure)
  - wall energy of one particle:      SMC.c:729-763  (wallsEnergySingle)
  - wall force on one particle:       SMC.c:773-813  (wallsForce)
  - total wall energy:                SMC.c:822-859  (wallsEnergy)
  - wall virial pressure:             SMC.c:862-895  (wallsPressure)
  - wall parameter construction:      SMC.c:475-501  (initializeWalls)

Key reference conventions kept:
  * minimum-image wrapping in x and y ONLY (z is unwrapped: SMC.c:572,606);
    the bulk variant wraps z as well (SMC_noMPI_noWall.c:516-517) — selected
    by cfg.pbc_z.
  * pair cutoff r^2 < LJ_CUTOFF^2 tested on the squared distance.
  * LJ potential V = 4*(r^-12 - r^-6); force kernel (-dV/dr)/r
    = 48 r^-14 - 24 r^-8 multiplying the displacement vector.
  * the uniform wall term uses the signed distance to the NEAREST wall,
    dz = wrap_Lz(rz + Lz/2), clamped at contact (SMC.c:736-741).

Design departures (TPU-first, not a translation):
  * energy and force are computed together in one fused pass over the same
    displacement tensor — the reference recomputes distances four times per
    move (its own TODO at SMC.c:12 asks for exactly this fusion).
  * all loops over particles/wall sites are vectorized; chain batching is
    applied by vmap at the call site, turning every [N] array into [C, N],
    which is the shape the VPU wants.
  * no data-dependent branching: the cutoff and self-exclusion are masks.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .config import SMCConfig


def _min_image(d, period):
    """Minimum-image convention via round-half-even, matching C rint."""
    return d - period * jnp.round(d / period)


def wrap_xy(r: jnp.ndarray, cfg: SMCConfig) -> jnp.ndarray:
    """Wrap positions into the periodic x/y box (shiftSystem2D, SMC.c:521-527).

    z is wrapped too when cfg.pbc_z (shiftSystem3D, SMC.c:512-519).
    """
    x = _min_image(r[..., 0], cfg.box_l)
    y = _min_image(r[..., 1], cfg.box_l)
    z = _min_image(r[..., 2], cfg.box_lz) if cfg.pbc_z else r[..., 2]
    return jnp.stack([x, y, z], axis=-1)


def _pair_displacements(ri: jnp.ndarray, R: jnp.ndarray, cfg: SMCConfig,
                        box: jnp.ndarray | None = None):
    """Displacements ri - R[l] with min-image in x,y (and z if pbc_z).

    ri: [3], R: [N,3] -> d: [N,3], dr2: [N]

    `box` (optional TRACED scalar): side of a CUBIC fully-periodic box
    overriding the static cfg dims — the constant-pressure engine's
    per-chain fluctuating volume (npt.py). A Python-level branch:
    box=None callers keep their original jaxpr (compile caches
    untouched). Requires cfg.pbc_z (bulk only).
    """
    d = ri[None, :] - R
    if box is not None:
        assert cfg.pbc_z, "traced box override is bulk-only (cubic PBC)"
        d = _min_image(d, box)
        dr2 = jnp.sum(d * d, axis=-1)
        return d, dr2
    dx = _min_image(d[:, 0], cfg.box_l)
    dy = _min_image(d[:, 1], cfg.box_l)
    dz = _min_image(d[:, 2], cfg.box_lz) if cfg.pbc_z else d[:, 2]
    d = jnp.stack([dx, dy, dz], axis=-1)
    dr2 = jnp.sum(d * d, axis=-1)
    return d, dr2


def pair_energy_force_single(
    R: jnp.ndarray, i: jnp.ndarray, ri: jnp.ndarray, cfg: SMCConfig,
    active: jnp.ndarray | None = None,
    box: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Energy of and force on a particle at position `ri`, excluding index i.

    Fuses energySingle (SMC.c:557-583) and forceSingle (SMC.c:589-618):
    both walk the same displacements. `ri` may differ from R[i] (proposal
    evaluation); the reference handles that by writing the proposal into Rn
    first (SMC.c:311-319) — here it is just an argument.

    `active` ([N] bool, optional): restrict the pair sum to a subset —
    the grand-canonical engine's capacity slots (gcmc.py). The mask is
    applied BEFORE 1/dr2, so parked slots may hold anything, including
    exact overlaps. A Python-level branch: active=None callers keep
    their original jaxpr (compile caches untouched).

    `box` (optional TRACED scalar): cubic bulk box side overriding the
    static cfg dims (constant-pressure engine, npt.py). The cutoff
    stays the STATIC cfg.lj_cutoff — a volume-dependent cutoff would
    make the potential itself a function of V and bias the NPT ensemble
    (measured: rho off by 8.5% vs the NVT virial closed loop); the NPT
    volume move enforces box >= 2*lj_cutoff by rejection
    (npt.volume_move), so min-image + fixed rc stay valid.

    Returns (U, F[3]).
    """
    n = R.shape[0]
    d, dr2 = _pair_displacements(ri, R, cfg, box=box)
    mask = (dr2 < cfg.cutoff2) & (jnp.arange(n) != i)
    if active is not None:
        mask = mask & active
    # Guard: masked lanes get a safe distance so 1/dr2 never produces inf/nan.
    safe = jnp.where(mask, dr2, jnp.ones_like(dr2))
    inv2 = 1.0 / safe
    inv6 = inv2 * inv2 * inv2
    inv12 = inv6 * inv6
    u = 4.0 * jnp.sum(jnp.where(mask, inv12 - inv6, 0.0))
    if cfg.lj_shift:
        # truncated-and-shifted: subtract u(rc) per in-cutoff pair so u
        # is continuous at rc (see the cfg.lj_shift comment). Forces
        # are untouched; u(rc) is a Python-level constant.
        rc6 = cfg.cutoff2 ** 3
        u_rc = 4.0 * (1.0 / (rc6 * rc6) - 1.0 / rc6)
        u = u - u_rc * jnp.sum(mask.astype(inv6.dtype))
    # (-dV/dr)/r = 48 r^-14 - 24 r^-8   (SMC.c:611)
    dv = (48.0 * inv12 - 24.0 * inv6) * inv2
    f = jnp.sum(jnp.where(mask[:, None], dv[:, None] * d, 0.0), axis=0)
    return u, f


def pair_energy_total(R: jnp.ndarray, cfg: SMCConfig,
                      box: jnp.ndarray | None = None) -> jnp.ndarray:
    """Total pair energy, all unique pairs (energy, SMC.c:626-646).

    Above N=4096 the row pass is chunked (lax.map batches of 2048) so the
    O(N^2) displacement tensor never materializes whole — at N=32768 the
    one-shot vmap needs ~24 GB of HBM (more than the chip); the chunked
    pass peaks at ~0.3 GB. The per-row sums and the final [N] reduction
    are the same values in the same order, so results are unchanged; the
    small-N path keeps its exact round-2 lowering (committed compile
    cache)."""
    n = R.shape[0]

    def row(i):
        return pair_energy_force_single(R, i, R[i], cfg, box=box)[0]

    if n <= 4096:
        u_rows = jax.vmap(row)(jnp.arange(n))
    else:
        u_rows = jax.lax.map(row, jnp.arange(n), batch_size=2048)
    return 0.5 * jnp.sum(u_rows)


def pair_virial_pressure(R: jnp.ndarray, cfg: SMCConfig,
                         box: jnp.ndarray | None = None) -> jnp.ndarray:
    """Virial pair pressure -sum(24 r^-6 - 48 r^-12)/(3 L^2 Lz)
    (pressure, SMC.c:696-720). `box`: traced cubic side override, rc
    stays static (npt.py; see pair_energy_force_single)."""
    n = R.shape[0]

    def row(i):
        _, dr2 = _pair_displacements(R[i], R, cfg, box=box)
        mask = (dr2 < cfg.cutoff2) & (jnp.arange(n) != i)
        safe = jnp.where(mask, dr2, jnp.ones_like(dr2))
        inv6 = 1.0 / (safe * safe * safe)
        return jnp.sum(jnp.where(mask, 24.0 * inv6 - 48.0 * inv6 * inv6, 0.0))

    p = 0.5 * jnp.sum(jax.vmap(row)(jnp.arange(n)))
    vol = (cfg.box_l * cfg.box_l * cfg.box_lz if box is None
           else box * box * box)
    return -p / (3.0 * vol)


# ----------------------------------------------------------------------
# Walls
# ----------------------------------------------------------------------

def wall_site_positions(cfg: SMCConfig) -> jnp.ndarray:
    """In-plane coordinates of the M*M wall LJ sources at (i*L/M, j*L/M)
    (SMC.c:748-751). Returns [M*M, 2] with m = i*M + j ordering."""
    dw = cfg.box_l / cfg.m
    ii, jj = jnp.meshgrid(jnp.arange(cfg.m), jnp.arange(cfg.m), indexing="ij")
    return jnp.stack(
        [ii.reshape(-1) * dw, jj.reshape(-1) * dw], axis=-1
    ).astype(cfg.jnp_dtype)


def make_wall_params(
    x0: jnp.ndarray, ym: jnp.ndarray, cfg: SMCConfig
) -> jnp.ndarray:
    """Build the per-site (a, b) coefficient table W[M*M, 2] from site widths
    x0 and well depths ym: a = x0^12 * ym, b = x0^6 * ym (SMC.c:495-496)."""
    a = jnp.power(x0, 12.0) * ym
    b = jnp.power(x0, 6.0) * ym
    return jnp.stack([a, b], axis=-1).astype(cfg.jnp_dtype)


def sample_wall_params(key: jax.Array, cfg: SMCConfig) -> jnp.ndarray:
    """Gaussian-randomized wall coefficients (initializeWalls, SMC.c:475-501).

    x0 ~ N(x0_mean, x0_sigma), ym ~ N(ym_mean, ym_sigma), per site.
    The reference draws with srand(42) + Box-Muller; for bit-exact geometry
    parity with the C code use tpu_smc.rng.reference_wall_params instead.
    """
    k1, k2 = jax.random.split(key)
    mm = cfg.m * cfg.m
    x0 = cfg.wall_x0_mean + cfg.wall_x0_sigma * jax.random.normal(k1, (mm,))
    ym = cfg.wall_ym_mean + cfg.wall_ym_sigma * jax.random.normal(k2, (mm,))
    return make_wall_params(x0, ym, cfg)


def _wall_dz(rz, cfg: SMCConfig):
    """Signed distance to the nearest wall with the contact clamp
    (SMC.c:736-739): dz = wrap_Lz(rz + Lz/2); +-contact when beyond a wall."""
    lz = cfg.box_lz
    dz = rz + lz / 2.0
    dz = dz - lz * jnp.round(dz / lz)
    c = cfg.contact_dz
    dz = jnp.where(rz <= -lz / 2.0, c, jnp.where(rz >= lz / 2.0, -c, dz))
    return dz


def wall_energy_force_single(
    rpos: jnp.ndarray, W: jnp.ndarray, cfg: SMCConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Wall energy of and force on one particle at rpos=[3].

    Fuses wallsEnergySingle (SMC.c:729-763) and wallsForce (SMC.c:773-813):
      * uniform planar term a0/dz^12 - b0/dz^6 on the nearest-wall distance,
      * M*M grid sources with per-site (a,b) = W, 3-D distance using the
        SAME dz as the planar term (the grid lives on both walls at once via
        the wrap), x/y min-imaged, LJ cutoff applied.
    NOTE: unlike the reference's wallsForce, the returned force is just the
    wall contribution (the caller adds; wallsForce accumulated into non-zeroed
    output, SMC.c:769-771).

    Returns (U, F[3]).
    """
    rx, ry, rz = rpos[0], rpos[1], rpos[2]
    dz = _wall_dz(rz, cfg)

    # Uniform wall term (SMC.c:740-741, 787-789). Energy prefactor 4 is
    # applied to the whole sum at the end exactly like the reference
    # (return V*4, SMC.c:762).
    dz2 = dz * dz
    izv2 = 1.0 / dz2
    izv6 = izv2 * izv2 * izv2
    izv12 = izv6 * izv6
    u = cfg.a0 * izv12 - cfg.b0 * izv6
    # force kernel (-dV/dr)/r on dz: 48 a0 dz^-14 - 24 b0 dz^-8 times dz
    dv0 = (48.0 * cfg.a0 * izv12 - 24.0 * cfg.b0 * izv6) * izv2
    fz = dv0 * dz

    # Grid sources (SMC.c:743-761, 791-812)
    sites = wall_site_positions(cfg)              # [MM, 2]
    dx = _min_image(rx - sites[:, 0], cfg.box_l)  # [MM]
    dy = _min_image(ry - sites[:, 1], cfg.box_l)
    dr2 = dx * dx + dy * dy + dz2
    mask = dr2 < cfg.cutoff2
    safe = jnp.where(mask, dr2, jnp.ones_like(dr2))
    inv2 = 1.0 / safe
    inv6 = inv2 * inv2 * inv2
    inv12 = inv6 * inv6
    a, b = W[:, 0], W[:, 1]
    u = u + jnp.sum(jnp.where(mask, a * inv12 - b * inv6, 0.0))
    dv = (48.0 * a * inv12 - 24.0 * b * inv6) * inv2
    dv = jnp.where(mask, dv, 0.0)
    fx = jnp.sum(dv * dx)
    fy = jnp.sum(dv * dy)
    fz = fz + jnp.sum(dv) * dz
    return 4.0 * u, jnp.stack([fx, fy, fz])


def wall_energy_total(R: jnp.ndarray, W: jnp.ndarray, cfg: SMCConfig) -> jnp.ndarray:
    """Total particle-wall energy (wallsEnergy, SMC.c:822-859)."""
    u = jax.vmap(lambda r: wall_energy_force_single(r, W, cfg)[0])(R)
    return jnp.sum(u)


def wall_virial_pressure(
    R: jnp.ndarray, W: jnp.ndarray, cfg: SMCConfig, reproduce_ref_bug: bool = False
) -> jnp.ndarray:
    """Wall virial pressure (wallsPressure, SMC.c:862-895).

    The reference computes dz as rz + L/2 instead of rz + Lz/2 (SMC.c:880) —
    a bug that makes its pressures nonsense (BASELINE.md). We fix it by
    default; pass reproduce_ref_bug=True to get the reference's arithmetic.
    Other reference quirks kept for fidelity: no contact clamp here, and the
    uniform-wall virial is added once per (site, particle) pair inside the
    cutoff (SMC.c:884-889), i.e. multiplied by however many grid sites are
    in range.
    """
    half = (cfg.box_l if reproduce_ref_bug else cfg.box_lz) / 2.0
    sites = wall_site_positions(cfg)
    a, b = W[:, 0], W[:, 1]

    def per_particle(r):
        dz = r[2] + half
        dz = dz - cfg.box_lz * jnp.round(dz / cfg.box_lz)
        dx = _min_image(r[0] - sites[:, 0], cfg.box_l)
        dy = _min_image(r[1] - sites[:, 1], cfg.box_l)
        dr2 = dx * dx + dy * dy + dz * dz
        mask = dr2 < cfg.cutoff2
        safe = jnp.where(mask, dr2, jnp.ones_like(dr2))
        inv6 = 1.0 / (safe * safe * safe)
        term = 24.0 * b * inv6 - 48.0 * a * inv6 * inv6
        dz6 = dz ** 6
        term0 = 24.0 * cfg.b0 / dz6 - 48.0 * cfg.a0 / (dz6 * dz6)
        return jnp.sum(jnp.where(mask, term + term0, 0.0))

    p = jnp.sum(jax.vmap(per_particle)(R))
    return -p / (3.0 * cfg.box_l * cfg.box_l * cfg.box_lz)


# ----------------------------------------------------------------------
# Combined single-particle evaluation — the sampler's inner call
# ----------------------------------------------------------------------

def energy_force_single(
    R: jnp.ndarray, i: jnp.ndarray, ri: jnp.ndarray, W: jnp.ndarray,
    cfg: SMCConfig, active: jnp.ndarray | None = None,
    box: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """U and F for particle i at position ri: pair + wall terms.

    Mirrors the four calls per evaluation in oneParticleMoves
    (SMC.c:300-304, 319-321) as one fused function. `active`: optional
    subset mask; `box`: traced cubic bulk box side, NPT engine (see
    pair_energy_force_single).
    """
    u, f = pair_energy_force_single(R, i, ri, cfg, active=active, box=box)
    if cfg.use_walls:
        assert box is None, "traced box override is bulk-only"
        uw, fw = wall_energy_force_single(ri, W, cfg)
        u = u + uw
        f = f + fw
    return u, f


def total_forces(R: jnp.ndarray, W: jnp.ndarray, cfg: SMCConfig) -> jnp.ndarray:
    """Total force on every particle, [N, 3]: pair + wall terms.

    The reference's `forces` (SMC.c:656-686) is dead code in its live
    path (only the per-particle forceSingle/wallsForce run in the
    sampler); kept here for API completeness — one vmapped row pass
    instead of the C triangular accumulation (Newton's third law is
    implicit: each row sums the full masked column set)."""
    idx = jnp.arange(R.shape[0])
    return jax.vmap(
        lambda i, ri: energy_force_single(R, i, ri, W, cfg)[1]
    )(idx, R)


def total_energy(R: jnp.ndarray, W: jnp.ndarray, cfg: SMCConfig) -> jnp.ndarray:
    """Total potential energy: pair + wall (E[0] init, SMC.c:48)."""
    u = pair_energy_total(R, cfg)
    if cfg.use_walls:
        u = u + wall_energy_total(R, W, cfg)
    return u


# Jitted alias for EAGER call sites (state init, post-therm resync): the
# unjitted version dispatches hundreds of tiny ops — 139 s at N=1024 over
# the axon tunnel versus ~2 s compiled.
total_energy_jit = jax.jit(total_energy, static_argnames="cfg")


def total_pressure(
    R: jnp.ndarray, W: jnp.ndarray, cfg: SMCConfig
) -> jnp.ndarray:
    """Virial pressure: pair + wall terms (gather branch, SMC.c:140).
    The ideal-gas term rho*T is added by the driver (SMC.c:207-208)."""
    p = pair_virial_pressure(R, cfg)
    if cfg.use_walls:
        p = p + wall_virial_pressure(R, W, cfg)
    return p
