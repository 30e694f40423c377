"""On-device observables: voxel density/mobility, cluster analysis, ACF,
g(r), z-profiles, summary statistics.

Reference: localDensityAndMobility (SMC.c:912-927), clusterAnalysis
(SMC.c:971-1045), fft_acf/simple_acf (SMC.c:1055-1122), variance_corr
(SMC.c:1128-1142), plus the driver-side statistics (SMC.c:243-256).

All hot observables are pure jnp on device state; host code only formats.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import SMCConfig


# ----------------------------------------------------------------------
# Voxel density & mobility (SMC.c:912-927)
# ----------------------------------------------------------------------

def obs_chain_batch(n: int) -> int:
    """Chain batch size bounding the O(N^2) per-chain observable
    temporaries ([B, N, N] f32) to ~1 GB. A plain vmap over the whole
    ensemble materializes [C, N, N] pair tensors for g(r)/CNA/virial/
    energy recomputes — at N=1024 x 512 chains one fused gather step
    wanted 52 GB of HBM (measured). N=108 and every test-size problem
    stays on the exact single-vmap lowering (batch >= C)."""
    return max(1, (1 << 28) // max(n * n, 1))


def obs_chain_batch_cna(n: int) -> int:
    """Chain batch for the CNA observable specifically: its pair-blocked
    common-neighbour matmuls materialize [8192, B, N] dot operands (dot
    inputs cannot stay fused — the N=1024 x 256-chain batch measured an
    8 GB fusion output), so the bound follows 8192*N, not N^2: keep the
    operand near 1 GB."""
    return max(1, (1 << 28) // (8192 * max(n, 1)))


def vmap_chains_bounded(fn, r, n: int,
                        batch: int | None = None) -> jnp.ndarray:
    """jax.vmap(fn) over the chain axis, lax.map-batched when the
    O(N^2) temporaries would otherwise blow HBM (obs_chain_batch);
    `batch` overrides the default bound (e.g. obs_chain_batch_cna).

    `r` may be any pytree whose leaves share the leading chain axis
    (e.g. (r, w) pairs for per-chain wall-disorder realizations)."""
    b = batch if batch is not None else obs_chain_batch(n)
    lead = jax.tree_util.tree_leaves(r)[0].shape[0]
    if lead <= b:
        return jax.vmap(fn)(r)
    return jax.lax.map(fn, r, batch_size=b)


def wall_obs_chains(fn, r, w, n: int):
    """Chain-vmapped wall-dependent observable fn(r_chain, w_chain),
    HBM-bounded. `w` is the shared [M*M, 2] table, or [C, M*M, 2]
    per-chain tables when the run carries quenched wall-disorder
    realizations (system.build_wall_ensemble)."""
    if w.ndim == 3:
        return vmap_chains_bounded(lambda rw: fn(rw[0], rw[1]), (r, w), n)
    return vmap_chains_bounded(lambda ri: fn(ri, w), r, n)


def voxel_index(r: jnp.ndarray, cfg: SMCConfig) -> jnp.ndarray:
    """Voxel id per particle: v = i*Ncx*Ncz + j*Ncz + k with
    i = floor((x/L + 1/2) * Ncx) etc. (SMC.c:917-920).

    Indices are clipped into range; the reference instead casts to uint8
    and indexes its overallocated Ncx^3 buffer (SMC.c:28) — out-of-box
    particles land in junk voxels either way, clipping just keeps it safe.
    """
    i = jnp.floor((r[:, 0] / cfg.box_l + 0.5) * cfg.ncx).astype(jnp.int32)
    j = jnp.floor((r[:, 1] / cfg.box_l + 0.5) * cfg.ncx).astype(jnp.int32)
    if cfg.nonuniform_z:
        edges = jnp.asarray(z_range_edges(cfg), r.dtype)
        k = (jnp.searchsorted(edges, r[:, 2] + cfg.box_lz / 2.0,
                              side="right") - 1).astype(jnp.int32)
    else:
        k = jnp.floor((r[:, 2] / cfg.box_lz + 0.5) * cfg.ncz).astype(jnp.int32)
    i = jnp.clip(i, 0, cfg.ncx - 1)
    j = jnp.clip(j, 0, cfg.ncx - 1)
    k = jnp.clip(k, 0, cfg.ncz - 1)
    return i * (cfg.ncx * cfg.ncz) + j * cfg.ncz + k


def z_range_edges(cfg: SMCConfig) -> np.ndarray:
    """Non-uniform z bin edges in [0, Lz] (createZRange, SMC.c:1153-1169).

    The reference's comment documents the intent: every layer has
    LAYER_DEPTH thickness except the central 3, which split the leftover
    space equally. Its edge array has Ncz entries (so only Ncz-1 usable
    bins) and leaves index 17 unset entirely — the function is dead code
    in the live path. We build the documented partition properly: Ncz+1
    monotone edges = (Ncz-3)/2 thin layers per wall + 3 equal central
    layers (docs/DEVIATIONS.md F8)."""
    ncz = cfg.ncz
    ld = float(cfg.layer_depth)
    lz = float(cfg.box_lz)
    half = (ncz - 3) // 2
    # keep the thin layers from spilling past the midplane for tiny boxes
    ld = min(ld, lz / (2.0 * half + 3.0)) if half else ld
    lower = ld * np.arange(half + 1)                  # 0 .. half*ld
    upper = lz - ld * np.arange(half, -1, -1)         # lz-half*ld .. lz
    inner_lo, inner_hi = lower[-1], upper[0]
    central = inner_lo + (inner_hi - inner_lo) / 3.0 * np.arange(1, 3)
    edges = np.concatenate([lower, central, upper])
    # odd leftover bin when Ncz-3 is odd: merge into the center
    if edges.size != ncz + 1:
        edges = np.unique(np.concatenate(
            [edges, [inner_lo + (inner_hi - inner_lo) / 2.0]]))[: ncz + 1]
    assert edges.size == ncz + 1, (edges.size, ncz)
    return edges


def density_mobility_update(
    r: jnp.ndarray,
    rbin: jnp.ndarray,
    density: jnp.ndarray,
    mobility: jnp.ndarray,
    cfg: SMCConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One gather's cumulative voxel update (SMC.c:916-926):
    D[v]++ for every particle; Mu[v]++ and Rbin[n]=v when particle n
    changed voxel. Returns (rbin, density, mobility)."""
    v = voxel_index(r, cfg)
    density = density.at[v].add(jnp.uint32(1))
    moved = (rbin != v).astype(jnp.uint32)
    mobility = mobility.at[v].add(moved)
    return v.astype(jnp.int32), density, mobility


# ----------------------------------------------------------------------
# Cluster analysis (Common Neighbour Analysis)
# ----------------------------------------------------------------------

class ClusterCounts(NamedTuple):
    num1: jnp.ndarray  # [P] bool: pair within lca_cutoff
    num2: jnp.ndarray  # [P] int32: common neighbours of the pair
    num3: jnp.ndarray  # [P] int32: bonds among those common neighbours


def pair_indices(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """Row/col arrays for the P = N(N-1)/2 unique pairs, row-major like the
    reference's (l, i<l) loops."""
    l, i = np.tril_indices(n, k=-1)
    return l.astype(np.int32), i.astype(np.int32)


def _adjacency(r: jnp.ndarray, cfg: SMCConfig) -> jnp.ndarray:
    """[N, N] bool bond matrix: within lca_cutoff with x/y min-image and
    unwrapped z (SMC.c:987-992), diagonal removed."""
    n = r.shape[0]
    d = r[:, None, :] - r[None, :, :]
    dx = d[..., 0] - cfg.box_l * jnp.round(d[..., 0] / cfg.box_l)
    dy = d[..., 1] - cfg.box_l * jnp.round(d[..., 1] / cfg.box_l)
    dz = d[..., 2]
    if cfg.pbc_z:
        dz = dz - cfg.box_lz * jnp.round(dz / cfg.box_lz)
    dr2 = dx * dx + dy * dy + dz * dz
    return (dr2 < cfg.lca_cutoff * cfg.lca_cutoff) & ~jnp.eye(n, dtype=bool)


def cluster_analysis(r: jnp.ndarray, cfg: SMCConfig) -> ClusterCounts:
    """Common Neighbour Analysis, corrected.

    The reference's clusterAnalysis (SMC.c:971-1045) intends standard CNA
    but its triangular pair index `(l*l-3*l+2)/2 + i` (SMC.c:986) collides
    across rows, its common-neighbour search only scans i2 < l, and its
    bond count only tests consecutive common neighbours against an 8-slot
    buffer it can overflow. We implement the analysis it documents:

      num1[pair] = the two particles are within lca_cutoff (x/y min-image,
                   z unwrapped, matching SMC.c:987-992);
      num2[pair] = number of particles bonded to BOTH (all j != l,i);
      num3[pair] = number of bonds among those common neighbours.

    A line-faithful port of the buggy C algorithm lives in
    tests/reference_impls.py as the parity oracle. Deviation documented in
    docs/DEVIATIONS.md.
    """
    n = r.shape[0]
    adj = _adjacency(r, cfg)
    adj_f = adj.astype(jnp.float32)

    lrow, icol = pair_indices(n)
    lrow = jnp.asarray(lrow)
    icol = jnp.asarray(icol)
    p = lrow.shape[0]

    # Per-pair common-neighbour mask cn[p, j] = adj[l,j] & adj[i,j];
    # num2 = row sum, num3 = 1/2 cn A cn^T (bonds among common
    # neighbours), evaluated as [B, N] x [N, N] MXU matmuls over pair
    # blocks — never materializing an [N, N, N] tensor (4 GB at N=1024).
    block = 8192
    p_pad = ((p + block - 1) // block) * block
    lpad = jnp.concatenate([lrow, jnp.zeros(p_pad - p, jnp.int32)])
    ipad = jnp.concatenate([icol, jnp.zeros(p_pad - p, jnp.int32)])

    def one_block(idx):
        lb = jax.lax.dynamic_slice(lpad, (idx * block,), (block,))
        ib = jax.lax.dynamic_slice(ipad, (idx * block,), (block,))
        rl = adj_f[lb]                                   # [B, N]
        cn = rl * adj_f[ib]                              # [B, N]
        num2 = jnp.sum(cn, axis=-1)
        t = jnp.dot(cn, adj_f, preferred_element_type=jnp.float32)
        num3 = 0.5 * jnp.sum(t * cn, axis=-1)
        # num1[b] = adj[lb[b], ib[b]] via iota compare-reduce on the
        # already-gathered row — a flat 523k-element 2-D gather
        # serializes on TPU (round-4 window-watchdog postmortem)
        cols = jnp.arange(rl.shape[1], dtype=jnp.int32)[None, :]
        num1 = jnp.sum(jnp.where(cols == ib[:, None], rl, 0.0), axis=1)
        return num1, num2, num3

    if p_pad == block:
        num1, num2, num3 = one_block(jnp.int32(0))
    else:
        num1, num2, num3 = jax.lax.map(one_block, jnp.arange(p_pad // block))
        num1 = num1.reshape(-1)
        num2 = num2.reshape(-1)
        num3 = num3.reshape(-1)

    return ClusterCounts(
        num1=num1[:p].astype(bool),
        num2=num2[:p].astype(jnp.int32),
        num3=num3[:p].astype(jnp.int32),
    )


def _weighted_bincount(q: jnp.ndarray, w: jnp.ndarray, nb: int) -> jnp.ndarray:
    """sum of integer weights w per bin of q over [0, nb) — as a
    broadcast-compare + reduce instead of `.at[q].add(w)` (TPU
    scatter-adds serialize at ~5e7 elem/s; the CNA's per-pair 7-bin
    scatters were a large slice of the round-4 window-watchdog fault).
    Integer adds — exact, bit-identical to the scatter."""
    hits = (q[:, None] == jnp.arange(nb, dtype=q.dtype)[None, :])
    # dtype pinned: under x64, jnp.sum(int32) promotes to int64 and
    # the driver's lax.cond branches would mismatch
    return jnp.sum(jnp.where(hits, w[:, None], 0), axis=0,
                   dtype=jnp.int32)


def cluster_histograms(
    counts: ClusterCounts, nbins: int = 7
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The l1/l2/l3 aggregation the reference driver intends (SMC.c:146-155):
    among bonded pairs, histogram num2 and num3 into `nbins` buckets.
    (The C accumulators divide by an integer ratio that truncates to zero,
    so its l2/l3 are always 0 — fixed here, SURVEY §7.4.)

    Returns (l1: bonded-pair count, l2: [nbins], l3: [nbins])."""
    bonded = counts.num1.astype(jnp.int32)
    l1 = jnp.sum(bonded).astype(jnp.int32)
    l2 = _weighted_bincount(jnp.clip(counts.num2, 0, nbins - 1), bonded, nbins)
    l3 = _weighted_bincount(jnp.clip(counts.num3, 0, nbins - 1), bonded, nbins)
    return l1, l2, l3


# Row/column tile edge of the gather-free CNA pass: 64 x 64 particle
# tiles give the common-neighbour dot a 4096-row M dimension (MXU-sized)
# while keeping the [4096, N] tile tensors small.
CNA_TILE = 64


def cna_tile_pairs(n: int) -> np.ndarray:
    """Static [S, 2] table of (l_tile, i_tile) CNA_TILE-edge tile
    coordinates covering the lower triangle (i_tile <= l_tile) of the
    padded [np, np] adjacency matrix, np = ceil(n/CNA_TILE)*CNA_TILE.
    S = T(T+1)/2 tiles, T = np/CNA_TILE — the unit of bounded device
    work for the hoisted-CNA path (driver.cna_hoisted_histograms)."""
    t = -(-max(n, 1) // CNA_TILE)
    lt, it = np.tril_indices(t)
    return np.stack([lt, it], axis=1).astype(np.int32)


def cluster_histograms_tile_range(
    r: jnp.ndarray, cfg: SMCConfig, s0: jnp.ndarray, ns: int,
    nbins: int = 7,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Partial (l1, l2, l3) over `ns` lower-triangle tiles of
    cna_tile_pairs(n) starting at tile s0 (traced) — the bounded unit of
    device work for the hoisted-CNA path (driver.cna_hoisted_histograms).

    GATHER-FREE by construction: the round-4 window-fault postmortem
    measured the per-pair formulation (rl = adj[lb] row gathers, 1M
    gathered rows per chain at N=1024) at ~5e12 effective MACs/s — 5x
    below the MXU f32 rate — and it breached the ~72 s runtime watchdog
    at 512 chains (docs/EVIDENCE_WINDOW_FAULT.json). Here every operand
    is a static-size dynamic_slice of the zero-padded adjacency matrix
    and every hot op is a bf16 MXU matmul with f32 accumulation
    (adjacency entries are 0/1, counts < 2^24: integer-exact).

    Per (l_tile, i_tile) tile, for rows l in the tile and cols i in the
    other tile:
      num2[l, i] = sum_j A[l, j] A[i, j]          -> al @ ai^T
      num3[l, i] = 0.5 * cn^T A cn, cn_j = A_lj A_ij
                                                  -> one [T*T, np] matmul
      w[l, i]    = A[l, i] & (i < l)              -> column slice + iota
    Padded rows/cols are all-zero, never bonded (w = 0), so partial
    histograms over any disjoint cover of the tiles sum EXACTLY to
    cluster_histograms(cluster_analysis(r, cfg)) — pinned in
    tests/test_cna_hoist.py."""
    n = r.shape[0]
    tile = CNA_TILE
    npad = -(-n // tile) * tile
    adj = _adjacency(r, cfg).astype(jnp.float32)
    if npad != n:
        adj = jnp.pad(adj, ((0, npad - n), (0, npad - n)))
    adjb = adj.astype(jnp.bfloat16)
    pairs = jnp.asarray(cna_tile_pairs(n))              # [S, 2] static
    bins = jnp.arange(nbins, dtype=jnp.int32)

    def one_tile(s):
        lt, it = pairs[s, 0], pairs[s, 1]
        al = jax.lax.dynamic_slice(adjb, (lt * tile, jnp.int32(0)), (tile, npad))
        ai = jax.lax.dynamic_slice(adjb, (it * tile, jnp.int32(0)), (tile, npad))
        cn = al[:, None, :] * ai[None, :, :]            # [T, T, np] 0/1
        t2 = jnp.dot(cn.reshape(tile * tile, npad), adjb,
                     preferred_element_type=jnp.float32)
        num3 = (0.5 * jnp.sum(
            t2.reshape(tile, tile, npad) * cn.astype(jnp.float32),
            axis=-1)).astype(jnp.int32)                 # [T, T]
        num2 = jnp.dot(al, ai.T,
                       preferred_element_type=jnp.float32
                       ).astype(jnp.int32)              # [T, T]
        # bonded & strictly-lower mask: w[l, i] = A[l, i] * (i < l)
        asq = jax.lax.dynamic_slice(
            al, (jnp.int32(0), it * tile), (tile, tile)).astype(jnp.int32)
        lids = lt * tile + jnp.arange(tile, dtype=jnp.int32)
        iids = it * tile + jnp.arange(tile, dtype=jnp.int32)
        w = asq * (iids[None, :] < lids[:, None])
        l1 = jnp.sum(w, dtype=jnp.int32)
        q2 = jnp.clip(num2, 0, nbins - 1)
        q3 = jnp.clip(num3, 0, nbins - 1)
        l2 = jnp.sum(jnp.where(q2[:, :, None] == bins, w[:, :, None], 0),
                     axis=(0, 1), dtype=jnp.int32)
        l3 = jnp.sum(jnp.where(q3[:, :, None] == bins, w[:, :, None], 0),
                     axis=(0, 1), dtype=jnp.int32)
        return l1, l2, l3

    if ns == 1:
        return one_tile(s0)
    l1s, l2s, l3s = jax.lax.map(one_tile, s0 + jnp.arange(ns))
    return l1s.sum(axis=0), l2s.sum(axis=0), l3s.sum(axis=0)


# ----------------------------------------------------------------------
# Radial distribution function and z-profile (new capabilities required by
# BASELINE.json's observable list; the reference has no g(r))
# ----------------------------------------------------------------------

def _bincount_rows(qm: jnp.ndarray, nb: int,
                   row_block: int | None = None) -> jnp.ndarray:
    """Histogram of an integer [rows, cols] matrix over bins [0, nb) by
    compare-and-reduce — NO scatter (TPU scatter-adds serialize; the
    round-4 g(r) window cost ~7 s/gather at N=1024 x 512 chains through
    `.at[bins].add`). lax.map'd over row blocks so the [rb, cols, nb]
    broadcast-compare stays bounded even if XLA materializes it under a
    chain-vmapped caller. Values outside [0, nb) are not counted
    (callers route masked/padded entries to an out-of-range value).
    Returns f32 counts (exact: integer-valued, < 2^24)."""
    n, m = qm.shape
    rb = row_block or max(1, (1 << 21) // max(m * nb, 1))
    bins = jnp.arange(nb, dtype=qm.dtype)

    def blk(b):
        return jnp.sum(b[:, :, None] == bins, axis=(0, 1), dtype=jnp.int32)

    if n <= rb:
        return blk(qm).astype(jnp.float32)
    nblk = -(-n // rb)
    pad = nblk * rb - n
    if pad:
        qm = jnp.concatenate([qm, jnp.full((pad, m), nb, qm.dtype)])
    counts = jax.lax.map(blk, qm.reshape(nblk, rb, m))
    return counts.sum(0).astype(jnp.float32)


def radial_distribution(
    r: jnp.ndarray, cfg: SMCConfig, nbins: int = 128, rmax: float | None = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """g(r) histogram over unique pairs (x/y min-image as the system
    dictates). Returns (bin_centers, g)."""
    n = r.shape[0]
    if rmax is None:
        rmax = cfg.lj_cutoff if cfg.lj_cutoff < cfg.box_l / 2 else cfg.box_l / 2
    d = r[:, None, :] - r[None, :, :]
    dx = d[..., 0] - cfg.box_l * jnp.round(d[..., 0] / cfg.box_l)
    dy = d[..., 1] - cfg.box_l * jnp.round(d[..., 1] / cfg.box_l)
    dz = d[..., 2]
    if cfg.pbc_z:
        dz = dz - cfg.box_lz * jnp.round(dz / cfg.box_lz)
    dr = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    # Bin on the full [N, N] matrix and count bins by compare-and-reduce
    # instead of triu-gather + scatter-add: TPU scatters serialize (~7 s
    # per gather at N=1024 x 512 chains, the round-4 window-watchdog
    # fault), while the compare-reduce is a pure VPU fusion. dr is
    # bitwise symmetric (negation is exact), so masking i<j keeps the
    # counts IDENTICAL to the triu formulation; masked pairs land in the
    # dropped overflow bin nbins. Row-blocked (lax.map over row chunks)
    # so the [rows, N, nbins+1] compare temporary stays bounded under
    # chain-vmapped callers.
    q = jnp.clip((dr / rmax * nbins).astype(jnp.int32), 0, nbins)
    iu_mask = jnp.arange(n)[:, None] < jnp.arange(n)[None, :]
    qm = jnp.where(iu_mask, q, nbins)
    hist = _bincount_rows(qm, nbins + 1)[:nbins]
    edges = jnp.linspace(0.0, rmax, nbins + 1)
    centers = 0.5 * (edges[:-1] + edges[1:])
    shell = (4.0 / 3.0) * jnp.pi * (edges[1:] ** 3 - edges[:-1] ** 3)
    norm = cfg.rho * shell * n / 2.0
    return centers, hist / norm


def pressure_tensor_profile(
    r: jnp.ndarray, cfg: SMCConfig, nbins: int = 64,
    include_ideal: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Normal/tangential pressure profile P_N(z), P_T(z) across the slab
    (Harasima midpoint convention: each unique pair's virial lands in
    the bin of its midpoint z). Beyond-reference observable — the
    integrand of the wall surface tension,

        gamma_per_wall = 1/2 * integral (P_N(z) - P_T(z)) dz,

    and exactly consistent with the scalar virial by construction:
    mean_b (P_N + 2 P_T)/3 == rho T + pair_virial_pressure bit-for-bit
    up to reduction order (tests/test_observables.py pins it). The
    ideal term enters per bin as rho(z) T; the pair term uses the same
    truncated LJ force as the sampler (SMC.c:696-720 arithmetic, here
    resolved in z instead of summed). Wall-particle forces are EXTERNAL
    to the fluid and are deliberately not part of P_N — between the
    walls mechanical equilibrium reads dP_N/dz = f_wall rho, so P_N is
    constant only where the wall force vanishes (mid-slab).

    Returns (centers [nbins], P_N [nbins], P_T [nbins])."""
    from .potentials import _pair_displacements

    n = r.shape[0]
    lz = cfg.box_lz
    t = cfg.temperature
    area = cfg.box_l * cfg.box_l
    dzb = lz / nbins
    vb = area * dzb

    def row(i):
        d, dr2 = _pair_displacements(r[i], r, cfg)
        mask = (dr2 < cfg.cutoff2) & (jnp.arange(n) != i)
        safe = jnp.where(mask, dr2, jnp.ones_like(dr2))
        inv2 = 1.0 / safe
        inv6 = inv2 * inv2 * inv2
        dv = (48.0 * inv6 * inv6 - 24.0 * inv6) * inv2   # (f/r)
        tang = dv * (d[:, 0] ** 2 + d[:, 1] ** 2)        # fx dx + fy dy
        norm = dv * (d[:, 2] ** 2)                       # fz dz
        zmid = r[i, 2] - 0.5 * d[:, 2]
        if cfg.pbc_z:
            zmid = zmid - lz * jnp.round(zmid / lz)
        b = jnp.clip(((zmid / lz + 0.5) * nbins).astype(jnp.int32),
                     0, nbins - 1)
        pn = jnp.zeros((nbins,), jnp.float32).at[b].add(
            jnp.where(mask, norm, 0.0).astype(jnp.float32))
        pt = jnp.zeros((nbins,), jnp.float32).at[b].add(
            jnp.where(mask, tang, 0.0).astype(jnp.float32))
        return pn, pt

    pn, pt = jax.vmap(row)(jnp.arange(n))
    pn = 0.5 * jnp.sum(pn, axis=0)        # unique pairs
    pt = 0.5 * jnp.sum(pt, axis=0)
    centers = -lz / 2 + dzb * (jnp.arange(nbins) + 0.5)
    if not include_ideal:
        # VIRIAL-ONLY parts: ladder mode samples these and adds
        # rho(z; T') * T' after MBAR reweighting — baking cfg.temperature
        # in here would stamp the ideal term at the wrong T for every
        # non-base level (reweight.py, same pattern as the scalar P(T))
        return centers, pn / vb, pt / (2.0 * vb)
    _, rho_b = z_density_profile(r, cfg, nbins=nbins)
    ideal = rho_b * t
    return centers, ideal + pn / vb, ideal + pt / (2.0 * vb)


def structure_factor(
    r: jnp.ndarray, cfg: SMCConfig, n_kmax: int = 8
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """In-plane static structure factor S(k) on the x/y reciprocal
    lattice k = (2 pi / L) (nx, ny), 0 < |n|_inf <= n_kmax (the periodic
    axes; z is confined). S(k) = |sum_j exp(i k . r_j)|^2 / N, averaged
    over k-shells of equal |n|^2 so lattice symmetry pools correctly.

    TPU shape: the phase matrix is one [N, 2] x [2, nk] matmul, the
    shell pooling a segment_sum — no Python loops, static shapes.
    Beyond-reference (the C code has no reciprocal-space observables);
    liquid-state baseline S(k) -> 1 for an ideal gas, Bragg peaks ~N on
    a lattice."""
    ns = np.arange(-n_kmax, n_kmax + 1)
    nx, ny = np.meshgrid(ns, ns, indexing="ij")
    grid = np.stack([nx.ravel(), ny.ravel()], axis=1)
    n2 = (grid ** 2).sum(axis=1)
    # keep one of each +-k pair (S(-k) = S(k)) and drop k = 0
    keep = (n2 > 0) & ((grid[:, 0] > 0)
                       | ((grid[:, 0] == 0) & (grid[:, 1] > 0)))
    grid = grid[keep]
    n2 = n2[keep]
    shells, shell_idx = np.unique(n2, return_inverse=True)
    kvecs = jnp.asarray(grid.T, r.dtype)                   # [2, nk]
    phases = (2.0 * jnp.pi / cfg.box_l) * (r[:, :2] @ kvecs)  # [N, nk]
    s_k = (jnp.sum(jnp.cos(phases), axis=0) ** 2
           + jnp.sum(jnp.sin(phases), axis=0) ** 2) / cfg.n   # [nk]
    pooled = jnp.zeros((len(shells),), s_k.dtype).at[
        jnp.asarray(shell_idx)].add(s_k)
    counts = np.bincount(shell_idx).astype(np.float64)
    k_mag = (2.0 * np.pi / cfg.box_l) * np.sqrt(shells)
    return jnp.asarray(k_mag, r.dtype), pooled / jnp.asarray(counts, s_k.dtype)


def z_density_profile(
    r: jnp.ndarray, cfg: SMCConfig, nbins: int = 128
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Density vs wall-normal coordinate z in [-Lz/2, Lz/2]."""
    z = jnp.clip(r[:, 2], -cfg.box_lz / 2, cfg.box_lz / 2)
    b = jnp.clip(
        ((z / cfg.box_lz + 0.5) * nbins).astype(jnp.int32), 0, nbins - 1
    )
    hist = jnp.zeros((nbins,), jnp.float32).at[b].add(1.0)
    dz = cfg.box_lz / nbins
    centers = -cfg.box_lz / 2 + dz * (jnp.arange(nbins) + 0.5)
    return centers, hist / (cfg.box_l * cfg.box_l * dz)


# ----------------------------------------------------------------------
# Autocorrelation (SMC.c:1055-1122)
# ----------------------------------------------------------------------

def autocorrelation(
    trace: jnp.ndarray, k_max: int, mode: str = "reference"
) -> jnp.ndarray:
    """Normalized autocorrelation of a scalar trace, acf[0] = 1.

    mode="reference" reproduces fft_acf (SMC.c:1055-1093) exactly: de-mean,
    full-length rfft, power spectrum TRUNCATED to lfft = n//2 + n%2 bins,
    complex inverse FFT of those bins, normalize by lag 0. (That recipe is
    a half-resolution circular ACF — kept for drop-in parity.)

    mode="circular" is the standard Wiener-Khinchin circular ACF;
    mode="unbiased" zero-pads to kill wrap-around and divides by (n-k).
    """
    # Array-module polymorphic: numpy input -> host FFT. On TPU, XLA
    # lowers awkward-length FFTs (e.g. the maxsteps+1 = 1e5+1 energy
    # trace) to a dense DFT matmul — 40 GB at 1e5 points — so the
    # drivers' post-processing always passes numpy.
    xp = jnp if isinstance(trace, jax.Array) else np
    n = trace.shape[0]
    if n < 2 * k_max + 1:
        # fft_acf clamps k_max to len/2 - 2 (SMC.c:1058-1061)
        k_max = int(np.rint(n / 2)) - 2
    z = trace - xp.mean(trace)
    if mode == "reference":
        lfft = n // 2 + n % 2
        f = xp.fft.rfft(z)
        psd = (f * xp.conj(f))[:lfft]
        ch = xp.fft.ifft(psd)
        return xp.real(ch[:k_max]) / xp.real(ch[0])
    if mode == "circular":
        f = xp.fft.rfft(z)
        ch = xp.fft.irfft(f * xp.conj(f), n=n)
        return ch[:k_max] / ch[0]
    if mode == "unbiased":
        m = 2 * n
        f = xp.fft.rfft(z, n=m)
        ch = xp.fft.irfft(f * xp.conj(f), n=m)[:k_max]
        counts = n - xp.arange(k_max)
        ch = ch / counts
        return ch / ch[0]
    raise ValueError(f"unknown acf mode {mode}")


def autocorrelation_direct(trace: jnp.ndarray, k_max: int) -> jnp.ndarray:
    """Direct O(n*k) ACF matching simple_acf (SMC.c:1096-1122): lag-k sums
    over i < n - k_max - 1, divided by (n - k_max), normalized by lag 0."""
    n = trace.shape[0]
    z = trace - jnp.mean(trace)
    m = n - k_max - 1

    def one_lag(k):
        zi = jax.lax.dynamic_slice(z, (0,), (m,))
        zk = jax.lax.dynamic_slice(z, (k,), (m,))
        return jnp.sum(zi * zk) / (n - k_max)

    acf = jax.vmap(one_lag)(jnp.arange(k_max))
    return acf / acf[0]


def integrated_autocorrelation_time(acf: jnp.ndarray) -> jnp.ndarray:
    """tau = sum of the ACF, as the driver computes it (SMC.c:235)."""
    return jnp.sum(acf)


def tau_int(trace: np.ndarray, k_max: int | None = None) -> float:
    """Standard integrated autocorrelation time in sweeps:
    0.5 + sum of the normalized ACF up to its first negative lag
    (initial-positive-sequence cutoff). Shared by the figure-of-merit
    scripts (measure_tuning_gain / measure_pt_gain) and the parity
    gate's decorrelation stride (scripts/validate_parity.py).

    k_max defaults to len(trace)//3 (capped at 20k lags) so slow modes
    longer than the old fixed 500-lag window are not silently
    truncated; if the ACF never crosses zero before k_max the estimate
    is still a lower bound and a warning says so."""
    trace = np.asarray(trace, np.float64)
    if k_max is None:
        k_max = max(2, min(len(trace) // 3, 20_000))
    acf = np.asarray(autocorrelation(trace, k_max, mode="circular"))
    neg = int(np.argmax(acf < 0)) or len(acf)
    if neg == len(acf):
        import warnings

        warnings.warn(
            f"tau_int: ACF has no negative crossing within k_max={k_max} "
            f"lags (trace length {len(trace)}); the returned tau is a "
            "truncated lower bound — collect a longer trace for "
            "decorrelation-stride use", stacklevel=2)
    return float(0.5 + acf[1:neg].sum())


def variance_strided(trace: jnp.ndarray, tau: float) -> jnp.ndarray:
    """Variance over tau-strided samples (variance_corr, SMC.c:1128-1142)."""
    tauint = max(1, int(np.floor(tau)))
    sub = trace[::tauint]
    m = sub.shape[0]
    mean_all = jnp.mean(trace)
    return jnp.sum((sub - mean_all) ** 2) / (m - 1)


# ----------------------------------------------------------------------
# Summary statistics (struct Sim, SMC.c:243-256)
# ----------------------------------------------------------------------

def trace_mean_var(trace: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """mean and population variance exactly as matematicose computes them
    (variance = E[x^2] - E[x]^2, matematicose.c:97-104)."""
    m = jnp.mean(trace)
    return m, jnp.mean(trace * trace) - m * m
