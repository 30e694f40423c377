"""Pallas TPU kernel: whole Smart-MC sweep blocks with VMEM-resident state.

Why: the XLA path (sampler.sweep under vmap+scan) streams every [C, N]
intermediate through HBM — measured ~65 us per single-particle move at
C=4096, HBM-bandwidth-bound. This kernel keeps the full ensemble state in
VMEM for an entire block of sweeps: positions are DMA'd from HBM into
VMEM scratch once per chain tile, S*N moves run entirely on the VPU, and
only per-sweep statistics plus the final state touch HBM again.

Layout (TPU-first):
  * positions live as three planes X, Y, Z of shape [N_pad, C]:
    particles on SUBLANES (so the per-move row access X[i, :] is a cheap
    sublane slice), chains on LANES (128-wide vector parallelism);
  * the planes stay in HBM (`ANY` memory space); each grid program DMAs
    its [N_pad, C_TILE] column block into VMEM scratch, runs the whole
    sweep block there, and DMAs the final state back — VMEM holds ONE
    copy of the state (not pipelined in+out blocks), which is what lets
    N=4096 fit (3 x 2 MB planes + j-blocked temporaries);
  * the O(N) pair pass of each move is j-blocked over row blocks of
    <=512 sublanes so temporaries stay ~1 MB regardless of N;
  * the per-sweep cyclic offsets are scalar-prefetched so every tile
    visits particles in the same order (statistically equivalent to the
    reference's per-process rand() offset, SMC.c:290);
  * 3 Gaussians + 1 acceptance uniform per move come from the on-core
    PRNG (pltpu.prng_random_bits) through the same Box-Muller transform
    the reference uses (matematicose.c:183-193).

Physics is identical to sampler.sweep / potentials.py (cites therein):
LJ pair with x/y min-image, structured + uniform wall, Smart-MC
acceptance exp(-(dU + delta.(Fn+Fm)/2 + dW)/T) per SMC.c:326-329.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SMCConfig


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


TWO_PI = 2.0 * math.pi
U24 = float(2.0 ** -24)
ROW_BLOCK = 512  # j-block size for the pair pass (bounds VMEM temps)


def _reference_noise(flat_pad: int, c_tile: int, sqrt2a: float):
    """Bug-compatible proposal noise plane (matematicose.c:187-192).

    The reference fills the flat displ[3N] vector in PAIRS
        d[2k]   = sig*sqrt(-2 ln(1-u1)) cos(2 pi u2)
        d[2k+1] = sig*sqrt(-2 ln(1-u2)) sin(2 pi u1)
    so consecutive components share uniforms (marginally normal, pairwise
    DEPENDENT — docs/DEVIATIONS.md F0). Returns a [flat_pad, c_tile] f32
    noise plane in flat particle order (read per-move by particle id like
    displ[3n], SMC.c:309). Must run inside a pallas kernel after
    pltpu.prng_seed.
    """
    v1 = _uniforms((flat_pad, c_tile))
    v2 = _uniforms((flat_pad, c_tile))
    # Row 2k+1 must reuse row 2k's uniforms: pull the previous row into
    # odd rows via a circular shift down the sublanes.
    jodd = jax.lax.broadcasted_iota(jnp.int32, (flat_pad, c_tile), 0) % 2
    u1 = jnp.where(jodd == 0, v1, pltpu.roll(v1, 1, 0))
    u2 = jnp.where(jodd == 0, v2, pltpu.roll(v2, 1, 0))
    r_bm = jnp.sqrt(-2.0 * jnp.log1p(-jnp.where(jodd == 0, u1, u2))) * sqrt2a
    return r_bm * jnp.where(jodd == 0, jnp.cos(TWO_PI * u2),
                            jnp.sin(TWO_PI * u1))


def debug_reference_noise(flat_pad: int, c_tile: int, sqrt2a: float,
                          seed: int) -> jax.Array:
    """Test-only: dump one reference-noise plane from the on-core PRNG so
    its statistics can be validated on hardware (tests/test_pallas.py)."""

    def kernel(seed_ref, o_ref):
        pltpu.prng_seed(seed_ref[0])
        o_ref[:] = _reference_noise(flat_pad, c_tile, sqrt2a)

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=jax.ShapeDtypeStruct((flat_pad, c_tile), jnp.float32),
    )(jnp.asarray([seed], jnp.int32))


def _uniforms(shape):
    """Uniforms in (0, 1): 24 high bits of the PRNG, offset by 2^-25.

    prng_random_bits yields SIGNED int32 on hardware — bitcast to uint32
    before shifting or half the draws go negative; Mosaic lacks a
    uint32->f32 cast, so bitcast back after the shift (value < 2^24).
    """
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    hi24 = pltpu.bitcast(bits >> 8, jnp.int32)
    return hi24.astype(jnp.float32) * U24 + float(2.0 ** -25)


def _shared_closures(cfg: SMCConfig, c_tile: int):
    """Physics closures shared by the VMEM-resident kernel
    (`_make_kernel`) and the HBM-streamed kernel (`_make_stream_kernel`).

    The emitted op sequence is EXACTLY the round-2 kernel's — this factory
    exists so the streamed kernel reuses the same pair/wall math without
    duplicating it, and the persistent compile cache stays valid for every
    existing variant (verified by jaxpr fingerprint at extraction time)."""
    n = cfg.n
    cut2 = float(cfg.cutoff2)
    box_l = float(cfg.box_l)
    box_lz = float(cfg.box_lz)
    contact = float(cfg.contact_dz)
    a0 = float(cfg.a0)
    b0 = float(cfg.b0)
    mm = cfg.m * cfg.m
    pbc_z = cfg.pbc_z
    s_pad = _round_up(mm, 8)  # wall sites vectorized onto sublanes

    def _block_terms(xi, yi, zi, x, y, z, i=None, j0=0, rb=None,
                     idmask=None):
        """LJ terms of one row block against a [1, C] query.

        x/y are PRE-SCALED by 1/L (planes are stored that way inside this
        kernel): the min-image wrap is then one round+sub, and the box
        scale folds into dr2 (one fma) and the per-pass force scale.

        Walls configs (z unwrapped): parked/pad rows (1e15) give
        dr2 ~ 1e30 through the z term — they fail the cutoff test and
        their inv6 underflows to exactly 0, so one `dr2 < cut2` compare
        (via the single inv2 select below) is the entire mask (the
        caller parks the moving particle's own row).

        Bulk configs (pbc_z): EVERY coordinate wraps, so an out-of-range
        park value would wrap back into the box (scaled x/y wrap to
        exactly 0) — parking cannot exclude rows. The self/pad exclusion
        is done by explicit row-id masking instead (the reference bulk
        system is tiny; the extra compares are irrelevant there).

        idmask (None => pbc_z): the HBM-streamed kernel cannot park the
        moving row (that would cost an extra HBM round-trip per move), so
        it forces the row-id mask even with walls; pads still drop out
        through the cutoff there, so only `!= i` is needed."""
        dx = xi - x
        dx = dx - jnp.round(dx)
        dy = yi - y
        dy = dy - jnp.round(dy)
        dz = zi - z
        if pbc_z:
            dz = dz - box_lz * jnp.round(dz * (1.0 / box_lz))
        dr2 = (dx * dx + dy * dy) * (box_l * box_l) + dz * dz
        mask = dr2 < cut2
        if pbc_z if idmask is None else idmask:
            row_ids = j0 + jax.lax.broadcasted_iota(
                jnp.int32, (rb, c_tile), 0)
            mask = mask & (row_ids != i)
            if pbc_z:
                mask = mask & (row_ids < n)
        # guard exact-coincidence only (inf would poison the accept math);
        # hardware-approximate reciprocal + one Newton step reaches full
        # f32 precision in fewer VPU ops than the exact divide
        m = jnp.maximum(dr2, 1e-12)
        r0 = pl.reciprocal(m, approx=True)
        # the SINGLE select of the pass: masked inv2 = 0 makes inv6/inv12/
        # u_term/dv exact zeros downstream with no further where ops
        inv2 = jnp.where(mask, r0 * (2.0 - m * r0), 0.0)
        inv6 = inv2 * inv2 * inv2
        inv12 = inv6 * inv6
        u_term = inv12 - inv6
        u = jnp.sum(u_term, axis=0, keepdims=True)
        # dV = (48 inv12 - 24 inv6) inv2 = 24 inv2 (inv12 + u_term);
        # the 24x (and u's 4x) scale is applied once per pass by the caller
        dv = (inv12 + u_term) * inv2
        fx = jnp.sum(dv * dx, axis=0, keepdims=True)
        fy = jnp.sum(dv * dy, axis=0, keepdims=True)
        fz = jnp.sum(dv * dz, axis=0, keepdims=True)
        return u, fx, fy, fz

    def wall_terms(xi, yi, zi, wa_col, wb_col, sxc, syc):
        """Uniform + grid wall energy/force at [1, C] positions
        (semantics of SMC.c:729-813; see potentials.wall_energy_force_single).

        The M^2 grid sites are processed as SUBLANES of one [s_pad, C]
        tile instead of an unrolled per-site scalar loop: ~2x fewer
        vector instructions per evaluation (the fixed per-move cost that
        dominates at small N). wa_col/wb_col/sxc/syc are [s_pad, C]
        per-site planes; pad sites carry zero coefficients so they
        contribute exactly 0."""
        dz = zi + box_lz / 2.0
        dz = dz - box_lz * jnp.round(dz * (1.0 / box_lz))
        dz = jnp.where(zi <= -box_lz / 2.0, contact,
                       jnp.where(zi >= box_lz / 2.0, -contact, dz))
        dz2 = dz * dz
        r0z = pl.reciprocal(dz2, approx=True)
        iz2 = r0z * (2.0 - dz2 * r0z)  # Newton: full f32 precision
        iz6 = iz2 * iz2 * iz2
        iz12 = iz6 * iz6
        u0 = a0 * iz12 - b0 * iz6
        fz0 = (48.0 * a0 * iz12 - 24.0 * b0 * iz6) * iz2 * dz

        # grid sites, all at once on [s_pad, C]
        dxm = xi - sxc
        dxm = dxm - box_l * jnp.round(dxm * (1.0 / box_l))
        dym = yi - syc
        dym = dym - box_l * jnp.round(dym * (1.0 / box_l))
        dr2 = dxm * dxm + dym * dym + dz2
        msk = dr2 < cut2
        m2 = jnp.maximum(dr2, 1e-12)
        r02 = pl.reciprocal(m2, approx=True)
        inv2 = r02 * (2.0 - m2 * r02)
        inv6 = inv2 * inv2 * inv2
        inv12 = inv6 * inv6
        us = jnp.where(msk, wa_col * inv12 - wb_col * inv6, 0.0)
        dv = jnp.where(
            msk, (48.0 * wa_col * inv12 - 24.0 * wb_col * inv6) * inv2, 0.0)
        u = u0 + jnp.sum(us, axis=0, keepdims=True)
        fx = jnp.sum(dv * dxm, axis=0, keepdims=True)
        fy = jnp.sum(dv * dym, axis=0, keepdims=True)
        fz = fz0 + jnp.sum(dv, axis=0, keepdims=True) * dz
        return 4.0 * u, fx, fy, fz

    return _block_terms, wall_terms, s_pad


def _make_kernel(cfg: SMCConfig, n_pad: int, c_tile: int, n_sweeps: int,
                 a: float, zskip: bool = False, row_block: int | None = None,
                 per_chain_at: bool = False, xslices: int = 0):
    """per_chain_at: the proposal mobility A and temperature T are
    PER-CHAIN [1, C] input rows instead of compile-time scalars — one
    kernel compile covers a whole temperature ladder (tsweep/pt) AND its
    thermalization (A-doubling changes row values, not the program).

    xslices > 1: the 2-D (z-band, x-slice) refinement of the zskip
    engine (VERDICT r4 #4). Rows arrive sorted by z-BAND (groups of
    `xslices` consecutive row blocks) and by x WITHIN each band; blocks
    then carry live scalar x bounds next to the z bounds, and a pair
    pass visits only the blocks whose (z, x) bounds can reach the
    moving particle's windows. x is periodic, so slice admission runs
    in a doubled index space (a circular interval is one linear
    interval there); the run is clamped to `xslices` entries so no
    block is ever processed twice. Admission stays conservative —
    linear min/max x bounds are a superset of the true circular arc,
    the x window is widened by cutx*(1+1e-6) — so skips land only on
    provably-zero contributions and the result is BITWISE the no-skip
    kernel on the same row order (test_pallas pins this), exactly like
    the 1-D zskip contract."""
    n = cfg.n
    reference_noise = cfg.reference_noise
    flat_pad = _round_up(3 * n, 8)  # reference-noise scratch rows
    t = float(cfg.temperature)
    a = float(a)
    sqrt2a = math.sqrt(2.0 * a)
    cutoff = float(cfg.lj_cutoff)
    box_l = float(cfg.box_l)
    box_lz = float(cfg.box_lz)
    mm = cfg.m * cfg.m
    dw = box_l / cfg.m
    use_walls = cfg.use_walls
    pbc_z = cfg.pbc_z
    row_block = min(n_pad, row_block or ROW_BLOCK)
    n_blocks = n_pad // row_block if n_pad % row_block == 0 else \
        n_pad // row_block + 1
    if zskip and pbc_z:
        raise NotImplementedError("zskip assumes walls (no z wrap)")
    if xslices > 1:
        if not zskip:
            raise NotImplementedError("xslices refines the zskip engine")
        if n_blocks % xslices:
            raise ValueError(f"xslices {xslices} must divide the "
                             f"{n_blocks} row blocks")
        if reference_noise:
            # reference_noise is indexed by particle id = row, and the
            # A8 refusal already excludes re-sorted move orders from
            # the bug-compatible contract
            raise NotImplementedError("xslices requires i.i.d. noise")
    # conservative x window in SCALED units (+1e-6: the admission test
    # must never round tighter than the pair pass's own f32 cutoff)
    cutx = (cutoff / box_l) * (1.0 + 1e-6)
    n_bands = n_blocks // xslices if xslices > 1 else 0
    _block_terms, wall_terms, s_pad = _shared_closures(cfg, c_tile)

    def pair_terms(xi, yi, zi, xs, ys, zs, i=None):
        """U and F on a [1, C] query vs all rows, statically j-blocked."""
        u = jnp.zeros((1, c_tile), jnp.float32)
        fx = jnp.zeros((1, c_tile), jnp.float32)
        fy = jnp.zeros((1, c_tile), jnp.float32)
        fz = jnp.zeros((1, c_tile), jnp.float32)
        for b in range(n_blocks):
            j0 = b * row_block
            rb = min(row_block, n_pad - j0)
            du, dfx, dfy, dfz = _block_terms(
                xi, yi, zi, xs[j0:j0 + rb, :], ys[j0:j0 + rb, :],
                zs[j0:j0 + rb, :], i=i, j0=j0, rb=rb)
            u, fx, fy, fz = u + du, fx + dfx, fy + dfy, fz + dfz
        return (4.0 * u, (24.0 * box_l) * fx, (24.0 * box_l) * fy,
                24.0 * fz)

    def pair_terms_zskip(xi, yi, zi, xs, ys, zs, zlo, zhi, sbmin, sbmax):
        """zskip pair pass: rows are z-SORTED per chain; sbmin/sbmax are
        LIVE scalar per-block z bounds (SMEM). Only the contiguous block
        envelope that can overlap [zlo - cut, zhi + cut] is processed by
        a dynamic-bounds fori_loop — blocks outside contribute provably
        zero, so skipping is bitwise exact (tested). Scalar bounds (not
        per-lane) keep the skip decision off the VPU: the per-block
        search runs on the scalar unit with no vector->scalar syncs."""
        lo_t = zlo - cutoff
        hi_t = zhi + cutoff

        def scan_blocks(b, carry):
            b_lo, b_hi = carry
            need = (sbmin[b] <= hi_t) & (sbmax[b] >= lo_t)
            b_lo = jnp.where(need, jnp.minimum(b_lo, b), b_lo)
            b_hi = jnp.where(need, jnp.maximum(b_hi, b + 1), b_hi)
            return b_lo, b_hi

        b_lo, b_hi = jax.lax.fori_loop(
            0, n_blocks, scan_blocks,
            (jnp.int32(n_blocks), jnp.int32(0)))

        def block_body(b, acc):
            u, fx, fy, fz = acc
            j0 = b * row_block
            du, dfx, dfy, dfz = _block_terms(
                xi, yi, zi,
                xs[pl.ds(j0, row_block), :],
                ys[pl.ds(j0, row_block), :],
                zs[pl.ds(j0, row_block), :])
            return u + du, fx + dfx, fy + dfy, fz + dfz

        zero = jnp.zeros((1, c_tile), jnp.float32)
        u, fx, fy, fz = jax.lax.fori_loop(
            b_lo, b_hi, block_body, (zero, zero, zero, zero))
        return (4.0 * u, (24.0 * box_l) * fx, (24.0 * box_l) * fy,
                24.0 * fz)

    def pair_terms_2d(xi, yi, zi, xs, ys, zs, zlo, zhi, xqlo, xqhi,
                      sbmin, sbmax, sxmin, sxmax):
        """2-D refined pair pass (xslices > 1): bands admitted by the z
        window exactly like pair_terms_zskip's block scan, then within
        each admitted band only the x-slices whose live bounds overlap
        the (circular) x window are processed. All decisions run on the
        scalar unit against SMEM bounds — no vector->scalar syncs beyond
        the ones the zskip proposal pass already pays."""
        lo_t = zlo - cutoff
        hi_t = zhi + cutoff
        # normalize the x window into the doubled slice space
        # [-0.5, 1.5): wrap its lower edge into [-0.5, 0.5), clamp the
        # width at one full period (expansions can exceed it)
        xw = jnp.minimum(xqhi - xqlo + 2.0 * cutx, 1.0)
        xw_lo = xqlo - cutx
        xw_lo = xw_lo - jnp.floor(xw_lo + 0.5)
        xw_hi = xw_lo + xw

        # contiguous band envelope from the z window (bands are
        # z-ordered; their blocks are x-ordered and share the band's z
        # range, so band need = any of its blocks' z-need)
        def band_scan(bd, carry):
            bd_lo, bd_hi = carry

            def blk(i, f):
                b = bd * xslices + i
                return f | ((sbmin[b] <= hi_t) & (sbmax[b] >= lo_t))

            need = jax.lax.fori_loop(0, xslices, blk, False)
            bd_lo = jnp.where(need, jnp.minimum(bd_lo, bd), bd_lo)
            bd_hi = jnp.where(need, jnp.maximum(bd_hi, bd + 1), bd_hi)
            return bd_lo, bd_hi

        bd_lo, bd_hi = jax.lax.fori_loop(
            0, n_bands, band_scan, (jnp.int32(n_bands), jnp.int32(0)))

        zero = jnp.zeros((1, c_tile), jnp.float32)

        def band_body(bd, acc):
            # admitted x-slice run in DOUBLED index space: each slice s
            # appears at s (shift 0) and s + xslices (shift +1), so any
            # circular window is one linear interval; the envelope is
            # clamped to xslices entries, which covers every admitted
            # residue exactly once
            def xscan(s, carry):
                s_lo, s_hi = carry
                b = bd * xslices + jnp.where(
                    s >= xslices, s - xslices, s)
                shift = jnp.where(s >= xslices, 1.0, 0.0)
                need = ((sxmin[b] + shift <= xw_hi)
                        & (sxmax[b] + shift >= xw_lo))
                s_lo = jnp.where(need, jnp.minimum(s_lo, s), s_lo)
                s_hi = jnp.where(need, jnp.maximum(s_hi, s + 1), s_hi)
                return s_lo, s_hi

            s_lo, s_hi = jax.lax.fori_loop(
                0, 2 * xslices, xscan,
                (jnp.int32(2 * xslices), jnp.int32(0)))
            s_hi = jnp.minimum(s_hi, s_lo + xslices)

            def slice_body(s, acc):
                u, fx, fy, fz = acc
                b = bd * xslices + jnp.where(
                    s >= xslices, s - xslices, s)
                j0 = b * row_block
                du, dfx, dfy, dfz = _block_terms(
                    xi, yi, zi,
                    xs[pl.ds(j0, row_block), :],
                    ys[pl.ds(j0, row_block), :],
                    zs[pl.ds(j0, row_block), :])
                return u + du, fx + dfx, fy + dfy, fz + dfz

            return jax.lax.fori_loop(s_lo, s_hi, slice_body, acc)

        u, fx, fy, fz = jax.lax.fori_loop(
            bd_lo, bd_hi, band_body, (zero, zero, zero, zero))
        return (4.0 * u, (24.0 * box_l) * fx, (24.0 * box_l) * fy,
                24.0 * fz)

    def kernel(offsets_ref, seeds_ref, *refs):
        refs = list(refs)
        # inputs
        x_hbm, y_hbm, z_hbm, e_ref, wa_ref, wb_ref = refs[:6]
        k = 6
        if per_chain_at:
            ac_ref, it_ref = refs[k:k + 2]   # [1, C] A and 1/T rows
            k += 2
        # outputs, then scratch
        xo_hbm, yo_hbm, zo_hbm, eo_ref, et_ref, at_ref = refs[k:k + 6]
        xs, ys, zs, *rest = refs[k + 6:]
        ns = rest.pop(0) if reference_noise else None
        if zskip:
            sbmin, sbmax = rest.pop(0), rest.pop(0)  # SMEM scalar bounds
        if xslices > 1:
            sxmin, sxmax = rest.pop(0), rest.pop(0)  # SMEM x bounds
        (sems,) = rest
        g = pl.program_id(0)
        col = pl.ds(g * c_tile, c_tile)

        # Stream this tile's chain columns HBM -> VMEM once.
        cps = [
            pltpu.make_async_copy(x_hbm.at[:, col], xs, sems.at[0]),
            pltpu.make_async_copy(y_hbm.at[:, col], ys, sems.at[1]),
            pltpu.make_async_copy(z_hbm.at[:, col], zs, sems.at[2]),
        ]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()

        # Wall site planes are loop-invariant: coefficients come in as
        # [s_pad, c_tile] inputs; site coordinates are iota-derived
        # compile-time constants (pad sites parked at 1e15 with zero
        # coefficients).
        wa_cols = wa_ref[:, :]
        wb_cols = wb_ref[:, :]
        m_ids = jax.lax.broadcasted_iota(jnp.int32, (s_pad, c_tile), 0)
        sxc = jnp.where(m_ids < mm,
                        (m_ids // cfg.m).astype(jnp.float32) * dw, 1e15)
        syc = jnp.where(m_ids < mm,
                        (m_ids % cfg.m).astype(jnp.float32) * dw, 1e15)

        # Proposal/acceptance scales: compile-time scalars in the default
        # mode; loop-invariant [1, C] rows in per_chain_at mode (scalar
        # mode keeps the exact `.../t` divide for bitwise continuity).
        # !! The (A, T) scale setup and the whole move/accept body below
        # are MIRRORED in _make_stream_kernel — their bitwise agreement
        # is the engine-switch contract (test_hbm_stream_* pin it).
        # Any change here must be applied there too; a shared-closure
        # refactor is deliberately deferred (it would re-trace every
        # cached Mosaic variant).
        if per_chain_at:
            a_c = ac_ref[:, :]
            inv_t = it_ref[:, :]
            a_t = a_c * inv_t            # A/T   (SMC.c:307)
            a_4t = 0.25 * a_c * inv_t    # A/4T  (SMC.c:326)
            s2a = jnp.sqrt(2.0 * a_c)    # Box-Muller sigma
            scale_logap = (lambda v: v * inv_t)
        else:
            a_t = a / t
            a_4t = a / (4.0 * t)
            s2a = sqrt2a
            scale_logap = (lambda v: v / t)

        def one_sweep(s, e):
            # Per-SWEEP PRNG stream: two 31-bit words derived (upstream)
            # from the chain key folded with the ABSOLUTE sweep counter,
            # with the tile id mixed into the second word. Re-seeding per
            # sweep makes trajectories bitwise independent of how a run is
            # chunked into device calls (ADVICE r1) and keeps block
            # streams collision-free (a single masked word collides by
            # the birthday bound past ~46k blocks; Mosaic caps prng_seed
            # at 2 words, so the tile id folds in multiplicatively).
            pltpu.prng_seed(seeds_ref[s, 0],
                            seeds_ref[s, 1] ^ (g * jnp.int32(0x27D4EB2F)))
            offset = offsets_ref[s]
            acc_count = jnp.zeros((1, c_tile), jnp.float32)

            if reference_noise:
                # Once per sweep, read back per-move by particle id.
                ns[:] = _reference_noise(flat_pad, c_tile, s2a)

            if zskip:
                # Exact per-block SCALAR z bounds at sweep start; they
                # only EXPAND during the sweep (by every proposal's z
                # range at its block), so block-skip decisions stay
                # provably safe for the whole sweep.
                for b in range(n_blocks):
                    j0 = b * row_block
                    rb = min(row_block, n_pad - j0)
                    zb = zs[j0:j0 + rb, :]
                    real = zb < 1e14  # pad rows park at 1e15
                    sbmin[b] = jnp.min(jnp.where(real, zb, 1e15))
                    sbmax[b] = jnp.max(jnp.where(real, zb, -1e15))
                    if xslices > 1:
                        xb = xs[j0:j0 + rb, :]
                        sxmin[b] = jnp.min(jnp.where(real, xb, 1e15))
                        sxmax[b] = jnp.max(jnp.where(real, xb, -1e15))

            def move(nn, carry):
                e, acc_count = carry
                i = (nn + offset) % n
                xi = xs[pl.ds(i, 1), :]
                yi = ys[pl.ds(i, 1), :]
                zi = zs[pl.ds(i, 1), :]

                if not pbc_z:
                    # Park the moving particle's row out of every cutoff
                    # (through the unwrapped z term) so both pair passes
                    # skip it without id masks (see _block_terms); the
                    # row is rewritten on accept/reject. In pbc_z mode
                    # parking cannot work (everything wraps) and
                    # _block_terms id-masks instead.
                    parked = jnp.full((1, c_tile), 1e15, jnp.float32)
                    xs[pl.ds(i, 1), :] = parked
                    ys[pl.ds(i, 1), :] = parked
                    zs[pl.ds(i, 1), :] = parked

                if xslices > 1:
                    # same argument as zskip, for both axes: row i's
                    # current position lies within block ib's live
                    # (z, x) bounds
                    ib = i // row_block
                    um, fmx, fmy, fmz = pair_terms_2d(
                        xi, yi, zi, xs, ys, zs,
                        sbmin[ib], sbmax[ib], sxmin[ib], sxmax[ib],
                        sbmin, sbmax, sxmin, sxmax)
                elif zskip:
                    # row i was in block ib at sort time and every later
                    # write expanded that block's bounds, so its current
                    # z lies within the live scalar bounds of block ib
                    ib = i // row_block
                    um, fmx, fmy, fmz = pair_terms_zskip(
                        xi, yi, zi, xs, ys, zs,
                        sbmin[ib], sbmax[ib], sbmin, sbmax)
                else:
                    um, fmx, fmy, fmz = pair_terms(xi, yi, zi, xs, ys, zs,
                                                   i=i)
                if use_walls:
                    # wall sites live in real units; x/y queries are scaled
                    uw, wx, wy, wz = wall_terms(
                        xi * box_l, yi * box_l, zi, wa_cols, wb_cols,
                        sxc, syc)
                    um += uw
                    fmx += wx
                    fmy += wy
                    fmz += wz

                if reference_noise:
                    # displ[3n..3n+2] by particle id (SMC.c:309)
                    g1 = ns[pl.ds(3 * i, 1), :]
                    g2 = ns[pl.ds(3 * i + 1, 1), :]
                    g3 = ns[pl.ds(3 * i + 2, 1), :]
                    u_acc = _uniforms((8, c_tile))[0:1]
                else:
                    # 3 Gaussians (Box-Muller, sigma = sqrt(2A)) + 1 uniform
                    u = _uniforms((8, c_tile))
                    r1 = jnp.sqrt(-2.0 * jnp.log(u[0:1])) * s2a
                    g1 = r1 * jnp.cos(TWO_PI * u[1:2])
                    g2 = r1 * jnp.sin(TWO_PI * u[1:2])
                    g3 = jnp.sqrt(-2.0 * jnp.log(u[2:3])) * s2a * \
                        jnp.cos(TWO_PI * u[3:4])
                    u_acc = u[4:5]

                ddx = fmx * a_t + g1
                ddy = fmy * a_t + g2
                ddz = fmz * a_t + g3
                # proposal in scaled x/y space: wrap is round+sub
                px = xi + ddx * (1.0 / box_l)
                px = px - jnp.round(px)
                py = yi + ddy * (1.0 / box_l)
                py = py - jnp.round(py)
                pz = zi + ddz
                if pbc_z:
                    pz = pz - box_lz * jnp.round(pz * (1.0 / box_lz))

                if xslices > 1:
                    pz_lo = jnp.min(pz)
                    pz_hi = jnp.max(pz)
                    # linear min/max over lanes is a CONSERVATIVE
                    # superset of the circular x arc (wide near the
                    # seam, never tight)
                    px_lo = jnp.min(px)
                    px_hi = jnp.max(px)
                    un, fnx, fny, fnz = pair_terms_2d(
                        px, py, pz, xs, ys, zs, pz_lo, pz_hi,
                        px_lo, px_hi, sbmin, sbmax, sxmin, sxmax)
                elif zskip:
                    pz_lo = jnp.min(pz)
                    pz_hi = jnp.max(pz)
                    un, fnx, fny, fnz = pair_terms_zskip(
                        px, py, pz, xs, ys, zs, pz_lo, pz_hi, sbmin, sbmax)
                else:
                    un, fnx, fny, fnz = pair_terms(px, py, pz, xs, ys, zs,
                                                   i=i)
                if use_walls:
                    uw, wx, wy, wz = wall_terms(
                        px * box_l, py * box_l, pz, wa_cols, wb_cols,
                        sxc, syc)
                    un += uw
                    fnx += wx
                    fny += wy
                    fnz += wz

                dfx = fnx - fmx
                dfy = fny - fmy
                dfz = fnz - fmz
                dw_term = (dfx * dfx + dfy * dfy + dfz * dfz
                           + 2.0 * (dfx * fmx + dfy * fmy + dfz * fmz)) \
                    * a_4t
                log_ap = scale_logap(
                    -(un - um
                      + 0.5 * (ddx * (fnx + fmx) + ddy * (fny + fmy)
                               + ddz * (fnz + fmz))
                      + dw_term))
                accept = (u_acc < jnp.exp(jnp.minimum(log_ap, 0.0))) \
                    | (log_ap >= 0.0)

                xs[pl.ds(i, 1), :] = jnp.where(accept, px, xi)
                ys[pl.ds(i, 1), :] = jnp.where(accept, py, yi)
                zs[pl.ds(i, 1), :] = jnp.where(accept, pz, zi)
                if zskip:
                    # expand block ib's bounds by the proposal's z range
                    # (covers the written value whether accepted or not;
                    # bounds never shrink mid-sweep, so earlier skip
                    # decisions stay valid)
                    sbmin[ib] = jnp.minimum(sbmin[ib], pz_lo)
                    sbmax[ib] = jnp.maximum(sbmax[ib], pz_hi)
                if xslices > 1:
                    # same for x; a seam-wrapping write blows the linear
                    # interval wide, which is loose but safe
                    sxmin[ib] = jnp.minimum(sxmin[ib], px_lo)
                    sxmax[ib] = jnp.maximum(sxmax[ib], px_hi)
                e = e + jnp.where(accept, un - um, 0.0)
                acc_count = acc_count + accept.astype(jnp.float32)
                return e, acc_count

            e, acc_count = jax.lax.fori_loop(
                0, n, move, (e, acc_count))
            et_ref[pl.ds(s, 1), :] = e
            at_ref[pl.ds(s, 1), :] = acc_count.astype(jnp.int32)
            return e

        e = jax.lax.fori_loop(0, n_sweeps, one_sweep, e_ref[:])
        eo_ref[:] = e

        # Final state VMEM -> HBM.
        cps = [
            pltpu.make_async_copy(xs, xo_hbm.at[:, col], sems.at[0]),
            pltpu.make_async_copy(ys, yo_hbm.at[:, col], sems.at[1]),
            pltpu.make_async_copy(zs, zo_hbm.at[:, col], sems.at[2]),
        ]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()

    return kernel


def _make_stream_kernel(cfg: SMCConfig, n_pad: int, c_tile: int,
                        n_sweeps: int, a: float, row_block: int,
                        per_chain_at: bool = False):
    """HBM-resident variant of the z-sorted sweep kernel (N beyond VMEM).

    The VMEM-resident kernel tops out near N~10k: the three [N_pad, C_TILE]
    position planes alone exhaust the ~16 MB VMEM (docs/PERF_NOTES.md).
    Here the planes STAY in HBM (aliased in-place via input_output_aliases)
    and each pair pass streams only the j-blocks inside the moving
    particle's z envelope through a pair of double-buffered VMEM block
    buffers — block b+1's DMA rides under block b's compute. Everything
    else (physics, RNG schedule, acceptance, traces, per-chain (A,T)
    ladder rows) is the VMEM kernel's, via the shared closures, so
    trajectories are BITWISE identical to the zskip kernel at the same
    row_block (the only mechanical differences — id-masking instead of
    row parking, call-start instead of sweep-start block bounds — change
    which exact zeros are summed, not any summed value; test_pallas pins
    this).

    Requirements: z-sorted rows (ensemble_sweeps_zsorted orders them),
    walls (no pbc_z — zskip geometry), no reference_noise (its [3N, C]
    noise plane is exactly the VMEM footprint this kernel removes), and
    n_pad % row_block == 0.

    Reference analog: none — SMC.c:575-608 is the O(N^2) pass this
    engine's envelope-skipping beats; the reference cannot reach these N.
    """
    n = cfg.n
    if cfg.reference_noise:
        raise NotImplementedError("hbm_stream: reference_noise plane "
                                  "would defeat the VMEM savings")
    if cfg.pbc_z:
        raise NotImplementedError("hbm_stream assumes walls (zskip)")
    assert n_pad % row_block == 0, (n_pad, row_block)
    t = float(cfg.temperature)
    a = float(a)
    sqrt2a = math.sqrt(2.0 * a)
    cutoff = float(cfg.lj_cutoff)
    box_l = float(cfg.box_l)
    mm = cfg.m * cfg.m
    dw = box_l / cfg.m
    use_walls = cfg.use_walls
    n_blocks = n_pad // row_block
    _block_terms, wall_terms, s_pad = _shared_closures(cfg, c_tile)

    def kernel(offsets_ref, seeds_ref, sbmin0_ref, sbmax0_ref, *refs):
        refs = list(refs)
        x_hbm, y_hbm, z_hbm, e_ref, wa_ref, wb_ref = refs[:6]
        k = 6
        if per_chain_at:
            ac_ref, it_ref = refs[k:k + 2]   # [1, C] A and 1/T rows
            k += 2
        # outputs (planes aliased onto the inputs — the kernel reads AND
        # writes state through the output refs), then scratch
        xo_hbm, yo_hbm, zo_hbm, eo_ref, et_ref, at_ref = refs[k:k + 6]
        (xb0, yb0, zb0, xb1, yb1, zb1, qx, qy, qz,
         sbmin, sbmax, rsem0, rsem1, qsem) = refs[k + 6:]
        g = pl.program_id(0)
        col = pl.ds(g * c_tile, c_tile)

        # This tile's call-start exact block bounds -> live SMEM copies
        # (they only EXPAND during the call, by every proposal's z range
        # at its block, so skip decisions stay provably safe call-long).
        def initb(b, _):
            sbmin[b] = sbmin0_ref[g, b]
            sbmax[b] = sbmax0_ref[g, b]
            return 0

        jax.lax.fori_loop(0, n_blocks, initb, 0)

        # Wall site planes: identical to the VMEM kernel.
        wa_cols = wa_ref[:, :]
        wb_cols = wb_ref[:, :]
        m_ids = jax.lax.broadcasted_iota(jnp.int32, (s_pad, c_tile), 0)
        sxc = jnp.where(m_ids < mm,
                        (m_ids // cfg.m).astype(jnp.float32) * dw, 1e15)
        syc = jnp.where(m_ids < mm,
                        (m_ids % cfg.m).astype(jnp.float32) * dw, 1e15)

        # !! Mirrored from _make_kernel (see the warning there): the
        # (A, T) scales and the move/accept body must stay op-for-op
        # identical or the bitwise streamed==resident contract breaks.
        if per_chain_at:
            a_c = ac_ref[:, :]
            inv_t = it_ref[:, :]
            a_t = a_c * inv_t            # A/T   (SMC.c:307)
            a_4t = 0.25 * a_c * inv_t    # A/4T  (SMC.c:326)
            s2a = jnp.sqrt(2.0 * a_c)    # Box-Muller sigma
            scale_logap = (lambda v: v * inv_t)
        else:
            a_t = a / t
            a_4t = a / (4.0 * t)
            s2a = sqrt2a
            scale_logap = (lambda v: v / t)

        def _start_block(b, xd, yd, zd, sems):
            j0 = b * row_block
            rows = pl.ds(j0, row_block)
            pltpu.make_async_copy(xo_hbm.at[rows, col], xd, sems.at[0]).start()
            pltpu.make_async_copy(yo_hbm.at[rows, col], yd, sems.at[1]).start()
            pltpu.make_async_copy(zo_hbm.at[rows, col], zd, sems.at[2]).start()

        def _wait_block(b, xd, yd, zd, sems):
            j0 = b * row_block
            rows = pl.ds(j0, row_block)
            pltpu.make_async_copy(xo_hbm.at[rows, col], xd, sems.at[0]).wait()
            pltpu.make_async_copy(yo_hbm.at[rows, col], yd, sems.at[1]).wait()
            pltpu.make_async_copy(zo_hbm.at[rows, col], zd, sems.at[2]).wait()

        def stream_pair_terms(i, xi, yi, zi, zlo, zhi):
            """Pair pass streaming only the blocks whose live z bounds can
            overlap [zlo - cut, zhi + cut]; double-buffered so block b+1's
            HBM->VMEM copy rides under block b's compute. Two statically
            addressed buffer sets (a dynamic slot index would force
            dynamic sublane addressing on every compute access — the 2.5x
            penalty measured in docs/PERF_NOTES.md), hence the pairwise
            loop with a masked odd tail."""
            lo_t = zlo - cutoff
            hi_t = zhi + cutoff

            def scan_blocks(b, carry):
                b_lo, b_hi = carry
                need = (sbmin[b] <= hi_t) & (sbmax[b] >= lo_t)
                b_lo = jnp.where(need, jnp.minimum(b_lo, b), b_lo)
                b_hi = jnp.where(need, jnp.maximum(b_hi, b + 1), b_hi)
                return b_lo, b_hi

            b_lo, b_hi = jax.lax.fori_loop(
                0, n_blocks, scan_blocks,
                (jnp.int32(n_blocks), jnp.int32(0)))

            @pl.when(b_lo < b_hi)
            def _():
                _start_block(b_lo, xb0, yb0, zb0, rsem0)

            def pair_body(p, acc):
                u, fx, fy, fz = acc
                b0 = b_lo + 2 * p
                b1 = b0 + 1

                @pl.when(b1 < b_hi)
                def _():
                    _start_block(b1, xb1, yb1, zb1, rsem1)

                _wait_block(b0, xb0, yb0, zb0, rsem0)
                du, dfx, dfy, dfz = _block_terms(
                    xi, yi, zi, xb0[:], yb0[:], zb0[:],
                    i=i, j0=b0 * row_block, rb=row_block, idmask=True)
                u, fx, fy, fz = u + du, fx + dfx, fy + dfy, fz + dfz

                @pl.when(b0 + 2 < b_hi)
                def _():
                    _start_block(b0 + 2, xb0, yb0, zb0, rsem0)

                @pl.when(b1 < b_hi)
                def _():
                    _wait_block(b1, xb1, yb1, zb1, rsem1)

                # The odd-tail iteration computes on whatever buffer-1
                # holds (possibly stale/uninitialized); the select after
                # the block reductions zeroes it out — NaN-safe because
                # select, not multiply.
                du, dfx, dfy, dfz = _block_terms(
                    xi, yi, zi, xb1[:], yb1[:], zb1[:],
                    i=i, j0=b1 * row_block, rb=row_block, idmask=True)
                ok = b1 < b_hi
                u = u + jnp.where(ok, du, 0.0)
                fx = fx + jnp.where(ok, dfx, 0.0)
                fy = fy + jnp.where(ok, dfy, 0.0)
                fz = fz + jnp.where(ok, dfz, 0.0)
                return u, fx, fy, fz

            zero = jnp.zeros((1, c_tile), jnp.float32)
            n_pairs = (b_hi - b_lo + 1) // 2
            u, fx, fy, fz = jax.lax.fori_loop(
                0, n_pairs, pair_body, (zero, zero, zero, zero))
            return (4.0 * u, (24.0 * box_l) * fx, (24.0 * box_l) * fy,
                    24.0 * fz)

        def one_sweep(s, e):
            # Same per-sweep PRNG stream derivation as the VMEM kernel.
            pltpu.prng_seed(seeds_ref[s, 0],
                            seeds_ref[s, 1] ^ (g * jnp.int32(0x27D4EB2F)))
            offset = offsets_ref[s]
            acc_count = jnp.zeros((1, c_tile), jnp.float32)

            def move(nn, carry):
                e, acc_count = carry
                i = (nn + offset) % n
                ib = i // row_block
                # Fetch the moving particle's row (the only state row a
                # move needs by value; everything else streams by block).
                cps = [
                    pltpu.make_async_copy(
                        xo_hbm.at[pl.ds(i, 1), col], qx, qsem.at[0]),
                    pltpu.make_async_copy(
                        yo_hbm.at[pl.ds(i, 1), col], qy, qsem.at[1]),
                    pltpu.make_async_copy(
                        zo_hbm.at[pl.ds(i, 1), col], qz, qsem.at[2]),
                ]
                for cp in cps:
                    cp.start()
                for cp in cps:
                    cp.wait()
                xi = qx[:]
                yi = qy[:]
                zi = qz[:]

                # Row i sorted into block ib at call start; every later
                # write expanded ib's bounds, so its current z is covered.
                um, fmx, fmy, fmz = stream_pair_terms(
                    i, xi, yi, zi, sbmin[ib], sbmax[ib])
                if use_walls:
                    uw, wx, wy, wz = wall_terms(
                        xi * box_l, yi * box_l, zi, wa_cols, wb_cols,
                        sxc, syc)
                    um += uw
                    fmx += wx
                    fmy += wy
                    fmz += wz

                # 3 Gaussians (Box-Muller, sigma = sqrt(2A)) + 1 uniform
                u = _uniforms((8, c_tile))
                r1 = jnp.sqrt(-2.0 * jnp.log(u[0:1])) * s2a
                g1 = r1 * jnp.cos(TWO_PI * u[1:2])
                g2 = r1 * jnp.sin(TWO_PI * u[1:2])
                g3 = jnp.sqrt(-2.0 * jnp.log(u[2:3])) * s2a * \
                    jnp.cos(TWO_PI * u[3:4])
                u_acc = u[4:5]

                ddx = fmx * a_t + g1
                ddy = fmy * a_t + g2
                ddz = fmz * a_t + g3
                px = xi + ddx * (1.0 / box_l)
                px = px - jnp.round(px)
                py = yi + ddy * (1.0 / box_l)
                py = py - jnp.round(py)
                pz = zi + ddz

                pz_lo = jnp.min(pz)
                pz_hi = jnp.max(pz)
                un, fnx, fny, fnz = stream_pair_terms(
                    i, px, py, pz, pz_lo, pz_hi)
                if use_walls:
                    uw, wx, wy, wz = wall_terms(
                        px * box_l, py * box_l, pz, wa_cols, wb_cols,
                        sxc, syc)
                    un += uw
                    fnx += wx
                    fny += wy
                    fnz += wz

                dfx = fnx - fmx
                dfy = fny - fmy
                dfz = fnz - fmz
                dw_term = (dfx * dfx + dfy * dfy + dfz * dfz
                           + 2.0 * (dfx * fmx + dfy * fmy + dfz * fmz)) \
                    * a_4t
                log_ap = scale_logap(
                    -(un - um
                      + 0.5 * (ddx * (fnx + fmx) + ddy * (fny + fmy)
                               + ddz * (fnz + fmz))
                      + dw_term))
                accept = (u_acc < jnp.exp(jnp.minimum(log_ap, 0.0))) \
                    | (log_ap >= 0.0)

                # Write the row back (old values on reject — the write is
                # unconditional so the next move's wait is too), then
                # expand block ib's bounds by the proposal's z range.
                qx[:] = jnp.where(accept, px, xi)
                qy[:] = jnp.where(accept, py, yi)
                qz[:] = jnp.where(accept, pz, zi)
                cps = [
                    pltpu.make_async_copy(
                        qx, xo_hbm.at[pl.ds(i, 1), col], qsem.at[0]),
                    pltpu.make_async_copy(
                        qy, yo_hbm.at[pl.ds(i, 1), col], qsem.at[1]),
                    pltpu.make_async_copy(
                        qz, zo_hbm.at[pl.ds(i, 1), col], qsem.at[2]),
                ]
                for cp in cps:
                    cp.start()
                for cp in cps:
                    cp.wait()
                sbmin[ib] = jnp.minimum(sbmin[ib], pz_lo)
                sbmax[ib] = jnp.maximum(sbmax[ib], pz_hi)
                e = e + jnp.where(accept, un - um, 0.0)
                acc_count = acc_count + accept.astype(jnp.float32)
                return e, acc_count

            e, acc_count = jax.lax.fori_loop(
                0, n, move, (e, acc_count))
            et_ref[pl.ds(s, 1), :] = e
            at_ref[pl.ds(s, 1), :] = acc_count.astype(jnp.int32)
            return e

        e = jax.lax.fori_loop(0, n_sweeps, one_sweep, e_ref[:])
        eo_ref[:] = e

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_sweeps", "a", "c_tile", "zskip",
                     "row_block_rows", "hbm_stream", "per_chain_w",
                     "xslices"),
)
def pallas_sweep_block(
    x: jax.Array,          # [N_pad, C] f32
    y: jax.Array,
    z: jax.Array,
    e: jax.Array,          # [1, C] f32 running energy
    wa: jax.Array,         # [1, MM_pad] f32 wall a-coefficients, or
                           # [s_pad, C] per-chain planes (per_chain_w)
    wb: jax.Array,
    offsets: jax.Array,    # [n_sweeps] int32 cyclic offsets
    seed: jax.Array,       # [n_sweeps, 2] int32 per-sweep PRNG seed words
                           # (scalar/[2] accepted: broadcast with a sweep
                           # index fold for backward compatibility)
    cfg: SMCConfig,
    n_sweeps: int,
    a: float,
    c_tile: int = 256,
    zskip: bool = False,
    row_block_rows: int | None = None,
    a_row: jax.Array | None = None,
    invt_row: jax.Array | None = None,
    hbm_stream: bool = False,
    per_chain_w: bool = False,
    xslices: int = 0,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Run `n_sweeps` full SMC sweeps for every chain.

    zskip: rows must be z-sorted per chain (ensemble_sweeps_zsorted does
    this); j-blocks provably outside the moving particle's z cutoff are
    skipped — bitwise identical results, fewer rows touched.

    hbm_stream (implies zskip preconditions): the planes stay in HBM and
    pair passes stream j-blocks through double-buffered VMEM buffers —
    the N-beyond-VMEM engine (_make_stream_kernel). Bitwise identical to
    zskip at the same row_block.

    a_row/invt_row ([1, C] f32, both or neither): PER-CHAIN proposal
    mobility A and 1/T — the temperature-ladder mode (tsweep/pt). The
    static `a` is then ignored (pass 0.0); one compile serves every
    ladder AND its thermalization (A-doubling is a value change).

    per_chain_w: wa/wb are [s_pad, C] PER-CHAIN wall-coefficient planes
    (quenched disorder, wall_coeff_planes) — the kernel body is
    unchanged (wall_terms already consumes [s_pad, c_tile] per-lane
    tiles); only the wall BlockSpec follows the chain tile. Uniform
    runs keep the exact original spec, so their Mosaic cache entries
    stay valid.

    Returns (x, y, z, e, energy_trace [S, C], accept_trace [S, C])."""
    n_pad, c = x.shape
    assert c % c_tile == 0, (c, c_tile)
    assert not cfg.lj_shift, (
        "the Pallas kernels implement the reference's truncated-"
        "unshifted LJ; shifted-potential runs (NPT) use the XLA engine")
    per_chain_at = a_row is not None
    assert per_chain_at == (invt_row is not None), \
        "a_row and invt_row must be passed together"
    if hbm_stream:
        assert not xslices or xslices <= 1, \
            "xslices: streamed kernel not implemented (resident only)"
        return _pallas_sweep_block_stream(
            x, y, z, e, wa, wb, offsets, seed, cfg, n_sweeps, a,
            c_tile, row_block_rows or ROW_BLOCK, a_row, invt_row,
            per_chain_w=per_chain_w)
    grid = (c // c_tile,)
    kernel = _make_kernel(cfg, n_pad, c_tile, n_sweeps, a,
                          zskip=zskip, row_block=row_block_rows,
                          per_chain_at=per_chain_at, xslices=xslices)

    hbm = pl.BlockSpec(memory_space=pl.ANY)
    row_block = pl.BlockSpec((1, c_tile), lambda g, *_: (0, g),
                             memory_space=pltpu.VMEM)
    s_pad = _round_up(cfg.m * cfg.m, 8)
    if per_chain_w:
        # per-chain coefficient planes: each chain tile reads its own
        # columns (quenched wall disorder)
        assert wa.shape == (s_pad, c), (wa.shape, s_pad, c)
        wa_cols, wb_cols = wa, wb
        wall_block = pl.BlockSpec((s_pad, c_tile), lambda g, *_: (0, g),
                                  memory_space=pltpu.VMEM)
    else:
        # site-plane layout: coefficients on SUBLANES, broadcast over
        # lanes
        wa_cols = jnp.broadcast_to(wa[0, :s_pad][:, None], (s_pad, c_tile))
        wb_cols = jnp.broadcast_to(wb[0, :s_pad][:, None], (s_pad, c_tile))
        wall_block = pl.BlockSpec((s_pad, c_tile), lambda g, *_: (0, 0),
                                  memory_space=pltpu.VMEM)
    trace_block = pl.BlockSpec((n_sweeps, c_tile), lambda g, *_: (0, g),
                               memory_space=pltpu.VMEM)

    scratch = [
        pltpu.VMEM((n_pad, c_tile), jnp.float32),
        pltpu.VMEM((n_pad, c_tile), jnp.float32),
        pltpu.VMEM((n_pad, c_tile), jnp.float32),
    ]
    if cfg.reference_noise:
        scratch.append(pltpu.VMEM((_round_up(3 * cfg.n, 8), c_tile),
                                  jnp.float32))
    if zskip:
        rb = min(n_pad, row_block_rows or ROW_BLOCK)
        assert n_pad % rb == 0, (n_pad, rb)
        nb = n_pad // rb
        scratch.append(pltpu.SMEM((nb,), jnp.float32))  # live block zmin
        scratch.append(pltpu.SMEM((nb,), jnp.float32))  # live block zmax
        if xslices > 1:
            scratch.append(pltpu.SMEM((nb,), jnp.float32))  # live xmin
            scratch.append(pltpu.SMEM((nb,), jnp.float32))  # live xmax
    scratch.append(pltpu.SemaphoreType.DMA((3,)))

    in_specs = [hbm, hbm, hbm, row_block, wall_block, wall_block]
    if per_chain_at:
        in_specs += [row_block, row_block]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=[hbm, hbm, hbm, row_block, trace_block, trace_block],
        scratch_shapes=scratch,
    )

    out_shape = [
        jax.ShapeDtypeStruct((n_pad, c), jnp.float32),
        jax.ShapeDtypeStruct((n_pad, c), jnp.float32),
        jax.ShapeDtypeStruct((n_pad, c), jnp.float32),
        jax.ShapeDtypeStruct((1, c), jnp.float32),
        jax.ShapeDtypeStruct((n_sweeps, c), jnp.float32),
        jax.ShapeDtypeStruct((n_sweeps, c), jnp.int32),
    ]

    seed_words = _seed_words(seed, n_sweeps)
    # x/y enter the kernel PRE-SCALED by 1/L (z stays real): the min-image
    # wrap becomes one round+sub per block and the box scale folds into
    # dr2 / the per-pass force scale (docs/PERF_NOTES.md). The scale
    # round-trips at this call boundary only.
    inv_l = 1.0 / float(cfg.box_l)
    args = [x * inv_l, y * inv_l, z, e, wa_cols, wb_cols]
    if per_chain_at:
        args += [a_row.astype(jnp.float32), invt_row.astype(jnp.float32)]
    xo, yo, zo, e, e_tr, a_tr = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
    )(offsets.astype(jnp.int32), seed_words, *args)
    return xo * cfg.box_l, yo * cfg.box_l, zo, e, e_tr, a_tr


def _seed_words(seed: jax.Array, n_sweeps: int) -> jax.Array:
    """Normalize a seed to per-sweep [n_sweeps, 2] int32 PRNG words."""
    seed = jnp.atleast_1d(seed).astype(jnp.int32)
    if seed.ndim == 1:
        # Scalar/[2] block seed: expand to per-sweep words by folding in
        # the sweep index (legacy callers/tests).
        w0 = seed[0]
        w1 = seed[1] if seed.shape[0] > 1 else jnp.int32(0)
        sidx = jnp.arange(n_sweeps, dtype=jnp.int32)
        return jnp.stack(
            [w0 + sidx * jnp.int32(0x165667B1),
             w1 ^ (sidx * jnp.int32(0x5851F42D))], axis=1)
    assert seed.shape == (n_sweeps, 2), seed.shape
    return seed


def _pallas_sweep_block_stream(
    x, y, z, e, wa, wb, offsets, seed, cfg: SMCConfig, n_sweeps: int,
    a: float, c_tile: int, row_block: int, a_row, invt_row,
    per_chain_w: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """HBM-streamed call path of pallas_sweep_block (traced inside its
    jit). Planes are updated IN PLACE via input_output_aliases — no
    full-plane VMEM residency, so N is bounded by HBM, not VMEM."""
    n_pad, c = x.shape
    per_chain_at = a_row is not None
    rb = min(n_pad, row_block)
    assert n_pad % rb == 0, (n_pad, rb)
    nb = n_pad // rb
    n_tiles = c // c_tile
    grid = (n_tiles,)
    kernel = _make_stream_kernel(cfg, n_pad, c_tile, n_sweeps, a,
                                 row_block=rb, per_chain_at=per_chain_at)

    hbm = pl.BlockSpec(memory_space=pl.ANY)
    row_spec = pl.BlockSpec((1, c_tile), lambda g, *_: (0, g),
                            memory_space=pltpu.VMEM)
    s_pad = _round_up(cfg.m * cfg.m, 8)
    if per_chain_w:
        assert wa.shape == (s_pad, c), (wa.shape, s_pad, c)
        wa_cols, wb_cols = wa, wb
        wall_spec = pl.BlockSpec((s_pad, c_tile), lambda g, *_: (0, g),
                                 memory_space=pltpu.VMEM)
    else:
        wa_cols = jnp.broadcast_to(wa[0, :s_pad][:, None], (s_pad, c_tile))
        wb_cols = jnp.broadcast_to(wb[0, :s_pad][:, None], (s_pad, c_tile))
        wall_spec = pl.BlockSpec((s_pad, c_tile), lambda g, *_: (0, 0),
                                 memory_space=pltpu.VMEM)
    trace_spec = pl.BlockSpec((n_sweeps, c_tile), lambda g, *_: (0, g),
                              memory_space=pltpu.VMEM)

    scratch = [
        pltpu.VMEM((rb, c_tile), jnp.float32),   # xb0
        pltpu.VMEM((rb, c_tile), jnp.float32),   # yb0
        pltpu.VMEM((rb, c_tile), jnp.float32),   # zb0
        pltpu.VMEM((rb, c_tile), jnp.float32),   # xb1
        pltpu.VMEM((rb, c_tile), jnp.float32),   # yb1
        pltpu.VMEM((rb, c_tile), jnp.float32),   # zb1
        pltpu.VMEM((1, c_tile), jnp.float32),    # qx (moving row)
        pltpu.VMEM((1, c_tile), jnp.float32),    # qy
        pltpu.VMEM((1, c_tile), jnp.float32),    # qz
        pltpu.SMEM((nb,), jnp.float32),          # live block zmin
        pltpu.SMEM((nb,), jnp.float32),          # live block zmax
        pltpu.SemaphoreType.DMA((3,)),           # rsem0
        pltpu.SemaphoreType.DMA((3,)),           # rsem1
        pltpu.SemaphoreType.DMA((3,)),           # qsem
    ]

    in_specs = [hbm, hbm, hbm, row_spec, wall_spec, wall_spec]
    if per_chain_at:
        in_specs += [row_spec, row_spec]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=grid,
        in_specs=in_specs,
        out_specs=[hbm, hbm, hbm, row_spec, trace_spec, trace_spec],
        scratch_shapes=scratch,
    )

    out_shape = [
        jax.ShapeDtypeStruct((n_pad, c), jnp.float32),
        jax.ShapeDtypeStruct((n_pad, c), jnp.float32),
        jax.ShapeDtypeStruct((n_pad, c), jnp.float32),
        jax.ShapeDtypeStruct((1, c), jnp.float32),
        jax.ShapeDtypeStruct((n_sweeps, c), jnp.float32),
        jax.ShapeDtypeStruct((n_sweeps, c), jnp.int32),
    ]

    seed_words = _seed_words(seed, n_sweeps)
    inv_l = 1.0 / float(cfg.box_l)
    xs = x * inv_l
    ys = y * inv_l
    # Call-start EXACT per-(tile, block) z bounds (pads excluded), the
    # kernel's skip decisions start from these and only expand.
    real = z < 1e14
    zblk = jnp.where(real, z, jnp.float32(1e15)).reshape(
        nb, rb, n_tiles, c_tile)
    sbmin0 = jnp.min(zblk, axis=(1, 3)).T                    # [n_tiles, nb]
    zblk = jnp.where(real, z, jnp.float32(-1e15)).reshape(
        nb, rb, n_tiles, c_tile)
    sbmax0 = jnp.max(zblk, axis=(1, 3)).T

    args = [xs, ys, z, e, wa_cols, wb_cols]
    if per_chain_at:
        args += [a_row.astype(jnp.float32), invt_row.astype(jnp.float32)]
    # Alias the three planes onto the outputs (indices count the scalar-
    # prefetch operands: 0..3 are offsets/seeds/sbmin0/sbmax0).
    xo, yo, zo, e, e_tr, a_tr = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases={4: 0, 5: 1, 6: 2},
    )(offsets.astype(jnp.int32), seed_words, sbmin0, sbmax0, *args)
    return xo * cfg.box_l, yo * cfg.box_l, zo, e, e_tr, a_tr


# ----------------------------------------------------------------------
# Layout adapters: ChainState [C, N, 3]  <->  planes [N_pad, C]
# ----------------------------------------------------------------------

def to_planes(r: jax.Array, cfg: SMCConfig) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """[C, N, 3] -> three [N_pad, C] float32 planes (pad rows park far
    outside every cutoff so they never interact)."""
    c, n, _ = r.shape
    n_pad = _round_up(n, 8)
    planes = jnp.transpose(r, (2, 1, 0)).astype(jnp.float32)  # [3, N, C]
    pad = jnp.full((3, n_pad - n, c), 1e15, jnp.float32)
    planes = jnp.concatenate([planes, pad], axis=1)
    return planes[0], planes[1], planes[2]


def from_planes(
    x: jax.Array, y: jax.Array, z: jax.Array, cfg: SMCConfig, dtype=None
) -> jax.Array:
    """Three [N_pad, C] planes -> [C, N, 3]."""
    n = cfg.n
    stacked = jnp.stack([x[:n], y[:n], z[:n]], axis=0)  # [3, N, C]
    out = jnp.transpose(stacked, (2, 1, 0))
    return out.astype(dtype) if dtype is not None else out


def wall_coeff_planes(w: jax.Array, cfg: SMCConfig
                      ) -> Tuple[jax.Array, jax.Array]:
    """Per-chain W [C, MM, 2] -> two [s_pad, C] per-site x per-chain
    coefficient planes (quenched wall disorder on the kernel engines;
    pad sites carry zeros so they contribute exactly 0 — same contract
    as the uniform sublane layout in pallas_sweep_block)."""
    mm = cfg.m * cfg.m
    s_pad = _round_up(mm, 8)
    c = w.shape[0]
    wa = jnp.zeros((s_pad, c), jnp.float32).at[:mm].set(
        w[:, :, 0].T.astype(jnp.float32))
    wb = jnp.zeros((s_pad, c), jnp.float32).at[:mm].set(
        w[:, :, 1].T.astype(jnp.float32))
    return wa, wb


def wall_coeff_rows(w: jax.Array, cfg: SMCConfig) -> Tuple[jax.Array, jax.Array]:
    """W [MM, 2] -> padded [1, MM_pad] rows (lane-aligned)."""
    mm = cfg.m * cfg.m
    mm_pad = _round_up(mm, 128)
    wa = jnp.zeros((1, mm_pad), jnp.float32).at[0, :mm].set(
        w[:, 0].astype(jnp.float32))
    wb = jnp.zeros((1, mm_pad), jnp.float32).at[0, :mm].set(
        w[:, 1].astype(jnp.float32))
    return wa, wb
