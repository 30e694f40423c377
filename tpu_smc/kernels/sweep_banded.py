"""Experimental z-banded Smart-MC kernel (random-scan, exact).

Motivation: the confined systems are dilute along z (cutoff 3σ against
Lz = 200-240), so the dense per-move O(N) pair pass of sweep_pallas wastes
most of its work on rows that cannot interact. This kernel keeps rows
z-SORTED (per chain, re-sorted between kernel calls) and restricts the
pair pass to a window of ±W sorted rows around the moving particle.

Exactness is preserved by construction — this is NOT an approximation:

  * **Random-scan selection.** Each move picks a uniformly random row
    (scalar-prefetched schedule shared by all chains). A uniformly random
    row is a uniformly random PARTICLE regardless of the per-chain sort,
    so the visit schedule is state-independent and random-scan
    Metropolis-Hastings is unconditionally pi-invariant. (Cyclic sweeps
    over sorted rows would make the scan order depend on the state —
    that subtle adaptivity is exactly what this design avoids.)
  * **Symmetric z-step bound.** Moves with |delta_z| > D_Z are rejected in
    BOTH directions. The indicator 1[|y_z - x_z| <= D_Z] is symmetric in
    (x, y), so multiplying the Metropolis acceptance by it preserves
    detailed balance exactly — no proposal-normalization correction is
    needed. D_Z = 8 sigma by default: the extra rejections are ~1e-15 of
    proposals (wall-slammed proposals it rejects were energy-rejected
    anyway).
  * **Provable window sufficiency with per-move fallback.** At sort time
    the margin z[r±W] - z[r] is recorded per row. A window pass is provably
    complete when  margin(r) > cutoff + own_drift + max_drift + D_Z,
    where drifts are each particle's |z - z_at_sort| (bounded by D_Z per
    accepted move and tracked in-kernel as a per-lane running max). When
    the inequality cannot be established for some lane, the move falls
    back to the full O(N) pass for all lanes (pl.when-gated, per-lane
    selected), so the computed energies are always exact.

Physics per move is identical to kernels/sweep_pallas.py (cites therein).
Use via ensemble.ensemble_sweeps_banded; validated statistically against
the standard kernel in scripts/validate_banded.py.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SMCConfig
from .sweep_pallas import _round_up, _uniforms, TWO_PI


def _make_kernel(cfg: SMCConfig, n_pad: int, c_tile: int, n_moves: int,
                 a: float, window: int, d_z: float):
    n = cfg.n
    t = float(cfg.temperature)
    a = float(a)
    sqrt2a = math.sqrt(2.0 * a)
    cut2 = float(cfg.cutoff2)
    cut = float(cfg.lj_cutoff)
    box_l = float(cfg.box_l)
    box_lz = float(cfg.box_lz)
    contact = float(cfg.contact_dz)
    a0 = float(cfg.a0)
    b0 = float(cfg.b0)
    mm = cfg.m * cfg.m
    dw = box_l / cfg.m
    site_xy = [((m // cfg.m) * dw, (m % cfg.m) * dw) for m in range(mm)]
    use_walls = cfg.use_walls
    assert not cfg.pbc_z, "banded kernel is for the wall (confined-z) system"
    w2 = 2 * window
    row_block = min(n_pad, 512)
    n_blocks = -(-n_pad // row_block)

    def lj_terms(xi, yi, zi, x, y, z, ids, i):
        """Pair U/F of the mover at (xi,yi,zi) against rows (x,y,z) whose
        GLOBAL row ids are `ids`; excludes row i and padding."""
        dx = xi - x
        dx = dx - box_l * jnp.round(dx * (1.0 / box_l))
        dy = yi - y
        dy = dy - box_l * jnp.round(dy * (1.0 / box_l))
        dz = zi - z
        dr2 = dx * dx + dy * dy + dz * dz
        mask = (dr2 < cut2) & (ids != i) & (ids < n)
        safe = jnp.where(mask, dr2, 1.0)
        inv2 = 1.0 / safe
        inv6 = inv2 * inv2 * inv2
        inv12 = inv6 * inv6
        u = 4.0 * jnp.sum(jnp.where(mask, inv12 - inv6, 0.0), axis=0,
                          keepdims=True)
        dv = jnp.where(mask, (48.0 * inv12 - 24.0 * inv6) * inv2, 0.0)
        fx = jnp.sum(dv * dx, axis=0, keepdims=True)
        fy = jnp.sum(dv * dy, axis=0, keepdims=True)
        fz = jnp.sum(dv * dz, axis=0, keepdims=True)
        return u, fx, fy, fz

    def pair_window(xi, yi, zi, xs, ys, zs, i, start):
        """Windowed pass: rows [start, start+2W)."""
        ids = start + jax.lax.broadcasted_iota(jnp.int32, (w2, c_tile), 0)
        return lj_terms(
            xi, yi, zi,
            xs[pl.ds(start, w2), :], ys[pl.ds(start, w2), :],
            zs[pl.ds(start, w2), :], ids, i,
        )

    def pair_full(xi, yi, zi, xs, ys, zs, i):
        u = jnp.zeros((1, c_tile), jnp.float32)
        fx = jnp.zeros((1, c_tile), jnp.float32)
        fy = jnp.zeros((1, c_tile), jnp.float32)
        fz = jnp.zeros((1, c_tile), jnp.float32)
        for b in range(n_blocks):
            j0 = b * row_block
            rb = min(row_block, n_pad - j0)
            ids = j0 + jax.lax.broadcasted_iota(jnp.int32, (rb, c_tile), 0)
            du, dfx, dfy, dfz = lj_terms(
                xi, yi, zi, xs[j0:j0 + rb, :], ys[j0:j0 + rb, :],
                zs[j0:j0 + rb, :], ids, i)
            u += du
            fx += dfx
            fy += dfy
            fz += dfz
        return u, fx, fy, fz

    def wall_terms(xi, yi, zi, wa_vals, wb_vals):
        dz = zi + box_lz / 2.0
        dz = dz - box_lz * jnp.round(dz * (1.0 / box_lz))
        dz = jnp.where(zi <= -box_lz / 2.0, contact,
                       jnp.where(zi >= box_lz / 2.0, -contact, dz))
        dz2 = dz * dz
        iz2 = 1.0 / dz2
        iz6 = iz2 * iz2 * iz2
        iz12 = iz6 * iz6
        u = a0 * iz12 - b0 * iz6
        fz = (48.0 * a0 * iz12 - 24.0 * b0 * iz6) * iz2 * dz
        fx = jnp.zeros_like(fz)
        fy = jnp.zeros_like(fz)
        for m in range(mm):
            sx, sy = site_xy[m]
            dxm = xi - sx
            dxm = dxm - box_l * jnp.round(dxm * (1.0 / box_l))
            dym = yi - sy
            dym = dym - box_l * jnp.round(dym * (1.0 / box_l))
            dr2 = dxm * dxm + dym * dym + dz2
            msk = dr2 < cut2
            safe = jnp.where(msk, dr2, 1.0)
            inv2 = 1.0 / safe
            inv6 = inv2 * inv2 * inv2
            inv12 = inv6 * inv6
            u = u + jnp.where(msk, wa_vals[m] * inv12 - wb_vals[m] * inv6, 0.0)
            dv = jnp.where(
                msk,
                (48.0 * wa_vals[m] * inv12 - 24.0 * wb_vals[m] * inv6) * inv2,
                0.0)
            fx = fx + dv * dxm
            fy = fy + dv * dym
            fz = fz + dv * dz
        return 4.0 * u, fx, fy, fz

    def kernel(rows_ref, seed_ref,                       # scalar prefetch
               x_hbm, y_hbm, z_hbm, e_ref, wa_ref, wb_ref, margin_hbm,
               xo_hbm, yo_hbm, zo_hbm, eo_ref, acc_ref, fb_ref,
               xs, ys, zs, zs0, mg, sems):               # scratch
        g = pl.program_id(0)
        col = pl.ds(g * c_tile, c_tile)

        cps = [
            pltpu.make_async_copy(x_hbm.at[:, col], xs, sems.at[0]),
            pltpu.make_async_copy(y_hbm.at[:, col], ys, sems.at[1]),
            pltpu.make_async_copy(z_hbm.at[:, col], zs, sems.at[2]),
            pltpu.make_async_copy(margin_hbm.at[:, col], mg, sems.at[3]),
        ]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()
        zs0[:] = zs[:]  # z at sort time, for drift tracking

        pltpu.prng_seed(seed_ref[0], g)
        wa_vals = [wa_ref[0, m] for m in range(mm)]
        wb_vals = [wb_ref[0, m] for m in range(mm)]

        def move(nn, carry):
            e, acc_count, fb_count, drift_max = carry
            i = rows_ref[nn]
            start = jnp.clip(i - window, 0, n_pad - w2)
            xi = xs[pl.ds(i, 1), :]
            yi = ys[pl.ds(i, 1), :]
            zi = zs[pl.ds(i, 1), :]

            # Window provably sufficient? (per lane)
            own_drift = jnp.abs(zi - zs0[pl.ds(i, 1), :])
            margin_i = mg[pl.ds(i, 1), :]
            safe_lane = margin_i > (cut + own_drift + drift_max + d_z)
            need_full = jnp.logical_not(jnp.all(safe_lane))

            um_w, fmx_w, fmy_w, fmz_w = pair_window(
                xi, yi, zi, xs, ys, zs, i, start)

            u = _uniforms((8, c_tile))
            r1 = jnp.sqrt(-2.0 * jnp.log(u[0:1])) * sqrt2a
            g1 = r1 * jnp.cos(TWO_PI * u[1:2])
            g2 = r1 * jnp.sin(TWO_PI * u[1:2])
            g3 = jnp.sqrt(-2.0 * jnp.log(u[2:3])) * sqrt2a * \
                jnp.cos(TWO_PI * u[3:4])
            u_acc = u[4:5]

            def full_um(_):
                return pair_full(xi, yi, zi, xs, ys, zs, i)

            def win_um(_):
                return um_w, fmx_w, fmy_w, fmz_w

            um_f, fmx_f, fmy_f, fmz_f = jax.lax.cond(
                need_full, full_um, win_um, None)
            um = jnp.where(safe_lane, um_w, um_f)
            fmx = jnp.where(safe_lane, fmx_w, fmx_f)
            fmy = jnp.where(safe_lane, fmy_w, fmy_f)
            fmz = jnp.where(safe_lane, fmz_w, fmz_f)
            if use_walls:
                uw, wx, wy, wz = wall_terms(xi, yi, zi, wa_vals, wb_vals)
                um += uw
                fmx += wx
                fmy += wy
                fmz += wz

            ddx = fmx * (a / t) + g1
            ddy = fmy * (a / t) + g2
            ddz = fmz * (a / t) + g3
            px = xi + ddx
            px = px - box_l * jnp.round(px * (1.0 / box_l))
            py = yi + ddy
            py = py - box_l * jnp.round(py * (1.0 / box_l))
            pz = zi + ddz

            un_w, fnx_w, fny_w, fnz_w = pair_window(
                px, py, pz, xs, ys, zs, i, start)

            def full_un(_):
                return pair_full(px, py, pz, xs, ys, zs, i)

            def win_un(_):
                return un_w, fnx_w, fny_w, fnz_w

            un_f, fnx_f, fny_f, fnz_f = jax.lax.cond(
                need_full, full_un, win_un, None)
            un = jnp.where(safe_lane, un_w, un_f)
            fnx = jnp.where(safe_lane, fnx_w, fnx_f)
            fny = jnp.where(safe_lane, fny_w, fny_f)
            fnz = jnp.where(safe_lane, fnz_w, fnz_f)
            if use_walls:
                uw, wx, wy, wz = wall_terms(px, py, pz, wa_vals, wb_vals)
                un += uw
                fnx += wx
                fny += wy
                fnz += wz

            dfx = fnx - fmx
            dfy = fny - fmy
            dfz = fnz - fmz
            dw_term = (dfx * dfx + dfy * dfy + dfz * dfz
                       + 2.0 * (dfx * fmx + dfy * fmy + dfz * fmz)) \
                * (a / (4.0 * t))
            log_ap = -(un - um
                       + 0.5 * (ddx * (fnx + fmx) + ddy * (fny + fmy)
                                + ddz * (fnz + fmz))
                       + dw_term) / t
            accept = (u_acc < jnp.exp(jnp.minimum(log_ap, 0.0))) \
                | (log_ap >= 0.0)
            # symmetric z-step bound: preserves detailed balance exactly
            accept = accept & (jnp.abs(ddz) <= d_z)

            xs[pl.ds(i, 1), :] = jnp.where(accept, px, xi)
            ys[pl.ds(i, 1), :] = jnp.where(accept, py, yi)
            zs[pl.ds(i, 1), :] = jnp.where(accept, pz, zi)
            e = e + jnp.where(accept, un - um, 0.0)
            acc_count = acc_count + accept.astype(jnp.float32)
            fb_count = fb_count + need_full.astype(jnp.float32)
            new_drift = jnp.abs(jnp.where(accept, pz, zi)
                                - zs0[pl.ds(i, 1), :])
            drift_max = jnp.maximum(drift_max, new_drift)
            return e, acc_count, fb_count, drift_max

        zero = jnp.zeros((1, c_tile), jnp.float32)
        e, acc_count, fb_count, _ = jax.lax.fori_loop(
            0, n_moves, move, (e_ref[:], zero, zero, zero))
        eo_ref[:] = e
        acc_ref[:] = acc_count.astype(jnp.int32)
        fb_ref[:] = fb_count

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


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_moves", "a", "c_tile", "window", "d_z"),
)
def banded_sweep_block(
    x: jax.Array,          # [N_pad, C] f32, rows z-SORTED per chain (lane)
    y: jax.Array,
    z: jax.Array,
    e: jax.Array,          # [1, C]
    wa: jax.Array,
    wb: jax.Array,
    margin: jax.Array,     # [N_pad, C] window margin per row (see caller)
    rows: jax.Array,       # [n_moves] int32 random row schedule
    seed: jax.Array,
    cfg: SMCConfig,
    n_moves: int,
    a: float,
    c_tile: int = 128,
    window: int = 128,
    d_z: float = 12.0,
) -> Tuple[jax.Array, ...]:
    """One banded random-scan block of `n_moves` single-particle moves.

    Returns (x, y, z, e, accepted [1, C] int32, fallback_moves [1, C] f32).
    """
    n_pad, c = x.shape
    assert c % c_tile == 0
    grid = (c // c_tile,)
    kernel = _make_kernel(cfg, n_pad, c_tile, n_moves, a, window, d_z)

    hbm = pl.BlockSpec(memory_space=pl.ANY)
    row_block = pl.BlockSpec((1, c_tile), lambda g, *_: (0, g),
                             memory_space=pltpu.VMEM)
    wall_block = pl.BlockSpec((1, wa.shape[1]), lambda g, *_: (0, 0),
                              memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[hbm, hbm, hbm, row_block, wall_block, wall_block, hbm],
        out_specs=[hbm, hbm, hbm, row_block, row_block, row_block],
        scratch_shapes=[
            pltpu.VMEM((n_pad, c_tile), jnp.float32),
            pltpu.VMEM((n_pad, c_tile), jnp.float32),
            pltpu.VMEM((n_pad, c_tile), jnp.float32),
            pltpu.VMEM((n_pad, c_tile), jnp.float32),   # zs0
            pltpu.VMEM((n_pad, c_tile), jnp.float32),   # margin
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((n_pad, c), jnp.float32),
        jax.ShapeDtypeStruct((n_pad, c), jnp.float32),
        jax.ShapeDtypeStruct((n_pad, c), jnp.float32),
        jax.ShapeDtypeStruct((1, c), jnp.float32),
        jax.ShapeDtypeStruct((1, c), jnp.int32),
        jax.ShapeDtypeStruct((1, c), jnp.float32),
    ]
    return pl.pallas_call(kernel, grid_spec=grid_spec, out_shape=out_shape)(
        rows.astype(jnp.int32), jnp.atleast_1d(seed).astype(jnp.int32),
        x, y, z, e, wa, wb, margin,
    )


def sort_and_margin(
    r: jax.Array, cfg: SMCConfig, window: int
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Per-chain z-sort of [C, N, 3] positions into planes [N_pad, C] plus
    the per-row window margin min(z[r+W]-z[r], z[r]-z[r-W]) (edge rows get
    +inf on the clipped side — the window reaches the physical boundary)."""
    c, n, _ = r.shape
    n_pad = _round_up(n, 8)
    order = jnp.argsort(r[:, :, 2], axis=1)                    # [C, N]
    sorted_r = jnp.take_along_axis(r, order[:, :, None], axis=1)
    planes = jnp.transpose(sorted_r, (2, 1, 0)).astype(jnp.float32)
    pad = jnp.full((3, n_pad - n, c), 1e15, jnp.float32)
    planes = jnp.concatenate([planes, pad], axis=1)
    x, y, z = planes[0], planes[1], planes[2]

    zs = z[:n]                                                 # [N, C]
    big = jnp.float32(1e15)
    up = jnp.where(
        jnp.arange(n)[:, None] + window < n,
        jnp.roll(zs, -window, axis=0) - zs, big)
    down = jnp.where(
        jnp.arange(n)[:, None] - window >= 0,
        zs - jnp.roll(zs, window, axis=0), big)
    margin = jnp.minimum(up, down)
    margin = jnp.concatenate(
        [margin, jnp.full((n_pad - n, c), big, jnp.float32)], axis=0)
    return x, y, z, margin
