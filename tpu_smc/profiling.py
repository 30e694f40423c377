"""Tracing / profiling (SURVEY §5.1).

The reference's instrumentation is clock() around thermalization and the
main loop plus the self-reported "s per million sweeps" metric
(SMC.c:38-39,111,120-132,198-200). TPU equivalents here:

  * PhaseTimer — wall-clock phase accounting with the reference's
    "seconds per million sweeps" formatting;
  * ThroughputMeter — running aggregate sweeps/s across chains;
  * trace() — a context manager around jax.profiler.trace, emitting a
    TensorBoard/perfetto trace of the device program;
  * estimate_completion — the reference's thermalization-extrapolated ETA
    (SMC.c:131).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, Iterator, Optional

import jax


@dataclass
class PhaseTimer:
    """Named wall-clock phases (thermalization / production / post)."""

    phases: Dict[str, float] = field(default_factory=dict)
    _start: Dict[str, float] = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.phases[name] = self.phases.get(name, 0.0) + (
                time.perf_counter() - t0
            )

    def seconds(self, name: str) -> float:
        return self.phases.get(name, 0.0)

    def report(self, sweeps: Optional[Dict[str, int]] = None) -> str:
        """Per-phase report; with sweep counts, adds the reference's
        's per million' metric (SMC.c:200)."""
        lines = []
        for name, secs in self.phases.items():
            line = f"{name}: {secs:0.1f} s"
            if sweeps and sweeps.get(name):
                line += f" ({secs * 1e6 / sweeps[name]:0.1f} per million)"
            lines.append(line)
        return "\n".join(lines)


class ThroughputMeter:
    """Aggregate sweeps/s across all chains, windowed."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.chain_sweeps = 0

    def add(self, sweeps: int, chains: int = 1) -> None:
        self.chain_sweeps += sweeps * chains

    @property
    def sweeps_per_second(self) -> float:
        dt = time.perf_counter() - self.t0
        return self.chain_sweeps / dt if dt > 0 else float("nan")


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace (view with TensorBoard or perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def estimate_completion(therm_seconds: float, eqsteps: int, maxsteps: int,
                        margin: float = 1.03) -> float:
    """Expected production minutes, extrapolated from thermalization
    exactly like the reference (SMC.c:131)."""
    if eqsteps == 0:
        return float("nan")
    return margin * therm_seconds * maxsteps / eqsteps / 60.0


def zskip_processed_fraction_band(
    r_pre, r_post, cfg, row_block_rows: int = 128,
) -> tuple[float, float]:
    """Roofline diagnostic for the z-sorted engines: the (lo, hi) band of
    the fraction of j-blocks the zskip pair pass actually processes per
    move, reconstructed from the positions at a sort point (`r_pre`,
    where the kernel z-sorts and takes tight per-block bounds —
    kernels/sweep_pallas.py pair_terms_zskip) and at the end of one sort
    cadence (`r_post`).

    The kernel's per-block (zmin, zmax) bounds are LIVE but never shrink
    within a cadence chunk, so the true per-move processed fraction over
    the chunk is bracketed by:
      lo — sort-point positions against the sort-point (tight) bounds;
      hi — end-of-chunk positions against bounds widened by the whole
           chunk's accepted drift (union of start/end per-block ranges).
    Both use the kernel's contiguous [b_lo, b_hi) envelope semantics, so
    padded tails aside (callers pass n % row_block == 0 shapes), the
    reconstruction counts exactly the blocks the scalar-unit scan admits.

    r_pre, r_post: [C, N, 3] position arrays (host or device).
    Returns (frac_lo, frac_hi) averaged over chains and particles.
    """
    import numpy as np

    rp = np.asarray(r_pre, np.float64)
    rq = np.asarray(r_post, np.float64)
    c, n = rp.shape[0], rp.shape[1]
    rb = min(n, max(8, (row_block_rows // 8) * 8))
    while n % rb != 0:
        rb -= 8
    nb = n // rb
    cut = float(cfg.lj_cutoff)
    order = np.argsort(rp[:, :, 2], axis=1)
    z0 = np.take_along_axis(rp[:, :, 2], order, axis=1)   # [C, N] sorted
    z1 = np.take_along_axis(rq[:, :, 2], order, axis=1)   # same row order
    b0 = z0.reshape(c, nb, rb)
    b1 = z1.reshape(c, nb, rb)
    bmin0, bmax0 = b0.min(axis=2), b0.max(axis=2)
    bmin1 = np.minimum(bmin0, b1.min(axis=2))              # live bounds
    bmax1 = np.maximum(bmax0, b1.max(axis=2))              # only widen

    def mean_span(z, bmin, bmax):
        # contiguous envelope [b_lo, b_hi): every block whose range can
        # overlap [z - cut, z + cut], extended to the min..max needed
        # index exactly like the kernel's scalar scan. Chain-chunked:
        # the [C, N, nb] mask at N=16k x 128 blocks is ~270 MB otherwise.
        tot = 0.0
        step = max(1, int(2 ** 24 // max(1, n * nb)))
        for s in range(0, c, step):
            e = min(c, s + step)
            need = ((bmin[s:e, None, :] <= (z[s:e] + cut)[:, :, None])
                    & (bmax[s:e, None, :] >= (z[s:e] - cut)[:, :, None]))
            any_ = need.any(axis=2)
            first = need.argmax(axis=2)
            last = nb - need[:, :, ::-1].argmax(axis=2)
            span = np.where(any_, last - first, 0)
            tot += float(span.sum())
        return tot / (c * n * nb)

    lo = mean_span(z0, bmin0, bmax0)
    hi = mean_span(z1, bmin1, bmax1)
    return lo, hi


def _group_slices(c: int, c_tile: int):
    return [(s, min(c, s + c_tile)) for s in range(0, c, c_tile)]


def _shrink_rb(n: int, row_block_rows: int) -> int:
    rb = min(n, max(8, (row_block_rows // 8) * 8))
    while n % rb != 0:
        rb -= 8
    return rb


def zskip_kernel_fraction_band(
    r_pre, r_post, cfg, c_tile: int = 128, row_block_rows: int = 128,
) -> tuple[float, float]:
    """The KERNEL-TRUE processed-block fraction band for the zskip
    engines — prices the blocks the compiled kernel actually executes,
    unlike `zskip_processed_fraction_band` which prices the ideal
    per-chain envelope (useful as the headroom target, not as the
    utilization anchor). Two semantics differences, both from
    kernels/sweep_pallas.py:

      * the per-block scalar (zmin, zmax) bounds live in SMEM and POOL
        over every chain column in the c_tile grid tile
        (`sbmin[b] = min(...)` over the whole [rb, c_tile] block) — all
        chains in a tile share one skip decision;
      * the CURRENT-position pair pass queries the whole home block's
        range (`pair_terms_zskip(..., sbmin[ib], sbmax[ib], ...)`), and
        the PROPOSAL pass queries the row's min..max over the tile
        (`jnp.min(pz)/jnp.max(pz)`), not the individual particle's z.

    Per move the kernel runs both passes over their own contiguous
    envelopes, so the per-move fraction is the mean of the two spans.
    (lo, hi) brackets the live-bounds growth within one sort cadence
    exactly like `zskip_processed_fraction_band`.
    """
    import numpy as np

    rp = np.asarray(r_pre, np.float64)
    rq = np.asarray(r_post, np.float64)
    c, n = rp.shape[0], rp.shape[1]
    rb = _shrink_rb(n, row_block_rows)
    nb = n // rb
    cut = float(cfg.lj_cutoff)
    order = np.argsort(rp[:, :, 2], axis=1)
    z0 = np.take_along_axis(rp[:, :, 2], order, axis=1)   # [C, N] sorted
    z1 = np.take_along_axis(rq[:, :, 2], order, axis=1)   # same row order

    # per-chain block ranges at the sort point and their union with the
    # end-of-cadence positions (live bounds only widen over a cadence)
    b0 = z0.reshape(c, nb, rb)
    b1 = z1.reshape(c, nb, rb)
    cmin0, cmax0 = b0.min(axis=2), b0.max(axis=2)          # [C, nb]
    cmin1 = np.minimum(cmin0, b1.min(axis=2))
    cmax1 = np.maximum(cmax0, b1.max(axis=2))
    rlo0, rhi0 = z0, z0                                    # [C, N] rows
    rlo1, rhi1 = np.minimum(z0, z1), np.maximum(z0, z1)

    def mean_frac(cmin, cmax, rlo, rhi):
        tot, rows = 0.0, 0
        for s, e in _group_slices(c, c_tile):
            g = e - s
            bmin = cmin[s:e].min(axis=0)                   # [nb] pooled
            bmax = cmax[s:e].max(axis=0)

            def span(lo_t, hi_t):
                need = (bmin[None, :] <= hi_t[:, None]) \
                    & (bmax[None, :] >= lo_t[:, None])
                any_ = need.any(axis=1)
                first = need.argmax(axis=1)
                last = nb - need[:, ::-1].argmax(axis=1)
                return np.where(any_, last - first, 0)

            # pass 1: per home block ib, envelope = block range +- cut
            s1 = span(bmin - cut, bmax + cut)              # [nb]
            # pass 2: per row i, envelope = tile row range +- cut
            s2 = span(rlo[s:e].min(axis=0) - cut,
                      rhi[s:e].max(axis=0) + cut)          # [N]
            per_row = 0.5 * (np.repeat(s1, rb) + s2) / nb
            tot += g * float(per_row.mean())
            rows += g
        return tot / rows

    lo = mean_frac(cmin0, cmax0, rlo0, rhi0)
    hi = mean_frac(cmin1, cmax1, rlo1, rhi1)
    return lo, hi


def zskip_inplane_headroom(
    r, cfg, c_tile: int = 128, row_block_rows: int = 128,
    sample_i: int = 256, seed: int = 0,
) -> dict:
    """Quantify what an in-plane (x/y) skip refinement could still save
    on top of the z-block envelope (VERDICT r4 #4's go/no-go input).

    For a kernel-admitted pair element the pair math runs whether or not
    the element lands inside the cutoff. On an equilibrated configuration
    this measures, per move (sampled particles, kernel-true pooled
    envelope at the sort point):

      admitted_rows   — rows the compiled kernel processes per move
                        (pass-mean envelope span x row_block);
      z_rows          — rows with |dz| < cutoff (a perfect row-granular
                        PER-CHAIN z scheme's floor);
      box_rows        — rows additionally within the min-image x/y
                        cutoff box (what a perfect in-plane refinement
                        could reach at row granularity);
      sphere_rows     — rows inside the true spherical cutoff (the
                        irreducible physics).

    Returns mean counts and the ratios that price a 2-D scheme's
    ceiling: `z_over_admitted` is reachable by per-chain row-granular z
    alone; `box_over_admitted` adds ideal in-plane skipping. Block
    granularity, chain pooling, and bound staleness all push a real
    kernel above these floors, so the ratios are optimistic ceilings —
    exactly what a no-go needs."""
    import numpy as np

    rr = np.asarray(r, np.float64)
    c, n = rr.shape[0], rr.shape[1]
    rb = _shrink_rb(n, row_block_rows)
    nb = n // rb
    cut = float(cfg.lj_cutoff)
    box_l = float(cfg.box_l)
    order = np.argsort(rr[:, :, 2], axis=1)
    zs = np.take_along_axis(rr[:, :, 2], order, axis=1)
    xs = np.take_along_axis(rr[:, :, 0], order, axis=1)
    ys = np.take_along_axis(rr[:, :, 1], order, axis=1)
    rng = np.random.default_rng(seed)
    k = min(sample_i, n)
    idx = np.sort(rng.choice(n, size=k, replace=False))

    adm = z_rows = box_rows = sph_rows = 0.0
    b0 = zs.reshape(c, nb, rb)
    cmin, cmax = b0.min(axis=2), b0.max(axis=2)
    for s, e in _group_slices(c, c_tile):
        g = e - s
        bmin = cmin[s:e].min(axis=0)
        bmax = cmax[s:e].max(axis=0)

        def span(lo_t, hi_t):
            need = (bmin[None, :] <= hi_t[:, None]) \
                & (bmax[None, :] >= lo_t[:, None])
            any_ = need.any(axis=1)
            first = need.argmax(axis=1)
            last = nb - need[:, ::-1].argmax(axis=1)
            return np.where(any_, last - first, 0)

        s1 = span(bmin - cut, bmax + cut)                  # [nb] pass 1
        rlo = zs[s:e].min(axis=0)[idx] - cut
        rhi = zs[s:e].max(axis=0)[idx] + cut
        s2 = span(rlo, rhi)                                # [k] pass 2
        adm += g * float(
            (0.5 * (s1[idx // rb] + s2) * rb).mean())

        for ci in range(s, e):
            dz = np.abs(zs[ci][idx, None] - zs[ci][None, :])   # [k, N]
            dx = xs[ci][idx, None] - xs[ci][None, :]
            dy = ys[ci][idx, None] - ys[ci][None, :]
            dx -= box_l * np.round(dx / box_l)
            dy -= box_l * np.round(dy / box_l)
            zin = dz < cut
            boxin = zin & (np.abs(dx) < cut) & (np.abs(dy) < cut)
            z_rows += float(zin.sum(axis=1).mean())
            box_rows += float(boxin.sum(axis=1).mean())
            sph_rows += float(
                ((dx * dx + dy * dy + dz * dz) < cut * cut)
                .sum(axis=1).mean())
    # every accumulator summed g * per-group (or per-chain) means
    adm /= c
    z_rows /= c
    box_rows /= c
    sph_rows /= c
    return {
        "admitted_rows": adm,
        "z_rows": z_rows,
        "box_rows": box_rows,
        "sphere_rows": sph_rows,
        "z_over_admitted": z_rows / adm,
        "box_over_admitted": box_rows / adm,
        "sphere_over_admitted": sph_rows / adm,
        "sampled_particles": int(k),
        "row_block": int(rb),
        "c_tile": int(c_tile),
    }
