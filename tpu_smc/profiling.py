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
