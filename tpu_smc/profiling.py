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
