"""Persistence: reference-schema CSV outputs, warm start, full checkpoints.

The reference writes 9 CSV artifacts per run into
`Data/data_N{N}_M{M}_r{rho:.4f}_T{T:.2f}/` (main.c:55-60; schemas verified
in SURVEY §5.5). We reproduce every file and format so the reference's
offline analysis (plotting.jl) reads our outputs unchanged:

  wall_<key>.csv                 nx, ny, x0, ymin          SMC.c:488-494
  positions_<key>_rank<r>.csv    x1,y1,z1,... rows %0.3lf, SMC.c:66-73,158-189
  data_<key>_rank<r>.csv         E, P, jj                  SMC.c:75-77,214-215
  local_<key>_rank<r>.csv        nx, ny, nz, n, mu         SMC.c:79-82,218-225
  local_temp_<key>_rank<r>.csv   windowed deltas           SMC.c:84-87,171-181
  total_clusters_<key>_rank<r>.csv  l1, l2, l3             SMC.c:89-92 (hdr only
                                 in the reference; we write real rows)
  autocorrelation_<key>_rank<r>.csv CH                     SMC.c:94-97,239-240
  info_<key>.csv                 run summary               main.c:138-159
  last_state_<key>.csv           3N doubles %0.12f,        main.c:163-171

"rank" = chain index: the per-MPI-rank file naming (SMC.c:66) becomes
per-chain naming.

Checkpointing: the reference's warm start persists positions only
(main.c:98-113). `save_checkpoint`/`load_checkpoint` persist the FULL
ChainState pytree (positions, energy, RNG key, counters, voxel
accumulators) with the same config-keyed naming — resume continues the
exact chain, not a new chain from old positions (SURVEY §5.4).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import RunParams, SMCConfig
from .state import ChainState


def run_dir(cfg: SMCConfig, base: str | Path = "Data") -> Path:
    d = Path(base) / cfg.run_name()
    d.mkdir(parents=True, exist_ok=True)
    return d


def _fname(d: Path, stem: str, cfg: SMCConfig, rank: Optional[int] = None) -> Path:
    key = cfg.file_key()
    if rank is None:
        return d / f"{stem}_{key}.csv"
    return d / f"{stem}_{key}_rank{rank}.csv"


def write_wall_csv(d: Path, cfg: SMCConfig, x0: np.ndarray, ym: np.ndarray) -> Path:
    """wall csv: site grid indices + raw (x0, ymin) draws (SMC.c:488-494).

    2-D draws ([K, M*M] — a quenched-disorder wall ensemble) gain a
    leading `k` realization column; the 1-D schema stays byte-identical
    to the reference's."""
    p = _fname(d, "wall", cfg)
    x0 = np.asarray(x0)
    ym = np.asarray(ym)
    with open(p, "w") as f:
        if x0.ndim == 2:
            f.write("k, nx, ny, x0, ymin\n")
            for k in range(x0.shape[0]):
                for i in range(cfg.m):
                    for j in range(cfg.m):
                        m = i * cfg.m + j
                        f.write(f"{k}, {i}, {j}, {x0[k, m]:f}, "
                                f"{ym[k, m]:f}\n")
        else:
            f.write("nx, ny, x0, ymin\n")
            for i in range(cfg.m):
                for j in range(cfg.m):
                    m = i * cfg.m + j
                    f.write(f"{i}, {j}, {x0[m]:f}, {ym[m]:f}\n")
    return p


def write_disorder_profile_csv(d: Path, cfg: SMCConfig, stem: str,
                               axis_name: str, centers, prof) -> Path:
    """Long-format per-realization profile from a wall-disorder run:
    one row per (realization k, bin) with header `k, <axis>, value`
    (e.g. zprofile_disorder_*.csv — rho(z) resolved per quenched wall)."""
    p = _fname(d, stem, cfg)
    prof = np.asarray(prof)
    with open(p, "w") as f:
        f.write(f"k, {axis_name}, value\n")
        for k in range(prof.shape[0]):
            for b in range(prof.shape[1]):
                f.write(f"{k}, {centers[b]:0.6f}, {prof[k, b]:0.9f}\n")
    return p


class PositionsWriter:
    """positions csv: header x1,y1,z1,...; one %0.3lf-formatted row per
    snapshot, trailing comma like the reference (SMC.c:68-73)."""

    def __init__(self, d: Path, cfg: SMCConfig, rank: int = 0):
        self.path = _fname(d, "positions", cfg, rank)
        with open(self.path, "w") as f:
            f.write("".join(f"x{n+1},y{n+1},z{n+1}," for n in range(cfg.n)) + "\n")

    def append(self, r: np.ndarray) -> None:
        flat = np.asarray(r).reshape(-1)
        from . import native

        row = native.format_positions_row(flat)
        if row is None:
            row = ("".join(f"{v:0.3f}," for v in flat) + "\n").encode()
        with open(self.path, "ab") as f:
            f.write(row)


class LocalWriter:
    """local / local_temp csv: voxel rows 'i, j, k, n, mu' (SMC.c:218-225)."""

    def __init__(self, d: Path, cfg: SMCConfig, stem: str, rank: int = 0):
        self.cfg = cfg
        self.path = _fname(d, stem, cfg, rank)
        with open(self.path, "w") as f:
            f.write("nx, ny, nz, n, mu\n")

    def append(self, density: np.ndarray, mobility: np.ndarray) -> None:
        cfg = self.cfg
        from . import native

        blob = native.format_local_rows(
            np.asarray(density), np.asarray(mobility), cfg.ncx, cfg.ncz
        )
        if blob is None:
            dv = np.asarray(density).reshape(cfg.ncx, cfg.ncx, cfg.ncz)
            mv = np.asarray(mobility).reshape(cfg.ncx, cfg.ncx, cfg.ncz)
            lines = []
            for i in range(cfg.ncx):
                for j in range(cfg.ncx):
                    for k in range(cfg.ncz):
                        lines.append(
                            f"{i}, {j}, {k}, {dv[i, j, k]}, {mv[i, j, k]}\n"
                        )
            blob = "".join(lines).encode()
        with open(self.path, "ab") as f:
            f.write(blob)


def write_data_csv(
    d: Path,
    cfg: SMCConfig,
    energy_trace: np.ndarray,
    pressure_trace: np.ndarray,
    accept_trace: np.ndarray,
    gather_lapse: int,
    rank: int = 0,
) -> Path:
    """data csv: per-gather rows 'E, P, jj' (SMC.c:214-215).

    Faithful to the reference's sampling: E subsampled at k*gather_lapse
    from the full trace (index 0 = initial energy), P the k-th gather, and
    jj the k-th SWEEP's acceptance count (the reference's E-vs-jj index
    mismatch is reproduced for schema parity, SURVEY §7.4)."""
    p = _fname(d, "data", cfg, rank)
    gather_steps = len(pressure_trace)
    with open(p, "w") as f:
        f.write("E, P, jj\n")
        for k in range(gather_steps):
            idx = k * gather_lapse
            e = float(energy_trace[idx]) if idx < len(energy_trace) else 0.0
            jj = int(accept_trace[k]) if k < len(accept_trace) else 0
            f.write(f"{e:0.9f}, {pressure_trace[k]:0.9f}, {jj}\n")
    return p


def write_total_clusters_csv(
    d: Path, cfg: SMCConfig, l1: float, l2: np.ndarray, l3: np.ndarray, rank: int = 0
) -> Path:
    """total_clusters csv. The reference writes the header and then never
    writes a row (SMC.c:89-92); we write the actual histograms."""
    p = _fname(d, "total_clusters", cfg, rank)
    with open(p, "w") as f:
        f.write("l1, l2, l3\n")
        for s in range(len(l2)):
            f.write(f"{l1 if s == 0 else 0:0.9f}, {l2[s]:0.9f}, {l3[s]:0.9f}\n")
    return p


def write_autocorrelation_csv(
    d: Path, cfg: SMCConfig, acf: np.ndarray, rank: int = 0
) -> Path:
    p = _fname(d, "autocorrelation", cfg, rank)
    with open(p, "w") as f:
        f.write("CH\n")
        for v in np.asarray(acf):
            f.write(f"{v:0.6f}\n")
    return p


def write_ensemble_data_csv(
    d: Path,
    cfg: SMCConfig,
    chains,                 # list[SimResults] (driver_ensemble per-chain)
    gather_lapse: int,
) -> Path | None:
    """Pooled ensemble data: `data_ensemble_*.csv`, one row per gather with
    the CROSS-CHAIN mean/spread of E, mean P and mean acceptance count.

    This is the aggregation the reference's replica model left to offline
    filesystem scripts (per-rank data_*_rank%d.csv only, SMC.c:75-77,
    SURVEY §5.8). Schema: `E_mean, E_std, P_mean, jj_mean` with the same
    per-gather sampling convention as the per-rank files (E at k*lapse
    from the full trace, jj the k-th sweep's acceptance count).
    Returns None when no chain carries traces (--no-trace runs)."""
    if not chains:
        return None
    e_tr = np.stack([np.asarray(c.energy_trace_full) for c in chains], axis=1)
    a_tr = np.stack([np.asarray(c.accept_trace) for c in chains], axis=1)
    if e_tr.size == 0 or a_tr.size == 0:
        return None  # --no-trace runs carry no per-sweep data to pool
    p_tr = np.stack([np.asarray(c.pressure_trace) for c in chains], axis=1)
    gather_steps = p_tr.shape[0]
    p = _fname(d, "data_ensemble", cfg)
    with open(p, "w") as f:
        f.write("E_mean, E_std, P_mean, jj_mean\n")
        for k in range(gather_steps):
            idx = k * gather_lapse
            if idx < e_tr.shape[0]:
                em = float(e_tr[idx].mean())
                es = float(e_tr[idx].std())
            else:
                em = es = 0.0
            jj = float(a_tr[k].mean()) if k < a_tr.shape[0] else 0.0
            f.write(f"{em:0.9f}, {es:0.9f}, {float(p_tr[k].mean()):0.9f}, "
                    f"{jj:0.4f}\n")
    return p


def write_profile_csv(
    d: Path, cfg: SMCConfig, stem: str, centers: np.ndarray,
    values: np.ndarray, header: str, rank: int = 0,
) -> Path:
    """g(r) / z-profile CSVs (new observables; no reference counterpart)."""
    p = _fname(d, stem, cfg, rank)
    with open(p, "w") as f:
        f.write(header + "\n")
        for c, v in zip(np.asarray(centers), np.asarray(values)):
            f.write(f"{c:0.6f}, {v:0.9f}\n")
    return p


def write_widom_csv(
    d: Path, cfg: SMCConfig, centers: np.ndarray, mu: np.ndarray,
    err: np.ndarray, counts: np.ndarray, mu_global: float,
    err_global: float, rank: int = 0,
) -> Path:
    """Widom mu_ex(z) profile + the volume-averaged scalar in the header
    (free-energy layer; no reference counterpart)."""
    p = _fname(d, "widom", cfg, rank)
    with open(p, "w") as f:
        f.write(f"# mu_ex_global, {mu_global:0.9f}, {err_global:0.9f}\n")
        f.write("z, mu_ex, err, insertions\n")
        for zc, m, e, n in zip(np.asarray(centers), np.asarray(mu),
                               np.asarray(err), np.asarray(counts)):
            f.write(f"{zc:0.6f}, {m:0.9f}, {e:0.9f}, {int(n)}\n")
    return p


def write_info_csv(
    d: Path, cfg: SMCConfig, params: RunParams, results, gamma: float | None = None
) -> Path:
    """info csv, field-for-field with main.c:141-159."""
    gamma = cfg.gamma if gamma is None else gamma
    p = _fname(d, "info", cfg)
    l = cfg.box_l
    lz = cfg.box_lz
    with open(p, "w") as f:
        f.write(f"\nEquilibration steps: {params.eqsteps}")
        f.write(f"\nSimulation steps: {params.maxsteps}")
        f.write(f"\nNumber of data: {params.numdata}")
        f.write(f"\nBox dimensions: {l:0.1f} * {l:0.1f} * {lz:0.1f}")
        f.write(f"\nCells grid: {cfg.ncx} * {cfg.ncx} * {cfg.ncz}")
        f.write(f"\nParticle density: {cfg.rho:0.4f}")
        f.write(
            f"\nAverage interparticle distance: ~{(l * l * lz / cfg.n) ** (1 / 3) / 2:0.3f}"
        )
        f.write(
            "\nWall elements distance / interparticle distance: "
            f"~{(l / cfg.m) / ((l * l * lz / cfg.n) ** (1 / 3)) / 2:0.3f}"
        )
        f.write(f"\nA used: {cfg.proposal_a:0.3f} ({gamma:0.3f} * kT)")
        f.write(f"\nMean energy: {results.mean_energy:f} ± {results.std_energy:f}")
        f.write(
            f"\nMean pressure: {results.mean_pressure:f} ± {results.std_pressure:f}"
        )
        f.write(f"\nApproximate heat capacity: {results.cv:f}")
        f.write(f"\nAverage autocorrelation time: {results.tau:f}")
        f.write(f"\nAverage acceptance ratio: {results.acceptance_ratio:f}")
        f.write(f"\nCutoff used for the local cluster analysis: {cfg.lca_cutoff:f}")
        f.write(
            "\nl2[0] = {:0.11f}\tl2[1] = {:0.11f}\tl2[2] = {:0.11f}\t"
            "l2[3] = {:0.11f}\tl2[4] = {:0.11f}\tl2[5] = {:0.11f}".format(
                *results.l2[:6]
            )
        )
        f.write(
            "\nl3[0] = {:0.11f}\tl3[1] = {:0.11f}\tl3[2] = {:0.11f}\t"
            "l3[3] = {:0.11f}\tl3[4] = {:0.11f}\tl3[5] = {:0.11f}\n".format(
                *results.l3[:6]
            )
        )
    return p


def write_last_state(d: Path, cfg: SMCConfig, r: np.ndarray) -> Path:
    """last_state csv: single row of 3N %0.12f doubles (main.c:163-171)."""
    p = _fname(d, "last_state", cfg)
    flat = np.asarray(r).reshape(-1)
    with open(p, "w") as f:
        f.write("".join(f"{v:0.12f}," for v in flat))
    return p


def load_last_state(d: Path, cfg: SMCConfig) -> Optional[np.ndarray]:
    """Warm start: read last_state if a run with the same (N, M, rho, T)
    key exists (main.c:98-113). Returns [N, 3] or None."""
    p = _fname(d, "last_state", cfg)
    if not p.exists():
        return None
    vals = [float(v) for v in p.read_text().strip().split(",") if v]
    if len(vals) != 3 * cfg.n:
        raise ValueError(f"{p} holds {len(vals)} values, expected {3 * cfg.n}")
    return np.asarray(vals).reshape(cfg.n, 3)


# ----------------------------------------------------------------------
# Full-state checkpointing (beyond the reference's positions-only resume)
# ----------------------------------------------------------------------

def atomic_savez(path: Path, **arrays) -> None:
    """Crash-safe checkpoint write with one-generation rotation.

    Multi-hour production runs rewrite the same --auto-checkpoint file
    hundreds of times; an in-place np.savez corrupts the ONLY copy if
    the process dies mid-write (SIGKILL, OOM, power). Write to a temp
    file in the same directory, rotate any existing checkpoint to
    `<stem>.prev.npz`, then atomically rename the temp into place — at
    every instant either the old or the new complete checkpoint exists,
    and the previous generation survives as .prev for manual recovery."""
    tmp = path.with_name(path.name + ".tmp")
    with open(tmp, "wb") as fh:
        np.savez(fh, **arrays)
    if path.exists():
        os.replace(path, path.with_name(path.stem + ".prev.npz"))
    os.replace(tmp, path)


def save_checkpoint(path: str | Path, state: ChainState, cfg: SMCConfig) -> Path:
    """Persist the complete chain (or ensemble) state + config.

    Returns the path actually written: np.savez silently appends '.npz'
    when the suffix is missing, so normalize first — otherwise the caller
    prints a path that --resume can't find (ADVICE r1)."""
    path = Path(path)
    if path.suffix != ".npz":
        path = path.with_name(path.name + ".npz")
    path.parent.mkdir(parents=True, exist_ok=True)
    arrays = {
        "r": np.asarray(state.r),
        "energy": np.asarray(state.energy),
        "key": np.asarray(jax.random.key_data(state.key)),
        "sweeps": np.asarray(state.sweeps),
        "accepted": np.asarray(state.accepted),
        "rbin": np.asarray(state.rbin),
        "density": np.asarray(state.density),
        "mobility": np.asarray(state.mobility),
    }
    cfg_json = json.dumps(
        {f: getattr(cfg, f) for f in cfg.__dataclass_fields__}
    )
    atomic_savez(path, __config__=np.frombuffer(cfg_json.encode(),
                                                dtype=np.uint8), **arrays)
    return path


def load_checkpoint(path: str | Path) -> tuple[ChainState, SMCConfig]:
    data = np.load(path)
    cfg_json = bytes(data["__config__"]).decode()
    cfg = SMCConfig(**json.loads(cfg_json))
    if cfg.dtype == "float64" and not jax.config.jax_enable_x64:
        # Must happen BEFORE constructing the state arrays or jnp silently
        # downcasts them to float32 and the restored chain is corrupted.
        jax.config.update("jax_enable_x64", True)
    dtype = cfg.jnp_dtype
    state = ChainState(
        r=jnp.asarray(data["r"], dtype),
        energy=jnp.asarray(data["energy"], dtype),
        key=jax.random.wrap_key_data(jnp.asarray(data["key"])),
        sweeps=jnp.asarray(data["sweeps"], jnp.int32),
        accepted=jnp.asarray(data["accepted"], jnp.int32),
        rbin=jnp.asarray(data["rbin"], jnp.int32),
        density=jnp.asarray(data["density"], jnp.uint32),
        mobility=jnp.asarray(data["mobility"], jnp.uint32),
    )
    return state, cfg
