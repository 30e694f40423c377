"""Persistence tests: reference-schema outputs, warm start, checkpoints."""

import subprocess
from pathlib import Path

import jax
import numpy as np
import pytest

from tpu_smc import io as smcio
from tpu_smc.config import RunParams, SMCConfig
from tpu_smc.driver import ObservableOptions, simulate
from tpu_smc.state import init_chain_state

CFG = SMCConfig(dtype="float64", storage_time=5)


def _tiny_run(tmp_path, seed=0):
    params = RunParams(eqsteps=20, maxsteps=100, numdata=10)
    state, w = init_chain_state(CFG, jax.random.key(seed))
    d = smcio.run_dir(CFG, tmp_path / "Data")
    pos = smcio.PositionsWriter(d, CFG)
    pos.append(np.asarray(state.r))
    state, res = simulate(CFG, params, state, w)
    return d, params, state, res


def test_output_file_set_and_headers(tmp_path):
    d, params, state, res = _tiny_run(tmp_path)
    from tpu_smc.system import build_walls

    _, x0, ym = build_walls(CFG)
    smcio.write_wall_csv(d, CFG, x0, ym)
    smcio.write_data_csv(d, CFG, res.energy_trace_full, res.pressure_trace,
                         res.accept_trace, params.gather_lapse)
    smcio.LocalWriter(d, CFG, "local").append(res.density, res.mobility)
    smcio.LocalWriter(d, CFG, "local_temp").append(res.density, res.mobility)
    smcio.write_total_clusters_csv(d, CFG, res.l1, res.l2, res.l3)
    smcio.write_autocorrelation_csv(d, CFG, res.acf)
    smcio.write_info_csv(d, CFG, params, res)
    smcio.write_last_state(d, CFG, res.r_final)

    key = CFG.file_key()
    expected = {
        f"wall_{key}.csv": "nx, ny, x0, ymin",
        f"positions_{key}_rank0.csv": "x1,y1,z1,",
        f"data_{key}_rank0.csv": "E, P, jj",
        f"local_{key}_rank0.csv": "nx, ny, nz, n, mu",
        f"local_temp_{key}_rank0.csv": "nx, ny, nz, n, mu",
        f"total_clusters_{key}_rank0.csv": "l1, l2, l3",
        f"autocorrelation_{key}_rank0.csv": "CH",
        f"last_state_{key}.csv": None,
        f"info_{key}.csv": None,
    }
    for fname, header in expected.items():
        p = d / fname
        assert p.exists(), fname
        if header is not None:
            assert p.read_text().splitlines()[0].startswith(header), fname

    # data.csv row count = gather_steps (SMC.c:214)
    rows = (d / f"data_{key}_rank0.csv").read_text().strip().splitlines()
    assert len(rows) - 1 == params.gather_steps
    # local rows = ncx*ncx*ncz (SMC.c:218-225)
    rows = (d / f"local_{key}_rank0.csv").read_text().strip().splitlines()
    assert len(rows) - 1 == CFG.ncx * CFG.ncx * CFG.ncz


@pytest.mark.c_reference
def test_file_set_matches_c_reference(tmp_path):
    """Run the actual C binary and compare the artifact sets + headers."""
    from parity.reference import build_reference_main

    exe = build_reference_main(108)
    cdir = tmp_path / "cref"
    cdir.mkdir()
    subprocess.run(
        [str(exe), "20", "100", "10", "1.10"],
        cwd=cdir, check=True, capture_output=True, timeout=300,
    )
    run_dirs = list((cdir / "Data").iterdir())
    assert len(run_dirs) == 1
    c_files = {p.name for p in run_dirs[0].iterdir()}

    d, params, state, res = _tiny_run(tmp_path, seed=1)
    from tpu_smc.system import build_walls

    _, x0, ym = build_walls(CFG)
    smcio.write_wall_csv(d, CFG, x0, ym)
    smcio.write_data_csv(d, CFG, res.energy_trace_full, res.pressure_trace,
                         res.accept_trace, params.gather_lapse)
    smcio.LocalWriter(d, CFG, "local").append(res.density, res.mobility)
    smcio.LocalWriter(d, CFG, "local_temp").append(res.density, res.mobility)
    smcio.write_total_clusters_csv(d, CFG, res.l1, res.l2, res.l3)
    smcio.write_autocorrelation_csv(d, CFG, res.acf)
    smcio.write_info_csv(d, CFG, params, res)
    smcio.write_last_state(d, CFG, res.r_final)
    our_files = {p.name for p in d.iterdir()}

    assert run_dirs[0].name == d.name  # identical config-keyed naming
    assert c_files == our_files
    # header lines match exactly for the data files
    for name in sorted(c_files):
        c_first = (run_dirs[0] / name).read_text().splitlines()[:1]
        our_first = (d / name).read_text().splitlines()[:1]
        if name.startswith(("data", "local", "total_clusters",
                            "autocorrelation", "wall")):
            assert c_first == our_first, name


def test_last_state_roundtrip(tmp_path):
    d = smcio.run_dir(CFG, tmp_path / "Data")
    rng = np.random.default_rng(0)
    r = rng.uniform(-10, 10, (CFG.n, 3))
    smcio.write_last_state(d, CFG, r)
    r2 = smcio.load_last_state(d, CFG)
    np.testing.assert_allclose(r2, r, atol=1e-12)  # %0.12f format


def test_warm_start_missing_returns_none(tmp_path):
    d = smcio.run_dir(CFG, tmp_path / "Data")
    assert smcio.load_last_state(d, CFG) is None


def test_checkpoint_roundtrip_exact(tmp_path):
    state, w = init_chain_state(CFG, jax.random.key(3))
    p = smcio.save_checkpoint(tmp_path / "ck.npz", state, CFG)
    state2, cfg2 = smcio.load_checkpoint(p)
    assert cfg2 == CFG
    import jax.numpy as jnp
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(state2)):
        if jnp.issubdtype(a.dtype, jax.dtypes.prng_key):
            a, b = jax.random.key_data(a), jax.random.key_data(b)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_resume_continues_identically(tmp_path):
    """Run 40 sweeps; vs run 20, checkpoint, reload, run 20 more."""
    from tpu_smc.sampler import run_sweeps

    state, w = init_chain_state(CFG, jax.random.key(4))
    full, _ = jax.jit(
        lambda s: run_sweeps(s, w, CFG, CFG.proposal_a, 40, collect_trace=False)
    )(state)

    half, _ = jax.jit(
        lambda s: run_sweeps(s, w, CFG, CFG.proposal_a, 20, collect_trace=False)
    )(state)
    p = smcio.save_checkpoint(tmp_path / "half.npz", half, CFG)
    half2, _ = smcio.load_checkpoint(p)
    resumed, _ = jax.jit(
        lambda s: run_sweeps(s, w, CFG, CFG.proposal_a, 20, collect_trace=False)
    )(half2)

    np.testing.assert_array_equal(np.asarray(full.r), np.asarray(resumed.r))
    np.testing.assert_array_equal(
        np.asarray(full.accepted), np.asarray(resumed.accepted)
    )


def test_checkpoint_path_suffix_normalized(tmp_path):
    """np.savez silently appends .npz; save_checkpoint must return the
    path actually written so --resume with the printed path works."""
    import jax

    from tpu_smc.config import SMCConfig
    from tpu_smc.state import init_chain_state

    cfg = SMCConfig(n=12, box_l=10.0, box_lz=30.0)
    state, _ = init_chain_state(cfg, jax.random.key(0))
    p = smcio.save_checkpoint(tmp_path / "ck", state, cfg)
    assert p.suffix == ".npz" and p.exists()
    st2, cfg2 = smcio.load_checkpoint(p)
    np.testing.assert_array_equal(np.asarray(st2.r), np.asarray(state.r))
    assert cfg2 == cfg


def test_broadcast_resumed_chain_keeps_counters_once(tmp_path):
    """Resume-to-ensemble broadcast keeps cumulative voxel history in
    chain 0 only (pooled CSVs would otherwise count it C times)."""
    import jax
    import jax.numpy as jnp

    from tpu_smc.config import SMCConfig
    from tpu_smc.state import broadcast_resumed_chain, init_chain_state

    cfg = SMCConfig(n=12, box_l=10.0, box_lz=30.0)
    state, _ = init_chain_state(cfg, jax.random.key(0))
    state = state._replace(
        density=state.density + jnp.uint32(7),
        mobility=state.mobility + jnp.uint32(3),
    )
    b = broadcast_resumed_chain(state, 4)
    assert int(b.density[0].sum()) == 7 * cfg.n_voxels
    assert int(b.density[1:].sum()) == 0
    assert int(b.mobility[0].sum()) == 3 * cfg.n_voxels
    assert int(b.mobility[1:].sum()) == 0
    # everything else replicates
    np.testing.assert_array_equal(np.asarray(b.r[2]), np.asarray(state.r))


def test_ensemble_pooled_data_csv(tmp_path):
    """The CLI writes data_ensemble_*.csv with cross-chain per-gather
    means next to the per-rank files (VERDICT r1 #6)."""
    import subprocess as sp
    import sys

    env = {"PYTHONPATH": str(Path(__file__).resolve().parent.parent),
           "PATH": "/usr/bin:/bin"}
    r = sp.run(
        [sys.executable, "-m", "tpu_smc", "20", "60", "6", "1.1",
         "--platform", "cpu", "--dtype", "float32", "--seed", "5",
         "--chains", "3", "--data-dir", str(tmp_path)],
        capture_output=True, text=True, env=env, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    run_dir = next(tmp_path.iterdir())
    pooled = list(run_dir.glob("data_ensemble_*.csv"))
    assert len(pooled) == 1
    lines = pooled[0].read_text().strip().splitlines()
    assert lines[0] == "E_mean, E_std, P_mean, jj_mean"
    assert len(lines) == 1 + 6  # header + one row per gather
    # pooled mean at gather k must equal the mean of the per-rank rows
    import numpy as _np

    ranks = sorted(run_dir.glob("data_*_rank*.csv"))
    assert len(ranks) == 3
    per_rank_e = _np.stack([
        _np.asarray([float(l.split(",")[0])
                     for l in p.read_text().strip().splitlines()[1:]])
        for p in ranks
    ])
    pooled_e = _np.asarray([float(l.split(",")[0]) for l in lines[1:]])
    _np.testing.assert_allclose(pooled_e, per_rank_e.mean(axis=0), rtol=1e-6)


def test_checkpoint_atomic_rotation(tmp_path):
    """save_checkpoint is crash-safe for multi-hour --auto-checkpoint
    runs: it writes a temp file, rotates the previous checkpoint to
    <stem>.prev.npz, and renames atomically — so a kill mid-write can
    never corrupt the only copy, and the prior generation stays
    loadable (io.atomic_savez)."""
    import jax

    from tpu_smc.config import SMCConfig
    from tpu_smc.state import init_ensemble_state

    cfg = SMCConfig(dtype="float32")
    st, _ = init_ensemble_state(cfg, jax.random.key(0), 4)
    p = smcio.save_checkpoint(tmp_path / "ck.npz", st, cfg)
    st2 = st._replace(sweeps=st.sweeps + 7)
    smcio.save_checkpoint(p, st2, cfg)
    assert not (tmp_path / "ck.npz.tmp").exists()
    prev, _ = smcio.load_checkpoint(tmp_path / "ck.prev.npz")
    cur, _ = smcio.load_checkpoint(p)
    assert int(np.asarray(cur.sweeps).ravel()[0]) \
        == int(np.asarray(prev.sweeps).ravel()[0]) + 7
    np.testing.assert_array_equal(np.asarray(prev.r), np.asarray(st.r))
