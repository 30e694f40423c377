"""Quenched wall-disorder ensembles (--wall-realizations).

Beyond-reference capability: the C code's wall is frozen at srand(42)
for every run AND every MPI rank (SMC.c:477), so disorder averaging is
impossible there. Here K wall realizations become per-chain wall tables
([C, M*M, 2]) riding the existing chain vmap — one compiled program
samples every realization simultaneously.
"""

import jax
import numpy as np
import pytest

from tpu_smc.config import SMCConfig
from tpu_smc.system import build_wall_ensemble, build_walls


def test_wall_ensemble_realizations():
    cfg = SMCConfig(n=16, box_l=10.0, box_lz=30.0)
    w_k, x0_k, ym_k = build_wall_ensemble(cfg, 3, base_seed=42)
    assert w_k.shape == (3, cfg.m * cfg.m, 2)
    assert x0_k.shape == ym_k.shape == (3, cfg.m * cfg.m)
    # realization 0 with the default base seed IS the reference's
    # srand(42) wall, bit for bit
    w0, x0, ym = build_walls(cfg)
    np.testing.assert_array_equal(w_k[0], w0)
    np.testing.assert_array_equal(x0_k[0], x0)
    np.testing.assert_array_equal(ym_k[0], ym)
    # distinct realizations differ
    assert not np.array_equal(w_k[1], w_k[0])
    assert not np.array_equal(w_k[2], w_k[1])
    assert np.isfinite(w_k).all()
    # a different base seed reproduces deterministically
    w_b, _, _ = build_wall_ensemble(cfg, 2, base_seed=7)
    w_b2, _, _ = build_wall_ensemble(cfg, 2, base_seed=7)
    np.testing.assert_array_equal(w_b, w_b2)
    assert not np.array_equal(w_b[0], w0)


def test_per_chain_walls_bitwise_vs_separate_runs():
    """A 4-chain ensemble with per-chain tables [w0, w0, w1, w1] follows
    BITWISE the same trajectories as two 2-chain ensembles run with the
    shared table w0 / w1 (same seed chain, same global chain offsets,
    same per-sweep offset stream)."""
    from tpu_smc.ensemble import ensemble_sweeps
    from tpu_smc.state import batch_chain_state, init_chain_state

    cfg = SMCConfig(n=16, box_l=10.0, box_lz=30.0, dtype="float32")
    w_k, _, _ = build_wall_ensemble(cfg, 2, base_seed=42)
    key = jax.random.key(11)

    # combined run: per-chain tables
    st0, _ = init_chain_state(cfg, key, w=w_k[0])
    comb = batch_chain_state(st0, 4)
    w_b = jax.numpy.asarray(np.repeat(w_k, 2, axis=0), cfg.jnp_dtype)
    comb, _ = ensemble_sweeps(comb, w_b, cfg, cfg.proposal_a, 12,
                              stream_seed=5)

    # split runs: shared table per group, global chain offsets
    for g, lo in ((0, 0), (1, 2)):
        stg, wg = init_chain_state(cfg, key, w=w_k[g])
        grp = batch_chain_state(stg, 2, chain_offset=lo)
        grp, _ = ensemble_sweeps(grp, wg, cfg, cfg.proposal_a, 12,
                                 stream_seed=5)
        np.testing.assert_array_equal(np.asarray(comb.r[lo:lo + 2]),
                                      np.asarray(grp.r))
        np.testing.assert_array_equal(np.asarray(comb.accepted[lo:lo + 2]),
                                      np.asarray(grp.accepted))


def test_disorder_cli_end_to_end(tmp_path, capsys):
    from tpu_smc.cli import main

    rc = main(["20", "60", "12", "1.10", "--n", "12", "--chains", "4",
               "--wall-realizations", "2", "--wall-seed", "42",
               "--seed", "3", "--platform", "cpu",
               "--z-bins", "8", "--gr-bins", "6",
               "--data-dir", str(tmp_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Quenched wall disorder: 2 realizations x 2 chains" in out
    assert "Disorder-averaged energy:" in out
    assert "realization 1 (wall seed 43):" in out

    run = next(tmp_path.iterdir())
    wall = next(p for p in run.iterdir() if p.name.startswith("wall_"))
    lines = wall.read_text().strip().splitlines()
    assert lines[0] == "k, nx, ny, x0, ymin"
    cfgm = 3
    assert len(lines) == 1 + 2 * cfgm * cfgm
    # realization 0 rows are the reference's wall draws
    cfg = SMCConfig.for_n(12, temperature=1.10)
    _, x0, ym = build_walls(cfg)
    first = lines[1].split(",")
    assert first[0].strip() == "0"
    assert float(first[3]) == pytest.approx(x0[0], abs=1e-6)

    # disorder-RESOLVED profiles: one row per (k, bin), and the mean over
    # realizations equals the pooled (disorder-averaged) profile
    zd = next(p for p in run.iterdir()
              if p.name.startswith("zprofile_disorder"))
    rows = np.genfromtxt(zd, delimiter=",", skip_header=1)
    assert rows.shape == (2 * 8, 3)
    pooled = np.genfromtxt(
        next(p for p in run.iterdir() if p.name.startswith("zprofile_N")),
        delimiter=",", skip_header=1)
    per_k = rows[:, 2].reshape(2, 8)
    np.testing.assert_allclose(per_k.mean(axis=0), pooled[:, 1],
                               rtol=1e-5, atol=1e-9)   # CSV rounding
    gd = next(p for p in run.iterdir() if p.name.startswith("gr_disorder"))
    assert len(gd.read_text().strip().splitlines()) == 1 + 2 * 6

    # the analysis renderer handles the 5-column wall schema and the
    # disorder-profile panels
    from tpu_smc.analysis import load_run, render_all

    plots = tmp_path / "plots"
    written = render_all(load_run(run), plots)
    assert any(p.name.startswith("wall_") for p in written)
    assert any(p.name.startswith("zprofile_disorder_") for p in written)
    assert any(p.name.startswith("gr_disorder_") for p in written)


def test_disorder_sharded_mesh(tmp_path, capsys):
    """Per-chain wall tables under GSPMD: 8 chains / 4 realizations
    sharded over the 8 virtual CPU devices."""
    from tpu_smc.cli import main

    rc = main(["10", "40", "8", "1.10", "--n", "12", "--chains", "8",
               "--wall-realizations", "4", "--seed", "3",
               "--platform", "cpu", "--data-dir", str(tmp_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Sharding 8 chains over 8 devices" in out
    assert "Quenched wall disorder: 4 realizations x 2 chains" in out
    assert "Disorder-averaged energy:" in out


def test_disorder_two_process_bitwise(tmp_path):
    """Per-chain wall tables slice by GLOBAL chain index, so a 2-process
    disorder run is bitwise the single-process one (XLA engine, global
    key streams) — pooled ensemble CSV compared textually."""
    import os
    import socket
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    run_args = ["20", "60", "12", "1.10", "--n", "12", "--chains", "8",
                "--wall-realizations", "4", "--seed", "7",
                "--platform", "cpu"]

    def env(n_dev):
        e = dict(os.environ)
        e["PYTHONPATH"] = str(repo)
        e["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_dev}"
        e["JAX_PLATFORMS"] = "cpu"
        return e

    sdata = tmp_path / "single" / "Data"
    proc = subprocess.run(
        [sys.executable, "-m", "tpu_smc", *run_args,
         "--data-dir", str(sdata)],
        cwd=tmp_path, env=env(1), capture_output=True, text=True,
        timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]

    mdata = tmp_path / "multi" / "Data"
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    base = [sys.executable, "-m", "tpu_smc", *run_args,
            "--data-dir", str(mdata),
            "--coordinator", f"localhost:{port}", "--num-processes", "2"]
    procs = [subprocess.Popen(base + ["--process-id", str(i)],
                              cwd=tmp_path, env=env(4),
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    assert "Quenched wall disorder: 4 realizations x 2 chains" in outs[0]
    assert "Disorder-averaged energy:" in outs[0]

    srun, mrun = next(sdata.iterdir()), next(mdata.iterdir())
    s = next(srun.glob("data_ensemble_*.csv")).read_text()
    m = next(mrun.glob("data_ensemble_*.csv")).read_text()
    assert s == m
    # the printed disorder summary agrees numerically (the multi-process
    # per-chain means ride a float32 allgather, so the last digit of the
    # f64-formatted summary can differ; the trajectories above are
    # bitwise)
    def summary(text):
        l = next(x for x in text.splitlines()
                 if x.startswith("Disorder-averaged energy:"))
        parts = l.split()
        return float(parts[2]), float(parts[4])

    se_s, err_s = summary(proc.stdout)
    se_m, err_m = summary(outs[0])
    assert se_s == pytest.approx(se_m, abs=1e-4)
    assert err_s == pytest.approx(err_m, abs=1e-4)


def test_ladder_per_chain_walls_identical_rows_bitwise():
    """Plumbing identity: a ladder run with per-chain tables that are
    all the SAME row is bitwise a run with the shared table."""
    import jax.numpy as jnp

    from tpu_smc.state import init_ensemble_state
    from tpu_smc.tsweep import _multi_t_block

    cfg = SMCConfig(n=16, box_l=10.0, box_lz=30.0, dtype="float32")
    state, w = init_ensemble_state(cfg, jax.random.key(4), 6)
    temps_c = jnp.asarray(np.repeat([1.0, 1.2], 3), cfg.jnp_dtype)
    a, _ = _multi_t_block(state, w, cfg, temps_c, 1.0, 8)
    w3 = jnp.broadcast_to(w, (6,) + w.shape)
    b, _ = _multi_t_block(state, w3, cfg, temps_c, 1.0, 8)
    np.testing.assert_array_equal(np.asarray(a.r), np.asarray(b.r))
    np.testing.assert_array_equal(np.asarray(a.energy),
                                  np.asarray(b.energy))


def test_disorder_pt_keeps_slot_walls_consistent():
    """PT with slot-indexed per-chain walls: swaps travel the
    temperature axis within a replica column, so the carried energies
    stay consistent with each slot's own wall table (recompute check)."""
    from tpu_smc.config import RunParams
    from tpu_smc.pt import simulate_parallel_tempering
    from tpu_smc.tsweep import _per_chain_energy

    cfg = SMCConfig(n=16, box_l=12.0, box_lz=40.0, dtype="float32")
    params = RunParams(eqsteps=40, maxsteps=160, numdata=40)
    temps = [1.0, 1.2]
    k, cpt = 2, 4
    w_k, _, _ = build_wall_ensemble(cfg, k)
    w = np.tile(np.repeat(w_k, cpt // k, axis=0), (len(temps), 1, 1))
    lstate, res = simulate_parallel_tempering(
        cfg, params, temps, jax.random.key(9), chains_per_t=cpt,
        exchange_interval=5, w=w)
    assert int(res.swap_attempts.sum()) > 0
    exact = np.asarray(_per_chain_energy(
        lstate.r, jax.numpy.asarray(w, cfg.jnp_dtype), cfg))
    drift = np.abs(exact - np.asarray(lstate.energy)).max()
    assert drift < 1e-2, f"energy inconsistent with slot walls: {drift}"


def test_reweight_disorder_k1_equals_plain():
    from tpu_smc.config import RunParams
    from tpu_smc.reweight import (reweight_disorder_ladder,
                                  reweight_from_ladder)
    from tpu_smc.tsweep import simulate_temperature_sweep

    cfg = SMCConfig(n=16, box_l=12.0, box_lz=40.0, dtype="float32")
    params = RunParams(eqsteps=60, maxsteps=200, numdata=50)
    _, res = simulate_temperature_sweep(
        cfg, params, [1.0, 1.2], jax.random.key(5), chains_per_t=8)
    grid = [1.0, 1.1, 1.2]
    plain = reweight_from_ladder(res, cfg, grid)
    comb, parts = reweight_disorder_ladder(res, cfg, grid, 1)
    assert len(parts) == 1
    np.testing.assert_allclose(comb.mean_energy, plain.mean_energy,
                               rtol=1e-6)
    np.testing.assert_allclose(comb.free_energy, plain.free_energy,
                               atol=1e-6)
    np.testing.assert_array_equal(comb.err_energy, 0.0)

    # K=2 partitions the replicas: each part reweights half
    comb2, parts2 = reweight_disorder_ladder(res, cfg, grid, 2)
    assert len(parts2) == 2
    assert comb2.err_energy.shape == (3,)
    assert (comb2.err_energy >= 0).all()
    np.testing.assert_allclose(
        comb2.mean_energy,
        0.5 * (parts2[0].mean_energy + parts2[1].mean_energy), rtol=1e-6)

    import pytest as _pt
    with _pt.raises(ValueError, match="divide"):
        reweight_disorder_ladder(res, cfg, grid, 3)


def test_disorder_ladder_cli_end_to_end(tmp_path, capsys):
    from tpu_smc.cli import main

    rc = main(["30", "90", "30", "1.10", "--n", "12",
               "--temperatures", "1.0,1.2", "--chains-per-t", "4",
               "--wall-realizations", "2", "--reweight", "1.0:1.2:3",
               "--z-bins", "8", "--seed", "5", "--platform", "cpu",
               "--data-dir", str(tmp_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Quenched wall disorder ladder: 2 realizations x 2 replicas" \
        in out
    assert "quenched average over 2 wall realizations" in out
    run = next(tmp_path.iterdir())
    rw = next(p for p in run.iterdir()
              if p.name.startswith("reweight_N"))
    header = rw.read_text().splitlines()[0]
    assert "E_err" in header and "cv_err" in header  # disorder SE columns
    assert any(p.name.startswith("reweight_pmf") for p in run.iterdir())
    # per-realization curves: k column, mean over k = the combined curve
    rwd = next(p for p in run.iterdir()
               if p.name.startswith("reweight_disorder"))
    dl = rwd.read_text().strip().splitlines()
    assert dl[0].startswith("k, T, E_mean, cv")
    assert len(dl) == 1 + 2 * 3   # 2 realizations x 3 grid temps
    drows = np.genfromtxt(rwd, delimiter=",", skip_header=1)
    crows = np.genfromtxt(rw, delimiter=",", skip_header=1)
    np.testing.assert_allclose(
        drows[:, 2].reshape(2, 3).mean(axis=0), crows[:, 1], atol=1e-6)
    wall = next(p for p in run.iterdir() if p.name.startswith("wall_"))
    assert wall.read_text().startswith("k, nx, ny, x0, ymin")

    # the per-realization MBAR panel renders (needs the standard
    # artifacts beside it — drop a same-key standard run first)
    rc2 = main(["10", "40", "4", "1.10", "--n", "12", "--seed", "5",
                "--platform", "cpu", "--data-dir", str(tmp_path)])
    assert rc2 == 0
    capsys.readouterr()
    from tpu_smc.analysis import load_run, render_all

    written = render_all(load_run(run), tmp_path / "plots")
    assert any(p.name.startswith("reweight_disorder_") for p in written)

    # PT variant composes too
    rc = main(["30", "90", "30", "1.10", "--n", "12",
               "--temperatures", "1.0,1.2", "--chains-per-t", "4",
               "--wall-realizations", "2", "--pt-exchange", "5",
               "--seed", "5", "--platform", "cpu",
               "--data-dir", str(tmp_path / "pt")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Replica-exchange swap acceptance" in out

    # guard: chains-per-t must divide
    with pytest.raises(SystemExit):
        main(["10", "20", "4", "1.10", "--n", "12",
              "--temperatures", "1.0,1.2", "--chains-per-t", "3",
              "--wall-realizations", "2", "--platform", "cpu",
              "--data-dir", str(tmp_path / "bad")])


def test_wall_seed_single_chain(tmp_path):
    """--wall-seed changes the single-chain wall (and the wall CSV);
    the default reproduces the reference's srand(42) file byte-for-byte."""
    from tpu_smc.cli import main

    for seed, sub in ((None, "d42"), (7, "d7")):
        args = ["10", "20", "4", "1.10", "--n", "12", "--seed", "3",
                "--platform", "cpu", "--data-dir", str(tmp_path / sub)]
        if seed is not None:
            args += ["--wall-seed", str(seed)]
        assert main(args) == 0
    w42 = next(next((tmp_path / "d42").iterdir()).glob("wall_*.csv"))
    w7 = next(next((tmp_path / "d7").iterdir()).glob("wall_*.csv"))
    assert w42.read_text() != w7.read_text()
    assert w42.read_text().startswith("nx, ny, x0, ymin\n")  # ref schema
    cfg = SMCConfig.for_n(12, temperature=1.10)
    _, x0, _ = build_walls(cfg)
    assert f"{x0[0]:f}" in w42.read_text()


def test_disorder_cli_guards(tmp_path):
    from tpu_smc.cli import main

    # K must divide chains
    with pytest.raises(SystemExit):
        main(["10", "20", "4", "1.10", "--n", "12", "--chains", "4",
              "--wall-realizations", "3", "--platform", "cpu",
              "--data-dir", str(tmp_path)])
    # ladder mode: K must divide chains-per-t
    with pytest.raises(SystemExit):
        main(["10", "20", "4", "1.10", "--n", "12",
              "--temperatures", "1.0,1.2", "--chains-per-t", "3",
              "--wall-realizations", "2",
              "--platform", "cpu", "--data-dir", str(tmp_path)])
    # (kernel engines accept per-chain walls since the per_chain_w
    # kernel mode — tests/test_pallas.py pins them bitwise)
