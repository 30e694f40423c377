"""Multi-process execution: the one boundary the reference genuinely
crossed (one MPI rank per OS process, main.c:4, SMC.c:66-96) exercised
for real — two OS processes x 4 virtual CPU devices each, a localhost
jax.distributed coordinator, and the end-of-run allgather pooling.

The contract is stronger than statistical parity: chain key streams use
GLOBAL chain indices (state.batch_chain_state chain_offset), so the
2-process ensemble is bitwise the single-process ensemble split in half
— per-rank CSVs and the pooled data_ensemble CSV must match exactly.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

RUN_ARGS = ["20", "60", "12", "1.10", "--chains", "8", "--seed", "7",
            "--platform", "cpu", "--gr-bins", "16", "--z-bins", "16",
            "--widom", "4", "--widom-bins", "8"]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _env(n_devices: int) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    # The coordinator handshake must not inherit a TPU backend attempt.
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("TPU_SMC_TEST_TPU", None)
    return env


def _run_single(tmp: Path) -> Path:
    data = tmp / "single" / "Data"
    proc = subprocess.run(
        [sys.executable, "-m", "tpu_smc", *RUN_ARGS, "--data-dir", str(data)],
        cwd=tmp, env=_env(1), capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return next(data.iterdir())


def _run_two_process(tmp: Path) -> tuple[Path, str]:
    data = tmp / "multi" / "Data"
    port = _free_port()
    base = [sys.executable, "-m", "tpu_smc", *RUN_ARGS,
            "--data-dir", str(data),
            "--coordinator", f"localhost:{port}", "--num-processes", "2"]
    procs = [
        subprocess.Popen(base + ["--process-id", str(i)], cwd=tmp,
                         env=_env(4), stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    return next(data.iterdir()), outs[0]


@pytest.fixture(scope="module")
def runs(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("dist")
    single = _run_single(tmp)
    multi, out0 = _run_two_process(tmp)
    return single, multi, out0


def test_two_process_run_completes(runs):
    single, multi, out0 = runs
    assert "Multi-process run: process 0/2" in out0
    assert "Final ensemble results" in out0
    # Rank 0 wrote its local chains 0-3; rank 1 the global ranks 4-7.
    for rk in range(8):
        assert list(multi.glob(f"data_*_rank{rk}.csv")), f"rank {rk} missing"


def test_pooled_csv_bitwise_matches_single_process(runs):
    single, multi, _ = runs
    name = "data_ensemble"
    s = next(single.glob(f"{name}_*.csv")).read_text()
    m = next(multi.glob(f"{name}_*.csv")).read_text()
    assert s == m


def test_per_rank_files_bitwise_match_single_process(runs):
    single, multi, _ = runs
    for rk in range(8):
        for stem in ("data", "autocorrelation"):
            s = next(single.glob(f"{stem}_*_rank{rk}.csv")).read_text()
            m = next(multi.glob(f"{stem}_*_rank{rk}.csv")).read_text()
            assert s == m, f"{stem} rank {rk} differs across process split"


def test_pooled_profiles_match(runs):
    single, multi, _ = runs
    # last_state is chain 0's exact trajectory endpoint: bitwise.
    s = next(single.glob("last_state_*.csv")).read_text()
    m = next(multi.glob("last_state_*.csv")).read_text()
    assert s == m, "last_state differs"
    # gr/zprofile pool as mean-over-chains; the multi-process path means
    # per-process partial means (identical weights), so the float
    # summation ORDER differs — equality is numerical, not textual.
    for stem in ("gr", "zprofile"):
        s = np.genfromtxt(next(single.glob(f"{stem}_*.csv")),
                          delimiter=",", skip_header=1)
        m = np.genfromtxt(next(multi.glob(f"{stem}_*.csv")),
                          delimiter=",", skip_header=1)
        np.testing.assert_allclose(s, m, rtol=1e-6, atol=1e-9,
                                   err_msg=f"{stem} differs")


def test_pooled_widom_bitwise_matches_single_process(runs):
    """Insertion streams fold the chain's key (GLOBAL chain indices) with
    the ABSOLUTE gather index, and the pooled-du allgather restores
    global chain order — so the rank-0 widom CSV is bitwise the
    single-process one (estimator bootstrap included, fixed seed)."""
    single, multi, _ = runs
    s = next(single.glob("widom_*.csv")).read_text()
    m = next(multi.glob("widom_*.csv")).read_text()
    assert s == m


def test_coordinator_rejects_bad_usage(tmp_path):
    # chains must divide over processes; seed is mandatory.
    env = _env(1)
    out = subprocess.run(
        [sys.executable, "-m", "tpu_smc", "10", "10", "2", "1.1",
         "--chains", "3", "--seed", "1", "--platform", "cpu",
         "--coordinator", f"localhost:{_free_port()}",
         "--num-processes", "2", "--process-id", "0"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=120,
    )
    assert out.returncode != 0
    assert "divide evenly" in (out.stderr + out.stdout)


def test_ck_suffix_insertion():
    """Every rank of a multi-process run writes its OWN checkpoint
    (auto-checkpoint included — code-review r3 finding)."""
    from tpu_smc.cli import _ck_with_suffix

    assert _ck_with_suffix("autosave.npz", ".p1") == "autosave.p1.npz"
    assert _ck_with_suffix("ck", ".p0") == "ck.p0"
    assert _ck_with_suffix("a.b.npz", ".p2") == "a.b.p2.npz"
    assert _ck_with_suffix("autosave.npz", "") == "autosave.npz"


def test_two_process_ladder_pools_replicas(tmp_path):
    """Multi-process --temperatures: each process runs complete replica
    ladders; the pooled tsweep statistics must agree with a
    single-process run of the same TOTAL replica count (statistical —
    per-process streams are salted)."""
    common = ["20", "60", "12", "1.10", "--n", "12", "--seed", "7",
              "--platform", "cpu", "--temperatures", "1.0,1.3",
              "--chains-per-t", "4", "--reweight", "1.0:1.3:3"]

    sdata = tmp_path / "s" / "Data"
    sp = subprocess.run(
        [sys.executable, "-m", "tpu_smc", *common, "--data-dir",
         str(sdata)],
        cwd=tmp_path, env=_env(1), capture_output=True, text=True,
        timeout=600)
    assert sp.returncode == 0, sp.stderr[-2000:]

    mdata = tmp_path / "m" / "Data"
    port = _free_port()
    base = [sys.executable, "-m", "tpu_smc", *common, "--data-dir",
            str(mdata), "--coordinator", f"localhost:{port}",
            "--num-processes", "2"]
    procs = [subprocess.Popen(base + ["--process-id", str(i)],
                              cwd=tmp_path, env=_env(1),
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    assert "2 of 4 replica ladders" in outs[0]

    srun, mrun = next(sdata.iterdir()), next(mdata.iterdir())
    s = np.genfromtxt(next(srun.glob("tsweep_*.csv")), delimiter=",",
                      skip_header=1)
    m = np.genfromtxt(next(mrun.glob("tsweep_*.csv")), delimiter=",",
                      skip_header=1)
    assert s.shape == m.shape == (2, 5)
    # pooled multi-process stats within statistical agreement of the
    # equal-size single-process ladder (different streams)
    for row in range(2):
        tol = 6 * (s[row, 2] ** 2 + m[row, 2] ** 2) ** 0.5 + 0.3
        assert abs(s[row, 1] - m[row, 1]) < tol
    # reweight ran on the POOLED samples (rank 0 only)
    assert list(mrun.glob("reweight_*.csv"))


def test_two_process_pt_pools_swap_counters(tmp_path):
    """Multi-process PT (--pt-exchange fixed): pool_pt_across_processes
    must concatenate the replica axis AND sum the per-pair swap
    counters; the rank-0 pt_*.csv carries the POOLED counters. Swap
    attempts are deterministic (cycles x replicas, no randomness), so
    the 2-process total must exactly equal a single-process run of the
    same total replica count (code-review r3 finding: this path had no
    test under real processes)."""
    common = ["20", "60", "12", "1.10", "--n", "12", "--seed", "7",
              "--platform", "cpu", "--temperatures", "1.0,1.2,1.4",
              "--chains-per-t", "4", "--pt-exchange", "5"]

    sdata = tmp_path / "s" / "Data"
    sp = subprocess.run(
        [sys.executable, "-m", "tpu_smc", *common, "--data-dir",
         str(sdata)],
        cwd=tmp_path, env=_env(1), capture_output=True, text=True,
        timeout=600)
    assert sp.returncode == 0, sp.stderr[-2000:]

    mdata = tmp_path / "m" / "Data"
    port = _free_port()
    base = [sys.executable, "-m", "tpu_smc", *common, "--data-dir",
            str(mdata), "--coordinator", f"localhost:{port}",
            "--num-processes", "2"]
    procs = [subprocess.Popen(base + ["--process-id", str(i)],
                              cwd=tmp_path, env=_env(1),
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]

    srun, mrun = next(sdata.iterdir()), next(mdata.iterdir())
    s = np.genfromtxt(next(srun.glob("pt_*.csv")), delimiter=",",
                      skip_header=1)
    m = np.genfromtxt(next(mrun.glob("pt_*.csv")), delimiter=",",
                      skip_header=1)
    assert s.shape == m.shape == (2, 4)          # n_t-1 pairs
    np.testing.assert_array_equal(s[:, :2], m[:, :2])   # same T pairs
    # attempts: cycles x replicas — the pooled count must equal the
    # equal-size single-process ladder exactly (2 x the per-process)
    np.testing.assert_array_equal(s[:, 3], m[:, 3])
    assert (m[:, 3] > 0).all()
    # acceptance: pooled = attempt-weighted mean over processes; with
    # different streams it only agrees statistically
    assert np.all(np.abs(s[:, 2] - m[:, 2]) < 0.5)
    assert (m[:, 2] >= 0).all() and (m[:, 2] <= 1).all()
    # tsweep rode along through pool_tsweep (3 temperature rows)
    mt = np.genfromtxt(next(mrun.glob("tsweep_*.csv")), delimiter=",",
                       skip_header=1)
    assert mt.shape == (3, 5) and np.isfinite(mt).all()


def test_ladder_coordinator_rejects_auto_interval(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "tpu_smc", "4", "8", "2", "1.1",
         "--temperatures", "1.0,1.2", "--chains-per-t", "4", "--seed",
         "1", "--platform", "cpu", "--pt-exchange", "auto",
         "--coordinator", f"localhost:{_free_port()}",
         "--num-processes", "2", "--process-id", "0"],
        cwd=tmp_path, env=_env(1), capture_output=True, text=True,
        timeout=120)
    assert out.returncode != 0
    assert "fixed" in (out.stderr + out.stdout)


def test_global_ladder_cross_process_exchange_bitwise(tmp_path):
    """--global-ladder: ONE ladder whose chain axis shards over BOTH
    processes' devices — PT exchanges swap configurations across the
    process boundary mid-run (the pod-scale mode; exchanges become DCN
    collectives). The contract is bitwise: a 2-process x 4-device global
    ladder runs the SAME GSPMD program as a single-process 8-device
    mesh (same seed, same partitioning), so tsweep_*.csv and pt_*.csv
    must match byte for byte, and '--pt-exchange auto' (forbidden for
    per-process ladders) must choose the same interval everywhere."""
    common = ["16", "40", "8", "1.10", "--n", "12", "--seed", "7",
              "--platform", "cpu", "--temperatures", "1.0,1.3",
              "--chains-per-t", "4", "--pt-exchange", "auto",
              "--reweight", "1.0:1.3:3", "--z-bins", "8"]

    sdata = tmp_path / "s" / "Data"
    sp = subprocess.run(
        [sys.executable, "-m", "tpu_smc", *common, "--data-dir",
         str(sdata), "--checkpoint", str(tmp_path / "s_ck.npz")],
        cwd=tmp_path, env=_env(8), capture_output=True, text=True,
        timeout=600)
    assert sp.returncode == 0, sp.stderr[-2000:]
    assert "Sharding 8 ladder chains over 8 devices" in sp.stdout

    mdata = tmp_path / "m" / "Data"
    port = _free_port()
    base = [sys.executable, "-m", "tpu_smc", *common, "--data-dir",
            str(mdata), "--coordinator", f"localhost:{port}",
            "--num-processes", "2", "--global-ladder",
            "--checkpoint", str(tmp_path / "m_ck.npz")]
    procs = [subprocess.Popen(base + ["--process-id", str(i)],
                              cwd=tmp_path, env=_env(4),
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    assert "a device shard of the ONE global ladder" in outs[0]
    assert "Global ladder: 8 chains sharded over 8 devices across 2 " \
           "processes" in outs[0]

    srun, mrun = next(sdata.iterdir()), next(mdata.iterdir())
    # MBAR reweighting + the rho(z; T) field surface run on the
    # allgathered global samples — bitwise the single-process output.
    # Compare by exact filename ("reweight_*" would also glob the
    # zprofile file).
    s_files = {p.name: p.read_text() for p in srun.glob("*.csv")}
    m_files = {p.name: p.read_text() for p in mrun.glob("*.csv")}
    for stem in ("tsweep_", "pt_", "reweight_N", "reweight_zprofile_"):
        names = sorted(n for n in s_files if n.startswith(stem))
        assert names, f"no {stem} artifact in the single-process run"
        for name in names:
            assert m_files.get(name) == s_files[name], \
                f"{name} differs between global-ladder split and " \
                "single-process mesh"
    # swaps actually happened across the run
    pt = np.genfromtxt(next(mrun.glob("pt_*.csv")), delimiter=",",
                       skip_header=1, ndmin=2)
    assert pt[0, 3] > 0
    # the auto probe chose identically everywhere
    assert "Auto-chosen exchange interval" in outs[0]
    assert "Auto-chosen exchange interval" in outs[1]

    # the gathered global checkpoint equals the single-process one
    s_ck = np.load(tmp_path / "s_ck.npz")
    m_ck = np.load(tmp_path / "m_ck.npz")
    for leaf in ("r", "energy", "sweeps", "rbin"):
        np.testing.assert_array_equal(s_ck[leaf], m_ck[leaf])


def test_global_ladder_requires_coordinator(tmp_path):
    """--global-ladder without --coordinator fails fast (a forgotten
    coordinator must not silently run an ordinary local ladder)."""
    out = subprocess.run(
        [sys.executable, "-m", "tpu_smc", "4", "8", "2", "1.1",
         "--temperatures", "1.0,1.2", "--chains-per-t", "4",
         "--platform", "cpu", "--global-ladder"],
        cwd=tmp_path, env=_env(1), capture_output=True, text=True,
        timeout=120)
    assert out.returncode != 0
    assert "--coordinator" in (out.stderr + out.stdout)


def test_global_ladder_hbm_stream_composition_bitwise(tmp_path):
    """--global-ladder x hbm_stream (pod-scale ladders at N beyond VMEM,
    round-4 roadmap #5), CPU-verifiable decomposition. Interpret-mode
    pallas synchronizes mesh devices with an IN-PROCESS
    threading.Barrier (jax interpret_pallas_call._barrier), so the
    kernel engines cannot be driven across OS processes on CPU at all —
    three attempts at the direct 2-process drive deadlocked at the
    first kernel call. The composition contract is instead pinned by
    three bitwise legs:
      (1) [HERE] the CLI ladder on a single-process multi-device mesh,
          every kernel call forced onto the HBM-streamed engine
          (TPU_SMC_FORCE_HBM_STREAM=1), equals the resident zsorted
          engine byte for byte (tsweep_/pt_ CSVs, PT swaps > 0);
      (2) test_pallas::test_sharded_zsorted_hbm_stream_ladder_bitwise
          pins shard_map x stream x (A, T) ladder rows at the wrapper;
      (3) test_global_ladder_cross_process_exchange_bitwise pins the
          cross-process global mesh == the single-process mesh (same
          GSPMD program, byte-identical artifacts).
    Together: global-ladder x hbm_stream == the single-process resident
    run, which carries the hardware record."""
    common = ["4", "16", "4", "1.10", "--n", "12", "--seed", "9",
              "--platform", "cpu", "--temperatures", "1.0,1.3",
              "--chains-per-t", "8", "--pt-exchange", "4",
              "--sampler", "zsorted"]

    def run(tag: str, force_stream: bool) -> tuple:
        env = _env(2)
        env["TPU_SMC_PALLAS_INTERPRET"] = "1"
        if force_stream:
            env["TPU_SMC_FORCE_HBM_STREAM"] = "1"
        data = tmp_path / tag / "Data"
        proc = subprocess.run(
            [sys.executable, "-m", "tpu_smc", *common,
             "--data-dir", str(data)],
            cwd=tmp_path, env=env, capture_output=True, text=True,
            timeout=900)
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "Sharding 16 ladder chains over 2 devices" in proc.stdout
        assert "(zsorted engine)" in proc.stdout
        return next(data.iterdir())

    stream_run = run("stream", force_stream=True)
    resident_run = run("resident", force_stream=False)

    s_files = {p.name: p.read_text() for p in stream_run.glob("*.csv")}
    r_files = {p.name: p.read_text() for p in resident_run.glob("*.csv")}
    for stem in ("tsweep_", "pt_"):
        names = sorted(n for n in r_files if n.startswith(stem))
        assert names, f"no {stem} artifact in the resident run"
        for name in names:
            assert s_files.get(name) == r_files[name], \
                f"{name} differs: hbm_stream vs resident on the mesh"
    pt = np.genfromtxt(next(stream_run.glob("pt_*.csv")), delimiter=",",
                       skip_header=1, ndmin=2)
    assert pt[0, 3] > 0, "no PT swaps in the streamed ladder"


def test_global_ladder_interpret_pallas_refused(tmp_path):
    """The impossible combination (interpret-mode pallas x a global mesh
    spanning OS processes) fails fast with a clear message BEFORE the
    coordinator handshake — it used to deadlock at the first kernel
    call with both processes blocked in the in-process barrier."""
    env = _env(1)
    env["TPU_SMC_PALLAS_INTERPRET"] = "1"
    out = subprocess.run(
        [sys.executable, "-m", "tpu_smc", "4", "8", "2", "1.1",
         "--n", "12", "--temperatures", "1.0,1.2", "--chains-per-t",
         "4", "--pt-exchange", "4", "--sampler", "zsorted",
         "--platform", "cpu",
         "--coordinator", f"localhost:{_free_port()}",
         "--num-processes", "2", "--process-id", "0",
         "--global-ladder"],
        cwd=tmp_path, env=env, capture_output=True, text=True,
        timeout=120)
    assert out.returncode != 0
    assert "cannot span OS processes" in (out.stderr + out.stdout)
