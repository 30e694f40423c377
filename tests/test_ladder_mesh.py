"""Multi-device temperature ladders (tsweep/PT over a mesh).

The flat ladder-chain axis (temperature-major) shards over the mesh's
"chains" axis: the XLA engine is GSPMD-partitioned from the input
sharding (including the PT exchange's cross-shard configuration
gathers), the pallas engine runs sweeps under shard_map with the (A, T)
rows sharded alongside the state. Runs on the suite's 8 virtual CPU
devices.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from tpu_smc.config import RunParams, SMCConfig
from tpu_smc.ensemble import make_mesh

CFG = SMCConfig(n=12, box_l=10.0, box_lz=30.0, dtype="float32")


def test_tsweep_sharded_matches_single_device():
    """Same seed, same ladder: GSPMD over 8 devices must reproduce the
    single-device XLA result (chains never communicate; the shared
    offset derives from chain 0's key either way)."""
    from tpu_smc.tsweep import simulate_temperature_sweep

    params = RunParams(eqsteps=6, maxsteps=24, numdata=12)
    temps = [0.9, 1.3]
    _, solo = simulate_temperature_sweep(
        CFG, params, temps, jax.random.key(5), chains_per_t=8)
    mesh = make_mesh(8, axis_names=("chains",))
    _, shard = simulate_temperature_sweep(
        CFG, params, temps, jax.random.key(5), chains_per_t=8, mesh=mesh)
    np.testing.assert_allclose(shard.mean_energy, solo.mean_energy,
                               rtol=1e-6)
    np.testing.assert_array_equal(shard.acceptance, solo.acceptance)
    np.testing.assert_allclose(shard.energy_samples, solo.energy_samples,
                               rtol=1e-6)


def test_pt_sharded_exchanges_run():
    """PT over the mesh: the exchange's cross-shard swaps execute under
    GSPMD; statistics must match the single-device run with the same
    seed (deterministic keys; same program, partitioned)."""
    from tpu_smc.pt import simulate_parallel_tempering

    params = RunParams(eqsteps=4, maxsteps=20, numdata=10)
    temps = [0.9, 1.1, 1.3, 1.6]
    _, solo = simulate_parallel_tempering(
        CFG, params, temps, jax.random.key(2), chains_per_t=4,
        exchange_interval=2)
    mesh = make_mesh(8, axis_names=("chains",))
    _, shard = simulate_parallel_tempering(
        CFG, params, temps, jax.random.key(2), chains_per_t=4,
        exchange_interval=2, mesh=mesh)
    assert int(shard.swap_attempts.sum()) > 0
    np.testing.assert_array_equal(shard.swap_attempts, solo.swap_attempts)
    np.testing.assert_allclose(shard.swap_acceptance, solo.swap_acceptance,
                               atol=1e-12)
    np.testing.assert_allclose(shard.tsweep.mean_energy,
                               solo.tsweep.mean_energy, rtol=1e-6)


def test_ladder_pallas_sharded_rows():
    """Pallas ladder under shard_map with per-chain (A, T) rows sharded
    over 8 virtual devices (interpret mode): finite stats, the hotter
    half really runs hotter."""
    from tpu_smc.tsweep import simulate_temperature_sweep

    params = RunParams(eqsteps=2, maxsteps=6, numdata=3)
    mesh = make_mesh(8, axis_names=("chains",))
    with pltpu.force_tpu_interpret_mode():
        _, res = simulate_temperature_sweep(
            CFG, params, [0.8, 1.6], jax.random.key(1),
            chains_per_t=512, sampler="pallas", mesh=mesh)
    assert np.all(np.isfinite(res.mean_energy))
    assert res.mean_energy[1] > res.mean_energy[0]
    assert np.all((res.acceptance > 0) & (res.acceptance <= 1))


def test_pt_pallas_sharded_end_to_end():
    """PT with the pallas engine over the mesh: sweeps via shard_map,
    exchanges as their own GSPMD calls (cycle_scan_ok=False path)."""
    from tpu_smc.pt import simulate_parallel_tempering

    params = RunParams(eqsteps=2, maxsteps=8, numdata=4)
    mesh = make_mesh(8, axis_names=("chains",))
    with pltpu.force_tpu_interpret_mode():
        _, res = simulate_parallel_tempering(
            CFG, params, [0.9, 1.4], jax.random.key(3),
            chains_per_t=512, exchange_interval=2, sampler="pallas",
            mesh=mesh)
    assert np.all(np.isfinite(res.tsweep.mean_energy))
    assert int(res.swap_attempts.sum()) > 0
    assert np.all((res.swap_acceptance >= 0) & (res.swap_acceptance <= 1))


def test_cli_full_ladder_composition(tmp_path, capsys):
    """Every ladder feature in ONE invocation: sharded ladder + per-level
    tuning + parallel tempering + MBAR reweighting with bootstrap —
    the artifacts and tables must all appear."""
    from tpu_smc.cli import main

    rc = main(["20", "40", "20", "1.10", "--n", "12",
               "--temperatures", "1.0,1.2", "--chains-per-t", "8",
               "--pt-exchange", "5", "--target-acceptance", "0.7",
               "--reweight", "1.0:1.2:3", "--seed", "9",
               "--platform", "cpu", "--data-dir", str(tmp_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Auto-tuned per-level mobility" in out
    assert "Replica-exchange swap acceptance" in out
    assert "MBAR reweighting" in out
    run = next(tmp_path.iterdir())
    names = {p.name.split("_N")[0] for p in run.iterdir()}
    assert {"tsweep", "pt", "reweight", "wall"} <= names


def test_cli_ladder_checkpoint_resume_roundtrip(tmp_path, capsys):
    """Ladder runs checkpoint their full ensemble state and resume from
    it (the reference can't checkpoint anything but positions; ladder
    modes previously couldn't at all)."""
    from tpu_smc.cli import main
    from tpu_smc.io import load_checkpoint

    ck = tmp_path / "ladder.npz"
    rc = main(["10", "20", "10", "1.10", "--n", "12",
               "--temperatures", "1.0,1.2", "--chains-per-t", "3",
               "--pt-exchange", "4", "--seed", "5", "--platform", "cpu",
               "--checkpoint", str(ck),
               "--data-dir", str(tmp_path / "d1")])
    assert rc == 0
    assert "ladder state checkpointed" in capsys.readouterr().out
    st, cfg = load_checkpoint(ck)
    assert st.r.shape == (6, 12, 3)
    assert int(np.asarray(st.sweeps).reshape(-1)[0]) >= 30  # eq + prod

    rc = main(["0", "20", "10", "1.10", "--n", "12",
               "--temperatures", "1.0,1.2", "--chains-per-t", "3",
               "--pt-exchange", "4", "--seed", "6", "--platform", "cpu",
               "--resume", str(ck),
               "--data-dir", str(tmp_path / "d2")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Resumed ladder state" in out
    assert "Temperature sweep results" in out


def test_ladder_resume_rejects_wrong_shape():
    from tpu_smc.tsweep import simulate_temperature_sweep
    from tpu_smc.state import init_ensemble_state
    import pytest

    state, _ = init_ensemble_state(CFG, jax.random.key(0), 4)
    with pytest.raises(ValueError, match="resumed ladder state"):
        simulate_temperature_sweep(
            CFG, RunParams(eqsteps=0, maxsteps=4, numdata=2),
            [1.0, 1.2], jax.random.key(1), chains_per_t=8, state0=state)


def test_cli_ladder_shards_over_virtual_devices(tmp_path, capsys):
    from tpu_smc.cli import main

    rc = main(["10", "20", "4", "1.10", "--n", "12",
               "--temperatures", "1.0,1.2", "--chains-per-t", "8",
               "--pt-exchange", "5", "--seed", "5", "--platform", "cpu",
               "--data-dir", str(tmp_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Sharding 16 ladder chains over 8 devices" in out
    run = next(tmp_path.iterdir())
    assert any(p.name.startswith("pt_") for p in run.iterdir())
