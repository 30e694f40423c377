"""Pallas whole-sweep kernel tests.

On CPU the kernel runs in interpreter mode (slow — tiny shapes only);
hardware-statistics tests live in scripts/validate_parity.py and run on
the real TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from tpu_smc.config import SMCConfig
from tpu_smc.kernels import sweep_pallas as sp
from tpu_smc.potentials import total_energy
from tpu_smc.state import init_ensemble_state

CFG = SMCConfig(n=16, box_l=12.0, box_lz=40.0, dtype="float32")


def _dense_state(c=128):
    """A dense start so pair terms matter: 16 particles in a 3.3^3 blob
    near the lower wall."""
    rng = np.random.default_rng(0)
    grid = np.stack(np.meshgrid(*[np.arange(4) * 1.4] * 2, np.arange(1) * 1.4,
                                indexing="ij"), -1).reshape(-1, 3)
    r0 = np.tile(grid, (1, 1))[:16] + rng.uniform(-0.1, 0.1, (16, 3))
    r0[:, 2] += -CFG.box_lz / 2 + 2.0
    state, w = init_ensemble_state(CFG, jax.random.key(0), c, r0=r0)
    return state, w


def test_plane_roundtrip():
    state, w = _dense_state(8)
    x, y, z = sp.to_planes(state.r, CFG)
    assert x.shape[0] % 8 == 0
    r2 = sp.from_planes(x, y, z, CFG, dtype=CFG.jnp_dtype)
    np.testing.assert_allclose(
        np.asarray(r2), np.asarray(state.r), rtol=1e-6, atol=1e-6
    )


def test_kernel_interpret_energy_bookkeeping():
    """One kernel sweep: carried E must equal a from-scratch recompute and
    the state must stay physical."""
    state, w = _dense_state(128)
    x, y, z = sp.to_planes(state.r, CFG)
    wa, wb = sp.wall_coeff_rows(w, CFG)
    e = state.energy.reshape(1, -1).astype(jnp.float32)
    offsets = jnp.asarray([3], jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        x2, y2, z2, e2, et, at = sp.pallas_sweep_block(
            x, y, z, e, wa, wb, offsets, jnp.int32(5), CFG, 1,
            CFG.proposal_a, c_tile=128,
        )
    r2 = sp.from_planes(x2, y2, z2, CFG)
    exact = jax.vmap(lambda r: total_energy(r, w, CFG))(r2)
    np.testing.assert_allclose(
        np.asarray(e2[0]), np.asarray(exact), rtol=1e-4, atol=1e-3
    )
    acc = np.asarray(at)
    assert np.all(acc >= 0) and np.all(acc <= CFG.n)
    # positions stayed wrapped in x/y and inside the walls
    assert np.all(np.abs(np.asarray(r2)[..., 0]) <= CFG.box_l / 2 + 1e-5)
    assert np.all(np.abs(np.asarray(r2)[..., 2]) < CFG.box_lz / 2)
    # trace row mirrors the final energy after sweep 0
    np.testing.assert_allclose(np.asarray(et[0]), np.asarray(e2[0]), rtol=1e-6)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="interpret-mode PRNG is lane-replicated; "
                           "hardware PRNG verified on TPU")
def test_kernel_moves_are_stochastic_across_lanes():
    state, w = _dense_state(128)
    x, y, z = sp.to_planes(state.r, CFG)
    wa, wb = sp.wall_coeff_rows(w, CFG)
    e = state.energy.reshape(1, -1).astype(jnp.float32)
    offsets = jnp.asarray([0, 5, 11, 2], jnp.int32)
    x2, _, _, _, _, at = sp.pallas_sweep_block(
        x, y, z, e, wa, wb, offsets, jnp.int32(7), CFG, 4,
        CFG.proposal_a, c_tile=128,
    )
    # different chains (lanes) must take different moves
    moved = np.asarray(x2[:CFG.n]) - np.asarray(x[:CFG.n])
    lane_sig = moved.sum(axis=0)
    assert np.unique(np.round(lane_sig, 6)).size > 100


def test_kernel_deterministic_given_seed():
    state, w = _dense_state(128)
    x, y, z = sp.to_planes(state.r, CFG)
    wa, wb = sp.wall_coeff_rows(w, CFG)
    e = state.energy.reshape(1, -1).astype(jnp.float32)
    offsets = jnp.asarray([2], jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        out1 = sp.pallas_sweep_block(x, y, z, e, wa, wb, offsets,
                                     jnp.int32(9), CFG, 1, CFG.proposal_a,
                                     c_tile=128)
        out2 = sp.pallas_sweep_block(x, y, z, e, wa, wb, offsets,
                                     jnp.int32(9), CFG, 1, CFG.proposal_a,
                                     c_tile=128)
    for a, b in zip(out1, out2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_pallas_sweep_on_virtual_mesh():
    """Whole-sweep kernel under shard_map across the 8 virtual devices
    (interpret mode on CPU)."""
    from tpu_smc import ensemble as ens

    mesh = ens.make_mesh(8, axis_names=("chains",))
    state, w = init_ensemble_state(CFG, jax.random.key(2), 8 * 128)
    state = ens.shard_ensemble(state, mesh)
    with pltpu.force_tpu_interpret_mode():
        st2, tr = ens.ensemble_sweeps_pallas_sharded(
            state, w, CFG, CFG.proposal_a, 1, seed=3, mesh=mesh, c_tile=128
        )
    assert bool(np.all(np.isfinite(np.asarray(st2.energy))))
    assert np.asarray(tr.accepted).shape == (1, 1024)
    assert int(np.asarray(st2.sweeps)[0]) == 1


def test_sharded_zsorted_sweep_on_virtual_mesh():
    """z-block-skipping kernel under shard_map across the 8 virtual
    devices (interpret mode): the per-chain sort shards trivially and
    sweep counters/energies stay coherent."""
    from tpu_smc import ensemble as ens

    mesh = ens.make_mesh(8, axis_names=("chains",))
    state, w = init_ensemble_state(CFG, jax.random.key(3), 8 * 128)
    state = ens.shard_ensemble(state, mesh)
    with pltpu.force_tpu_interpret_mode():
        st2, tr = ens.ensemble_sweeps_zsorted_sharded(
            state, w, CFG, CFG.proposal_a, 1, seed=4, mesh=mesh,
            c_tile=128)
    assert bool(np.all(np.isfinite(np.asarray(st2.energy))))
    assert np.asarray(tr.accepted).shape == (1, 1024)
    assert int(np.asarray(st2.sweeps)[0]) == 1


def test_sharded_wrappers_accept_two_word_seeds():
    """The multi-process CLI passes (seed, proc_id) tuples; both sharded
    wrappers must fold the salt word per device instead of crashing in
    jnp.stack (code-review r3 finding)."""
    from tpu_smc import ensemble as ens

    mesh = ens.make_mesh(2, axis_names=("chains",))
    state, w = init_ensemble_state(CFG, jax.random.key(5), 2 * 128)
    state = ens.shard_ensemble(state, mesh)
    with pltpu.force_tpu_interpret_mode():
        s1, _ = ens.ensemble_sweeps_pallas_sharded(
            state, w, CFG, CFG.proposal_a, 1, seed=(5, 1), mesh=mesh,
            c_tile=128)
        s2, _ = ens.ensemble_sweeps_zsorted_sharded(
            state, w, CFG, CFG.proposal_a, 1, seed=(5, 1), mesh=mesh,
            c_tile=128)
        # a different salt word must change the streams
        s3, _ = ens.ensemble_sweeps_pallas_sharded(
            state, w, CFG, CFG.proposal_a, 1, seed=(5, 2), mesh=mesh,
            c_tile=128)
    assert np.all(np.isfinite(np.asarray(s1.energy)))
    assert np.all(np.isfinite(np.asarray(s2.energy)))
    assert not np.array_equal(np.asarray(s1.r), np.asarray(s3.r))


def test_zsorted_tuned_override_matches_static():
    """A tuned A on the zsorted engine rides the ladder-mode (A, T) data
    rows (CLAUDE.md: a run-varying mobility must never be the Mosaic
    static). With uniform rows at (cfg.proposal_a, cfg.T) the wrapper
    must reproduce the static-a engine: identical accept decisions and
    PRNG schedule; positions/energies to f32 roundoff (mul-by-1/T vs
    divide-by-T)."""
    from tpu_smc.ensemble import ensemble_sweeps_zsorted

    state, w = _dense_state(128)
    with pltpu.force_tpu_interpret_mode():
        s_static, tr_s = ensemble_sweeps_zsorted(
            state, w, CFG, CFG.proposal_a, 5, seed=11, c_tile=128,
            row_block_rows=8, sweeps_per_sort=4)
        s_rows, tr_r = ensemble_sweeps_zsorted(
            state, w, CFG, 0.0, 5, seed=11, c_tile=128,
            row_block_rows=8, sweeps_per_sort=4,
            uniform_at=(float(CFG.proposal_a), float(CFG.temperature)))
    np.testing.assert_array_equal(np.asarray(tr_s.accepted),
                                  np.asarray(tr_r.accepted))
    # mul-by-1/T vs divide-by-T ulps compound through the force field
    # over 5 sweeps (the 1-sweep kernel-level test pins 1e-5); what must
    # stay exact is the decision stream above.
    np.testing.assert_allclose(np.asarray(s_static.r),
                               np.asarray(s_rows.r), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(s_static.energy),
                               np.asarray(s_rows.energy),
                               rtol=1e-4, atol=1e-3)


def test_zsorted_driver_tuned_override_runs():
    """simulate_ensemble(sampler='zsorted', proposal_a=...) end-to-end:
    the tuned value routes through the data rows (one compile key) and
    the run produces finite physics with sane acceptance."""
    from tpu_smc.config import RunParams
    from tpu_smc.driver import ObservableOptions
    from tpu_smc.driver_ensemble import simulate_ensemble

    state, w = _dense_state(128)
    with pltpu.force_tpu_interpret_mode():
        _, res = simulate_ensemble(
            CFG, RunParams(2, 4, 4), state, w,
            opts=ObservableOptions(pressure=False, clusters=False,
                                   sampler="zsorted", proposal_a=0.5))
    assert np.isfinite(res.mean_energy)
    assert 0.0 < res.acceptance_ratio <= 1.0


def test_ensemble_driver_with_pallas_sampler():
    """simulate_ensemble end-to-end with the pallas engine (interpret)."""
    from tpu_smc.config import RunParams
    from tpu_smc.driver import ObservableOptions
    from tpu_smc.driver_ensemble import simulate_ensemble

    cfg = SMCConfig(n=16, box_l=12.0, box_lz=40.0, dtype="float32",
                    storage_time=2)
    state, w = _dense_state(128)
    params = RunParams(eqsteps=1, maxsteps=4, numdata=4)
    with pltpu.force_tpu_interpret_mode():
        state, agg = simulate_ensemble(
            cfg, params, state, w,
            opts=ObservableOptions(pressure=False, clusters=False,
                                   sampler="pallas"),
        )
    assert np.isfinite(agg.mean_energy)
    assert 0.0 <= agg.acceptance_ratio <= 1.0
    assert agg.chains[0].energy_trace.shape[0] == 4


def test_ensemble_driver_with_zsorted_sampler():
    """simulate_ensemble end-to-end with the zsorted engine (interpret):
    runs, carries exact energies, and keeps BOTH voxel accumulators live
    (labels are restored at call boundaries, so mobility is real)."""
    from tpu_smc.config import RunParams
    from tpu_smc.driver import ObservableOptions
    from tpu_smc.driver_ensemble import simulate_ensemble

    cfg = SMCConfig(n=16, box_l=12.0, box_lz=40.0, dtype="float32",
                    storage_time=2)
    state, w = _dense_state(128)
    params = RunParams(eqsteps=1, maxsteps=4, numdata=4)
    with pltpu.force_tpu_interpret_mode():
        state, agg = simulate_ensemble(
            cfg, params, state, w,
            opts=ObservableOptions(pressure=False, clusters=False,
                                   sampler="zsorted"),
        )
    assert np.isfinite(agg.mean_energy)
    assert 0.0 < agg.acceptance_ratio <= 1.0
    assert agg.chains[0].energy_trace.shape[0] == 4
    assert np.asarray(state.density).sum() > 0     # accumulating
    # mobility pins the label restoration: cell-change counts only make
    # sense if particle identity survives the per-chunk sorts
    assert np.asarray(state.mobility).sum() > 0


def test_zsorted_preserves_particle_identity():
    """With a vanishing mobility no particle moves, so the positions the
    wrapper returns must be BITWISE the input — in ORIGINAL particle
    order. Without the identity carry + un-permute, a z-sorted copy
    would come back instead (labels shuffled)."""
    from tpu_smc import ensemble as ens

    cfg = SMCConfig(n=24, box_l=10.0, box_lz=60.0, dtype="float32")
    rng = np.random.default_rng(3)
    r0 = np.stack([rng.uniform(-4, 4, 24), rng.uniform(-4, 4, 24),
                   rng.uniform(-25, 25, 24)], axis=1).astype(np.float32)
    state, w = init_ensemble_state(cfg, jax.random.key(6), 128,
                                   r0=r0)
    # deliberately NOT z-ordered input
    assert not np.all(np.diff(r0[:, 2]) >= 0)
    with pltpu.force_tpu_interpret_mode():
        st2, _ = ens.ensemble_sweeps_zsorted(
            state, w, cfg, 1e-18, 2, seed=7, c_tile=128)
    np.testing.assert_allclose(np.asarray(st2.r), np.asarray(state.r),
                               atol=1e-5)
    # and the row ORDER matches exactly (identity, not just the set)
    assert np.array_equal(np.argsort(np.asarray(st2.r)[0, :, 2]),
                          np.argsort(r0[:, 2]))


def test_resolve_sampler_auto_upgrades_to_zsorted(monkeypatch):
    """auto picks zsorted exactly when its constraints hold: N>=1024
    (the measured dense/zsorted crossover sits between 512 and 1024),
    confined, not a ladder; tuned runs keep it (data-row A routing)."""
    import jax as _jax

    from tpu_smc.cli import _resolve_sampler
    from tpu_smc.config import SMCConfig as C

    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    big = C.for_n(4096, dtype="float32")
    assert _resolve_sampler("auto", big, 256) == "zsorted"
    assert _resolve_sampler("auto", C.for_n(1024, dtype="float32"),
                            256) == "zsorted"
    assert _resolve_sampler("auto", C.for_n(512, dtype="float32"),
                            256) == "pallas"
    assert _resolve_sampler("auto", big, 256, n_dev=2) == "zsorted"
    assert _resolve_sampler("auto", big, 255, n_dev=2) == "xla"
    # tuned runs and ladders keep the fast engine: A and T ride the
    # ladder-mode (A, T) data rows (probe: zsorted ladder 1.76x dense)
    assert _resolve_sampler("auto", big, 256, tuned=True) == "zsorted"
    assert _resolve_sampler("auto", big, 256, ladder=True) == "zsorted"
    assert _resolve_sampler("auto", C.bulk(n=4096, dtype="float32"),
                            256) == "pallas"   # pbc_z
    assert _resolve_sampler("zsorted", big, 256) == "zsorted"  # explicit


def test_banded_kernel_exact_bookkeeping():
    """Experimental z-banded random-scan kernel: energy bookkeeping must be
    exact whether moves take the window path or the full-pass fallback."""
    from tpu_smc import ensemble as ens

    cfg = SMCConfig(n=24, box_l=10.0, box_lz=60.0, dtype="float32")
    rng = np.random.default_rng(1)
    # spread along z so the window path is exercised (big margins)...
    r0 = np.stack([
        rng.uniform(-4, 4, 24), rng.uniform(-4, 4, 24),
        np.linspace(-25, 25, 24) + rng.uniform(-0.3, 0.3, 24),
    ], axis=-1)
    state, w = init_ensemble_state(cfg, jax.random.key(0), 128, r0=r0)
    with pltpu.force_tpu_interpret_mode():
        st2, tr, fb = ens.ensemble_sweeps_banded(
            state, w, cfg, cfg.proposal_a, 2, window=8, c_tile=128)
    exact = jax.vmap(lambda r: total_energy(r, w, cfg))(st2.r)
    assert float(jnp.max(jnp.abs(exact - st2.energy))) < 1e-2
    acc = np.asarray(tr.accepted)
    assert np.all(acc >= 0) and np.all(acc <= cfg.n)
    assert 0.0 <= float(fb) <= 1.0


def test_kernel_reference_noise_bookkeeping():
    """reference_noise mode (bug-compatible dependent Box-Muller pairs):
    carried E must still equal a from-scratch recompute."""
    cfg = SMCConfig(n=16, box_l=12.0, box_lz=40.0, dtype="float32",
                    reference_noise=True)
    state, w = _dense_state(128)
    x, y, z = sp.to_planes(state.r, cfg)
    wa, wb = sp.wall_coeff_rows(w, cfg)
    e = state.energy.reshape(1, -1).astype(jnp.float32)
    offsets = jnp.asarray([3, 7], jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        x2, y2, z2, e2, et, at = sp.pallas_sweep_block(
            x, y, z, e, wa, wb, offsets, jnp.int32(5), cfg, 2,
            cfg.proposal_a, c_tile=128,
        )
    r2 = sp.from_planes(x2, y2, z2, cfg)
    exact = jax.vmap(lambda r: total_energy(r, w, cfg))(r2)
    np.testing.assert_allclose(
        np.asarray(e2[0]), np.asarray(exact), rtol=1e-4, atol=1e-3
    )
    acc = np.asarray(at)
    assert np.all(acc >= 0) and np.all(acc <= cfg.n)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="interpret-mode PRNG is lane-replicated; "
                           "noise statistics need the hardware PRNG")
def test_kernel_reference_noise_structure_tpu():
    """The on-core noise plane must reproduce the reference recipe's
    DEPENDENT pair structure (matematicose.c:187-192): the joint moments
    E[d0^2 d1] ~ -0.498 s^3 and E[d0 d1^2] ~ +0.274 s^3 are ~0 for i.i.d.
    Gaussians and strongly nonzero for the reference's vecBoxMuller."""
    import math

    a = 0.05
    s = math.sqrt(2 * a)
    ds = [np.asarray(sp.debug_reference_noise(512, 256, s, 99 + i))
          for i in range(8)]
    d = np.concatenate(ds, axis=1)
    d0 = d[0::2, :].reshape(-1)
    d1 = d[1::2, :].reshape(-1)
    m21 = float(np.mean(d0 * d0 * d1) / s ** 3)
    m12 = float(np.mean(d0 * d1 * d1) / s ** 3)
    assert abs(m21 - (-0.498)) < 0.02, m21
    assert abs(m12 - 0.274) < 0.02, m12
    assert abs(float(d.std()) / s - 1.0) < 0.01


def test_zskip_bitwise_identical_to_dense_blocks():
    """The z-sorted block-skip path skips ONLY provably-zero blocks: the
    same kernel with zskip on/off must produce bitwise identical outputs
    on sorted input (VERDICT r1 #4 — exactness by construction)."""
    cfg = SMCConfig(n=24, box_l=10.0, box_lz=60.0, dtype="float32")
    rng = np.random.default_rng(1)
    r0 = np.stack([
        rng.uniform(-4, 4, 24), rng.uniform(-4, 4, 24),
        np.sort(rng.uniform(-28, 28, 24)),
    ], axis=-1)
    state, w = init_ensemble_state(cfg, jax.random.key(0), 128, r0=r0)
    x, y, z = sp.to_planes(state.r, cfg)
    wa, wb = sp.wall_coeff_rows(w, cfg)
    e = state.energy.reshape(1, -1).astype(jnp.float32)
    offsets = jnp.asarray([3, 11], jnp.int32)
    seeds = jnp.asarray([[5, 7], [9, 11]], jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        on = sp.pallas_sweep_block(
            x, y, z, e, wa, wb, offsets, seeds, cfg, 2, cfg.proposal_a,
            c_tile=128, zskip=True, row_block_rows=8)
        off = sp.pallas_sweep_block(
            x, y, z, e, wa, wb, offsets, seeds, cfg, 2, cfg.proposal_a,
            c_tile=128, zskip=False, row_block_rows=8)
    for a, b in zip(on, off):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_hbm_stream_bitwise_identical_to_zskip():
    """The HBM-streamed kernel must reproduce the VMEM zskip kernel
    BITWISE at the same row_block: id-masking vs row parking and
    call-start vs sweep-start block bounds only change which exact zeros
    are summed (kernels/sweep_pallas._make_stream_kernel)."""
    cfg = SMCConfig(n=24, box_l=10.0, box_lz=60.0, dtype="float32")
    rng = np.random.default_rng(3)
    r0 = np.stack([
        rng.uniform(-4, 4, 24), rng.uniform(-4, 4, 24),
        np.sort(rng.uniform(-28, 28, 24)),
    ], axis=-1)
    state, w = init_ensemble_state(cfg, jax.random.key(0), 128, r0=r0)
    x, y, z = sp.to_planes(state.r, cfg)
    wa, wb = sp.wall_coeff_rows(w, cfg)
    e = state.energy.reshape(1, -1).astype(jnp.float32)
    offsets = jnp.asarray([3, 11], jnp.int32)
    seeds = jnp.asarray([[5, 7], [9, 11]], jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        vmem = sp.pallas_sweep_block(
            x, y, z, e, wa, wb, offsets, seeds, cfg, 2, cfg.proposal_a,
            c_tile=128, zskip=True, row_block_rows=8)
        stream = sp.pallas_sweep_block(
            x, y, z, e, wa, wb, offsets, seeds, cfg, 2, cfg.proposal_a,
            c_tile=128, zskip=True, row_block_rows=8, hbm_stream=True)
    for a, b in zip(vmem, stream):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_zsorted_wrapper_hbm_stream_bitwise():
    """ensemble_sweeps_zsorted(hbm_stream=True) is bitwise the resident
    engine through the full wrapper (sort chunks, identity carry,
    remainder path), so the auto capacity switch never changes physics."""
    from tpu_smc.ensemble import ensemble_sweeps_zsorted

    cfg = SMCConfig(n=24, box_l=10.0, box_lz=60.0, dtype="float32")
    rng = np.random.default_rng(4)
    r0 = np.stack([
        rng.uniform(-4, 4, 24), rng.uniform(-4, 4, 24),
        rng.uniform(-28, 28, 24),
    ], axis=-1)
    state, w = init_ensemble_state(cfg, jax.random.key(6), 128, r0=r0)
    with pltpu.force_tpu_interpret_mode():
        resident, tr1 = ensemble_sweeps_zsorted(
            state, w, cfg, cfg.proposal_a, 6, c_tile=128, row_block_rows=8,
            hbm_stream=False)
        streamed, tr2 = ensemble_sweeps_zsorted(
            state, w, cfg, cfg.proposal_a, 6, c_tile=128, row_block_rows=8,
            hbm_stream=True)
    np.testing.assert_array_equal(np.asarray(resident.r),
                                  np.asarray(streamed.r))
    np.testing.assert_array_equal(np.asarray(resident.energy),
                                  np.asarray(streamed.energy))
    np.testing.assert_array_equal(np.asarray(tr1.energy),
                                  np.asarray(tr2.energy))
    np.testing.assert_array_equal(np.asarray(tr1.accepted),
                                  np.asarray(tr2.accepted))


def test_zsorted_auto_streams_when_vmem_overflows(monkeypatch):
    """The wrapper flips to the HBM-streamed kernel exactly when the
    resident VMEM ledger (3 planes + j-block temporaries) overflows;
    below that it stays resident. Checked by capturing the kwarg —
    running an N=16k kernel in interpret mode is not feasible."""
    from tpu_smc import ensemble as ens

    seen = {}
    real = sp.pallas_sweep_block

    def capture(*a, **kw):
        seen["hbm_stream"] = kw.get("hbm_stream", False)
        raise RuntimeError("stop after capture")

    monkeypatch.setattr(sp, "pallas_sweep_block", capture)
    big = SMCConfig.for_n(16384, dtype="float32")
    state, w = init_ensemble_state(big, jax.random.key(0), 128)
    with pytest.raises(Exception):
        ens.ensemble_sweeps_zsorted(
            state, w, big, big.proposal_a, 4, c_tile=128)
    assert seen["hbm_stream"] is True

    small = SMCConfig.for_n(1024, dtype="float32")
    state, w = init_ensemble_state(small, jax.random.key(0), 128)
    with pytest.raises(Exception):
        ens.ensemble_sweeps_zsorted(
            state, w, small, small.proposal_a, 4, c_tile=128)
    assert seen["hbm_stream"] is False

    # TPU_SMC_FORCE_HBM_STREAM=1 forces the stream route at any N (the
    # --global-ladder x hbm_stream composition escape: the stream and
    # resident kernels are bitwise per shard, so forcing the route at
    # small N exercises the pod-scale composition cheaply — see
    # test_sharded_zsorted_hbm_stream_ladder_bitwise for the sharded
    # bitwise pin and test_distributed for the cross-process ladder).
    monkeypatch.setenv("TPU_SMC_FORCE_HBM_STREAM", "1")
    with pytest.raises(Exception):
        ens.ensemble_sweeps_zsorted(
            state, w, small, small.proposal_a, 4, c_tile=128)
    assert seen["hbm_stream"] is True
    monkeypatch.delenv("TPU_SMC_FORCE_HBM_STREAM")
    monkeypatch.setattr(sp, "pallas_sweep_block", real)


def test_zsorted_ensemble_bookkeeping_and_chunk_invariance():
    """ensemble_sweeps_zsorted: energy bookkeeping exact after sort+sweep
    chunks, and trajectories bitwise chunk-invariant for cadence-ALIGNED
    splits (4+2 == 6 at an explicit cadence 4: both sort at sweeps 0 and
    4; a call boundary on a cadence multiple coincides with a scheduled
    re-sort, so the visit schedule is unchanged). Also covers the
    remainder path: 6 is not a multiple of the cadence, so the single
    call runs one full chunk plus a 2-sweep tail."""
    from tpu_smc.ensemble import ensemble_sweeps_zsorted

    cfg = SMCConfig(n=24, box_l=10.0, box_lz=60.0, dtype="float32")
    rng = np.random.default_rng(2)
    r0 = np.stack([
        rng.uniform(-4, 4, 24), rng.uniform(-4, 4, 24),
        rng.uniform(-28, 28, 24),
    ], axis=-1)
    state, w = init_ensemble_state(cfg, jax.random.key(4), 128, r0=r0)
    with pltpu.force_tpu_interpret_mode():
        s_one, tr = ensemble_sweeps_zsorted(
            state, w, cfg, cfg.proposal_a, 6, c_tile=128, row_block_rows=8,
            sweeps_per_sort=4)
        s_split = state
        for k in (4, 2):
            s_split, _ = ensemble_sweeps_zsorted(
                s_split, w, cfg, cfg.proposal_a, k, c_tile=128,
                row_block_rows=8, sweeps_per_sort=4)
    exact = jax.vmap(lambda r: total_energy(r, w, cfg))(s_one.r)
    assert float(jnp.max(jnp.abs(exact - s_one.energy))) < 1e-2
    acc = np.asarray(tr.accepted)
    assert np.all(acc >= 0) and np.all(acc <= cfg.n)
    # positions are label-permuted per chunk: compare as SORTED sets
    def canon(st):
        r = np.asarray(st.r)
        out = []
        for c in range(r.shape[0]):
            idx = np.lexsort((r[c, :, 2], r[c, :, 1], r[c, :, 0]))
            out.append(r[c, idx])
        return np.stack(out)
    np.testing.assert_array_equal(canon(s_one), canon(s_split))
    np.testing.assert_array_equal(
        np.asarray(s_one.energy), np.asarray(s_split.energy))


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="long-run drift needs the real kernel "
                           "(TPU_SMC_TEST_TPU=1 to run)")
def test_kernel_longrun_drift_tpu():
    """Hardware drift check: the kernel's incrementally-carried energy
    must stay within float32 accumulation error of an exact recompute
    over a long block (the reference never recomputes and drifts forever
    — SMC.c:194,341; we bound it, DEVIATIONS F5/A5)."""
    from tpu_smc.ensemble import ensemble_sweeps_pallas

    cfg = SMCConfig(dtype="float32")  # N=108, walls on
    state, w = init_ensemble_state(cfg, jax.random.key(3), 256)
    state, _ = ensemble_sweeps_pallas(state, w, cfg, cfg.proposal_a, 500,
                                      seed=7)
    exact = jax.jit(jax.vmap(lambda r: total_energy(r, w, cfg)))(state.r)
    drift = np.abs(np.asarray(exact) - np.asarray(state.energy))
    # |E| ~ 25; 500 sweeps x 108 moves of f32 accumulation
    assert float(drift.max()) < 5e-2, float(drift.max())
    assert float(np.median(drift)) < 1e-2


def test_kernel_bulk_pbc_z_with_pad_rows():
    """Bulk (pbc_z) regression: parking can't exclude rows when every
    coordinate wraps (an out-of-range park value wraps back into the
    box), so the kernel must id-mask instead. n=12 forces 4 pad rows;
    carried E must equal the exact recompute."""
    cfg = SMCConfig(n=12, box_l=10.0, box_lz=10.0, dtype="float32",
                    use_walls=False, pbc_z=True, lj_cutoff=3.0)
    rng = np.random.default_rng(5)
    r0 = rng.uniform(-4.5, 4.5, (12, 3))
    state, w = init_ensemble_state(cfg, jax.random.key(1), 128, r0=r0)
    x, y, z = sp.to_planes(state.r, cfg)
    wa, wb = sp.wall_coeff_rows(w, cfg)
    e = state.energy.reshape(1, -1).astype(jnp.float32)
    offsets = jnp.asarray([2, 9], jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        x2, y2, z2, e2, _, at = sp.pallas_sweep_block(
            x, y, z, e, wa, wb, offsets, jnp.int32(4), cfg, 2,
            cfg.proposal_a, c_tile=128,
        )
    r2 = sp.from_planes(x2, y2, z2, cfg)
    exact = jax.vmap(lambda r: total_energy(r, w, cfg))(r2)
    np.testing.assert_allclose(
        np.asarray(e2[0]), np.asarray(exact), rtol=1e-4, atol=1e-3
    )
    acc = np.asarray(at)
    assert np.all(acc >= 0) and np.all(acc <= cfg.n)


# ----------------------------------------------------------------------
# Per-chain (A, T) mode: the temperature-ladder kernel (tsweep/pt)
# ----------------------------------------------------------------------

def _ladder_rows(c, temps):
    """[1, C] A and 1/T rows for a ladder repeated across chains."""
    t_c = np.repeat(np.asarray(temps, np.float32), c // len(temps))
    a_c = (CFG.gamma * t_c).astype(np.float32)
    return (jnp.asarray(a_c).reshape(1, c),
            jnp.asarray(1.0 / t_c).reshape(1, c), t_c)


def test_kernel_per_chain_at_energy_bookkeeping():
    """Ladder mode: carried E equals a from-scratch recompute for every
    chain even though each lane ran a different (A, T)."""
    state, w = _dense_state(128)
    x, y, z = sp.to_planes(state.r, CFG)
    wa, wb = sp.wall_coeff_rows(w, CFG)
    e = state.energy.reshape(1, -1).astype(jnp.float32)
    a_row, invt_row, _ = _ladder_rows(128, [0.8, 1.0, 1.2, 1.5])
    offsets = jnp.asarray([3, 7], jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        x2, y2, z2, e2, et, at = sp.pallas_sweep_block(
            x, y, z, e, wa, wb, offsets, jnp.int32(5), CFG, 2, 0.0,
            c_tile=128, a_row=a_row, invt_row=invt_row,
        )
    r2 = sp.from_planes(x2, y2, z2, CFG)
    exact = jax.vmap(lambda r: total_energy(r, w, CFG))(r2)
    np.testing.assert_allclose(
        np.asarray(e2[0]), np.asarray(exact), rtol=1e-4, atol=1e-3
    )
    acc = np.asarray(at)
    assert np.all(acc >= 0) and np.all(acc <= CFG.n)
    assert np.all(np.abs(np.asarray(r2)[..., 2]) < CFG.box_lz / 2)


def test_kernel_per_chain_uniform_matches_scalar():
    """With every chain at the SAME (A, T), the ladder kernel must
    reproduce the scalar-static kernel's trajectory (same PRNG schedule;
    the only difference is mul-by-1/T vs divide-by-T rounding)."""
    state, w = _dense_state(128)
    x, y, z = sp.to_planes(state.r, CFG)
    wa, wb = sp.wall_coeff_rows(w, CFG)
    e = state.energy.reshape(1, -1).astype(jnp.float32)
    a = float(CFG.proposal_a)
    a_row = jnp.full((1, 128), a, jnp.float32)
    invt_row = jnp.full((1, 128), 1.0 / CFG.temperature, jnp.float32)
    offsets = jnp.asarray([2], jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        ref = sp.pallas_sweep_block(x, y, z, e, wa, wb, offsets,
                                    jnp.int32(9), CFG, 1, a, c_tile=128)
        lad = sp.pallas_sweep_block(x, y, z, e, wa, wb, offsets,
                                    jnp.int32(9), CFG, 1, 0.0, c_tile=128,
                                    a_row=a_row, invt_row=invt_row)
    # accept decisions must agree; positions/energies to f32 roundoff
    np.testing.assert_array_equal(np.asarray(ref[5]), np.asarray(lad[5]))
    for i in range(4):
        np.testing.assert_allclose(np.asarray(ref[i]), np.asarray(lad[i]),
                                   rtol=1e-5, atol=1e-5)


def test_tsweep_pallas_engine_end_to_end():
    """simulate_temperature_sweep(sampler='pallas') through the ladder
    kernel (interpret): finite per-T stats, E monotone in T."""
    from tpu_smc.config import RunParams
    from tpu_smc.tsweep import simulate_temperature_sweep

    params = RunParams(eqsteps=2, maxsteps=8, numdata=4)
    with pltpu.force_tpu_interpret_mode():
        _, res = simulate_temperature_sweep(
            CFG, params, [0.9, 1.4], jax.random.key(0),
            chains_per_t=64, sampler="pallas")
    assert np.all(np.isfinite(res.mean_energy))
    assert np.all((res.acceptance > 0) & (res.acceptance <= 1))
    assert res.mean_energy[1] > res.mean_energy[0]


def test_pt_pallas_engine_end_to_end():
    """Parallel tempering through the ladder kernel (interpret)."""
    from tpu_smc.config import RunParams
    from tpu_smc.pt import simulate_parallel_tempering

    params = RunParams(eqsteps=2, maxsteps=8, numdata=4)
    with pltpu.force_tpu_interpret_mode():
        _, res = simulate_parallel_tempering(
            CFG, params, [0.9, 1.4], jax.random.key(0),
            chains_per_t=64, exchange_interval=2, sampler="pallas")
    assert np.all(np.isfinite(res.tsweep.mean_energy))
    assert np.all((res.swap_acceptance >= 0) & (res.swap_acceptance <= 1))
    assert int(res.swap_attempts.sum()) > 0


def test_zsorted_odd_call_lengths_keep_cadence():
    """Call lengths that are NOT multiples of the sort cadence run as
    full-cadence chunks plus one short tail — they must work (no
    divisibility assert) and return full-length traces. Guards the
    round-3 review finding that odd gather lapses used to silently
    collapse the cadence to 1 (dense-speed zsorted)."""
    from tpu_smc.ensemble import (ensemble_sweeps_zsorted, zsort_cadence)

    # The product cadence is N-dependent (measured optimum, PERF_NOTES):
    # 16 at the N=1024 bench-primary size, 8 at larger N.
    assert zsort_cadence(1024) == 16
    assert zsort_cadence(2048) == 8
    assert zsort_cadence(16384) == 8
    cfg = SMCConfig(n=16, box_l=10.0, box_lz=40.0, dtype="float32")
    state, w = init_ensemble_state(cfg, jax.random.key(9), 128)
    with pltpu.force_tpu_interpret_mode():
        for nsw in (1, 3, 5, 7):
            st, tr = ensemble_sweeps_zsorted(
                state, w, cfg, cfg.proposal_a, nsw, c_tile=128,
                row_block_rows=8)
            assert tr.energy.shape[0] == nsw
            assert np.all(np.isfinite(np.asarray(st.energy)))
            exact = jax.vmap(lambda r: total_energy(r, w, cfg))(st.r)
            assert float(jnp.max(jnp.abs(exact - st.energy))) < 1e-2


def test_tsweep_zsorted_engine_end_to_end():
    """simulate_temperature_sweep(sampler='zsorted'): the z-block-skip
    engine carries the ladder's per-chain (A, T) rows — they are chain-
    indexed, so the per-chunk particle sorts never touch them. Finite
    per-T stats, E monotone in T (interpret)."""
    from tpu_smc.config import RunParams
    from tpu_smc.tsweep import simulate_temperature_sweep

    params = RunParams(eqsteps=2, maxsteps=8, numdata=4)
    with pltpu.force_tpu_interpret_mode():
        _, res = simulate_temperature_sweep(
            CFG, params, [0.9, 1.4], jax.random.key(0),
            chains_per_t=64, sampler="zsorted")
    assert np.all(np.isfinite(res.mean_energy))
    assert np.all((res.acceptance > 0) & (res.acceptance <= 1))
    assert res.mean_energy[1] > res.mean_energy[0]


def test_pt_zsorted_engine_end_to_end():
    """Parallel tempering through the zsorted engine (interpret):
    exchanges swap configurations between temperature slots while the
    engine re-sorts particles by z between chunks — slot bookkeeping and
    particle identity must both survive."""
    from tpu_smc.config import RunParams
    from tpu_smc.pt import simulate_parallel_tempering

    params = RunParams(eqsteps=2, maxsteps=8, numdata=4)
    with pltpu.force_tpu_interpret_mode():
        _, res = simulate_parallel_tempering(
            CFG, params, [0.9, 1.4], jax.random.key(0),
            chains_per_t=64, exchange_interval=2, sampler="zsorted")
    assert np.all(np.isfinite(res.tsweep.mean_energy))
    assert np.all((res.swap_acceptance >= 0) & (res.swap_acceptance <= 1))
    assert int(res.swap_attempts.sum()) > 0


def test_hbm_stream_ladder_rows_bitwise():
    """The HBM-streamed kernel's per-chain (A, T) ladder mode must be
    bitwise the VMEM zskip kernel's at the same row_block — the ladder
    rows ride both engines identically (round-4 roadmap item #3 closed
    at the correctness level; hardware N>10k exercise pending)."""
    cfg = SMCConfig(n=24, box_l=10.0, box_lz=60.0, dtype="float32")
    rng = np.random.default_rng(8)
    r0 = np.stack([
        rng.uniform(-4, 4, 24), rng.uniform(-4, 4, 24),
        np.sort(rng.uniform(-28, 28, 24)),
    ], axis=-1)
    state, w = init_ensemble_state(cfg, jax.random.key(1), 128, r0=r0)
    x, y, z = sp.to_planes(state.r, cfg)
    wa, wb = sp.wall_coeff_rows(w, cfg)
    e = state.energy.reshape(1, -1).astype(jnp.float32)
    t_c = np.repeat(np.asarray([0.9, 1.1, 1.3, 1.5], np.float32), 32)
    a_row = jnp.asarray(cfg.gamma * t_c).reshape(1, 128)
    invt_row = jnp.asarray(1.0 / t_c).reshape(1, 128)
    offsets = jnp.asarray([5, 17], jnp.int32)
    seeds = jnp.asarray([[3, 4], [5, 6]], jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        vmem = sp.pallas_sweep_block(
            x, y, z, e, wa, wb, offsets, seeds, cfg, 2, 0.0,
            c_tile=128, zskip=True, row_block_rows=8,
            a_row=a_row, invt_row=invt_row)
        stream = sp.pallas_sweep_block(
            x, y, z, e, wa, wb, offsets, seeds, cfg, 2, 0.0,
            c_tile=128, zskip=True, row_block_rows=8, hbm_stream=True,
            a_row=a_row, invt_row=invt_row)
    for a, b in zip(vmem, stream):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_zsorted_hbm_stream_ladder_bitwise():
    """--global-ladder at N beyond VMEM (round-4 roadmap #5): the
    sharded zsorted wrapper with per-chain (A, T) ladder rows routed
    through the HBM-streamed kernel must be bitwise the resident engine
    on the same mesh — shard_map shards chains only, and the stream/
    resident switch is already bitwise per shard, so the composition is
    a pure capacity decision for pod-scale ladders too."""
    from tpu_smc import ensemble as ens

    mesh = ens.make_mesh(2, axis_names=("chains",))
    state, w = init_ensemble_state(CFG, jax.random.key(9), 2 * 128)
    state = ens.shard_ensemble(state, mesh)
    t_c = np.repeat(np.asarray([0.9, 1.3], np.float32), 128)
    a_c = jnp.asarray(CFG.gamma * t_c)
    t_c = jnp.asarray(t_c)
    kw = dict(seed=(7, 2), mesh=mesh, c_tile=128, row_block_rows=8,
              a_per_chain=a_c, t_per_chain=t_c)
    with pltpu.force_tpu_interpret_mode():
        res, tr1 = ens.ensemble_sweeps_zsorted_sharded(
            state, w, CFG, 0.0, 2, hbm_stream=False, **kw)
        stm, tr2 = ens.ensemble_sweeps_zsorted_sharded(
            state, w, CFG, 0.0, 2, hbm_stream=True, **kw)
    np.testing.assert_array_equal(np.asarray(res.r), np.asarray(stm.r))
    np.testing.assert_array_equal(np.asarray(res.energy),
                                  np.asarray(stm.energy))
    np.testing.assert_array_equal(np.asarray(tr1.energy),
                                  np.asarray(tr2.energy))
    np.testing.assert_array_equal(np.asarray(tr1.accepted),
                                  np.asarray(tr2.accepted))


def test_kernel_per_chain_walls_bitwise_vs_uniform():
    """Quenched wall disorder on the kernel engine: per-chain wall
    coefficient planes (per_chain_w) with group tables [w0 x 64,
    w1 x 64] must reproduce, bitwise, the uniform-wall kernel run with
    w0 / w1 on the corresponding chain groups (same state, same seeds —
    the noise stream does not depend on the wall table)."""
    from tpu_smc.ensemble import ensemble_sweeps_pallas
    from tpu_smc.system import build_wall_ensemble

    state, _ = _dense_state(128)
    w_k, _, _ = build_wall_ensemble(CFG, 2)
    w_pc = jnp.asarray(np.repeat(w_k, 64, axis=0), CFG.jnp_dtype)
    kw = dict(seed=11, c_tile=128)
    with pltpu.force_tpu_interpret_mode():
        mixed, trm = ensemble_sweeps_pallas(
            state, w_pc, CFG, CFG.proposal_a, 3, **kw)
        for g in range(2):
            uni, tru = ensemble_sweeps_pallas(
                state, jnp.asarray(w_k[g], CFG.jnp_dtype), CFG,
                CFG.proposal_a, 3, **kw)
            sl = slice(g * 64, (g + 1) * 64)
            np.testing.assert_array_equal(np.asarray(mixed.r[sl]),
                                          np.asarray(uni.r[sl]))
            np.testing.assert_array_equal(np.asarray(mixed.energy[sl]),
                                          np.asarray(uni.energy[sl]))
            np.testing.assert_array_equal(np.asarray(trm.accepted[:, sl]),
                                          np.asarray(tru.accepted[:, sl]))
    # the two walls actually differ: cross-group trajectories diverge
    assert not np.array_equal(np.asarray(mixed.r[:64]),
                              np.asarray(mixed.r[64:]))


def test_zsorted_per_chain_walls_bitwise_vs_uniform():
    """Same contract through the zsorted engine (sorts permute
    PARTICLES within a chain; the chain-indexed wall planes are
    untouched), including the HBM-streamed kernel."""
    from tpu_smc.ensemble import ensemble_sweeps_zsorted
    from tpu_smc.system import build_wall_ensemble

    state, _ = _dense_state(128)
    w_k, _, _ = build_wall_ensemble(CFG, 2)
    w_pc = jnp.asarray(np.repeat(w_k, 64, axis=0), CFG.jnp_dtype)
    for stream in (False, True):
        kw = dict(seed=13, c_tile=128, row_block_rows=8,
                  sweeps_per_sort=2, hbm_stream=stream)
        with pltpu.force_tpu_interpret_mode():
            mixed, _ = ensemble_sweeps_zsorted(
                state, w_pc, CFG, CFG.proposal_a, 4, **kw)
            for g in range(2):
                uni, _ = ensemble_sweeps_zsorted(
                    state, jnp.asarray(w_k[g], CFG.jnp_dtype), CFG,
                    CFG.proposal_a, 4, **kw)
                sl = slice(g * 64, (g + 1) * 64)
                np.testing.assert_array_equal(np.asarray(mixed.r[sl]),
                                              np.asarray(uni.r[sl]))
                np.testing.assert_array_equal(
                    np.asarray(mixed.energy[sl]),
                    np.asarray(uni.energy[sl]))


def test_sharded_per_chain_walls_bitwise():
    """Per-chain wall tables under shard_map: the planes shard with
    their chains, and the 2-device run is bitwise the same kernels run
    per shard (the salted per-device seed stream is part of the
    contract, so compare against the single-device engine run on each
    half with the matching salt)."""
    from tpu_smc import ensemble as ens
    from tpu_smc.system import build_wall_ensemble

    mesh = ens.make_mesh(2, axis_names=("chains",))
    state, _ = _dense_state(256)
    w_k, _, _ = build_wall_ensemble(CFG, 2)
    w_pc = jnp.asarray(np.repeat(w_k, 128, axis=0), CFG.jnp_dtype)
    sstate = ens.shard_ensemble(state, mesh)
    with pltpu.force_tpu_interpret_mode():
        out, tr = ens.ensemble_sweeps_pallas_sharded(
            sstate, w_pc, CFG, CFG.proposal_a, 2, seed=21, mesh=mesh,
            c_tile=128)
        for d in range(2):
            sl = slice(d * 128, (d + 1) * 128)
            half = jax.tree.map(lambda x: x[sl], state)
            # reproduce _device_salted_seed's per-shard stream exactly
            salt = (21 + d * 0x9E3779, d)
            ref, _ = ens.ensemble_sweeps_pallas(
                half, w_pc[sl], CFG, CFG.proposal_a, 2,
                seed=jnp.asarray(salt, jnp.int32), c_tile=128)
            np.testing.assert_array_equal(np.asarray(out.r[sl]),
                                          np.asarray(ref.r))
            np.testing.assert_array_equal(np.asarray(out.energy[sl]),
                                          np.asarray(ref.energy))


def test_zsorted_per_chain_walls_with_ladder_rows_bitwise():
    """The production disorder-LADDER path on TPU: per_chain_w AND the
    per-chain (A, T) ladder rows in ONE kernel call. Group tables with a
    shared per-chain (A, T) layout must reproduce the uniform-wall
    kernel per chain group, bitwise — pins the combined in_specs/args
    wiring that every kernel ladder at N>=1024 with --wall-realizations
    auto-selects."""
    from tpu_smc.ensemble import ensemble_sweeps_zsorted
    from tpu_smc.system import build_wall_ensemble

    state, _ = _dense_state(128)
    w_k, _, _ = build_wall_ensemble(CFG, 2)
    w_pc = jnp.asarray(np.repeat(w_k, 64, axis=0), CFG.jnp_dtype)
    # a 2-level ladder INSIDE each wall group (realization = replica
    # blocks of the slot layout): identical (A, T) rows across runs
    t_c = jnp.asarray(np.tile(np.repeat([1.0, 1.2], 32), 2), jnp.float32)
    a_c = CFG.gamma * t_c
    kw = dict(seed=17, c_tile=128, row_block_rows=8, sweeps_per_sort=2,
              a_per_chain=a_c, t_per_chain=t_c)
    with pltpu.force_tpu_interpret_mode():
        mixed, _ = ensemble_sweeps_zsorted(state, w_pc, CFG, 0.0, 4, **kw)
        for g in range(2):
            uni, _ = ensemble_sweeps_zsorted(
                state, jnp.asarray(w_k[g], CFG.jnp_dtype), CFG, 0.0, 4,
                **kw)
            sl = slice(g * 64, (g + 1) * 64)
            np.testing.assert_array_equal(np.asarray(mixed.r[sl]),
                                          np.asarray(uni.r[sl]))
            np.testing.assert_array_equal(np.asarray(mixed.energy[sl]),
                                          np.asarray(uni.energy[sl]))


def _xsorted_2d(r0, rb, xsl):
    """Order rows by z-band (groups of rb*xsl rows by z) then x within
    each band — the layout ensemble_sweeps_zsorted(xsort_slices=xsl)
    produces."""
    n = r0.shape[0]
    band_rows = rb * xsl
    zperm = np.argsort(r0[:, 2])
    r = r0[zperm]
    for b0 in range(0, n, band_rows):
        band = r[b0:b0 + band_rows]
        r[b0:b0 + band_rows] = band[np.argsort(band[:, 0])]
    return r


def test_xslices_bitwise_identical_to_dense_blocks():
    """The 2-D (z-band, x-slice) refinement skips ONLY provably-zero
    blocks: the kernel with zskip+xslices vs no skipping at all must be
    bitwise identical on the same (2-D sorted) row order — the same
    exactness-by-construction contract as the 1-D zskip test above."""
    cfg = SMCConfig(n=32, box_l=24.0, box_lz=60.0, dtype="float32")
    rng = np.random.default_rng(11)
    r0 = np.stack([
        rng.uniform(-11, 11, 32), rng.uniform(-11, 11, 32),
        rng.uniform(-28, 28, 32),
    ], axis=-1)
    r0 = _xsorted_2d(r0, 8, 2)
    state, w = init_ensemble_state(cfg, jax.random.key(2), 128, r0=r0)
    x, y, z = sp.to_planes(state.r, cfg)
    wa, wb = sp.wall_coeff_rows(w, cfg)
    e = state.energy.reshape(1, -1).astype(jnp.float32)
    offsets = jnp.asarray([3, 11], jnp.int32)
    seeds = jnp.asarray([[5, 7], [9, 11]], jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        on = sp.pallas_sweep_block(
            x, y, z, e, wa, wb, offsets, seeds, cfg, 2, cfg.proposal_a,
            c_tile=128, zskip=True, row_block_rows=8, xslices=2)
        off = sp.pallas_sweep_block(
            x, y, z, e, wa, wb, offsets, seeds, cfg, 2, cfg.proposal_a,
            c_tile=128, zskip=False, row_block_rows=8)
    for a, b in zip(on, off):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_xslices_seam_cluster_bitwise():
    """Same contract with every particle near the periodic x seam
    (|x| ~ L/2): the doubled-index-space slice admission must handle
    windows that wrap, and the clamped run must never process a block
    twice (a double-count would break bitwise equality loudly)."""
    cfg = SMCConfig(n=32, box_l=24.0, box_lz=60.0, dtype="float32")
    rng = np.random.default_rng(12)
    xseam = np.where(rng.uniform(size=32) < 0.5,
                     -12.0 + rng.uniform(0, 1.5, 32),
                     12.0 - rng.uniform(0, 1.5, 32))
    r0 = np.stack([
        xseam, rng.uniform(-11, 11, 32), rng.uniform(-28, 28, 32),
    ], axis=-1)
    r0 = _xsorted_2d(r0, 8, 4)
    state, w = init_ensemble_state(cfg, jax.random.key(3), 128, r0=r0)
    x, y, z = sp.to_planes(state.r, cfg)
    wa, wb = sp.wall_coeff_rows(w, cfg)
    e = state.energy.reshape(1, -1).astype(jnp.float32)
    offsets = jnp.asarray([1, 7], jnp.int32)
    seeds = jnp.asarray([[15, 17], [19, 21]], jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        on = sp.pallas_sweep_block(
            x, y, z, e, wa, wb, offsets, seeds, cfg, 2, cfg.proposal_a,
            c_tile=128, zskip=True, row_block_rows=8, xslices=4)
        off = sp.pallas_sweep_block(
            x, y, z, e, wa, wb, offsets, seeds, cfg, 2, cfg.proposal_a,
            c_tile=128, zskip=False, row_block_rows=8)
    for a, b in zip(on, off):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_zsorted_wrapper_xsort_bookkeeping():
    """ensemble_sweeps_zsorted(xsort_slices=2): carried energy matches
    an exact recompute, particle identity survives the 2-D sorts, and
    the run is deterministic for a fixed seed."""
    from tpu_smc.ensemble import ensemble_sweeps_zsorted

    cfg = SMCConfig(n=32, box_l=24.0, box_lz=60.0, dtype="float32")
    rng = np.random.default_rng(13)
    r0 = np.stack([
        rng.uniform(-11, 11, 32), rng.uniform(-11, 11, 32),
        rng.uniform(-28, 28, 32),
    ], axis=-1)
    state, w = init_ensemble_state(cfg, jax.random.key(9), 128, r0=r0)
    kw = dict(seed=23, c_tile=128, row_block_rows=8, sweeps_per_sort=2,
              xsort_slices=2)
    with pltpu.force_tpu_interpret_mode():
        out1, tr1 = ensemble_sweeps_zsorted(
            state, w, cfg, cfg.proposal_a, 4, **kw)
        out2, _ = ensemble_sweeps_zsorted(
            state, w, cfg, cfg.proposal_a, 4, **kw)
    exact = jax.vmap(lambda r: total_energy(r, w, cfg))(out1.r)
    np.testing.assert_allclose(np.asarray(out1.energy), np.asarray(exact),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(out1.r), np.asarray(out2.r))
    # identity: each chain's rows are a permutation-free original-order
    # state (unmoved particles sit exactly at their start positions)
    acc = np.asarray(tr1.accepted).sum()
    assert 0 < acc <= 4 * 32 * 128
