"""Hoisted cluster analysis: large CNA passes leave the fused gather
window (driver.cna_hoist) and run as bounded device calls — required on
hardware where one pass at large N x chains is p_pad*N^2 MACs per chain
in a single program (~180 s at N=4096 x 32 chains), past the ~100 s TPU
runtime watchdog. The hoisted path must reproduce the in-scan lax.cond
path EXACTLY (integer-exact partial histograms, SMC.c:971-1045
semantics), and the --lca-time / --storage-time CLI knobs must plumb
through to the config.
"""

import jax
import numpy as np
import pytest

from tpu_smc.config import RunParams, SMCConfig
from tpu_smc import driver as drv
from tpu_smc.driver import ObservableOptions
from tpu_smc.observables import (
    cluster_analysis,
    cluster_histograms,
    cluster_histograms_tile_range,
    cna_tile_pairs,
)


def _dense_positions(n, lx, lz, seed):
    rng = np.random.default_rng(seed)
    r = np.stack([
        rng.uniform(-lx / 2, lx / 2, n),
        rng.uniform(-lx / 2, lx / 2, n),
        rng.uniform(-lz / 2, lz / 2, n),
    ], axis=1)
    return jax.numpy.asarray(r, jax.numpy.float32)


@pytest.mark.parametrize("n,lx,lz", [(256, 9.0, 18.0), (150, 7.5, 15.0)])
def test_tile_range_partials_sum_exact(n, lx, lz):
    """Disjoint tile ranges of the gather-free executor sum EXACTLY to
    the per-pair full-pass histograms — including at N not a multiple
    of CNA_TILE (zero-padded rows/cols are never bonded), and despite
    the bf16 matmul inputs (0/1 entries, f32 accumulation: integer-
    exact)."""
    cfg = SMCConfig(n=n, box_l=lx, box_lz=lz, dtype="float32")
    r = _dense_positions(n, lx, lz, seed=0)        # dense: real clusters
    full = cluster_histograms(cluster_analysis(r, cfg))
    tiles_total = int(cna_tile_pairs(n).shape[0])
    acc = [np.zeros((), np.int64), np.zeros(7, np.int64),
           np.zeros(7, np.int64)]
    s0 = 0
    for ns in (1, 2, tiles_total):                 # uneven disjoint cover
        ns = min(ns, tiles_total - s0)
        if ns <= 0:
            break
        part = cluster_histograms_tile_range(
            r, cfg, jax.numpy.int32(s0), ns)
        for i in range(3):
            acc[i] = acc[i] + np.asarray(part[i])
        s0 += ns
    assert s0 == tiles_total
    assert int(full[0]) > 0, "test system must actually have bonds"
    np.testing.assert_array_equal(acc[0], np.asarray(full[0]))
    np.testing.assert_array_equal(acc[1], np.asarray(full[1]))
    np.testing.assert_array_equal(acc[2], np.asarray(full[2]))


def test_cna_hoisted_histograms_chunks_match_full(monkeypatch):
    """The chunked executor (chain chunks + block ranges + tail padding)
    equals the per-chain full pass for every chunking regime."""
    cfg = SMCConfig(n=96, box_l=7.0, box_lz=14.0, dtype="float32")
    r = jax.numpy.stack([_dense_positions(96, 7.0, 14.0, seed=s)
                         for s in range(5)])          # 5 chains (odd tail)
    ref = jax.vmap(lambda ri: cluster_histograms(
        cluster_analysis(ri, cfg)))(r)
    macs_chain = drv._cna_pass_macs(cfg)
    for budget in (macs_chain * 2, macs_chain, macs_chain // 2):
        monkeypatch.setattr(drv, "CNA_CALL_MACS", float(budget))
        drv._CNA_JIT_CACHE.clear()
        l1, l2, l3 = drv.cna_hoisted_histograms(r, cfg)
        np.testing.assert_array_equal(l1, np.asarray(ref[0]))
        np.testing.assert_array_equal(l2, np.asarray(ref[1]))
        np.testing.assert_array_equal(l3, np.asarray(ref[2]))
    assert int(l1.sum()) > 0


def test_hoist_decision_and_advisory(capsys):
    small = SMCConfig(dtype="float32")                 # N=108
    assert not drv.cna_hoist(small, 2048, True)
    assert not drv.cna_hoist(SMCConfig.for_n(4096), 32, False)
    drv.warn_cna_spike(small, 2048)
    assert capsys.readouterr().out == ""
    big = SMCConfig.for_n(4096, dtype="float32")
    assert drv.cna_hoist(big, 32, True)
    est = drv.warn_cna_spike(big, 32)
    out = capsys.readouterr().out
    # p_pad*N^2 MACs per chain at the measured 2.5e13 MACs/s anchor:
    # ~5.6 s/chain -> ~180 s at 32 chains (the fused single-call spike
    # that motivated the hoist)
    assert 100 < est < 300
    assert "hoisted" in out and "--lca-time" in out


def test_hoisted_ensemble_driver_matches_inscan(monkeypatch):
    """Force the hoist on a tiny run: trajectories bitwise identical
    (CNA reads snapshots, never touches state; XLA-engine call splits
    are strictly invariant) and l1/l2/l3 exactly equal the in-scan
    lax.cond path."""
    from tpu_smc.driver_ensemble import simulate_ensemble
    from tpu_smc.state import init_ensemble_state

    cfg = SMCConfig(n=24, box_l=6.0, box_lz=12.0, dtype="float64",
                    lca_time=2)
    params = RunParams(eqsteps=4, maxsteps=16, numdata=8)
    opts = ObservableOptions(pressure=True, clusters=True)

    state0, w = init_ensemble_state(cfg, jax.random.key(7), 4)
    _, ref = simulate_ensemble(cfg, params, state0, w, opts=opts)

    monkeypatch.setattr(drv, "CNA_HOIST_SECONDS", -1.0)
    monkeypatch.setattr(drv, "CNA_CALL_MACS",
                        float(drv._cna_pass_macs(cfg) * 2))
    drv._CNA_JIT_CACHE.clear()
    state1, w1 = init_ensemble_state(cfg, jax.random.key(7), 4)
    _, hoisted = simulate_ensemble(cfg, params, state1, w1, opts=opts)

    assert any(c.l1 > 0 for c in ref.chains), "need real bonded pairs"
    for cr, ch in zip(ref.chains, hoisted.chains):
        np.testing.assert_array_equal(ch.r_final, cr.r_final)
        assert ch.l1 == cr.l1
        np.testing.assert_array_equal(ch.l2, cr.l2)
        np.testing.assert_array_equal(ch.l3, cr.l3)
        np.testing.assert_array_equal(ch.energy_trace, cr.energy_trace)


def test_hoisted_single_chain_driver_matches_inscan(monkeypatch):
    from tpu_smc.driver import simulate
    from tpu_smc.state import init_chain_state

    cfg = SMCConfig(n=24, box_l=6.0, box_lz=12.0, dtype="float64",
                    lca_time=2, storage_time=3)
    params = RunParams(eqsteps=4, maxsteps=16, numdata=8)
    opts = ObservableOptions(pressure=True, clusters=True)

    state0, w = init_chain_state(cfg, jax.random.key(9))
    _, ref = simulate(cfg, params, state0, w, opts=opts)

    monkeypatch.setattr(drv, "CNA_HOIST_SECONDS", -1.0)
    drv._CNA_JIT_CACHE.clear()
    state1, w1 = init_chain_state(cfg, jax.random.key(9))
    _, hoisted = simulate(cfg, params, state1, w1, opts=opts)

    assert ref.l1 > 0
    assert hoisted.l1 == ref.l1
    np.testing.assert_array_equal(hoisted.l2, ref.l2)
    np.testing.assert_array_equal(hoisted.l3, ref.l3)
    np.testing.assert_array_equal(hoisted.r_final, ref.r_final)
    np.testing.assert_array_equal(hoisted.energy_trace, ref.energy_trace)


def test_cli_lca_and_storage_time_plumbed(tmp_path):
    """--lca-time / --storage-time (SMC.h:48,45 compile-time macros)
    reach the config; the checkpoint round-trips them."""
    from tpu_smc import io as smcio
    from tpu_smc.cli import main as cli_main

    rc = cli_main([
        "4", "16", "4", "1.1", "--seed", "3",
        "--lca-time", "2", "--storage-time", "3", "--no-trace",
        "--data-dir", str(tmp_path / "Data"),
        "--checkpoint", str(tmp_path / "ck.npz"),
    ])
    assert rc in (0, None)
    state, cfg = smcio.load_checkpoint(str(tmp_path / "ck.npz"))
    assert cfg.lca_time == 2
    assert cfg.storage_time == 3
