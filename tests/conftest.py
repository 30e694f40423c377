"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices — the standard way to exercise
shard_map/mesh code without a TPU pod (SURVEY §4) — and with x64 enabled so
float64 configs can be compared digit-for-digit against the C reference.
Must run before jax initializes, hence the env mutation at import time.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# NOTE: the JAX_PLATFORMS env var is unreliable under the axon TPU plugin —
# the config update is what actually forces the CPU backend.
# TPU_SMC_TEST_TPU=1 keeps the real backend so the hardware-only tests
# (PRNG statistics, kernel drift) actually run:
#   TPU_SMC_TEST_TPU=1 python -m pytest tests/test_pallas.py -q
if os.environ.get("TPU_SMC_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

# Make the repo root importable (tpu_smc, parity) without installation.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

from parity.reference import reference_available  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "c_reference: needs the compiled C reference (skipped if absent)"
    )
    config.addinivalue_line("markers", "slow: long-running statistical test")
    config.addinivalue_line(
        "markers",
        "quick: fast subset (`pytest -m quick`, <3 min) — unit physics, "
        "io, kernels in interpret mode; statistical end-to-end excluded")


# `pytest -m quick`: the <3-minute inner loop. Whole modules of unit
# tests, minus the few >12 s statistical outliers inside them. The full
# suite (~17 min) stays the merge gate; this is the edit-test loop.
QUICK_MODULES = {
    "test_potentials", "test_mathlib", "test_native", "test_observables",
    "test_io", "test_sampler", "test_pallas", "test_disorder",
    "test_umbrella", "test_widom", "test_gcmc", "test_npt",
    "test_gibbs", "test_profiling",
}
QUICK_EXCLUDE = {
    "test_zsorted_ensemble_bookkeeping_and_chunk_invariance",  # ~20 s
    "test_float32_statistics_match_float64",                   # ~14 s
    # round-3 cont. interpret-mode end-to-ends (each 15-30 s):
    "test_zsorted_tuned_override_matches_static",
    "test_zsorted_driver_tuned_override_runs",
    "test_tsweep_zsorted_engine_end_to_end",
    "test_pt_zsorted_engine_end_to_end",
    "test_tsweep_pallas_engine_end_to_end",
    "test_pt_pallas_engine_end_to_end",
    "test_zsorted_wrapper_hbm_stream_bitwise",
    "test_sharded_wrappers_accept_two_word_seeds",   # 34 s
    "test_zsorted_odd_call_lengths_keep_cadence",    # 25 s
    "test_sharded_zsorted_sweep_on_virtual_mesh",    # 14 s
    "test_sharded_zsorted_hbm_stream_ladder_bitwise",  # 24 s
    # disorder CLI end-to-ends (subprocesses / full driver, 20-70 s):
    "test_disorder_cli_end_to_end",
    "test_disorder_sharded_mesh",
    "test_disorder_two_process_bitwise",
    "test_disorder_cli_guards",
    "test_disorder_ladder_cli_end_to_end",
    "test_reweight_disorder_k1_equals_plain",
    "test_disorder_pt_keeps_slot_walls_consistent",
    # per-chain-wall kernel bitwise identities (interpret mode, 20-60 s):
    "test_kernel_per_chain_walls_bitwise_vs_uniform",
    "test_zsorted_per_chain_walls_bitwise_vs_uniform",
    "test_sharded_per_chain_walls_bitwise",
    "test_zsorted_per_chain_walls_with_ladder_rows_bitwise",
    # umbrella end-to-ends (full driver / statistical, 30-150 s):
    "test_strong_spring_localizes_only_the_tag",
    "test_umbrella_matches_direct_histogram_in_overlap",
    "test_parse_centers_and_cli",
    "test_reus_run_swaps_and_matches_plain_pmf",
    # keep the quick subset under 3 min:
    "test_per_chain_walls_bitwise_vs_separate_runs",   # 10 s
    "test_wall_seed_single_chain",                     # 8 s
    "test_ladder_per_chain_walls_identical_rows_bitwise",  # 7 s
    # widom statistical / full-driver end-to-ends (25-70 s each):
    "test_dilute_bulk_matches_second_virial",
    "test_activity_identity_across_z",
    "test_reweighted_mu_ex_matches_direct_simulation",
    "test_widom_sampling_leaves_trajectory_untouched",
    "test_widom_window_split_invariance",
    "test_ladder_collects_paired_widom_samples",
    "test_pt_collects_paired_widom_samples",
    # gcmc end-to-ends (compiled GC sweeps, 40-160 s each):
    "test_gcmc_bookkeeping_and_counts",
    "test_gcmc_dilute_matches_ideal_gas",
    "test_widom_gcmc_closed_loop",
    "test_gcmc_walls_smoke",
    "test_gcmc_isotherm_cli",
    "test_gcmc_checkpoint_resume_bitwise",
    "test_pressure_profile_bulk_isotropy",    # 35 s statistical
    "test_gcmc_gr_matches_nvt_at_same_density",   # 60 s statistical
    # npt statistical/end-to-end (the unit physics stays quick):
    "test_nvt_npt_closed_loop",
    "test_volume_fluctuation_dissipation",
    "test_npt_cli_isobar_grid",          # ~20 s statistical CLI drive
    "test_npt_cli_run_and_resume",       # ~12 s subprocess drive
    "test_checkpoint_resume_bitwise",    # ~16 s driver end-to-end
    "test_isobar_family_runs_per_chain_pressures",  # ~8 s statistical
    "test_isobar_reweight_self_consistent",         # ~10 s statistical
    "test_isobar_reweight_matches_direct_offgrid",  # ~60 s statistical
    # gibbs statistical end-to-ends:
    "test_transfer_only_ideal_gas_splits_by_volume",
    "test_supercritical_boxes_equalize",
    "test_subcritical_coexistence_bifurcates",
    "test_gibbs_checkpoint_resume_bitwise",   # ~25 s driver end-to-end
    "test_gibbs_sharded_mesh",                # ~25 s mesh end-to-end
    "test_npt_sharded_mesh",                  # ~25 s mesh end-to-end
    "test_tp_grid_and_2d_reweight",           # ~70 s statistical
    "test_gibbs_temperature_ladder_binodal",  # ~60 s statistical
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rpartition(".")[-1]
        if mod in QUICK_MODULES and \
                item.name.split("[")[0] not in QUICK_EXCLUDE:
            item.add_marker(pytest.mark.quick)
    if reference_available():
        return
    skip = pytest.mark.skip(reason="C reference not available at /root/reference")
    for item in items:
        if "c_reference" in item.keywords:
            item.add_marker(skip)


# The XLA CPU compiler can SIGSEGV on a fresh LARGE compile late in a
# long pytest session (observed in test_umbrella twice, then
# test_pt::test_pt_auto_interval_end_to_end at ~70% of the full suite;
# every victim passes in isolation). Clearing jax's compilation caches
# before the compile-heavy statistical modules dodges it at the cost of
# a few recompiles. test_umbrella also self-clears (older remedy).
CLEAR_CACHE_MODULES = {"test_pt", "test_umbrella", "test_reweight",
                       "test_ladder_mesh"}
_cleared = set()


@pytest.fixture(autouse=True)
def _xla_segfault_dodge(request):
    mod = request.module.__name__.rpartition(".")[-1]
    if mod in CLEAR_CACHE_MODULES and mod not in _cleared:
        _cleared.add(mod)
        jax.clear_caches()
    yield


@pytest.fixture(scope="session")
def goldens():
    """Golden values dumped by the compiled C reference (parity/probe.c)."""
    from parity.reference import run_probe

    return run_probe(108)
