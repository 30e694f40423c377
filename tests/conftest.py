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


def pytest_collection_modifyitems(config, items):
    if reference_available():
        return
    skip = pytest.mark.skip(reason="C reference not available at /root/reference")
    for item in items:
        if "c_reference" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def goldens():
    """Golden values dumped by the compiled C reference (parity/probe.c)."""
    from parity.reference import run_probe

    return run_probe(108)
