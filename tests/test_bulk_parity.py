"""Bulk-variant (SMC_noMPI_noWall.c) side-by-side checks."""

import re
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_smc.config import SMCConfig
from tpu_smc.potentials import total_energy
from tpu_smc.sampler import run_sweeps
from tpu_smc.state import init_chain_state


@pytest.mark.c_reference
def test_bulk_side_by_side(tmp_path):
    """Run the compiled bulk program, then evaluate OUR bulk physics on
    the configuration it ends in: the mean energies must agree (at the
    bulk A=4e-8 the chain barely moves, so the C-reported mean E is the
    energy of its configuration to within its own dE), and our sampler's
    acceptance at that mobility must match the C's ~1.0."""
    from parity.reference import build_bulk_main

    exe = build_bulk_main(maxsteps=20000, eqsteps=2000)
    out = subprocess.run([str(exe)], cwd=tmp_path, check=True,
                         capture_output=True, text=True, timeout=300).stdout
    c_e = float(re.search(r"Mean energy: ([-\d.]+)", out).group(1))
    c_de = float(re.search(r"Mean energy: [-\d.]+ .?.? ([\d.]+)", out).group(1))
    c_acc = float(re.search(r"Average acceptance ratio: ([\d.]+)", out).group(1))

    # the C binary writes its final configuration
    ls = list(tmp_path.glob("last_state_n32_*.csv"))
    assert len(ls) == 1
    vals = [float(v) for v in ls[0].read_text().strip().split(",") if v]
    r_final = np.asarray(vals).reshape(32, 3)

    cfg = SMCConfig.bulk(n=32, temperature=0.4, rho=0.1, dtype="float64")
    ours_e = float(total_energy(jnp.asarray(r_final), jnp.zeros((9, 2)), cfg))

    # The C bulk variant recomputes E from scratch at every gather
    # (SMC_noMPI_noWall.c:205-216): its last data.csv row is the energy a
    # few sweeps before the final configuration — our energy of the final
    # configuration must sit within a few units of it (catches any
    # cutoff/min-image error, which shifts E by tens).
    data = (tmp_path / "data_n32_r0.10_T0.40.csv").read_text().strip()
    last_e = float(data.splitlines()[-1].split(",")[0])
    assert abs(ours_e - last_e) < 10.0, (ours_e, last_e)

    # Our bulk sampler implements the INTENDED A=4e-8 dynamics (tiny
    # Gaussian moves, acceptance ~1). The C binary's acceptance is ~0.79
    # because its bulk vecBoxMuller puts sigma inside the sqrt
    # (SMC_noMPI_noWall.c:713-714), inflating the noise ~60x and making it
    # non-Gaussian — deviation F0b in docs/DEVIATIONS.md.
    assert 0.5 < c_acc < 0.95  # the defective-noise signature
    state, w = init_chain_state(cfg, jax.random.key(0), r0=r_final)
    state, stats = jax.jit(
        lambda s: run_sweeps(s, w, cfg, cfg.proposal_a, 200)
    )(state)
    ours_acc = float(np.mean(np.asarray(stats.accepted))) / cfg.n
    assert ours_acc > 0.99, ours_acc
