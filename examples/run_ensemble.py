"""Example: a 256-chain molecule-surface ensemble with on-device
observables, through the Python API (the CLI equivalent is
`python -m tpu_smc 2000 20000 1000 1.1 --chains 256 --gr-bins 128`).

Run: python examples/run_ensemble.py [--platform cpu]
"""

import sys

import jax
import numpy as np

sys.path.insert(0, ".")

from tpu_smc.config import RunParams, SMCConfig
from tpu_smc.driver import ObservableOptions
from tpu_smc.driver_ensemble import simulate_ensemble
from tpu_smc.state import init_ensemble_state


def main():
    if "--platform" in sys.argv:
        jax.config.update(
            "jax_platforms", sys.argv[sys.argv.index("--platform") + 1]
        )

    cfg = SMCConfig(dtype="float32")          # N=108 molecule-surface system
    params = RunParams(eqsteps=500, maxsteps=2000, numdata=100)
    n_chains = 256

    state, w = init_ensemble_state(cfg, jax.random.key(0), n_chains)
    sampler = "pallas" if jax.default_backend() == "tpu" else "xla"
    state, res = simulate_ensemble(
        cfg, params, state, w,
        opts=ObservableOptions(gr_bins=64, z_bins=64, sampler=sampler),
    )

    print(f"chains: {n_chains}  sampler: {sampler}")
    print(f"mean energy: {res.mean_energy:.3f} ± {res.std_energy:.3f} "
          "(chain spread)")
    print(f"acceptance: {res.acceptance_ratio:.4f}")
    print(f"aggregate throughput: {res.sweeps_per_second:,.0f} sweeps/s")
    zp = res.zprofile
    peak = np.argmax(zp)
    print(f"z-profile peak bin: {peak}/64 (density {zp[peak]:.4f})")


if __name__ == "__main__":
    main()
