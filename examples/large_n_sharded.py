"""Example: large-N system with the Pallas sweep kernel plus
particle-sharded O(N^2) observables over a device mesh.

On a single chip the mesh is trivial; on a pod the same code shards
chains over "chains" and the pair pass over "particles". Run with
8 virtual devices to see the sharding work:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/large_n_sharded.py --platform cpu
"""

import sys

import jax
import numpy as np

sys.path.insert(0, ".")

from tpu_smc import ensemble as ens
from tpu_smc.config import SMCConfig
from tpu_smc.state import init_ensemble_state


def main():
    if "--platform" in sys.argv:
        jax.config.update(
            "jax_platforms", sys.argv[sys.argv.index("--platform") + 1]
        )

    n_dev = len(jax.devices())
    cfg = SMCConfig.for_n(1024, dtype="float32")
    mesh = ens.make_mesh(n_dev, axis_names=("particles",))

    state, w = init_ensemble_state(cfg, jax.random.key(0), n_chains=8)

    # advance the ensemble a little (XLA path — portable everywhere)
    state, mean_e, acc = ens.ensemble_block(state, w, cfg, n_sweeps=3,
                                            a_scale=2.0)
    print(f"devices: {n_dev}  mean E: {float(mean_e):.2f}  "
          f"acceptance: {float(acc):.3f}")

    # particle-sharded total energy: rows split over the mesh,
    # all_gather + psum over the interconnect
    e = ens.particle_sharded_energy(state.r[0], w, cfg, mesh)
    print(f"particle-sharded total energy (chain 0): {float(e):.4f}")


if __name__ == "__main__":
    main()
