"""tpu_smc — a TPU-native Smart Monte Carlo engine in JAX.

From-scratch reimplementation of the capabilities of
Kryohi/MonteCarlo-Surfacer (a C Smart-MC simulator of a Lennard-Jones
fluid confined between structured surfaces), redesigned for TPU:
jitted lax.scan sweeps, vmapped chain ensembles, shard_map meshes,
Pallas pair kernels, threefry RNG. See SURVEY.md for the layer map.
"""

from .config import SMCConfig, RunParams, default_box
from .state import ChainState, init_chain_state, init_ensemble_state

__version__ = "0.1.0"
