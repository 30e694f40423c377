"""Quenched wall-disorder averaging in one compiled program.

The reference's random wall is frozen at srand(42) for every run and
every MPI rank (SMC.c:477): one disorder realization, forever. Here K
wall realizations become per-chain wall tables that ride the chain
batch — the disorder axis is just another vmap/data dimension, so one
program samples every realization at once, reports per-realization
means, and quenched-averages them with an honest between-realization
error bar.

    python examples/wall_disorder.py [--platform cpu]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

if "--platform" in sys.argv:
    jax.config.update("jax_platforms",
                      sys.argv[sys.argv.index("--platform") + 1])

import jax.numpy as jnp
import numpy as np

from tpu_smc.config import RunParams, SMCConfig
from tpu_smc.driver import ObservableOptions
from tpu_smc.driver_ensemble import simulate_ensemble
from tpu_smc.state import batch_chain_state, init_chain_state
from tpu_smc.system import build_wall_ensemble

K = 4            # disorder realizations (wall seeds 42..45)
PER_K = 8        # chains per realization
cfg = SMCConfig(dtype="float32")
params = RunParams(eqsteps=1000, maxsteps=4000, numdata=400)

w_k, x0, ym = build_wall_ensemble(cfg, K)          # [K, M*M, 2]
print("well-depth draws per realization (ym ~ N(3.0, 0.5)):")
for k in range(K):
    print(f"  k={k} (seed {42 + k}): mean {ym[k].mean():0.3f}, "
          f"min {ym[k].min():0.3f}, max {ym[k].max():0.3f}")

# per-chain tables: chain c simulates realization c // PER_K
chains = K * PER_K
seed_state, _ = init_chain_state(cfg, jax.random.key(0))
state = batch_chain_state(seed_state, chains)
w = jnp.asarray(np.repeat(w_k, PER_K, axis=0), cfg.jnp_dtype)

# realizations start at different wall energies: recompute E0 per chain
from tpu_smc.state import per_chain_wall_energy

state = state._replace(
    energy=per_chain_wall_energy(state.r, w, cfg).astype(
        state.energy.dtype))

state, agg = simulate_ensemble(
    cfg, params, state, w,
    opts=ObservableOptions(pressure=False, clusters=False))

e = np.asarray([c.mean_energy for c in agg.chains]).reshape(K, PER_K)
e_k = e.mean(axis=1)
print("\nper-realization mean energy:")
for k in range(K):
    print(f"  k={k}: E = {e_k[k]:10.4f}  "
          f"(chain spread {e[k].std():0.4f})")
se = e_k.std(ddof=1) / np.sqrt(K)
print(f"\nquenched disorder average: E = {e_k.mean():0.4f} +- {se:0.4f} "
      "(between-realization SE)")
print("\n(The CLI equivalent: python -m tpu_smc 1000 4000 400 1.1 "
      f"--chains {chains} --wall-realizations {K})")
