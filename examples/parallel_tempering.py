"""Parallel tempering: the temperature ladder with on-device replica
exchange (tpu_smc/pt.py).

Each of the `chains_per_t` independent ladders attempts configuration
swaps between adjacent temperatures every `exchange_interval` sweeps —
low-T chains escape local minima through the high-T end, something the
reference's zero-communication replica model cannot express. On TPU the
sweeps run through the Pallas whole-sweep kernel with per-chain (A, T)
rows (sampler="pallas"); exchange itself is a handful of vector ops.

    python examples/parallel_tempering.py [--platform cpu]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

if "--platform" in sys.argv:
    jax.config.update("jax_platforms",
                      sys.argv[sys.argv.index("--platform") + 1])
import numpy as np

from tpu_smc.config import RunParams, SMCConfig
from tpu_smc.pt import simulate_parallel_tempering

cfg = SMCConfig(dtype="float32")
params = RunParams(eqsteps=2000, maxsteps=10000, numdata=1000)
temps = np.linspace(0.7, 1.6, 8)
sampler = "pallas" if jax.default_backend() == "tpu" else "xla"

_, res = simulate_parallel_tempering(
    cfg, params, temps, jax.random.key(0), chains_per_t=16,
    exchange_interval=10, sampler=sampler)

ts = res.tsweep
print("T        E_mean      +-err     acc      cv")
for i, t in enumerate(ts.temps):
    print(f"{t:0.3f}  {ts.mean_energy[i]:10.4f}  {ts.err_energy[i]:8.4f}"
          f"  {ts.acceptance[i]:0.4f}  {ts.cv[i]:8.4f}")
print("\npair swap acceptance (healthy ladders sit around 0.2-0.9):")
for i in range(len(res.pair_t_lo)):
    print(f"  {res.pair_t_lo[i]:0.3f} <-> {res.pair_t_hi[i]:0.3f}: "
          f"{res.swap_acceptance[i]:0.3f}")
