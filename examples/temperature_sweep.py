"""Map the E(T) / c_v(T) curve of the confined LJ fluid in one program.

Every temperature in the ladder runs as vmapped replica chains inside a
single compiled ensemble (tpu_smc/tsweep.py) — no per-T recompilation,
no per-T process invocations (the reference needs one run per T).

    python examples/temperature_sweep.py [--platform cpu]
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
from tpu_smc.tsweep import simulate_temperature_sweep

cfg = SMCConfig(dtype="float32")
params = RunParams(eqsteps=2000, maxsteps=10000, numdata=1000)
temps = np.linspace(0.7, 1.6, 10)

_, res = simulate_temperature_sweep(
    cfg, params, temps, jax.random.key(0), chains_per_t=32)

print("T        E_mean      +-err     acc      cv")
for i, t in enumerate(res.temps):
    print(f"{t:0.3f}  {res.mean_energy[i]:10.4f}  {res.err_energy[i]:8.4f}"
          f"  {res.acceptance[i]:0.4f}  {res.cv[i]:8.4f}")

# MBAR-reweight the ladder's samples onto a fine grid: continuous
# E(T)/c_v(T)/f(T) between the simulated temperatures (reweight.py).
from tpu_smc.reweight import reweight_from_ladder

rw = reweight_from_ladder(res, cfg, np.linspace(0.7, 1.6, 37))
print("\nMBAR curve (every 4th point):")
print("T        E_mean        cv        ESS       f")
for i in range(0, len(rw.temps), 4):
    print(f"{rw.temps[i]:0.3f}  {rw.mean_energy[i]:10.4f}  "
          f"{rw.cv[i]:8.4f}  {rw.ess[i]:8.1f}  {rw.free_energy[i]:8.4f}")
