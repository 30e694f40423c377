"""The full phase-curve workflow in one script: tune, temper, reweight.

1. Auto-tune a per-level proposal mobility to a target acceptance
   (tuning.tune_mobility_ladder) — the reference hard-codes A = gamma*T.
2. Run the temperature ladder WITH replica exchange (parallel
   tempering) as one compiled ensemble (pt.py) using the tuned ladder.
3. MBAR-reweight the ladder's samples onto a fine grid (reweight.py):
   continuous E(T), c_v(T) and relative free energy, with the effective
   sample size per point.

Every stage runs on-device; the reference would need one process per
temperature and could do neither the exchanges nor the reweighting.

    python examples/phase_curve.py [--platform cpu]
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
from tpu_smc.reweight import reweight_from_ladder
from tpu_smc.tuning import tune_mobility_ladder

cfg = SMCConfig(dtype="float32")
temps = np.linspace(0.8, 1.5, 6)
key = jax.random.key(0)

print("Tuning per-level mobility to 70% acceptance...")
lt = tune_mobility_ladder(cfg, temps, jax.random.fold_in(key, 1),
                          chains_per_t=32, target=0.7)
for i, t in enumerate(lt.temps):
    print(f"  T {t:0.3f}: A = {lt.a_per_t[i]:8.4f} "
          f"(acceptance {lt.acceptance[i]:0.3f})")

print("\nParallel tempering on the tuned ladder...")
params = RunParams(eqsteps=2000, maxsteps=8000, numdata=800)
_, res = simulate_parallel_tempering(
    cfg, params, temps, key, chains_per_t=32, exchange_interval=10,
    a_per_t=lt.a_per_t)
for i in range(len(temps) - 1):
    print(f"  swap T {res.pair_t_lo[i]:0.3f} <-> {res.pair_t_hi[i]:0.3f}: "
          f"{res.swap_acceptance[i]:0.3f}")

print("\nMBAR reweighting onto a fine grid (16 bootstrap draws)...")
rw = reweight_from_ladder(res, cfg, np.linspace(0.8, 1.5, 29), n_boot=16)
print("T        E_mean     +-err       cv          P           ESS       f")
for i in range(0, len(rw.temps), 4):
    print(f"{rw.temps[i]:0.3f}  {rw.mean_energy[i]:10.4f}  "
          f"{rw.err_energy[i]:8.4f}  {rw.cv[i]:8.4f}  "
          f"{rw.pressure[i]:10.6f}  {rw.ess[i]:8.1f}  "
          f"{rw.free_energy[i]:8.4f}")
