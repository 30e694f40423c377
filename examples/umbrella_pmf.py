"""Umbrella sampling: the adsorption free-energy profile F(z) of a
tagged particle, resolved where plain sampling never goes.

K harmonic windows restrain the tagged particle's z at centers spanning
the slab; every window x replica runs in ONE compiled ensemble (the
window axis rides the chain batch), and MBAR stitches the biased
histograms into the unbiased PMF — including the barrier region where
the equilibrium density (and so the -T ln rho route) vanishes.

    python examples/umbrella_pmf.py [--platform cpu]
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
from tpu_smc.umbrella import simulate_umbrella, umbrella_pmf

cfg = SMCConfig(n=32, temperature=1.1, dtype="float32")
params = RunParams(eqsteps=400, maxsteps=2000, numdata=500)
centers = np.linspace(-9.0, 9.0, 10)

_, res = simulate_umbrella(
    cfg, params, centers, jax.random.key(0),
    k_spring=6.0, tag=0, replicas=4)
res = umbrella_pmf(res, n_bins=40, n_boot=8)

print("window  z0       f_k      acceptance")
for k in range(len(res.centers)):
    print(f"{k:4d}  {res.centers[k]:7.2f}  {res.window_f[k]:8.3f}  "
          f"{res.acceptance[k]:0.3f}")

fin = np.isfinite(res.pmf)
print(f"\nF(z) over z in [{res.z_grid[fin].min():0.2f}, "
      f"{res.z_grid[fin].max():0.2f}] "
      f"(barrier {np.nanmax(res.pmf):0.2f} T-units):")
for b in range(0, len(res.z_grid), 4):
    if np.isfinite(res.pmf[b]):
        e = res.err_pmf[b] if res.err_pmf is not None else float("nan")
        print(f"  z = {res.z_grid[b]:7.2f}   F = {res.pmf[b]:8.3f} "
              f"+- {e:0.3f}")
print("\n(CLI equivalent: python -m tpu_smc 400 2000 500 1.1 --n 32 "
      "--umbrella=-9:9:10 --umbrella-spring 6 --umbrella-replicas 4)")
