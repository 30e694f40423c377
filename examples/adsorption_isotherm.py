"""Grand-canonical adsorption isotherm: coverage vs chemical potential
in ONE compiled program.

The chemical-potential axis rides the chain batch (exactly the trick
temperature ladders use): n_mu values of mu run as one vmapped GCMC
ensemble, each point with its own replica chains. Output is the
isotherm <N>(mu) for the confined slab — the question the reference's
NVT-only workflow cannot ask at all.

    python examples/adsorption_isotherm.py [--platform cpu]
"""

import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

if "--platform" in sys.argv:
    jax.config.update("jax_platforms",
                      sys.argv[sys.argv.index("--platform") + 1])

import numpy as np

from tpu_smc.config import SMCConfig
from tpu_smc.gcmc import box_volume, simulate_gcmc

# thin slab so the walls matter
cfg = dataclasses.replace(
    SMCConfig.for_n(64, temperature=1.3, dtype="float32"),
    box_l=7.0, box_lz=16.0)

mus = np.linspace(-9.5, -6.0, 8)
replicas = 2                     # chains per mu point
mu_c = np.repeat(mus, replicas)  # the mu axis rides the chain batch

state, res = simulate_gcmc(
    cfg, mu_c, cap=128, eqsteps=400, maxsteps=1200,
    key=jax.random.key(0), n_chains=len(mu_c), n0=24)

n_chain = res.n_trace.mean(axis=0).reshape(len(mus), replicas)
v = box_volume(cfg)
print(f"V = {v:g}, T = {cfg.temperature}, capacity 128\n")
print("  mu      <N>      rho        (replica spread)")
for i, mu in enumerate(mus):
    m = n_chain[i].mean()
    s = n_chain[i].std()
    print(f"{mu:6.2f}  {m:7.2f}  {m / v:9.5f}   ±{s:0.2f}")

full = n_chain.mean(axis=1).max()
assert full < 128 * 0.9, "capacity nearly saturated — raise cap"
print("\n(the isotherm rises smoothly toward the wall-condensed branch;"
      "\n one compiled program, {} GCMC chains)".format(len(mu_c)))
