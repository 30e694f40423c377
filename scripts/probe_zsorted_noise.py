#!/usr/bin/env python
"""Diagnose the zsorted strict-parity offset (round 4).

The first hardware run of `validate_parity.py --sampler zsorted` FAILED
strict 1e-3 with a reproducible +0.45 mean-energy offset vs C
(5.1 sigma at 256 chains x 300k sweeps) — suspiciously equal to the
documented offset of the CORRECT-noise sampler vs the C reference's
F0-dependent-noise ensemble (~+0.5, validate_parity.py --correct-noise
docstring). Hypothesis: the z-sort reorders particle rows each cadence,
so the bug-compatible reference-noise plane's pair correlations land on
different particles move-to-move and the chain samples (approximately)
the CORRECT ensemble instead of C's biased one.

This probe resolves it C-free on the TPU: the same warm-started
ensemble is run through {dense, zsorted} x {reference_noise, correct}
at strict-resolving length (512 chains x 600k sweeps: combined
engine-pair error ~0.016 < the 1e-3 strict band's 0.019). Readout:
  dense/ref  != dense/correct  (the F0 bias itself, ~0.5)
  zsorted/iid ~= dense/iid STRICT -> the production engine+noise pair
      samples the dense ensemble (the transitive leg of the contract:
      C ==strict== dense/ref [round 2], dense/iid ==strict== zsorted/iid)
  zsorted/ref vs the rest -> where sorting moves the bug-compat mode
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tpu_smc.config import RunParams, SMCConfig
    from tpu_smc.driver import ObservableOptions, therm_chunk
    from tpu_smc.driver_ensemble import simulate_ensemble
    from tpu_smc.ensemble import ensemble_sweeps
    from tpu_smc.state import init_ensemble_state

    chains = 512
    sweeps = 600_000
    t = 1.1

    # shared equilibrated start (correct-noise xla decorrelation like
    # validate_parity.py — the variants then branch from one basin)
    cfg0 = SMCConfig(dtype="float32", temperature=t)
    state0, w = init_ensemble_state(cfg0, jax.random.key(11), chains)
    decor = jax.jit(
        lambda s, k: ensemble_sweeps(s, w, cfg0, cfg0.proposal_a, k)[0],
        static_argnums=1)
    left = 20_000
    while left > 0:
        k = min(left, therm_chunk(cfg0))
        state0 = decor(state0, k)
        np.asarray(state0.energy[:1])
        left -= k

    params = RunParams(0, sweeps, 3_000)
    out = {}
    for sampler in ("pallas", "zsorted"):
        for ref_noise in (True, False):
            cfg = SMCConfig(dtype="float32", temperature=t,
                            reference_noise=ref_noise)
            st = state0._replace(
                accepted=jax.numpy.zeros_like(state0.accepted))
            t0 = time.time()
            st, agg = simulate_ensemble(
                cfg, params, st, w,
                opts=ObservableOptions(pressure=False, clusters=False,
                                       sampler=sampler))
            key = f"{sampler}/{'ref' if ref_noise else 'iid'}"
            out[key] = {
                "mean_energy": agg.mean_energy,
                "err": agg.std_energy / (chains - 1) ** 0.5,
                "acceptance": agg.acceptance_ratio,
                "wall_s": round(time.time() - t0, 1),
            }
            print(f"{key}: E={agg.mean_energy:.4f} "
                  f"+- {out[key]['err']:.4f} "
                  f"acc={agg.acceptance_ratio:.5f} "
                  f"({out[key]['wall_s']}s)", flush=True)

    def sig(a, b):
        da = out[a]["mean_energy"] - out[b]["mean_energy"]
        e = (out[a]["err"] ** 2 + out[b]["err"] ** 2) ** 0.5
        return round(da, 4), round(da / e, 2)

    out["deltas_sigma"] = {
        "dense ref-iid (F0 bias)": sig("pallas/ref", "pallas/iid"),
        "zsorted ref-iid": sig("zsorted/ref", "zsorted/iid"),
        "zsorted-dense (iid)": sig("zsorted/iid", "pallas/iid"),
        "zsorted-dense (ref)": sig("zsorted/ref", "pallas/ref"),
        "zsorted/ref vs dense/iid": sig("zsorted/ref", "pallas/iid"),
    }
    out["config"] = {"chains": chains, "sweeps": sweeps, "t": t,
                     "n": cfg0.n}
    print(json.dumps(out, indent=2))
    (REPO / "docs" / "EVIDENCE_ZSORTED_NOISE.json").write_text(
        json.dumps(out, indent=2) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
