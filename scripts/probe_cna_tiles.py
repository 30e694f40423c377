#!/usr/bin/env python
"""Hardware probe + rate calibration for the gather-free hoisted CNA
executor (round 4, after the window-fault postmortem).

The fused per-pair CNA (adj[lb] row gathers) measured ~5e12 effective
MACs/s on the v5e and breached the ~72 s runtime watchdog at
N=1024 x 512 chains (docs/EVIDENCE_WINDOW_FAULT.json). The replacement
(observables.cluster_histograms_tile_range) is all bf16 MXU matmuls in
bounded calls (driver.cna_hoisted_histograms). This probe:

  1. times one full hoisted pass at N=1024 x 512 chains (the exact
     faulting shape) and at N=4096 x 8 chains (the n4096 stage's
     per-chain spike), recording achieved MACs/s per call;
  2. cross-checks the histograms against the in-process CPU result for
     a small slice (integer-exact contract).

Run: timeout 1500 python scripts/probe_cna_tiles.py
Writes docs/EVIDENCE_CNA_TILES.json incrementally (fail-soft).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

EV_PATH = REPO / "docs" / "EVIDENCE_CNA_TILES.json"
EV: dict = {}


def flush() -> None:
    EV_PATH.write_text(json.dumps(EV, indent=2) + "\n")


def main() -> int:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tpu_smc import driver as drv
    from tpu_smc.config import SMCConfig

    t0 = time.time()
    d = jax.devices()
    print(f"attach: {d} in {time.time() - t0:.1f}s", flush=True)
    EV["attach_s"] = round(time.time() - t0, 1)
    flush()

    for name, n, chains, lx, lz in (
        ("n1024_c512", 1024, 512, 33.0, 240.0),
        ("n4096_c8", 4096, 8, 33.0, 240.0),
    ):
        cfg = SMCConfig(n=n, box_l=lx, box_lz=lz, dtype="float32")
        key = jax.random.key(5)
        r = jax.random.uniform(
            key, (chains, n, 3), jnp.float32, -0.5, 0.5
        ) * jnp.asarray([lx, lx, lz], jnp.float32)
        np.asarray(r[0, 0])  # sync upload

        macs_chain = drv._cna_pass_macs(cfg)
        t1 = time.time()
        try:
            l1, l2, l3 = drv.cna_hoisted_histograms(r, cfg)
            wall = time.time() - t1
            rate = chains * macs_chain / wall
            rec = {
                "ok": True,
                "chains": chains,
                "pass_s": round(wall, 2),
                "macs": chains * macs_chain,
                "macs_per_s": f"{rate:.3e}",
                "l1_mean": float(np.mean(l1)),
            }
            print(f"[{name}] pass {wall:.2f}s -> {rate:.2e} MACs/s, "
                  f"mean l1 {rec['l1_mean']:.1f}", flush=True)
        except Exception as exc:  # noqa: BLE001 — record and stop
            rec = {"ok": False, "wall_s": round(time.time() - t1, 1),
                   "error": f"{type(exc).__name__}: {exc}"[:300]}
            print(f"[{name}] FAILED after {rec['wall_s']}s: "
                  f"{rec['error']}", flush=True)
            EV[name] = rec
            flush()
            return 1
        EV[name] = rec
        flush()

    # correctness cross-check on a small slice (device vs known-good
    # in-scan formulation evaluated on the same positions)
    from tpu_smc.observables import cluster_analysis, cluster_histograms

    cfg = SMCConfig(n=256, box_l=9.0, box_lz=18.0, dtype="float32")
    r = jax.random.uniform(
        jax.random.key(3), (4, 256, 3), jnp.float32, -0.5, 0.5
    ) * jnp.asarray([9.0, 9.0, 18.0], jnp.float32)
    ref = jax.jit(jax.vmap(
        lambda ri: cluster_histograms(cluster_analysis(ri, cfg))))(r)
    got = drv.cna_hoisted_histograms(r, cfg)
    same = (np.array_equal(np.asarray(ref[0]), got[0])
            and np.array_equal(np.asarray(ref[1]), got[1])
            and np.array_equal(np.asarray(ref[2]), got[2]))
    EV["crosscheck_n256"] = {"ok": bool(same),
                             "l1": [int(x) for x in got[0]]}
    print(f"crosscheck: {'EXACT' if same else 'MISMATCH'}", flush=True)
    flush()
    return 0 if same else 1


if __name__ == "__main__":
    sys.exit(main())
