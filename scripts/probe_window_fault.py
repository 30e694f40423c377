#!/usr/bin/env python
"""Bisect the window-0 device fault at N=1024 x 512 chains (round 4).

Three probe runs (batch + per-stage isolation) faulted reproducibly in
window 0 of the full driver at N=1024x512 and N=4096x32 — the shapes
where the O(N^2) observables leave the plain-vmap lowering for the
lax.map chain-batched one (observables.vmap_chains_bounded) — while the
128-chain capstone (3h49m, zero faults) and the 512-chain raw-sweep
bench stayed clean. This probe toggles one window ingredient per CASE,
each run in its OWN process (a device fault kills the in-process PJRT
client, so cases cannot share one):

    for c in noobs zp trace press gr cna short full gr_vmap gr_scan; do
      timeout -k 10 900 python scripts/probe_window_fault.py $c
    done

Writes/merges docs/EVIDENCE_WINDOW_FAULT.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

EV_PATH = REPO / "docs" / "EVIDENCE_WINDOW_FAULT.json"

N, CHAINS, GATHERS, LAPSE = 1024, 512, 10, 20

CASES = {
    # everything off: sweeps + gather scaffolding only
    "noobs": dict(),
    # plain-vmap observables (controls — never took lax.map)
    "zp": dict(z_bins=64),
    "trace": dict(collect_sweep_trace=True),
    # lax.map-batched observables, one at a time
    "press": dict(pressure=True),
    "gr": dict(gr_bins=64),
    "cna": dict(clusters=True),
    # the full CLI-equivalent window (expected to reproduce the fault)
    "full": dict(pressure=True, clusters=True, gr_bins=64, z_bins=64,
                 collect_sweep_trace=True),
    # length test: full observables, a single gather
    "short": dict(pressure=True, clusters=True, gr_bins=64, z_bins=64,
                  collect_sweep_trace=True),
    # g(r) forced back onto one whole-ensemble vmap (2.1 GB temporaries
    # at this shape — fits HBM; isolates lax.map itself vs the payload)
    "gr_vmap": dict(gr_bins=64),
    # g(r) through the candidate fix: pad + reshape + lax.scan instead
    # of lax.map (same per-batch payload, different control lowering)
    "gr_scan": dict(gr_bins=64),
}


def main() -> int:
    case = sys.argv[1]
    spec = CASES[case]

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tpu_smc import observables
    from tpu_smc.config import SMCConfig
    from tpu_smc.driver import ObservableOptions
    from tpu_smc.driver_ensemble import simulate_window_batched
    from tpu_smc.state import init_ensemble_state

    if case == "gr_vmap":
        observables.obs_chain_batch = lambda n: 1 << 30
    if case == "gr_scan":
        def scan_batched(fn, r, n, batch=None):
            b = batch if batch is not None else max(
                1, (1 << 28) // max(n * n, 1))
            leaves = jax.tree_util.tree_leaves(r)
            lead = leaves[0].shape[0]
            if lead <= b:
                return jax.vmap(fn)(r)
            nb = -(-lead // b)
            pad = nb * b - lead
            rp = jax.tree_util.tree_map(
                lambda x: jnp.concatenate(
                    [x, jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])])
                if pad else x, r)
            rb = jax.tree_util.tree_map(
                lambda x: x.reshape((nb, b) + x.shape[1:]), rp)
            _, out = jax.lax.scan(
                lambda c, xb: (c, jax.vmap(fn)(xb)), None, rb)
            return jax.tree_util.tree_map(
                lambda y: y.reshape((nb * b,) + y.shape[2:])[:lead], out)
        observables.vmap_chains_bounded = scan_batched

    gathers = 1 if case == "short" else GATHERS
    t_start = time.time()
    cfg = SMCConfig(n=N, box_l=33.0, box_lz=240.0, dtype="float32")
    opts = ObservableOptions(
        pressure=spec.get("pressure", False),
        clusters=spec.get("clusters", False),
        gr_bins=spec.get("gr_bins", 0),
        z_bins=spec.get("z_bins", 0),
        collect_sweep_trace=spec.get("collect_sweep_trace", False),
        sampler="zsorted",
    )
    state, w = init_ensemble_state(cfg, jax.random.key(7), CHAINS)
    np.asarray(state.energy[:1])
    t_init = time.time() - t_start
    print(f"[{case}] init done in {t_init:.1f}s (incl. attach)", flush=True)

    t0 = time.time()
    try:
        state, out = simulate_window_batched(
            state, w, cfg, LAPSE, gathers, jnp.int32(0), opts)
        e = float(np.asarray(state.energy).mean())
        rec = {"ok": True, "window_s": round(time.time() - t0, 1),
               "mean_E": round(e, 3)}
        print(f"[{case}] window: {gathers} gathers x {LAPSE} sweeps x "
              f"{CHAINS} chains in {rec['window_s']}s, mean E {e:.3f}",
              flush=True)
    except Exception as exc:  # noqa: BLE001 — record the fault and exit
        rec = {"ok": False, "window_s": round(time.time() - t0, 1),
               "error": f"{type(exc).__name__}: {exc}"[:300]}
        print(f"[{case}] FAILED after {rec['window_s']}s: {rec['error']}",
              flush=True)

    rec.update(init_s=round(t_init, 1), gathers=gathers)
    try:
        ev = json.loads(EV_PATH.read_text())
    except Exception:  # noqa: BLE001
        ev = {}
    ev[case] = rec
    EV_PATH.write_text(json.dumps(ev, indent=2) + "\n")
    return 0 if rec["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
