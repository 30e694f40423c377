#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Headline metric (BASELINE.json): aggregate SMC sweeps/sec/chip at N=1024,
through the Pallas whole-sweep kernel over a vmapped chain ensemble.

Baseline: the compiled C reference's own throughput at N=1024 on one CPU
core of this machine, measured live when the reference + gcc are present
(warm-started from our lattice so the C run is physically sane); otherwise
the session-measured fallback derived in BASELINE.md (210.8 s per 1e6
sweeps at N=108, scaled by the O(N^2) move cost to N=1024 -> 52.9/s).
"""

import json
import os
import re
import signal
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

N = 1024
CHAINS = 512
SWEEPS = 50   # dense per-call block: amortizes dispatch/DMA like production
ZSWEEPS = 192  # zsorted per-call block: 12 tail-free chunks of the 16-sweep
               # sort cadence (the N=1024 measured optimum) — the same
               # call length the crossover probes measured; per-call
               # dispatch overhead (~0.25 s) is 4x better amortized than
               # at 48 sweeps (31.3k -> ~44k agg, PERF_NOTES.md). Same
               # compiled kernel either way: the Mosaic static is the
               # 16-sweep chunk, not the call total.
# BASELINE.md: 4744 sweeps/s at N=108 on one core; per-sweep cost is
# O(N^2) => 4744 * (108/1024)^2 = 52.8 sweeps/s at N=1024.
FALLBACK_C_RATE = 52.8


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def measure_c_baseline() -> tuple[float, str]:
    """Run the actual C reference at N=1024 and parse its self-reported
    's per million' metric (SMC.c:200)."""
    try:
        from parity.reference import build_reference_main, reference_available

        if not reference_available():
            return FALLBACK_C_RATE, "fallback (no reference mount)"
        exe = build_reference_main(N)

        import tempfile

        import numpy as np

        from tpu_smc import io as smcio
        from tpu_smc.config import SMCConfig
        from tpu_smc.system import fcc_lattice

        cfg = SMCConfig.for_n(N)
        with tempfile.TemporaryDirectory() as td:
            # Warm-start the C binary from our lattice: its own initializer
            # leaves surplus particles overlapping at N=1024 (SMC.c:427).
            d = smcio.run_dir(cfg, os.path.join(td, "Data"))
            smcio.write_last_state(d, cfg, fcc_lattice(cfg))
            out = subprocess.run(
                [str(exe), "10", "200", "20", "1.10"],
                cwd=td, capture_output=True, text=True, timeout=400,
            ).stdout
        m = re.search(r"\(([\d.]+) per million\)", out)
        if not m:
            return FALLBACK_C_RATE, "fallback (no timing line)"
        rate = 1e6 / float(m.group(1))
        return rate, "measured C reference (this machine, 1 core)"
    except Exception as exc:  # noqa: BLE001
        return FALLBACK_C_RATE, f"fallback ({type(exc).__name__})"


START = time.time()

# The scoreboard JSON is assembled incrementally and emitted exactly once —
# on normal exit OR on SIGTERM/SIGINT (the driver's timeout). A partially
# filled record with the primary metric beats an empty capture (VERDICT r2
# #1: metrics measured but not in the driver's JSON don't count).
RESULT: dict = {}
_EMITTED = False
_EMIT_LOCK = threading.Lock()


def emit_result() -> None:
    """Idempotent AND thread-safe: the watchdog daemon thread and the
    main/signal paths may race near the deadline — two JSON lines would
    break the driver's one-line contract."""
    global _EMITTED
    with _EMIT_LOCK:
        if _EMITTED or not RESULT:
            return
        _EMITTED = True
        print(json.dumps(RESULT), flush=True)


def _on_term(signum, frame):  # noqa: ARG001
    log(f"bench: caught signal {signum}, emitting partial record")
    emit_result()
    sys.exit(0)


signal.signal(signal.SIGTERM, _on_term)
signal.signal(signal.SIGINT, _on_term)


# Single deadline shared by the hang watchdog and the per-phase budget
# guards (ADVICE r3: two hardcoded copies of "540 s" measured from
# different origins drift apart). Set once in _start_watchdog.
WATCHDOG_DEADLINE = START + 540.0


def _start_watchdog(seconds: float = 540.0) -> None:
    """Emit the record even when the backend HANGS: a dead axon tunnel
    blocks inside a C call (PJRT init / first dispatch), where Python
    signal handlers never run — SIGTERM would kill the process with no
    JSON at all. A daemon thread still runs (the hang releases the GIL),
    so it emits whatever the record holds (the outage placeholder, or
    the primary if it landed) just under the driver's ~600 s budget and
    exits hard."""
    global WATCHDOG_DEADLINE
    WATCHDOG_DEADLINE = time.time() + seconds

    def fire():
        time.sleep(max(0.0, WATCHDOG_DEADLINE - time.time()))
        log("bench: watchdog fired (backend hang?) — emitting record")
        emit_result()
        os._exit(3)

    threading.Thread(target=fire, daemon=True).start()


def main() -> int:
    # The record must survive ANY failure past the primary measurement
    # (a secondary-phase kernel fault would otherwise swallow the whole
    # scoreboard line — the exact VERDICT r2 #1 failure mode).
    try:
        return _main()
    finally:
        emit_result()


def _main() -> int:
    cache = os.path.join(REPO, ".jax_cache")
    os.makedirs(cache, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from tpu_smc import ensemble as ens
    from tpu_smc.config import SMCConfig
    from tpu_smc.state import init_ensemble_state

    # Honest outage placeholder, overwritten the moment the primary
    # lands: the axon tunnel can hang indefinitely or die permanently
    # after a kernel fault (ports closed — CLAUDE.md), and a record that
    # SAYS so beats an empty capture. last_known_good cites the most
    # recent driver-visible preflight (docs/PERF_NOTES.md round-3 cont.).
    RESULT.update({
        "metric": f"aggregate SMC sweeps/s/chip @ N={N} ({CHAINS} chains, "
                  "pallas zsorted)",
        "value": None,
        "unit": "sweeps/s",
        "vs_baseline": None,
        "extra": {
            "error": "backend init / first dispatch did not complete",
            "last_known_good_sweeps_per_s": 46701.4,
            "last_known_good_vs_baseline": 934.1,
        },
    })
    _start_watchdog()
    try:
        log(f"bench: devices = {jax.devices()}")
    except RuntimeError as exc:
        RESULT["extra"]["error"] = f"TPU backend unavailable: {exc}"
        log(f"bench: backend init failed: {exc}")
        return 1

    # The FIRST computation a process sends over the axon tunnel pays a
    # large, wildly variable setup cost (measured 130-490 s for a trivial
    # elementwise op with everything cached — it is the backend, not the
    # kernels). Absorb it here on a tiny op so every later warmup number
    # reflects actual compile/load work, and time budgets start after it.
    t0 = time.time()
    np.asarray(jnp.ones((8, 128)) + 1.0)
    first_dispatch = time.time() - t0
    log(f"bench: first-dispatch/tunnel setup {first_dispatch:.1f}s")
    ready = time.time()

    cfg = SMCConfig.for_n(N, dtype="float32")
    state, w = init_ensemble_state(cfg, jax.random.key(0), CHAINS)

    def sync(st):
        np.asarray(st.energy[:1])

    # Warm up with the SAME static args as the timed phase: `a` is a
    # compile-time constant of the kernel, so a different warmup mobility
    # would compile the big kernel twice. Every compile here should hit
    # the committed persistent cache (.jax_cache/) — VERDICT r2 #1: a
    # single missing cache entry cost 388 s of warmup and nulled the
    # secondary metrics, so warmup durations are now part of the record.
    # The primary engine is what `--sampler auto` runs at this size: the
    # zsorted z-block-skip kernel at the measured-optimal cadence
    # (1.6x the dense kernel at N=1024 — docs/PERF_NOTES.md; equilibrium
    # equivalence to dense gated in docs/DEVIATIONS.md A7).
    t0 = time.time()
    state, _ = ens.ensemble_sweeps_zsorted(
        state, w, cfg, cfg.proposal_a, ZSWEEPS, seed=1, c_tile=128
    )
    sync(state)
    warmup_primary = time.time() - t0
    log(f"bench: warmup/compile {warmup_primary:.1f}s")

    rep_dts = []
    for rep in range(3):
        t0 = time.time()
        state, trace = ens.ensemble_sweeps_zsorted(
            state, w, cfg, cfg.proposal_a, ZSWEEPS, seed=2 + rep, c_tile=128
        )
        sync(state)
        dt = time.time() - t0
        rep_dts.append(dt)
        log(f"bench: rep {rep}: {dt:.3f}s")
    best = min(rep_dts)
    agg = CHAINS * ZSWEEPS / best
    agg_median = CHAINS * ZSWEEPS / float(np.median(rep_dts))
    acc = float(np.asarray(trace.accepted).mean()) / cfg.n
    log(f"bench: {agg:,.0f} aggregate sweeps/s at N={N}, acceptance {acc:.3f}"
        f" (median {agg_median:,.0f} over {len(rep_dts)} reps)")

    # Primary is in hand: make the record emittable from this point on.
    RESULT.update({
        "metric": f"aggregate SMC sweeps/s/chip @ N={N} ({CHAINS} chains, "
                  "pallas zsorted)",
        "value": round(agg, 1),
        "unit": "sweeps/s",
        "vs_baseline": round(agg / FALLBACK_C_RATE, 2),
        "extra": {
            "acceptance": round(acc, 4),
            "baseline_sweeps_per_s": FALLBACK_C_RATE,
            "baseline_source": "fallback (pending live C measurement)",
            # VERDICT r3 #5: state the normalization. vs_baseline divides
            # by ONE C core on this host (the reference is also run
            # single-rank here); the BASELINE.json north star is framed
            # against an MPI node — an 8-rank C run would cut the quoted
            # ratio by ~8x (embarrassingly-parallel replicas).
            "baseline_normalization": "single C core, this host; divide "
                                      "by n_ranks for an MPI-node frame",
            "primary_median_sweeps_per_s": round(agg_median, 1),
            "primary_rep_seconds": [round(d, 3) for d in rep_dts],
            "n_devices": len(jax.devices()),
            "first_dispatch_s": round(first_dispatch, 1),
            "warmup_primary_s": round(warmup_primary, 1),
        },
    })

    # Roofline anchor for the PRIMARY engine (VERDICT r4 #3): run one
    # sort-cadence chunk (same compiled kernel — the Mosaic static is
    # the 16-sweep chunk) and reconstruct the zskip processed-block
    # fraction band from the sort-point and end-of-cadence positions
    # (profiling.zskip_processed_fraction_band). The dense ledger's
    # 46 f32 ops per pair element then prices only the blocks the
    # envelope scan actually admits: the band brackets the live-bounds
    # growth within a cadence, and the effective ledger rate over the
    # admitted blocks lands against the v5e VPU 4-ALU issue peak
    # (3.85e12 f32 ops/s). Runs AFTER the primary is in the record so a
    # fault here can never cost the headline number.
    from tpu_smc.ensemble import zsort_cadence
    from tpu_smc.profiling import (zskip_kernel_fraction_band,
                                   zskip_processed_fraction_band)

    r_pre = np.asarray(state.r)
    state, _ = ens.ensemble_sweeps_zsorted(
        state, w, cfg, cfg.proposal_a, zsort_cadence(N), seed=5, c_tile=128)
    sync(state)
    r_post = np.asarray(state.r)
    # utilization anchor: the blocks the compiled kernel ACTUALLY runs
    # (per-tile pooled SMEM bounds + block-range/row-range queries)
    zs_lo, zs_hi = zskip_kernel_fraction_band(
        r_pre, r_post, cfg, c_tile=128, row_block_rows=128)
    # headroom target: the ideal per-chain per-particle envelope
    id_lo, id_hi = zskip_processed_fraction_band(
        r_pre, r_post, cfg, row_block_rows=128)
    zs_ledger = agg * 46.0 * N * N * (0.5 * (zs_lo + zs_hi))
    log(f"bench: zsorted kernel-true block fraction {zs_lo:.3f}.."
        f"{zs_hi:.3f} (ideal per-chain {id_lo:.3f}..{id_hi:.3f})"
        f" -> ledger {zs_ledger:.3g} f32 ops/s "
        f"({zs_ledger / 3.85e12:.3f} of VPU 4-ALU peak)")
    RESULT["extra"].update({
        "zsorted_processed_fraction_band": [round(zs_lo, 4),
                                            round(zs_hi, 4)],
        "zsorted_ideal_fraction_band": [round(id_lo, 4), round(id_hi, 4)],
        "zsorted_ledger_f32_ops_per_s": float(f"{zs_ledger:.3g}"),
        "zsorted_fraction_of_vpu_4alu_peak": round(zs_ledger / 3.85e12, 3),
    })

    # C baseline in a background thread: a CPU subprocess that can run
    # while the TPU extras execute — BENCH_r03's first capture shipped
    # the fallback constant because the baseline ran LAST and the
    # N=16384 extra ate the remaining watchdog budget. The thread fills
    # vs_baseline the moment the C run parses; emit_result() reads
    # whatever has landed.
    def _measure_c_bg():
        # ADVICE r3 (medium): this box has ONE CPU core, so gcc + the
        # compute-bound C run contend with host-side dispatch of the
        # timed TPU extras. os.nice in a thread reprioritizes only this
        # thread on Linux, and forked children (gcc, the C binary)
        # inherit it — the bench main thread keeps CPU priority.
        try:
            os.nice(19)
        except OSError:
            pass
        rate, src = measure_c_baseline()
        # ADVICE r3 (low): compute the triple locally, then apply it
        # atomically under _EMIT_LOCK so a concurrent watchdog/signal
        # emit can never serialize a torn baseline.
        with _EMIT_LOCK:
            if not _EMITTED:
                RESULT["vs_baseline"] = round(RESULT["value"] / rate, 2)
                RESULT["extra"]["baseline_sweeps_per_s"] = round(rate, 2)
                RESULT["extra"]["baseline_source"] = src
                RESULT["extra"]["baseline_ran_concurrently_nice19"] = True
        log(f"bench: C baseline {rate:.1f} sweeps/s ({src})")

    c_thread = threading.Thread(target=_measure_c_bg, daemon=True)
    c_thread.start()

    # Continuity extra: the dense kernel (rounds 1-2's primary engine).
    t0 = time.time()
    state_d, _ = ens.ensemble_sweeps_pallas(
        state, w, cfg, cfg.proposal_a, SWEEPS, seed=6)
    sync(state_d)
    warmup_dense = time.time() - t0
    best_d = float("inf")
    for rep in range(3):
        t0 = time.time()
        state_d, _ = ens.ensemble_sweeps_pallas(
            state_d, w, cfg, cfg.proposal_a, SWEEPS, seed=7 + rep)
        sync(state_d)
        best_d = min(best_d, time.time() - t0)
    agg_dense = CHAINS * SWEEPS / best_d
    log(f"bench: dense-engine extra: {agg_dense:,.0f} aggregate sweeps/s "
        f"(warmup {warmup_dense:.1f}s)")
    RESULT["extra"]["n1024_dense_sweeps_per_s"] = round(agg_dense, 1)
    # VERDICT r3 #5: anchor the C-relative number to the hardware
    # roofline. The dense kernel's op ledger (docs/PERF_NOTES.md "where
    # the remaining time goes") counts ~23 f32 vector ops per pair
    # element, 2 passes (propose + revert/accept bookkeeping) per move,
    # N elements per pass, N moves per sweep => 46*N^2 ledger ops per
    # chain-sweep. The theoretical ceiling is the v5e VPU issuing on
    # all 4 ALUs every cycle (8x128 lanes * 4 ALUs * ~0.94 GHz =
    # 3.85e12 f32 ops/s); the ledger's dependency chains (reciprocal
    # Newton steps, masked selects, sublane reductions) bound the
    # ACHIEVABLE issue rate lower — PERF_NOTES' per-move model puts the
    # kernel within single-digit % of that achievable bound.
    ledger_ops = agg_dense * 46.0 * N * N
    RESULT["extra"]["dense_ledger_f32_ops_per_s"] = float(f"{ledger_ops:.3g}")
    RESULT["extra"]["dense_fraction_of_vpu_4alu_peak"] = round(
        ledger_ops / 3.85e12, 3)

    # Ladder extra: a 4-temperature ladder through the zsorted engine's
    # (A, T) data rows (round-3 cont.: --sampler auto routes ladders at
    # N>=1024 here; measured 1.76x the dense ladder — PERF_NOTES.md).
    lt = jnp.asarray(np.repeat(np.linspace(0.9, 1.5, 4), CHAINS // 4),
                     jnp.float32)
    la = cfg.gamma * lt
    t0 = time.time()
    state_l, _ = ens.ensemble_sweeps_zsorted(
        state, w, cfg, 0.0, ZSWEEPS, seed=16, c_tile=128,
        a_per_chain=la, t_per_chain=lt)
    sync(state_l)
    warmup_ladder = time.time() - t0
    best_l = float("inf")
    for rep in range(2):
        t0 = time.time()
        state_l, _ = ens.ensemble_sweeps_zsorted(
            state_l, w, cfg, 0.0, ZSWEEPS, seed=17 + rep, c_tile=128,
            a_per_chain=la, t_per_chain=lt)
        sync(state_l)
        best_l = min(best_l, time.time() - t0)
    agg_ladder = CHAINS * ZSWEEPS / best_l
    log(f"bench: zsorted-ladder extra: {agg_ladder:,.0f} aggregate "
        f"sweeps/s (warmup {warmup_ladder:.1f}s)")
    RESULT["extra"]["n1024_ladder_zsorted_sweeps_per_s"] = \
        round(agg_ladder, 1)

    # Secondary: the default molecule-surface system (N=108) — measured
    # BEFORE the C subprocess baseline so a slow C run can never starve
    # it (VERDICT r2 #1: BENCH_r02 recorded null here). Warm runs hit
    # the persistent cache (seconds); the guard only skips when earlier
    # phases already consumed most of the driver's budget on cold
    # compiles.
    # Budget guards are measured against the WATCHDOG deadline (the
    # same one the hang watchdog sleeps on — ADVICE r3), not against
    # `ready`: a 160 s first dispatch once let the N=16384 extra start
    # inside a window the watchdog was about to cut (BENCH_r03 first
    # capture). Each guard requires the phase's measured warm cost plus
    # slack.
    def budget_left() -> float:
        return WATCHDOG_DEADLINE - time.time()

    agg108 = None
    warmup_108 = None
    if budget_left() > 60:
        # 200-sweep blocks, best of 3: a 50-sweep window is ~0.1 s at this
        # rate and dispatch noise made the quoted number swing +-40%
        # across rounds (VERDICT r1 #10).
        cfg2 = SMCConfig(dtype="float32")
        state2, w2 = init_ensemble_state(cfg2, jax.random.key(0), 2048)
        t0 = time.time()
        state2, _ = ens.ensemble_sweeps_pallas(
            state2, w2, cfg2, cfg2.proposal_a, 200, seed=11
        )
        sync(state2)
        warmup_108 = time.time() - t0
        log(f"bench: N=108 warmup/compile {warmup_108:.1f}s")
        best108 = float("inf")
        for rep in range(3):
            t0 = time.time()
            state2, _ = ens.ensemble_sweeps_pallas(
                state2, w2, cfg2, cfg2.proposal_a, 200, seed=12 + rep
            )
            sync(state2)
            best108 = min(best108, time.time() - t0)
        agg108 = 2048 * 200 / best108
        log(f"bench: N=108 secondary: {agg108:,.0f} aggregate sweeps/s")
        RESULT["extra"].update({
            "n108_chains2048_sweeps_per_s": round(agg108, 1),
            "n108_vs_c_core": round(agg108 / 4744.0, 1),
            "warmup_n108_s": round(warmup_108, 1),
        })
    else:
        log("bench: skipping N=108 secondary (time budget)")

    # Tertiary: the large-N config (N=4096, zsorted engine — the z-block
    # skipping kernel that beats dense at this size, PERF_NOTES.md).
    # Throughput only (cold lattice start); sps=8 is the measured
    # optimum at this size.
    if budget_left() > 100:
        cfg3 = SMCConfig.for_n(4096, dtype="float32")
        state3, w3 = init_ensemble_state(cfg3, jax.random.key(0), 256)
        t0 = time.time()
        state3, _ = ens.ensemble_sweeps_zsorted(
            state3, w3, cfg3, cfg3.proposal_a, 200, seed=31, c_tile=128,
            sweeps_per_sort=8)
        sync(state3)
        warmup_4096 = time.time() - t0
        log(f"bench: N=4096 warmup/compile {warmup_4096:.1f}s")
        best4096 = float("inf")
        for rep in range(2):
            t0 = time.time()
            state3, _ = ens.ensemble_sweeps_zsorted(
                state3, w3, cfg3, cfg3.proposal_a, 200, seed=32 + rep,
                c_tile=128, sweeps_per_sort=8)
            sync(state3)
            best4096 = min(best4096, time.time() - t0)
        agg4096 = 256 * 200 / best4096
        log(f"bench: N=4096 tertiary (zsorted): {agg4096:,.0f} "
            "aggregate sweeps/s")
        RESULT["extra"].update({
            "n4096_zsorted_sweeps_per_s": round(agg4096, 1),
            # C core extrapolated O(N^2): 4744 * (108/4096)^2 = 3.30/s
            "n4096_vs_c_core": round(agg4096 / 3.30, 1),
            "warmup_n4096_s": round(warmup_4096, 1),
        })
    else:
        log("bench: skipping N=4096 tertiary (time budget)")

    # Quaternary: N=16384 through the HBM-streamed kernel (the VMEM-
    # resident planes stop fitting past N~10k; input_output_aliases keep
    # state in HBM and pair passes stream z-window j-blocks through
    # double-buffered VMEM — docs/PERF_NOTES.md round-3 addendum).
    # VERDICT r3 #4: the box is DENSITY-MATCHED to the reference's
    # N=1024 rho = 5.7e-3 (the fixed 33x240 default box jams at this N —
    # acceptance 0.019, an atypical skip envelope); the row now reports
    # real dynamics, with acceptance in the record. ADVICE r3 (low):
    # after one recorded cold-warmup hang, the extra is skippable via
    # BENCH_SKIP_16K=1 — the hang watchdog above still bounds it.
    if os.environ.get("BENCH_SKIP_16K") == "1":
        log("bench: skipping N=16384 quaternary (BENCH_SKIP_16K=1)")
    elif budget_left() > 110:
        n4 = 16384
        l4 = (n4 / (5.7e-3 * 240.0)) ** 0.5
        cfg4 = SMCConfig(n=n4, box_l=l4, box_lz=240.0, dtype="float32")
        state4, w4 = init_ensemble_state(cfg4, jax.random.key(0), 128)
        t0 = time.time()
        state4, tr4 = ens.ensemble_sweeps_zsorted(
            state4, w4, cfg4, cfg4.proposal_a, 24, seed=41, c_tile=128)
        sync(state4)
        warmup_16k = time.time() - t0
        log(f"bench: N=16384 warmup/compile {warmup_16k:.1f}s")
        best16k = float("inf")
        for rep in range(2):
            t0 = time.time()
            state4, tr4 = ens.ensemble_sweeps_zsorted(
                state4, w4, cfg4, cfg4.proposal_a, 24, seed=42 + rep,
                c_tile=128)
            sync(state4)
            best16k = min(best16k, time.time() - t0)
        agg16k = 128 * 24 / best16k
        acc16k = float(np.asarray(tr4.accepted).mean()) / n4
        log(f"bench: N=16384 quaternary (hbm-streamed, rho-matched): "
            f"{agg16k:,.0f} aggregate sweeps/s, acceptance {acc16k:.3f}")
        RESULT["extra"].update({
            "n16384_streamed_sweeps_per_s": round(agg16k, 1),
            "n16384_acceptance": round(acc16k, 4),
            "n16384_box": f"rho-matched 5.7e-3 (L={l4:.1f}, Lz=240)",
            # C core extrapolated O(N^2): 4744 * (108/16384)^2 = 0.206/s
            # (the C pair loop is dense regardless of density)
            "n16384_vs_c_core": round(agg16k / 0.206, 1),
            "warmup_n16384_s": round(warmup_16k, 1),
        })
        # Streamed-engine roofline anchor (VERDICT r4 #3): same
        # reconstruction as the primary's, over one sort cadence
        # (8 sweeps at this N) — the streamed kernel is bitwise the
        # resident zskip kernel, so the envelope semantics are shared.
        r_pre4 = np.asarray(state4.r)
        state4, _ = ens.ensemble_sweeps_zsorted(
            state4, w4, cfg4, cfg4.proposal_a, zsort_cadence(n4),
            seed=45, c_tile=128)
        sync(state4)
        r_post4 = np.asarray(state4.r)
        st_lo, st_hi = zskip_kernel_fraction_band(
            r_pre4, r_post4, cfg4, c_tile=128, row_block_rows=128)
        sid_lo, sid_hi = zskip_processed_fraction_band(
            r_pre4, r_post4, cfg4, row_block_rows=128)
        st_ledger = agg16k * 46.0 * n4 * n4 * (0.5 * (st_lo + st_hi))
        log(f"bench: streamed kernel-true block fraction "
            f"{st_lo:.3f}..{st_hi:.3f} (ideal per-chain {sid_lo:.3f}.."
            f"{sid_hi:.3f}) -> ledger {st_ledger:.3g} f32 "
            f"ops/s ({st_ledger / 3.85e12:.3f} of VPU 4-ALU peak)")
        RESULT["extra"].update({
            "stream16k_processed_fraction_band": [round(st_lo, 4),
                                                  round(st_hi, 4)],
            "stream16k_ideal_fraction_band": [round(sid_lo, 4),
                                              round(sid_hi, 4)],
            "stream16k_ledger_f32_ops_per_s": float(f"{st_ledger:.3g}"),
            "stream16k_fraction_of_vpu_4alu_peak": round(
                st_ledger / 3.85e12, 3),
        })
    else:
        log("bench: skipping N=16384 quaternary (time budget)")

    # Multi-chip: when this host sees >1 device, also measure the sharded
    # kernel over the full mesh (chains shard with zero cross-chip
    # traffic, so aggregate ~ n_devices x single chip — the BASELINE.json
    # north star is stated for v5e-8). Single-chip runs skip this.
    agg_mesh = None
    n_dev = len(jax.devices())
    if n_dev > 1:
        mesh = ens.make_mesh(n_dev, axis_names=("chains",))
        c_all = CHAINS * n_dev
        state_m, w_m = init_ensemble_state(cfg, jax.random.key(1), c_all)
        state_m = ens.shard_ensemble(state_m, mesh)
        state_m, _ = ens.ensemble_sweeps_pallas_sharded(
            state_m, w_m, cfg, cfg.proposal_a, SWEEPS, seed=21, mesh=mesh)
        sync(state_m)
        best_m = float("inf")
        for rep in range(3):
            t0 = time.time()
            state_m, _ = ens.ensemble_sweeps_pallas_sharded(
                state_m, w_m, cfg, cfg.proposal_a, SWEEPS, seed=22 + rep,
                mesh=mesh)
            sync(state_m)
            best_m = min(best_m, time.time() - t0)
        agg_mesh = c_all * SWEEPS / best_m
        log(f"bench: {agg_mesh:,.0f} aggregate sweeps/s over "
            f"{n_dev} chips ({agg_mesh / agg:.1f}x one chip)")
        RESULT["extra"]["mesh_aggregate_sweeps_per_s"] = round(agg_mesh, 1)

    # The background C baseline normally lands within the first minute;
    # give it whatever budget remains (the fallback constant is already
    # in the record if it never finishes).
    c_thread.join(timeout=max(5.0, budget_left() - 5.0))

    emit_result()
    return 0


if __name__ == "__main__":
    sys.exit(main())
