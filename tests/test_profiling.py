"""profiling.zskip_processed_fraction_band — the roofline diagnostic
reconstructing the zskip engine's per-move processed-block fraction
(kernels/sweep_pallas.py pair_terms_zskip envelope semantics)."""

import numpy as np
import pytest

from tpu_smc.config import SMCConfig
from tpu_smc.profiling import zskip_processed_fraction_band


def _brute_force_span_fraction(r, cfg, row_block):
    """Reference implementation with explicit loops: sort by z, tight
    per-block bounds, contiguous [b_lo, b_hi) envelope per particle."""
    cut = cfg.lj_cutoff
    c, n = r.shape[0], r.shape[1]
    nb = n // row_block
    total = 0
    for ci in range(c):
        z = np.sort(r[ci, :, 2])
        bmin = [z[b * row_block:(b + 1) * row_block].min()
                for b in range(nb)]
        bmax = [z[b * row_block:(b + 1) * row_block].max()
                for b in range(nb)]
        for zi in z:
            b_lo, b_hi = nb, 0
            for b in range(nb):
                if bmin[b] <= zi + cut and bmax[b] >= zi - cut:
                    b_lo = min(b_lo, b)
                    b_hi = max(b_hi, b + 1)
            total += max(0, b_hi - b_lo)
    return total / (c * n * nb)


def test_matches_brute_force_oracle():
    rng = np.random.default_rng(7)
    cfg = SMCConfig(n=64, box_lz=120.0)
    r = rng.uniform(-1, 1, size=(3, 64, 3))
    r[:, :, 2] *= 55.0
    lo, hi = zskip_processed_fraction_band(r, r, cfg, row_block_rows=8)
    want = _brute_force_span_fraction(r, cfg, 8)
    assert lo == pytest.approx(want, abs=1e-12)
    assert hi == pytest.approx(want, abs=1e-12)  # r_post == r_pre


def test_single_slab_processes_everything():
    rng = np.random.default_rng(1)
    cfg = SMCConfig(n=32)
    r = rng.normal(size=(2, 32, 3)).astype(np.float64)
    r[:, :, 2] *= 0.3  # every particle within one cutoff of every other
    lo, hi = zskip_processed_fraction_band(r, r, cfg, row_block_rows=8)
    assert lo == 1.0 and hi == 1.0


def test_dilute_column_skips_and_band_orders():
    rng = np.random.default_rng(3)
    cfg = SMCConfig(n=256, box_lz=200.0)
    r = rng.uniform(-1, 1, size=(4, 256, 3))
    r[:, :, 2] *= 95.0
    # drifted end-of-cadence positions widen the live bounds
    r_post = r + rng.normal(scale=2.0, size=r.shape)
    lo, hi = zskip_processed_fraction_band(r, r_post, cfg,
                                           row_block_rows=8)
    assert 0.0 < lo < 0.5          # a 200-sigma column with cut 3 skips
    assert lo <= hi <= 1.0


def test_row_block_shrinks_to_divisor():
    # n = 24 with a 16-row request -> shrink to 8 (divides 24)
    cfg = SMCConfig(n=24)
    r = np.zeros((1, 24, 3))
    r[0, :, 2] = np.linspace(-40, 40, 24)
    lo, hi = zskip_processed_fraction_band(r, r, cfg, row_block_rows=16)
    assert 0.0 < lo <= 1.0
