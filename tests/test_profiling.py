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


def _brute_force_kernel_fraction(r, cfg, row_block, c_tile):
    """Oracle for the KERNEL-TRUE semantics (sweep_pallas.py): per-tile
    POOLED scalar block bounds; pass 1 queries the home block's range,
    pass 2 the row's min..max over the tile; per-move fraction is the
    mean of the two contiguous envelope spans."""
    cut = cfg.lj_cutoff
    c, n = r.shape[0], r.shape[1]
    nb = n // row_block
    z = np.sort(r[:, :, 2], axis=1)
    total, rows_n = 0.0, 0
    for s in range(0, c, c_tile):
        e = min(c, s + c_tile)
        blk = z[s:e].reshape(e - s, nb, row_block)
        bmin = blk.min(axis=(0, 2))
        bmax = blk.max(axis=(0, 2))

        def span(lo_t, hi_t):
            lo_b, hi_b = nb, 0
            for b in range(nb):
                if bmin[b] <= hi_t and bmax[b] >= lo_t:
                    lo_b = min(lo_b, b)
                    hi_b = max(hi_b, b + 1)
            return max(0, hi_b - lo_b)

        for i in range(n):
            ib = i // row_block
            s1 = span(bmin[ib] - cut, bmax[ib] + cut)
            rlo = z[s:e, i].min()
            rhi = z[s:e, i].max()
            s2 = span(rlo - cut, rhi + cut)
            # every chain in the tile pays the same spans
            total += (e - s) * 0.5 * (s1 + s2) / nb
        rows_n += (e - s) * n
    return total / rows_n


def test_kernel_fraction_matches_oracle_single_tile():
    from tpu_smc.profiling import zskip_kernel_fraction_band

    rng = np.random.default_rng(11)
    cfg = SMCConfig(n=64, box_lz=120.0)
    r = rng.uniform(-1, 1, size=(3, 64, 3))
    r[:, :, 2] *= 55.0
    lo, hi = zskip_kernel_fraction_band(r, r, cfg, c_tile=4,
                                        row_block_rows=8)
    want = _brute_force_kernel_fraction(r, cfg, 8, 4)
    assert lo == pytest.approx(want, abs=1e-12)
    assert hi == pytest.approx(want, abs=1e-12)


def test_kernel_fraction_dominates_ideal_band():
    # pooling over chains + block-range queries only WIDEN the envelope
    from tpu_smc.profiling import zskip_kernel_fraction_band

    rng = np.random.default_rng(5)
    cfg = SMCConfig(n=256, box_lz=200.0)
    r = rng.uniform(-1, 1, size=(8, 256, 3))
    r[:, :, 2] *= 95.0
    r_post = r + rng.normal(scale=1.5, size=r.shape)
    id_lo, id_hi = zskip_processed_fraction_band(r, r_post, cfg,
                                                 row_block_rows=8)
    kn_lo, kn_hi = zskip_kernel_fraction_band(r, r_post, cfg, c_tile=8,
                                              row_block_rows=8)
    assert kn_lo >= id_lo - 1e-12
    assert kn_hi >= id_hi - 1e-12
    assert kn_lo <= kn_hi <= 1.0
    # splitting chains into more tiles can only TIGHTEN pooled bounds
    kn2_lo, _ = zskip_kernel_fraction_band(r, r_post, cfg, c_tile=2,
                                           row_block_rows=8)
    assert kn2_lo <= kn_lo + 1e-12


def test_inplane_headroom_ordering():
    from tpu_smc.profiling import zskip_inplane_headroom

    rng = np.random.default_rng(9)
    cfg = SMCConfig(n=512, box_lz=200.0)
    r = rng.uniform(-1, 1, size=(4, 512, 3))
    r[:, :, 0] *= 16.0
    r[:, :, 1] *= 16.0
    r[:, :, 2] *= 95.0
    h = zskip_inplane_headroom(r, cfg, c_tile=4, row_block_rows=8,
                               sample_i=64, seed=2)
    assert h["sphere_rows"] <= h["box_rows"] + 1e-9
    assert h["box_rows"] <= h["z_rows"] + 1e-9
    assert h["z_rows"] <= h["admitted_rows"] + 1e-9
    assert 0.0 < h["box_over_admitted"] <= 1.0


def test_inplane_headroom_tight_cluster_is_all_ones():
    from tpu_smc.profiling import zskip_inplane_headroom

    rng = np.random.default_rng(4)
    cfg = SMCConfig(n=32)
    r = rng.normal(size=(2, 32, 3)) * 0.3
    h = zskip_inplane_headroom(r, cfg, c_tile=2, row_block_rows=8,
                               sample_i=32)
    assert h["admitted_rows"] == 32.0
    assert h["z_rows"] == 32.0
    assert h["box_over_admitted"] == 1.0
