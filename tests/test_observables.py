"""Observable-layer tests: C parity (via oracles + the compiled probe) and
internal consistency of the corrected implementations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_smc.config import SMCConfig
from tpu_smc import observables as obs
from tests.reference_impls import cluster_analysis_c, density_mobility_c

CFG = SMCConfig(dtype="float64")


@pytest.mark.c_reference
class TestClusterAnalysis:
    @pytest.mark.parametrize("conf", ["R1", "R3"])
    def test_c_oracle_matches_probe(self, goldens, conf):
        """Validate our reading of the C algorithm (aliasing included)."""
        r = goldens[conf]
        lca = cluster_analysis_c(r, CFG.n, CFG.box_l, CFG.lca_cutoff)
        np.testing.assert_array_equal(
            lca.reshape(-1), goldens[f"clusterAnalysis_{conf}"].astype(np.int64)
        )

    @pytest.mark.parametrize("conf", ["R1", "R3"])
    def test_num1_matches_c(self, goldens, conf):
        """num1 (bond mask) is collision-OR in C; on configurations whose
        aliased slots agree, our per-pair num1 restricted to bonded pairs
        must imply the C num1 at the aliased index."""
        r = jnp.asarray(goldens[conf].reshape(-1, 3))
        counts = obs.cluster_analysis(r, CFG)
        c_lca = goldens[f"clusterAnalysis_{conf}"].reshape(-1, 3)
        lrow, icol = obs.pair_indices(CFG.n)
        raw = (lrow.astype(np.int64) ** 2 - 3 * lrow + 2) // 2 + icol
        ours = np.asarray(counts.num1)
        # every bonded pair must have its aliased C slot set
        assert np.all(c_lca[raw[ours], 0] == 1)

    def test_corrected_cna_on_octahedra(self, goldens):
        """On the R3 cluster config the corrected CNA has closed-form
        values: at scale 0.8 even opposite vertices bond (1.6 < 1.7), so
        each 6-particle octahedron is a complete K6 graph: all 15 pairs
        bonded, 4 common neighbours per pair, and C(4,2) = 6 bonds among
        them."""
        r = jnp.asarray(goldens["R3"].reshape(-1, 3))
        counts = obs.cluster_analysis(r, CFG)
        bonded = np.asarray(counts.num1)
        assert bonded.sum() == 18 * 15  # 18 octahedra, C(6,2) pairs each
        assert np.all(np.asarray(counts.num2)[bonded] == 4)
        assert np.all(np.asarray(counts.num3)[bonded] == 6)


@pytest.mark.c_reference
class TestDensityMobility:
    def test_matches_c_sequence(self, goldens):
        """Two gathers (R0 then R1) against the probe's D/Mu/Rbin."""
        nvox = CFG.ncx * CFG.ncx * CFG.ncz
        d = np.zeros(nvox, np.uint64)
        rbin = np.zeros(CFG.n, np.int64)
        mu = np.zeros(nvox, np.uint64)
        for conf in ("R0", "R1"):
            d, rbin, mu = density_mobility_c(
                goldens[conf], CFG.box_l, CFG.box_lz, CFG.ncx, CFG.ncz, d, rbin, mu
            )
        np.testing.assert_array_equal(d, goldens["density_R0R1"].astype(np.uint64))
        np.testing.assert_array_equal(mu, goldens["mobility_R0R1"].astype(np.uint64))
        np.testing.assert_array_equal(rbin, goldens["rbin_R0R1"].astype(np.int64))

    def test_device_version_matches_oracle_in_range(self, goldens):
        """The jnp scatter version vs the C oracle on in-box positions."""
        rng = np.random.default_rng(0)
        r1 = rng.uniform(-0.49, 0.49, (CFG.n, 3)) * np.array(
            [CFG.box_l, CFG.box_l, CFG.box_lz]
        )
        r2 = r1 + rng.normal(0, 0.8, r1.shape)
        r2 = np.clip(
            r2,
            -0.499 * np.array([CFG.box_l, CFG.box_l, CFG.box_lz]),
            0.499 * np.array([CFG.box_l, CFG.box_l, CFG.box_lz]),
        )
        nvox = CFG.n_voxels
        d = np.zeros(nvox, np.uint64)
        rbin = np.zeros(CFG.n, np.int64)
        mu = np.zeros(nvox, np.uint64)
        for rr in (r1, r2):
            d, rbin, mu = density_mobility_c(
                rr.reshape(-1), CFG.box_l, CFG.box_lz, CFG.ncx, CFG.ncz, d, rbin, mu
            )

        jd = jnp.zeros((nvox,), jnp.uint32)
        jb = jnp.zeros((CFG.n,), jnp.int32)
        jm = jnp.zeros((nvox,), jnp.uint32)
        for rr in (r1, r2):
            jb, jd, jm = obs.density_mobility_update(
                jnp.asarray(rr), jb, jd, jm, CFG
            )
        np.testing.assert_array_equal(np.asarray(jd, np.uint64), d)
        np.testing.assert_array_equal(np.asarray(jm, np.uint64), mu)
        np.testing.assert_array_equal(np.asarray(jb, np.int64), rbin)


@pytest.mark.c_reference
class TestACF:
    def test_fft_acf_parity(self, goldens):
        acf = obs.autocorrelation(
            jnp.asarray(goldens["acf_trace"]), 400, mode="reference"
        )
        np.testing.assert_allclose(np.asarray(acf), goldens["fft_acf"], atol=5e-7)

    def test_simple_acf_parity(self, goldens):
        acf = obs.autocorrelation_direct(jnp.asarray(goldens["acf_trace"]), 400)
        np.testing.assert_allclose(np.asarray(acf), goldens["simple_acf"], rtol=1e-9)

    def test_circular_mode_decay(self, goldens):
        """Correct WK mode: AR(0.95) trace has tau ~ (1+rho)/(1-rho)/2."""
        acf = obs.autocorrelation(
            jnp.asarray(goldens["acf_trace"]), 200, mode="circular"
        )
        acf = np.asarray(acf)
        assert acf[0] == pytest.approx(1.0)
        assert 0.9 < acf[1] < 1.0
        assert abs(acf[100]) < 0.5


class TestNewObservables:
    def test_gr_ideal_gas(self):
        """g(r) ~ 1 for uniform random positions (bulk, full PBC)."""
        cfg = SMCConfig(
            dtype="float64", n=2048, use_walls=False, pbc_z=True,
            box_l=20.0, box_lz=20.0, lj_cutoff=10.0,
        )
        rng = np.random.default_rng(1)
        r = jnp.asarray(rng.uniform(-10.0, 10.0, (2048, 3)))
        centers, g = obs.radial_distribution(r, cfg, nbins=32, rmax=8.0)
        g = np.asarray(g)[4:]  # skip tiny-shell noise
        assert np.all(np.abs(g - 1.0) < 0.25)

    def test_z_profile_integrates_to_n(self):
        cfg = SMCConfig(dtype="float64")
        rng = np.random.default_rng(2)
        r = jnp.asarray(
            rng.uniform(-0.5, 0.5, (cfg.n, 3))
            * np.array([cfg.box_l, cfg.box_l, cfg.box_lz])
        )
        centers, prof = obs.z_density_profile(r, cfg, nbins=64)
        integral = float(np.sum(np.asarray(prof)) * cfg.box_l ** 2 * cfg.box_lz / 64)
        assert integral == pytest.approx(cfg.n, rel=1e-6)

    def test_voxel_density_conserves_particles(self):
        cfg = SMCConfig(dtype="float64")
        rng = np.random.default_rng(3)
        r = jnp.asarray(
            rng.uniform(-0.49, 0.49, (cfg.n, 3))
            * np.array([cfg.box_l, cfg.box_l, cfg.box_lz])
        )
        rbin, d, mu = obs.density_mobility_update(
            r,
            jnp.zeros((cfg.n,), jnp.int32),
            jnp.zeros((cfg.n_voxels,), jnp.uint32),
            jnp.zeros((cfg.n_voxels,), jnp.uint32),
            cfg,
        )
        assert int(np.asarray(d).sum()) == cfg.n


def test_z_range_edges_partition():
    """Non-uniform z edges (createZRange intent, SMC.c:1153-1169): a
    complete monotone partition of [0, Lz] with thin layer_depth walls
    layers and 3 equal central layers."""
    from tpu_smc.observables import z_range_edges

    cfg = SMCConfig(ncz=33, layer_depth=5.0, box_lz=200.0)
    e = z_range_edges(cfg)
    assert e.shape == (34,)
    assert e[0] == 0.0 and e[-1] == 200.0
    assert np.all(np.diff(e) > 0)
    widths = np.diff(e)
    np.testing.assert_allclose(widths[:15], 5.0)     # lower wall layers
    np.testing.assert_allclose(widths[-15:], 5.0)    # upper wall layers
    np.testing.assert_allclose(widths[15:18], 50.0 / 3)  # 3 central layers
    # even Ncz also partitions completely
    cfg2 = SMCConfig(ncz=32, layer_depth=5.0, box_lz=200.0)
    e2 = z_range_edges(cfg2)
    assert e2.shape == (33,) and np.all(np.diff(e2) > 0)


def test_nonuniform_z_voxel_binning():
    """voxel_index with nonuniform_z: particles land in the layer their z
    falls into (k from the edge partition, i/j unchanged)."""
    import jax

    from tpu_smc.observables import voxel_index, z_range_edges

    cfg = SMCConfig(ncz=33, layer_depth=5.0, box_lz=200.0,
                    nonuniform_z=True)
    edges = z_range_edges(cfg) - cfg.box_lz / 2  # centered coordinates
    # one particle per layer mid-point, at x=y=0
    mids = 0.5 * (edges[:-1] + edges[1:])
    r = np.zeros((cfg.ncz, 3))
    r[:, 2] = mids
    v = np.asarray(voxel_index(jax.numpy.asarray(r), cfg))
    k = v % cfg.ncz
    np.testing.assert_array_equal(k, np.arange(cfg.ncz))
    # uniform binning would NOT reproduce this for the thin wall layers
    cfg_u = SMCConfig(ncz=33, box_lz=200.0)
    vu = np.asarray(voxel_index(jax.numpy.asarray(r), cfg_u)) % cfg_u.ncz
    assert not np.array_equal(vu, np.arange(cfg.ncz))


class TestTauInt:
    def test_ar1_known_tau(self):
        """AR(1) with coefficient r has tau_int = 0.5 + r/(1-r); the
        adaptive k_max (len//3) must capture it without an explicit
        cap (ADVICE r2: the old fixed k_max=500 truncated slow modes)."""
        rho, n = 0.9, 200_000
        rng = np.random.default_rng(0)
        x = np.empty(n)
        x[0] = 0.0
        eps = rng.standard_normal(n)
        for i in range(1, n):
            x[i] = rho * x[i - 1] + eps[i]
        tau = obs.tau_int(x)
        expect = 0.5 + rho / (1 - rho)   # 9.5
        assert abs(tau - expect) < 0.2 * expect

    def test_truncated_acf_warns(self):
        """A trace whose ACF never crosses zero inside k_max must warn
        that tau is a truncated lower bound."""
        n = 900
        x = np.cumsum(np.ones(n))  # monotone trend: ACF stays positive
        with pytest.warns(UserWarning, match="negative crossing"):
            obs.tau_int(x, k_max=50)


class TestStructureFactor:
    def test_ideal_gas_flat(self):
        """Uncorrelated uniform positions: S(k) -> 1 with O(1/sqrt(M))
        fluctuations after snapshot averaging."""
        import jax.numpy as jnp

        from tpu_smc.config import SMCConfig
        from tpu_smc.observables import structure_factor

        cfg = SMCConfig(n=256, box_l=20.0, box_lz=60.0)
        rng = np.random.default_rng(0)
        sks = []
        for _ in range(48):
            r = np.stack([rng.uniform(-10, 10, 256),
                          rng.uniform(-10, 10, 256),
                          rng.uniform(-30, 30, 256)], axis=1)
            k, sk = structure_factor(jnp.asarray(r, jnp.float64), cfg,
                                     n_kmax=4)
            sks.append(np.asarray(sk))
        mean_sk = np.mean(sks, axis=0)
        assert np.all(k > 0)
        np.testing.assert_allclose(mean_sk, 1.0, atol=0.35)
        assert abs(mean_sk.mean() - 1.0) < 0.08

    def test_square_lattice_bragg_peak(self):
        """A perfect in-plane square lattice with spacing a = L/m puts a
        Bragg peak S = N at k = 2 pi m / L and ~0 elsewhere."""
        import jax.numpy as jnp

        from tpu_smc.config import SMCConfig
        from tpu_smc.observables import structure_factor

        m = 8
        cfg = SMCConfig(n=m * m, box_l=16.0, box_lz=60.0)
        a = cfg.box_l / m
        xs, ys = np.meshgrid(np.arange(m) * a, np.arange(m) * a,
                             indexing="ij")
        r = np.stack([xs.ravel() - 8, ys.ravel() - 8,
                      np.zeros(m * m)], axis=1)
        k, sk = structure_factor(jnp.asarray(r, jnp.float64), cfg,
                                 n_kmax=m)
        sk = np.asarray(sk)
        k_bragg = 2 * np.pi * m / cfg.box_l
        at_peak = sk[np.isclose(np.asarray(k), k_bragg)]
        assert at_peak.size and np.all(at_peak > 0.9 * cfg.n)
        off = sk[np.asarray(k) < 0.9 * k_bragg]
        assert np.all(off < 1e-6 * cfg.n)


def test_vmap_chains_bounded_map_path_matches_vmap():
    """The lax.map batched lowering (the large-ensemble HBM-bounded
    path) must equal the single-vmap lowering — for plain arrays AND
    for pytree inputs (the (r, w) pairs of wall-disorder runs)."""
    from tpu_smc.observables import vmap_chains_bounded, wall_obs_chains
    from tpu_smc.potentials import total_energy
    from tpu_smc.state import init_ensemble_state
    from tpu_smc.system import build_wall_ensemble

    cfg = SMCConfig(n=16, box_l=10.0, box_lz=30.0, dtype="float32")
    state, w = init_ensemble_state(cfg, jax.random.key(2), 6)
    r = state.r + 0.01 * jax.random.normal(jax.random.key(3), state.r.shape)

    full = vmap_chains_bounded(lambda ri: total_energy(ri, w, cfg),
                               r, cfg.n)
    batched = vmap_chains_bounded(lambda ri: total_energy(ri, w, cfg),
                                  r, cfg.n, batch=2)
    np.testing.assert_allclose(np.asarray(full), np.asarray(batched),
                               rtol=1e-12)

    w_k, _, _ = build_wall_ensemble(cfg, 3)
    w_pc = jnp.asarray(np.repeat(w_k, 2, axis=0), cfg.jnp_dtype)
    fn = lambda rw: total_energy(rw[0], rw[1], cfg)
    full_p = vmap_chains_bounded(fn, (r, w_pc), cfg.n)
    batched_p = vmap_chains_bounded(fn, (r, w_pc), cfg.n, batch=2)
    np.testing.assert_allclose(np.asarray(full_p),
                               np.asarray(batched_p), rtol=1e-12)
    # wall_obs_chains dispatches per-chain vs shared automatically
    np.testing.assert_array_equal(
        np.asarray(wall_obs_chains(
            lambda ri, wc: total_energy(ri, wc, cfg), r, w_pc, cfg.n)),
        np.asarray(full_p))


def test_pressure_profile_sums_to_scalar_virial():
    """Harasima profile exactness: mean_b (P_N + 2 P_T)/3 over bins is
    the scalar rho T + pair virial — same arithmetic, reordered."""
    import jax

    from tpu_smc.observables import pressure_tensor_profile
    from tpu_smc.potentials import pair_virial_pressure
    from tpu_smc.state import init_chain_state

    for mk in (lambda: SMCConfig.bulk(n=32, rho=0.2, temperature=1.0,
                                      dtype="float64"),
               lambda: SMCConfig.for_n(108, dtype="float64")):
        cfg = mk()
        st, w = init_chain_state(cfg, jax.random.key(1))
        r = st.r + 0.05 * jax.random.normal(jax.random.key(2),
                                            st.r.shape)
        for nb in (16, 48):
            c, pn, pt = pressure_tensor_profile(r, cfg, nbins=nb)
            mech = float(np.mean((np.asarray(pn) + 2 * np.asarray(pt))
                                 / 3.0))
            scalar = cfg.rho * cfg.temperature \
                + float(pair_virial_pressure(r, cfg))
            # histograms accumulate f32; the identity holds to that
            np.testing.assert_allclose(mech, scalar, rtol=5e-5,
                                       atol=1e-9)


@pytest.mark.slow
def test_pressure_profile_bulk_isotropy():
    """Equilibrated bulk fluid has no interface, so the CONTOUR-
    INDEPENDENT quantities vanish/agree: the tension integral
    int (P_N - P_T) dz ~ 0 and mean P_N == mean P_T == the scalar
    virial. (Per-bin P_N(z) legitimately oscillates at sub-sigma bin
    widths under the Harasima midpoint assignment — inter-layer pair
    bonds park their fz dz between the layers — so bin-level equality
    is NOT asserted.)"""
    import jax

    from tpu_smc.config import RunParams
    from tpu_smc.driver import ObservableOptions
    from tpu_smc.driver_ensemble import simulate_ensemble
    from tpu_smc.state import init_ensemble_state

    cfg = SMCConfig.bulk(n=32, temperature=1.5, rho=0.2,
                         dtype="float32")
    state, w = init_ensemble_state(cfg, jax.random.key(3), n_chains=16)
    opts = ObservableOptions(pressure=True, clusters=False,
                             collect_sweep_trace=False, ptensor_bins=8)
    state, res = simulate_ensemble(
        cfg, RunParams(eqsteps=150, maxsteps=600, numdata=120), state,
        w, opts=opts, max_fault_retries=0)
    assert res.pn is not None and res.pn.shape == (8,)
    dz = cfg.box_lz / 8
    gamma = 0.5 * float(np.sum(res.pn - res.pt) * dz)
    p_n, p_t = float(res.pn.mean()), float(res.pt.mean())
    scalar = res.mean_pressure  # rho T + virial, gather-averaged
    assert abs(gamma) < 0.05 * cfg.box_lz * max(abs(scalar), 0.05), \
        (gamma, scalar)
    assert abs(p_n - p_t) < 0.1 * max(abs(scalar), 0.05), (p_n, p_t)
    assert abs((p_n + 2 * p_t) / 3 - scalar) < 0.1 * max(abs(scalar),
                                                         0.05)


def test_bincount_helpers_match_numpy():
    """The scatter-free histogram primitives (round-4 window-fault fix:
    TPU scatter-adds serialize) must equal np.bincount exactly —
    including out-of-range values being DROPPED (_bincount_rows) and
    integer weights (_weighted_bincount)."""
    rng = np.random.default_rng(9)
    nb = 7
    q = rng.integers(0, nb, size=1000).astype(np.int32)
    w = rng.integers(0, 5, size=1000).astype(np.int32)
    got = np.asarray(obs._weighted_bincount(jnp.asarray(q), jnp.asarray(w), nb))
    np.testing.assert_array_equal(got, np.bincount(q, w, minlength=nb))

    # rows x cols matrix, values in [0, nb+3) — entries >= nb are dropped
    qm = rng.integers(0, nb + 3, size=(37, 53)).astype(np.int32)
    want = np.bincount(qm.ravel(), minlength=nb + 3)[:nb]
    got = np.asarray(obs._bincount_rows(jnp.asarray(qm), nb))
    np.testing.assert_array_equal(got.astype(np.int64), want)
    # row-blocked path (forces the pad + lax.map branch)
    got_blk = np.asarray(obs._bincount_rows(jnp.asarray(qm), nb, row_block=5))
    np.testing.assert_array_equal(got_blk.astype(np.int64), want)


def test_radial_distribution_matches_triu_reference():
    """The masked full-matrix binning must reproduce the plain
    triu-gather + np.bincount formulation bin for bin."""
    cfg = SMCConfig(n=64, box_l=9.0, box_lz=21.0, dtype="float32")
    r = np.random.default_rng(4).uniform(
        [0, 0, 1.0], [9.0, 9.0, 20.0], size=(64, 3)).astype(np.float32)
    nbins = 48
    centers, gr = obs.radial_distribution(jnp.asarray(r), cfg, nbins=nbins)

    rmax = cfg.lj_cutoff if cfg.lj_cutoff < cfg.box_l / 2 else cfg.box_l / 2
    d = (r[:, None, :] - r[None, :, :]).astype(np.float32)
    for ax in range(2):
        d[..., ax] -= np.float32(cfg.box_l) * np.round(
            d[..., ax] / np.float32(cfg.box_l))
    dr = np.sqrt((d.astype(np.float64) ** 2).sum(-1))
    iu = np.triu_indices(cfg.n, k=1)
    bins = np.clip((dr[iu] / rmax * nbins).astype(np.int32), 0, nbins)
    want = np.bincount(bins, minlength=nbins + 1)[:nbins].astype(np.float64)
    edges = np.linspace(0.0, rmax, nbins + 1)
    shell = (4.0 / 3.0) * np.pi * (edges[1:] ** 3 - edges[:-1] ** 3)
    norm = cfg.rho * shell * cfg.n / 2.0
    np.testing.assert_allclose(np.asarray(gr), want / norm, rtol=2e-5)
    assert float(np.asarray(centers)[-1]) < rmax
