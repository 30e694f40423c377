"""Gibbs-ensemble engine tests — gibbs.py.

Validation ladder (increasing physics):
  1. masked+traced-box physics parity against the open-set functions;
  2. exact conservation laws: N1+N2 and V1+V2 invariant by construction;
  3. frozen exchanges (dlnv=0, no transfers) = two INDEPENDENT masked
     NVT boxes — box 1's trajectory is bitwise insensitive to box 2;
  4. supercritical equalization: imbalanced boxes relax to equal
     densities and equal virial pressures (one phase);
  5. subcritical coexistence: boxes bifurcate into vapor/liquid with
     equal in-run chemical potentials (the flagship, statistical).
The reference has no multi-box capability of any kind.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_smc import gibbs
from tpu_smc.config import SMCConfig
from tpu_smc.gcmc import total_energy_masked
from tpu_smc.potentials import pair_energy_total


def mk_cfg(**kw):
    """Gibbs config: cfg.n is the TOTAL count, cfg.box_l the PER-BOX
    side sized so each box starts with n/2 at the given density."""
    import dataclasses

    kw.setdefault("n", 48)
    kw.setdefault("temperature", 1.2)
    rho = kw.pop("rho", 0.3)
    kw.setdefault("gamma", 0.02)
    kw.setdefault("lj_cutoff", 1.5)
    kw.setdefault("lj_shift", True)
    n = kw["n"]
    l = ((n / 2) / rho) ** (1.0 / 3.0)
    cfg = SMCConfig.bulk(**kw)
    return dataclasses.replace(cfg, box_l=l, box_lz=l)


def test_masked_box_energy_matches_open_set():
    """total_energy_masked with a traced box and a full active set
    equals pair_energy_total at that box."""
    cfg = mk_cfg()
    key = jax.random.key(0)
    l = jnp.asarray(0.9 * cfg.box_l, cfg.jnp_dtype)
    r = (jax.random.uniform(key, (20, 3), cfg.jnp_dtype) - 0.5) * l
    w = jnp.zeros((0,), cfg.jnp_dtype)
    u_m = total_energy_masked(r, jnp.ones(20, bool), w, cfg, box=l)
    u_o = pair_energy_total(r, cfg, box=l)
    assert float(u_m) == pytest.approx(float(u_o), rel=1e-6)


def test_conservation_exact():
    """N1+N2 and V1+V2 are conserved through displacement, volume
    exchange, and transfer moves — N exactly, V to the accumulation of
    the cbrt round trip (each accepted exchange re-pins to Vtot)."""
    cfg = mk_cfg(n=24, rho=0.25)
    st, res = gibbs.simulate_gibbs(
        cfg, eqsteps=30, maxsteps=120, key=jax.random.key(1),
        cap=24, n_chains=3, dlnv=0.2, n_transfer=6, chunk=50)
    vtot = 2.0 * cfg.box_l ** 3
    n1 = res.n1_trace
    assert n1.min() >= 0 and n1.max() <= 24
    v1 = res.v1_trace
    assert (v1 > 0).all() and (v1 < vtot).all()
    # final state: recount actives and recube sides
    assert (res.n_final.sum(axis=-1) == cfg.n).all()
    v_fin = (res.l_final ** 3).sum(axis=-1)
    np.testing.assert_allclose(v_fin, vtot, rtol=1e-5)
    # both boxes honor the hard floor
    assert (res.l_final >= 2.0 * cfg.lj_cutoff - 1e-6).all()
    # transfers really happened
    assert res.transfer_acceptance > 0


def test_frozen_exchange_boxes_independent():
    """dlnv=0 + n_transfer=0: the two boxes are independent masked NVT
    runs — box 1's trajectory is BITWISE insensitive to box 2's
    contents, volumes and counts frozen."""
    cfg = mk_cfg(n=24, rho=0.25)

    def run(seed2):
        st = gibbs.init_gibbs_state(cfg, jax.random.key(3), cap=16)
        # perturb ONLY box 2's positions (same actives)
        r = st.r.at[1].add(
            0.05 * jax.random.normal(jax.random.key(seed2),
                                     st.r[1].shape, cfg.jnp_dtype))
        w = jnp.zeros((0,), cfg.jnp_dtype)
        e = jax.vmap(lambda rr, aa, ll: total_energy_masked(
            rr, aa, w, cfg, box=ll))(r, st.active, st.l)
        st = st._replace(r=r, energy=e)
        st2, _ = gibbs.gibbs_block(st, cfg, cfg.proposal_a, 0.0, 0, 20)
        return st2

    a = run(10)
    b = run(20)
    np.testing.assert_array_equal(np.asarray(a.r[0]),
                                  np.asarray(b.r[0]))
    assert not np.array_equal(np.asarray(a.r[1]), np.asarray(b.r[1]))
    for s in (a, b):
        # frozen bitwise at the f32 init value (cfg.box_l is f64)
        assert float(s.l[0]) == float(s.l[1]) \
            == float(np.float32(cfg.box_l))
        assert int(jnp.sum(s.active[0])) == 12
        assert int(s.disp_acc) > 0


def test_transfer_only_ideal_gas_splits_by_volume():
    """Transfers with (near-)zero interactions: N1 follows the
    binomial law p = V1/Vtot — the transfer acceptance's N V factors
    alone must produce it. Asymmetric volumes via an asymmetric init
    would need volume moves; instead run at a tiny density where LJ is
    negligible and check <N1> -> N/2, Var(N1) -> N/4."""
    cfg = mk_cfg(n=32, rho=0.02, temperature=2.0)
    st, res = gibbs.simulate_gibbs(
        cfg, eqsteps=200, maxsteps=1500, key=jax.random.key(4),
        cap=32, n_chains=8, dlnv=0.0, n_transfer=8, chunk=500)
    n1 = res.n1_trace
    assert n1.mean() == pytest.approx(16.0, abs=0.5)
    assert n1.var() == pytest.approx(8.0, rel=0.35)


def test_gibbs_sharded_mesh():
    """mesh= shards the chain batch over the 8 virtual devices (each
    chain's box PAIR stays on one device). One-sweep blocks are
    BITWISE; long scans acquire ULP schedule noise under GSPMD that
    Metropolis amplifies (see test_npt_sharded_mesh), so the driver
    check is conservation + statistics."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tpu_smc.ensemble import make_mesh

    cfg = mk_cfg(n=16, rho=0.2)
    mesh = make_mesh(8)
    put = lambda x: jax.device_put(x, NamedSharding(mesh, P("chains")))
    keys = jax.random.split(jax.random.key(6), 8)
    st = jax.tree.map(lambda *xs: jnp.stack(xs),
                      *[gibbs.init_gibbs_state(cfg, k, cap=16)
                        for k in keys])
    run1 = jax.jit(jax.vmap(
        lambda s: gibbs.gibbs_block(s, cfg, cfg.proposal_a, 0.1, 4, 1)))
    a, _ = run1(st)
    b, _ = run1(jax.tree.map(put, st))
    for f in ("r", "active", "l", "energy"):
        np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                      np.asarray(getattr(b, f)), f)
    # driver level: conservation holds sharded; densities agree
    kw = dict(cap=16, n_chains=8, dlnv=0.1, n_transfer=4, chunk=200)
    _, r1 = gibbs.simulate_gibbs(cfg, 150, 300, jax.random.key(6), **kw)
    _, r8 = gibbs.simulate_gibbs(cfg, 150, 300, jax.random.key(6),
                                 mesh=mesh, **kw)
    assert (r8.n_final.sum(axis=-1) == cfg.n).all()
    vtot = 2.0 * cfg.box_l ** 3
    np.testing.assert_allclose((r8.l_final ** 3).sum(axis=-1), vtot,
                               rtol=1e-5)
    mid = 0.5 * (r1.rho_lo + r1.rho_hi)
    mid8 = 0.5 * (r8.rho_lo + r8.rho_hi)
    assert mid8 == pytest.approx(mid, rel=0.25)


def test_gibbs_temperature_ladder_binodal():
    """Per-chain temperatures: one compiled program runs the
    coexistence curve. A clearly-subcritical and a supercritical level
    advance side by side; the grouping helper must separate them —
    the cold level bifurcates, the hot one does not, and the hot
    level's density matches the overall density."""
    from tpu_smc.gibbs import binodal_from_results

    cfg = mk_cfg(n=48, rho=0.3, temperature=1.0, lj_cutoff=1.8)
    temps_c = np.repeat([0.7, 2.0], 3)
    st, res = gibbs.simulate_gibbs(
        cfg, eqsteps=900, maxsteps=1500, key=jax.random.key(15),
        cap=48, n_chains=6, dlnv=0.08, n_transfer=12, chunk=300,
        temperatures=temps_c)
    rows = binodal_from_results(st, res, temps_c, cfg)
    assert [r["t"] for r in rows] == [0.7, 2.0]
    cold, hot = rows
    assert cold["two_phase"] and cold["rho_l"] > 2.5 * cold["rho_v"]
    assert not hot["two_phase"]
    rho_all = cfg.n / (2.0 * cfg.box_l ** 3)
    assert 0.5 * (hot["rho_v"] + hot["rho_l"]) == pytest.approx(
        rho_all, rel=0.15)
    assert np.isfinite([cold["dmu"], hot["dmu"]]).all()


def test_gibbs_checkpoint_resume_bitwise(tmp_path):
    """save -> load -> continue equals the unbroken run bitwise (all
    three key streams live in the state; chunk re-sync deterministic)."""
    cfg = mk_cfg(n=24, rho=0.25)
    key = jax.random.key(11)
    kw = dict(cap=24, n_chains=2, dlnv=0.1, n_transfer=6, chunk=100)
    st_a, _ = gibbs.simulate_gibbs(cfg, 50, 200, key, **kw)
    st_b, _ = gibbs.simulate_gibbs(cfg, 50, 100, key, **kw)
    p = gibbs.save_gibbs_checkpoint(tmp_path / "ck", st_b, cfg)
    st_l, cfg_l = gibbs.load_gibbs_checkpoint(p)
    assert cfg_l == cfg
    st_c, _ = gibbs.simulate_gibbs(cfg_l, 0, 100, jax.random.key(0),
                                   state0=st_l, **kw)
    for f in ("r", "active", "l", "energy"):
        np.testing.assert_array_equal(np.asarray(getattr(st_a, f)),
                                      np.asarray(getattr(st_c, f)), f)


# ---------------------------------------------------------------------
# statistical end-to-ends (full suite only — excluded from `quick`)
# ---------------------------------------------------------------------

def test_supercritical_boxes_equalize():
    """One-phase region: starting from an IMBALANCED split (3/4 of the
    particles in box 1), densities and virial pressures equalize."""
    from tpu_smc.potentials import pair_virial_pressure

    cfg = mk_cfg(n=48, rho=0.3, temperature=2.0)
    keys = jax.random.split(jax.random.key(5), 8)
    states = [gibbs.init_gibbs_state(cfg, k, cap=48, n1=36, n2=12)
              for k in keys]
    st0 = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    st, res = gibbs.simulate_gibbs(
        cfg, eqsteps=800, maxsteps=1600, key=jax.random.key(0),
        cap=48, n_chains=8, dlnv=0.1, n_transfer=12, chunk=400,
        state0=st0)
    # densities: the sorted branches must nearly coincide (no gap)
    assert res.rho_hi - res.rho_lo < 0.12 * (res.rho_hi + res.rho_lo)
    # chemical equilibrium diagnostic (pressure equality is implied by
    # density equality at one T)
    assert abs(res.mu_box[0] - res.mu_box[1]) < 0.25


def test_subcritical_coexistence_bifurcates():
    """Two-phase region: boxes bifurcate into vapor + liquid branches
    with equal in-run chemical potentials (mu = T ln rho + mu_ex from
    the transfer ghosts). The flagship Gibbs validation."""
    cfg = mk_cfg(n=96, rho=0.3, temperature=0.75, lj_cutoff=1.8)
    st, res = gibbs.simulate_gibbs(
        cfg, eqsteps=1500, maxsteps=2500, key=jax.random.key(7),
        cap=96, n_chains=6, dlnv=0.08, n_transfer=24, chunk=250)
    # a genuine gap: liquid at least 3x the vapor density
    assert res.rho_hi > 3.0 * res.rho_lo, (res.rho_lo, res.rho_hi)
    assert res.rho_hi > 0.45          # liquid branch is dense
    assert res.rho_lo < 0.15          # vapor branch is dilute
    # chemical equilibrium between the PHYSICAL boxes
    assert np.isfinite(res.mu_box).all()
    assert abs(res.mu_box[0] - res.mu_box[1]) < 0.4
