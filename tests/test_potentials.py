"""Physics parity: every potential/force/pressure function against the
compiled C reference on fixed configurations (SURVEY §4's "unit tests for
each physics function against C-reference values")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_smc.config import SMCConfig
from tpu_smc import potentials as pot
from tpu_smc.rng import reference_wall_params
from tpu_smc.system import fcc_lattice

CFG64 = SMCConfig(dtype="float64")
CFG32 = SMCConfig(dtype="float32")


def _config(goldens, name, dtype=jnp.float64):
    return jnp.asarray(goldens[name].reshape(-1, 3), dtype=dtype)


@pytest.mark.c_reference
class TestGeometryParity:
    def test_wall_params_bitexact(self, goldens):
        w = reference_wall_params(CFG64)
        np.testing.assert_allclose(w.reshape(-1), goldens["W"], rtol=0, atol=0)

    def test_lattice_bitexact(self, goldens):
        r0 = fcc_lattice(CFG64)
        np.testing.assert_allclose(r0.reshape(-1), goldens["R0"], rtol=0, atol=0)


@pytest.mark.c_reference
class TestPairPhysics:
    @pytest.mark.parametrize("conf", ["R1", "R2"])
    def test_total_energy(self, goldens, conf):
        r = _config(goldens, conf)
        e = pot.pair_energy_total(r, CFG64)
        np.testing.assert_allclose(float(e), goldens[f"energy_{conf}"][0], rtol=1e-10)

    @pytest.mark.parametrize("conf", ["R1", "R2"])
    def test_energy_single(self, goldens, conf):
        r = _config(goldens, conf)
        u = jax.vmap(lambda i: pot.pair_energy_force_single(r, i, r[i], CFG64)[0])(
            jnp.arange(CFG64.n)
        )
        np.testing.assert_allclose(
            np.asarray(u), goldens[f"energySingle_{conf}"], rtol=1e-10, atol=1e-13
        )

    @pytest.mark.parametrize("conf", ["R1", "R2"])
    def test_force_single(self, goldens, conf):
        r = _config(goldens, conf)
        f = jax.vmap(lambda i: pot.pair_energy_force_single(r, i, r[i], CFG64)[1])(
            jnp.arange(CFG64.n)
        )
        np.testing.assert_allclose(
            np.asarray(f).reshape(-1),
            goldens[f"forceSingle_{conf}"],
            rtol=1e-9,
            atol=1e-10,
        )

    @pytest.mark.parametrize("conf", ["R1", "R2"])
    def test_pressure(self, goldens, conf):
        r = _config(goldens, conf)
        p = pot.pair_virial_pressure(r, CFG64)
        np.testing.assert_allclose(
            float(p), goldens[f"pressure_{conf}"][0], rtol=1e-10, atol=1e-16
        )


@pytest.mark.c_reference
class TestWallPhysics:
    @pytest.mark.parametrize("conf", ["R1", "R2"])
    def test_wall_energy_total(self, goldens, conf):
        r = _config(goldens, conf)
        w = jnp.asarray(reference_wall_params(CFG64))
        e = pot.wall_energy_total(r, w, CFG64)
        np.testing.assert_allclose(
            float(e), goldens[f"wallsEnergy_{conf}"][0], rtol=1e-10
        )

    @pytest.mark.parametrize("conf", ["R1", "R2"])
    def test_wall_energy_single(self, goldens, conf):
        r = _config(goldens, conf)
        w = jnp.asarray(reference_wall_params(CFG64))
        u = jax.vmap(lambda x: pot.wall_energy_force_single(x, w, CFG64)[0])(r)
        np.testing.assert_allclose(
            np.asarray(u), goldens[f"wallsEnergySingle_{conf}"], rtol=1e-10, atol=1e-15
        )

    @pytest.mark.parametrize("conf", ["R1", "R2"])
    def test_wall_force_single(self, goldens, conf):
        r = _config(goldens, conf)
        w = jnp.asarray(reference_wall_params(CFG64))
        f = jax.vmap(lambda x: pot.wall_energy_force_single(x, w, CFG64)[1])(r)
        np.testing.assert_allclose(
            np.asarray(f).reshape(-1),
            goldens[f"wallsForce_{conf}"],
            rtol=1e-9,
            atol=1e-11,
        )

    @pytest.mark.parametrize("conf", ["R1", "R2"])
    def test_wall_pressure_reproduces_ref_bug(self, goldens, conf):
        """wallsPressure has an L/2-vs-Lz/2 bug (SMC.c:880); our
        reproduce_ref_bug flag must match the C arithmetic exactly."""
        r = _config(goldens, conf)
        w = jnp.asarray(reference_wall_params(CFG64))
        p = pot.wall_virial_pressure(r, w, CFG64, reproduce_ref_bug=True)
        np.testing.assert_allclose(
            float(p), goldens[f"wallsPressure_{conf}"][0], rtol=1e-10, atol=1e-18
        )


class TestFloat32:
    """float32 (the TPU compute dtype) must track float64 closely away from
    the wall-contact clamp."""

    @pytest.mark.c_reference
    def test_energy_f32_close(self, goldens):
        r64 = _config(goldens, "R2")
        r32 = r64.astype(jnp.float32)
        w32 = jnp.asarray(reference_wall_params(CFG32), dtype=jnp.float32)
        e32 = pot.pair_energy_total(r32, CFG32)
        np.testing.assert_allclose(
            float(e32), goldens["energy_R2"][0], rtol=2e-4
        )

    def test_wall_clamp_finite_f32(self):
        """Beyond-the-wall positions must stay finite in float32 (the
        reference's 1e-4 clamp would overflow; we widen it, config.py)."""
        w = jnp.asarray(reference_wall_params(CFG32), dtype=jnp.float32)
        r = jnp.asarray([0.5, 0.5, -CFG32.box_lz / 2 - 1.0], dtype=jnp.float32)
        u, f = pot.wall_energy_force_single(r, w, CFG32)
        assert np.isfinite(float(u))
        assert np.all(np.isfinite(np.asarray(f)))


class TestInvariants:
    """Physics sanity independent of the C reference."""

    def test_force_is_minus_gradient(self):
        cfg = SMCConfig(dtype="float64")
        w = jnp.asarray(reference_wall_params(cfg))
        rng = np.random.default_rng(3)
        r = jnp.asarray(
            rng.uniform(-2.0, 2.0, (cfg.n, 3))
            + np.array([0.0, 0.0, -cfg.box_lz / 2 + 3.0])
        )
        i = 17

        def u_of(ri):
            return pot.energy_force_single(r, i, ri, w, cfg)[0]

        grad = jax.grad(u_of)(r[i])
        _, f = pot.energy_force_single(r, i, r[i], w, cfg)
        np.testing.assert_allclose(np.asarray(f), -np.asarray(grad), rtol=1e-8, atol=1e-10)

    def test_total_energy_is_half_sum_singles(self):
        cfg = SMCConfig(dtype="float64", use_walls=False)
        rng = np.random.default_rng(4)
        r = jnp.asarray(rng.uniform(-3.0, 3.0, (cfg.n, 3)))
        u_tot = pot.pair_energy_total(r, cfg)
        u_single = jax.vmap(
            lambda i: pot.pair_energy_force_single(r, i, r[i], cfg)[0]
        )(jnp.arange(cfg.n))
        np.testing.assert_allclose(float(u_tot), 0.5 * float(jnp.sum(u_single)), rtol=1e-10)

    def test_min_image_xy_only(self):
        """z is deliberately NOT min-imaged in the wall system (SMC.c:572)."""
        cfg = SMCConfig(dtype="float64", n=2, use_walls=False)
        r = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, cfg.box_lz * 0.9]])
        u = pot.pair_energy_total(r, cfg)
        assert float(u) == 0.0  # far apart along unwrapped z

    def test_bulk_wraps_z(self):
        cfg = SMCConfig(
            dtype="float64", n=2, use_walls=False, pbc_z=True,
            box_l=10.0, box_lz=10.0, lj_cutoff=5.0,
        )
        r = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 9.0]])  # image distance 1
        u = pot.pair_energy_total(r, cfg)
        assert float(u) == pytest.approx(4.0 * (1.0 - 1.0), abs=1e-12) or float(u) != 0.0
        # image distance is exactly 1 => V = 4*(1 - 1) = 0... use 8.9 instead
        r = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 8.9]])
        u = pot.pair_energy_total(r, cfg)
        d = 10.0 - 8.9
        expected = 4.0 * (d ** -12 - d ** -6)
        np.testing.assert_allclose(float(u), expected, rtol=1e-10)


def test_total_forces_is_minus_grad_energy():
    """total_forces (the reference's dead `forces`, SMC.c:656-686) must be
    the exact negative gradient of the total energy."""
    import jax

    from tpu_smc.potentials import total_energy, total_forces
    from tpu_smc.state import init_chain_state

    cfg = SMCConfig(n=16, box_l=12.0, box_lz=40.0, dtype="float64")
    rng = np.random.default_rng(3)
    r0 = np.stack([
        rng.uniform(-5, 5, 16), rng.uniform(-5, 5, 16),
        rng.uniform(-15, 15, 16),
    ], axis=-1)
    state, w = init_chain_state(cfg, jax.random.key(0), r0=r0)
    f = np.asarray(total_forces(state.r, w, cfg))
    g = np.asarray(jax.grad(lambda r: total_energy(r, w, cfg))(state.r))
    np.testing.assert_allclose(f, -g, rtol=1e-9, atol=1e-9)
