"""Dynamics: ODE vs scipy integration, autodiff vs finite differences."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.integrate import solve_ivp

from mpc_blaster_tpu import config as cfg
from mpc_blaster_tpu.dynamics import (
    BlasterParams, blaster_ode, discrete_dynamics, discrete_jacobians,
    pack_stage_params, unpack_stage_params,
)

RNG = np.random.default_rng(42)


def _params():
    return BlasterParams.from_config(cfg.ModelConfig(), dtype=jnp.float64)


def _random_state():
    x = np.zeros(cfg.NX)
    x[0:3] = RNG.uniform(-1, 1, 3)          # position
    x[3:6] = RNG.uniform(-0.15, 0.15, 3)    # euler
    x[6:9] = RNG.uniform(-0.5, 0.5, 3)      # velocity
    x[9:12] = RNG.uniform(-0.05, 0.05, 3)   # omega
    x[12:14] = RNG.uniform(-0.1, 0.3, 2)    # gimbal
    x[14:17] = RNG.uniform(-1, 1, 3)        # poc
    return x


def _random_control():
    u = np.zeros(cfg.NU)
    u[0:4] = RNG.uniform(15, 30, 4)
    u[4:6] = RNG.uniform(-0.05, 0.05, 2)
    return u


def _random_stage_params():
    j_ang = RNG.uniform(-1, 1, (3, 2))
    j_eul = RNG.uniform(-1, 1, (3, 3))
    j_pos = RNG.uniform(-1, 1, (3, 3))
    return pack_stage_params(j_ang, j_eul, j_pos, 2.2 * 9.81), (j_ang, j_eul, j_pos)


def test_stage_param_pack_roundtrip():
    p, (j_ang, j_eul, j_pos) = _random_stage_params()
    assert p.shape == (cfg.NP,)
    ja, je, jp_, tb = unpack_stage_params(p)
    np.testing.assert_allclose(np.asarray(ja), j_ang, atol=1e-15)
    np.testing.assert_allclose(np.asarray(je), j_eul, atol=1e-15)
    np.testing.assert_allclose(np.asarray(jp_), j_pos, atol=1e-15)
    assert float(tb) == pytest.approx(2.2 * 9.81)
    # column-major layout parity with simulation_blaster.py:67
    np.testing.assert_allclose(
        np.asarray(p[:6]), np.reshape(j_ang, 6, order="F"), atol=1e-15)
    np.testing.assert_allclose(
        np.asarray(p[6:15]), np.reshape(j_eul, 9, order="F"), atol=1e-15)


def test_hover_equilibrium():
    """At level attitude with thrust = mg and T_blast = 0, only POC coupling moves."""
    params = _params()
    x = np.zeros(cfg.NX)
    u = np.zeros(cfg.NU)
    u[0:4] = 9.0 * 9.81 / 4.0
    p = pack_stage_params(np.zeros((3, 2)), np.zeros((3, 3)), np.zeros((3, 3)), 0.0)
    xdot = np.asarray(blaster_ode(jnp.asarray(x), jnp.asarray(u), p, params))
    np.testing.assert_allclose(xdot, np.zeros(cfg.NX), atol=1e-12)


def test_blast_reaction_direction():
    """T_blast pushes along +z of the nozzle frame rotated to world; at rest
    with zero gimbal it adds T_blast/m upward (`blastermodel.py:163`)."""
    params = _params()
    x = np.zeros(cfg.NX)
    u = np.zeros(cfg.NU)
    tb = 2.2 * 9.81
    p = pack_stage_params(np.zeros((3, 2)), np.zeros((3, 3)), np.zeros((3, 3)), tb)
    xdot = np.asarray(blaster_ode(jnp.asarray(x), jnp.asarray(u), p, params))
    np.testing.assert_allclose(xdot[6:9], [0, 0, tb / 9.0 - 9.81], atol=1e-12)


def test_rk4_matches_scipy_high_accuracy():
    params = _params()
    x0 = _random_state()
    u = _random_control()
    p, _ = _random_stage_params()
    dt = 1.0 / 30.0

    F = discrete_dynamics(blaster_ode, dt, num_steps=4)
    x_rk4 = np.asarray(F(jnp.asarray(x0), jnp.asarray(u), p, params))

    def f_np(t, x):
        return np.asarray(blaster_ode(jnp.asarray(x), jnp.asarray(u), p, params))

    sol = solve_ivp(f_np, (0, dt), x0, rtol=1e-12, atol=1e-12, method="RK45")
    np.testing.assert_allclose(x_rk4, sol.y[:, -1], rtol=1e-8, atol=1e-9)


def test_jacfwd_vs_finite_differences():
    """A,B from jacfwd must match central finite differences of the RK4 map."""
    params = _params()
    x0 = _random_state()
    u0 = _random_control()
    p, _ = _random_stage_params()
    dt = 1.0 / 30.0
    F = discrete_dynamics(blaster_ode, dt, num_steps=1)
    FAB = discrete_jacobians(F)
    x_next, A, B = FAB(jnp.asarray(x0), jnp.asarray(u0), p, params)
    np.testing.assert_allclose(
        np.asarray(x_next), np.asarray(F(jnp.asarray(x0), jnp.asarray(u0), p, params)))

    eps = 1e-6
    A_fd = np.zeros((cfg.NX, cfg.NX))
    for i in range(cfg.NX):
        dx = np.zeros(cfg.NX); dx[i] = eps
        fp = np.asarray(F(jnp.asarray(x0 + dx), jnp.asarray(u0), p, params))
        fm = np.asarray(F(jnp.asarray(x0 - dx), jnp.asarray(u0), p, params))
        A_fd[:, i] = (fp - fm) / (2 * eps)
    np.testing.assert_allclose(np.asarray(A), A_fd, rtol=1e-5, atol=1e-7)

    B_fd = np.zeros((cfg.NX, cfg.NU))
    for i in range(cfg.NU):
        du = np.zeros(cfg.NU); du[i] = eps
        fp = np.asarray(F(jnp.asarray(x0), jnp.asarray(u0 + du), p, params))
        fm = np.asarray(F(jnp.asarray(x0), jnp.asarray(u0 - du), p, params))
        B_fd[:, i] = (fp - fm) / (2 * eps)
    np.testing.assert_allclose(np.asarray(B), B_fd, rtol=1e-5, atol=1e-7)


def test_ode_jit_and_vmap():
    params = _params()
    xs = jnp.asarray(np.stack([_random_state() for _ in range(8)]))
    us = jnp.asarray(np.stack([_random_control() for _ in range(8)]))
    p, _ = _random_stage_params()
    batched = jax.jit(jax.vmap(blaster_ode, in_axes=(0, 0, None, None)))
    out = batched(xs, us, p, params)
    assert out.shape == (8, cfg.NX)
    single = blaster_ode(xs[3], us[3], p, params)
    np.testing.assert_allclose(np.asarray(out[3]), np.asarray(single), atol=1e-12)
