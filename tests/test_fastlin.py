"""Fused component-form linearizer (`dynamics/fastlin.py`) vs the default
jacfwd path — same RK4 + forward sensitivities, different op schedule."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_blaster_tpu import config as cfg
from mpc_blaster_tpu.dynamics.blaster import (BlasterParams, blaster_ode,
                                              pack_stage_params)
from mpc_blaster_tpu.dynamics.fastlin import fast_linearize
from mpc_blaster_tpu.dynamics.integrators import discrete_dynamics
from mpc_blaster_tpu.sqp.rti import _linearize_nodes


def _rand_inputs(N, dtype, seed=0):
    rng = np.random.default_rng(seed)
    xbar = rng.normal(0, 0.3, (N + 1, cfg.NX))
    xbar[:, 2] += 2.0
    ubar = rng.normal(0, 1.0, (N, cfg.NU))
    ubar[:, 0:4] += 5.0
    jm = rng.normal(0, 0.5, (3, 2))
    je = rng.normal(0, 0.5, (3, 3))
    jp = rng.normal(0, 0.5, (3, 3))
    p = pack_stage_params(jm, je, jp, 2.2 * 9.81)
    sp = jnp.tile(jnp.asarray(p, dtype)[None], (N, 1))
    return jnp.asarray(xbar, dtype), jnp.asarray(ubar, dtype), sp


@pytest.mark.parametrize("num_steps", [1, 2])
def test_fastlin_matches_jacfwd_f64(num_steps):
    dtype = jnp.float64
    preset = cfg.simulation_preset()
    params = BlasterParams.from_config(preset.ocp.model, dtype)
    dt = preset.ocp.dt
    F = discrete_dynamics(blaster_ode, dt, num_steps=num_steps)
    xbar, ubar, sp = _rand_inputs(8, dtype)

    xn0, A0, B0 = _linearize_nodes(F, xbar, ubar, sp, params)
    xn1, A1, B1 = fast_linearize(xbar, ubar, sp, params, dt,
                                 num_steps=num_steps)
    np.testing.assert_allclose(xn1, xn0, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(A1, A0, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(B1, B0, rtol=1e-10, atol=1e-12)


def test_fastlin_matches_jacfwd_f32():
    dtype = jnp.float32
    preset = cfg.simulation_preset()
    params = BlasterParams.from_config(preset.ocp.model, dtype)
    dt = preset.ocp.dt
    F = discrete_dynamics(blaster_ode, dt, num_steps=1)
    xbar, ubar, sp = _rand_inputs(12, dtype, seed=3)

    xn0, A0, B0 = _linearize_nodes(F, xbar, ubar, sp, params)
    xn1, A1, B1 = fast_linearize(xbar, ubar, sp, params, dt)
    # Same math, different summation order -> f32 roundoff only.
    np.testing.assert_allclose(xn1, xn0, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(A1, A0, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(B1, B0, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_fastlin_closed_loop_parity():
    """Full closed loop under lin_backend='fused' tracks the default to
    f64 machine-level — validates the make_linearizer wiring end to end."""
    from mpc_blaster_tpu.ocp.spec import build_spec
    from mpc_blaster_tpu.sim.closedloop import closed_loop

    dtype = jnp.float64
    preset = cfg.simulation_preset()
    ocp = dataclasses.replace(preset.ocp, N=10, Tf=10 / 30.0)
    spec = build_spec(ocp, yref=preset.loop.yref, dtype=dtype)
    x0 = jnp.zeros(cfg.NX, dtype).at[2].set(2.0).at[0].set(0.4)

    res0 = closed_loop(spec, ocp, x0, 10, dtype=dtype)
    ocp_f = dataclasses.replace(
        ocp, solver=dataclasses.replace(ocp.solver, lin_backend="fused"))
    res1 = closed_loop(spec, ocp_f, x0, 10, dtype=dtype)
    # The IPM's barrier nonlinearity amplifies the linearizers' f64
    # summation-order roundoff ~10x per solve; observed max diff 2e-7.
    np.testing.assert_allclose(res1.xs, res0.xs, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(res1.us, res0.us, rtol=1e-5, atol=1e-6)


def test_fastlin_vmappable():
    """The batched/sharded paths vmap rti_step over trajectories; the fused
    linearizer's repeat/tile layout must map cleanly under vmap."""
    dtype = jnp.float64
    preset = cfg.simulation_preset()
    params = BlasterParams.from_config(preset.ocp.model, dtype)
    dt = preset.ocp.dt

    xb0, ub0, sp = _rand_inputs(6, dtype, seed=1)
    xb1, ub1, _ = _rand_inputs(6, dtype, seed=2)
    xbs = jnp.stack([xb0, xb1])
    ubs = jnp.stack([ub0, ub1])

    xn_b, a_b, b_b = jax.vmap(
        lambda xb, ub: fast_linearize(xb, ub, sp, params, dt))(xbs, ubs)
    for i, (xb, ub) in enumerate(((xb0, ub0), (xb1, ub1))):
        xn, a, b = fast_linearize(xb, ub, sp, params, dt)
        np.testing.assert_allclose(xn_b[i], xn, rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(a_b[i], a, rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(b_b[i], b, rtol=1e-12, atol=1e-12)


def test_fastlin_dist_family_matches_jacfwd():
    """"blaster_dist" rows family (r4): disturbance channels in stage-param
    rows 25:31 must match jacfwd of the vector-form `dist_param_ode`."""
    from mpc_blaster_tpu.sim.scenarios import dist_param_ode

    dtype = jnp.float64
    preset = cfg.simulation_preset()
    params = BlasterParams.from_config(preset.ocp.model, dtype)
    dt = preset.ocp.dt
    F = discrete_dynamics(dist_param_ode, dt, num_steps=1)
    xbar, ubar, sp = _rand_inputs(6, dtype, seed=5)
    rng = np.random.default_rng(9)
    d = jnp.asarray(rng.normal(0, 0.4, (6, 6)), dtype)  # per-stage dists
    sp = jnp.concatenate([sp, d], axis=1)               # (N, 31)

    xn0, A0, B0 = _linearize_nodes(F, xbar, ubar, sp, params)
    xn1, A1, B1 = fast_linearize(xbar, ubar, sp, params, dt,
                                 family="blaster_dist")
    np.testing.assert_allclose(xn1, xn0, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(A1, A0, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(B1, B0, rtol=1e-10, atol=1e-12)
    # the disturbance genuinely enters: zero-d and d- predictions differ
    xn_z, _, _ = fast_linearize(xbar, ubar, sp.at[:, 25:31].set(0.0),
                                params, dt, family="blaster_dist")
    assert float(jnp.max(jnp.abs(xn1 - xn_z))) > 1e-4


def test_fastlin_quad13_family_matches_jacfwd():
    """"quad13" rows family vs jacfwd of `quad13_ode` (r4 registry)."""
    from mpc_blaster_tpu.models.quad13 import (Quad13Config, _params,
                                               quad13_ode)

    dtype = jnp.float64
    c = Quad13Config(N=6)
    params = _params(c, dtype)
    F = discrete_dynamics(quad13_ode, c.dt, num_steps=1)
    rng = np.random.default_rng(11)
    xbar = rng.normal(0, 0.3, (7, 13))
    xbar[:, 2] += 2.0
    xbar[:, 3] += 1.0  # near-identity quats
    ubar = rng.normal(0, 1.0, (6, 4)) + 20.0
    sp = jnp.zeros((6, 1), dtype)
    xbar = jnp.asarray(xbar, dtype)
    ubar = jnp.asarray(ubar, dtype)

    xn0, A0, B0 = _linearize_nodes(F, xbar, ubar, sp, params)
    xn1, A1, B1 = fast_linearize(xbar, ubar, sp, params, c.dt,
                                 family="quad13")
    np.testing.assert_allclose(xn1, xn0, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(A1, A0, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(B1, B0, rtol=1e-10, atol=1e-12)


def test_fastlin_bad_backend_rejected():
    from mpc_blaster_tpu.sqp.rti import make_linearizer

    preset = cfg.simulation_preset()
    params = BlasterParams.from_config(preset.ocp.model, jnp.float32)
    ocp = dataclasses.replace(
        preset.ocp,
        solver=dataclasses.replace(preset.ocp.solver, lin_backend="nope"))
    with pytest.raises(ValueError):
        make_linearizer(ocp, params)
