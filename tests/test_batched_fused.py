"""Batched fused-assembly RTI tick (r5): in-kernel cost/bounds/dx0
assembly + in-kernel state update must reproduce the host-assembled
batched Pallas tick exactly — the QP is identical, only where it is
built differs. Kernel runs in interpret mode on CPU (like
tests/test_pallas_ipm.py).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_blaster_tpu import config as cfg
from mpc_blaster_tpu.ocp.spec import build_spec
from mpc_blaster_tpu.parallel.mesh import batched_rti_step
from mpc_blaster_tpu.sqp.rti import init_rti_state


def _ocp(n=8, ipm_iters=6, **kw):
    base = cfg.simulation_preset().ocp
    return dataclasses.replace(
        base, N=n, Tf=n / 30.0,
        solver=dataclasses.replace(base.solver, qp_backend="pallas",
                                   lin_backend="fused",
                                   ipm_iters=ipm_iters, **kw))


def _batch(ocp, B=3):
    rng = np.random.default_rng(7)
    x0s = np.zeros((B, cfg.NX), np.float32)
    x0s[:, 0:3] = rng.uniform(-0.3, 0.3, (B, 3))
    x0s[:, 2] += 1.0
    x0s = jnp.asarray(x0s)
    states = jax.vmap(lambda x: init_rti_state(ocp, x))(x0s)
    return states, x0s


def test_batched_fused_matches_pallas_interpret():
    ocp = _ocp()
    spec = build_spec(ocp, dtype=jnp.float32)
    states, x0s = _batch(ocp)

    step_p = batched_rti_step(ocp, jit=False, backend="pallas")
    step_f = batched_rti_step(ocp, jit=False, backend="pallas_fused")

    u_p, st_p, dg_p = step_p(spec, states, x0s)
    u_f, st_f, dg_f = step_f(spec, states, x0s)

    # identical QP, identical IPM -> f32-noise-level parity
    np.testing.assert_allclose(np.asarray(u_f), np.asarray(u_p),
                               rtol=0, atol=2e-3)
    np.testing.assert_allclose(np.asarray(st_f.xbar), np.asarray(st_p.xbar),
                               rtol=0, atol=5e-3)
    np.testing.assert_allclose(np.asarray(st_f.ubar), np.asarray(st_p.ubar),
                               rtol=0, atol=5e-3)
    # in-kernel diagnostics match the host-computed ones
    np.testing.assert_allclose(np.asarray(dg_f.qp_kkt_eq),
                               np.asarray(dg_p.qp_kkt_eq),
                               rtol=0.2, atol=1e-3)
    np.testing.assert_allclose(np.asarray(dg_f.step_norm_x),
                               np.asarray(dg_p.step_norm_x),
                               rtol=0.05, atol=1e-3)
    np.testing.assert_allclose(np.asarray(dg_f.step_norm_u),
                               np.asarray(dg_p.step_norm_u),
                               rtol=0.05, atol=1e-3)
    np.testing.assert_allclose(np.asarray(dg_f.bound_viol),
                               np.asarray(dg_p.bound_viol),
                               rtol=0.05, atol=1e-3)


def test_batched_fused_chain_stays_finite():
    """Three chained fused-assembly ticks (the bench shape) keep the
    iterate finite and drive the defect residual down."""
    ocp = _ocp()
    spec = build_spec(ocp, dtype=jnp.float32)
    states, x0s = _batch(ocp, B=2)
    step_f = batched_rti_step(ocp, jit=False, backend="pallas_fused")
    eqs = []
    for _ in range(3):
        u, states, dg = step_f(spec, states, x0s)
        eqs.append(np.asarray(dg.qp_kkt_eq).max())
    assert np.isfinite(np.asarray(states.xbar)).all()
    assert np.isfinite(np.asarray(states.ubar)).all()
    # every chained QP solve stays well-converged on its linearization
    assert max(eqs) < 1e-2


def test_batched_fused_qp_r_floor_hessian_only():
    """The QP-only R floor damps the step in the floored channels but
    (gradient untouched) leaves a converged iterate's fixed point alone:
    a floored tick from the same state must produce a SMALLER swivel-rate
    step, and with floor=0 rows the solve is bit-identical."""
    ocp0 = _ocp()
    ocp_f = dataclasses.replace(
        ocp0, solver=dataclasses.replace(
            ocp0.solver, qp_r_floor=(0.0,) * 4 + (5.0, 5.0)))
    ocp_z = dataclasses.replace(
        ocp0, solver=dataclasses.replace(
            ocp0.solver, qp_r_floor=(0.0,) * 6))
    spec = build_spec(ocp0, dtype=jnp.float32)
    states, x0s = _batch(ocp0, B=2)

    u0, st0, _ = batched_rti_step(ocp0, jit=False,
                                  backend="pallas_fused")(spec, states, x0s)
    uf, stf, _ = batched_rti_step(ocp_f, jit=False,
                                  backend="pallas_fused")(spec, states, x0s)
    uz, stz, _ = batched_rti_step(ocp_z, jit=False,
                                  backend="pallas_fused")(spec, states, x0s)

    # zero floor == no floor, bitwise
    np.testing.assert_array_equal(np.asarray(uz), np.asarray(u0))
    # floored swivel-rate channels move less (proximal damping)
    d0 = np.abs(np.asarray(st0.ubar[:, :, 4:6])
                - np.asarray(states.ubar[:, :, 4:6])).max()
    df = np.abs(np.asarray(stf.ubar[:, :, 4:6])
                - np.asarray(states.ubar[:, :, 4:6])).max()
    assert df < d0
