"""LQR terminal-cost synthesis (ocp/terminal.py, r5): DARE correctness +
the measured stabilization of short-horizon offset-free loops."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_blaster_tpu import config as cfg
from mpc_blaster_tpu.ocp.spec import build_spec
from mpc_blaster_tpu.ocp.terminal import (hover_equilibrium,
                                          lqr_terminal_weight)


def _sim_ocp(n, ipm_iters=8):
    base = cfg.simulation_preset()
    return dataclasses.replace(
        base.ocp, N=n, Tf=n / 30.0,
        solver=dataclasses.replace(base.ocp.solver, qp_backend="riccati",
                                   ipm_iters=ipm_iters))


def test_lqr_terminal_solves_dare():
    """P satisfies the DARE on the kept subspace; dropped POC rows keep
    the preset terminal diagonal; result is symmetric PSD."""
    import scipy.linalg

    ocp = _sim_ocp(12)
    spec = build_spec(ocp, yref=cfg.simulation_preset().loop.yref,
                      dtype=jnp.float32)
    Qt = np.asarray(lqr_terminal_weight(ocp, spec), np.float64)
    assert np.allclose(Qt, Qt.T, atol=1e-3)
    evals = np.linalg.eigvalsh(Qt)
    assert evals.min() > -1e-6
    # POC rows (zero Jacobians in this spec) keep the preset's terminal
    np.testing.assert_allclose(Qt[14:, 14:], np.asarray(spec.Q_t)[14:, 14:],
                               rtol=0, atol=1e-6)
    assert np.allclose(Qt[14:, :14], 0.0, atol=1e-6)

    # re-derive the linearization and check the Riccati fixed point
    from mpc_blaster_tpu.dynamics.blaster import BlasterParams
    from mpc_blaster_tpu.dynamics.fastlin import fast_linearize

    params = BlasterParams.from_config(ocp.model, jnp.float32)
    x_eq, u_eq = hover_equilibrium(ocp, spec)
    xb = jnp.asarray(np.tile(x_eq, (2, 1)), jnp.float32)
    ub = jnp.asarray(u_eq[None], jnp.float32)
    _, A, B = fast_linearize(xb, ub, spec.stage_params[:1], params,
                             ocp.dt, 1)
    A = np.asarray(A[0], np.float64)[:14, :14]
    B = np.asarray(B[0], np.float64)[:14]
    dtw = float(spec.dt)
    Q = dtw * np.asarray(spec.Q, np.float64)[:14, :14]
    R = dtw * np.asarray(spec.R, np.float64)
    P = Qt[:14, :14]
    K = scipy.linalg.solve(R + B.T @ P @ B, B.T @ P @ A)
    resid = A.T @ P @ A - P - A.T @ P @ B @ K + Q
    assert np.abs(resid).max() < 1e-4 * max(1.0, np.abs(P).max())
    # the implied closed loop is a contraction
    rho = np.abs(np.linalg.eigvals(A - B @ K)).max()
    assert rho < 1.0


@pytest.mark.slow
def test_lqr_terminal_stabilizes_short_horizon_offset_free():
    """The r5 headline measurement: at N=12 the sim-preset offset-free
    loop limit-cycles with the preset's 10x terminal weight (~1.5 m) and
    SETTLES with the DARE cost-to-go terminal (~0.08 m, eq ~ 1e-9)."""
    from mpc_blaster_tpu.sim.scenarios import offset_free_loop

    preset = cfg.simulation_preset()
    ocp = _sim_ocp(12)
    spec = build_spec(ocp, yref=preset.loop.yref, dtype=jnp.float32)
    wind = jnp.asarray([0.7, -0.5, 0.2], jnp.float32)
    x0 = jnp.zeros(cfg.NX, jnp.float32).at[2].set(3.0)
    target = np.asarray(spec.yref_x[0, 0:3])

    def settle(spec_used):
        res = jax.jit(lambda s, x: offset_free_loop(
            s, ocp, x, wind, n_steps=250))(spec_used, x0)
        xs = np.asarray(res.xs)
        assert np.isfinite(xs).all()
        return np.linalg.norm(xs[-1, 0:3] - target)

    err_preset = settle(spec)
    err_lqr = settle(spec._replace(Q_t=lqr_terminal_weight(ocp, spec)))
    assert err_preset > 0.5, err_preset       # the hunt (documented)
    assert err_lqr < 0.15, err_lqr            # the fix
