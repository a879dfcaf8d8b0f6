"""Pallas fused-IPM kernel vs the XLA reference (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpc_blaster_tpu.qp.ipm import box_qp_solve
from mpc_blaster_tpu.ops.pallas_ipm import pallas_box_qp_solve


def _blaster_qps(B=4, N=8):
    """Realistic linearized BLASTER QPs at different states."""
    from mpc_blaster_tpu import config as cfg
    from mpc_blaster_tpu.dynamics.blaster import BlasterParams, blaster_ode
    from mpc_blaster_tpu.dynamics.integrators import discrete_dynamics
    from mpc_blaster_tpu.ocp.spec import build_spec
    from mpc_blaster_tpu.sqp.rti import build_qp, init_rti_state
    import dataclasses

    preset = cfg.simulation_preset()
    ocp = dataclasses.replace(preset.ocp, N=N, Tf=N / 30.0)
    spec = build_spec(ocp, yref=np.asarray(preset.loop.yref),
                      dtype=jnp.float32)
    params = BlasterParams.from_config(ocp.model, jnp.float32)
    F = discrete_dynamics(blaster_ode, ocp.dt, num_steps=1)
    rng = np.random.default_rng(0)
    qps = []
    for i in range(B):
        x0 = np.zeros(cfg.NX, np.float32)
        x0[0:3] = rng.uniform(-0.4, 0.4, 3)
        x0[2] = rng.uniform(1.5, 3.4)
        st = init_rti_state(ocp, jnp.asarray(x0), jnp.float32)
        qps.append(build_qp(spec, st, jnp.asarray(x0), F, params))
    return jax.tree.map(lambda *xs: jnp.stack(xs), *qps)


def test_pallas_ipm_matches_xla_interpret():
    from mpc_blaster_tpu.qp.data import qp_objective
    data = _blaster_qps(B=4, N=8)
    sol_p = pallas_box_qp_solve(data, iters=10, interpret=True)
    sol_x = jax.vmap(lambda d: box_qp_solve(d, iters=10))(data)
    du_p = np.asarray(sol_p.du)
    assert np.isfinite(du_p).all()
    # Both solvers park at similar KKT quality; on transient QPs with
    # saturated bounds the flat subspace leaves du weakly determined, so
    # the meaningful equivalence is objective value + feasibility.
    for i in range(4):
        d_i = jax.tree.map(lambda x: x[i], data)
        op = float(qp_objective(d_i, sol_p.dx[i], sol_p.du[i]))
        ox = float(qp_objective(d_i, sol_x.dx[i], sol_x.du[i]))
        scale = max(abs(ox), 1.0)
        assert abs(op - ox) / scale < 1.2e-2, (i, op, ox)
    assert np.asarray(sol_p.kkt_eq).max() < 1e-2
    assert np.asarray(sol_p.kkt_stat).max() < 1.0


def test_pallas_ipm_respects_bounds_interpret():
    data = _blaster_qps(B=2, N=8)
    sol = pallas_box_qp_solve(data, iters=10, interpret=True)
    du = np.asarray(sol.du)
    lbu = np.asarray(data.lbu)
    ubu = np.asarray(data.ubu)
    assert (du >= lbu - 1e-4).all()
    assert (du <= ubu + 1e-4).all()


def test_pallas_ipm_stream_matches_resident_interpret():
    """HBM-streamed P (large-N mode) is numerically identical to the
    VMEM-resident mode."""
    data = _blaster_qps(B=2, N=8)
    a = pallas_box_qp_solve(data, iters=8, interpret=True, stream_p=False)
    b = pallas_box_qp_solve(data, iters=8, interpret=True, stream_p=True)
    np.testing.assert_allclose(np.asarray(a.du), np.asarray(b.du),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.dx), np.asarray(b.dx),
                               atol=1e-6)
