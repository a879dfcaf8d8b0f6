"""r5 diagnosis 4: the sim-preset offset-free hunt is horizon-dependent
(N=20 hunts, N=30 settles to 5 mm at the same dt). Pin down:
  G deeper per-tick SQP at N=20 (2 and 3 RTI iterations per tick)
  H flight Q-weights at N=20 (isolate weights vs horizon)
  I N=24 (threshold)
  J native N=60 (the preset's own horizon)
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from mpc_blaster_tpu import config as cfg
from mpc_blaster_tpu.dynamics.blaster import BlasterParams
from mpc_blaster_tpu.dynamics.integrators import discrete_dynamics
from mpc_blaster_tpu.ocp.spec import build_spec
from mpc_blaster_tpu.sim.scenarios import (_windy_plant_ode, dist_param_ode)
from mpc_blaster_tpu.sqp.rti import init_rti_state, rti_step
from mpc_blaster_tpu.dynamics.fastlin import fast_linearize


def loop_k(ocp, yref, k_iters=1, gain=0.5, n_steps=250):
    """offset_free_loop clone with k RTI iterations per control tick."""
    dtype = jnp.float32
    params = BlasterParams.from_config(ocp.model, dtype)
    solver = ocp.solver
    F = discrete_dynamics(dist_param_ode, ocp.dt, num_steps=1)

    def lin(xbar, ubar, stage_params):
        return fast_linearize(xbar, ubar, stage_params, params,
                              ocp.dt, 1, family="blaster_dist")

    spec = build_spec(ocp, yref=yref, dtype=dtype)
    wind = jnp.asarray([0.7, -0.5, 0.2], dtype)
    x0 = jnp.zeros(cfg.NX, dtype).at[2].set(3.0)
    sp0 = jnp.concatenate(
        [spec.stage_params, jnp.zeros((spec.horizon, 6), dtype)], axis=1)
    plant_p = spec.stage_params[0].at[-1].set(2.2 * 9.81)
    F_plant = discrete_dynamics(
        lambda xx, uu, pp, par: _windy_plant_ode(xx, uu, pp, par, wind),
        ocp.dt, num_steps=1)
    st0 = init_rti_state(ocp, x0, dtype)
    d0 = jnp.zeros(6, dtype)

    def tick(carry, _):
        st, x, d_est, vw_pred = carry
        d_est = d_est.at[0:3].add(gain * (x[6:9] - vw_pred[0:3]) / ocp.dt)
        d_est = d_est.at[3:6].add(gain * (x[9:12] - vw_pred[3:6]) / ocp.dt)
        sp = sp0.at[:, 25:31].set(d_est[None, :])
        spec_t = spec._replace(stage_params=sp)
        u0 = None
        diag = None
        for _i in range(k_iters):
            u0, st, diag = rti_step(spec_t, st, x, params, F, solver,
                                    linearizer=lin)
        x_next = F_plant(x, u0, plant_p, params)
        pred = F(x, u0, sp[0], params)
        return (st, x_next, d_est, pred[6:12]), (x_next, diag.qp_kkt_eq)

    (_, _, _, _), (xs, eqs) = jax.lax.scan(
        tick, (st0, x0, d0, x0[6:12]), None, length=n_steps)
    xs = np.asarray(jnp.concatenate([x0[None], xs], axis=0))
    target = np.asarray(spec.yref_x[0, 0:3])
    err_t = np.linalg.norm(xs[:, 0:3] - target[None], axis=1)
    return (float(err_t[-1]), float(err_t[-50:].max()),
            float(np.asarray(eqs)[-50:].max()))


def main():
    sim = cfg.simulation_preset()
    yref = sim.loop.yref

    def mk(N, **kw):
        return dataclasses.replace(
            sim.ocp, N=N, Tf=N / 30.0,
            solver=dataclasses.replace(sim.ocp.solver,
                                       qp_backend="riccati", ipm_iters=8),
            **kw)

    def show(tag, ocp, k=1):
        f, tm, eq = loop_k(ocp, yref, k_iters=k)
        print(f"{tag:24s} final={f:.4f} tailmax={tm:.4f} eq={eq:.2e}",
              flush=True)

    show("N=20 k=1 (hunt)", mk(20))
    show("G N=20 k=2", mk(20), k=2)
    show("G N=20 k=3", mk(20), k=3)
    fcost = cfg.flight_preset().ocp.cost
    show("H N=20 flightQ", mk(20, cost=dataclasses.replace(
        sim.ocp.cost, q_diag=fcost.q_diag, qt_diag=fcost.qt_diag)))
    show("I N=24", mk(24))
    show("J N=60 native", mk(60))


if __name__ == "__main__":
    main()
