"""r5 diagnosis 6: is the sim-preset N=20 offset-free hunt driven by
transient hard-QP infeasibility (plant state outside the box at x0)?

(a) track the plant's worst box violation + QP eq across the loop;
(b) run the same loop with SOFT state bounds (rti_step_soft) — if the
    hunt disappears, the r4 'gimbal subspace' story is replaced by the
    infeasibility story, and the shipped soft-bound solver is the fix.
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
from mpc_blaster_tpu.qp.soft import SoftBounds
from mpc_blaster_tpu.sim.scenarios import _windy_plant_ode, dist_param_ode
from mpc_blaster_tpu.sqp.rti import (init_rti_state, rti_step, rti_step_soft)
from mpc_blaster_tpu.dynamics.fastlin import fast_linearize


def loop(ocp, yref, soft=None, gain=0.5, n_steps=250, qt_override=None):
    dtype = jnp.float32
    params = BlasterParams.from_config(ocp.model, dtype)
    solver = ocp.solver
    F = discrete_dynamics(dist_param_ode, ocp.dt, num_steps=1)

    def lin(xbar, ubar, stage_params):
        return fast_linearize(xbar, ubar, stage_params, params,
                              ocp.dt, 1, family="blaster_dist")

    spec = build_spec(ocp, yref=yref, dtype=dtype)
    if qt_override is not None:
        spec = spec._replace(Q_t=jnp.asarray(qt_override, dtype))
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
    lbx = jnp.asarray(ocp.bounds.lbx, dtype)
    ubx = jnp.asarray(ocp.bounds.ubx, dtype)

    def tick(carry, _):
        st, x, d_est, vw_pred = carry
        d_est = d_est.at[0:3].add(gain * (x[6:9] - vw_pred[0:3]) / ocp.dt)
        d_est = d_est.at[3:6].add(gain * (x[9:12] - vw_pred[3:6]) / ocp.dt)
        sp = sp0.at[:, 25:31].set(d_est[None, :])
        spec_t = spec._replace(stage_params=sp)
        if soft is None:
            u0, st, diag = rti_step(spec_t, st, x, params, F, solver,
                                    linearizer=lin)
        else:
            u0, st, diag, _ = rti_step_soft(spec_t, st, x, params, F,
                                            solver, soft, linearizer=lin)
        x_next = F_plant(x, u0, plant_p, params)
        pred = F(x, u0, sp[0], params)
        # plant box violation at the NEXT measured state
        viol = jnp.maximum(jnp.max(jnp.maximum(lbx - x_next,
                                               x_next - ubx)), 0.0)
        return (st, x_next, d_est, pred[6:12]), (x_next, diag.qp_kkt_eq,
                                                 viol)

    (_, _, _, _), (xs, eqs, viols) = jax.lax.scan(
        tick, (st0, x0, d0, x0[6:12]), None, length=n_steps)
    xs = np.asarray(jnp.concatenate([x0[None], xs], axis=0))
    target = np.asarray(spec.yref_x[0, 0:3])
    err_t = np.linalg.norm(xs[:, 0:3] - target[None], axis=1)
    return err_t, np.asarray(eqs), np.asarray(viols)


def main():
    sim = cfg.simulation_preset()
    n = 20
    ocp = dataclasses.replace(
        sim.ocp, N=n, Tf=n / 30.0,
        solver=dataclasses.replace(sim.ocp.solver,
                                   qp_backend="riccati", ipm_iters=8))
    err, eq, viol = loop(ocp, sim.loop.yref)
    print(f"hard: final={err[-1]:.4f} tailmax={err[-50:].max():.4f}")
    print(f"  plant viol: max={viol.max():.4f} "
          f"n_ticks_infeasible={(viol > 1e-6).sum()}/{len(viol)} "
          f"first={np.argmax(viol > 1e-6)}")
    print(f"  eq: max={eq.max():.2e} "
          f"n_ticks_eq>0.01={(eq > 0.01).sum()}", flush=True)
    corr = np.corrcoef((viol > 1e-6).astype(float), (eq > 1e-2))[0, 1]
    print(f"  viol/eq-bad correlation: {corr:.2f}")

    soft = SoftBounds.state_bounds(n, cfg.NX, cfg.NU, Zl=1e4, zl=1e3)
    err, eq, viol = loop(ocp, sim.loop.yref, soft=soft)
    print(f"soft: final={err[-1]:.4f} tailmax={err[-50:].max():.4f}")
    print(f"  plant viol: max={viol.max():.4f} "
          f"n={(viol > 1e-6).sum()}  eq max={eq.max():.2e}", flush=True)


if __name__ == "__main__":
    main()
