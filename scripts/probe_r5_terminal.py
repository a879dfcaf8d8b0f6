"""r5 diagnosis 5: LQR terminal cost (DARE cost-to-go at the hover
equilibrium) vs the sim preset's arbitrary 10x terminal weight, at the
unstable N=20 horizon.

MPC stability theory: with terminal cost == the unconstrained
infinite-horizon cost-to-go, the closed loop is stabilizing for any
horizon where the tail is constraint-inactive. The sim preset's
qt = 10 * q * 10 is NOT a cost-to-go, and N=20 (0.667 s) hunts while
N>=24 settles.

POC rows: with zero POC Jacobians the poc states are pure integrators
with zero dynamics (A_poc = I... actually A_poc = I only in poc; here
poc_{k+1} = poc_k, eigenvalue 1, uncontrollable) — drop them from the
DARE and keep the preset's terminal diagonal for those rows.
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import scipy.linalg

from mpc_blaster_tpu import config as cfg
from mpc_blaster_tpu.dynamics.blaster import BlasterParams
from mpc_blaster_tpu.dynamics.fastlin import fast_linearize
from mpc_blaster_tpu.ocp.spec import build_spec
from mpc_blaster_tpu.sim.scenarios import offset_free_loop


def lqr_terminal(ocp, spec):
    params = BlasterParams.from_config(ocp.model, jnp.float64)
    x_eq = np.zeros(cfg.NX)
    x_eq[0:3] = np.asarray(spec.yref_x[0, 0:3])
    tb = float(spec.stage_params[0, -1])
    m, g = ocp.model.mass, ocp.model.gravity
    t_each = (m * g - tb) / 4.0
    u_eq = np.zeros(cfg.NU)
    u_eq[0:4] = t_each
    xb = jnp.asarray(np.tile(x_eq, (2, 1)))
    ub = jnp.asarray(u_eq[None])
    sp = jnp.asarray(np.asarray(spec.stage_params[:1], np.float64))
    _, A, B = fast_linearize(xb.astype(jnp.float64), ub.astype(jnp.float64),
                             sp, params, ocp.dt, 1)
    A = np.asarray(A[0], np.float64)
    B = np.asarray(B[0], np.float64)
    keep = list(range(14))  # drop poc rows 14:17 (uncontrollable, J=0)
    Ak = A[np.ix_(keep, keep)]
    Bk = B[keep]
    dtw = ocp.dt
    Qk = dtw * np.asarray(spec.Q, np.float64)[np.ix_(keep, keep)]
    Rk = dtw * np.asarray(spec.R, np.float64)
    P = scipy.linalg.solve_discrete_are(Ak, Bk, Qk, Rk)
    Qt = np.asarray(spec.Q_t, np.float64).copy()
    Qt[np.ix_(keep, keep)] = P
    return jnp.asarray(Qt, jnp.float32)


def run(ocp, spec, n_steps=250, gain=0.5):
    wind = jnp.asarray([0.7, -0.5, 0.2], jnp.float32)
    x0 = jnp.zeros(cfg.NX, jnp.float32).at[2].set(3.0)
    target = np.asarray(spec.yref_x[0, 0:3])
    res = jax.jit(lambda s, x: offset_free_loop(
        s, ocp, x, wind, n_steps=n_steps, observer_gain=gain))(spec, x0)
    xs = np.asarray(res.xs)
    err_t = np.linalg.norm(xs[:, 0:3] - target[None], axis=1)
    return (float(err_t[-1]), float(err_t[-50:].max()),
            float(np.asarray(res.kkt_eq)[-50:].max()))


def main():
    sim = cfg.simulation_preset()
    for n in (20, 12, 10):
        ocp = dataclasses.replace(
            sim.ocp, N=n, Tf=n / 30.0,
            solver=dataclasses.replace(sim.ocp.solver,
                                       qp_backend="riccati", ipm_iters=8))
        spec = build_spec(ocp, yref=sim.loop.yref, dtype=jnp.float32)
        f, tm, eq = run(ocp, spec)
        print(f"N={n} preset-Qt   final={f:.4f} tailmax={tm:.4f} "
              f"eq={eq:.2e}", flush=True)
        Qt = lqr_terminal(ocp, spec)
        print(f"  LQR Qt diag range: {float(jnp.diagonal(Qt).min()):.3g} "
              f"{float(jnp.diagonal(Qt).max()):.3g}", flush=True)
        spec_l = spec._replace(Q_t=Qt)
        f, tm, eq = run(ocp, spec_l)
        print(f"N={n} LQR-Qt      final={f:.4f} tailmax={tm:.4f} "
              f"eq={eq:.2e}", flush=True)


if __name__ == "__main__":
    main()
