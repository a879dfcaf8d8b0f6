"""r5 prototype: oracle extensions (VERDICT item 7) — runtime sizing.

(e) N=60 simulation preset with NONZERO POC stage params: converged SQP
    vs scipy SLSQP single-shooting.
(f) soft bounds (ns>0, pure-L2 velocity softening): rti_step_soft fixed
    point vs SLSQP on the penalized objective.
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from scipy.optimize import minimize

from mpc_blaster_tpu import config as cfg
from mpc_blaster_tpu.dynamics.blaster import BlasterParams, blaster_ode
from mpc_blaster_tpu.dynamics.integrators import discrete_dynamics
from mpc_blaster_tpu.ocp.spec import build_spec, total_cost
from mpc_blaster_tpu.sim.closedloop import preset_stage_params
from mpc_blaster_tpu.sqp.rti import init_rti_state, sqp_solve

DTYPE = jnp.float64


def rollout(spec, params, F, x0, us, N):
    def step(x, u):
        xn = F(x, u, spec.stage_params[0], params)
        return xn, xn
    _, xs = jax.lax.scan(step, x0, us)
    return jnp.concatenate([x0[None], xs], axis=0)


def oracle(spec, params, F, x0, u_init, N, extra_cost=None, soft_rows=()):
    nu = cfg.NU

    def cost(u_flat):
        us = u_flat.reshape(N, nu)
        xs = rollout(spec, params, F, x0, us, N)
        c = total_cost(spec, xs, us)
        if extra_cost is not None:
            c = c + extra_cost(xs, us)
        return c

    vg = jax.jit(jax.value_and_grad(cost))

    def fun(u_flat):
        v, g = vg(jnp.asarray(u_flat))
        return float(v), np.asarray(g)

    hard = np.array([i for i in range(cfg.NX) if i not in set(soft_rows)])

    def _cons(u_flat):
        xs = rollout(spec, params, F, x0, u_flat.reshape(N, nu), N)[1:]
        xs = xs[:, hard]
        return jnp.concatenate([(xs - spec.lbx[hard]).ravel(),
                                (spec.ubx[hard] - xs).ravel()])

    cons_jit = jax.jit(_cons)
    cons_jac = jax.jit(jax.jacfwd(_cons))
    constraints = [{
        "type": "ineq",
        "fun": lambda u: np.asarray(cons_jit(jnp.asarray(u))),
        "jac": lambda u: np.asarray(cons_jac(jnp.asarray(u))),
    }]
    bounds = [(float(spec.lbu[i]), float(spec.ubu[i]))
              for _ in range(N) for i in range(cfg.NU)]
    u0_flat = np.asarray(u_init).ravel()
    fun(u0_flat)
    constraints[0]["fun"](u0_flat)
    constraints[0]["jac"](u0_flat)
    res = minimize(fun, u0_flat, jac=True, method="SLSQP", bounds=bounds,
                   constraints=constraints,
                   options={"maxiter": 400, "ftol": 1e-12})
    print("  slsqp:", res.success, res.message, "nit", res.nit, flush=True)
    return res.x.reshape(N, cfg.NU), res.fun


def case_e():
    print("=== (e) N=60 sim preset + POC params", flush=True)
    t0 = time.time()
    preset = cfg.simulation_preset()
    ocp = preset.ocp  # native N=60
    sp = preset_stage_params(preset, DTYPE)
    spec = build_spec(ocp, yref=preset.loop.yref, stage_params=sp,
                      dtype=DTYPE)
    assert float(jnp.abs(spec.stage_params[0, :24]).max()) > 0.0
    params = BlasterParams.from_config(ocp.model, DTYPE)
    F = discrete_dynamics(blaster_ode, ocp.dt, num_steps=1)
    x0 = jnp.zeros(cfg.NX, DTYPE).at[0].set(0.1).at[2].set(3.3)
    st = init_rti_state(ocp, x0, DTYPE)
    st, norms = sqp_solve(spec, st, x0, params, F, ocp.solver, iters=30)
    print(f"  sqp done {time.time()-t0:.0f}s, last step norm "
          f"{np.asarray(norms)[-1]:.2e}", flush=True)
    us_o, f_o = oracle(spec, params, F, x0, st.ubar, ocp.N)
    f_rti = float(total_cost(spec, st.xbar, st.ubar))
    d_thrust = np.abs(np.asarray(st.ubar)[:, :4] - us_o[:, :4]).max()
    print(f"  thrust max diff {d_thrust:.2e}; obj rti {f_rti:.8f} vs "
          f"oracle {f_o:.8f} rel {(f_rti-f_o)/abs(f_o):.2e}; "
          f"total {time.time()-t0:.0f}s", flush=True)


def case_f():
    print("=== (f) soft velocity bounds", flush=True)
    from mpc_blaster_tpu.qp.soft import SoftBounds
    from mpc_blaster_tpu.sqp.rti import rti_step_soft

    t0 = time.time()
    preset = cfg.simulation_preset()
    N = 8
    b = preset.ocp.bounds
    tight = dataclasses.replace(
        b, lbx=b.lbx[:6] + (-0.25, -0.25, -0.25) + b.lbx[9:],
        ubx=b.ubx[:6] + (0.25, 0.25, 0.25) + b.ubx[9:])
    r = list(preset.ocp.cost.r_diag)
    r[4] = r[5] = 1e-1  # well-posed gimbal (oracle tests' convention)
    ocp = dataclasses.replace(
        preset.ocp, N=N, Tf=N / 30.0, bounds=tight,
        cost=dataclasses.replace(preset.ocp.cost, r_diag=tuple(r)),
        solver=dataclasses.replace(preset.ocp.solver, ipm_iters=25))
    spec = build_spec(ocp, yref=preset.loop.yref, dtype=DTYPE)
    params = BlasterParams.from_config(ocp.model, DTYPE)
    F = discrete_dynamics(blaster_ode, ocp.dt, num_steps=1)
    x0 = jnp.zeros(cfg.NX, DTYPE).at[2].set(2.9)
    Z = 1e3
    soft = SoftBounds.state_bounds(N, cfg.NX, cfg.NU, Zl=Z, zl=0.0,
                                   idx=[6, 7, 8], dtype=DTYPE)

    @jax.jit
    def fixed_point(st):
        def body(st, _):
            _, st, diag, res = rti_step_soft(spec, st, x0, params, F,
                                             ocp.solver, soft)
            return st, 0
        st, _ = jax.lax.scan(body, st, None, length=60)
        return st

    st = fixed_point(init_rti_state(ocp, x0, DTYPE))
    _, st, diag, res = rti_step_soft(spec, st, x0, params, F,
                                     ocp.solver, soft)
    viol = float(np.asarray(res.t_lx).max() + np.asarray(res.t_ux).max())
    print(f"  soft SQP fixed point {time.time()-t0:.0f}s, "
          f"eq {float(diag.qp_kkt_eq):.2e}, viol {viol:.4f}", flush=True)

    def extra(xs, us):
        v = xs[1:, 6:9]
        lo = jnp.maximum(spec.lbx[6:9] - v, 0.0)
        hi = jnp.maximum(v - spec.ubx[6:9], 0.0)
        return 0.5 * Z * (jnp.sum(lo ** 2) + jnp.sum(hi ** 2))

    # independent start: hover init + deterministic perturbation, so
    # SLSQP must FIND the optimum rather than certify the SQP's point
    rng = np.random.default_rng(3)
    u_init = (np.asarray(init_rti_state(ocp, x0, DTYPE).ubar)
              + rng.uniform(-0.5, 0.5, (N, cfg.NU)))
    us_o, f_o = oracle(spec, params, F, x0, u_init, N,
                       extra_cost=extra, soft_rows=(6, 7, 8))
    d = np.abs(np.asarray(st.ubar) - us_o).max()
    d_thrust = np.abs(np.asarray(st.ubar)[:, :4] - us_o[:, :4]).max()
    print(f"  control max diff {d:.2e} (thrust {d_thrust:.2e}); "
          f"total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    case_f()
