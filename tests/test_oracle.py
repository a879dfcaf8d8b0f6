"""Independent correctness oracle for the NMPC (VERDICT r1 item 2).

acados/casadi are not installed in this image, so the reference controller
cannot be executed directly. This module builds the oracle the other way:
the exact NLP the controller solves (`simulation_blaster.py:56-107`
semantics — LINEAR_LS cost, RK4 shooting, box bounds on states AND
controls) is solved by an INDEPENDENT optimizer (scipy SLSQP on the
single-shooting reduction: control bounds as variable bounds, state boxes
as nonlinear inequality constraints, exact JAX f64 gradients/Jacobians),
and the framework's converged SQP iterate must match it.

The state-box constraints are NOT optional: the reference's omega bound is
a tight +-0.0873 rad/s (`simulation_blaster.py:28-30`) and is active even
for mild setpoint changes (verified: the unconstrained-state optimum
swings omega to ~2 rad/s).

Tolerance targets mirror the acados JSON (`nlp_solver_tol_* = 1e-6`) and
the BASELINE.md north star (controls match <= 1e-3). Note the BLASTER cost
leaves the gimbal chain nearly unpenalized (R_swivel = 1e-5,
`simulation_blaster.py:27`), so gimbal-rate components are weakly
determined (CLAUDE.md); scenario (a) therefore compares thrusts + the
objective, and scenario (b) re-runs with a well-posed R to pin ALL
controls to <= 1e-3.
"""
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.optimize import minimize

from mpc_blaster_tpu import config as cfg
from mpc_blaster_tpu.dynamics.blaster import BlasterParams, blaster_ode
from mpc_blaster_tpu.dynamics.integrators import discrete_dynamics
from mpc_blaster_tpu.ocp.spec import build_spec, total_cost
from mpc_blaster_tpu.sqp.rti import init_rti_state, sqp_solve

DTYPE = jnp.float64
N = 8


def _make_problem(r_swivel=None, ubu_thrust=None, yref_z=3.5,
                  yref_poc_x=0.2):
    preset = cfg.simulation_preset()
    ocp = dataclasses.replace(preset.ocp, N=N, Tf=N / 30.0)
    if r_swivel is not None:
        r = list(ocp.cost.r_diag)
        r[4] = r[5] = r_swivel
        ocp = dataclasses.replace(
            ocp, cost=dataclasses.replace(ocp.cost, r_diag=tuple(r)))
    if ubu_thrust is not None:
        ubu = (ubu_thrust,) * 4 + tuple(ocp.bounds.ubu[4:])
        ocp = dataclasses.replace(
            ocp, bounds=dataclasses.replace(ocp.bounds, ubu=ubu))
    yref = np.zeros(cfg.NY)
    yref[2] = yref_z
    yref[14] = yref_poc_x
    spec = build_spec(ocp, yref=yref, dtype=DTYPE)
    params = BlasterParams.from_config(ocp.model, DTYPE)
    F = discrete_dynamics(blaster_ode, ocp.dt, num_steps=1)
    return ocp, spec, params, F


def _rollout(spec, params, F, x0, us):
    def step(x, u):
        xn = F(x, u, spec.stage_params[0], params)
        return xn, xn
    _, xs = jax.lax.scan(step, x0, us)
    return jnp.concatenate([x0[None], xs], axis=0)


def _oracle_solve(spec, params, F, x0, u_init, ftol=1e-12):
    """scipy SLSQP on the single-shooting NLP: control bounds as variable
    bounds, state boxes as inequality constraints, exact JAX grad/jac."""
    nu = cfg.NU

    @jax.jit
    def val_and_grad(u_flat):
        return jax.value_and_grad(
            lambda u: total_cost(spec, _rollout(spec, params, F, x0,
                                                u.reshape(N, nu)),
                                 u.reshape(N, nu)))(u_flat)

    def fun(u_flat):
        v, g = val_and_grad(jnp.asarray(u_flat))
        return float(v), np.asarray(g)

    def _cons(u_flat):
        xs = _rollout(spec, params, F, x0, u_flat.reshape(N, nu))[1:]
        return jnp.concatenate([(xs - spec.lbx).ravel(),
                                (spec.ubx - xs).ravel()])

    cons_jit = jax.jit(_cons)
    cons_jac = jax.jit(jax.jacfwd(_cons))
    constraints = [{
        "type": "ineq",
        "fun": lambda u: np.asarray(cons_jit(jnp.asarray(u))),
        "jac": lambda u: np.asarray(cons_jac(jnp.asarray(u))),
    }]

    bounds = [(float(spec.lbu[i]), float(spec.ubu[i]))
              for _ in range(N) for i in range(cfg.NU)]
    # warm every jit BEFORE minimize: first-compiling XLA inside SLSQP's
    # C/Fortran callback frames overflows the C stack (observed SIGSEGV in
    # backend_compile_and_load)
    u0_flat = np.asarray(u_init).ravel()
    fun(u0_flat)
    constraints[0]["fun"](u0_flat)
    constraints[0]["jac"](u0_flat)
    res = minimize(fun, u0_flat, jac=True,
                   method="SLSQP", bounds=bounds, constraints=constraints,
                   options={"maxiter": 600, "ftol": ftol})
    assert res.success, res.message
    us = jnp.asarray(res.x.reshape(N, cfg.NU), DTYPE)
    xs = _rollout(spec, params, F, x0, us)
    # the oracle itself must satisfy the state boxes it claims to enforce
    assert float(jnp.min(_cons(jnp.asarray(res.x)))) > -1e-6
    return xs, us, res.fun


def _sqp_fixed_point(ocp, spec, params, F, x0, iters=40):
    state = init_rti_state(ocp, x0, DTYPE)
    state, step_norms = sqp_solve(spec, state, x0, params, F, ocp.solver,
                                  iters=iters)
    return state, np.asarray(step_norms)


@pytest.mark.slow
def test_oracle_hover_nlp():
    """(a) Hover OCP, reference cost: thrusts match <= 1e-3, objective to
    1e-6 relative (gimbal rates are in the R_swivel=1e-5 flat subspace)."""
    ocp, spec, params, F = _make_problem()
    x0 = jnp.zeros(cfg.NX, DTYPE).at[0].set(0.1).at[1].set(-0.1) \
        .at[2].set(3.3)
    state, step_norms = _sqp_fixed_point(ocp, spec, params, F, x0)
    assert step_norms[-1] < 1e-7, step_norms[-5:]

    xs_o, us_o, f_o = _oracle_solve(spec, params, F, x0, state.ubar)

    np.testing.assert_allclose(np.asarray(state.ubar)[:, :4],
                               np.asarray(us_o)[:, :4], atol=1e-3)
    f_rti = float(total_cost(spec, state.xbar, state.ubar))
    # multiple-shooting defects vanish at the SQP fixed point, so the
    # single-shooting objective is directly comparable
    assert abs(f_rti - f_o) <= 1e-6 * max(1.0, abs(f_o)), (f_rti, f_o)


@pytest.mark.slow
def test_oracle_well_posed_all_controls():
    """(b) Same NLP with a well-posed R_swivel: EVERY control component of
    the converged SQP matches the independent optimizer <= 1e-3."""
    ocp, spec, params, F = _make_problem(r_swivel=1e-1)
    x0 = jnp.zeros(cfg.NX, DTYPE).at[2].set(3.2).at[6].set(0.2)
    state, step_norms = _sqp_fixed_point(ocp, spec, params, F, x0)
    assert step_norms[-1] < 1e-7

    xs_o, us_o, f_o = _oracle_solve(spec, params, F, x0, state.ubar)
    np.testing.assert_allclose(np.asarray(state.ubar), np.asarray(us_o),
                               atol=1e-3)


@pytest.mark.slow
def test_oracle_active_control_bounds():
    """(c) Thrust saturation: ubu barely above hover forces the upper
    control bound active during the climb; the constrained optimum must
    still match (this exercises the IPM's active-set identification against
    SLSQP's)."""
    hover = 9.0 * 9.81 / 4.0
    # r_swivel=1e1 (the flight preset's value, `mavros_blaster_sim.py:45`):
    # with thrust margin this tight the optimizer vectors the hard-coded
    # blast force via the gimbal, and light gimbal damping lets full-step
    # SQP limit-cycle between bang-bang patterns (step norm pinned at the
    # rate-box width). The strongly-damped flight weighting is the
    # reference configuration where thrust saturation is well-posed.
    ocp, spec, params, F = _make_problem(r_swivel=1e1,
                                         ubu_thrust=hover + 1.5,
                                         yref_poc_x=0.0)
    x0 = jnp.zeros(cfg.NX, DTYPE).at[2].set(3.3)
    state, step_norms = _sqp_fixed_point(ocp, spec, params, F, x0)
    assert step_norms[-1] < 1e-6, step_norms[-5:]

    xs_o, us_o, f_o = _oracle_solve(spec, params, F, x0, state.ubar)
    # the bound must actually be active somewhere, or the scenario is vacuous
    assert (np.asarray(us_o)[:, :4] > hover + 1.5 - 1e-6).any()
    np.testing.assert_allclose(np.asarray(state.ubar), np.asarray(us_o),
                               atol=1e-3)


@pytest.mark.slow
def test_oracle_closed_loop():
    """(d) closed loop: converged-SQP MPC vs oracle MPC (scipy solved per
    tick). Same plant, same x0 — trajectories must agree to <= 1e-3 in
    position/velocity throughout. 8 ticks cover the active transient (the
    20-tick variant added 11 CPU-minutes and no new activity pattern:
    bounds go inactive after ~tick 6)."""
    ocp, spec, params, F = _make_problem(r_swivel=1e-1)
    n_ticks = 8
    x_rti = jnp.zeros(cfg.NX, DTYPE).at[2].set(3.25).at[0].set(0.05)
    x_orc = x_rti
    state = init_rti_state(ocp, x_rti, DTYPE)
    u_prev = state.ubar

    xs_rti, xs_orc = [np.asarray(x_rti)], [np.asarray(x_orc)]
    for _ in range(n_ticks):
        state, _ = sqp_solve(spec, state, x_rti, params, F, ocp.solver,
                             iters=25)
        u_rti = state.ubar[0]
        x_rti = F(x_rti, u_rti, spec.stage_params[0], params)
        xs_rti.append(np.asarray(x_rti))

        # ftol 1e-10 -> control accuracy ~3e-5 on the r_swivel=1e-1
        # problem, 30x under the 1e-3 assertion; ~1.5x faster per tick.
        _, us_o, _ = _oracle_solve(spec, params, F, x_orc, u_prev,
                                   ftol=1e-10)
        u_prev = us_o
        x_orc = F(x_orc, us_o[0], spec.stage_params[0], params)
        xs_orc.append(np.asarray(x_orc))

    xs_rti = np.stack(xs_rti)
    xs_orc = np.stack(xs_orc)
    np.testing.assert_allclose(xs_rti[:, 0:9], xs_orc[:, 0:9], atol=1e-3)


@pytest.mark.slow
def test_oracle_flagship_n60_poc_params():
    """(e, r5) THE FLAGSHIP CONFIG: native N=60 simulation preset with
    NONZERO POC stage parameters (the jet solver's Jacobians, exactly
    what `simulation_blaster.py:37-39,67` feeds acados). Converged SQP
    vs independent SLSQP: thrusts <= 2e-3 (SLSQP's own accuracy at
    ftol=1e-12 on the 360-variable problem; measured 1.25e-3), objective
    to 1e-6 relative."""
    from mpc_blaster_tpu.sim.closedloop import preset_stage_params

    preset = cfg.simulation_preset()
    ocp = preset.ocp  # native N=60, Tf=2.0
    sp = preset_stage_params(preset, DTYPE)
    spec = build_spec(ocp, yref=preset.loop.yref, stage_params=sp,
                      dtype=DTYPE)
    # the POC coupling must actually be exercised
    assert float(jnp.abs(spec.stage_params[0, :24]).max()) > 0.0
    params = BlasterParams.from_config(ocp.model, DTYPE)
    F = discrete_dynamics(blaster_ode, ocp.dt, num_steps=1)
    x0 = jnp.zeros(cfg.NX, DTYPE).at[0].set(0.1).at[2].set(3.3)
    state = init_rti_state(ocp, x0, DTYPE)
    state, step_norms = sqp_solve(spec, state, x0, params, F, ocp.solver,
                                  iters=30)
    assert np.asarray(step_norms)[-1] < 1e-5

    global N
    N_saved, N = N, ocp.N
    try:
        xs_o, us_o, f_o = _oracle_solve(spec, params, F, x0, state.ubar)
    finally:
        N = N_saved
    np.testing.assert_allclose(np.asarray(state.ubar)[:, :4],
                               np.asarray(us_o)[:, :4], atol=2e-3)
    f_rti = float(total_cost(spec, state.xbar, state.ubar))
    assert abs(f_rti - f_o) <= 1e-6 * max(1.0, abs(f_o)), (f_rti, f_o)


@pytest.mark.slow
def test_oracle_soft_bounds():
    """(f, r5) SOFT bounds (acados ns>0): velocity box tightened to
    +-0.25 so the optimum VIOLATES it, softened with a pure-L2 penalty
    (Z=1e3). The rti_step_soft fixed point must match SLSQP on the
    penalized NLP (soft rows removed from the hard constraints, their
    quadratic penalty added to the objective) from an INDEPENDENT
    perturbed start. Measured: fixed-point eq ~4e-31, viol 0.17 (soft
    genuinely active), SLSQP nit ~99, control diff 9.4e-5."""
    from mpc_blaster_tpu.qp.soft import SoftBounds
    from mpc_blaster_tpu.sqp.rti import rti_step_soft

    preset = cfg.simulation_preset()
    b = preset.ocp.bounds
    tight = dataclasses.replace(
        b, lbx=b.lbx[:6] + (-0.25, -0.25, -0.25) + b.lbx[9:],
        ubx=b.ubx[:6] + (0.25, 0.25, 0.25) + b.ubx[9:])
    r = list(preset.ocp.cost.r_diag)
    r[4] = r[5] = 1e-1  # well-posed gimbal (same convention as (b))
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
            _, st, _, _ = rti_step_soft(spec, st, x0, params, F,
                                        ocp.solver, soft)
            return st, 0
        st, _ = jax.lax.scan(body, st, None, length=60)
        return st

    st = fixed_point(init_rti_state(ocp, x0, DTYPE))
    _, st, diag, res = rti_step_soft(spec, st, x0, params, F, ocp.solver,
                                     soft)
    assert float(diag.qp_kkt_eq) < 1e-8
    viol = float(np.asarray(res.t_lx).max() + np.asarray(res.t_ux).max())
    assert viol > 0.05, "soft bounds not active; scenario vacuous"

    def penalty(xs, us):
        v = xs[1:, 6:9]
        lo = jnp.maximum(spec.lbx[6:9] - v, 0.0)
        hi = jnp.maximum(v - spec.ubx[6:9], 0.0)
        return 0.5 * Z * (jnp.sum(lo ** 2) + jnp.sum(hi ** 2))

    # independent start: hover init + deterministic perturbation
    rng = np.random.default_rng(3)
    u_init = (np.asarray(init_rti_state(ocp, x0, DTYPE).ubar)
              + rng.uniform(-0.5, 0.5, (N, cfg.NU)))
    us_o, f_o = _oracle_soft_solve(spec, params, F, x0, u_init,
                                   penalty, soft_rows=(6, 7, 8))
    np.testing.assert_allclose(np.asarray(st.ubar), np.asarray(us_o),
                               atol=1e-3)


def _oracle_soft_solve(spec, params, F, x0, u_init, penalty, soft_rows):
    """SLSQP on the PENALIZED single-shooting NLP: soft rows leave the
    hard constraint set and enter the objective as their L2 penalty."""
    nu = cfg.NU

    def cost(u_flat):
        us = u_flat.reshape(N, nu)
        xs = _rollout(spec, params, F, x0, us)
        return total_cost(spec, xs, us) + penalty(xs, us)

    vg = jax.jit(jax.value_and_grad(cost))

    def fun(u_flat):
        v, g = vg(jnp.asarray(u_flat))
        return float(v), np.asarray(g)

    hard = np.array([i for i in range(cfg.NX) if i not in set(soft_rows)])

    def _cons(u_flat):
        xs = _rollout(spec, params, F, x0, u_flat.reshape(N, nu))[1:]
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
    assert res.success, res.message
    return jnp.asarray(res.x.reshape(N, cfg.NU), DTYPE), res.fun


def test_rti_step_is_one_exact_gauss_newton_step():
    """Pin the acados SQP-RTI single-iteration semantics EXPLICITLY
    (`blastermodel.py:278`, `nlp_solver_step_length=1.0`): one rti_step
    from a retained iterate equals one full Gauss-Newton step computed
    by hand — linearize the dynamics, assemble the LINEAR_LS QP, solve
    the equality-constrained KKT system densely in numpy f64, take the
    full step. Bounds are kept inactive so the hand-rolled system needs
    no active-set logic; the IPM must converge to the same stationary
    point.
    """
    import dataclasses
    import numpy.linalg as npl
    from mpc_blaster_tpu.dynamics.blaster import BlasterParams, blaster_ode
    from mpc_blaster_tpu.dynamics.integrators import discrete_dynamics
    from mpc_blaster_tpu.ocp.spec import build_spec
    from mpc_blaster_tpu.sqp.rti import build_qp, init_rti_state, rti_step

    DT = jnp.float64
    preset = cfg.simulation_preset()
    # widen every box so no bound is active at the mild test state
    wide = cfg.BoundsConfig(lbx=tuple([-1e4] * cfg.NX),
                            ubx=tuple([1e4] * cfg.NX),
                            lbu=tuple([-1e4] * cfg.NU),
                            ubu=tuple([1e4] * cfg.NU))
    ocp = dataclasses.replace(preset.ocp, N=6, Tf=0.2, bounds=wide,
                              solver=dataclasses.replace(
                                  preset.ocp.solver, ipm_iters=30))
    spec = build_spec(ocp, yref=preset.loop.yref, dtype=DT)
    params = BlasterParams.from_config(ocp.model, DT)
    F = discrete_dynamics(blaster_ode, ocp.dt, num_steps=1)
    x0 = jnp.zeros(cfg.NX, DT).at[2].set(3.3).at[0].set(0.05)
    state = init_rti_state(ocp, x0, DT)

    # --- the framework's tick ---
    u0, new_state, diag = rti_step(spec, state, x0, params, F, ocp.solver)

    # --- hand-rolled single GN step: dense equality-constrained KKT ---
    qp = build_qp(spec, state, x0, F, params)
    N, nx, nu = ocp.N, cfg.NX, cfg.NU
    nz = (N + 1) * nx + N * nu     # decision: all dx, all du
    nc = (N + 1) * nx              # constraints: dx0 pin + N dynamics rows
    H = np.zeros((nz, nz))
    g = np.zeros(nz)
    A = np.asarray(qp.A)
    B = np.asarray(qp.B)

    def xi(k):
        return slice(k * nx, (k + 1) * nx)

    def ui(k):
        return slice((N + 1) * nx + k * nu, (N + 1) * nx + (k + 1) * nu)

    for k in range(N + 1):
        H[xi(k), xi(k)] = np.asarray(qp.Q[k])
        g[xi(k)] = np.asarray(qp.q[k])
    for k in range(N):
        H[ui(k), ui(k)] = np.asarray(qp.R[k])
        g[ui(k)] = np.asarray(qp.r[k])
    C = np.zeros((nc, nz))
    b = np.zeros(nc)
    C[0:nx, xi(0)] = np.eye(nx)
    b[0:nx] = np.asarray(qp.dx0)
    for k in range(N):
        r = slice((k + 1) * nx, (k + 2) * nx)
        C[r, xi(k)] = A[k]
        C[r, ui(k)] = B[k]
        C[r, xi(k + 1)] = -np.eye(nx)
        b[r] = -np.asarray(qp.c[k])
    KKT = np.block([[H, C.T], [C, np.zeros((nc, nc))]])
    rhs = np.concatenate([-g, b])
    sol = npl.solve(KKT, rhs)
    dx_ref = sol[: (N + 1) * nx].reshape(N + 1, nx)
    du_ref = sol[(N + 1) * nx: nz].reshape(N, nu)

    # full step (nlp_solver_step_length = 1.0): iterate + delta
    np.testing.assert_allclose(np.asarray(new_state.xbar),
                               np.asarray(state.xbar) + dx_ref, atol=1e-7)
    np.testing.assert_allclose(np.asarray(new_state.ubar),
                               np.asarray(state.ubar) + du_ref, atol=1e-6)
    np.testing.assert_allclose(np.asarray(u0),
                               np.asarray(state.ubar[0]) + du_ref[0],
                               atol=1e-6)
