"""Square-root (array-form QR) Riccati core (`qp/sqrt_riccati.py`).

Checks: exact equivalence with the plain Riccati factorization/solve on
equality-only LQR data; f32 robustness on a barrier-modified system whose
plain-recursion solve is past f32 (the measured failure that motivated
the backend — see qp/condense.py's sqrt flag).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpc_blaster_tpu.qp.riccati import riccati_factorize, riccati_solve_rhs
from mpc_blaster_tpu.qp.smallalg import chol_factor
from mpc_blaster_tpu.qp.sqrt_riccati import sqrt_factorize, sqrt_solve_rhs

from test_qp import random_qp


def _cost_rows(Q, R):
    """Row factors C with C'C = blkdiag(R_k, Q_k) per stage ([u|x] cols)."""
    N, nx = Q.shape[0] - 1, Q.shape[-1]
    nu = R.shape[-1]
    Lq = chol_factor(Q[:-1])
    Lr = chol_factor(R)
    rows_q = jnp.concatenate(
        [jnp.zeros((N, nx, nu), Q.dtype), jnp.swapaxes(Lq, -1, -2)],
        axis=-1)
    rows_r = jnp.concatenate(
        [jnp.swapaxes(Lr, -1, -2), jnp.zeros((N, nu, nx), Q.dtype)],
        axis=-1)
    return jnp.concatenate([rows_r, rows_q], axis=-2)


def test_sqrt_matches_plain_riccati_f64():
    data = random_qp(N=10, nx=5, nu=3, seed=3)
    C = _cost_rows(data.Q, data.R)
    ZN = jnp.swapaxes(chol_factor(data.Q[-1]), -1, -2)
    fac_s = sqrt_factorize(data.A, data.B, C, ZN)
    fac_p = riccati_factorize(data.A, data.B, data.Q, data.R)
    np.testing.assert_allclose(np.asarray(fac_s.K), np.asarray(fac_p.K),
                               atol=1e-9)
    # P factors square to the plain value Hessians
    P_s = jnp.einsum("kji,kjl->kil", fac_s.Z, fac_s.Z)
    np.testing.assert_allclose(np.asarray(P_s), np.asarray(fac_p.P),
                               atol=1e-7)
    dx_s, du_s = sqrt_solve_rhs(fac_s, data.A, data.B, data.c, data.q,
                                data.r, data.dx0)
    dx_p, du_p = riccati_solve_rhs(fac_p, data.A, data.B, data.c, data.q,
                                   data.r, data.dx0)
    np.testing.assert_allclose(np.asarray(du_s), np.asarray(du_p),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(dx_s), np.asarray(dx_p),
                               atol=1e-9)


def test_box_qp_sqrt_backend_matches_scan():
    """box_qp_solve(riccati='sqrt') == the default backend in f64."""
    from mpc_blaster_tpu.qp.ipm import box_qp_solve

    data = random_qp(N=8, nx=4, nu=2, seed=5, bound_scale=1.0)
    ref = jax.jit(lambda d: box_qp_solve(d, iters=15))(data)
    sol = jax.jit(lambda d: box_qp_solve(d, iters=15,
                                         riccati="sqrt"))(data)
    np.testing.assert_allclose(np.asarray(sol.du), np.asarray(ref.du),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(sol.dx), np.asarray(ref.dx),
                               atol=1e-8)


@pytest.mark.slow
def test_box_qp_sqrt_backend_f32_accuracy():
    """On the blaster sim-preset cold-transient QP, the f32 'sqrt' backend
    must converge and be no less accurate than 'scan' (measured: ~21%
    smaller objective gap — for BOX-only QPs the plain path's directions
    are already usable and the remaining f32 error is RHS roundoff in the
    R_swivel=1e-5 flat subspace, which no factorization can remove; the
    decisive sqrt wins are the condensed dense-barrier case
    (test_condense) and the stiff-barrier unit test below)."""
    import dataclasses
    from mpc_blaster_tpu import config as cfg
    from mpc_blaster_tpu.dynamics.blaster import BlasterParams, blaster_ode
    from mpc_blaster_tpu.dynamics.integrators import discrete_dynamics
    from mpc_blaster_tpu.ocp.spec import build_spec
    from mpc_blaster_tpu.qp.data import qp_objective
    from mpc_blaster_tpu.qp.ipm import box_qp_solve
    from mpc_blaster_tpu.sqp.rti import build_qp, init_rti_state

    preset = cfg.simulation_preset()
    ocp = dataclasses.replace(preset.ocp, N=20, Tf=20 / 30.0)

    def first_qp(dtype):
        x0 = jnp.asarray(np.asarray(preset.loop.x0), dtype)
        spec = build_spec(ocp, yref=preset.loop.yref, dtype=dtype)
        params = BlasterParams.from_config(ocp.model, dtype)
        F = discrete_dynamics(blaster_ode, ocp.dt, num_steps=1)
        st = init_rti_state(ocp, x0, dtype)
        return jax.jit(build_qp, static_argnums=(3,))(spec, st, x0, F,
                                                      params)

    qp64, qp32 = first_qp(jnp.float64), first_qp(jnp.float32)
    ref = jax.jit(lambda d: box_qp_solve(d, iters=12))(qp64)
    o_ref = float(qp_objective(qp64, ref.dx, ref.du))

    def gap(riccati):
        s = jax.jit(lambda d: box_qp_solve(d, iters=12,
                                           riccati=riccati))(qp32)
        o = float(qp_objective(qp64, jnp.asarray(s.dx, jnp.float64),
                               jnp.asarray(s.du, jnp.float64)))
        return abs(o - o_ref), float(s.kkt_eq)

    g_scan, _ = gap("scan")
    g_sqrt, eq_sqrt = gap("sqrt")
    assert np.isfinite(g_sqrt)
    assert eq_sqrt < 1e-2
    assert g_sqrt < 1.05 * g_scan, (g_sqrt, g_scan)


def test_sqrt_f32_survives_stiff_barrier():
    """A dense rank-1 'barrier row' with weight 1e7 (the condensed IPM's
    G' sigma G situation): the plain recursion loses the Newton solve in
    f32 (residual O(1)); the sqrt form stays accurate."""
    rng = np.random.default_rng(7)
    data = random_qp(N=8, nx=4, nu=2, seed=9)
    g = jnp.asarray(rng.normal(size=(8, 2 + 4)))
    g = g / jnp.linalg.norm(g, axis=-1, keepdims=True)
    w = 1e7
    # modified cost: blkdiag(R, Q) + w g g'
    Rm = data.R + w * jnp.einsum("ki,kj->kij", g[:, :2], g[:, :2])
    Qm = data.Q.at[:-1].add(w * jnp.einsum("ki,kj->kij", g[:, 2:], g[:, 2:]))
    Sm = w * jnp.einsum("ki,kj->kij", g[:, :2], g[:, 2:])

    C = jnp.concatenate([_cost_rows(data.Q, data.R),
                         (np.sqrt(w) * g)[:, None, :]], axis=-2)
    ZN = jnp.swapaxes(chol_factor(data.Q[-1]), -1, -2)

    def solve(dtype, use_sqrt):
        cast = lambda a: jnp.asarray(a, dtype)
        if use_sqrt:
            fac = sqrt_factorize(cast(data.A), cast(data.B), cast(C),
                                 cast(ZN))
            return sqrt_solve_rhs(fac, cast(data.A), cast(data.B),
                                  cast(data.c), cast(data.q), cast(data.r),
                                  cast(data.dx0))
        fac = riccati_factorize(cast(data.A), cast(data.B), cast(Qm),
                                cast(Rm), S=cast(Sm))
        return riccati_solve_rhs(fac, cast(data.A), cast(data.B),
                                 cast(data.c), cast(data.q), cast(data.r),
                                 cast(data.dx0))

    dx64, du64 = solve(jnp.float64, False)
    scale = float(jnp.max(jnp.abs(du64)))
    _, du_sqrt32 = solve(jnp.float32, True)
    err_sqrt = float(jnp.max(jnp.abs(jnp.asarray(du_sqrt32, jnp.float64)
                                     - du64))) / scale
    _, du_plain32 = solve(jnp.float32, False)
    err_plain = float(jnp.max(jnp.abs(jnp.asarray(du_plain32, jnp.float64)
                                      - du64))) / scale
    assert err_sqrt < 1e-3, err_sqrt
    # document the failure mode the sqrt form exists to fix
    assert err_plain > 10 * err_sqrt, (err_plain, err_sqrt)
