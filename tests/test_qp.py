"""QP layer: Riccati vs dense KKT; IPM optimality via KKT conditions + scipy."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpc_blaster_tpu.qp.data import QPData, qp_objective
from mpc_blaster_tpu.qp.riccati import lqr_solve, lqr_kkt_residuals
from mpc_blaster_tpu.qp.ipm import box_qp_solve


def random_qp(N=8, nx=5, nu=3, seed=0, bound_scale=np.inf):
    rng = np.random.default_rng(seed)
    A = rng.uniform(-0.5, 0.5, (N, nx, nx)) + np.eye(nx) * 0.8
    B = rng.uniform(-0.5, 0.5, (N, nx, nu))
    c = rng.uniform(-0.1, 0.1, (N, nx))

    def spd(n, scale):
        M = rng.uniform(-1, 1, (n, n))
        return M @ M.T + scale * np.eye(n)
    Q = np.stack([spd(nx, 1.0) for _ in range(N + 1)])
    R = np.stack([spd(nu, 1.0) for _ in range(N)])
    q = rng.uniform(-1, 1, (N + 1, nx))
    r = rng.uniform(-1, 1, (N, nu))
    dx0 = rng.uniform(-0.3, 0.3, nx)

    lbx = np.full((N + 1, nx), -bound_scale)
    ubx = np.full((N + 1, nx), bound_scale)
    lbu = np.full((N, nu), -bound_scale)
    ubu = np.full((N, nu), bound_scale)
    return QPData(*[jnp.asarray(v) for v in
                    (A, B, c, Q, q, R, r, lbx, ubx, lbu, ubu, dx0)])


def dense_equality_solve(data: QPData):
    """Reference: assemble the full KKT system in numpy and solve directly."""
    N, nx, nu = data.horizon, data.nx, data.nu
    nz = (N + 1) * nx + N * nu
    H = np.zeros((nz, nz))
    g = np.zeros(nz)
    for k in range(N + 1):
        H[k * nx:(k + 1) * nx, k * nx:(k + 1) * nx] = np.asarray(data.Q[k])
        g[k * nx:(k + 1) * nx] = np.asarray(data.q[k])
    off = (N + 1) * nx
    for k in range(N):
        H[off + k * nu:off + (k + 1) * nu, off + k * nu:off + (k + 1) * nu] = \
            np.asarray(data.R[k])
        g[off + k * nu:off + (k + 1) * nu] = np.asarray(data.r[k])

    # Equalities: dx_0 = dx0; dx_{k+1} - A dx_k - B du_k = c_k
    ne = (N + 1) * nx
    E = np.zeros((ne, nz))
    h = np.zeros(ne)
    E[:nx, :nx] = np.eye(nx)
    h[:nx] = np.asarray(data.dx0)
    for k in range(N):
        row = (k + 1) * nx
        E[row:row + nx, (k + 1) * nx:(k + 2) * nx] = np.eye(nx)
        E[row:row + nx, k * nx:(k + 1) * nx] = -np.asarray(data.A[k])
        E[row:row + nx, off + k * nu:off + (k + 1) * nu] = -np.asarray(data.B[k])
        h[row:row + nx] = np.asarray(data.c[k])

    KKT = np.block([[H, E.T], [E, np.zeros((ne, ne))]])
    rhs = np.r_[-g, h]
    sol = np.linalg.solve(KKT, rhs)
    dx = sol[:(N + 1) * nx].reshape(N + 1, nx)
    du = sol[(N + 1) * nx:nz].reshape(N, nu)
    return dx, du


def test_riccati_matches_dense_kkt():
    data = random_qp(seed=1)
    sol = lqr_solve(data)
    dx_ref, du_ref = dense_equality_solve(data)
    np.testing.assert_allclose(np.asarray(sol.dx), dx_ref, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(sol.du), du_ref, rtol=1e-8, atol=1e-9)
    stat, eq = lqr_kkt_residuals(data, sol.dx, sol.du)
    assert float(stat) < 1e-9
    assert float(eq) < 1e-9


def test_ipm_inactive_bounds_matches_riccati():
    data = random_qp(seed=2, bound_scale=1e3)  # bounds never active
    sol_free = lqr_solve(data)
    sol_ipm = box_qp_solve(data, iters=20)
    np.testing.assert_allclose(np.asarray(sol_ipm.dx), np.asarray(sol_free.dx),
                               atol=5e-6)
    np.testing.assert_allclose(np.asarray(sol_ipm.du), np.asarray(sol_free.du),
                               atol=5e-6)


def _check_box_kkt(data: QPData, sol, tol=1e-6):
    """Full KKT check in numpy: feasibility, stationarity, complementarity."""
    N, nx, nu = data.horizon, data.nx, data.nu
    dx, du = np.asarray(sol.dx), np.asarray(sol.du)
    # primal feasibility
    dyn = dx[1:] - np.einsum("kij,kj->ki", np.asarray(data.A), dx[:-1]) \
        - np.einsum("kij,kj->ki", np.asarray(data.B), du) - np.asarray(data.c)
    assert np.abs(dyn).max() < tol
    assert np.abs(dx[0] - np.asarray(data.dx0)).max() < tol
    lbx, ubx = np.asarray(data.lbx), np.asarray(data.ubx)
    lbu, ubu = np.asarray(data.lbu), np.asarray(data.ubu)
    assert (dx[1:] >= lbx[1:] - tol).all() and (dx[1:] <= ubx[1:] + tol).all()
    assert (du >= lbu - tol).all() and (du <= ubu + tol).all()
    # dual feasibility
    for lam in (sol.lam_lx, sol.lam_ux, sol.lam_lu, sol.lam_uu):
        assert (np.asarray(lam) >= -tol).all()
    # stationarity via adjoint recursion (control rows)
    lam_xb = np.asarray(sol.lam_lx) - np.asarray(sol.lam_ux)
    lam_ub = np.asarray(sol.lam_lu) - np.asarray(sol.lam_uu)
    lam = np.asarray(data.Q[-1]) @ dx[-1] + np.asarray(data.q[-1]) - lam_xb[-1]
    worst_u = 0.0
    for k in range(N - 1, -1, -1):
        su = np.asarray(data.R[k]) @ du[k] + np.asarray(data.r[k]) \
            + np.asarray(data.B[k]).T @ lam - lam_ub[k]
        worst_u = max(worst_u, np.abs(su).max())
        xb = lam_xb[k - 1] if k >= 1 else 0.0
        lam = np.asarray(data.Q[k]) @ dx[k] + np.asarray(data.q[k]) \
            + np.asarray(data.A[k]).T @ lam - xb
    assert worst_u < tol, f"control stationarity {worst_u}"
    # complementarity
    comp = max(
        (np.asarray(sol.lam_lx) * (dx[1:] - lbx[1:])).max(initial=0),
        (np.asarray(sol.lam_ux) * (ubx[1:] - dx[1:])).max(initial=0),
        (np.asarray(sol.lam_lu) * (du - lbu)).max(initial=0),
        (np.asarray(sol.lam_uu) * (ubu - du)).max(initial=0),
    )
    assert comp < 10 * tol, f"complementarity {comp}"


def test_ipm_active_bounds_kkt():
    data = random_qp(seed=3, bound_scale=np.inf)
    # Tighten control bounds so they bind at the unconstrained optimum.
    free = lqr_solve(data)
    du_max = float(jnp.max(jnp.abs(free.du)))
    lim = 0.4 * du_max
    data = data._replace(lbu=jnp.full_like(data.lbu, -lim),
                         ubu=jnp.full_like(data.ubu, lim),
                         lbx=jnp.full_like(data.lbx, -5.0),
                         ubx=jnp.full_like(data.ubx, 5.0))
    sol = box_qp_solve(data, iters=30)
    assert float(jnp.max(jnp.abs(sol.du))) <= lim + 1e-7
    _check_box_kkt(data, sol, tol=2e-5)
    # constrained optimum must cost more than unconstrained
    assert float(qp_objective(data, sol.dx, sol.du)) >= \
        float(qp_objective(data, free.dx, free.du)) - 1e-9


def test_ipm_vs_scipy_reference():
    from scipy.optimize import LinearConstraint, minimize
    data = random_qp(N=4, nx=3, nu=2, seed=5)
    free = lqr_solve(data)
    lim = 0.5 * float(jnp.max(jnp.abs(free.du)))
    data = data._replace(lbu=jnp.full_like(data.lbu, -lim),
                         ubu=jnp.full_like(data.ubu, lim),
                         lbx=jnp.full_like(data.lbx, -3.0),
                         ubx=jnp.full_like(data.ubx, 3.0))
    sol = box_qp_solve(data, iters=30)

    N, nx, nu = data.horizon, data.nx, data.nu
    nz = (N + 1) * nx + N * nu
    off = (N + 1) * nx

    def obj(z):
        dx = z[:off].reshape(N + 1, nx)
        du = z[off:].reshape(N, nu)
        return float(qp_objective(data, jnp.asarray(dx), jnp.asarray(du)))

    E = np.zeros(((N + 1) * nx, nz)); h = np.zeros((N + 1) * nx)
    E[:nx, :nx] = np.eye(nx); h[:nx] = np.asarray(data.dx0)
    for k in range(N):
        row = (k + 1) * nx
        E[row:row + nx, (k + 1) * nx:(k + 2) * nx] = np.eye(nx)
        E[row:row + nx, k * nx:(k + 1) * nx] = -np.asarray(data.A[k])
        E[row:row + nx, off + k * nu:off + (k + 1) * nu] = -np.asarray(data.B[k])
        h[row:row + nx] = np.asarray(data.c[k])
    lb = np.r_[np.full(nx, -np.inf), np.tile([-3.0], N * nx).repeat(1),
               np.full(N * nu, -lim)]
    lb[:off][nx:] = -3.0
    ub = np.r_[np.full(nx, np.inf), np.full(N * nx, 3.0), np.full(N * nu, lim)]
    z0 = np.zeros(nz); z0[:nx] = np.asarray(data.dx0)
    res = minimize(obj, z0, method="SLSQP",
                   bounds=list(zip(lb, ub)),
                   constraints=[LinearConstraint(E, h, h)],
                   options={"maxiter": 500, "ftol": 1e-12})
    assert res.success
    ours = float(qp_objective(data, sol.dx, sol.du))
    assert ours == pytest.approx(res.fun, abs=1e-5, rel=1e-6)


def test_ipm_vmap_batch():
    datas = [random_qp(seed=s, bound_scale=2.0) for s in range(4)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *datas)
    batched = jax.jit(jax.vmap(lambda d: box_qp_solve(d, iters=15)))
    sols = batched(stacked)
    ref_fn = jax.jit(lambda d: box_qp_solve(d, iters=15))
    for i, d in enumerate(datas):
        sol_i = ref_fn(d)
        np.testing.assert_allclose(np.asarray(sols.du[i]), np.asarray(sol_i.du),
                                   atol=1e-8)
