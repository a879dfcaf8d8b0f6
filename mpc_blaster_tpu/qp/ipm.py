"""Box-constrained OCP-QP via primal-dual interior point + Riccati.

The HPIPM-class solver (`blastermodel.py:274`) rebuilt TPU-first:

  - static iteration budget (`ipm_iters`) inside jit — no data-dependent
    loop counts (XLA requirement); converged problems keep iterating on a
    stationary point, which is wasted-but-correct work and batch-friendly;
  - each iteration solves one equality-constrained Newton system with
    bound-modified stage Hessians via the `riccati.py` scan;
  - infeasible-start formulation: slacks are independent variables, so the
    (possibly bound-violating) warm start from the previous RTI tick is fine;
  - a single fraction-to-boundary step size for primal and dual variables,
    computed with masked reductions (jnp.where), never host branches.

Bounds may be +-inf; masked entries contribute nothing to the barrier.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mpc_blaster_tpu.qp.data import QPData, QPSolution
from mpc_blaster_tpu.qp.riccati import riccati_solve

_BIG = 1e20  # slack value standing in for an infinite bound


class _IpmState(NamedTuple):
    dx: jnp.ndarray      # (N+1, nx)
    du: jnp.ndarray      # (N, nu)
    # slacks/duals for x lower/upper (stages 1..N -> stored (N, nx))
    s_lx: jnp.ndarray
    s_ux: jnp.ndarray
    lam_lx: jnp.ndarray
    lam_ux: jnp.ndarray
    # slacks/duals for u lower/upper (N, nu)
    s_lu: jnp.ndarray
    s_uu: jnp.ndarray
    lam_lu: jnp.ndarray
    lam_uu: jnp.ndarray
    mu: jnp.ndarray      # barrier parameter (scalar)


def _finite_mask(b):
    return jnp.isfinite(b)


def _init_slack(gap, mask, s_min):
    """Positive slack init: clamp the true gap away from zero; inf bounds
    get a huge slack so they never restrict the step."""
    return jnp.where(mask, jnp.maximum(gap, s_min), _BIG)


def box_qp_solve(data: QPData, iters: int = 12, mu0: float = 1e-1,
                 kappa: float = 0.2, alpha_frac: float = 0.995,
                 reg: float = 1e-9, s_min: float = 1e-3,
                 warm_du: jnp.ndarray | None = None) -> QPSolution:
    """Solve the box-constrained OCP QP. Fully jit/vmap-compatible.

    warm_du: optional (N, nu) control warm start (RTI shift), used to seed
    the primal trajectory by rolling out the dynamics.
    """
    N, nx, nu = data.horizon, data.nx, data.nu
    dtype = data.A.dtype

    mask_lx = _finite_mask(data.lbx[1:])
    mask_ux = _finite_mask(data.ubx[1:])
    mask_lu = _finite_mask(data.lbu)
    mask_uu = _finite_mask(data.ubu)

    # ----- initial primal point: dynamics-consistent rollout -----
    du0 = jnp.zeros((N, nu), dtype) if warm_du is None else warm_du

    def roll(dx, inp):
        A_k, B_k, c_k, du_k = inp
        nxt = A_k @ dx + B_k @ du_k + c_k
        return nxt, nxt
    _, dx_tail = jax.lax.scan(roll, data.dx0, (data.A, data.B, data.c, du0))
    dx0_traj = jnp.concatenate([data.dx0[None], dx_tail], axis=0)

    state = _IpmState(
        dx=dx0_traj, du=du0,
        s_lx=_init_slack(dx0_traj[1:] - data.lbx[1:], mask_lx, s_min),
        s_ux=_init_slack(data.ubx[1:] - dx0_traj[1:], mask_ux, s_min),
        lam_lx=jnp.where(mask_lx, mu0 / s_min, 0.0).astype(dtype),
        lam_ux=jnp.where(mask_ux, mu0 / s_min, 0.0).astype(dtype),
        s_lu=_init_slack(du0 - data.lbu, mask_lu, s_min),
        s_uu=_init_slack(data.ubu - du0, mask_uu, s_min),
        lam_lu=jnp.where(mask_lu, mu0 / s_min, 0.0).astype(dtype),
        lam_uu=jnp.where(mask_uu, mu0 / s_min, 0.0).astype(dtype),
        mu=jnp.asarray(mu0, dtype),
    )

    n_ineq = (jnp.sum(mask_lx) + jnp.sum(mask_ux)
              + jnp.sum(mask_lu) + jnp.sum(mask_uu)).astype(dtype)
    n_ineq = jnp.maximum(n_ineq, 1.0)

    def iteration(state: _IpmState, _):
        mu = state.mu

        # Bound residuals (infeasible-start): r_s = s - (z - l) etc.
        r_slx = jnp.where(mask_lx, state.s_lx - (state.dx[1:] - data.lbx[1:]), 0.0)
        r_sux = jnp.where(mask_ux, state.s_ux - (data.ubx[1:] - state.dx[1:]), 0.0)
        r_slu = jnp.where(mask_lu, state.s_lu - (state.du - data.lbu), 0.0)
        r_suu = jnp.where(mask_uu, state.s_uu - (data.ubu - state.du), 0.0)

        # Diagonal Hessian modification sigma = lam_l/s_l + lam_u/s_u.
        sig_x = jnp.where(mask_lx, state.lam_lx / state.s_lx, 0.0) \
            + jnp.where(mask_ux, state.lam_ux / state.s_ux, 0.0)     # (N, nx)
        sig_u = jnp.where(mask_lu, state.lam_lu / state.s_lu, 0.0) \
            + jnp.where(mask_uu, state.lam_uu / state.s_uu, 0.0)     # (N, nu)

        # Modified gradients: gbar = Hz + g - mu/s_l - (lam_l/s_l) r_sl
        #                              + mu/s_u + (lam_u/s_u) r_su
        gx_full = jnp.einsum("kij,kj->ki", data.Q, state.dx) + data.q  # (N+1, nx)
        gu_full = jnp.einsum("kij,kj->ki", data.R, state.du) + data.r  # (N, nu)

        bar_x = (- jnp.where(mask_lx, mu / state.s_lx, 0.0)
                 - jnp.where(mask_lx, state.lam_lx / state.s_lx, 0.0) * r_slx
                 + jnp.where(mask_ux, mu / state.s_ux, 0.0)
                 + jnp.where(mask_ux, state.lam_ux / state.s_ux, 0.0) * r_sux)
        bar_u = (- jnp.where(mask_lu, mu / state.s_lu, 0.0)
                 - jnp.where(mask_lu, state.lam_lu / state.s_lu, 0.0) * r_slu
                 + jnp.where(mask_uu, mu / state.s_uu, 0.0)
                 + jnp.where(mask_uu, state.lam_uu / state.s_uu, 0.0) * r_suu)

        # Newton system in (Ddx, Ddu) — iterates stay dynamics-feasible, so
        # the equality residual is zero and the Riccati affine term is 0.
        eye_x = jnp.eye(nx, dtype=dtype)
        Qmod = data.Q.at[1:].add(sig_x[:, :, None] * eye_x[None])
        qmod = gx_full.at[1:].add(bar_x)
        eye_u = jnp.eye(nu, dtype=dtype)
        Rmod = data.R + sig_u[:, :, None] * eye_u[None]
        rmod = gu_full + bar_u

        zeros_c = jnp.zeros_like(data.c)
        d_dx, d_du, _ = riccati_solve(
            data.A, data.B, zeros_c, Qmod, qmod, Rmod, rmod,
            jnp.zeros(nx, dtype), reg)

        # Slack directions.
        d_slx = jnp.where(mask_lx, d_dx[1:] - r_slx, 0.0)
        d_sux = jnp.where(mask_ux, -d_dx[1:] - r_sux, 0.0)
        d_slu = jnp.where(mask_lu, d_du - r_slu, 0.0)
        d_suu = jnp.where(mask_uu, -d_du - r_suu, 0.0)

        # Dual directions: Dlam = (mu - S lam)/s - (lam/s) Ds.
        def dlam(lam, s, ds, mask):
            return jnp.where(mask, (mu - s * lam) / s - (lam / s) * ds, 0.0)
        d_llx = dlam(state.lam_lx, state.s_lx, d_slx, mask_lx)
        d_lux = dlam(state.lam_ux, state.s_ux, d_sux, mask_ux)
        d_llu = dlam(state.lam_lu, state.s_lu, d_slu, mask_lu)
        d_luu = dlam(state.lam_uu, state.s_uu, d_suu, mask_uu)

        # Fraction-to-boundary step size (single alpha, HPIPM-style).
        def max_step(v, dv, mask):
            ratio = jnp.where(mask & (dv < 0), -v / jnp.where(dv < 0, dv, -1.0),
                              jnp.inf)
            return jnp.min(ratio)
        alpha = jnp.minimum(1.0, alpha_frac * jnp.minimum(
            jnp.minimum(
                jnp.minimum(max_step(state.s_lx, d_slx, mask_lx),
                            max_step(state.s_ux, d_sux, mask_ux)),
                jnp.minimum(max_step(state.s_lu, d_slu, mask_lu),
                            max_step(state.s_uu, d_suu, mask_uu))),
            jnp.minimum(
                jnp.minimum(max_step(state.lam_lx, d_llx, mask_lx),
                            max_step(state.lam_ux, d_lux, mask_ux)),
                jnp.minimum(max_step(state.lam_lu, d_llu, mask_lu),
                            max_step(state.lam_uu, d_luu, mask_uu)))))
        alpha = alpha.astype(dtype)

        new = _IpmState(
            dx=state.dx + alpha * d_dx,
            du=state.du + alpha * d_du,
            s_lx=jnp.where(mask_lx, state.s_lx + alpha * d_slx, _BIG),
            s_ux=jnp.where(mask_ux, state.s_ux + alpha * d_sux, _BIG),
            lam_lx=state.lam_lx + alpha * d_llx,
            lam_ux=state.lam_ux + alpha * d_lux,
            s_lu=jnp.where(mask_lu, state.s_lu + alpha * d_slu, _BIG),
            s_uu=jnp.where(mask_uu, state.s_uu + alpha * d_suu, _BIG),
            lam_lu=state.lam_lu + alpha * d_llu,
            lam_uu=state.lam_uu + alpha * d_luu,
            mu=mu,
        )

        # Barrier update from measured complementarity.
        comp = (jnp.sum(jnp.where(mask_lx, new.s_lx * new.lam_lx, 0.0))
                + jnp.sum(jnp.where(mask_ux, new.s_ux * new.lam_ux, 0.0))
                + jnp.sum(jnp.where(mask_lu, new.s_lu * new.lam_lu, 0.0))
                + jnp.sum(jnp.where(mask_uu, new.s_uu * new.lam_uu, 0.0)))
        mu_meas = comp / n_ineq
        new = new._replace(mu=jnp.minimum(mu, kappa * mu_meas))
        return new, alpha

    state, alphas = jax.lax.scan(iteration, state, None, length=iters)

    kkt_stat, kkt_eq = _kkt_residuals(data, state, mask_lx, mask_ux,
                                      mask_lu, mask_uu)
    return QPSolution(
        dx=state.dx, du=state.du,
        lam_lx=state.lam_lx, lam_ux=state.lam_ux,
        lam_lu=state.lam_lu, lam_uu=state.lam_uu,
        mu=state.mu, kkt_stat=kkt_stat, kkt_eq=kkt_eq,
        iters=jnp.asarray(iters),
    )


def _kkt_residuals(data: QPData, st: _IpmState, mask_lx, mask_ux,
                   mask_lu, mask_uu):
    """Stationarity (via adjoint recursion, scan) and equality residual."""
    lam_x_bnd = jnp.where(mask_lx, st.lam_lx, 0.0) - jnp.where(
        mask_ux, st.lam_ux, 0.0)                         # (N, nx) stages 1..N
    lam_u_bnd = jnp.where(mask_lu, st.lam_lu, 0.0) - jnp.where(
        mask_uu, st.lam_uu, 0.0)                         # (N, nu)

    lamN = data.Q[-1] @ st.dx[-1] + data.q[-1] - lam_x_bnd[-1]

    def bwd(lam_next, inp):
        A_k, B_k, Q_k, q_k, R_k, r_k, dx_k, du_k, lxb, lub = inp
        stat_u = R_k @ du_k + r_k + B_k.T @ lam_next - lub
        lam_k = Q_k @ dx_k + q_k + A_k.T @ lam_next - lxb
        return lam_k, jnp.max(jnp.abs(stat_u))

    # Stage-k state stationarity for k=1..N-1 uses lam_x_bnd[k-1] (bounds are
    # stored for stages 1..N); stage 0 state is pinned (no stationarity row).
    lxb_for_stage = jnp.concatenate(
        [jnp.zeros((1,) + lam_x_bnd.shape[1:], lam_x_bnd.dtype),
         lam_x_bnd[:-1]], axis=0)
    _, stat_us = jax.lax.scan(
        bwd, lamN,
        (data.A, data.B, data.Q[:-1], data.q[:-1], data.R, data.r,
         st.dx[:-1], st.du, lxb_for_stage, lam_u_bnd),
        reverse=True)
    kkt_stat = jnp.max(stat_us)
    kkt_eq = jnp.max(jnp.abs(
        st.dx[1:] - jnp.einsum("kij,kj->ki", data.A, st.dx[:-1])
        - jnp.einsum("kij,kj->ki", data.B, st.du) - data.c))
    return kkt_stat, kkt_eq
