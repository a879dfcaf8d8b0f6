"""Pallas TPU mega-kernel: the entire box-constrained OCP-QP IPM, fused.

Why: profiling on a v5e chip shows the XLA path is *latency-bound*, not
compute-bound — each Riccati RHS sweep is ~160 sequential tiny fused ops
(matvecs on (B,17)) costing ~14 ms/iteration at B=1024 while the actual
arithmetic is ~0.1 ms. This kernel runs the WHOLE Mehrotra
predictor-corrector solve (factorization, two RHS sweeps, fraction-to-
boundary line searches, merit/best-iterate tracking — every IPM iteration)
inside ONE `pallas_call`, eliminating the dispatch overhead entirely.

Layout: batch-on-lanes. Every per-stage matrix is stored (rows, cols, B)
with B on the 128-wide lane axis; matrix products become unrolled sums of
rank-1 outer products of leading-dim slices (`_contractT`), so each
17x17-by-batch product is 17 VPU ops instead of a padded MXU dot. This is
the BLASFEO idea (fixed-size panel kernels) mapped to TPU vector lanes
(SURVEY.md §2.2).

Semantics match `qp/ipm.py` (same init, Mehrotra + Gondzio clipping,
dtype-aware floors, best-KKT-iterate), with ALL bounds assumed finite
(true for the BLASTER OCP: full state+control boxes,
`blastermodel.py:261-270`); the XLA path remains the general fallback.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mpc_blaster_tpu.qp.data import QPData, QPSolution

try:  # pallas import can fail on unsupported backends
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

LANES = 128
_BIG = 1e20


def pallas_available() -> bool:
    if not _PALLAS_OK:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


# ---------------- in-kernel small algebra (batch-on-lanes) ----------------

def _contractT(X, Y):
    """(p, m, B), (p, n, B) -> X^T Y (m, n, B): sum of rank-1 outers."""
    p = X.shape[0]
    acc = X[0][:, None, :] * Y[0][None, :, :]
    for j in range(1, p):
        acc = acc + X[j][:, None, :] * Y[j][None, :, :]
    return acc


def _contractT_vec(X, y):
    """(p, m, B), (p, B) -> X^T y (m, B)."""
    p = X.shape[0]
    acc = X[0] * y[0][None, :]
    for j in range(1, p):
        acc = acc + X[j] * y[j][None, :]
    return acc


def _chol_inverse_lanes(M):
    """(n, n, B) SPD -> inverse (n, n, B), unrolled over entries."""
    n = M.shape[0]
    rows = [M[i] for i in range(n)]            # each (n, B)
    ent = [[rows[i][j] for j in range(n)] for i in range(n)]  # (B,) each
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = ent[j][j]
        for p in range(j):
            s = s - L[j][p] * L[j][p]
        d = jnp.sqrt(s)
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            s = ent[i][j]
            for p in range(j):
                s = s - L[i][p] * L[j][p]
            L[i][j] = s * inv_d
    Li = [[None] * n for _ in range(n)]
    for j in range(n):
        Li[j][j] = 1.0 / L[j][j]
        for i in range(j + 1, n):
            s = L[i][j] * Li[j][j]
            for k in range(j + 1, i):
                s = s + L[i][k] * Li[k][j]
            Li[i][j] = -s / L[i][i]
    out_rows = []
    for i in range(n):
        cols = []
        for j in range(n):
            s = None
            for k in range(max(i, j), n):
                t = Li[k][i] * Li[k][j]
                s = t if s is None else s + t
            cols.append(s)
        out_rows.append(jnp.stack(cols, axis=0))   # (n, B)
    return jnp.stack(out_rows, axis=0)             # (n, n, B)


# ------------------------------- the kernel -------------------------------

def _ipm_kernel(A_ref, AT_ref, B_ref, BT_ref, c_ref, Q_ref, q_ref, R_ref,
                r_ref, lbx_ref, ubx_ref, lbu_ref, ubu_ref, dx0_ref,
                dx_out, du_out, diag_out,
                P_s, Z_s, ZT_s, Hinv_s, kff_s,
                dx_s, du_s, slx_s, sux_s, lam_lx_s, lam_ux_s,
                slu_s, suu_s, lam_lu_s, lam_uu_s,
                bdx_s, bdu_s, bm_s,
                blam_lx_s, blam_ux_s, blam_lu_s, blam_uu_s,
                ddx_s, ddu_s, qr_s, rr_s, req_s,
                aslx_s, asux_s, aslu_s, asuu_s,
                allx_s, alux_s, allu_s, aluu_s,
                *, N: int, nx: int, nu: int, iters: int, mu0: float,
                alpha_frac: float, reg: float, s_min: float, mu_min: float,
                sigma_max: float, lam_max: float, eps_s: float):
    f32 = jnp.float32

    # Index the big per-stage inputs directly through their VMEM refs —
    # reading them as full values would duplicate them on the kernel stack
    # and blow the 16MB VMEM budget.
    A, AT, Bm, BT = A_ref, AT_ref, B_ref, BT_ref
    Q, R = Q_ref, R_ref
    cc, qq, rr = c_ref, q_ref, r_ref
    lbx = lbx_ref[...]   # (N, nx, B)   stages 1..N (small)
    ubx = ubx_ref[...]
    lbu = lbu_ref[...]   # (N, nu, B)
    ubu = ubu_ref[...]
    dx0 = dx0_ref[...]   # (nx, B)
    Bt = dx0.shape[-1]

    eye_u = jnp.broadcast_to(
        jnp.eye(nu, dtype=f32)[:, :, None], (nu, nu, Bt))

    # ---- initial point: rollout (du=0) + 10%-inset clamp ----
    dx_s[0] = dx0
    for k in range(N):
        nxt = _contractT_vec(AT[k], dx_s[k]) + cc[k]
        width_x = ubx[k] - lbx[k]
        nxt = jnp.clip(nxt, lbx[k] + 0.1 * width_x, ubx[k] - 0.1 * width_x)
        dx_s[k + 1] = nxt
    width_u = ubu - lbu
    du0 = jnp.clip(jnp.zeros((N, nu, Bt), f32), lbu + 0.1 * width_u,
                   ubu - 0.1 * width_u)
    du_s[...] = du0

    dx_all = dx_s[...]
    slx_s[...] = jnp.maximum(dx_all[1:] - lbx, s_min)
    sux_s[...] = jnp.maximum(ubx - dx_all[1:], s_min)
    slu_s[...] = jnp.maximum(du0 - lbu, s_min)
    suu_s[...] = jnp.maximum(ubu - du0, s_min)
    lam_lx_s[...] = mu0 / slx_s[...]
    lam_ux_s[...] = mu0 / sux_s[...]
    lam_lu_s[...] = mu0 / slu_s[...]
    lam_uu_s[...] = mu0 / suu_s[...]

    n_ineq = f32(2 * N * (nx + nu))

    def comp_sum():
        return (jnp.sum(slx_s[...] * lam_lx_s[...], axis=(0, 1))
                + jnp.sum(sux_s[...] * lam_ux_s[...], axis=(0, 1))
                + jnp.sum(slu_s[...] * lam_lu_s[...], axis=(0, 1))
                + jnp.sum(suu_s[...] * lam_uu_s[...], axis=(0, 1)))  # (B,)

    def kkt(dx, du, llx, lux, llu, luu):
        """(stat (B,), eq (B,)) via adjoint recursion, unrolled over N."""
        lam = (_contractT_vec(Q[N], dx[N]) + qq[N]) - (llx[N - 1] - lux[N - 1])
        stat = jnp.zeros((Bt,), f32)
        eq = jnp.zeros((Bt,), f32)
        for k in range(N - 1, -1, -1):
            su = (_contractT_vec(R[k], du[k]) + rr[k]
                  + _contractT_vec(Bm[k], lam) - (llu[k] - luu[k]))
            stat = jnp.maximum(stat, jnp.max(jnp.abs(su), axis=0))
            pred = (_contractT_vec(AT[k], dx[k])
                    + _contractT_vec(BT[k], du[k]) + cc[k] - dx[k + 1])
            eq = jnp.maximum(eq, jnp.max(jnp.abs(pred), axis=0))
            lam_new = (_contractT_vec(Q[k], dx[k]) + qq[k]
                       + _contractT_vec(A[k], lam))
            if k >= 1:
                lam_new = lam_new - (llx[k - 1] - lux[k - 1])
            lam = lam_new
        return stat, eq

    # seed best iterate
    st0, eq0 = kkt(dx_s[...], du_s[...], lam_lx_s[...], lam_ux_s[...],
                   lam_lu_s[...], lam_uu_s[...])
    bdx_s[...] = dx_s[...]
    bdu_s[...] = du_s[...]
    bm_s[...] = (st0 + eq0 + comp_sum() / n_ineq)[None, :]
    blam_lx_s[...] = lam_lx_s[...]
    blam_ux_s[...] = lam_ux_s[...]
    blam_lu_s[...] = lam_lu_s[...]
    blam_uu_s[...] = lam_uu_s[...]

    def factorize():
        """Backward matrix sweep with barrier-modified Hessians."""
        sig_x = jnp.minimum(lam_lx_s[...] / slx_s[...]
                            + lam_ux_s[...] / sux_s[...], sigma_max)
        sig_u = jnp.minimum(lam_lu_s[...] / slu_s[...]
                            + lam_uu_s[...] / suu_s[...], sigma_max)
        eye_x = jnp.broadcast_to(
            jnp.eye(nx, dtype=f32)[:, :, None], (nx, nx, Bt))
        P = Q[N] + sig_x[N - 1][:, None, :] * eye_x   # terminal state bounds
        P_s[N] = P
        for k in range(N - 1, -1, -1):
            PA = _contractT(P, A[k])                    # P'A = PA (sym)
            PB = _contractT(P, Bm[k])
            # diag(sig_u) add: R + B'PB + reg
            Huu = _contractT(Bm[k], PB) + R[k] + reg * eye_u
            Huu = Huu + sig_u[k][:, None, :] * eye_u
            Hux = _contractT(Bm[k], PA)                 # (nu, nx, B)
            Hinv = _chol_inverse_lanes(Huu)
            Z = _contractT(Hinv, Hux)                   # Hinv Hux = -K
            ZT = _contractT(Hux, Hinv)                  # (nx, nu, B)
            Pk = Q[k] + _contractT(A[k], PA) - _contractT(Hux, Z)
            if k >= 1:
                Pk = Pk + sig_x[k - 1][:, None, :] * eye_x  # stage-k bounds
            Pk = 0.5 * (Pk + jnp.swapaxes(Pk, 0, 1))
            P_s[k] = Pk
            Z_s[k] = Z
            ZT_s[k] = ZT
            Hinv_s[k] = Hinv
            P = Pk
        return sig_x, sig_u

    def rhs_grads(Tlx, Tux, Tlu, Tuu, r_slx, r_sux, r_slu, r_suu):
        gx = jnp.stack([_contractT_vec(Q[k], dx_s[k]) + qq[k]
                        for k in range(N + 1)], axis=0)
        gu = jnp.stack([_contractT_vec(R[k], du_s[k]) + rr[k]
                        for k in range(N)], axis=0)
        bx = (-Tlx / slx_s[...] - (lam_lx_s[...] / slx_s[...]) * r_slx
              + Tux / sux_s[...] + (lam_ux_s[...] / sux_s[...]) * r_sux)
        bu = (-Tlu / slu_s[...] - (lam_lu_s[...] / slu_s[...]) * r_slu
              + Tuu / suu_s[...] + (lam_uu_s[...] / suu_s[...]) * r_suu)
        qr_s[...] = jnp.concatenate([gx[:1], gx[1:] + bx], axis=0)
        rr_s[...] = gu + bu

    def solve_rhs():
        """Backward vector sweep + forward rollout into ddx_s/ddu_s."""
        p = qr_s[N]
        for k in range(N - 1, -1, -1):
            Pcp = _contractT_vec(P_s[k + 1], req_s[k]) + p
            Gu = rr_s[k] + _contractT_vec(Bm[k], Pcp)
            kff_s[k] = -_contractT_vec(Hinv_s[k], Gu)
            p = (qr_s[k] + _contractT_vec(A[k], Pcp)
                 - _contractT_vec(Z_s[k], Gu))
        d = jnp.zeros((nx, Bt), f32)
        ddx_s[0] = d
        for k in range(N):
            du_k = -_contractT_vec(ZT_s[k], d) + kff_s[k]
            ddu_s[k] = du_k
            d = (_contractT_vec(AT[k], d) + _contractT_vec(BT[k], du_k)
                 + req_s[k])
            ddx_s[k + 1] = d

    def ipm_iteration(_it, _carry):
        mu_cur = comp_sum() / n_ineq                     # (B,)

        r_slx = slx_s[...] - (dx_s[...][1:] - lbx)
        r_sux = sux_s[...] - (ubx - dx_s[...][1:])
        r_slu = slu_s[...] - (du_s[...] - lbu)
        r_suu = suu_s[...] - (ubu - du_s[...])

        # equality residual of the iterate
        dx_all = dx_s[...]
        req_s[...] = jnp.stack(
            [cc[k] + _contractT_vec(AT[k], dx_all[k])
             + _contractT_vec(BT[k], du_s[k]) - dx_all[k + 1]
             for k in range(N)], axis=0)

        factorize()

        zero_x = jnp.zeros((N, nx, Bt), f32)
        zero_u = jnp.zeros((N, nu, Bt), f32)

        def dirs(Tlx, Tux, Tlu, Tuu, out):
            rhs_grads(Tlx, Tux, Tlu, Tuu, r_slx, r_sux, r_slu, r_suu)
            solve_rhs()
            ddx_t = ddx_s[...][1:]
            ddu_t = ddu_s[...]
            dslx = ddx_t - r_slx
            dsux = -ddx_t - r_sux
            dslu = ddu_t - r_slu
            dsuu = -ddu_t - r_suu
            dllx = (Tlx - slx_s[...] * lam_lx_s[...]
                    - lam_lx_s[...] * dslx) / slx_s[...]
            dlux = (Tux - sux_s[...] * lam_ux_s[...]
                    - lam_ux_s[...] * dsux) / sux_s[...]
            dllu = (Tlu - slu_s[...] * lam_lu_s[...]
                    - lam_lu_s[...] * dslu) / slu_s[...]
            dluu = (Tuu - suu_s[...] * lam_uu_s[...]
                    - lam_uu_s[...] * dsuu) / suu_s[...]
            (o_slx, o_sux, o_slu, o_suu, o_llx, o_lux, o_llu, o_luu) = out
            o_slx[...] = dslx; o_sux[...] = dsux
            o_slu[...] = dslu; o_suu[...] = dsuu
            o_llx[...] = dllx; o_lux[...] = dlux
            o_llu[...] = dllu; o_luu[...] = dluu

        def max_step(v, dv, tau):
            ratio = jnp.where(dv < 0, -tau * v / jnp.where(dv < 0, dv, -1.0),
                              _BIG)
            return jnp.min(ratio, axis=(0, 1))           # (B,)

        aff_out = (aslx_s, asux_s, aslu_s, asuu_s,
                   allx_s, alux_s, allu_s, aluu_s)
        dirs(zero_x, zero_x, zero_u, zero_u, aff_out)
        a_p_aff = jnp.minimum(jnp.minimum(
            max_step(slx_s[...], aslx_s[...], 1.0),
            max_step(sux_s[...], asux_s[...], 1.0)), jnp.minimum(
            max_step(slu_s[...], aslu_s[...], 1.0),
            max_step(suu_s[...], asuu_s[...], 1.0)))
        a_d_aff = jnp.minimum(jnp.minimum(
            max_step(lam_lx_s[...], allx_s[...], 1.0),
            max_step(lam_ux_s[...], alux_s[...], 1.0)), jnp.minimum(
            max_step(lam_lu_s[...], allu_s[...], 1.0),
            max_step(lam_uu_s[...], aluu_s[...], 1.0)))
        a_p_aff = jnp.minimum(a_p_aff, 1.0)[None, None, :]
        a_d_aff = jnp.minimum(a_d_aff, 1.0)[None, None, :]

        mu_aff = ((jnp.sum((slx_s[...] + a_p_aff * aslx_s[...])
                           * (lam_lx_s[...] + a_d_aff * allx_s[...]),
                           axis=(0, 1))
                   + jnp.sum((sux_s[...] + a_p_aff * asux_s[...])
                             * (lam_ux_s[...] + a_d_aff * alux_s[...]),
                             axis=(0, 1))
                   + jnp.sum((slu_s[...] + a_p_aff * aslu_s[...])
                             * (lam_lu_s[...] + a_d_aff * allu_s[...]),
                             axis=(0, 1))
                   + jnp.sum((suu_s[...] + a_p_aff * asuu_s[...])
                             * (lam_uu_s[...] + a_d_aff * aluu_s[...]),
                             axis=(0, 1))) / n_ineq)
        sigma = jnp.clip((mu_aff / jnp.maximum(mu_cur, mu_min)) ** 3,
                         0.0, 1.0)
        mu_t = jnp.maximum(sigma * mu_cur, mu_min)[None, None, :]

        def target(ds, dl):
            return jnp.clip(mu_t - ds * dl, 0.05 * mu_t, 20.0 * mu_t)

        Tlx = target(aslx_s[...], allx_s[...])
        Tux = target(asux_s[...], alux_s[...])
        Tlu = target(aslu_s[...], allu_s[...])
        Tuu = target(asuu_s[...], aluu_s[...])
        cor_out = (aslx_s, asux_s, aslu_s, asuu_s,
                   allx_s, alux_s, allu_s, aluu_s)
        dirs(Tlx, Tux, Tlu, Tuu, cor_out)
        a_p = jnp.minimum(jnp.minimum(
            max_step(slx_s[...], aslx_s[...], alpha_frac),
            max_step(sux_s[...], asux_s[...], alpha_frac)), jnp.minimum(
            max_step(slu_s[...], aslu_s[...], alpha_frac),
            max_step(suu_s[...], asuu_s[...], alpha_frac)))
        a_d = jnp.minimum(jnp.minimum(
            max_step(lam_lx_s[...], allx_s[...], alpha_frac),
            max_step(lam_ux_s[...], alux_s[...], alpha_frac)), jnp.minimum(
            max_step(lam_lu_s[...], allu_s[...], alpha_frac),
            max_step(lam_uu_s[...], aluu_s[...], alpha_frac)))
        a_p = jnp.minimum(a_p, 1.0)[None, None, :]
        a_d = jnp.minimum(a_d, 1.0)[None, None, :]

        # stage-0 state stays pinned (ddx[0] == 0 by construction anyway)
        dx_s[...] = dx_s[...] + jnp.concatenate(
            [ddx_s[...][0:1] * 0.0, a_p * ddx_s[...][1:]], axis=0)
        du_s[...] = du_s[...] + a_p * ddu_s[...]
        slx_s[...] = jnp.maximum(slx_s[...] + a_p * aslx_s[...], eps_s)
        sux_s[...] = jnp.maximum(sux_s[...] + a_p * asux_s[...], eps_s)
        slu_s[...] = jnp.maximum(slu_s[...] + a_p * aslu_s[...], eps_s)
        suu_s[...] = jnp.maximum(suu_s[...] + a_p * asuu_s[...], eps_s)
        lam_lx_s[...] = jnp.clip(lam_lx_s[...] + a_d * allx_s[...],
                                 0.0, lam_max)
        lam_ux_s[...] = jnp.clip(lam_ux_s[...] + a_d * alux_s[...],
                                 0.0, lam_max)
        lam_lu_s[...] = jnp.clip(lam_lu_s[...] + a_d * allu_s[...],
                                 0.0, lam_max)
        lam_uu_s[...] = jnp.clip(lam_uu_s[...] + a_d * aluu_s[...],
                                 0.0, lam_max)

        st, eq = kkt(dx_s[...], du_s[...], lam_lx_s[...], lam_ux_s[...],
                     lam_lu_s[...], lam_uu_s[...])
        m = st + eq + comp_sum() / n_ineq                # (B,)
        better = (m < bm_s[0])[None, None, :]
        bdx_s[...] = jnp.where(better, dx_s[...], bdx_s[...])
        bdu_s[...] = jnp.where(better, du_s[...], bdu_s[...])
        bm_s[...] = jnp.where(better[0], m[None, :], bm_s[...])
        blam_lx_s[...] = jnp.where(better, lam_lx_s[...], blam_lx_s[...])
        blam_ux_s[...] = jnp.where(better, lam_ux_s[...], blam_ux_s[...])
        blam_lu_s[...] = jnp.where(better, lam_lu_s[...], blam_lu_s[...])
        blam_uu_s[...] = jnp.where(better, lam_uu_s[...], blam_uu_s[...])
        return _carry

    jax.lax.fori_loop(0, iters, ipm_iteration, 0)

    dx_out[...] = bdx_s[...]
    du_out[...] = bdu_s[...]
    stb, eqb = kkt(bdx_s[...], bdu_s[...], blam_lx_s[...], blam_ux_s[...],
                   blam_lu_s[...], blam_uu_s[...])
    diag_out[...] = jnp.stack([stb, eqb, bm_s[0]], axis=0)


# ------------------------------ host wrapper ------------------------------

@functools.partial(jax.jit, static_argnames=("iters", "mu0", "alpha_frac",
                                             "reg", "interpret"))
def pallas_box_qp_solve(data: QPData, iters: int = 12, mu0: float = 1e-1,
                        alpha_frac: float = 0.995, reg: float = 1e-6,
                        interpret: bool = False) -> QPSolution:
    """Batched QP solve. `data` fields carry a LEADING batch axis (B, ...).

    All bounds must be finite. f32. Batch is padded to a lane multiple.
    """
    B = data.A.shape[0]
    N, nx, nu = data.A.shape[1], data.A.shape[-1], data.B.shape[-1]
    f32 = jnp.float32

    pad = (-B) % LANES
    def prep(x):
        x = jnp.asarray(x, f32)
        if pad:
            x = jnp.concatenate([x, jnp.repeat(x[:1], pad, axis=0)], axis=0)
        # batch-last
        return jnp.moveaxis(x, 0, -1)

    A = prep(data.A)                       # (N, nx, nx, Bp)
    AT = jnp.swapaxes(A, 1, 2)
    Bm = prep(data.B)                      # (N, nx, nu, Bp)
    BT = jnp.swapaxes(Bm, 1, 2)
    c = prep(data.c)
    Q = prep(data.Q)
    q = prep(data.q)
    R = prep(data.R)
    r = prep(data.r)
    lbx = prep(data.lbx)[1:]
    ubx = prep(data.ubx)[1:]
    lbu = prep(data.lbu)
    ubu = prep(data.ubu)
    dx0 = prep(data.dx0)
    Bp = A.shape[-1]

    mu_min, s_min = 1e-7, 1e-3
    sigma_max, lam_max, eps_s = 1e7, 1e7, 1e-9

    kernel = functools.partial(
        _ipm_kernel, N=N, nx=nx, nu=nu, iters=iters, mu0=mu0,
        alpha_frac=alpha_frac, reg=reg, s_min=s_min, mu_min=mu_min,
        sigma_max=sigma_max, lam_max=lam_max, eps_s=eps_s)

    grid = (Bp // LANES,)

    def bspec(shape):
        # block covers full leading dims, LANES on the batch axis
        nd = len(shape)
        blk = shape[:-1] + (LANES,)
        return pl.BlockSpec(blk, lambda b: (0,) * (nd - 1) + (b,),
                            memory_space=pltpu.VMEM)

    in_specs = [bspec(x.shape) for x in
                (A, AT, Bm, BT, c, Q, q, R, r, lbx, ubx, lbu, ubu, dx0)]
    out_shape = (
        jax.ShapeDtypeStruct((N + 1, nx, Bp), f32),
        jax.ShapeDtypeStruct((N, nu, Bp), f32),
        jax.ShapeDtypeStruct((3, Bp), f32),
    )
    out_specs = (
        bspec((N + 1, nx, Bp)),
        bspec((N, nu, Bp)),
        bspec((3, Bp)),
    )
    scratch = [
        pltpu.VMEM((N + 1, nx, nx, LANES), f32),  # P_s
        pltpu.VMEM((N, nu, nx, LANES), f32),      # Z_s
        pltpu.VMEM((N, nx, nu, LANES), f32),      # ZT_s
        pltpu.VMEM((N, nu, nu, LANES), f32),      # Hinv_s
        pltpu.VMEM((N, nu, LANES), f32),          # kff_s
        pltpu.VMEM((N + 1, nx, LANES), f32),      # dx_s
        pltpu.VMEM((N, nu, LANES), f32),          # du_s
        pltpu.VMEM((N, nx, LANES), f32),          # slx
        pltpu.VMEM((N, nx, LANES), f32),          # sux
        pltpu.VMEM((N, nx, LANES), f32),          # lam_lx
        pltpu.VMEM((N, nx, LANES), f32),          # lam_ux
        pltpu.VMEM((N, nu, LANES), f32),          # slu
        pltpu.VMEM((N, nu, LANES), f32),          # suu
        pltpu.VMEM((N, nu, LANES), f32),          # lam_lu
        pltpu.VMEM((N, nu, LANES), f32),          # lam_uu
        pltpu.VMEM((N + 1, nx, LANES), f32),      # bdx
        pltpu.VMEM((N, nu, LANES), f32),          # bdu
        pltpu.VMEM((1, LANES), f32),              # bm
        pltpu.VMEM((N, nx, LANES), f32),          # blam_lx
        pltpu.VMEM((N, nx, LANES), f32),          # blam_ux
        pltpu.VMEM((N, nu, LANES), f32),          # blam_lu
        pltpu.VMEM((N, nu, LANES), f32),          # blam_uu
        pltpu.VMEM((N + 1, nx, LANES), f32),      # ddx
        pltpu.VMEM((N, nu, LANES), f32),          # ddu
        pltpu.VMEM((N + 1, nx, LANES), f32),      # qr
        pltpu.VMEM((N, nu, LANES), f32),          # rr
        pltpu.VMEM((N, nx, LANES), f32),          # req
        pltpu.VMEM((N, nx, LANES), f32),          # aslx
        pltpu.VMEM((N, nx, LANES), f32),          # asux
        pltpu.VMEM((N, nu, LANES), f32),          # aslu
        pltpu.VMEM((N, nu, LANES), f32),          # asuu
        pltpu.VMEM((N, nx, LANES), f32),          # allx
        pltpu.VMEM((N, nx, LANES), f32),          # alux
        pltpu.VMEM((N, nu, LANES), f32),          # allu
        pltpu.VMEM((N, nu, LANES), f32),          # aluu
    ]

    dx_bl, du_bl, diag = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(A, AT, Bm, BT, c, Q, q, R, r, lbx, ubx, lbu, ubu, dx0)

    dx = jnp.moveaxis(dx_bl, -1, 0)[:B]
    du = jnp.moveaxis(du_bl, -1, 0)[:B]
    diag = jnp.moveaxis(diag, -1, 0)[:B]
    return QPSolution(dx=dx, du=du, kkt_stat=diag[:, 0], kkt_eq=diag[:, 1],
                      mu=diag[:, 2])
