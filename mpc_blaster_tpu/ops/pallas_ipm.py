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

VMEM discipline (the 16 MB budget is the binding constraint):
  - all stage loops are `fori_loop`s with dynamic ref indexing, so Mosaic
    reuses one stage's worth of stack temporaries;
  - cost Hessians are passed stage-invariant (Q_stage, Q_term, R_stage) —
    exactly the LINEAR_LS structure of the OCP (`ocp/spec.py`); only the
    gradients vary per stage;
  - no transposed copies are stored; transposes happen on the fly.

Semantics match `qp/ipm.py` (same init, Mehrotra + Gondzio clipping,
f32 floors, best-KKT-iterate), with ALL bounds assumed finite (true for
the BLASTER OCP: full state+control boxes, `blastermodel.py:261-270`);
the XLA path remains the general fallback.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

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


def _matvec(M, y):
    """(m, p, B), (p, B) -> M y (m, B) via on-the-fly transpose."""
    return _contractT_vec(jnp.swapaxes(M, 0, 1), y)


def _chol_inverse_lanes(M):
    """(n, n, B) SPD -> inverse (n, n, B), unrolled over entries."""
    n = M.shape[0]
    ent = [[M[i][j] for j in range(n)] for i in range(n)]  # (B,) each
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

def _ipm_kernel(A_ref, B_ref, c_ref, Qs_ref, Qt_ref, q_ref, R1_ref, r_ref,
                lbx_ref, ubx_ref, lbu_ref, ubu_ref, dx0_ref,
                dx_out, du_out, diag_out,
                P_s, Z_s, Hinv_s, kff_s,
                dx_s, du_s, slx_s, sux_s, lam_lx_s, lam_ux_s,
                slu_s, suu_s, lam_lu_s, lam_uu_s,
                bdx_s, bdu_s, bm_s,
                blam_lx_s, blam_ux_s, blam_lu_s, blam_uu_s,
                ddx_s, ddu_s, qr_s, rr_s, req_s,
                rslx_s, rsux_s, rslu_s, rsuu_s,
                aslx_s, asux_s, aslu_s, asuu_s,
                allx_s, alux_s, allu_s, aluu_s,
                *, N: int, nx: int, nu: int, iters: int, mu0: float,
                alpha_frac: float, reg: float, s_min: float, mu_min: float,
                sigma_max: float, lam_max: float, eps_s: float):
    f32 = jnp.float32
    Bt = dx0_ref.shape[-1]

    eye_u = jnp.broadcast_to(jnp.eye(nu, dtype=f32)[:, :, None],
                             (nu, nu, Bt))
    eye_x = jnp.broadcast_to(jnp.eye(nx, dtype=f32)[:, :, None],
                             (nx, nx, Bt))

    # ---- initial point: rollout (du=0) + 10%-inset clamp ----
    dx_s[0] = dx0_ref[...]

    def init_roll(k, _):
        nxt = _matvec(A_ref[k], dx_s[k]) + c_ref[k]
        lb, ub = lbx_ref[k], ubx_ref[k]
        w = ub - lb
        dx_s[k + 1] = jnp.clip(nxt, lb + 0.1 * w, ub - 0.1 * w)
        return 0

    jax.lax.fori_loop(0, N, init_roll, 0)

    lbu_v, ubu_v = lbu_ref[...], ubu_ref[...]
    wu = ubu_v - lbu_v
    du0 = jnp.clip(jnp.zeros((N, nu, Bt), f32), lbu_v + 0.1 * wu,
                   ubu_v - 0.1 * wu)
    du_s[...] = du0

    dx_tail = dx_s[...][1:]
    slx_s[...] = jnp.maximum(dx_tail - lbx_ref[...], s_min)
    sux_s[...] = jnp.maximum(ubx_ref[...] - dx_tail, s_min)
    slu_s[...] = jnp.maximum(du0 - lbu_v, s_min)
    suu_s[...] = jnp.maximum(ubu_v - du0, s_min)
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

    def kkt(dx_ref, du_ref, llx_ref, lux_ref, llu_ref, luu_ref):
        """(stat (B,), eq (B,)) via adjoint recursion (fori over stages)."""
        lam0 = (_contractT_vec(Qt_ref[...], dx_ref[N]) + q_ref[N]
                - (llx_ref[N - 1] - lux_ref[N - 1]))

        def bwd(i, carry):
            lam, stat, eq = carry
            k = N - 1 - i
            su = (_contractT_vec(R1_ref[...], du_ref[k]) + r_ref[k]
                  + _contractT_vec(B_ref[k], lam)
                  - (llu_ref[k] - luu_ref[k]))
            stat = jnp.maximum(stat, jnp.max(jnp.abs(su), axis=0))
            pred = (_matvec(A_ref[k], dx_ref[k])
                    + _matvec(B_ref[k], du_ref[k]) + c_ref[k]
                    - dx_ref[k + 1])
            eq = jnp.maximum(eq, jnp.max(jnp.abs(pred), axis=0))
            lam_new = (_contractT_vec(Qs_ref[...], dx_ref[k]) + q_ref[k]
                       + _contractT_vec(A_ref[k], lam))
            km1 = jnp.maximum(k - 1, 0)
            bnd = llx_ref[km1] - lux_ref[km1]
            lam_new = lam_new - jnp.where(k >= 1, bnd, 0.0)
            return (lam_new, stat, eq)

        z = jnp.zeros((Bt,), f32)
        _, stat, eq = jax.lax.fori_loop(0, N, bwd, (lam0, z, z))
        return stat, eq

    # seed best iterate
    st0, eq0 = kkt(dx_s, du_s, lam_lx_s, lam_ux_s, lam_lu_s, lam_uu_s)
    bdx_s[...] = dx_s[...]
    bdu_s[...] = du_s[...]
    bm_s[...] = (st0 + eq0 + comp_sum() / n_ineq)[None, :]
    blam_lx_s[...] = lam_lx_s[...]
    blam_ux_s[...] = lam_ux_s[...]
    blam_lu_s[...] = lam_lu_s[...]
    blam_uu_s[...] = lam_uu_s[...]

    def factorize():
        """Backward matrix sweep with barrier-modified Hessians."""
        sigN = jnp.minimum(lam_lx_s[N - 1] / slx_s[N - 1]
                           + lam_ux_s[N - 1] / sux_s[N - 1], sigma_max)
        P_s[N] = Qt_ref[...] + sigN[:, None, :] * eye_x

        def bwd(i, _):
            k = N - 1 - i
            P = P_s[k + 1]
            A_k = A_ref[k]
            B_k = B_ref[k]
            PA = _contractT(P, A_k)                    # P'A = PA (sym)
            PB = _contractT(P, B_k)
            sig_u = jnp.minimum(lam_lu_s[k] / slu_s[k]
                                + lam_uu_s[k] / suu_s[k], sigma_max)
            Huu = (_contractT(B_k, PB) + R1_ref[...] + reg * eye_u
                   + sig_u[:, None, :] * eye_u)
            Hux = _contractT(B_k, PA)                  # (nu, nx, B)
            Hinv = _chol_inverse_lanes(Huu)
            Z = _contractT(Hinv, Hux)                  # Hinv Hux = -K
            Pk = Qs_ref[...] + _contractT(A_k, PA) - _contractT(Hux, Z)
            km1 = jnp.maximum(k - 1, 0)
            sig_x = jnp.minimum(lam_lx_s[km1] / slx_s[km1]
                                + lam_ux_s[km1] / sux_s[km1], sigma_max)
            sig_x = jnp.where(k >= 1, sig_x, 0.0)
            Pk = Pk + sig_x[:, None, :] * eye_x
            Pk = 0.5 * (Pk + jnp.swapaxes(Pk, 0, 1))
            P_s[k] = Pk
            Z_s[k] = Z
            Hinv_s[k] = Hinv
            return 0

        jax.lax.fori_loop(0, N, bwd, 0)

    def compute_req():
        def body(k, _):
            req_s[k] = (c_ref[k] + _matvec(A_ref[k], dx_s[k])
                        + _matvec(B_ref[k], du_s[k]) - dx_s[k + 1])
            return 0
        jax.lax.fori_loop(0, N, body, 0)

    def rhs_grads(Tlx, Tux, Tlu, Tuu):
        def gxb(k, _):
            Qk = jnp.where(k == N, 1.0, 0.0)  # select terminal vs stage
            g = (Qk * _contractT_vec(Qt_ref[...], dx_s[k])
                 + (1.0 - Qk) * _contractT_vec(Qs_ref[...], dx_s[k])
                 + q_ref[k])
            qr_s[k] = g
            return 0
        jax.lax.fori_loop(0, N + 1, gxb, 0)

        def gub(k, _):
            rr_s[k] = _contractT_vec(R1_ref[...], du_s[k]) + r_ref[k]
            return 0
        jax.lax.fori_loop(0, N, gub, 0)

        bx = (-Tlx / slx_s[...]
              - (lam_lx_s[...] / slx_s[...]) * rslx_s[...]
              + Tux / sux_s[...]
              + (lam_ux_s[...] / sux_s[...]) * rsux_s[...])
        bu = (-Tlu / slu_s[...]
              - (lam_lu_s[...] / slu_s[...]) * rslu_s[...]
              + Tuu / suu_s[...]
              + (lam_uu_s[...] / suu_s[...]) * rsuu_s[...])
        qrv = qr_s[...]
        qr_s[...] = jnp.concatenate([qrv[:1], qrv[1:] + bx], axis=0)
        rr_s[...] = rr_s[...] + bu

    def solve_rhs():
        """Backward vector sweep + forward rollout into ddx_s/ddu_s."""
        def bwd(i, p):
            k = N - 1 - i
            Pcp = _contractT_vec(P_s[k + 1], req_s[k]) + p
            Gu = rr_s[k] + _contractT_vec(B_ref[k], Pcp)
            kff_s[k] = -_contractT_vec(Hinv_s[k], Gu)
            return (qr_s[k] + _contractT_vec(A_ref[k], Pcp)
                    - _contractT_vec(Z_s[k], Gu))

        jax.lax.fori_loop(0, N, bwd, qr_s[N])

        ddx_s[0] = jnp.zeros((nx, Bt), f32)

        def fwd(k, _):
            d = ddx_s[k]
            du_k = -_matvec(Z_s[k], d) + kff_s[k]
            ddu_s[k] = du_k
            ddx_s[k + 1] = (_matvec(A_ref[k], d) + _matvec(B_ref[k], du_k)
                            + req_s[k])
            return 0

        jax.lax.fori_loop(0, N, fwd, 0)

    def ipm_iteration(_it, _carry):
        mu_cur = comp_sum() / n_ineq                     # (B,)

        rslx_s[...] = slx_s[...] - (dx_s[...][1:] - lbx_ref[...])
        rsux_s[...] = sux_s[...] - (ubx_ref[...] - dx_s[...][1:])
        rslu_s[...] = slu_s[...] - (du_s[...] - lbu_ref[...])
        rsuu_s[...] = suu_s[...] - (ubu_ref[...] - du_s[...])

        compute_req()
        factorize()

        def dirs(Tlx, Tux, Tlu, Tuu):
            rhs_grads(Tlx, Tux, Tlu, Tuu)
            solve_rhs()
            ddx_t = ddx_s[...][1:]
            ddu_t = ddu_s[...]
            dslx = ddx_t - rslx_s[...]
            dsux = -ddx_t - rsux_s[...]
            dslu = ddu_t - rslu_s[...]
            dsuu = -ddu_t - rsuu_s[...]
            aslx_s[...] = dslx
            asux_s[...] = dsux
            aslu_s[...] = dslu
            asuu_s[...] = dsuu
            allx_s[...] = (Tlx - slx_s[...] * lam_lx_s[...]
                           - lam_lx_s[...] * dslx) / slx_s[...]
            alux_s[...] = (Tux - sux_s[...] * lam_ux_s[...]
                           - lam_ux_s[...] * dsux) / sux_s[...]
            allu_s[...] = (Tlu - slu_s[...] * lam_lu_s[...]
                           - lam_lu_s[...] * dslu) / slu_s[...]
            aluu_s[...] = (Tuu - suu_s[...] * lam_uu_s[...]
                           - lam_uu_s[...] * dsuu) / suu_s[...]

        def max_step(v, dv, tau):
            ratio = jnp.where(dv < 0, -tau * v / jnp.where(dv < 0, dv, -1.0),
                              _BIG)
            return jnp.min(ratio, axis=(0, 1))           # (B,)

        def alphas(tau):
            a_p = jnp.minimum(jnp.minimum(
                max_step(slx_s[...], aslx_s[...], tau),
                max_step(sux_s[...], asux_s[...], tau)), jnp.minimum(
                max_step(slu_s[...], aslu_s[...], tau),
                max_step(suu_s[...], asuu_s[...], tau)))
            a_d = jnp.minimum(jnp.minimum(
                max_step(lam_lx_s[...], allx_s[...], tau),
                max_step(lam_ux_s[...], alux_s[...], tau)), jnp.minimum(
                max_step(lam_lu_s[...], allu_s[...], tau),
                max_step(lam_uu_s[...], aluu_s[...], tau)))
            return (jnp.minimum(a_p, 1.0)[None, None, :],
                    jnp.minimum(a_d, 1.0)[None, None, :])

        # ---- predictor (affine scaling, target 0) ----
        zx = jnp.zeros((N, nx, Bt), f32)
        zu = jnp.zeros((N, nu, Bt), f32)
        dirs(zx, zx, zu, zu)
        a_p_aff, a_d_aff = alphas(1.0)

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

        # ---- corrector (centering + Gondzio-clipped 2nd order) ----
        Tlx = target(aslx_s[...], allx_s[...])
        Tux = target(asux_s[...], alux_s[...])
        Tlu = target(aslu_s[...], allu_s[...])
        Tuu = target(asuu_s[...], aluu_s[...])
        dirs(Tlx, Tux, Tlu, Tuu)
        a_p, a_d = alphas(alpha_frac)

        # ---- update (stage-0 state stays pinned; ddx[0] == 0 anyway) ----
        ddxv = ddx_s[...]
        dx_s[...] = dx_s[...] + jnp.concatenate(
            [ddxv[0:1] * 0.0, a_p * ddxv[1:]], axis=0)
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

        st, eq = kkt(dx_s, du_s, lam_lx_s, lam_ux_s, lam_lu_s, lam_uu_s)
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
    stb, eqb = kkt(bdx_s, bdu_s, blam_lx_s, blam_ux_s, blam_lu_s,
                   blam_uu_s)
    diag_out[...] = jnp.stack([stb, eqb, bm_s[0]], axis=0)


# ------------------------------ host wrapper ------------------------------

@functools.partial(jax.jit, static_argnames=("iters", "mu0", "alpha_frac",
                                             "reg", "interpret"))
def pallas_box_qp_solve(data: QPData, iters: int = 12, mu0: float = 1e-1,
                        alpha_frac: float = 0.995, reg: float = 1e-6,
                        interpret: bool = False) -> QPSolution:
    """Batched QP solve. `data` fields carry a LEADING batch axis (B, ...).

    Requirements (the RTI/LINEAR_LS structure): stage cost Hessians
    identical across stages 0..N-1 (Q[:, 0] used) with a distinct terminal
    Q[:, N]; R identical across stages; ALL bounds finite. f32.
    """
    B = data.A.shape[0]
    N, nx, nu = data.A.shape[1], data.A.shape[-1], data.B.shape[-1]
    f32 = jnp.float32

    pad = (-B) % LANES

    def prep(x):
        x = jnp.asarray(x, f32)
        if pad:
            x = jnp.concatenate([x, jnp.repeat(x[:1], pad, axis=0)], axis=0)
        return jnp.moveaxis(x, 0, -1)   # batch-last

    A = prep(data.A)                       # (N, nx, nx, Bp)
    Bm = prep(data.B)                      # (N, nx, nu, Bp)
    c = prep(data.c)
    Qs = prep(data.Q[:, 0])                # (nx, nx, Bp) stage Hessian
    Qt = prep(data.Q[:, -1])               # (nx, nx, Bp) terminal
    q = prep(data.q)
    R1 = prep(data.R[:, 0])                # (nu, nu, Bp)
    r = prep(data.r)
    lbx = prep(data.lbx[:, 1:])
    ubx = prep(data.ubx[:, 1:])
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
        nd = len(shape)
        blk = shape[:-1] + (LANES,)
        return pl.BlockSpec(blk, lambda b: (0,) * (nd - 1) + (b,),
                            memory_space=pltpu.VMEM)

    ins = (A, Bm, c, Qs, Qt, q, R1, r, lbx, ubx, lbu, ubu, dx0)
    in_specs = [bspec(x.shape) for x in ins]
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
        pltpu.VMEM((N + 1, nx, nx, LANES), jnp.float32),  # P_s
        pltpu.VMEM((N, nu, nx, LANES), jnp.float32),      # Z_s
        pltpu.VMEM((N, nu, nu, LANES), jnp.float32),      # Hinv_s
        pltpu.VMEM((N, nu, LANES), jnp.float32),          # kff_s
        pltpu.VMEM((N + 1, nx, LANES), jnp.float32),      # dx_s
        pltpu.VMEM((N, nu, LANES), jnp.float32),          # du_s
        pltpu.VMEM((N, nx, LANES), jnp.float32),          # slx
        pltpu.VMEM((N, nx, LANES), jnp.float32),          # sux
        pltpu.VMEM((N, nx, LANES), jnp.float32),          # lam_lx
        pltpu.VMEM((N, nx, LANES), jnp.float32),          # lam_ux
        pltpu.VMEM((N, nu, LANES), jnp.float32),          # slu
        pltpu.VMEM((N, nu, LANES), jnp.float32),          # suu
        pltpu.VMEM((N, nu, LANES), jnp.float32),          # lam_lu
        pltpu.VMEM((N, nu, LANES), jnp.float32),          # lam_uu
        pltpu.VMEM((N + 1, nx, LANES), jnp.float32),      # bdx
        pltpu.VMEM((N, nu, LANES), jnp.float32),          # bdu
        pltpu.VMEM((1, LANES), jnp.float32),              # bm
        pltpu.VMEM((N, nx, LANES), jnp.float32),          # blam_lx
        pltpu.VMEM((N, nx, LANES), jnp.float32),          # blam_ux
        pltpu.VMEM((N, nu, LANES), jnp.float32),          # blam_lu
        pltpu.VMEM((N, nu, LANES), jnp.float32),          # blam_uu
        pltpu.VMEM((N + 1, nx, LANES), jnp.float32),      # ddx
        pltpu.VMEM((N, nu, LANES), jnp.float32),          # ddu
        pltpu.VMEM((N + 1, nx, LANES), jnp.float32),      # qr
        pltpu.VMEM((N, nu, LANES), jnp.float32),          # rr
        pltpu.VMEM((N, nx, LANES), jnp.float32),          # req
        pltpu.VMEM((N, nx, LANES), jnp.float32),          # rslx
        pltpu.VMEM((N, nx, LANES), jnp.float32),          # rsux
        pltpu.VMEM((N, nu, LANES), jnp.float32),          # rslu
        pltpu.VMEM((N, nu, LANES), jnp.float32),          # rsuu
        pltpu.VMEM((N, nx, LANES), jnp.float32),          # aslx
        pltpu.VMEM((N, nx, LANES), jnp.float32),          # asux
        pltpu.VMEM((N, nu, LANES), jnp.float32),          # aslu
        pltpu.VMEM((N, nu, LANES), jnp.float32),          # asuu
        pltpu.VMEM((N, nx, LANES), jnp.float32),          # allx
        pltpu.VMEM((N, nx, LANES), jnp.float32),          # alux
        pltpu.VMEM((N, nu, LANES), jnp.float32),          # allu
        pltpu.VMEM((N, nu, LANES), jnp.float32),          # aluu
    ]

    dx_bl, du_bl, diag = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*ins)

    dx = jnp.moveaxis(dx_bl, -1, 0)[:B]
    du = jnp.moveaxis(du_bl, -1, 0)[:B]
    diag = jnp.moveaxis(diag, -1, 0)[:B]
    return QPSolution(dx=dx, du=du, kkt_stat=diag[:, 0], kkt_eq=diag[:, 1],
                      mu=diag[:, 2])
