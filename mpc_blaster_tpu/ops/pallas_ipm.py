"""Pallas TPU mega-kernel: the entire box-constrained OCP-QP IPM, fused.

Why: profiling on a v5e chip shows the XLA path is *latency-bound*, not
compute-bound — each Riccati RHS sweep is ~160 sequential tiny fused ops
(matvecs on (B,17)) costing ~14 ms/iteration at B=1024 while the actual
arithmetic is ~0.1 ms. This kernel runs the WHOLE Mehrotra
predictor-corrector solve (factorization, two RHS sweeps, fraction-to-
boundary line searches, merit/best-iterate tracking — every IPM iteration)
inside ONE `pallas_call`, eliminating the dispatch overhead entirely.
Measured (v5e, round 3, honest fetch-based timing): a full 6-iteration
solve takes 0.44 ms at N=20 / 0.66 ms at N=30 (VMEM-resident) / 1.67 ms
at N=60 (HBM-streamed) — which is what makes the >=1 kHz
single-trajectory loop possible at the BASELINE north-star configs
(deployed as `SolverConfig(qp_backend="pallas", ipm_iters=6)`; per-tick
cold starts match the reference's HPIPM `qp_solver_warm_start=0`, and
SHIFTED conditioned warm chains — `warm_mode`/`warm_shift` — buy a
further ~1.5x where transients allow, see bench.py).

Layout: batch-on-lanes. Every per-stage matrix is stored (rows, cols, B)
with B on the 128-wide lane axis; matrix products become unrolled sums of
rank-1 outer products of leading-dim slices (`_contractT`), so each
17x17-by-batch product is 17 VPU ops instead of a padded MXU dot. This is
the BLASFEO idea (fixed-size panel kernels) mapped to TPU vector lanes
(SURVEY.md §2.2).

VMEM discipline (the budget is the physical 128 MiB minus XLA's needs —
NOT the oft-quoted 16 MB, which is only the compiler's default scoped
reservation; see the module constants below):
  - one 128-lane batch tile per pallas_call (outer `lax.map` over tiles)
    so input blocks are not double-buffered across grid steps;
  - every stage loop is a `fori_loop` with dynamic ref indexing, so Mosaic
    reuses one stage's worth of stack temporaries;
  - A and B are PACKED into one (N, nx, nx+nu, LANES) record; ALL data
    stays VMEM-resident while the instance fits the budget (the whole
    reference envelope N <= 60 does). For very long horizons the record
    plus the Z gain tensor (`stream_big`) and the P stack (`stream_p`)
    live in HBM and move in double-buffered CHUNKS of C stages
    (prefetch chunk i+1 while chunk i computes; writes flushed per
    chunk);
  - bound masks are DERIVED in-kernel from the sanitized bound values
    (+-inf is encoded as +-1e18 by the host wrapper) instead of being
    carried as four extra mask tensors;
  - slack/dual state lives in the OUTPUT refs (warm-start outputs);
    cold solves (the deployed default) compile the warm machinery away
    entirely via the static `warm_on` flag;
  - predictor (affine) directions are kept in their own ddxa/ddua
    buffers and the per-bound predictor slack/dual directions are
    recomputed on the fly wherever the Mehrotra targets need them —
    cheaper in VMEM than storing all eight direction families;
  - no transposed copies are stored; transposes happen on the fly.

Semantics match `qp/ipm.py` (same init, Mehrotra + Gondzio clipping,
f32 floors, equilibrated fail-safe Cholesky, best-iterate on dx/du —
tracked directly in the dx/du OUTPUT refs). Infinite bounds are masked
exactly like the XLA path; SOFT bounds (acados ns>0) run in-kernel via
the qp/soft.py stage-wise elimination (see `_ipm_kernel` docstring).

Fusion modes (trace-time static flags):
  - plain: host-assembled QPData in, deltas out (`pallas_box_qp_solve`);
  - fuse_lin (r3, B=1): in-kernel RK4 linearization + cost/bounds/dx0
    assembly — the single-kernel RTI tick (`pallas_fused_rti_solve`);
  - fuse_cost (r5, any B): host linearization, in-kernel
    cost/bounds/dx0 assembly AND iterate update — the batched
    fused-assembly tick (`pallas_batched_fused_tick`); outputs are the
    updated ABSOLUTE iterate plus step-norm/violation diag rows.
`mehrotra=False` (r5) compiles single-solve iterations (no predictor):
a measured NEGATIVE kept for the record — 1.4x cheaper per iteration,
stalls at merit ~6.8 vs 2.8e-2 (docs/DESIGN.md §7 r5b); leave True.
One deliberate difference: the returned slacks/duals (and therefore the
warm-start output) are the LAST iterate's, not the best-KKT iterate's —
an interior warm start wants the most centered point, and it saves 8
best-tracking buffers of VMEM.
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
# VMEM facts (hardware-probed, round 3): the oft-quoted "16 MB" VMEM
# budget is XLA's DEFAULT scoped-vmem reservation, not the physical
# limit — a probe kernel allocates and uses 120 MB of VMEM scratch on
# this v5e (physical VMEM is 128 MiB; the scaling-book figure). The
# wrapper below therefore computes the kernel's actual buffer bytes and
# requests that much (+ stack margin) via CompilerParams; HBM streaming
# only engages when the RESIDENT estimate exceeds _RESIDENT_BUDGET.
_RESIDENT_BUDGET = 88 * 1024 * 1024
# Stack margin on top of the modeled buffer bytes: Mosaic's value stack
# grows with the instance (r4 evidence: the fused N=60 kernel needs
# 47.57 MiB against 36.5 MiB of modeled buffers — the flat 10 MiB margin
# of r3 came up 1.07 MiB short and the compile died with a scoped-vmem
# stack OOM, the root cause of BENCH_r03's rt6f_n60_solve_hz = 0.0).
# Flat floor + 30% proportional part keeps every resident config well
# clear while staying under the 120 MB hardware-probed cap (N=120 fused:
# 72.5 MiB buffers -> 106 MiB request).
_VMEM_STACK_MARGIN = 12 * 1024 * 1024
_VMEM_CAP = 120 * 1024 * 1024
_BIG = 1e20     # slack sentinel for masked (infinite) bounds
_BIGB = 1e18    # finite stand-in for an infinite bound value
_MTHR = 5e17    # |bound| above this is treated as infinite (mask = 0)

# NOTE: the kernel deliberately does NOT use input_output_aliases.
# Round-3 hardware debugging found a real miscompile class: identical
# zero warm-start inputs are CSE'd/hoisted by XLA inside scan bodies, so
# aliasing maps ONE deduplicated buffer onto SEVERAL outputs and the
# kernel's in-place writes clobber each other (symptom: the solve
# returns its seed iterate, only when nested in lax.scan, only on real
# hardware). Cold solves skip the warm machinery entirely via the
# static `warm_on` flag instead.


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
    """(n, n, B) SPD -> inverse (n, n, B), unrolled over entries.

    Jacobi-equilibrated and FAIL-SAFE (mirrors
    qp/smallalg.py::chol_inverse): the IPM's barrier-modified Huu mixes
    diagonal scales across ~14 orders of magnitude (R_swivel*dt ~ 3e-7 vs
    sigma_max 1e7), so the matrix is scaled to unit diagonal before
    factorization; and when the input is detected indefinite (f32
    cancellation degrades the Riccati P's small eigendirections at
    |P| ~ 1e7) the ZERO matrix is returned per lane — K collapses to 0
    for that stage instead of exploding the recursion to inf/NaN."""
    n = M.shape[0]
    diag_ok = None
    for i in range(n):
        c = M[i][i] > 0.0
        diag_ok = c if diag_ok is None else (diag_ok & c)
    dscale = [jnp.sqrt(jnp.maximum(M[i][i], 1e-30)) for i in range(n)]
    ent = [[M[i][j] / (dscale[i] * dscale[j]) for j in range(n)]
           for i in range(n)]                              # (B,) each
    L = [[None] * n for _ in range(n)]
    min_piv = None
    for j in range(n):
        s = ent[j][j]
        for p in range(j):
            s = s - L[j][p] * L[j][p]
        min_piv = s if min_piv is None else jnp.minimum(min_piv, s)
        d = jnp.sqrt(jnp.maximum(s, 1e-12))
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
    ok = diag_ok & (min_piv > 1e-10)               # (B,)
    out_rows = []
    for i in range(n):
        cols = []
        for j in range(n):
            s = None
            for k in range(max(i, j), n):
                t = Li[k][i] * Li[k][j]
                s = t if s is None else s + t
            cols.append(jnp.where(ok, s / (dscale[i] * dscale[j]), 0.0))
        out_rows.append(jnp.stack(cols, axis=0))   # (n, B)
    return jnp.stack(out_rows, axis=0)             # (n, n, B)


# ------------------------------- the kernel -------------------------------

def _ipm_kernel(AB_ref, c_ref, Qs_ref, Qt_ref, q_ref, R1_ref, R1g_ref, r_ref,
                lbx_ref, ubx_ref, lbu_ref, ubu_ref, dx0_ref, wvalid_ref,
                wslx_ref, wsux_ref, wllx_ref, wlux_ref,
                wslu_ref, wsuu_ref, wllu_ref, wluu_ref,
                Zlx_ref, zlx_ref, Zux_ref, zux_ref,
                Zlu_ref, zlu_ref, Zuu_ref, zuu_ref,
                xb_ref, ub_ref, sp_ref,
                x0_ref, yrx_ref, yru_ref, yre_ref,
                lbxa_ref, ubxa_ref, lbua_ref, ubua_ref,
                dx_out, du_out, diag_out, P_hbm, Z_hbm,
                slx_s, sux_s, lam_lx_s, lam_ux_s,
                slu_s, suu_s, lam_lu_s, lam_uu_s,
                P_s, psem, AB_s, absem, Zsl_s, zsem,
                Z_s, Hinv_s, kff_s,
                dx_s, du_s,
                bm_s,
                ddx_s, ddu_s, ddxa_s, ddua_s,
                qr_s, rr_s, req_s,
                tlx_s, glx_s, tux_s, gux_s,
                tlu_s, glu_s, tuu_s, guu_s,
                ab_s, c_s,
                qf_s, rf_s, lbxd_s, ubxd_s, lbud_s, ubud_s,
                *, N: int, nx: int, nu: int, iters: int, mu0: float,
                alpha_frac: float, reg: float, s_min: float, mu_min: float,
                sigma_max: float, lam_max: float, eps_s: float,
                stream_p: bool, stream_big: bool, chunk: int, soft: bool,
                warm_on: bool, fuse_lin: bool = False, fuse_cost: bool = False,
                model=None, dt_dyn: float = 0.0, nsteps: int = 1,
                mehrotra: bool = True):
    """NOTE on naming: slx_s..lam_uu_s are OUTPUT refs (warm-start outputs)
    doubling as the iterate's slack/dual state; the wslx_ref.. inputs are
    aliased onto them and must only be read before the init pass writes.
    dx_out/du_out double as the best-iterate buffers (VMEM economy).

    SOFT BOUNDS (static flag `soft`; acados ns>0 analog, same stage-wise
    elimination as qp/soft.py): each bound group gains a violation pair
    (t, gam) with penalty cost z*t + Z/2 t^2. Hard entries carry the
    sentinel Z = 1e18, which makes the eliminated barrier weight
    sig_eff = sig_s (Z + sig_t)/(Z + sig_s + sig_t) collapse to sig_s
    EXACTLY in f32 (1e18 + 1e7 rounds to 1e18) — the Riccati
    factorization is uniform; only the t/gam state, the RHS w-correction
    and the extra fraction-to-boundary ratios are sm-gated. soft=False
    compiles the identical hard kernel (all extra refs are dummies)."""
    f32 = jnp.float32
    Bt = dx0_ref.shape[-1]

    eye_u = jnp.broadcast_to(jnp.eye(nu, dtype=f32)[:, :, None],
                             (nu, nu, Bt))
    eye_x = jnp.broadcast_to(jnp.eye(nx, dtype=f32)[:, :, None],
                             (nx, nx, Bt))

    # ---- stage-sweep driver over streamed/resident data ----------------
    # Streams: the packed A/B record (input), the Z gains and P Hessians
    # (HBM dumps in streamed mode). Rows move in CHUNKS of C stages:
    # reads are double-buffered (prefetch chunk i+1 while chunk i
    # computes — the canonical TPU DMA-pipeline pattern), writes are
    # buffered in the chunk slab and flushed with one blocking DMA per
    # chunk. vs the round-2 per-stage blocking DMAs this cuts the DMA
    # *count* by C and hides the read latency under compute entirely.
    C = chunk

    def _cp_rd(hbm, slab, sem, slot, base):
        return pltpu.make_async_copy(hbm.at[pl.ds(base, C)],
                                     slab.at[slot], sem.at[slot])

    def _cp_wr(hbm, slab, sem, slot, base):
        return pltpu.make_async_copy(slab.at[slot],
                                     hbm.at[pl.ds(base, C)], sem.at[slot])

    def _ab_direct(k):
        blk = ab_s[k] if fuse_lin else AB_ref[k]
        return blk[:, :nx], blk[:, nx:]

    def _c(k):
        """Affine shooting defect c_k: computed in-kernel by the fused
        linearization prologue (`fuse_lin`) or read from the input ref."""
        return c_s[k] if fuse_lin else c_ref[k]

    def sweep(body, carry0, *, reverse, ab=False, p_read=False,
              z_read=False, p_write=False, z_write=False):
        """Run body(k, get, put, carry) -> carry over stages k = 0..N-1
        (descending when reverse). get('AB') -> (A_k, B_k);
        get('P') -> P_{k+1} (the Riccati bwd sweep's +1 offset);
        get('Z') -> Z_k; put('P'/'Z', v) stores row k. Trace-time
        specialization keeps exactly one variant in the compiled kernel.
        """
        reads = []
        if ab and stream_big:
            reads.append((AB_ref, AB_s, absem, 0))
        if z_read and stream_big:
            reads.append((Z_hbm, Zsl_s, zsem, 0))
        if p_read and stream_p:
            reads.append((P_hbm, P_s, psem, 1))
        writes = []
        if p_write and stream_p:
            writes.append((P_hbm, P_s, psem))
        if z_write and stream_big:
            writes.append((Z_hbm, Zsl_s, zsem))

        if not reads and not writes:  # fully resident
            def row_d(i, carry):
                k = N - 1 - i if reverse else i

                def get(name):
                    if name == "AB":
                        return _ab_direct(k)
                    if name == "P":
                        return P_s[k + 1]
                    return Z_s[k]

                def put(name, v):
                    if name == "P":
                        P_s[k] = v
                    else:
                        Z_s[k] = v

                return body(k, get, put, carry)

            return jax.lax.fori_loop(0, N, row_d, carry0)

        nc = N // C

        def start_reads(slot, ci):
            for hbm, slab, sem, off in reads:
                _cp_rd(hbm, slab, sem, slot, ci * C + off).start()

        def wait_reads(slot, ci):
            for hbm, slab, sem, off in reads:
                _cp_rd(hbm, slab, sem, slot, ci * C + off).wait()

        start_reads(0, nc - 1 if reverse else 0)

        def chunk_body(i, carry):
            ci = nc - 1 - i if reverse else i
            slot = i % 2

            @pl.when(i + 1 < nc)
            def _():
                start_reads(1 - slot, ci - 1 if reverse else ci + 1)

            wait_reads(slot, ci)
            base = ci * C

            def row(j, carry):
                r = C - 1 - j if reverse else j
                k = base + r

                def get(name):
                    if name == "AB":
                        if stream_big:
                            blk = AB_s[slot, r]
                            return blk[:, :nx], blk[:, nx:]
                        return _ab_direct(k)
                    if name == "P":
                        return P_s[slot, r] if stream_p else P_s[k + 1]
                    return Zsl_s[slot, r] if stream_big else Z_s[k]

                def put(name, v):
                    if name == "P":
                        if stream_p:
                            P_s[slot, r] = v
                        else:
                            P_s[k] = v
                    else:
                        if stream_big:
                            Zsl_s[slot, r] = v
                        else:
                            Z_s[k] = v

                return body(k, get, put, carry)

            carry = jax.lax.fori_loop(0, C, row, carry)
            for hbm, slab, sem in writes:  # flush this chunk's rows
                cp = _cp_wr(hbm, slab, sem, slot, base)
                cp.start()
                cp.wait()
            return carry

        return jax.lax.fori_loop(0, nc, chunk_body, carry0)

    # ---- masks derived from sanitized bound values ----
    def m_lo(b):
        return (b > -_MTHR).astype(f32)

    def m_hi(b):
        return (b < _MTHR).astype(f32)

    if warm_on:
        use_warm = wvalid_ref[0] > 0.5               # (B,) bool

        # per-entry isfinite guard: a single NaN/inf in a previous tick's
        # slacks/duals must fall back to the cold init, not poison the chain
        def blend_s(w, cold, mask):
            w = jnp.clip(w, s_min * 1e-2, _BIG)
            ok = use_warm[None, :] & (mask > 0.5) & jnp.isfinite(w)
            return jnp.where(ok, w, cold)

        def blend_l(w, cold, mask):
            w = jnp.maximum(jnp.clip(w, 0.0, lam_max), 1e-8)
            ok = use_warm[None, :] & (mask > 0.5) & jnp.isfinite(w)
            return jnp.where(ok, w, cold)
    else:  # cold path: the warm refs are dummies — never read them
        def blend_s(w, cold, mask):
            return cold

        def blend_l(w, cold, mask):
            return cold

    # ---- fused cost/bounds (single-kernel tick, part 2) -----------------
    # With fuse_lin OR fuse_cost the kernel also derives the delta-form
    # cost gradients and box bounds from the iterate (`build_qp`'s
    # q/r/bounds algebra, sqp/rti.py): q_k = Qs (xbar_k - yref_k) with Qs
    # ALREADY dt-scaled by the host (terminal row unscaled, matching
    # build_qp), bounds are single-row absolute boxes minus the iterate.
    # After the fill the input names are REBOUND to the scratch refs, so
    # the whole IPM below is oblivious. dx0 is derived in init
    # (x0 - xbar_0). The GRADIENT uses R1g_ref — it differs from the
    # Hessian R1_ref when `SolverConfig.qp_r_floor` damps
    # weakly-determined control subspaces QP-side only (sqp/rti.py::
    # qp_hessian_R); without a floor the host passes the same tensor.
    fuse_any = fuse_lin or fuse_cost
    if fuse_any:
        def cost_fill(k, _):
            qf_s[k] = _contractT_vec(Qs_ref[...], xb_ref[k] - yrx_ref[k])
            rf_s[k] = _contractT_vec(R1g_ref[...], ub_ref[k] - yru_ref[k])
            lbxd_s[k] = lbxa_ref[...] - xb_ref[k + 1]
            ubxd_s[k] = ubxa_ref[...] - xb_ref[k + 1]
            lbud_s[k] = lbua_ref[...] - ub_ref[k]
            ubud_s[k] = ubua_ref[...] - ub_ref[k]
            return 0

        jax.lax.fori_loop(0, N, cost_fill, 0)
        qf_s[N] = _contractT_vec(Qt_ref[...], xb_ref[N] - yre_ref[...])
        q_ref, r_ref = qf_s, rf_s
        lbx_ref, ubx_ref = lbxd_s, ubxd_s
        lbu_ref, ubu_ref = lbud_s, ubud_s

    # ---- bound-group descriptors (trace-time tuple) ---------------------
    # index: 0 bound ref, 1 sign (+1 lower/-1 upper), 2 mask fn, 3 slack,
    # 4 dual, 5 violation t, 6 violation dual gam, 7 quad penalty Z,
    # 8 linear penalty z, 9 is-state-group. The per-group IPM algebra is
    # written ONCE below and unrolled over this tuple at trace time.
    GROUPS = (
        (lbx_ref, 1.0, m_lo, slx_s, lam_lx_s, tlx_s, glx_s,
         Zlx_ref, zlx_ref, True),
        (ubx_ref, -1.0, m_hi, sux_s, lam_ux_s, tux_s, gux_s,
         Zux_ref, zux_ref, True),
        (lbu_ref, 1.0, m_lo, slu_s, lam_lu_s, tlu_s, glu_s,
         Zlu_ref, zlu_ref, False),
        (ubu_ref, -1.0, m_hi, suu_s, lam_uu_s, tuu_s, guu_s,
         Zuu_ref, zuu_ref, False),
    )

    def g_mask(g, k):
        return g[2](g[0][k])

    def g_sm(g, k, m):
        """Soft mask: finite bound AND a non-sentinel quadratic penalty."""
        return m * (g[7][k] < _MTHR).astype(f32)

    def g_dval(g, k, ddx_ref, ddu_ref):
        return ddx_ref[k + 1] if g[9] else ddu_ref[k]

    def g_rs(g, k, m):
        """Slack residual s - (sgn (v - b) + t); t enters on soft rows."""
        gap = g[1] * ((dx_s[k + 1] if g[9] else du_s[k]) - g[0][k])
        if soft:
            gap = gap + jnp.where(g_sm(g, k, m) > 0.5, g[5][k], 0.0)
        return g[3][k] - gap

    def g_sig(g, k, m):
        """(sig_s capped, sig_eff uncapped-sum-ready, den) of one group.

        sig_eff = sig_s (Z + sig_t)/(Z + sig_s + sig_t): exact sig_s on
        hard rows (Z = 1e18 absorbs the 1e7-capped sigmas in f32)."""
        sig_s = jnp.minimum(m * g[4][k] / g[3][k], sigma_max)
        if not soft:
            return sig_s, sig_s, None
        sig_t = g[6][k] / g[5][k]          # 0 on hard rows (gam=0, t=BIG)
        den = g[7][k] + sig_s + sig_t
        return sig_s, sig_s * (g[7][k] + sig_t) / den, den

    def g_w(g, k, m, sm, Ts, Tt, sig_s):
        """Soft elimination scalar w (qp/soft.py rhs_w); 0 on hard rows.
        Hard-row arithmetic hits Z*t ~ 1e38 -> inf, masked off by the
        where (no NaNs: inf never meets inf with these signs)."""
        s, lam, t, gam = g[3][k], g[4][k], g[5][k], g[6][k]
        r_t = g[8][k] + g[7][k] * t - lam - gam
        w = (-r_t + (Ts / s - lam) + (Tt / t - gam)
             + sig_s * g_rs(g, k, m))
        return jnp.where(sm > 0.5, w, 0.0)


    # ---- fused linearization prologue (single-kernel RTI tick) ----
    # Computes A/B (RK4 forward sensitivities) and the shooting defects c
    # IN-KERNEL from the iterate (xbar, ubar) and the 25-dim stage
    # parameters, replacing the separate XLA linearizer + the lane-
    # duplicated A/B HBM round-trip (the acados analog: one solver call
    # does linearize+solve, `blastermodel.py:277-289`). Layout trick:
    # B=1 deployed solves leave the 128 lanes carrying copies of one
    # problem, so the prologue REPURPOSES the lane axis as (node-in-group
    # m, tangent column j): npg = LANES//(nx+nu) shooting nodes per
    # group, each spanning nx+nu lanes, one `jax.jvp` through the
    # elementwise `dynamics/fastlin.py::_rk4_rows` per group of nodes.
    # Same Butcher tableau + derivative mode as every other linearizer —
    # identical numbers, zero inter-kernel dispatch.
    if fuse_lin:
        from mpc_blaster_tpu.dynamics.blaster import BlasterParams as _BP
        from mpc_blaster_tpu.dynamics.fastlin import FAMILIES, _rk4_rows

        # model = (family, mass, g, arm_x, arm_y, yaw_c, Jx, Jy, Jz):
        # the family name selects the rows-form ODE (r4 registry —
        # "blaster", "blaster_dist" (offset-free, disturbances in extra
        # stage-param rows) and "quad13" all run through this prologue)
        fam = model[0]
        mc = model[1:]
        ode_rows = FAMILIES[fam]
        bp = _BP(mass=mc[0], gravity=mc[1],
                 inertia=(mc[5], mc[6], mc[7]),
                 arm_length_x=mc[2], arm_length_y=mc[3],
                 yaw_coefficient=mc[4])
        C_t = nx + nu                    # tangent columns per node
        npg = max(LANES // C_t, 1)       # nodes packed per lane group
        G = (N + npg - 1) // npg
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, Bt), 1)
        mcol = lane % C_t                # tangent column j of this lane
        mnode = lane // C_t              # node-within-group m
        active = (mnode < npg).astype(f32)
        rx = jax.lax.broadcasted_iota(jnp.int32, (nx, 1), 0)
        ru = jax.lax.broadcasted_iota(jnp.int32, (nu, 1), 0)
        xseed = (mcol == rx).astype(f32) * active          # (nx, Bt)
        useed = (mcol == (nx + ru)).astype(f32) * active   # (nu, Bt)

        def lin_group(g, _):
            def sel(ref, n_max):
                # place node g*npg+m's (lane-uniform) row onto its lane
                # span via masked selects; clamped duplicates on the last
                # partial group write identical data (harmless)
                acc = ref[jnp.minimum(g * npg, n_max)]
                for m in range(1, npg):
                    v = ref[jnp.minimum(g * npg + m, n_max)]
                    acc = jnp.where(mnode == m, v, acc)
                return acc

            Xg = sel(xb_ref, N - 1)
            Ug = sel(ub_ref, N - 1)
            Pg = sel(sp_ref, N - 1)

            def f(x, u):
                return _rk4_rows(x, u, Pg, bp, dt_dyn, nsteps,
                                 ode=ode_rows)

            y, yd = jax.jvp(f, (Xg, Ug), (xseed, useed))
            for m in range(npg):
                k_m = jnp.minimum(g * npg + m, N - 1)
                cols = [jnp.broadcast_to(yd[:, m * C_t + j:m * C_t + j + 1],
                                         (nx, Bt))
                        for j in range(C_t)]
                ab_s[k_m] = jnp.stack(cols, axis=1)   # (nx, nx+nu, Bt)
                ypr = jnp.broadcast_to(y[:, m * C_t:m * C_t + 1], (nx, Bt))
                c_s[k_m] = ypr - xb_ref[k_m + 1]
            return 0

        jax.lax.fori_loop(0, G, lin_group, 0)

    # ---- initial point: rollout (du=0) + mask-aware 10%-inset clamp,
    # centered slacks/duals, then warm blend (reads the aliased warm
    # inputs BEFORE overwriting them) ----
    if fuse_any:
        dx_s[0] = x0_ref[...] - xb_ref[0]
    else:
        dx_s[0] = dx0_ref[...]

    def clamp_into(v, lb, ub, ml, mu_):
        both = (ml > 0.5) & (mu_ > 0.5)
        w = jnp.where(both, ub - lb, 1.0)
        lo = jnp.where(ml > 0.5, lb + 0.1 * w, -_BIG)
        hi = jnp.where(mu_ > 0.5, ub - 0.1 * w, _BIG)
        return jnp.clip(v, lo, jnp.maximum(hi, lo))

    def _soft_init(g, k, m, v):
        """(t, gam, t_eff) of one group at the initial point: O(1)-offset
        violation slack on soft rows (qp/soft.py init_group), inert
        (BIG, 0) on hard rows."""
        sm = g_sm(g, k, m)
        gap = g[1] * (v - g[0][k])
        t = jnp.where(sm > 0.5, jnp.maximum(-gap, 0.0) + 0.1, _BIG)
        gam = jnp.where(sm > 0.5, mu0 / t, 0.0)
        g[5][k] = t
        g[6][k] = gam
        return jnp.where(sm > 0.5, t, 0.0)

    def _hard_only(g, k, m):
        """Mask of rows the init clamp may push inside: hard rows only
        (soft rows may start in violation — their t covers it)."""
        if not soft:
            return m
        return m * (1.0 - g_sm(g, k, m))

    def init_roll(k, get, put, _):
        A_k, B_k = get("AB")
        nxt = _matvec(A_k, dx_s[k]) + _c(k)
        lb, ub = lbx_ref[k], ubx_ref[k]
        mlx, mux = m_lo(lb), m_hi(ub)
        nxt = clamp_into(nxt, lb, ub, _hard_only(GROUPS[0], k, mlx),
                         _hard_only(GROUPS[1], k, mux))
        dx_s[k + 1] = nxt
        tlx = tux = tlu = tuu = 0.0
        if soft:
            tlx = _soft_init(GROUPS[0], k, mlx, nxt)
            tux = _soft_init(GROUPS[1], k, mux, nxt)
        c_slx = jnp.where(mlx > 0.5,
                          jnp.maximum(nxt - lb + tlx, s_min), _BIG)
        c_sux = jnp.where(mux > 0.5,
                          jnp.maximum(ub - nxt + tux, s_min), _BIG)
        c_llx = jnp.where(mlx > 0.5, mu0 / c_slx, 0.0)
        c_lux = jnp.where(mux > 0.5, mu0 / c_sux, 0.0)
        slx_s[k] = blend_s(wslx_ref[k], c_slx, mlx)
        sux_s[k] = blend_s(wsux_ref[k], c_sux, mux)
        lam_lx_s[k] = jnp.where(mlx > 0.5,
                                blend_l(wllx_ref[k], c_llx, mlx), 0.0)
        lam_ux_s[k] = jnp.where(mux > 0.5,
                                blend_l(wlux_ref[k], c_lux, mux), 0.0)

        lbu_k, ubu_k = lbu_ref[k], ubu_ref[k]
        mlu, muu = m_lo(lbu_k), m_hi(ubu_k)
        du_k = clamp_into(jnp.zeros((nu, Bt), f32), lbu_k, ubu_k,
                          _hard_only(GROUPS[2], k, mlu),
                          _hard_only(GROUPS[3], k, muu))
        du_s[k] = du_k
        if soft:
            tlu = _soft_init(GROUPS[2], k, mlu, du_k)
            tuu = _soft_init(GROUPS[3], k, muu, du_k)
        c_slu = jnp.where(mlu > 0.5,
                          jnp.maximum(du_k - lbu_k + tlu, s_min), _BIG)
        c_suu = jnp.where(muu > 0.5,
                          jnp.maximum(ubu_k - du_k + tuu, s_min), _BIG)
        c_llu = jnp.where(mlu > 0.5, mu0 / c_slu, 0.0)
        c_luu = jnp.where(muu > 0.5, mu0 / c_suu, 0.0)
        slu_s[k] = blend_s(wslu_ref[k], c_slu, mlu)
        suu_s[k] = blend_s(wsuu_ref[k], c_suu, muu)
        lam_lu_s[k] = jnp.where(mlu > 0.5,
                                blend_l(wllu_ref[k], c_llu, mlu), 0.0)
        lam_uu_s[k] = jnp.where(muu > 0.5,
                                blend_l(wluu_ref[k], c_luu, muu), 0.0)
        return 0

    sweep(init_roll, 0, reverse=False, ab=True)

    # per-problem complementarity-pair count from the derived masks
    # (soft rows contribute their (t, gam) pair as well)
    def count_ineq(k, acc):
        total = (jnp.sum(m_lo(lbx_ref[k]), axis=0)
                 + jnp.sum(m_hi(ubx_ref[k]), axis=0)
                 + jnp.sum(m_lo(lbu_ref[k]), axis=0)
                 + jnp.sum(m_hi(ubu_ref[k]), axis=0))
        if soft:
            total = total + (
                jnp.sum(m_lo(lbx_ref[k]) * (Zlx_ref[k] < _MTHR), axis=0)
                + jnp.sum(m_hi(ubx_ref[k]) * (Zux_ref[k] < _MTHR), axis=0)
                + jnp.sum(m_lo(lbu_ref[k]) * (Zlu_ref[k] < _MTHR), axis=0)
                + jnp.sum(m_hi(ubu_ref[k]) * (Zuu_ref[k] < _MTHR),
                          axis=0))
        return acc + total

    n_ineq = jnp.maximum(
        jax.lax.fori_loop(0, N, count_ineq, jnp.zeros((Bt,), f32)), 1.0)

    def comp_sum():
        def body(k, acc):
            acc = (acc
                   + jnp.sum(m_lo(lbx_ref[k]) * slx_s[k] * lam_lx_s[k],
                             axis=0)
                   + jnp.sum(m_hi(ubx_ref[k]) * sux_s[k] * lam_ux_s[k],
                             axis=0)
                   + jnp.sum(m_lo(lbu_ref[k]) * slu_s[k] * lam_lu_s[k],
                             axis=0)
                   + jnp.sum(m_hi(ubu_ref[k]) * suu_s[k] * lam_uu_s[k],
                             axis=0))
            if soft:
                # hard rows are inert by construction: t = BIG, gam = 0
                acc = acc + (jnp.sum(tlx_s[k] * glx_s[k], axis=0)
                             + jnp.sum(tux_s[k] * gux_s[k], axis=0)
                             + jnp.sum(tlu_s[k] * glu_s[k], axis=0)
                             + jnp.sum(tuu_s[k] * guu_s[k], axis=0))
            return acc
        return jax.lax.fori_loop(0, N, body, jnp.zeros((Bt,), f32))

    def soft_rt_max():
        """max |z + Z t - lam - gam| over soft rows (soft stationarity,
        part of the best-iterate merit exactly as in qp/soft.py)."""
        if not soft:
            return jnp.zeros((Bt,), f32)

        def body(k, acc):
            for g in GROUPS:
                m = g_mask(g, k)
                sm = g_sm(g, k, m)
                r_t = jnp.where(sm > 0.5,
                                g[8][k] + g[7][k] * g[5][k]
                                - g[4][k] - g[6][k], 0.0)
                acc = jnp.maximum(acc, jnp.max(jnp.abs(r_t), axis=0))
            return acc
        return jax.lax.fori_loop(0, N, body, jnp.zeros((Bt,), f32))

    def kkt():
        """(stat (B,), eq (B,)) of the current iterate via adjoint sweep.

        SIDE EFFECT: refreshes req_s with the iterate's shooting residuals
        (`pred` IS the next iteration's req), fusing away what used to be
        a separate compute_req pass over the A/B record — one fewer
        N-stage sweep AND one fewer full AB stream read per iteration."""
        lam0 = (_contractT_vec(Qt_ref[...], dx_s[N]) + q_ref[N]
                - (lam_lx_s[N - 1] - lam_ux_s[N - 1]))

        def bwd(k, get, put, carry):
            lam, stat, eq = carry
            A_k, B_k = get("AB")
            su = (_contractT_vec(R1_ref[...], du_s[k]) + r_ref[k]
                  + _contractT_vec(B_k, lam)
                  - (lam_lu_s[k] - lam_uu_s[k]))
            stat = jnp.maximum(stat, jnp.max(jnp.abs(su), axis=0))
            pred = (_matvec(A_k, dx_s[k])
                    + _matvec(B_k, du_s[k]) + _c(k) - dx_s[k + 1])
            req_s[k] = pred
            eq = jnp.maximum(eq, jnp.max(jnp.abs(pred), axis=0))
            lam_new = (_contractT_vec(Qs_ref[...], dx_s[k]) + q_ref[k]
                       + _contractT_vec(A_k, lam))
            km1 = jnp.maximum(k - 1, 0)
            bnd = lam_lx_s[km1] - lam_ux_s[km1]
            lam_new = lam_new - jnp.where(k >= 1, bnd, 0.0)
            return (lam_new, stat, eq)

        z = jnp.zeros((Bt,), f32)
        _, stat, eq = sweep(bwd, (lam0, z, z), reverse=True, ab=True)
        return stat, eq

    # seed best iterate (kept in the dx/du OUTPUT refs — no extra VMEM);
    # this kkt() call also seeds req_s for the first iteration
    st0, eq0 = kkt()
    dx_out[...] = dx_s[...]
    du_out[...] = du_s[...]
    bm_s[...] = (st0 + eq0 + soft_rt_max()
                 + comp_sum() / n_ineq)[None, :]

    def _stage_factor(P, k, A_k, B_k):
        """One backward Riccati stage: P_{k+1} -> (P_k, Z_k, Hinv_k)."""
        PA = _contractT(P, A_k)                    # P'A = PA (sym)
        PB = _contractT(P, B_k)
        sig_u = jnp.minimum(
            g_sig(GROUPS[2], k, g_mask(GROUPS[2], k))[1]
            + g_sig(GROUPS[3], k, g_mask(GROUPS[3], k))[1], sigma_max)
        Huu = (_contractT(B_k, PB) + R1_ref[...] + reg * eye_u
               + sig_u[:, None, :] * eye_u)
        Hux = _contractT(B_k, PA)                  # (nu, nx, B)
        Hinv = _chol_inverse_lanes(Huu)
        Z = _contractT(Hinv, Hux)                  # Hinv Hux = -K
        Pk = Qs_ref[...] + _contractT(A_k, PA) - _contractT(Hux, Z)
        km1 = jnp.maximum(k - 1, 0)
        sig_x = jnp.minimum(
            g_sig(GROUPS[0], km1, g_mask(GROUPS[0], km1))[1]
            + g_sig(GROUPS[1], km1, g_mask(GROUPS[1], km1))[1], sigma_max)
        sig_x = jnp.where(k >= 1, sig_x, 0.0)
        Pk = Pk + sig_x[:, None, :] * eye_x
        Pk = 0.5 * (Pk + jnp.swapaxes(Pk, 0, 1))
        return Pk, Z, Hinv

    def _terminal_P():
        sigN = jnp.minimum(
            g_sig(GROUPS[0], N - 1, g_mask(GROUPS[0], N - 1))[1]
            + g_sig(GROUPS[1], N - 1, g_mask(GROUPS[1], N - 1))[1],
            sigma_max)
        return Qt_ref[...] + sigN[:, None, :] * eye_x

    def factorize():
        PN = _terminal_P()
        if stream_p:
            # terminal row N flushed alone; chunked rows cover 0..N-1
            P_s[0, 0] = PN
            cp = pltpu.make_async_copy(P_s.at[0, 0], P_hbm.at[N],
                                       psem.at[0])
            cp.start()
            cp.wait()
        else:
            P_s[N] = PN

        def bwd(k, get, put, P):
            A_k, B_k = get("AB")
            Pk, Zk, Hinv = _stage_factor(P, k, A_k, B_k)
            put("P", Pk)
            put("Z", Zk)
            Hinv_s[k] = Hinv
            return Pk

        sweep(bwd, PN, reverse=True, ab=True, p_write=True, z_write=True)

    def g_b(g, k, Ts, Tt):
        """RHS forcing of one group (sgn folded): the hard-bound
        -sgn (T/s + sig_s r_s) plus the soft +sgn sig_s w / den
        correction. lam/s and T/s capped at sigma_max, mirroring
        qp/ipm.py: uncapped 1e12+ factors near degenerate bounds
        overflow the f32 Riccati products to inf and NaN the iterate."""
        m = g_mask(g, k)
        rs = g_rs(g, k, m)
        sig_s, _, den = g_sig(g, k, m)
        b = (jnp.clip(Ts / g[3][k], -sigma_max, sigma_max)
             + sig_s * rs)
        if soft:
            sm = g_sm(g, k, m)
            b = b - sm * sig_s * g_w(g, k, m, sm, Ts, Tt, sig_s) / den
        return -g[1] * m * b

    def rhs_grads(targets):
        """Build qr_s/rr_s. targets(k) -> ((Ts x4), (Tt x4)) per stage.

        Slack index k carries the bounds of STATE stage k+1 (states are
        bounded at stages 1..N), so bx_k shifts the gradient of stage k+1;
        stage 0 (pinned) gets no shift — same alignment as qp/ipm.py's
        `gx.at[1:].add(bx)`.
        """
        qr_s[0] = _contractT_vec(Qs_ref[...], dx_s[0]) + q_ref[0]

        def body(k, _):
            Ts, Tt = targets(k)
            bx = g_b(GROUPS[0], k, Ts[0], Tt[0]) \
                + g_b(GROUPS[1], k, Ts[1], Tt[1])
            bu = g_b(GROUPS[2], k, Ts[2], Tt[2]) \
                + g_b(GROUPS[3], k, Ts[3], Tt[3])
            is_term = (k + 1 == N)
            g_stage = _contractT_vec(Qs_ref[...], dx_s[k + 1]) + q_ref[k + 1]
            g_term = _contractT_vec(Qt_ref[...], dx_s[k + 1]) + q_ref[k + 1]
            qr_s[k + 1] = jnp.where(is_term, g_term, g_stage) + bx
            rr_s[k] = _contractT_vec(R1_ref[...], du_s[k]) + r_ref[k] + bu
            return 0

        jax.lax.fori_loop(0, N, body, 0)

    def solve_rhs(ddx_ref, ddu_ref):
        """Backward + forward sweeps with the current factor; directions
        land in (ddx_ref, ddu_ref)."""
        def bwd(k, get, put, p):
            A_k, B_k = get("AB")
            Pcp = _contractT_vec(get("P"), req_s[k]) + p
            Gu = rr_s[k] + _contractT_vec(B_k, Pcp)
            kff_s[k] = -_contractT_vec(Hinv_s[k], Gu)
            return (qr_s[k] + _contractT_vec(A_k, Pcp)
                    - _contractT_vec(get("Z"), Gu))

        sweep(bwd, qr_s[N], reverse=True, ab=True, p_read=True,
              z_read=True)

        ddx_ref[0] = jnp.zeros((nx, Bt), f32)

        def fwd(k, get, put, _):
            d = ddx_ref[k]
            A_k, B_k = get("AB")
            du_k = -_matvec(get("Z"), d) + kff_s[k]
            ddu_ref[k] = du_k
            ddx_ref[k + 1] = (_matvec(A_k, d) + _matvec(B_k, du_k)
                              + req_s[k])
            return 0

        sweep(fwd, 0, reverse=False, ab=True, z_read=True)

    # The stage-k x bounds apply to dx[k+1] (stages 1..N); slack index k.
    def group_dirs(g, k, Ts, Tt, ddx_ref, ddu_ref):
        """(ds, dlam, dt, dgam) of one group for the newton directions in
        ddx/ddu_ref. Masked-out (infinite) bounds get exactly-zero
        directions, so the BIG slacks / zero duals stay fixed points.
        Dual divides clamped to +-1e12: with s at the eps floor the raw
        divide reaches inf, and a_d*inf with a collapsed dual step
        (a_d = 0) is NaN (same guard as qp/ipm.py)."""
        m = g_mask(g, k)
        rs = g_rs(g, k, m)
        dv = g[1] * g_dval(g, k, ddx_ref, ddu_ref)
        s, lam = g[3][k], g[4][k]
        if soft:
            sm = g_sm(g, k, m)
            sig_s, _, den = g_sig(g, k, m)
            w = g_w(g, k, m, sm, Ts, Tt, sig_s)
            dt = sm * (w - sig_s * dv) / den
            t, gam = g[5][k], g[6][k]
            dgam = sm * jnp.clip((Tt - t * gam - gam * dt) / t,
                                 -1e12, 1e12)
        else:
            dt = 0.0
            dgam = None
        ds = m * (dv + dt - rs)
        dlam = m * jnp.clip((Ts - s * lam - lam * ds) / s, -1e12, 1e12)
        return ds, dlam, dt, dgam

    def all_dirs(k, targets, ddx_ref, ddu_ref):
        Ts, Tt = targets(k)
        return tuple(group_dirs(g, k, Ts[i], Tt[i], ddx_ref, ddu_ref)
                     for i, g in enumerate(GROUPS))

    def min_ratio(v, dv, tau, acc):
        r = jnp.where(dv < 0, -tau * v / jnp.where(dv < 0, dv, -1.0), _BIG)
        return jnp.minimum(acc, jnp.min(r, axis=0))

    def alphas_from(targets, tau, ddx_ref, ddu_ref):
        """Fraction-to-boundary over all stages with on-the-fly dirs."""
        def body(k, carry):
            a_p, a_d = carry
            dirs = all_dirs(k, targets, ddx_ref, ddu_ref)
            for (ds, dlam, dt, dgam), g in zip(dirs, GROUPS):
                a_p = min_ratio(g[3][k], ds, tau, a_p)
                a_d = min_ratio(g[4][k], dlam, tau, a_d)
                if soft:
                    a_p = min_ratio(g[5][k], dt, tau, a_p)
                    a_d = min_ratio(g[6][k], dgam, tau, a_d)
            return (a_p, a_d)

        ones = jnp.ones((Bt,), f32)
        a_p, a_d = jax.lax.fori_loop(0, N, body, (ones, ones))
        return jnp.minimum(a_p, 1.0), jnp.minimum(a_d, 1.0)

    def ipm_iteration(_it, _carry):
        mu_cur = comp_sum() / n_ineq                     # (B,)

        # req_s is already current: the previous iteration's closing kkt()
        # (or the seed kkt() before iteration 0) wrote this iterate's
        # shooting residuals.
        factorize()

        zx = jnp.zeros((nx, Bt), f32)
        zu = jnp.zeros((nu, Bt), f32)

        def zero_targets(k):
            return (zx, zx, zu, zu), (zx, zx, zu, zu)

        if mehrotra:
            # ---- predictor (affine scaling, target 0): directions land
            # in the dedicated ddxa/ddua buffers and are recomputed per
            # bound family on the fly wherever the Mehrotra targets need
            # them ----
            rhs_grads(zero_targets)
            solve_rhs(ddxa_s, ddua_s)

            def aff_dirs(k):
                return all_dirs(k, zero_targets, ddxa_s, ddua_s)

            a_p_aff, a_d_aff = alphas_from(zero_targets, 1.0, ddxa_s,
                                           ddua_s)

            def mu_aff_sum(k, acc):
                ap = a_p_aff[None, :]
                ad = a_d_aff[None, :]
                dirs = aff_dirs(k)
                for (ds, dlam, dt, dgam), g in zip(dirs, GROUPS):
                    m = g_mask(g, k)
                    acc = acc + jnp.sum(m * (g[3][k] + ap * ds)
                                        * (g[4][k] + ad * dlam), axis=0)
                    if soft:
                        sm = g_sm(g, k, m)
                        acc = acc + jnp.sum(sm * (g[5][k] + ap * dt)
                                            * (g[6][k] + ad * dgam),
                                            axis=0)
                return acc

            mu_aff = jax.lax.fori_loop(0, N, mu_aff_sum,
                                       jnp.zeros((Bt,), f32)) / n_ineq
            sigma = jnp.clip((mu_aff / jnp.maximum(mu_cur, mu_min)) ** 3,
                             0.0, 1.0)
            mu_t = jnp.maximum(sigma * mu_cur, mu_min)[None, :]  # (1, B)

            def clip_t(dv1, dv2):
                return jnp.clip(mu_t - dv1 * dv2, 0.05 * mu_t,
                                20.0 * mu_t)

            def cor_targets(k):
                dirs = aff_dirs(k)
                Ts = tuple(clip_t(ds, dlam) for ds, dlam, _, _ in dirs)
                if soft:
                    Tt = tuple(clip_t(dt, dgam)
                               for _, _, dt, dgam in dirs)
                else:
                    Tt = (zx, zx, zu, zu)
                return Ts, Tt
        else:
            # ---- single-solve iteration (r5 roofline experiment): skip
            # the predictor entirely — fixed centering sigma, no
            # second-order Mehrotra correction, no Gondzio target
            # clipping (the clip needs affine direction products). Halves
            # the per-iteration RHS sweeps; the A/B on hardware measures
            # what that costs in convergence (CLAUDE.md r2: plain
            # monotone-mu IPM diverges on this problem class — this is
            # the controlled version of that finding).
            mu_t = jnp.maximum(0.1 * mu_cur, mu_min)[None, :]

            def cor_targets(k):
                Ts = (mu_t, mu_t, mu_t, mu_t)
                Tt = (mu_t, mu_t, mu_t, mu_t) if soft \
                    else (zx, zx, zu, zu)
                return Ts, Tt

        # ---- corrector ----
        rhs_grads(cor_targets)
        solve_rhs(ddx_s, ddu_s)
        a_p, a_d = alphas_from(cor_targets, alpha_frac, ddx_s, ddu_s)
        ap = a_p[None, :]
        ad = a_d[None, :]

        # ---- update (per stage; stage-0 state pinned) ----
        def update(k, _):
            dirs = all_dirs(k, cor_targets, ddx_s, ddu_s)
            dx_s[k + 1] = dx_s[k + 1] + ap * ddx_s[k + 1]
            du_s[k] = du_s[k] + ap * ddu_s[k]
            for (ds, dlam, dt, dgam), g in zip(dirs, GROUPS):
                g[3][k] = jnp.maximum(g[3][k] + ap * ds, eps_s)
                g[4][k] = jnp.clip(g[4][k] + ad * dlam, 0.0, lam_max)
                if soft:
                    g[5][k] = jnp.maximum(g[5][k] + ap * dt, eps_s)
                    g[6][k] = jnp.clip(g[6][k] + ad * dgam, 0.0, lam_max)
            return 0

        jax.lax.fori_loop(0, N, update, 0)

        st, eq = kkt()
        m = st + eq + soft_rt_max() + comp_sum() / n_ineq   # (B,)
        better = (m < bm_s[0])[None, None, :]
        dx_out[...] = jnp.where(better, dx_s[...], dx_out[...])
        du_out[...] = jnp.where(better, du_s[...], du_out[...])
        bm_s[...] = jnp.where(better[0], m[None, :], bm_s[...])
        return _carry

    jax.lax.fori_loop(0, iters, ipm_iteration, 0)

    # Final diagnostics on the RETURNED iterate: copy best into the state
    # refs and rerun the KKT sweep (duals are last-iterate — stat is an
    # estimate, eq is exact). The slack/dual OUTPUT refs keep the last
    # iterate (best interior point for warm-starting the next tick).
    dx_s[...] = dx_out[...]
    du_s[...] = du_out[...]
    stf, eqf = kkt()
    # last-iterate duals can be garbage past convergence; fall back to the
    # best merit (an upper bound on the true stationarity residual)
    stf = jnp.where(jnp.isfinite(stf), jnp.minimum(stf, bm_s[0]), bm_s[0])
    zB = jnp.zeros((Bt,), f32)
    if fuse_cost:
        # ---- fold the RTI state update into the kernel (batched fused
        # tick, r5): dx_out/du_out leave as the UPDATED ABSOLUTE iterate
        # xbar + dx / ubar + du, and the per-problem step norms + worst
        # box violation of the new iterate (sqp/rti.py's RTIDiagnostics
        # tail) ride extra diag rows — the host-side elementwise passes
        # over (B, N, nx) tensors disappear entirely.
        def finx(k, acc):
            sx, vio = acc
            dxk = dx_out[k]
            sx = jnp.maximum(sx, jnp.max(jnp.abs(dxk), axis=0))
            xnew = xb_ref[k] + dxk
            dx_out[k] = xnew
            vio = jnp.maximum(vio, jnp.max(lbxa_ref[...] - xnew, axis=0))
            vio = jnp.maximum(vio, jnp.max(xnew - ubxa_ref[...], axis=0))
            return sx, vio

        sx, vio = jax.lax.fori_loop(0, N + 1, finx, (zB, zB))

        def finu(k, acc):
            su, vio = acc
            duk = du_out[k]
            su = jnp.maximum(su, jnp.max(jnp.abs(duk), axis=0))
            unew = ub_ref[k] + duk
            du_out[k] = unew
            vio = jnp.maximum(vio, jnp.max(lbua_ref[...] - unew, axis=0))
            vio = jnp.maximum(vio, jnp.max(unew - ubua_ref[...], axis=0))
            return su, vio

        su, vio = jax.lax.fori_loop(0, N, finu, (zB, vio))
        vio = jnp.maximum(vio, 0.0)
        diag_out[...] = jnp.stack([stf, eqf, bm_s[0], sx, su, vio], axis=0)
    else:
        diag_out[...] = jnp.stack([stf, eqf, bm_s[0], zB, zB, zB], axis=0)


# ------------------------------ host wrapper ------------------------------

def pallas_box_qp_solve(data: QPData, iters: int = 12, mu0: float = 1e-1,
                        alpha_frac: float = 0.995, reg: float = 1e-6,
                        interpret: bool = False,
                        stream_p: bool | None = None,
                        stream_big: bool | None = None,
                        warm=None, soft=None,
                        mehrotra: bool = True) -> QPSolution:
    """Batched QP solve. `data` fields carry a LEADING batch axis (B, ...).

    Requirements (the RTI/LINEAR_LS structure): stage cost Hessians
    identical across stages 0..N-1 (Q[:, 0] used) with a distinct terminal
    Q[:, N]; R identical across stages; f32. Bounds may be +-inf (handled
    via in-kernel masks, same semantics as `qp/ipm.py`).

    Per-stage Q/R is intentionally OUT of kernel scope (a design decision,
    not a TODO): no supported QP producer emits it — the RTI's LINEAR_LS
    cost is stage-invariant by construction (one W for every stage,
    `blastermodel.py:244-245`), and condensed QPs, the only per-stage-cost
    producer in the framework, also need cross terms S and dense general
    constraints, which are served by the square-root backend
    (`qp/sqrt_riccati.py`) instead. Generalizing would cost either
    ~N*nx^2*LANES VMEM (per-lane stage Hessians: ~8.9 MB at N=60 — over
    half the budget) or another HBM stream for data that is constant in
    every real workload.

    stream_p / stream_big: None picks by horizon — beyond ~N=20 the
    VMEM-resident P (stream_p) and then the A/B record plus Z gains
    (stream_big) no longer fit the 16 MB budget and are streamed through
    HBM with per-stage DMA; this is the configuration that runs the
    flagship N=60 problem on hardware.

    warm: optional `qp.ipm.IpmWarmStart` with leading batch axes (fields
    (B, N, nx|nu), valid (B,)). The result carries last-iterate
    slacks/duals, so `qp.ipm.warm_start_from(sol)` builds the next tick's
    warm start (see module docstring for the best-vs-last nuance).
    NOTE: per-tick cold starts are the deployed default (see
    `sqp/rti.py::rti_step_warm` caveat).

    soft: optional `qp.soft.SoftBounds` — per-component soft box bounds
    (acados ns>0 analog) solved IN-KERNEL via the same stage-wise
    elimination as `qp/soft.py` (hard rows carry the Z=1e18 sentinel, so
    the modified barrier weight collapses to the hard formula exactly in
    f32). Fields may be unbatched (N, nx|nu) (broadcast over the batch)
    or carry a leading (B,) axis. Soft solves do not support slack/dual
    warm starts (the violation pairs are not carried), and they lower
    the VMEM-residency threshold to N<=20 (the t/gam state plus the
    penalty inputs cost ~2.8 MB at N=30).

    `mu` in the result carries the best KKT merit (stat+eq+comp) per
    problem; kkt_stat/kkt_eq are folded into it.

    DIAGNOSTIC SEMANTICS (differs from `qp/ipm.py`): `kkt_eq` is exact on
    the returned (best) iterate; `kkt_stat` is an ESTIMATE — the
    stationarity sweep uses last-iterate duals (the kernel does not store
    per-iterate dual snapshots; VMEM), clipped by the best KKT merit,
    which upper-bounds the true residual. Callers comparing backends
    should compare `mu` (same definition in both) or re-derive
    stationarity host-side from the returned duals.
    """
    if soft is not None and warm is not None:
        raise ValueError("soft bounds do not support slack/dual warm "
                         "starts (violation pairs are not carried)")
    sol, _ = _pallas_box_qp_solve(data, warm, soft, None, iters=iters,
                                  mu0=mu0,
                                  alpha_frac=alpha_frac, reg=reg,
                                  interpret=interpret, stream_p=stream_p,
                                  stream_big=stream_big,
                                  mehrotra=mehrotra)
    return sol


def pallas_fused_rti_solve(xbar, ubar, stage_params, x0, Q, Q_t, R,
                           yref_x, yref_u, yref_e, lbx, ubx, lbu, ubu,
                           model: tuple, dt: float, num_steps: int = 1,
                           iters: int = 6, mu0: float = 1e-1,
                           alpha_frac: float = 0.995, reg: float = 1e-6,
                           interpret: bool = False, warm=None,
                           soft=None, R_grad=None) -> QPSolution:
    """Single-kernel RTI QP solve: the ENTIRE QP construction — RK4
    linearization (forward sensitivities + shooting defects), dt-scaled
    cost gradients, delta-form box bounds and the pinned dx0 — happens
    inside the IPM kernel (`fuse_lin` prologue); the host passes only the
    iterate, the OCP spec tensors and x0. The TPU analog of acados'
    fully-fused C tick where one solver call does linearize+condense+
    solve (`blastermodel.py:277-289`).

    Arguments (leading batch axis B == 1 everywhere):
      xbar (B, N+1, nx), ubar (B, N, nu), stage_params (B, N, np) — the
        linearization point and per-stage 25-dim POC parameters;
      x0 (B, nx) — measured state (pins dx0 = x0 - xbar_0 in-kernel);
      Q/Q_t/R — stage/terminal Hessians; Q and R must arrive ALREADY
        dt-scaled (build_qp's dtw*Q / dtw*R; Q_t unscaled) — loop
        invariant, so the scaling hoists out of deployed scans;
      yref_x (B, N, nx), yref_u (B, N, nu), yref_e (B, nx) — references;
      lbx/ubx (B, nx), lbu/ubu (B, nu) — SINGLE-ROW absolute boxes
        (stage-invariant, the deployment shape; +-inf allowed).

    Restrictions: B == 1 only (the prologue repurposes the 128 lanes as
    (node, tangent-column) slots, which requires the IPM's lanes to be
    duplicates of one problem — exactly the deployed latency path); fully
    VMEM-resident only (no HBM streaming; the whole point is zero
    off-chip traffic), so N is bounded by the VMEM budget (N<=120
    validated envelope). `model` is the STATIC tuple from
    `sqp/rti.py::fused_dyn_statics` — its leading family name selects
    the rows-form ODE from `dynamics/fastlin.py::FAMILIES` ("blaster",
    "blaster_dist" offset-free, "quad13"); any model with nx+nu <= 128
    and a rows-form ODE entry runs through the same prologue.

    soft: optional `qp.soft.SoftBounds` (acados ns>0) — composes with the
    fused prologue (r4): the stage-wise elimination runs in the same
    kernel off the in-kernel-derived delta bounds; penalties are
    shift-invariant so the (N, nx|nu) spec applies unchanged.

    R_grad: optional (B, nu, nu) — the R used for the in-kernel COST
    GRADIENT when it differs from the Hessian input `R` (the
    `SolverConfig.qp_r_floor` QP-only damping, `sqp/rti.py::
    qp_hessian_R`); None means gradient == Hessian R (no floor).
    """
    if soft is not None and warm is not None:
        raise ValueError("soft bounds do not support slack/dual warm "
                         "starts (violation pairs are not carried)")
    if x0.ndim != 2 or x0.shape[0] != 1:
        raise ValueError("pallas_fused_rti_solve is the B=1 latency path "
                         f"(got batch {x0.shape[0]}); use "
                         "pallas_box_qp_solve for batched solves")
    nx_f, nu_f = xbar.shape[-1], ubar.shape[-1]
    if nx_f + nu_f > LANES:
        # the prologue packs one node's (nx+nu) tangent columns onto the
        # 128 lanes; a larger model would silently leave columns unseeded
        # (truncated A/B) — fail loudly instead
        raise ValueError(f"fused linearization needs nx+nu <= {LANES} "
                         f"(got {nx_f}+{nu_f}); use qp_backend='pallas'")
    fuse = (xbar, ubar, stage_params, x0, Q, Q_t, R,
            yref_x, yref_u, yref_e, lbx, ubx, lbu, ubu)
    sol, _ = _pallas_box_qp_solve(None, warm, soft, fuse,
                                  iters=iters, mu0=mu0,
                                  alpha_frac=alpha_frac, reg=reg,
                                  interpret=interpret, stream_p=False,
                                  stream_big=False, model=tuple(model),
                                  dt_dyn=float(dt), nsteps=int(num_steps),
                                  R_grad=R_grad)
    return sol


def pallas_batched_fused_tick(AB, c, xbar, ubar, x0, Q, Q_t, R,
                              yref_x, yref_u, yref_e, lbx, ubx, lbu, ubu,
                              iters: int = 6, mu0: float = 1e-1,
                              alpha_frac: float = 0.995, reg: float = 1e-6,
                              interpret: bool = False, warm=None,
                              R_grad=None):
    """BATCHED single-kernel RTI tick body (r5): host linearization, but
    cost gradients, delta bounds, dx0 assembly AND the iterate update all
    run inside the IPM kernel — the only per-problem host work left in a
    batched tick is the linearizer itself. The r4 batched path spent
    ~45% of its wall clock on exactly these host-side elementwise passes
    (ROADMAP r5 item 1); this entry removes them.

    Arguments (leading batch axis B everywhere; broadcast shared spec
    tensors with `jnp.broadcast_to` — they are lane-tiled, not copied):
      AB (B, N, nx, nx+nu)  packed discrete Jacobians [A | B];
      c  (B, N, nx)         shooting defects x_pred - xbar[1:];
      xbar (B, N+1, nx), ubar (B, N, nu), x0 (B, nx);
      Q/Q_t/R as in `pallas_fused_rti_solve` (Q/R ALREADY dt-scaled);
      yref_x (B, N, nx), yref_u (B, N, nu), yref_e (B, nx);
      lbx/ubx (B, nx), lbu/ubu (B, nu) single-row absolute boxes.

    Returns (new_xbar (B, N+1, nx), new_ubar (B, N, nu),
    diag dict with kkt_stat/kkt_eq/mu/step_norm_x/step_norm_u/bound_viol
    per problem, warm_out-able QPSolution) — `sol.dx`/`sol.du` here ARE
    the updated absolute iterate (in-kernel state update).
    """
    fuse = (xbar, ubar, xbar[:, :1, :1], x0, Q, Q_t, R,
            yref_x, yref_u, yref_e, lbx, ubx, lbu, ubu)
    sol, (sx, su, vio) = _pallas_box_qp_solve(
        None, warm, None, fuse, iters=iters, mu0=mu0,
        alpha_frac=alpha_frac, reg=reg, interpret=interpret,
        stream_p=False, stream_big=False, fuse_ab=(AB, c), R_grad=R_grad)
    diag = {"kkt_stat": sol.kkt_stat, "kkt_eq": sol.kkt_eq, "mu": sol.mu,
            "step_norm_x": sx, "step_norm_u": su, "bound_viol": vio}
    return sol.dx, sol.du, diag, sol


@functools.partial(jax.jit, static_argnames=("iters", "mu0", "alpha_frac",
                                             "reg", "interpret", "stream_p",
                                             "stream_big", "model",
                                             "dt_dyn", "nsteps", "mehrotra"))
def _pallas_box_qp_solve(data: QPData, warm, soft, fuse, iters: int,
                         mu0: float,
                         alpha_frac: float, reg: float,
                         interpret: bool, stream_p: bool | None,
                         stream_big: bool | None, model=None,
                         dt_dyn: float = 0.0,
                         nsteps: int = 1, fuse_ab=None,
                         R_grad=None, mehrotra: bool = True) -> QPSolution:
    # Three modes (trace-time):
    #   plain        — data is a QPData, everything host-assembled;
    #   fuse_lin     — fuse tuple only: B=1 single-kernel tick, in-kernel
    #                  linearization + cost/bounds assembly;
    #   fuse_cost    — fuse tuple + fuse_ab=(AB_packed, c): BATCHED tick,
    #                  host linearization but in-kernel cost/bounds/dx0
    #                  assembly AND in-kernel state update (r5 — the
    #                  outputs are the updated absolute iterate).
    fuse_on = fuse is not None
    fuse_lin_on = fuse_on and fuse_ab is None
    fuse_cost_on = fuse_on and fuse_ab is not None
    if fuse_on:
        B = fuse[3].shape[0]
        N, nx, nu = fuse[1].shape[1], fuse[0].shape[-1], fuse[1].shape[-1]
    else:
        B = data.A.shape[0]
        N, nx, nu = data.A.shape[1], data.A.shape[-1], data.B.shape[-1]
    f32 = jnp.float32

    pad = (-B) % LANES

    def prep(x):
        x = jnp.asarray(x, f32)
        if pad:
            x = jnp.concatenate([x, jnp.repeat(x[:1], pad, axis=0)], axis=0)
        # batch-last, then split into lane tiles: (T, ..., LANES)
        x = jnp.moveaxis(x, 0, -1)
        x = x.reshape(x.shape[:-1] + (-1, LANES))
        return jnp.moveaxis(x, -2, 0)

    # sanitize +-inf bounds to large finite values; the kernel derives the
    # masks from the sentinel magnitude (no inf/nan arithmetic in-kernel)
    def san(b, lo):
        return jnp.where(jnp.isfinite(b), b, (-_BIGB if lo else _BIGB))

    np_sp = 0 if fuse is None else fuse[2].shape[-1]
    if fuse_on:
        # q/r, delta bounds and dx0 are all derived in-kernel from the
        # iterate + spec tensors; their input slots shrink to dummies
        # (never read — the fuse flags gate at trace time). A/B/c are
        # in-kernel too in fuse_lin mode, host-linearized inputs in
        # fuse_cost mode.
        xb = prep(fuse[0])
        ub = prep(fuse[1])
        x0i = prep(fuse[3])
        Qs = prep(fuse[4])
        Qt = prep(fuse[5])
        R1 = prep(fuse[6])
        yrx = prep(fuse[7])
        yru = prep(fuse[8])
        yre = prep(fuse[9])
        lbxa = prep(san(fuse[10], True))
        ubxa = prep(san(fuse[11], False))
        lbua = prep(san(fuse[12], True))
        ubua = prep(san(fuse[13], False))
        T_tiles0 = x0i.shape[0]
        dum = jnp.zeros((T_tiles0, 1, LANES), f32)
        q = r = lbx = ubx = lbu = ubu = dx0 = dum
        if fuse_cost_on:
            AB = prep(fuse_ab[0])
            c = prep(fuse_ab[1])
            sp = dum          # stage params only feed the fuse_lin prologue
        else:
            sp = prep(fuse[2])
            AB = c = dum
        R1g = prep(R_grad) if R_grad is not None else R1
    else:
        AB = prep(jnp.concatenate([data.A, data.B], axis=-1))
        c = prep(data.c)
        Qs = prep(data.Q[:, 0])
        Qt = prep(data.Q[:, -1])
        q = prep(data.q)
        R1 = prep(data.R[:, 0])
        r = prep(data.r)
        lbx = prep(san(data.lbx[:, 1:], True))
        ubx = prep(san(data.ubx[:, 1:], False))
        lbu = prep(san(data.lbu, True))
        ubu = prep(san(data.ubu, False))
        dx0 = prep(data.dx0)
        T_tiles0 = dx0.shape[0]
        dum = jnp.zeros((T_tiles0, 1, LANES), f32)
        xb = ub = sp = x0i = yrx = yru = yre = dum
        lbxa = ubxa = lbua = ubua = dum
        R1g = dum
    warm_on = warm is not None
    if warm_on:
        wvalid = prep(jnp.reshape(warm.valid, (B, 1)))
        wslx = prep(warm.s_lx)
        wsux = prep(warm.s_ux)
        wllx = prep(warm.lam_lx)
        wlux = prep(warm.lam_ux)
        wslu = prep(warm.s_lu)
        wsuu = prep(warm.s_uu)
        wllu = prep(warm.lam_lu)
        wluu = prep(warm.lam_uu)
    else:
        # cold solve: tiny dummies, never read by the kernel (warm_on
        # gates the blend at trace time). Distinct buffers matter less
        # now that nothing is aliased, but keep them cheap.
        wdum = jnp.zeros((T_tiles0, 1, LANES), f32)
        wvalid = wslx = wsux = wllx = wlux = wdum
        wslu = wsuu = wllu = wluu = wdum

    soft_on = soft is not None
    T_tiles = T_tiles0

    def _buffer_bytes(sp, sb, c):
        """Explicit VMEM bytes of one kernel instance (inputs + outputs
        + scratch) under the given streaming config; the Mosaic value
        stack (measured ~3-4 MB at these shapes) rides on the margin."""
        lane = LANES * 4
        mats = N * nu * nu + 2 * nx * nx            # Hinv, Qs, Qt
        if sb:
            mats += 2 * c * (nx * (nx + nu) + nu * nx)
        else:
            mats += N * nx * (nx + nu) + N * nu * nx    # AB + Z resident
        if sp:
            mats += 2 * c * nx * nx
        else:
            mats += (N + 1) * nx * nx                   # P resident
        vx, vu = (N + 1) * nx, N * nu
        vecs = (vx * 5 + vu * 5          # dx/ddx/ddxa/qr/q, du/ddu/ddua/rr/r
                + N * nx * 2 + N * nu    # c, req, r
                + 2 * N * nx + 2 * N * nu        # bounds
                + 4 * N * nx + 4 * N * nu        # slack/dual outputs
                + vx + vu + nx + N * nu)         # dx_out, du_out, dx0, kff
        if warm_on:
            vecs += 4 * N * nx + 4 * N * nu
        if soft_on:
            vecs += 2 * (4 * N * nx + 4 * N * nu)  # penalties + t/gam
        if fuse_on:
            # ab_s/qf/rf/bound/c_s scratch replace the (dummied) inputs
            # byte-for-byte (the base accounting above already counts
            # c/q/r/bounds/dx0 at full size, covering the scratch twins;
            # in fuse_cost mode the roles swap — real AB/c inputs, dummy
            # scratch — with the same total). The net additions are the
            # iterate/spec inputs (xbar/ubar/sp/x0/yrefs), the gradient
            # R1g and the single-row abs boxes.
            vecs += ((N + 1) * nx + N * nu + N * np_sp + nu * nu
                     + N * nx + N * nu + 2 * nx + 2 * (nx + nu))
        return (mats + vecs) * lane
    if soft_on:
        def pen_in(pen, b):
            """Sanitized penalty inputs: hard rows carry the Z sentinel
            (sig_eff collapses to sig_s exactly), z = 0."""
            Z, z, sm = pen.Z, pen.z, pen.soft
            if Z.ndim == 2:  # unbatched spec: broadcast over the batch
                Z, z, sm = (jnp.broadcast_to(a[None], (B,) + a.shape)
                            for a in (Z, z, sm))
            smask = sm & jnp.isfinite(b)
            return (prep(jnp.where(smask, Z, _BIGB)),
                    prep(jnp.where(smask, z, 0.0)))

        if fuse_on:
            # fused mode carries single-row ABSOLUTE boxes; finiteness of
            # the absolute bound == finiteness of its delta twin, so the
            # mask broadcasts over stages
            bxl = jnp.broadcast_to(fuse[10][:, None, :], (B, N, nx))
            bxu = jnp.broadcast_to(fuse[11][:, None, :], (B, N, nx))
            bul = jnp.broadcast_to(fuse[12][:, None, :], (B, N, nu))
            buu = jnp.broadcast_to(fuse[13][:, None, :], (B, N, nu))
        else:
            bxl, bxu = data.lbx[:, 1:], data.ubx[:, 1:]
            bul, buu = data.lbu, data.ubu
        Zlx_in, zlx_in = pen_in(soft.lx, bxl)
        Zux_in, zux_in = pen_in(soft.ux, bxu)
        Zlu_in, zlu_in = pen_in(soft.lu, bul)
        Zuu_in, zuu_in = pen_in(soft.uu, buu)
    else:
        dummy = jnp.zeros((T_tiles, 1, LANES), f32)
        Zlx_in = zlx_in = Zux_in = zux_in = dummy
        Zlu_in = zlu_in = Zuu_in = zuu_in = dummy

    mu_min, s_min = 1e-7, 1e-3
    sigma_max, lam_max, eps_s = 1e7, 1e7, 1e-9
    # Streaming engages only when the fully-resident instance would not
    # fit the VMEM budget (see the module-level VMEM facts): first P
    # streams, then the A/B record + Z gains as well. At the reference's
    # horizons (N <= 60) everything stays resident.
    if fuse_on:
        # the fused tick is the zero-off-chip-traffic path: everything
        # resident by construction (pallas_fused_rti_solve docstring)
        if stream_p or stream_big:
            raise ValueError("fused linearization requires the fully "
                             "VMEM-resident kernel (no HBM streaming)")
        stream_p = stream_big = False
    if stream_p is None:
        stream_p = _buffer_bytes(False, False, 1) > _RESIDENT_BUDGET
    if stream_big is None:
        stream_big = _buffer_bytes(True, False, 1) > _RESIDENT_BUDGET
    if stream_big:
        stream_p = True  # the long-horizon config streams everything big

    # Stream chunk size: the largest divisor of N up to 4 stages whose
    # 2-slot slabs stay within ~2.5 MB. Chunks amortize DMA issue
    # latency (count /C) and enable the double-buffered prefetch; C=1
    # degenerates to per-stage copies (prime horizons).
    if stream_p or stream_big:
        row_bytes = 0
        if stream_p:
            row_bytes += nx * nx
        if stream_big:
            row_bytes += nx * (nx + nu) + nu * nx
        row_bytes *= 2 * LANES * 4  # two slots, f32 lanes
        chunk = max(c for c in range(1, 5)
                    if N % c == 0 and c * row_bytes <= 2_500_000)
    else:
        chunk = 1
    buf_bytes = _buffer_bytes(stream_p, stream_big, chunk)
    vmem_limit = min(buf_bytes + _VMEM_STACK_MARGIN + (buf_bytes * 3) // 10,
                     _VMEM_CAP)

    kernel = functools.partial(
        _ipm_kernel, N=N, nx=nx, nu=nu, iters=iters, mu0=mu0,
        alpha_frac=alpha_frac, reg=reg, s_min=s_min, mu_min=mu_min,
        sigma_max=sigma_max, lam_max=lam_max, eps_s=eps_s,
        stream_p=stream_p, stream_big=stream_big, chunk=chunk,
        soft=soft_on, warm_on=warm_on, fuse_lin=fuse_lin_on,
        fuse_cost=fuse_cost_on, model=model,
        dt_dyn=dt_dyn, nsteps=nsteps, mehrotra=mehrotra)

    def vspec():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    def anyspec():
        return pl.BlockSpec(memory_space=pl.ANY)

    xs = jax.ShapeDtypeStruct((N, nx, LANES), f32)
    us = jax.ShapeDtypeStruct((N, nu, LANES), f32)
    in_specs = ([anyspec() if stream_big else vspec()]
                + [vspec()] * 40)
    out_specs = (vspec(), vspec(), vspec(),
                 anyspec(), anyspec(),
                 vspec(), vspec(), vspec(), vspec(),
                 vspec(), vspec(), vspec(), vspec())

    # P storage: HBM-streamed (2-slot chunk slab + ANY-space dump output)
    # or fully VMEM-resident. Z gains and the A/B record likewise in the
    # stream_big config.
    p_dump_shape = (N + 1, nx, nx, LANES) if stream_p else (1, 1, LANES)
    z_dump_shape = (N, nu, nx, LANES) if stream_big else (1, 1, LANES)
    p_slab = (pltpu.VMEM((2, chunk, nx, nx, LANES), f32) if stream_p
              else pltpu.VMEM((N + 1, nx, nx, LANES), f32))
    ab_slab = (pltpu.VMEM((2, chunk, nx, nx + nu, LANES), f32)
               if stream_big else pltpu.VMEM((1, 1, LANES), f32))
    z_slab = (pltpu.VMEM((2, chunk, nu, nx, LANES), f32) if stream_big
              else pltpu.VMEM((1, 1, LANES), f32))
    z_full = (pltpu.VMEM((1, 1, LANES), f32) if stream_big
              else pltpu.VMEM((N, nu, nx, LANES), f32))
    out_shape = (
        jax.ShapeDtypeStruct((N + 1, nx, LANES), f32),   # dx
        jax.ShapeDtypeStruct((N, nu, LANES), f32),       # du
        jax.ShapeDtypeStruct((6, LANES), f32),           # diag (r5: 6 rows)
        jax.ShapeDtypeStruct(p_dump_shape, f32),         # P dump
        jax.ShapeDtypeStruct(z_dump_shape, f32),         # Z dump
        xs, xs, xs, xs,                                  # slx sux llx lux
        us, us, us, us,                                  # slu suu llu luu
    )
    scratch = [
        p_slab,                                   # P_s
        pltpu.SemaphoreType.DMA((2,)),            # psem
        ab_slab,                                  # AB_s
        pltpu.SemaphoreType.DMA((2,)),            # absem
        z_slab,                                   # Zsl_s
        pltpu.SemaphoreType.DMA((2,)),            # zsem
        z_full,                                   # Z_s
        pltpu.VMEM((N, nu, nu, LANES), f32),      # Hinv_s
        pltpu.VMEM((N, nu, LANES), f32),          # kff_s
        pltpu.VMEM((N + 1, nx, LANES), f32),      # dx_s
        pltpu.VMEM((N, nu, LANES), f32),          # du_s
        pltpu.VMEM((1, LANES), f32),              # bm
        pltpu.VMEM((N + 1, nx, LANES), f32),      # ddx
        pltpu.VMEM((N, nu, LANES), f32),          # ddu
        pltpu.VMEM((N + 1, nx, LANES), f32),      # ddxa
        pltpu.VMEM((N, nu, LANES), f32),          # ddua
        pltpu.VMEM((N + 1, nx, LANES), f32),      # qr
        pltpu.VMEM((N, nu, LANES), f32),          # rr
        pltpu.VMEM((N, nx, LANES), f32),          # req
    ]
    tx = ((N, nx, LANES) if soft_on else (1, 1, LANES))
    tu = ((N, nu, LANES) if soft_on else (1, 1, LANES))
    scratch += [pltpu.VMEM(tx, f32), pltpu.VMEM(tx, f32),   # tlx glx
                pltpu.VMEM(tx, f32), pltpu.VMEM(tx, f32),   # tux gux
                pltpu.VMEM(tu, f32), pltpu.VMEM(tu, f32),   # tlu glu
                pltpu.VMEM(tu, f32), pltpu.VMEM(tu, f32)]   # tuu guu
    ab_shape = ((N, nx, nx + nu, LANES) if fuse_lin_on
                else (1, 1, 1, LANES))
    cs_shape = ((N, nx, LANES) if fuse_lin_on else (1, 1, LANES))
    fx = ((N + 1, nx, LANES) if fuse_on else (1, 1, LANES))
    fbx = ((N, nx, LANES) if fuse_on else (1, 1, LANES))
    fbu = ((N, nu, LANES) if fuse_on else (1, 1, LANES))
    scratch += [pltpu.VMEM(ab_shape, f32),   # ab_s (fused A/B record)
                pltpu.VMEM(cs_shape, f32),   # c_s (fused defects)
                pltpu.VMEM(fx, f32),         # qf_s (fused state grads)
                pltpu.VMEM(fbu, f32),        # rf_s (fused control grads)
                pltpu.VMEM(fbx, f32),        # lbxd_s (delta bounds)
                pltpu.VMEM(fbx, f32),        # ubxd_s
                pltpu.VMEM(fbu, f32),        # lbud_s
                pltpu.VMEM(fbu, f32)]        # ubud_s

    # DELIBERATELY no input_output_aliases: see the module-level NOTE
    # (CSE'd warm inputs + aliasing = output corruption inside scans).
    try:
        cparams = pltpu.CompilerParams(vmem_limit_bytes=int(vmem_limit))
    except Exception:  # pragma: no cover - param name drift
        cparams = None
    call = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        **({"compiler_params": cparams} if cparams is not None else {}),
    )

    def one_tile(args):
        return call(*args)

    outs = jax.lax.map(
        one_tile, (AB, c, Qs, Qt, q, R1, R1g, r, lbx, ubx, lbu, ubu, dx0,
                   wvalid, wslx, wsux, wllx, wlux, wslu, wsuu, wllu, wluu,
                   Zlx_in, zlx_in, Zux_in, zux_in,
                   Zlu_in, zlu_in, Zuu_in, zuu_in, xb, ub, sp,
                   x0i, yrx, yru, yre, lbxa, ubxa, lbua, ubua))
    (dx_bl, du_bl, diag, _p_dump, _z_dump,
     oslx, osux, ollx, olux, oslu, osuu, ollu, oluu) = outs

    def unprep(x):  # (T, ..., LANES) -> (B, ...)
        x = jnp.moveaxis(x, 0, -2)
        x = x.reshape(x.shape[:-2] + (-1,))
        return jnp.moveaxis(x, -1, 0)[:B]

    dx = unprep(dx_bl)
    du = unprep(du_bl)
    diag = unprep(diag)
    sol = QPSolution(dx=dx, du=du, kkt_stat=diag[:, 0], kkt_eq=diag[:, 1],
                     mu=diag[:, 2],
                     lam_lx=unprep(ollx), lam_ux=unprep(olux),
                     lam_lu=unprep(ollu), lam_uu=unprep(oluu),
                     s_lx=unprep(oslx), s_ux=unprep(osux),
                     s_lu=unprep(oslu), s_uu=unprep(osuu))
    # extras = (step_norm_x, step_norm_u, bound_viol), filled only in
    # fuse_cost mode (zeros otherwise; in that mode sol.dx/du carry the
    # updated ABSOLUTE iterate, not deltas)
    return sol, (diag[:, 3], diag[:, 4], diag[:, 5])
