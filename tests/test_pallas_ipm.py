"""Pallas fused-IPM kernel vs the XLA reference (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpc_blaster_tpu.qp.ipm import box_qp_solve
from mpc_blaster_tpu.ops.pallas_ipm import pallas_box_qp_solve


def _blaster_qps(B=4, N=8):
    """Realistic linearized BLASTER QPs at different states."""
    from mpc_blaster_tpu import config as cfg
    from mpc_blaster_tpu.dynamics.blaster import BlasterParams, blaster_ode
    from mpc_blaster_tpu.dynamics.integrators import discrete_dynamics
    from mpc_blaster_tpu.ocp.spec import build_spec
    from mpc_blaster_tpu.sqp.rti import build_qp, init_rti_state
    import dataclasses

    preset = cfg.simulation_preset()
    ocp = dataclasses.replace(preset.ocp, N=N, Tf=N / 30.0)
    spec = build_spec(ocp, yref=np.asarray(preset.loop.yref),
                      dtype=jnp.float32)
    params = BlasterParams.from_config(ocp.model, jnp.float32)
    F = discrete_dynamics(blaster_ode, ocp.dt, num_steps=1)
    rng = np.random.default_rng(0)
    qps = []
    for i in range(B):
        x0 = np.zeros(cfg.NX, np.float32)
        x0[0:3] = rng.uniform(-0.4, 0.4, 3)
        x0[2] = rng.uniform(1.5, 3.4)
        st = init_rti_state(ocp, jnp.asarray(x0), jnp.float32)
        qps.append(build_qp(spec, st, jnp.asarray(x0), F, params))
    return jax.tree.map(lambda *xs: jnp.stack(xs), *qps)


def test_pallas_ipm_matches_xla_interpret():
    from mpc_blaster_tpu.qp.data import qp_objective
    data = _blaster_qps(B=2, N=8)
    sol_p = pallas_box_qp_solve(data, iters=10, interpret=True)
    sol_x = jax.vmap(lambda d: box_qp_solve(d, iters=10))(data)
    du_p = np.asarray(sol_p.du)
    assert np.isfinite(du_p).all()
    # Both solvers park at similar KKT quality; on transient QPs with
    # saturated bounds the flat subspace leaves du weakly determined, so
    # the meaningful equivalence is objective value + feasibility.
    for i in range(2):
        d_i = jax.tree.map(lambda x: x[i], data)
        op = float(qp_objective(d_i, sol_p.dx[i], sol_p.du[i]))
        ox = float(qp_objective(d_i, sol_x.dx[i], sol_x.du[i]))
        scale = max(abs(ox), 1.0)
        assert abs(op - ox) / scale < 1.2e-2, (i, op, ox)
    assert np.asarray(sol_p.kkt_eq).max() < 1e-2
    assert np.asarray(sol_p.kkt_stat).max() < 1.0


def test_pallas_ipm_respects_bounds_interpret():
    data = _blaster_qps(B=2, N=8)
    sol = pallas_box_qp_solve(data, iters=10, interpret=True)
    du = np.asarray(sol.du)
    lbu = np.asarray(data.lbu)
    ubu = np.asarray(data.ubu)
    assert (du >= lbu - 1e-4).all()
    assert (du <= ubu + 1e-4).all()


@pytest.mark.slow
def test_pallas_ipm_infinite_bounds_interpret():
    """+-inf bounds are masked out (VERDICT r1: all-finite-only kernel).

    Mirrors qp/ipm.py's test_ipm_inactive_bounds semantics: with every
    bound infinite the IPM must reproduce the unconstrained LQR solution.
    """
    from mpc_blaster_tpu.qp.riccati import lqr_solve

    data = _blaster_qps(B=2, N=8)
    inf = jnp.inf
    free = data._replace(
        lbx=jnp.full_like(data.lbx, -inf),
        ubx=jnp.full_like(data.ubx, inf),
        lbu=jnp.full_like(data.lbu, -inf),
        ubu=jnp.full_like(data.ubu, inf),
    )
    sol = pallas_box_qp_solve(free, iters=8, interpret=True)
    ref = jax.vmap(lqr_solve)(free)
    # With the gimbal bounds removed, u[4:6] sit in the R_swivel=1e-5
    # near-null subspace (CLAUDE.md): both solvers are near-optimal but du
    # is weakly determined there. Thrust columns must match tightly;
    # overall equivalence is objective + true stationarity.
    np.testing.assert_allclose(np.asarray(sol.du)[..., :4],
                               np.asarray(ref.du)[..., :4],
                               rtol=1e-3, atol=2e-3)
    from mpc_blaster_tpu.qp.data import qp_objective
    from mpc_blaster_tpu.qp.riccati import lqr_kkt_residuals
    for i in range(2):
        d_i = jax.tree.map(lambda x: x[i], free)
        op = float(qp_objective(d_i, sol.dx[i], sol.du[i]))
        ox = float(qp_objective(d_i, ref.dx[i], ref.du[i]))
        assert abs(op - ox) / max(abs(ox), 1.0) < 1e-3, (i, op, ox)
        st, eq = lqr_kkt_residuals(d_i, sol.dx[i], sol.du[i])
        st_r, _ = lqr_kkt_residuals(d_i, ref.dx[i], ref.du[i])
        # the IPM's Newton steps must reach (at least) LQR-grade
        # stationarity on the unconstrained problem
        assert float(st) < max(10 * float(st_r), 1e-2)
        assert float(eq) < 1e-4
    # mixed: only the (active) thrust lower bounds kept
    mixed = data._replace(
        lbx=jnp.full_like(data.lbx, -inf),
        ubx=jnp.full_like(data.ubx, inf),
        ubu=jnp.full_like(data.ubu, inf),
    )
    solm = pallas_box_qp_solve(mixed, iters=10, interpret=True)
    refm = jax.vmap(lambda d: box_qp_solve(d, iters=10))(mixed)
    du_m = np.asarray(solm.du)
    assert np.isfinite(du_m).all()
    assert (du_m >= np.asarray(data.lbu) - 1e-3).all()
    from mpc_blaster_tpu.qp.data import qp_objective
    for i in range(2):
        d_i = jax.tree.map(lambda x: x[i], mixed)
        op = float(qp_objective(d_i, solm.dx[i], solm.du[i]))
        ox = float(qp_objective(d_i, refm.dx[i], refm.du[i]))
        assert abs(op - ox) / max(abs(ox), 1.0) < 1.2e-2, (i, op, ox)


def _rti_qp_pair(N=8):
    """(QP at tick 1's iterate, QP at tick 2's iterate): the deployed
    cross-tick warm-start pattern. Warm-starting a RE-solve of the SAME QP
    from a mismatched primal init is the known-pathological case (the
    slack residual (lam/s)*r_s explodes for near-active bounds) — for the
    XLA path too; cross-tick QPs are what warm starts are for."""
    import dataclasses
    from mpc_blaster_tpu import config as cfg
    from mpc_blaster_tpu.dynamics.blaster import BlasterParams, blaster_ode
    from mpc_blaster_tpu.dynamics.integrators import discrete_dynamics
    from mpc_blaster_tpu.ocp.spec import build_spec
    from mpc_blaster_tpu.qp.ipm import box_qp_solve
    from mpc_blaster_tpu.sqp.rti import RTIState, build_qp, init_rti_state

    preset = cfg.simulation_preset()
    ocp = dataclasses.replace(preset.ocp, N=N, Tf=N / 30.0)
    spec = build_spec(ocp, yref=np.asarray(preset.loop.yref),
                      dtype=jnp.float32)
    params = BlasterParams.from_config(ocp.model, jnp.float32)
    F = discrete_dynamics(blaster_ode, ocp.dt, num_steps=1)
    # near-hover state: the deployed warm loop's steady regime. (Warm
    # starting an aggressive cold transient is known-adverse: the previous
    # tick's extreme near-active duals mismatch the fresh rollout primal;
    # quality across the transient is asserted on hardware by bench.py's
    # figure-8 row instead.)
    x0 = jnp.zeros(cfg.NX, jnp.float32).at[2].set(3.4).at[0].set(0.05)
    st = init_rti_state(ocp, x0, jnp.float32)
    qp1 = build_qp(spec, st, x0, F, params)
    sol1 = box_qp_solve(qp1, iters=8)
    st2 = RTIState(xbar=st.xbar + sol1.dx, ubar=st.ubar + sol1.du)
    x1 = F(x0, st2.ubar[0], spec.stage_params[0], params)
    qp2 = build_qp(spec, st2, x1, F, params)
    return qp1, qp2


@pytest.mark.slow
def test_pallas_ipm_warm_start_interpret():
    """Cross-tick slack/dual warm-start MECHANICS: the solution's
    last-iterate slacks/duals are finite and round-trip through
    qp.ipm.warm_start_from into a finite, bound-respecting warm solve,
    and a warm start with valid=0 reproduces the cold solve exactly.

    Quality is deliberately NOT asserted: measured on hardware, warm
    chains degrade transient closed loops (the reason the deployed loop
    cold-starts every tick, like the reference's HPIPM warm_start=0 —
    see sqp/rti.py::rti_step_warm)."""
    from mpc_blaster_tpu.qp.ipm import warm_start_from

    qp1, qp2 = _rti_qp_pair(N=8)
    b = lambda qp: jax.tree.map(lambda a: a[None], qp)

    sol1 = pallas_box_qp_solve(b(qp1), iters=8, interpret=True)
    assert sol1.s_lx is not None and sol1.lam_uu is not None
    assert np.isfinite(np.asarray(sol1.s_lx)).all()
    assert (np.asarray(sol1.s_lx) > 0).all()
    assert (np.asarray(sol1.lam_lu) >= 0).all()
    warm = jax.vmap(warm_start_from)(sol1)

    warm6 = pallas_box_qp_solve(b(qp2), iters=6, interpret=True, warm=warm)
    assert np.isfinite(float(warm6.mu[0]))
    assert np.isfinite(np.asarray(warm6.du)).all()
    du = np.asarray(warm6.du[0])
    assert (du >= np.asarray(qp2.lbu) - 1e-3).all()
    assert (du <= np.asarray(qp2.ubu) + 1e-3).all()
    # bounded, not tight: warm duals shrink the fraction-to-boundary
    # steps, so the equality residual decays slowly (the quality caveat)
    assert float(warm6.kkt_eq[0]) < 1.0

    # valid=0 warm start must be EXACTLY the cold path
    warm_off = warm._replace(valid=jnp.zeros_like(warm.valid))
    off = pallas_box_qp_solve(b(qp2), iters=6, interpret=True,
                              warm=warm_off)
    cold = pallas_box_qp_solve(b(qp2), iters=6, interpret=True)
    np.testing.assert_array_equal(np.asarray(off.du), np.asarray(cold.du))


@pytest.mark.slow
def test_pallas_warm_blend_nan_guard_interpret():
    """A NaN in the warm start must fall back to the cold init per entry,
    not poison the solve (robustness for long warm chains)."""
    from mpc_blaster_tpu.qp.ipm import IpmWarmStart

    qp1, qp2 = _rti_qp_pair(N=8)
    b = jax.tree.map(lambda a: a[None], qp2)
    N_, nx, nu = qp2.horizon, qp2.nx, qp2.nu
    zx = jnp.full((1, N_, nx), jnp.nan, jnp.float32)
    zu = jnp.full((1, N_, nu), jnp.nan, jnp.float32)
    warm = IpmWarmStart(zx, zx, zx, zx, zu, zu, zu, zu,
                        jnp.ones((1,), jnp.float32))
    sol = pallas_box_qp_solve(b, iters=4, interpret=True, warm=warm)
    cold = pallas_box_qp_solve(b, iters=4, interpret=True)
    assert np.isfinite(np.asarray(sol.du)).all()
    np.testing.assert_allclose(np.asarray(sol.du), np.asarray(cold.du),
                               atol=1e-5)


@pytest.mark.slow
def test_pallas_ipm_stream_matches_resident_interpret():
    """HBM-streamed P (large-N mode) is numerically identical to the
    VMEM-resident mode. N=8 -> chunk C=4: the chunked double-buffered
    read path and the per-chunk write flush are both exercised."""
    data = _blaster_qps(B=2, N=8)
    a = pallas_box_qp_solve(data, iters=8, interpret=True, stream_p=False)
    b = pallas_box_qp_solve(data, iters=8, interpret=True, stream_p=True)
    np.testing.assert_allclose(np.asarray(a.du), np.asarray(b.du),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.dx), np.asarray(b.dx),
                               atol=1e-6)


@pytest.mark.slow
def test_pallas_ipm_stream_big_matches_resident_interpret():
    """Full streaming (A/B record + Z + P through HBM, the flagship N=60
    configuration) matches the resident kernel bit-for-bit in interpret
    mode — on a composite horizon (chunked DMA) and a prime one (C=1)."""
    for N in (8, 7):
        data = _blaster_qps(B=2, N=N)
        a = pallas_box_qp_solve(data, iters=6, interpret=True,
                                stream_p=False, stream_big=False)
        b = pallas_box_qp_solve(data, iters=6, interpret=True,
                                stream_big=True)
        np.testing.assert_allclose(np.asarray(a.du), np.asarray(b.du),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(a.dx), np.asarray(b.dx),
                                   atol=1e-6)


# --------------------------- soft bounds in-kernel -------------------------

def _soft_state_spec(data, Zl=1e3, zl=1e2, idx=(0, 1, 2)):
    from mpc_blaster_tpu.qp.soft import SoftBounds
    return SoftBounds.state_bounds(data.horizon, data.nx, data.nu,
                                   Zl=Zl, zl=zl, idx=np.asarray(idx),
                                   dtype=jnp.float32)


def _all_hard_soft(data):
    from mpc_blaster_tpu.qp.soft import SoftBounds, SoftPenalty
    N_, nx, nu = data.horizon, data.nx, data.nu
    return SoftBounds(lx=SoftPenalty.hard((N_, nx)),
                      ux=SoftPenalty.hard((N_, nx)),
                      lu=SoftPenalty.hard((N_, nu)),
                      uu=SoftPenalty.hard((N_, nu)))


@pytest.mark.slow
def test_pallas_soft_all_hard_matches_hard_interpret():
    """An all-hard SoftBounds through the soft kernel == the hard kernel:
    the Z=1e18 sentinel must collapse sig_eff to sig_s exactly. One
    iteration is asserted BIT-EXACT — the strongest semantic check (the
    deep-budget objective-parity variant is the slow sibling below)."""
    data = _blaster_qps(B=2, N=8)
    soft = _all_hard_soft(data)
    a1 = pallas_box_qp_solve(data, iters=1, interpret=True)
    b1 = pallas_box_qp_solve(data, iters=1, interpret=True, soft=soft)
    np.testing.assert_array_equal(np.asarray(a1.du), np.asarray(b1.du))
    np.testing.assert_array_equal(np.asarray(a1.dx), np.asarray(b1.dx))


@pytest.mark.slow
def test_pallas_soft_all_hard_deep_budget_interpret():
    """Deep budgets only to objective parity — ~1e-6 f32 reassociation
    noise amplifies chaotically on transient QPs with saturated bounds
    (same policy as test_pallas_ipm_matches_xla_interpret)."""
    from mpc_blaster_tpu.qp.data import qp_objective
    data = _blaster_qps(B=2, N=8)
    soft = _all_hard_soft(data)
    a = pallas_box_qp_solve(data, iters=8, interpret=True)
    b = pallas_box_qp_solve(data, iters=8, interpret=True, soft=soft)
    for i in range(2):
        d_i = jax.tree.map(lambda x, i=i: x[i], data)
        oa = float(qp_objective(d_i, a.dx[i], a.du[i]))
        ob = float(qp_objective(d_i, b.dx[i], b.du[i]))
        assert abs(oa - ob) / max(abs(oa), 1.0) < 5e-3, (i, oa, ob)
    assert (np.asarray(b.du) >= np.asarray(data.lbu) - 1e-4).all()
    assert (np.asarray(b.du) <= np.asarray(data.ubu) + 1e-4).all()


@pytest.mark.slow
def test_pallas_soft_matches_xla_interpret():
    """Soft-bounded kernel vs qp/soft.py on an infeasible-hard problem:
    x0 outside the position box, soft position bounds absorb it."""
    from mpc_blaster_tpu.qp.soft import (soft_box_qp_solve,
                                         soft_qp_objective)
    data = _blaster_qps(B=2, N=8)
    # push the initial state 0.5 m outside the x-position box
    data = data._replace(dx0=data.dx0.at[:, 0].add(2.2))
    soft = _soft_state_spec(data)
    kern = pallas_box_qp_solve(data, iters=10, interpret=True, soft=soft)
    for i in range(2):
        d1 = jax.tree.map(lambda a, i=i: a[i], data)
        ref = soft_box_qp_solve(d1, soft, iters=10)
        ok = float(soft_qp_objective(d1, soft, kern.dx[i], kern.du[i]))
        ox = float(soft_qp_objective(d1, soft, ref.sol.dx, ref.sol.du))
        # penalized objectives agree (du itself is weakly determined in
        # the gimbal subspace; compare objectives, CLAUDE.md)
        assert abs(ok - ox) <= 2e-3 * abs(ox) + 1e-3, (ok, ox)
        # both must find a real violation of the UPPER x bound somewhere
        # (dx0 is pushed +2.2 past the +-1.5 position box; early stages
        # cannot jump back inside within the dynamics)
        viol_k = np.asarray(jnp.maximum(
            kern.dx[i][1:, 0] - d1.ubx[1:, 0], 0.0))
        viol_x = np.asarray(ref.t_ux[:, 0])
        assert viol_x.max() > 1e-2  # the hard problem IS infeasible
        np.testing.assert_allclose(viol_k.max(), viol_x.max(), rtol=0.2)


@pytest.mark.slow
def test_pallas_soft_streamed_matches_resident_interpret():
    data = _blaster_qps(B=2, N=8)
    data = data._replace(dx0=data.dx0.at[:, 0].add(2.2))
    soft = _soft_state_spec(data)
    a = pallas_box_qp_solve(data, iters=8, interpret=True, soft=soft,
                            stream_p=False, stream_big=False)
    b = pallas_box_qp_solve(data, iters=8, interpret=True, soft=soft,
                            stream_big=True)
    np.testing.assert_allclose(np.asarray(a.du), np.asarray(b.du),
                               atol=1e-6)


def test_pallas_soft_rejects_warm():
    from mpc_blaster_tpu.qp.ipm import IpmWarmStart
    data = _blaster_qps(B=1, N=4)
    soft = _soft_state_spec(data)
    warm = IpmWarmStart.zeros(4, data.nx, data.nu)
    warm = jax.tree.map(lambda a: a[None], warm)
    with pytest.raises(ValueError, match="warm"):
        pallas_box_qp_solve(data, iters=2, interpret=True, soft=soft,
                            warm=warm)
