"""Horizon-parallel (associative-scan) LQR vs sequential Riccati."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpc_blaster_tpu.qp.pscan import backward_pass_pscan, lqr_solve_pscan
from mpc_blaster_tpu.qp.riccati import lqr_solve, riccati_factorize


def _random_qp(N=16, nx=5, nu=3, seed=0):
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_qp import random_qp
    return random_qp(N=N, nx=nx, nu=nu, seed=seed, bound_scale=np.inf)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pscan_matches_riccati(seed):
    data = _random_qp(seed=seed)
    sol_seq = lqr_solve(data)
    sol_par = lqr_solve_pscan(data)
    np.testing.assert_allclose(np.asarray(sol_par.du),
                               np.asarray(sol_seq.du), rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(sol_par.dx),
                               np.asarray(sol_seq.dx), rtol=1e-7, atol=1e-8)


def test_pscan_value_functions_match():
    data = _random_qp(seed=3)
    P_par, p_par = backward_pass_pscan(data.A, data.B, data.c, data.Q,
                                       data.q, data.R, data.r)
    fac = riccati_factorize(data.A, data.B, data.Q, data.R)
    np.testing.assert_allclose(np.asarray(P_par), np.asarray(fac.P),
                               rtol=1e-7, atol=1e-8)


def test_pscan_factor_solve_split_matches_sequential():
    """The IPM-facing factor/solve split (one factorization, many RHS) must
    reproduce the sequential `riccati_factorize`/`riccati_solve_rhs` pair."""
    from mpc_blaster_tpu.qp.pscan import (riccati_factorize_pscan,
                                          riccati_solve_rhs_pscan)
    from mpc_blaster_tpu.qp.riccati import riccati_solve_rhs

    data = _random_qp(seed=7)
    fac_seq = riccati_factorize(data.A, data.B, data.Q, data.R, reg=1e-10)
    fac_par = riccati_factorize_pscan(data.A, data.B, data.Q, data.R,
                                      reg=1e-10)
    np.testing.assert_allclose(np.asarray(fac_par.P), np.asarray(fac_seq.P),
                               rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(fac_par.K), np.asarray(fac_seq.K),
                               rtol=1e-6, atol=1e-8)

    # two different RHS against ONE factorization (the Mehrotra pattern)
    rng = np.random.default_rng(11)
    for _ in range(2):
        q2 = jnp.asarray(rng.normal(size=data.q.shape), data.q.dtype)
        r2 = jnp.asarray(rng.normal(size=data.r.shape), data.r.dtype)
        dx_seq, du_seq = riccati_solve_rhs(fac_seq, data.A, data.B, data.c,
                                           q2, r2, data.dx0)
        dx_par, du_par = riccati_solve_rhs_pscan(fac_par, data.A, data.B,
                                                 data.c, q2, r2, data.dx0)
        np.testing.assert_allclose(np.asarray(du_par), np.asarray(du_seq),
                                   rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(np.asarray(dx_par), np.asarray(dx_seq),
                                   rtol=1e-6, atol=1e-8)
        # mixed pairing: pscan solve against the sequential factor (the
        # "hybrid" IPM mode)
        dx_h, du_h = riccati_solve_rhs_pscan(fac_seq, data.A, data.B,
                                             data.c, q2, r2, data.dx0)
        np.testing.assert_allclose(np.asarray(du_h), np.asarray(du_seq),
                                   rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("backend", ["pscan", "hybrid"])
def test_ipm_riccati_backends_match_scan(backend):
    """box_qp_solve(riccati=...) must agree with the default sequential
    backend on an actively-constrained QP (VERDICT r1: the parameter used
    to be accepted but dead)."""
    from mpc_blaster_tpu.qp.ipm import box_qp_solve
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_qp import random_qp

    data = random_qp(N=12, nx=5, nu=3, seed=9, bound_scale=0.3)
    ref = box_qp_solve(data, iters=20)
    sol = box_qp_solve(data, iters=20, riccati=backend)
    # iterate-level agreement is control-grade, not bitwise: different
    # reduction orders perturb weakly-active entries by ~1e-4 (CLAUDE.md)
    np.testing.assert_allclose(np.asarray(sol.du), np.asarray(ref.du),
                               rtol=1e-3, atol=5e-4)
    assert float(sol.kkt_eq) < 1e-4
    # objectives must agree much tighter than the raw iterates
    from mpc_blaster_tpu.qp.data import qp_objective
    np.testing.assert_allclose(float(qp_objective(data, sol.dx, sol.du)),
                               float(qp_objective(data, ref.dx, ref.du)),
                               rtol=1e-5, atol=1e-7)


def test_ipm_riccati_backend_validated():
    from mpc_blaster_tpu.qp.ipm import box_qp_solve
    data = _random_qp(seed=0)
    with pytest.raises(ValueError, match="riccati"):
        box_qp_solve(data, riccati="pscam")


def test_pscan_long_horizon_sharded():
    """Sequence parallelism: stage axis sharded over an 8-device mesh."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    assert jax.device_count() >= 8
    data = _random_qp(N=64, nx=4, nu=2, seed=5)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("hp",))
    shard = NamedSharding(mesh, P("hp"))

    data_sharded = data._replace(
        A=jax.device_put(data.A, shard),
        B=jax.device_put(data.B, shard),
        c=jax.device_put(data.c, shard),
        R=jax.device_put(data.R, shard),
        r=jax.device_put(data.r, shard),
    )
    sol = jax.jit(lqr_solve_pscan)(data_sharded)
    ref = lqr_solve(data)
    np.testing.assert_allclose(np.asarray(sol.du), np.asarray(ref.du),
                               rtol=1e-6, atol=1e-7)
