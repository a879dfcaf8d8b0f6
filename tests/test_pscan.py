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
