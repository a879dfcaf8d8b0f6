"""POC solver: closed form vs RK4, Newton convergence, autodiff vs FD."""
import numpy as np
import jax
import jax.numpy as jnp

from mpc_blaster_tpu.poc import jet, solver


def test_closed_form_matches_rk4():
    """Exact linear-drag solution vs the reference-style ERK(4,10) integrator."""
    init = jnp.asarray([0.5, -0.2, 3.5, 10.0, -5.0, -150.0])
    for t in [0.005, 0.02, 0.05]:
        exact = np.asarray(jet.jet_state(jnp.asarray(t), init, 1.0))
        rk4 = np.asarray(jet.jet_state_rk4(jnp.asarray(t), init, 1.0, num_steps=10))
        np.testing.assert_allclose(exact, rk4, rtol=1e-10, atol=1e-10)


def test_time_of_impact_hits_ground():
    init = jet.jet_init_conditions(jnp.zeros(3), jnp.zeros(2),
                                   jnp.asarray([0.0, 0.0, 4.0]), 150.0)
    T = solver.time_of_impact(init, 1.0)
    z = float(jet.jet_altitude(T, init, 1.0))
    assert float(T) > 0
    assert abs(z) < 1e-9  # far tighter than the reference's 1e-3 (`:130`)


def test_time_of_impact_tilted_pose():
    # the reference demo pose (`Jacobian_POC_Solver.py:308`)
    euler = jnp.asarray([0.0, -0.05, 0.0])
    alpha = jnp.asarray([0.2117, 0.0])
    pos = jnp.asarray([0.6, 0.0, 3.5])
    poc, T = solver.solve_poc(euler, alpha, pos)
    init = jet.jet_init_conditions(euler, alpha, pos, 150.0)
    assert abs(float(jet.jet_altitude(T, init, 1.0))) < 1e-9
    assert abs(float(poc[2])) < 1e-9  # POC is on the ground plane
    # Ry(+alpha1) @ [0,0,-1] = [-sin a1, 0, -cos a1]: positive alpha1 tilts
    # the jet toward -x, so the POC lands behind the vehicle x.
    assert float(poc[0]) < float(pos[0])


def test_jacobians_autodiff_vs_fd():
    euler = jnp.asarray([0.0, -0.05, 0.0])
    alpha = jnp.asarray([0.2117, 0.0])
    pos = jnp.asarray([0.6, 0.0, 3.5])
    j_mot, j_eul, j_pos = solver.poc_jacobians(euler, alpha, pos)
    f_mot, f_eul, f_pos = solver.poc_jacobians_fd(euler, alpha, pos)
    np.testing.assert_allclose(np.asarray(j_mot), np.asarray(f_mot),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_eul), np.asarray(f_eul),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_pos), np.asarray(f_pos),
                               rtol=1e-4, atol=1e-4)


def test_jacobian_structure_canonical_pose():
    """At zero angles above flat ground, dPOC/dposition maps x,y shifts 1:1
    and z shifts stretch the impact range only in z-reach terms."""
    ps = solver.PocSolver().initialise()
    j_mot, j_eul, j_pos = ps.get_jacobians()
    j_pos = np.asarray(j_pos)
    # x/y translation moves POC x/y one-to-one
    np.testing.assert_allclose(j_pos[0, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(j_pos[1, 1], 1.0, atol=1e-6)
    # POC z stays on the ground -> last row ~ 0
    np.testing.assert_allclose(j_pos[2, :], 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(j_mot)[2, :], 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(j_eul)[2, :], 0.0, atol=1e-6)
    # nozzle pitch alpha1 (about y) sweeps POC in x, roll alpha2 in -y
    assert abs(float(j_mot[0, 0])) > 0.1
    assert abs(float(j_mot[1, 1])) > 0.1


def test_solve_poc_vmap_batch():
    B = 16
    rng = np.random.default_rng(7)
    eulers = jnp.asarray(rng.uniform(-0.1, 0.1, (B, 3)))
    alphas = jnp.asarray(rng.uniform(-0.1, 0.3, (B, 2)))
    poss = jnp.asarray(np.c_[rng.uniform(-1, 1, (B, 2)), rng.uniform(2, 5, B)])
    batched = jax.vmap(lambda e, a, p: solver.solve_poc(e, a, p))
    pocs, Ts = batched(eulers, alphas, poss)
    assert pocs.shape == (B, 3)
    for i in [0, 7, 15]:
        p_i, T_i = solver.solve_poc(eulers[i], alphas[i], poss[i])
        np.testing.assert_allclose(np.asarray(pocs[i]), np.asarray(p_i), atol=1e-12)


def test_reference_initialise_pose_values():
    """The sim preset uses Jacobians from initialise() (zero angles, z=4,
    `Jacobian_POC_Solver.py:57` via `simulation_blaster.py:37-39`)."""
    ps = solver.PocSolver(150.0, 1.0).initialise()
    poc = np.asarray(ps.poc)
    # straight-down jet: POC below the nozzle x-offset, on the ground
    assert abs(poc[2]) < 1e-9
    np.testing.assert_allclose(poc[0], 0.01672 + 0.0425 - 0.05322, atol=1e-3)
    np.testing.assert_allclose(poc[1], 0.0, atol=1e-9)
    assert 0.02 < float(ps.time_of_impact) < 0.05
