"""Core rotations/HTM vs scipy f64 references."""
import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from mpc_blaster_tpu.core import htm, rotations as rot


RNG = np.random.default_rng(0)


@pytest.mark.parametrize("seed", range(5))
def test_euler_zyx_matches_scipy(seed):
    eul = RNG.uniform(-1.0, 1.0, size=3)
    R = np.asarray(rot.euler_zyx_to_rot(jnp.asarray(eul)))
    # blastermodel.py:122 uses R_psi @ R_theta @ R_phi == scipy intrinsic 'ZYX'
    R_ref = ScipyRot.from_euler("ZYX", [eul[2], eul[1], eul[0]]).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-12)


def test_htm_world_rotation_is_extrinsic_zyx():
    """htm.py:33 uses scipy lowercase 'zyx' (extrinsic) — a different
    convention than the dynamics model. We reproduce it exactly."""
    eul = np.array([0.5, -0.2, 0.3])
    T = np.asarray(htm.T_w_b(jnp.asarray(eul), jnp.zeros(3)))
    R_ref = ScipyRot.from_euler("zyx", [eul[2], eul[1], eul[0]]).as_matrix()
    np.testing.assert_allclose(T[:3, :3], R_ref, atol=1e-12)
    # and the 'model' convention matches the dynamics rotation
    T2 = np.asarray(htm.T_w_b(jnp.asarray(eul), jnp.zeros(3), convention="model"))
    np.testing.assert_allclose(
        T2[:3, :3], np.asarray(rot.euler_zyx_to_rot(jnp.asarray(eul))), atol=1e-12)


def test_euler_rate_matrix_inverse_consistent():
    eul = jnp.asarray([0.1, -0.2, 0.3])
    omega = jnp.asarray([0.4, -0.5, 0.6])
    eul_dot = rot.euler_rates_from_omega(eul, omega)
    # E @ eul_dot must reconstruct omega
    E = rot.euler_rate_matrix(eul)
    np.testing.assert_allclose(np.asarray(E @ eul_dot), np.asarray(omega), atol=1e-12)


def test_quat_parity_scipy():
    eul = np.array([0.3, -0.2, 0.5])
    q = np.asarray(rot.euler_zyx_to_quat(jnp.asarray(eul)))
    # scipy xyzw -> our wxyz; intrinsic ZYX == transforms3d 'sxyz' as used by
    # the flight node (mavros_blaster_sim.py:12,92)
    q_ref = ScipyRot.from_euler("ZYX", [eul[2], eul[1], eul[0]]).as_quat()
    q_ref = np.r_[q_ref[3], q_ref[:3]]
    if np.sign(q_ref[0]) != np.sign(q[0]):
        q_ref = -q_ref
    np.testing.assert_allclose(q, q_ref, atol=1e-12)
    # quat -> rot roundtrip
    np.testing.assert_allclose(
        np.asarray(rot.quat_to_rot(jnp.asarray(q))),
        np.asarray(rot.euler_zyx_to_rot(jnp.asarray(eul))), atol=1e-12)


def test_quat_mul_inverse():
    q1 = rot.euler_zyx_to_quat(jnp.asarray([0.1, 0.2, 0.3]))
    out = rot.quat_mul(q1, rot.unit_quat_inv(q1))
    np.testing.assert_allclose(np.asarray(out), [1, 0, 0, 0], atol=1e-12)


def _ref_T_b_s2(alpha1, alpha2):
    """Independent numpy transcription of `src/scripts/htm.py:7-28`."""
    hbs1 = np.eye(4); hbs1[:3, 3] = [0.01672, 0, -0.22937]
    hs1s2 = np.array([[np.cos(alpha1), 0, np.sin(alpha1), 0.0425],
                      [0, 1, 0, 0],
                      [-np.sin(alpha1), 0, np.cos(alpha1), 0],
                      [0, 0, 0, 1]])
    hs2n = np.array([[1, 0, 0, -0.05322],
                     [0, np.cos(alpha2), np.sin(alpha2), 0],
                     [0, -np.sin(alpha2), np.cos(alpha2), -0.15946],
                     [0, 0, 0, 1]])
    return hbs1 @ hs1s2 @ hs2n


@pytest.mark.parametrize("a1,a2", [(0.0, 0.0), (0.2117, 0.0), (0.3, -0.4)])
def test_htm_chain_matches_reference_formula(a1, a2):
    T = np.asarray(htm.T_b_s2(jnp.float64(a1), jnp.float64(a2)))
    np.testing.assert_allclose(T, _ref_T_b_s2(a1, a2), atol=1e-12)


def test_nozzle_pose_at_rest():
    p, R = htm.nozzle_pose(jnp.zeros(3), jnp.zeros(2),
                           jnp.asarray([0.0, 0.0, 2.0]))
    np.testing.assert_allclose(
        np.asarray(p), [0.01672 + 0.0425 - 0.05322, 0.0, 2.0 - 0.22937 - 0.15946],
        atol=1e-12)
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-12)
