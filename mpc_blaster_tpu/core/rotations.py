"""Rotation and attitude kinematics as pure jnp functions.

Replaces the CasADi symbolic rotation construction of the reference
(`src/scripts/blastermodel.py:103-162`) and the unused quaternion helpers in
`utils/MathUtils.py:5-54`. Everything is traced/jitted by XLA rather than
emitted as generated C.

Convention: ZYX (yaw-pitch-roll) Euler angles, world R = Rz(psi) Ry(theta)
Rx(phi), matching `blastermodel.py:122`. ENU world frame, gravity -z.
"""
from __future__ import annotations

import jax.numpy as jnp


def rot_x(a: jnp.ndarray) -> jnp.ndarray:
    """Rotation about x (reference R_phi / R_gimbal_2, `blastermodel.py:107-110,148-151`)."""
    c, s = jnp.cos(a), jnp.sin(a)
    z, o = jnp.zeros_like(a), jnp.ones_like(a)
    return jnp.stack([
        jnp.stack([o, z, z], -1),
        jnp.stack([z, c, -s], -1),
        jnp.stack([z, s, c], -1),
    ], -2)


def rot_y(a: jnp.ndarray) -> jnp.ndarray:
    """Rotation about y (reference R_theta / R_gimbal_1, `blastermodel.py:112-115,155-158`)."""
    c, s = jnp.cos(a), jnp.sin(a)
    z, o = jnp.zeros_like(a), jnp.ones_like(a)
    return jnp.stack([
        jnp.stack([c, z, s], -1),
        jnp.stack([z, o, z], -1),
        jnp.stack([-s, z, c], -1),
    ], -2)


def rot_z(a: jnp.ndarray) -> jnp.ndarray:
    """Rotation about z (reference R_psi, `blastermodel.py:117-120`)."""
    c, s = jnp.cos(a), jnp.sin(a)
    z, o = jnp.zeros_like(a), jnp.ones_like(a)
    return jnp.stack([
        jnp.stack([c, -s, z], -1),
        jnp.stack([s, c, z], -1),
        jnp.stack([z, z, o], -1),
    ], -2)


def euler_zyx_to_rot(eul: jnp.ndarray) -> jnp.ndarray:
    """World-from-body rotation from [phi, theta, psi] (`blastermodel.py:122`)."""
    phi, theta, psi = eul[..., 0], eul[..., 1], eul[..., 2]
    return rot_z(psi) @ rot_y(theta) @ rot_x(phi)


def euler_rate_matrix(eul: jnp.ndarray) -> jnp.ndarray:
    """E(eul) such that omega_body = E @ eul_dot (`blastermodel.py:135-140`)."""
    phi, theta = eul[..., 0], eul[..., 1]
    z, o = jnp.zeros_like(phi), jnp.ones_like(phi)
    cphi, sphi = jnp.cos(phi), jnp.sin(phi)
    cth, sth = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack([
        jnp.stack([o, z, -sth], -1),
        jnp.stack([z, cphi, sphi * cth], -1),
        jnp.stack([z, -sphi, cphi * cth], -1),
    ], -2)


def euler_rates_from_omega(eul: jnp.ndarray, omega: jnp.ndarray) -> jnp.ndarray:
    """eul_dot = E(eul)^-1 omega (`blastermodel.py:162`).

    Closed-form inverse (avoids a generic 3x3 solve in the hot path):
        E^-1 = [[1, sphi*tth,  cphi*tth],
                [0, cphi,     -sphi   ],
                [0, sphi/cth,  cphi/cth]]
    """
    phi, theta = eul[..., 0], eul[..., 1]
    cphi, sphi = jnp.cos(phi), jnp.sin(phi)
    cth = jnp.cos(theta)
    tth = jnp.tan(theta)
    p, q, r = omega[..., 0], omega[..., 1], omega[..., 2]
    phi_dot = p + sphi * tth * q + cphi * tth * r
    theta_dot = cphi * q - sphi * r
    psi_dot = (sphi * q + cphi * r) / cth
    return jnp.stack([phi_dot, theta_dot, psi_dot], -1)


def gimbal_rotation(alpha1: jnp.ndarray, alpha2: jnp.ndarray) -> jnp.ndarray:
    """Body-to-nozzle rotation Ry(alpha1) @ Rx(alpha2) (`blastermodel.py:143-160`)."""
    return rot_y(alpha1) @ rot_x(alpha2)


# --- Quaternion helpers (parity with utils/MathUtils.py; q = [w, x, y, z]) ---

def quat_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product (`utils/MathUtils.py:5-23`)."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], -1)


def unit_quat_inv(q: jnp.ndarray) -> jnp.ndarray:
    """Unit-quaternion inverse = conjugate (`utils/MathUtils.py:25-39`)."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix from unit quaternion (`utils/MathUtils.py:41-54`)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([2 * (w * w + x * x) - 1, 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 2 * (w * w + y * y) - 1, 2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 2 * (w * w + z * z) - 1], -1),
    ], -2)


def euler_zyx_to_quat(eul: jnp.ndarray) -> jnp.ndarray:
    """[w,x,y,z] quaternion from ZYX Euler angles.

    Parity with `transforms3d.euler.euler2quat` as used by the flight node
    (`src/scripts/mavros_blaster_sim.py:12,92-95`, which passes (phi, theta,
    psi) with that library's default 'sxyz' convention — equal to our ZYX
    world composition).
    """
    half = eul * 0.5
    cph, sph = jnp.cos(half[..., 0]), jnp.sin(half[..., 0])
    cth, sth = jnp.cos(half[..., 1]), jnp.sin(half[..., 1])
    cps, sps = jnp.cos(half[..., 2]), jnp.sin(half[..., 2])
    return jnp.stack([
        cph * cth * cps + sph * sth * sps,
        sph * cth * cps - cph * sth * sps,
        cph * sth * cps + sph * cth * sps,
        cph * cth * sps - sph * sth * cps,
    ], -1)


def quat_to_euler_zyx(q: jnp.ndarray) -> jnp.ndarray:
    """[phi, theta, psi] ZYX Euler from a [w,x,y,z] unit quaternion.

    Inverse of `euler_zyx_to_quat`; used by the UDP telemetry path
    (io/transport.py) to hand PoseStamped attitude to the Euler-state
    controller. theta is asin-clamped against |.|>1 roundoff."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    phi = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    theta = jnp.arcsin(jnp.clip(2 * (w * y - x * z), -1.0, 1.0))
    psi = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return jnp.stack([phi, theta, psi], -1)
