"""Homogeneous-transform chain for the blasting nozzle.

jnp re-design of `src/scripts/htm.py:7-36`: body -> swivel-1 -> swivel-2 ->
nozzle with the reference's exact mount offsets, and world -> body from ZYX
Euler angles. Used by the POC solver to place the jet source.
"""
from __future__ import annotations

import jax.numpy as jnp

from mpc_blaster_tpu.core.rotations import euler_zyx_to_rot, rot_x, rot_y, rot_z

# Mount offsets, `src/scripts/htm.py:10-26`.
OFFSET_B_S1 = (0.01672, 0.0, -0.22937)
OFFSET_S1_S2 = (0.0425, 0.0, 0.0)
OFFSET_S2_N = (-0.05322, 0.0, -0.15946)


def _make_T(R: jnp.ndarray, t) -> jnp.ndarray:
    T = jnp.eye(4, dtype=R.dtype)
    T = T.at[:3, :3].set(R)
    return T.at[:3, 3].set(jnp.asarray(t, dtype=R.dtype))


def T_b_s2(alpha1: jnp.ndarray, alpha2: jnp.ndarray) -> jnp.ndarray:
    """Body-to-nozzle transform (`htm.py:7-28`).

    The chain is translate(b->s1) @ [Ry(alpha1) | t_s1s2] @ [Rx(-alpha2)^T
    form | t_s2n] exactly as the reference composes it: note the reference's
    hs2n uses the transpose convention for alpha2 (entries [1,2]=+sin,
    [2,1]=-sin), i.e. Rx(-alpha2).
    """
    dtype = jnp.result_type(alpha1, alpha2, jnp.float32)
    a1 = jnp.asarray(alpha1, dtype)
    a2 = jnp.asarray(alpha2, dtype)
    h_b_s1 = _make_T(jnp.eye(3, dtype=dtype), OFFSET_B_S1)
    h_s1_s2 = _make_T(rot_y(a1), OFFSET_S1_S2)
    h_s2_n = _make_T(rot_x(-a2), OFFSET_S2_N)
    return h_b_s1 @ h_s1_s2 @ h_s2_n


def T_w_b(eul: jnp.ndarray, position: jnp.ndarray,
          convention: str = "htm") -> jnp.ndarray:
    """World-to-body transform from [phi, theta, psi] + position (`htm.py:30-36`).

    Reference quirk: `htm.py:33` builds scipy `R.from_euler('zyx', ...)` with
    *lowercase* (extrinsic) axes, i.e. R = Rx(phi) @ Ry(theta) @ Rz(psi) —
    which is NOT the dynamics model's intrinsic ZYX composition
    Rz(psi)Ry(theta)Rx(phi) (`blastermodel.py:122`). Both conventions agree to
    first order at eul = 0, where the reference evaluates its POC Jacobians
    (`Jacobian_POC_Solver.py:56-57`). ``convention="htm"`` reproduces the
    reference; ``"model"`` uses the dynamics-consistent intrinsic ZYX.
    """
    if convention == "htm":
        R = rot_x(eul[..., 0]) @ rot_y(eul[..., 1]) @ rot_z(eul[..., 2])
    elif convention == "model":
        R = euler_zyx_to_rot(eul)
    else:
        raise ValueError(f"unknown euler convention: {convention}")
    return _make_T(R, position)


def nozzle_pose(eul: jnp.ndarray, alpha: jnp.ndarray, position: jnp.ndarray,
                convention: str = "htm"):
    """(p_nozzle_world, R_world_from_nozzle) for jet initialization.

    Mirrors `Jacobian_POC_Solver.setInitConditions` (`Jacobian_POC_Solver.py:154-165`).
    """
    T = T_w_b(eul, position, convention) @ T_b_s2(alpha[..., 0], alpha[..., 1])
    return T[:3, 3], T[:3, :3]
