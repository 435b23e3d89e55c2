"""Quaternion / RPY / rotation-matrix conversions.

Semantics match the reference's orientation conventions:
- quat_to_rpy: SolverMPC.cpp:352-361 (note its rpy vector is ordered
  [yaw-ish, pitch, roll-ish]; we return conventional (roll, pitch, yaw)
  matching how x_0 is packed at SolverMPC.cpp:592: x_0 << rpy(2), rpy(1),
  rpy(0) == [roll, pitch, yaw]).
- rpy_to_rotmat: R = Rz(yaw) Ry(pitch) Rx(roll)
  (ConvexMPCLocomotion.cpp:1081-1097).

All functions are elementwise-batched: inputs may carry arbitrary leading
batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_to_rpy(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (w, x, y, z) -> (roll, pitch, yaw).

    Matches SolverMPC.cpp:352-361 including the asin clamp at 0.99999:
      yaw   = atan2(2(xy + wz), w^2 + x^2 - y^2 - z^2)
      pitch = asin(min(-2(xz - wy), 0.99999))
      roll  = atan2(2(yz + wx), w^2 - x^2 - y^2 + z^2)
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    as_ = jnp.minimum(-2.0 * (x * z - w * y), 0.99999)
    yaw = jnp.arctan2(2.0 * (x * y + w * z), w * w + x * x - y * y - z * z)
    pitch = jnp.arcsin(as_)
    roll = jnp.arctan2(2.0 * (y * z + w * x), w * w - x * x - y * y + z * z)
    return jnp.stack([roll, pitch, yaw], axis=-1)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (w, x, y, z) -> rotation matrix R (body->world).

    Same convention as Eigen's Quaternion::toRotationMatrix used at
    RobotState.cpp:36.
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = w * w + x * x + y * y + z * z
    s = jnp.where(n > 0, 2.0 / n, 0.0)
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    r = jnp.stack(
        [
            1.0 - (yy + zz), xy - wz, xz + wy,
            xy + wz, 1.0 - (xx + zz), yz - wx,
            xz - wy, yz + wx, 1.0 - (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def rpy_to_rotmat(rpy: jnp.ndarray) -> jnp.ndarray:
    """(roll, pitch, yaw) -> R = Rz(yaw) @ Ry(pitch) @ Rx(roll).

    Matches the R_z*R_y*R_x composition at ConvexMPCLocomotion.cpp:1097.
    """
    roll, pitch, yaw = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    r = jnp.stack(
        [
            cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr,
            sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr,
            -sp, cp * sr, cp * cr,
        ],
        axis=-1,
    )
    return r.reshape(rpy.shape[:-1] + (3, 3))


def rotmat_to_rpy(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> (roll, pitch, yaw), inverse of rpy_to_rotmat.

    Matches groundTruthCallback extraction (ConvexMPCLocomotion.cpp:968-970).
    """
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    pitch = jnp.arcsin(jnp.clip(-R[..., 2, 0], -1.0, 1.0))
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    return jnp.stack([roll, pitch, yaw], axis=-1)


def rpy_to_quat(rpy: jnp.ndarray) -> jnp.ndarray:
    """(roll, pitch, yaw) -> quaternion (w, x, y, z) for Rz Ry Rx."""
    half = 0.5 * rpy
    cr, sr = jnp.cos(half[..., 0]), jnp.sin(half[..., 0])
    cp, sp = jnp.cos(half[..., 1]), jnp.sin(half[..., 1])
    cy, sy = jnp.cos(half[..., 2]), jnp.sin(half[..., 2])
    w = cr * cp * cy + sr * sp * sy
    x = sr * cp * cy - cr * sp * sy
    y = cr * sp * cy + sr * cp * sy
    z = cr * cp * sy - sr * sp * cy
    return jnp.stack([w, x, y, z], axis=-1)


def yaw_rotmat(yaw: jnp.ndarray) -> jnp.ndarray:
    """Pure-yaw rotation Rz(yaw) (RobotState.cpp:40-42 before the R_yaw = R
    override; kept for the yaw-only linearization variant)."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    r = jnp.stack([c, -s, zero, s, c, zero, zero, zero, one], axis=-1)
    return r.reshape(yaw.shape + (3, 3))


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """[v]x cross-product matrix (cross_mat operand, SolverMPC.cpp:252-257)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    r = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return r.reshape(v.shape[:-1] + (3, 3))
