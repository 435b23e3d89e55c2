"""Orientation estimator (OrientationEstimator.cpp rebuild).

VectorNav path: take the IMU quaternion, zero its initial yaw (first
visit captures q_ini_inv = quat(-[0, 0, yaw0]) and premultiplies it,
OrientationEstimator.cpp:48-58), derive rpy, body/world angular velocity
and acceleration.  Cheater path: pass-through of ground truth.

Stateless-functional: the yaw-zeroing reference is explicit state.
Convention note: the reference's rBody satisfies vBody = rBody vWorld
(world->body); our quat_to_rotmat returns body->world R, so
rBody = R^T.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from quad_periodic_mpc_tpu.ops.rotations import (
    quat_to_rotmat, quat_to_rpy, rpy_to_quat,
)


class OrientationResult(NamedTuple):
    quat: jnp.ndarray         # (..., 4) yaw-zeroed orientation (wxyz)
    rpy: jnp.ndarray          # (..., 3)
    R: jnp.ndarray            # (..., 3, 3) body->world
    omega_body: jnp.ndarray   # (..., 3)
    omega_world: jnp.ndarray  # (..., 3)
    a_body: jnp.ndarray       # (..., 3)
    a_world: jnp.ndarray      # (..., 3)


def quat_product(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product (wxyz), matching ori::quatProduct."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def initial_yaw_correction(quat_imu: jnp.ndarray) -> jnp.ndarray:
    """q_ini_inv from the first IMU sample: the inverse pure-yaw rotation
    (OrientationEstimator.cpp:48-55)."""
    rpy = quat_to_rpy(quat_imu)
    neg_yaw_only = jnp.stack(
        [jnp.zeros_like(rpy[..., 0]), jnp.zeros_like(rpy[..., 1]),
         -rpy[..., 2]],
        axis=-1,
    )
    return rpy_to_quat(neg_yaw_only)


def run(
    quat_imu: jnp.ndarray,
    gyro_body: jnp.ndarray,
    accel_body: jnp.ndarray,
    yaw_correction: jnp.ndarray,
) -> OrientationResult:
    """VectorNavOrientationEstimator::run (OrientationEstimator.cpp:38-80)."""
    quat = quat_product(yaw_correction, quat_imu)
    R = quat_to_rotmat(quat)
    return OrientationResult(
        quat=quat,
        rpy=quat_to_rpy(quat),
        R=R,
        omega_body=gyro_body,
        omega_world=jnp.einsum("...ij,...j->...i", R, gyro_body),
        a_body=accel_body,
        a_world=jnp.einsum("...ij,...j->...i", R, accel_body),
    )
