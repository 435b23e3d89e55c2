"""3-DoF leg kinematics: FK, analytic Jacobian, and IK, batched over
legs x instances.

Rebuilds computeLegJacobianAndPosition (LegController.cpp:230-268): the
A1 leg is abad(roll, q0) -> hip(pitch, q1) -> knee(pitch, q2) with link
lengths (l1 = abad, l2 = hip, l3 = knee); positions are expressed in the
hip-local frame (x forward, y left, z up), sideSign = -1 for right legs.

Conventions follow the reference exactly:
  p_x = l3 s23 + l2 s2
  p_y = (l1+l4) side c1 + (l3 s1 c23 + l2 c2 s1)
  p_z = (l1+l4) side s1 - (l3 c1 c23 + l2 c1 c2)
with s23 = sin(q1 + q2), etc.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class LegGeometry(NamedTuple):
    l1: float   # abad link length
    l2: float   # hip (thigh) link length
    l3: float   # knee (calf) link length
    l4: float = 0.0   # knee link y offset


def foot_position(q: jnp.ndarray, geom: LegGeometry, side_sign: jnp.ndarray) -> jnp.ndarray:
    """FK: joint angles (..., 3) -> foot position (..., 3) in the leg frame
    (LegController.cpp:252-266 'if (p)')."""
    s1, s2, s3 = jnp.sin(q[..., 0]), jnp.sin(q[..., 1]), jnp.sin(q[..., 2])
    c1, c2, c3 = jnp.cos(q[..., 0]), jnp.cos(q[..., 1]), jnp.cos(q[..., 2])
    c23 = c2 * c3 - s2 * s3
    s23 = s2 * c3 + c2 * s3
    l1 = geom.l1 + geom.l4
    px = geom.l3 * s23 + geom.l2 * s2
    py = l1 * side_sign * c1 + geom.l3 * s1 * c23 + geom.l2 * c2 * s1
    pz = l1 * side_sign * s1 - geom.l3 * c1 * c23 - geom.l2 * c1 * c2
    return jnp.stack([px, py, pz], axis=-1)


def leg_jacobian(q: jnp.ndarray, geom: LegGeometry, side_sign: jnp.ndarray) -> jnp.ndarray:
    """Analytic Jacobian (..., 3, 3): d p / d q
    (LegController.cpp:252-266 'if (J)')."""
    s1, s2, s3 = jnp.sin(q[..., 0]), jnp.sin(q[..., 1]), jnp.sin(q[..., 2])
    c1, c2, c3 = jnp.cos(q[..., 0]), jnp.cos(q[..., 1]), jnp.cos(q[..., 2])
    c23 = c2 * c3 - s2 * s3
    s23 = s2 * c3 + c2 * s3
    l1 = geom.l1 + geom.l4
    l2, l3 = geom.l2, geom.l3
    zero = jnp.zeros_like(s1)
    rows = [
        zero, l3 * c23 + l2 * c2, l3 * c23,
        l3 * c1 * c23 + l2 * c1 * c2 - l1 * side_sign * s1,
        -l3 * s1 * s23 - l2 * s1 * s2,
        -l3 * s1 * s23,
        l3 * s1 * c23 + l2 * c2 * s1 + l1 * side_sign * c1,
        l3 * c1 * s23 + l2 * c1 * s2,
        l3 * c1 * s23,
    ]
    return jnp.stack(rows, axis=-1).reshape(q.shape[:-1] + (3, 3))


def foot_velocity(q: jnp.ndarray, qd: jnp.ndarray, geom: LegGeometry,
                  side_sign: jnp.ndarray) -> jnp.ndarray:
    """v = J qd (LegController.cpp:113)."""
    J = leg_jacobian(q, geom, side_sign)
    return jnp.einsum("...ij,...j->...i", J, qd)


def inverse_kinematics(
    p: jnp.ndarray, geom: LegGeometry, side_sign: jnp.ndarray
) -> jnp.ndarray:
    """Analytic IK: leg-frame foot position (..., 3) -> (q0, q1, q2).

    Inverts foot_position on the A1's physical branch (knee q2 < 0: the
    calf folds backward, as in the standing pose q ~ (0, 0.67, -1.3)).
    Derivation: with w = l3 c23 + l2 c2 >= 0 the FK reads
      [py; pz] = Rot(q0) @ [l1*side; -w],   (px, w) = 2-link plane
    so q0 = atan2(pz, py) - atan2(-w, l1*side), and the planar pair
    (q1, q2) follows from the law of cosines.  Round-trip tested.
    """
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    l1 = geom.l1 + geom.l4
    l2, l3 = geom.l2, geom.l3

    r_leg = jnp.sqrt(jnp.maximum(y * y + z * z - l1 * l1, 1e-12))
    q0 = jnp.arctan2(z, y) - jnp.arctan2(-r_leg, l1 * side_sign)

    d2 = x * x + r_leg * r_leg
    cos_knee = jnp.clip((d2 - l2 * l2 - l3 * l3) / (2 * l2 * l3), -1.0, 1.0)
    q2 = -jnp.arccos(cos_knee)              # physical branch: knee < 0
    phi = jnp.arctan2(x, r_leg)             # target angle from straight-down
    q1 = phi - jnp.arctan2(l3 * jnp.sin(q2), l2 + l3 * jnp.cos(q2))
    return jnp.stack([q0, q1, q2], axis=-1)
