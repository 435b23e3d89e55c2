"""Leg kinematics / LegController tests (LegController.cpp:230-268 oracle)."""

import pytest
import numpy as np
import jax.numpy as jnp

from quad_periodic_mpc_tpu.control import leg_controller as lc
from quad_periodic_mpc_tpu.models import leg_kinematics as lk
from quad_periodic_mpc_tpu.models.a1 import A1

pytestmark = pytest.mark.smoke  # fast cross-layer sanity tier

GEOM = lk.LegGeometry(
    l1=A1.leg.abad_link_length, l2=A1.leg.hip_link_length,
    l3=A1.leg.knee_link_length,
)


def ref_jacobian_position(q, side):
    """Literal transliteration of computeLegJacobianAndPosition
    (LegController.cpp:230-268)."""
    l1, l2, l3, l4 = GEOM.l1, GEOM.l2, GEOM.l3, GEOM.l4
    s1, s2, s3 = np.sin(q)
    c1, c2, c3 = np.cos(q)
    c23 = c2 * c3 - s2 * s3
    s23 = s2 * c3 + c2 * s3
    J = np.array([
        [0, l3 * c23 + l2 * c2, l3 * c23],
        [l3 * c1 * c23 + l2 * c1 * c2 - (l1 + l4) * side * s1,
         -l3 * s1 * s23 - l2 * s1 * s2, -l3 * s1 * s23],
        [l3 * s1 * c23 + l2 * c2 * s1 + (l1 + l4) * side * c1,
         l3 * c1 * s23 + l2 * c1 * s2, l3 * c1 * s23],
    ])
    p = np.array([
        l3 * s23 + l2 * s2,
        (l1 + l4) * side * c1 + l3 * (s1 * c23) + l2 * c2 * s1,
        (l1 + l4) * side * s1 - l3 * (c1 * c23) - l2 * c1 * c2,
    ])
    return J, p


def test_fk_jacobian_match_reference():
    rng = np.random.default_rng(0)
    for _ in range(20):
        q = rng.uniform([-0.8, -0.5, -2.2], [0.8, 1.5, -0.4])
        for side in (-1.0, 1.0):
            J_ref, p_ref = ref_jacobian_position(q, side)
            p = lk.foot_position(jnp.asarray(q), GEOM, jnp.asarray(side))
            J = lk.leg_jacobian(jnp.asarray(q), GEOM, jnp.asarray(side))
            np.testing.assert_allclose(np.asarray(p), p_ref, atol=1e-12)
            np.testing.assert_allclose(np.asarray(J), J_ref, atol=1e-12)


def test_jacobian_is_fk_derivative():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.uniform([-0.5, 0.2, -1.8], [0.5, 1.0, -0.6]))
    side = jnp.asarray(1.0)
    eps = 1e-7
    J = np.asarray(lk.leg_jacobian(q, GEOM, side))
    for j in range(3):
        dq = jnp.zeros(3).at[j].set(eps)
        dp = (
            np.asarray(lk.foot_position(q + dq, GEOM, side))
            - np.asarray(lk.foot_position(q, GEOM, side))
        ) / eps
        np.testing.assert_allclose(J[:, j], dp, atol=1e-5)


def test_ik_roundtrip():
    rng = np.random.default_rng(2)
    for _ in range(50):
        q = rng.uniform([-0.7, -0.4, -2.4], [0.7, 1.4, -0.3])
        for side in (-1.0, 1.0):
            p = lk.foot_position(jnp.asarray(q), GEOM, jnp.asarray(side))
            q_ik = lk.inverse_kinematics(p, GEOM, jnp.asarray(side))
            np.testing.assert_allclose(np.asarray(q_ik), q, atol=1e-7)


def test_leg_controller_torque_path():
    """Stance leg: tau = J^T f (+ PD terms zero at setpoint), clamped,
    hip/knee sign-flipped (be2r_cmpc_unitree.cpp:657-719)."""
    batch = (2,)
    q = jnp.broadcast_to(jnp.asarray([0.0, 0.67, -1.3]), batch + (4, 3))
    qd = jnp.zeros(batch + (4, 3))
    data = lc.update_data(q, qd, A1)

    f_ff = jnp.zeros(batch + (4, 3)).at[..., 2].set(-30.0)  # push down
    cmd = lc.LegCommand.zeros(batch)._replace(
        force_ff=f_ff, p_des=data.p, v_des=data.v, q_des=q, qd_des=qd
    )
    tau = lc.torque_output(cmd, data, A1)
    tau_expected = np.einsum(
        "...ji,...j->...i", np.asarray(data.J), np.asarray(f_ff)
    ) * np.array([1.0, -1.0, -1.0])
    tau_expected = np.clip(
        np.einsum("...ji,...j->...i", np.asarray(data.J), np.asarray(f_ff)),
        -np.array(A1.tau_max), np.array(A1.tau_max),
    ) * np.array([1.0, -1.0, -1.0])
    np.testing.assert_allclose(np.asarray(tau), tau_expected, atol=1e-6)

    # safe mode clamps to 3 Nm
    tau_safe = lc.torque_output(cmd, data, A1, safe_mode=True)
    assert np.abs(np.asarray(tau_safe)).max() <= 3.0 + 1e-6
