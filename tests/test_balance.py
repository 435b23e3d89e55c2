"""BalanceController QP tests (BalanceController.cpp rebuild)."""

import numpy as np
import jax.numpy as jnp

from quad_periodic_mpc_tpu.control import balance


def setup(contact=(1, 1, 1, 1)):
    p_com = jnp.asarray([0.0, 0.0, 0.29])
    v_com = jnp.zeros(3)
    R = jnp.eye(3)
    omega = jnp.zeros(3)
    yaw = jnp.asarray(0.0)
    feet = jnp.asarray(
        [[0.18, -0.13, -0.29], [0.18, 0.13, -0.29],
         [-0.18, -0.13, -0.29], [-0.18, 0.13, -0.29]]
    )
    cmd = balance.BalanceCommand(
        p_des=p_com, v_des=v_com, a_des=jnp.zeros(3),
        R_des=jnp.eye(3), omega_des=jnp.zeros(3),
    )
    return p_com, v_com, R, omega, yaw, feet, jnp.asarray(contact, jnp.float64), cmd


def test_stand_supports_weight():
    p, v, R, w, yaw, feet, c, cmd = setup()
    f = np.asarray(balance.solve(p, v, R, w, yaw, feet, c, cmd))
    cfg = balance.BalanceSettings()
    assert abs(f[:, 2].sum() - cfg.mass * 9.81) < 2.0
    # symmetric stance at setpoint: near-equal distribution, small moments
    assert f[:, 2].std() < 6.0
    torque = np.sum(np.cross(np.asarray(feet), f), axis=0)
    assert np.abs(torque).max() < 2.0
    # friction + min-force bounds respected
    assert (f[:, 2] >= cfg.min_force - 1e-4).all()
    assert (np.abs(f[:, 0]) <= cfg.mu * f[:, 2] + 1e-6).all()


def test_three_leg_stance_pins_swing():
    p, v, R, w, yaw, feet, _, cmd = setup()
    c = jnp.asarray([0.0, 1.0, 1.0, 1.0])
    f = np.asarray(balance.solve(p, v, R, w, yaw, feet, c, cmd))
    np.testing.assert_allclose(f[0], 0.0, atol=1e-4)
    cfg = balance.BalanceSettings()
    assert abs(f[1:, 2].sum() - cfg.mass * 9.81) < 3.0


def test_position_error_pushes_back():
    """CoM displaced +x of target -> net backward (-x) force command."""
    p, v, R, w, yaw, feet, c, cmd = setup()
    cmd = cmd._replace(p_des=jnp.asarray([-0.03, 0.0, 0.29]))
    f = np.asarray(balance.solve(p, v, R, w, yaw, feet, c, cmd))
    assert f[:, 0].sum() < -3.0


def test_matrix_log_rot():
    from quad_periodic_mpc_tpu.ops.rotations import rpy_to_rotmat
    for axis, ang in [(0, 0.3), (1, -0.4), (2, 1.0)]:
        rpy = np.zeros(3)
        rpy[axis] = ang
        R = rpy_to_rotmat(jnp.asarray(rpy))
        w = np.asarray(balance.matrix_log_rot(R))
        expected = np.zeros(3)
        expected[axis] = ang
        np.testing.assert_allclose(w, expected, atol=1e-9)
    # identity edge case
    np.testing.assert_allclose(
        np.asarray(balance.matrix_log_rot(jnp.eye(3))), 0.0, atol=1e-12
    )


def test_batched_balance():
    p, v, R, w, yaw, feet, c, cmd = setup()
    B = 4
    bx = lambda x: jnp.broadcast_to(x, (B,) + x.shape)
    f_b = balance.solve(
        bx(p), bx(v), bx(R), bx(w), jnp.zeros(B), bx(feet), bx(c),
        balance.BalanceCommand(*[bx(x) for x in cmd]),
    )
    f_1 = balance.solve(p, v, R, w, yaw, feet, c, cmd)
    np.testing.assert_allclose(np.asarray(f_b[2]), np.asarray(f_1), atol=1e-9)
