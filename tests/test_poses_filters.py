"""Pose behaviors, signal filters, stairs swing tests."""

import pytest
import numpy as np
import jax.numpy as jnp

from quad_periodic_mpc_tpu.control import poses
from quad_periodic_mpc_tpu.ops import swing
from quad_periodic_mpc_tpu.utils import filters

pytestmark = pytest.mark.smoke  # fast cross-layer sanity tier


def test_stand_up_ramp():
    ini = jnp.asarray([[0.0, -0.08, -0.1]] * 4)
    R = jnp.eye(3)
    out0 = poses.stand_up_impedance(jnp.asarray(0.0), ini, R)
    np.testing.assert_allclose(np.asarray(out0.p_des), np.asarray(ini), atol=1e-7)
    out2 = poses.stand_up_impedance(jnp.asarray(2.0), ini, R)
    np.testing.assert_allclose(np.asarray(out2.p_des)[:, 2], -0.33, atol=1e-7)
    # gravity feedforward: -m g / 4 per leg in z
    np.testing.assert_allclose(
        np.asarray(out2.force_ff)[:, 2], -6.0 * 9.81 / 4, atol=1e-5
    )
    # halfway
    out1 = poses.stand_up_impedance(jnp.asarray(1.0), ini, R)
    np.testing.assert_allclose(
        np.asarray(out1.p_des)[:, 2], 0.5 * (-0.33) + 0.5 * (-0.1), atol=1e-6
    )


def test_recovery_ramps():
    q0 = jnp.zeros((4, 3))
    mid = poses.joint_ramp(jnp.asarray(0.5), q0, "fold", 1.0)
    np.testing.assert_allclose(
        np.asarray(mid.q_des)[0], [0.0, -0.7, 1.35], atol=1e-6
    )
    end = poses.joint_ramp(jnp.asarray(2.0), q0, "stand", 1.0)
    np.testing.assert_allclose(
        np.asarray(end.q_des)[0], [0.0, -0.8, 1.6], atol=1e-6
    )


def test_first_order_lp():
    st = filters.LowPassState(jnp.asarray(0.0))
    for _ in range(100):
        st, y = filters.first_order_lp(st, jnp.asarray(1.0), 0.1)
    assert abs(float(y) - 1.0) < 1e-4


def test_digital_lp_dc_gain():
    init, step = filters.make_digital_lp(w_c=50.0, t_s=0.002)
    st = init()
    for _ in range(500):
        st, y = step(st, jnp.asarray(2.5))
    assert abs(float(y) - 2.5) < 1e-3


def test_deriv_lp_of_ramp():
    """Derivative filter of a unit-slope ramp -> ~1."""
    init, step = filters.make_deriv_lp(w_c=100.0, t_s=0.001)
    st = init()
    for k in range(2000):
        st, y = step(st, jnp.asarray(k * 0.001))
    assert abs(float(y) - 1.0) < 0.05


def test_moving_average_warmup():
    st = filters.moving_average_init(4)
    vals = [4.0, 8.0]
    outs = []
    for v in vals:
        st, y = filters.moving_average(st, jnp.asarray(v))
        outs.append(float(y))
    assert outs[0] == 4.0            # warmup: mean of 1 sample
    assert outs[1] == 6.0            # mean of 2
    for v in [0.0, 0.0, 0.0, 0.0]:
        st, y = filters.moving_average(st, jnp.asarray(v))
    assert float(y) == 0.0           # window fully flushed


def test_stairs_swing_holds_xy_position():
    """Faithful quirk: xy POSITION holds at p0 (FootSwingTrajectory.cpp:65-84
    passes p0 as both endpoints) while z runs the two-segment lift."""
    p0 = jnp.asarray([0.1, 0.05, 0.0])
    pf = jnp.asarray([0.3, 0.05, 0.1])
    ev = swing.evaluate_stairs(p0, pf, 0.09, jnp.asarray(0.3), jnp.asarray(0.28))
    np.testing.assert_allclose(np.asarray(ev.p)[:2], [0.1, 0.05], atol=1e-9)
    # z matches the standard swing z
    ev_std = swing.evaluate(p0, pf, 0.09, jnp.asarray(0.3), jnp.asarray(0.28))
    assert abs(float(ev.p[2]) - float(ev_std.p[2])) < 1e-9
    # velocities use the 1/3-waypoint profile (nonzero x velocity)
    assert float(ev.v[0]) != 0.0
