"""Estimator container + weak-scaling harness tests."""

import numpy as np
import jax.numpy as jnp

from quad_periodic_mpc_tpu.estimation import container
from quad_periodic_mpc_tpu.models import leg_kinematics as lk
from quad_periodic_mpc_tpu.models.a1 import A1
from quad_periodic_mpc_tpu.ops.rotations import rpy_to_quat
from quad_periodic_mpc_tpu.parallel import scaling


def test_container_stationary_convergence():
    """Full estimation stack on a stationary robot: velocity -> 0,
    relative height -> leg FK height, yaw zeroed on first visit."""
    st = container.init((), jnp.float64)
    q = jnp.asarray([0.0, 0.67, -1.3] * 4).reshape(4, 3)
    qd = jnp.zeros((4, 3))
    # IMU reports a 0.3 rad yaw; estimator must zero it
    quat_imu = rpy_to_quat(jnp.asarray([0.0, 0.0, 0.3]))
    for _ in range(200):
        st, est = container.update(
            st, quat_imu, jnp.zeros(3),
            jnp.asarray([0.0, 0.0, 9.81]),   # accelerometer at rest
            q, qd, jnp.full((4,), 0.5, jnp.float64),
        )
    assert abs(float(est.rpy[2])) < 1e-9          # yaw zeroed
    assert np.abs(np.asarray(est.v_world)).max() < 1e-3
    # body height above feet == -foot_z from FK
    geom = lk.LegGeometry(A1.leg.abad_link_length, A1.leg.hip_link_length,
                          A1.leg.knee_link_length)
    foot_z = float(lk.foot_position(q[0], geom, jnp.asarray(-1.0))[2])
    z_rel = float(est.position[2]) - float(st.kf.xhat[8])
    assert abs(z_rel - (-foot_z)) < 0.02


def test_cheater_passthrough():
    est = container.cheater(
        jnp.asarray([1.0, 2.0, 0.3]), jnp.asarray([0.1, 0.0, 0.0]),
        rpy_to_quat(jnp.asarray([0.0, 0.0, 0.5])),
        jnp.zeros(3), jnp.asarray([0.0, 0.0, 9.81]), jnp.ones(4),
    )
    assert abs(float(est.rpy[2]) - 0.5) < 1e-6
    np.testing.assert_allclose(np.asarray(est.position), [1.0, 2.0, 0.3])


def test_weak_scaling_mechanism():
    """Harness runs on the virtual 8-device mesh and reports efficiency."""
    def make_inputs(batch):
        return (jnp.ones((batch, 64, 64)),)

    def step(x):
        return jnp.sum(x @ x, axis=(-1, -2))

    res = scaling.measure_weak_scaling(
        make_inputs, step, per_device=32, device_counts=[1, 2, 4], reps=2
    )
    assert set(res) == {1, 2, 4}
    assert res[1]["efficiency"] == 1.0
    for k in (2, 4):
        assert res[k]["throughput"] > 0
