"""TaskSet/ContactSet variant tests: JPos, BodyRyRz, LocalPos,
FixedBodyContact composed through the same kin_wbc/wbic cascades as the
locomotion tasks."""

import pytest
import numpy as np
import jax.numpy as jnp

from quad_periodic_mpc_tpu.control import wbc, wbc_tasks
from quad_periodic_mpc_tpu.models import floating_base as fb
from quad_periodic_mpc_tpu.ops.rotations import rpy_to_quat

pytestmark = pytest.mark.smoke  # fast cross-layer sanity tier

MC = fb.build_a1_constants("float64")


def standing_state(h=0.29, rpy=(0.0, 0.0, 0.0)):
    q_stand = np.array([0.0, 0.8, -1.6] * 4)
    return fb.FBState(
        quat=rpy_to_quat(jnp.asarray(rpy, jnp.float64)),
        pos=jnp.asarray([0.0, 0.0, h]),
        v_body=jnp.zeros(6),
        q=jnp.asarray(q_stand),
        qd=jnp.zeros(12),
    )


def test_jpos_task_jacobian_and_command():
    st = standing_state()
    q_des = st.q + 0.1
    J, err, vel, cmd, jdqd = wbc_tasks.jpos_task(st, q_des, kp=50.0, kd=5.0)
    assert J.shape == (12, 18)
    np.testing.assert_allclose(np.asarray(J[:, 6:]), np.eye(12))
    np.testing.assert_allclose(np.asarray(J[:, :6]), 0.0)
    np.testing.assert_allclose(np.asarray(err), 0.1, atol=1e-12)
    # qd = 0 so cmd = Kp * err (JPosTask.cpp:31-35)
    np.testing.assert_allclose(np.asarray(cmd), 5.0, atol=1e-9)


def test_jpos_task_in_kinwbc_with_fixed_body():
    """FixedBodyContact pins the 6 base DOFs; a JPos task then resolves
    exactly in the contact null space: des_jpos == q_des (the JPos-ctrl
    configuration of the MIT stack)."""
    st = standing_state()
    q_des = st.q + jnp.asarray([0.05, -0.03, 0.08] * 4)
    Jc, Jcdqd, Uf, ieq = wbc_tasks.fixed_body_contact(dtype=jnp.float64)
    task = wbc_tasks.jpos_task(st, q_des)
    des_jpos, des_jvel = wbc.kin_wbc(
        st, Jc, [task[0]], [task[1]], [task[2]], wbc.WBCGains()
    )
    np.testing.assert_allclose(np.asarray(des_jpos), np.asarray(q_des), atol=1e-3)
    np.testing.assert_allclose(np.asarray(des_jvel), 0.0, atol=1e-9)


def test_fixed_body_contact_shapes():
    Jc, Jcdqd, Uf, ieq = wbc_tasks.fixed_body_contact((5,), jnp.float64)
    assert Jc.shape == (5, 6, 18)
    np.testing.assert_allclose(np.asarray(Jc[0, :, :6]), np.eye(6))
    assert Jcdqd.shape == (5, 6)
    # no friction inequality (FixedBodyContact.cpp:9-10)
    np.testing.assert_allclose(np.asarray(Uf), 0.0)
    np.testing.assert_allclose(np.asarray(ieq), 0.0)


def test_body_ryrz_leaves_roll_free():
    """Pitch/yaw error maps to the command; pure roll error maps to
    ZERO (the released DOF, BodyRyRzTask.cpp:50-57)."""
    st = standing_state(rpy=(0.3, 0.0, 0.0))       # pure roll offset
    J, err, vel, cmd, _ = wbc_tasks.body_ryrz_task_rpy(st, jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(err), 0.0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(cmd), 0.0, atol=1e-7)
    assert J.shape == (2, 18)
    np.testing.assert_allclose(np.asarray(J[0]), np.eye(18)[1])
    np.testing.assert_allclose(np.asarray(J[1]), np.eye(18)[2])

    st2 = standing_state(rpy=(0.0, 0.2, -0.1))     # pitch + yaw offset
    _, err2, _, cmd2, _ = wbc_tasks.body_ryrz_task_rpy(st2, jnp.zeros(3))
    # so3 error of the inverse rotation ~ (-pitch, -yaw) for small angles
    np.testing.assert_allclose(np.asarray(err2), [-0.2, 0.1], atol=0.01)


def test_local_pos_task_jacobian_consistency():
    """Jt = Jc[link] - Jc[frame] must differentiate the relative foot
    position: Jt @ gen_vel == d/dt (p[link] - p[frame]) (finite diff)."""
    st = standing_state()
    rng = np.random.default_rng(0)
    qd = jnp.asarray(rng.uniform(-0.5, 0.5, 12))
    v_body = jnp.asarray(rng.uniform(-0.2, 0.2, 6))
    st = st._replace(qd=qd, v_body=v_body)
    info = fb.contact_jacobians(st, MC)
    rel_des = info.p_foot[0] - info.p_foot[1]
    J, err, vel, cmd, jdqd = wbc_tasks.local_pos_task(
        st, info, 0, 1, rel_des
    )
    np.testing.assert_allclose(np.asarray(err), 0.0, atol=1e-12)

    # finite-difference the relative position along the generalized vel
    from quad_periodic_mpc_tpu.models.floating_base import forward_kinematics
    from quad_periodic_mpc_tpu.estimation.orientation import quat_product

    eps = 1e-6
    omega_b = st.v_body[:3]
    dq = 0.5 * quat_product(
        st.quat, jnp.concatenate([jnp.zeros(1), omega_b])
    )
    st2 = fb.FBState(
        quat=st.quat + eps * dq,
        pos=st.pos + eps * jnp.einsum(
            "ij,j->i",
            np.asarray(
                __import__("quad_periodic_mpc_tpu.ops.rotations",
                           fromlist=["quat_to_rotmat"]).quat_to_rotmat(st.quat)
            ),
            st.v_body[3:6],
        ),
        v_body=st.v_body,
        q=st.q + eps * st.qd,
        qd=st.qd,
    )
    info2 = fb.contact_jacobians(st2, MC)
    rel1 = np.asarray(info.p_foot[0] - info.p_foot[1])
    rel2 = np.asarray(info2.p_foot[0] - info2.p_foot[1])
    v_fd = (rel2 - rel1) / eps
    gen_vel = jnp.concatenate([st.v_body, st.qd])
    v_task = np.asarray(J @ gen_vel)
    np.testing.assert_allclose(v_task, v_fd, atol=1e-4)


def test_variants_compose_in_wbic():
    """wbic runs with the extended task list (RyRz + JPos appended after
    the locomotion tasks) and still returns gravity-consistent torques."""
    st = standing_state()
    A = fb.mass_matrix(st, MC)
    grav = fb.generalized_gravity(st, MC)
    cori = fb.generalized_coriolis(st, MC)
    Ainv = jnp.linalg.inv(A)
    info = fb.contact_jacobians(st, MC)

    gains = wbc.WBCGains()
    contact_mask = jnp.ones(4)
    p = fb.A1ModelParams()
    m_tot = p.body_mass + 4 * (
        p.abad_mass + p.hip_mass + p.knee_mass + 3 * p.rotor_mass
    )
    fr_des = jnp.zeros((4, 3)).at[:, 2].set(m_tot * 9.81 / 4)

    t_ryrz = wbc_tasks.body_ryrz_task_rpy(st, jnp.zeros(3))
    t_jpos = wbc_tasks.jpos_task(st, st.q)
    tau, fr, qddot = wbc.wbic(
        st, A, Ainv, cori, grav, info.Jc, info.Jcdqd,
        [t_ryrz[0], t_jpos[0]], [t_ryrz[3], t_jpos[3]],
        [t_ryrz[4], t_jpos[4]],
        fr_des, contact_mask, gains,
    )
    # base rows absorb the W_floating relaxation (a few rad/s^2, same
    # bound as test_wbc.test_standing_equilibrium: equal fz on an
    # asymmetric stance leaves a pitch moment)
    assert np.abs(np.asarray(qddot)).max() < 5.0
    assert np.isfinite(np.asarray(tau)).all()
    # solved forces stay near the commanded gravity split
    np.testing.assert_allclose(
        np.asarray(fr).reshape(4, 3)[:, 2], np.asarray(fr_des)[:, 2],
        rtol=0.5,
    )


def test_body_posture_task_six_dof():
    st = standing_state(rpy=(0.0, 0.1, 0.0))
    J, err, vel, cmd, _ = wbc_tasks.body_posture_task(
        st, rpy_to_quat(jnp.zeros(3)), st.pos + jnp.asarray([0.0, 0.0, 0.02])
    )
    assert J.shape == (6, 18)
    # Jt = blkdiag(Rot^T, Rot^T) (BodyPostureTask.cpp:91-92); the
    # reference's Rot is world->body, so Rot^T = body->world = R — the
    # same matrix the locomotion BodyOri/BodyPos tasks in wbc.py use.
    from quad_periodic_mpc_tpu.ops.rotations import quat_to_rotmat
    R = np.asarray(quat_to_rotmat(st.quat))
    np.testing.assert_allclose(np.asarray(J[0:3, 0:3]), R, atol=1e-12)
    np.testing.assert_allclose(np.asarray(J[3:6, 3:6]), R, atol=1e-12)
    np.testing.assert_allclose(np.asarray(J[:, 6:]), 0.0)
    # pitch error ~ -0.1, z error = +0.02
    assert abs(float(err[1]) + 0.1) < 5e-3
    np.testing.assert_allclose(float(err[5]), 0.02, atol=1e-9)


def test_local_roll_task_scalar():
    st = standing_state(rpy=(0.15, 0.0, 0.0))
    J, err, vel, cmd, _ = wbc_tasks.local_roll_task(st, jnp.asarray(0.0))
    assert J.shape == (1, 18)
    np.testing.assert_allclose(np.asarray(J[0]), np.eye(18)[0])
    np.testing.assert_allclose(float(err[0]), -0.15, atol=1e-7)
    # default gains 350/13 (LocalRollTask.cpp:19-20)
    np.testing.assert_allclose(float(cmd[0]), 350.0 * -0.15, atol=1e-4)
