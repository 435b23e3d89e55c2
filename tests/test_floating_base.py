"""Property tests for the floating-base dynamics (FloatingBaseModel.cpp
rebuild): energy/derivative identities validate mass matrix, gravity,
Coriolis and contact Jacobians without a C++ oracle."""

import numpy as np
import jax.numpy as jnp

from quad_periodic_mpc_tpu.models import floating_base as fb
from quad_periodic_mpc_tpu.models import leg_kinematics as lk
from quad_periodic_mpc_tpu.models import spatial as sp
from quad_periodic_mpc_tpu.models.a1 import A1
from quad_periodic_mpc_tpu.ops.rotations import rpy_to_quat, rpy_to_rotmat

MC = fb.build_a1_constants("float64")
RNG = np.random.default_rng(0)


def rand_state(base_still=False, batch=()):
    rpy = RNG.uniform(-0.3, 0.3, batch + (3,))
    quat = np.asarray(rpy_to_quat(jnp.asarray(rpy)))
    pos = RNG.uniform(-1, 1, batch + (3,))
    v = np.zeros(batch + (6,)) if base_still else RNG.uniform(-1, 1, batch + (6,))
    q = RNG.uniform([-0.5, 0.2, -1.8] * 4, [0.5, 1.2, -0.6] * 4, batch + (12,))
    qd = RNG.uniform(-2, 2, batch + (12,))
    return fb.FBState(
        quat=jnp.asarray(quat), pos=jnp.asarray(pos), v_body=jnp.asarray(v),
        q=jnp.asarray(q), qd=jnp.asarray(qd),
    )


def kinetic_energy(state):
    """Independent KE: 1/2 sum_i v_i^T I_i v_i over links + rotors."""
    kin = fb.forward_kinematics(state, MC)
    ke = 0.5 * kin.v[0] @ np.asarray(MC.I_base) @ kin.v[0]
    for j in range(12):
        b = j + 1
        ke = ke + 0.5 * kin.v[b] @ np.asarray(MC.I_link[j]) @ kin.v[b]
        ke = ke + 0.5 * kin.vrot[b] @ np.asarray(MC.I_rotor[j]) @ kin.vrot[b]
    return float(ke)


def generalized_velocity(state):
    return np.concatenate([np.asarray(state.v_body), np.asarray(state.qd)])


def potential_energy(state):
    """V = sum_i m_i * 9.81 * z_com_i (world), links + rotors (rotor CoM at
    joint origin)."""
    kin = fb.forward_kinematics(state, MC)
    V = 0.0

    def body_V(Xa, I6):
        I6 = np.asarray(I6)
        m = I6[5, 5]
        mc_hat = I6[0:3, 3:6]
        c = np.array([mc_hat[2, 1], mc_hat[0, 2], mc_hat[1, 0]]) / m
        Xa = np.asarray(Xa)
        R = Xa[0:3, 0:3]          # world -> link
        rx = -R.T @ Xa[3:6, 0:3]
        r = np.array([rx[2, 1], rx[0, 2], rx[1, 0]])   # link origin, world
        c_world = r + R.T @ c
        return m * 9.81 * c_world[2]

    V += body_V(kin.Xa[0], MC.I_base)
    for j in range(12):
        V += body_V(kin.Xa[j + 1], MC.I_link[j])
        # rotor j is mounted on the PARENT body at its own Xrot offset:
        # world transform = Xuprot[j] @ Xa[parent] (forwardKinematics,
        # FloatingBaseModel.cpp:529-533)
        Xarot = np.asarray(kin.Xuprot[j + 1]) @ np.asarray(
            kin.Xa[MC.parents[j]]
        )
        V += body_V(Xarot, MC.I_rotor[j])
    return float(V)


def test_mass_matrix_vs_kinetic_energy():
    for _ in range(5):
        st = rand_state()
        H = np.asarray(fb.mass_matrix(st, MC))
        qd = generalized_velocity(st)
        ke = kinetic_energy(st)
        assert abs(0.5 * qd @ H @ qd - ke) < 1e-10 * max(1.0, abs(ke))
        np.testing.assert_allclose(H, H.T, atol=1e-12)
        assert np.linalg.eigvalsh(H).min() > 0


def test_total_mass_in_mass_matrix():
    st = rand_state()
    H = np.asarray(fb.mass_matrix(st, MC))
    p = fb.A1ModelParams()
    m_tot = (
        p.body_mass
        + 4 * (p.abad_mass + p.hip_mass + p.knee_mass + 3 * p.rotor_mass)
    )
    # linear-linear block of locked inertia = total mass * I
    np.testing.assert_allclose(H[3:6, 3:6], m_tot * np.eye(3), atol=1e-9)


def test_gravity_is_potential_gradient():
    st = rand_state(base_still=True)
    G = np.asarray(fb.generalized_gravity(st, MC))
    eps = 1e-6
    for j in range(12):
        dq = np.zeros(12)
        dq[j] = eps
        st_p = st._replace(q=st.q + jnp.asarray(dq))
        st_m = st._replace(q=st.q - jnp.asarray(dq))
        dV = (potential_energy(st_p) - potential_energy(st_m)) / (2 * eps)
        assert abs(G[6 + j] - dV) < 1e-5, (j, G[6 + j], dV)
    # base linear rows: magnitude = m_tot * g along world z mapped to body
    p = fb.A1ModelParams()
    m_tot = (
        p.body_mass
        + 4 * (p.abad_mass + p.hip_mass + p.knee_mass + 3 * p.rotor_mass)
    )
    R = np.asarray(rpy_to_rotmat(jnp.asarray(
        np.asarray(__import__('quad_periodic_mpc_tpu.ops.rotations',
                              fromlist=['quat_to_rpy']).quat_to_rpy(st.quat)))))
    expected_lin = m_tot * 9.81 * (R.T @ np.array([0, 0, 1.0]))
    np.testing.assert_allclose(G[3:6], expected_lin, atol=1e-9)


def test_coriolis_energy_identity():
    """Fixed-base check: Cqd = (dM/dt) qd - 1/2 d(qd^T M qd)/dq."""
    st = rand_state(base_still=True)
    qd = np.asarray(st.qd)
    eps = 1e-6

    def Mjj(q):
        return np.asarray(
            fb.mass_matrix(st._replace(q=jnp.asarray(q)), MC)
        )[6:, 6:]

    q0 = np.asarray(st.q)
    # dM/dt = sum_k dM/dq_k qd_k
    dMdt = np.zeros((12, 12))
    dKdq = np.zeros(12)
    for k in range(12):
        dq = np.zeros(12)
        dq[k] = eps
        dM = (Mjj(q0 + dq) - Mjj(q0 - dq)) / (2 * eps)
        dMdt += dM * qd[k]
        dKdq[k] = 0.5 * qd @ dM @ qd
    c_expected = dMdt @ qd - dKdq
    C = np.asarray(fb.generalized_coriolis(st, MC))[6:]
    np.testing.assert_allclose(C, c_expected, atol=1e-4)


def test_contact_jacobian_finite_difference():
    """J qdot == d p_foot / dt under exact state integration."""
    st = rand_state()
    info = fb.contact_jacobians(st, MC)
    qdot = generalized_velocity(st)
    dt = 1e-7

    # integrate: pos += R v dt; R <- R (I + [w]x dt); q += qd dt
    from quad_periodic_mpc_tpu.ops.rotations import quat_to_rotmat, rotmat_to_rpy
    R = np.asarray(quat_to_rotmat(st.quat))
    w = np.asarray(st.v_body)[0:3]
    v = np.asarray(st.v_body)[3:6]
    pos2 = np.asarray(st.pos) + R @ v * dt
    wx = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    R2 = R @ (np.eye(3) + wx * dt)
    rpy2 = np.asarray(rotmat_to_rpy(jnp.asarray(R2)))
    st2 = st._replace(
        quat=rpy_to_quat(jnp.asarray(rpy2)),
        pos=jnp.asarray(pos2),
        q=st.q + st.qd * dt,
    )
    info2 = fb.contact_jacobians(st2, MC)
    v_fd = (np.asarray(info2.p_foot) - np.asarray(info.p_foot)) / dt
    v_jac = np.einsum("kij,j->ki", np.asarray(info.Jc), qdot)
    np.testing.assert_allclose(v_jac, v_fd, atol=1e-4)


def test_foot_position_matches_leg_fk():
    """FB-model foot position == body pos + R (hip + leg-frame FK)."""
    st = rand_state()
    info = fb.contact_jacobians(st, MC)
    geom = lk.LegGeometry(
        l1=A1.leg.abad_link_length, l2=A1.leg.hip_link_length,
        l3=A1.leg.knee_link_length,
    )
    from quad_periodic_mpc_tpu.ops.rotations import quat_to_rotmat
    R = np.asarray(quat_to_rotmat(st.quat))
    hips = A1.hip_locations()
    sides = A1.side_signs()
    q = np.asarray(st.q).reshape(4, 3)
    for leg in range(4):
        p_leg = np.asarray(
            lk.foot_position(jnp.asarray(q[leg]), geom, jnp.asarray(sides[leg]))
        )
        expected = np.asarray(st.pos) + R @ (hips[leg] + p_leg)
        np.testing.assert_allclose(
            np.asarray(info.p_foot)[leg], expected, atol=1e-9,
            err_msg=f"leg {leg}",
        )
