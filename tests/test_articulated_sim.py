"""Articulated-dynamics plant tests + torque-level closed-loop capstone:
MPC-style force control through the LegController torque path driving the
full 18-DoF plant (the reference validates this stack only against
RaiSim; SURVEY.md section 4)."""

import numpy as np
import jax
import jax.numpy as jnp

from quad_periodic_mpc_tpu.control import balance, leg_controller as lc
from quad_periodic_mpc_tpu.models import floating_base as fb
from quad_periodic_mpc_tpu.models.a1 import A1
from quad_periodic_mpc_tpu.sim import articulated_sim as art

MC = fb.build_a1_constants("float64")
Q_STAND = (0.0, 0.8, -1.6)


def test_drop_and_arrest():
    """Released above ground: falls under gravity, contacts arrest it."""
    st = art.init((), height=0.45, dtype=jnp.float64)

    @jax.jit
    def tick(st):
        q = st.fb.q.reshape(4, 3)
        qd = st.fb.qd.reshape(4, 3)
        tau = 60.0 * (jnp.asarray(Q_STAND * 4).reshape(4, 3) - q) - 2.0 * qd
        return art.step(st, tau, MC, dt=1e-3)[0]

    z0 = float(st.fb.pos[2])
    for _ in range(300):
        st = tick(st)
    z_mid = float(st.fb.pos[2])
    assert z_mid < z0 - 0.05          # fell
    for _ in range(1700):
        st = tick(st)
    z_end = float(st.fb.pos[2])
    assert 0.15 < z_end < 0.32        # standing on its legs, not through floor
    assert abs(float(st.fb.v_body[5])) < 0.1


def test_energy_dissipation_passive():
    """Zero torque: the plant falls and contact damping dissipates energy
    (no blowup) — sanity for the integrator + penalty model."""
    st = art.init((), height=0.35, dtype=jnp.float64)

    @jax.jit
    def tick(st):
        return art.step(st, jnp.zeros((4, 3), jnp.float64), MC, dt=1e-3)[0]

    for _ in range(2000):
        st = tick(st)
    assert np.isfinite(np.asarray(st.fb.pos)).all()
    assert float(jnp.abs(st.fb.v_body).max()) < 5.0


def test_torque_level_force_stand():
    """Capstone: balance-QP forces through the FULL LegController stance
    command path (forceFeedForward + cartesian PD + joint damping,
    ConvexMPCLocomotion.cpp:428-437) -> articulated plant holds the stand.
    """
    st = art.init_on_ground((), penetration=3.8e-3, dtype=jnp.float64)
    z0 = float(st.fb.pos[2])
    p = fb.A1ModelParams()
    m_tot = p.body_mass + 4 * (
        p.abad_mass + p.hip_mass + p.knee_mass + 3 * p.rotor_mass
    )
    cfg = balance.BalanceSettings(mass=m_tot, max_force=260.0)
    target = jnp.asarray([0.0, 0.0, z0])
    info0 = fb.contact_jacobians(st.fb, MC)
    p_foot_w0 = info0.p_foot           # world stance footholds to hold
    hips = jnp.asarray(A1.hip_locations())

    from quad_periodic_mpc_tpu.ops.rotations import quat_to_rotmat, quat_to_rpy

    @jax.jit
    def tick(st):
        s = st.fb
        R = quat_to_rotmat(s.quat)
        info = fb.contact_jacobians(s, MC)
        v_world = jnp.einsum("ij,j->i", R, s.v_body[3:6])
        omega_world = jnp.einsum("ij,j->i", R, s.v_body[0:3])
        cmd_bal = balance.BalanceCommand(
            p_des=target, v_des=jnp.zeros(3), a_des=jnp.zeros(3),
            R_des=jnp.eye(3), omega_des=jnp.zeros(3),
        )
        f = balance.solve(
            s.pos, v_world, R, omega_world, quat_to_rpy(s.quat)[2],
            info.p_foot - s.pos[None, :], jnp.ones(4), cmd_bal, cfg,
        )
        # the stance LegController command (use_wbc == false path):
        # f_ff = -rBody f (ConvexMPCLocomotion.cpp:840) + cartesian PD
        data = lc.update_data(s.q.reshape(4, 3), s.qd.reshape(4, 3), A1)
        f_body = jnp.einsum("ji,kj->ki", R, f)
        # stance pDes tracks the WORLD foothold (the reference recomputes
        # pDesLeg = rBody (pDesFootWorld - p) - hip every tick,
        # ConvexMPCLocomotion.cpp:420)
        p_des_leg = jnp.einsum(
            "ji,kj->ki", R, p_foot_w0 - s.pos[None, :]
        ) - hips
        v_des_leg = jnp.einsum("ji,j->i", R, -v_world)[None, :].repeat(4, 0)
        leg_cmd = lc.LegCommand.zeros((), jnp.float64)._replace(
            force_ff=-f_body,
            p_des=p_des_leg,
            v_des=v_des_leg,
            q_des=data.q, qd_des=jnp.zeros((4, 3), jnp.float64),
            kp_cartesian=jnp.full((4, 3), 300.0, jnp.float64),
            kd_cartesian=jnp.full((4, 3), 8.0, jnp.float64),
            kd_joint=jnp.full((4, 3), 1.0, jnp.float64),
        )
        tau = lc.torque_output(cmd=leg_cmd, data=data, model=A1,
                               flip_signs=False)
        def sub(stt, _):
            return art.step(stt, tau, MC, dt=1e-4)[0], None

        st2, _ = jax.lax.scan(sub, st, None, length=10)
        return st2

    for _ in range(1500):
        st = tick(st)
    z = float(st.fb.pos[2])
    assert abs(z - z0) < 0.03, z
    # attitude stays level
    assert abs(float(st.fb.quat[0])) > 0.99
    assert float(jnp.abs(st.fb.v_body).max()) < 0.6


def test_batched_plant():
    st = art.init((3,), height=0.3, dtype=jnp.float64)
    tau = jnp.zeros((3, 4, 3), jnp.float64)
    st2, fc = art.step(st, tau, MC, dt=1e-3)
    assert st2.fb.pos.shape == (3, 3) and fc.shape == (3, 4, 3)
    # instances identical -> identical evolution
    np.testing.assert_allclose(
        np.asarray(st2.fb.pos[0]), np.asarray(st2.fb.pos[2]), atol=1e-12
    )


def test_model_cache_matches_uncached_over_tick():
    """Reusing (A^-1, G, C) across one control tick's substeps (the
    art.model_cache contract) must track the exact per-substep model to
    well below the integrator's own error."""
    import numpy as np
    import jax.numpy as jnp
    from quad_periodic_mpc_tpu.sim import articulated_sim as art

    mc = art.mc_cache("float32")
    plant_a = art.init_on_ground((2,), penetration=3e-3)
    plant_b = plant_a
    tau = jnp.zeros((2, 12), jnp.float32)
    tau = tau.at[:, 1::3].set(8.0).at[:, 2::3].set(-14.0)
    dt = 2e-4
    for tick in range(5):                  # 5 control ticks x 10 substeps
        cache = art.model_cache(plant_b, mc)
        for _ in range(10):
            plant_a, _ = art.step(plant_a, tau, mc, dt=dt)
            plant_b, _ = art.step(plant_b, tau, mc, dt=dt, cache=cache)
    da = np.asarray(plant_a.fb.pos) - np.asarray(plant_b.fb.pos)
    dq = np.asarray(plant_a.fb.q) - np.asarray(plant_b.fb.q)
    assert np.abs(da).max() < 1e-4, np.abs(da).max()
    # open-loop constant torque accelerates the joints continuously, so
    # A(q) staleness integrates — 2e-3 rad over 50 substeps; closed-loop
    # (PD-corrected) usage sits far below this
    assert np.abs(dq).max() < 5e-3, np.abs(dq).max()


def test_step_fast_matches_exact():
    """step_fast (tick-frozen Jc + integrated foot positions, round 5)
    must track the exact per-substep FK plant to below the integrator's
    own error over control ticks."""
    mc = art.mc_cache("float32")
    plant_a = art.init_on_ground((2,), penetration=3e-3)
    plant_b = plant_a
    tau = jnp.zeros((2, 12), jnp.float32)
    tau = tau.at[:, 1::3].set(8.0).at[:, 2::3].set(-14.0)
    dt = 2e-4
    params = art.ContactParams()
    for tick in range(5):
        cache = art.model_cache(plant_b, mc)
        info = fb.contact_jacobians(plant_b.fb, mc)
        pf = info.p_foot
        for _ in range(10):
            plant_a, _ = art.step(plant_a, tau, mc, dt=dt)
            plant_b, pf, _ = art.step_fast(
                plant_b, tau, dt, params, cache, info.Jc, pf
            )
    da = np.asarray(plant_a.fb.pos) - np.asarray(plant_b.fb.pos)
    dq = np.asarray(plant_a.fb.q) - np.asarray(plant_b.fb.q)
    dv = np.asarray(plant_a.fb.v_body) - np.asarray(plant_b.fb.v_body)
    assert np.abs(da).max() < 2e-4, np.abs(da).max()
    assert np.abs(dq).max() < 6e-3, np.abs(dq).max()
    assert np.abs(dv).max() < 0.05, np.abs(dv).max()
