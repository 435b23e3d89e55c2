"""Full GaitScheduler parity: 15/15 GaitTypes + modifyGait override
semantics (GaitScheduler.cpp:206-575), phase trajectories checked
against a direct NumPy transcription of the C++ recurrence."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from quad_periodic_mpc_tpu.ops import gait_scheduler as gs

pytestmark = pytest.mark.smoke  # fast cross-layer sanity tier


def numpy_reference_step(state, dt):
    """Direct NumPy transcription of GaitScheduler::step
    (GaitScheduler.cpp:95-205) on a dict state — the numeric oracle."""
    out = {}
    if state["current"] != gs.STAND:
        state["initial_phase"] = np.fmod(
            state["initial_phase"] + dt / state["period"], 1.0
        )
    contact = np.zeros(4)
    for foot in range(4):
        state["contact_prev"][foot] = state["contact_sched"][foot]
        if state["enabled"][foot] == 1:
            if state["current"] == gs.STAND:
                dphase = 0.0
            else:
                dphase = state["scale"][foot] * (dt / state["period"])
            state["phase"][foot] = np.fmod(state["phase"][foot] + dphase, 1.0)
            if state["phase"][foot] <= state["switching"]:
                state["contact_sched"][foot] = 1
            else:
                state["contact_sched"][foot] = 0
        else:
            state["phase"][foot] = 0.0
            state["contact_sched"][foot] = 0
        contact[foot] = state["contact_sched"][foot]
    return contact


def test_15_types_enumerated():
    assert len(gs.GAIT_IDS) == 15
    # enum order matches GaitScheduler.h:16-33
    assert gs.GAIT_IDS["stand"] == 0
    assert gs.GAIT_IDS["three_foot"] == 12
    assert gs.GAIT_IDS["custom"] == 13
    assert gs.GAIT_IDS["transition_to_stand"] == 14


def test_trot_matches_numpy_recurrence():
    dt = 0.002
    gd = gs.gait_data_init(gait="trot")
    p, sw, off, sc, en, _ip = gs.GAIT_TABLE["trot"]
    ref = {
        "current": gs.GAIT_IDS["trot"], "period": p, "switching": sw,
        "phase": np.array(off, float), "scale": np.array(sc, float),
        "enabled": np.array(en, float), "initial_phase": 0.0,
        "contact_sched": np.zeros(4), "contact_prev": np.zeros(4),
    }
    step = jax.jit(lambda g: gs.step_full(g, dt))
    for i in range(400):
        gd, out = step(gd)
        c_ref = numpy_reference_step(ref, dt)
        np.testing.assert_allclose(
            np.asarray(gd.phase), ref["phase"], atol=1e-5,
            err_msg=f"tick {i}",
        )
        np.testing.assert_allclose(np.asarray(out.contact), c_ref)
    # reference phase tracked too
    np.testing.assert_allclose(
        float(gd.initial_phase), ref["initial_phase"], atol=1e-5
    )


def test_stand_freezes_phases():
    gd = gs.gait_data_init(gait="stand")
    p0 = np.asarray(gd.phase).copy()
    for _ in range(50):
        gd, out = gs.step_full(gd, 0.002)
    np.testing.assert_allclose(np.asarray(gd.phase), p0)
    assert float(gd.initial_phase) == 0.0
    # all feet scheduled in contact (switching phase 1.0)
    np.testing.assert_allclose(np.asarray(out.contact), 1.0)


def test_three_foot_disabled_leg():
    gd = gs.gait_data_init(gait="three_foot")
    for _ in range(100):
        gd, out = gs.step_full(gd, 0.002)
    assert float(gd.phase[0]) == 0.0          # disabled leg pinned
    assert float(out.contact[0]) == 0.0


def test_transition_to_stand_preserves_time_to_cycle_end():
    """TRANSITION_TO_STAND (GaitScheduler.cpp:455-476): the new 3x-long
    period and recomputed offsets/switching keep each foot's remaining
    time to the end of its cycle and the remaining swing duration
    identical at the switch instant."""
    dt = 0.002
    gd = gs.gait_data_init(gait="trot")
    for _ in range(137):   # arbitrary mid-cycle point
        gd, _ = gs.step_full(gd, dt, override_mode=0)
    p_old = float(gd.period_nominal)
    sw_old = float(gd.switching_nominal)
    phase_old = np.asarray(gd.phase).copy()

    gd2, _ = gs.step_full(
        gd, dt, override_mode=1,
        user_gait=gs.TRANSITION_TO_STAND,
    )
    p_new = float(gd2.period_nominal)
    assert abs(p_new - 3.0 * p_old) < 1e-6
    # remaining swing duration preserved: P_new (1 - sw_new) = P_old (1 - sw_old)
    sw_new = float(gd2.switching_nominal)
    np.testing.assert_allclose(
        p_new * (1 - sw_new), p_old * (1 - sw_old), atol=1e-5
    )
    # per-foot time to cycle end preserved at the re-seeded offsets
    off_new = np.asarray(gd2.phase_offset)
    np.testing.assert_allclose(
        p_new * (1 - off_new), p_old * (1 - phase_old), atol=1e-5
    )
    assert int(gd2.current_gait) == gs.TRANSITION_TO_STAND
    assert float(gd2.overrideable) == 0.0


def test_mode2_override_gated_by_overrideable():
    dt = 0.002
    # trot is overrideable: user period applies and phases re-seed
    gd = gs.gait_data_init(gait="trot")
    for _ in range(40):
        gd, _ = gs.step_full(gd, dt)
    gd2, _ = gs.step_full(
        gd, dt, override_mode=2, user_gait=gs.GAIT_IDS["trot"],
        user_period=0.8, user_switching=0.6,
    )
    assert abs(float(gd2.period_nominal) - 0.8) < 1e-6
    assert abs(float(gd2.switching_nominal) - 0.6) < 1e-6

    # stand is NOT overrideable: parameters ignored
    gs_stand = gs.gait_data_init(gait="stand")
    gd3, _ = gs.step_full(
        gs_stand, dt, override_mode=2, user_gait=gs.STAND,
        user_period=0.8, user_switching=0.6,
    )
    assert abs(float(gd3.period_nominal) - 10.0) < 1e-6
    assert abs(float(gd3.switching_nominal) - 1.0) < 1e-6


def test_mode4_restores_naturals():
    dt = 0.002
    gd = gs.gait_data_init(gait="trot")
    # tamper with the nominals (as mode 2 would)
    gd = gd._replace(period_nominal=jnp.asarray(0.9, gd.period_nominal.dtype))
    gd2, _ = gs.step_full(gd, dt, override_mode=4)
    # no gait change -> naturals restored
    assert abs(float(gd2.period_nominal) - 0.5) < 1e-6


def test_custom_keeps_running_parameters():
    dt = 0.002
    gd = gs.gait_data_init(gait="bound")
    p = float(gd.period_nominal)
    gd2, _ = gs.step_full(
        gd, dt, override_mode=1, user_gait=gs.CUSTOM
    )
    assert int(gd2.current_gait) == gs.CUSTOM
    assert abs(float(gd2.period_nominal) - p) < 1e-6
    np.testing.assert_allclose(
        np.asarray(gd2.phase_offset),
        np.asarray(gs.GAIT_TABLE["bound"][2]),
    )


def test_batched_mixed_modes_lockstep():
    """A fleet of schedulers with different gaits and override modes
    steps under ONE jitted call — the dyn-param panel as traced data."""
    dt = 0.002
    gd = gs.gait_data_init(batch=(3,), gait="trot")
    modes = jnp.asarray([0, 1, 2], jnp.int32)
    gaits = jnp.asarray(
        [gs.GAIT_IDS["trot"], gs.GAIT_IDS["bound"], gs.GAIT_IDS["pace"]],
        jnp.int32,
    )
    step = jax.jit(
        lambda g: gs.step_full(
            g, dt, override_mode=modes, user_gait=gaits,
            user_period=0.7, user_switching=0.55,
        )
    )
    for _ in range(30):
        gd, out = step(gd)
    assert int(gd.current_gait[0]) == gs.GAIT_IDS["trot"]
    assert int(gd.current_gait[1]) == gs.GAIT_IDS["bound"]
    assert int(gd.current_gait[2]) == gs.GAIT_IDS["pace"]
    # instance 2 (mode 2) took the user parameters; instance 1 kept bound's
    assert abs(float(gd.period_nominal[2]) - 0.7) < 1e-6
    assert abs(float(gd.period_nominal[1]) - 0.4) < 1e-6
    assert out.contact.shape == (3, 4)


def test_pace_initial_phase_quarter_period():
    """PACE is the one createGait case that seeds initialPhase = 0.25
    (GaitScheduler.cpp:387): per-foot phases start at 0.25 + offset and
    the trajectory matches the NumPy oracle from that seed."""
    dt = 0.002
    gd = gs.gait_data_init(gait="pace")
    p, sw, off, sc, en, ip = gs.GAIT_TABLE["pace"]
    assert ip == 0.25
    np.testing.assert_allclose(
        np.asarray(gd.phase), (np.array(off) + 0.25) * np.array(en),
        atol=1e-6,
    )
    ref = {
        "current": gs.GAIT_IDS["pace"], "period": p, "switching": sw,
        "phase": (np.array(off, float) + ip) * np.array(en, float),
        "scale": np.array(sc, float),
        "enabled": np.array(en, float), "initial_phase": ip,
        "contact_sched": np.zeros(4), "contact_prev": np.zeros(4),
    }
    step = jax.jit(lambda g: gs.step_full(g, dt))
    for i in range(200):
        gd, out = step(gd)
        c_ref = numpy_reference_step(ref, dt)
        np.testing.assert_allclose(
            np.asarray(gd.phase), ref["phase"], atol=1e-5,
            err_msg=f"tick {i}",
        )
        np.testing.assert_allclose(np.asarray(out.contact), c_ref)
