"""FSM + safety mask tests (ControlFSM.cpp / SafetyChecker.cpp)."""

import pytest
import numpy as np
import jax.numpy as jnp

from quad_periodic_mpc_tpu.control import fsm, safety
from quad_periodic_mpc_tpu.models.a1 import A1

pytestmark = pytest.mark.smoke  # fast cross-layer sanity tier


def _step(f, req, safe=True, loco_safe=True, batch=()):
    return fsm.step(
        f,
        jnp.full(batch, req, jnp.int32),
        jnp.full(batch, safe, bool),
        jnp.full(batch, loco_safe, bool),
    )


def test_passive_to_locomotion_via_standup():
    f = fsm.init()
    # passive -> locomotion directly is illegal
    f = _step(f, fsm.LOCOMOTION)
    assert int(f.state) == fsm.PASSIVE
    # passive -> standup -> locomotion works
    f = _step(f, fsm.STAND_UP)
    assert int(f.state) == fsm.STAND_UP
    f = _step(f, fsm.LOCOMOTION)
    assert int(f.state) == fsm.LOCOMOTION


def test_unsafe_orientation_edamp_then_estop():
    f = fsm.init()
    f = _step(f, fsm.STAND_UP)
    f = _step(f, fsm.LOCOMOTION)
    f = _step(f, fsm.LOCOMOTION, safe=False)
    assert int(f.mode) == fsm.EDAMP
    for _ in range(fsm.EDAMP_ITERATIONS + 1):
        f = _step(f, fsm.LOCOMOTION, safe=False)
    assert int(f.mode) == fsm.ESTOP
    assert int(f.state) == fsm.PASSIVE


def test_unsafe_locomotion_forces_recovery():
    f = fsm.init()
    f = _step(f, fsm.STAND_UP)
    f = _step(f, fsm.LOCOMOTION)
    f = _step(f, fsm.LOCOMOTION, loco_safe=False)
    assert int(f.state) == fsm.RECOVERY_STAND


def test_batched_mixed_states():
    f = fsm.init((3,))
    req = jnp.asarray([fsm.STAND_UP, fsm.PASSIVE, fsm.STAND_UP], jnp.int32)
    f = fsm.step(f, req, jnp.ones(3, bool), jnp.ones(3, bool))
    assert f.state.tolist() == [fsm.STAND_UP, fsm.PASSIVE, fsm.STAND_UP]
    req = jnp.asarray([fsm.LOCOMOTION, fsm.LOCOMOTION, fsm.BALANCE_STAND], jnp.int32)
    f = fsm.step(f, req, jnp.ones(3, bool), jnp.ones(3, bool))
    # instance 1 still passive (illegal), others transition
    assert f.state.tolist() == [fsm.LOCOMOTION, fsm.PASSIVE, fsm.BALANCE_STAND]


def test_safety_clamps():
    p_des = jnp.asarray([[[0.5, -0.5, -0.05]] * 4])
    force = jnp.asarray([[[400.0, -400.0, 100.0]] * 4])
    rpy = jnp.asarray([[0.2, -0.3, 1.5]])
    res = safety.run_checks(rpy, p_des, force, A1)
    assert bool(res.safe_orientation[0])
    assert not bool(res.safe_p_des[0])
    assert not bool(res.safe_force[0])
    max_pdes = A1.leg.max_leg_length * np.sin(1.0472)
    np.testing.assert_allclose(
        np.asarray(res.p_des[0, 0]),
        [max_pdes, -max_pdes, -A1.leg.max_leg_length / 4], atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(res.force_ff[0, 0]), [350.0, -350.0, 100.0]
    )
    # bad orientation detected
    rpy_bad = jnp.asarray([[1.2, 0.0, 0.0]])
    assert not bool(safety.check_safe_orientation(rpy_bad)[0])
