"""Control-plan playback tests (DataReader/BackFlipCtrl rebuild)."""

import pytest
import numpy as np
import jax.numpy as jnp

from quad_periodic_mpc_tpu.control import playback

pytestmark = pytest.mark.smoke  # fast cross-layer sanity tier


def test_plan_roundtrip(tmp_path):
    plan = playback.synthesize_jump_plan(200)
    path = tmp_path / "test_plan.dat"
    playback.save_plan(str(path), plan)
    loaded = np.asarray(playback.load_plan(str(path)))
    np.testing.assert_allclose(loaded, plan, atol=1e-7)


def test_playback_phases():
    plan = jnp.asarray(playback.synthesize_jump_plan(800))
    # execution phase: plan row mapped, torques scaled by 1.2 and halved
    out = playback.playback_command(plan, 350)
    row = np.asarray(plan[350])
    np.testing.assert_allclose(
        np.asarray(out.q_des)[0], [0.0, row[3], row[4]], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out.tau_ff)[0, 1], 1.2 * row[14] / 2.0, atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(out.kp_joint), 10.0)

    # preparation: zero torque, hold plan pose
    prep = playback.playback_command(plan, 350, preparation=True)
    np.testing.assert_allclose(np.asarray(prep.tau_ff), 0.0, atol=1e-9)

    # landing ramp: blends to landing pose, stiffer gains, abduction splay
    out_end = playback.playback_command(plan, 650)
    np.testing.assert_allclose(
        np.asarray(out_end.q_des)[0], [-0.2, -0.8425, 1.70], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_end.q_des)[3], [0.2, -1.0525, 1.65], atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(out_end.kp_joint), 25.0)
    np.testing.assert_allclose(np.asarray(out_end.tau_ff), 0.0, atol=1e-9)


def test_playback_batched():
    plan = jnp.asarray(playback.synthesize_jump_plan(800))
    its = jnp.asarray([0, 350, 650, 900])
    out = playback.playback_command(plan, its)
    assert out.q_des.shape == (4, 4, 3)
    # iteration clamped at plan end (BackFlipCtrl.cpp:60-63)
    np.testing.assert_allclose(
        np.asarray(out.q_des[3]),
        np.asarray(playback.playback_command(plan, 799).q_des), atol=1e-6,
    )
