"""Flagship integration: the complete reference pipeline at torque level.

convex MPC (38.5 Hz) + KinWBC/WBIC (500 Hz) + LegController joint
torques -> 18-DoF articulated plant (10 kHz substeps) — the rebuild of
the reference's full RaiSim closed loop (SURVEY.md sections 3.2-3.4).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from quad_periodic_mpc_tpu.config import MPCConfig, PDIPConfig
from quad_periodic_mpc_tpu.control import full_stack as FS
from quad_periodic_mpc_tpu.control import mpc as M
from quad_periodic_mpc_tpu.models import floating_base as fb
from quad_periodic_mpc_tpu.ops import gait as G
from quad_periodic_mpc_tpu.sim import articulated_sim as art

MC = fb.build_a1_constants("float64")
_P = fb.A1ModelParams()
M_TOT = _P.body_mass + 4 * (
    _P.abad_mass + _P.hip_mass + _P.knee_mass + 3 * _P.rotor_mass
)
# SRB parameters matched to the articulated plant the MPC controls
MPC_CFG = MPCConfig(horizon=10, mass=M_TOT, inertia_body=(0.12, 0.45, 0.42))


def run(gait_name, vx, n):
    plant = art.init_on_ground((), penetration=3.8e-3, dtype=jnp.float64)
    obs0, _, _ = FS.observe_plant(plant, MC)
    ctrl = M.init_state((), obs0, dtype=jnp.float64)
    z0 = float(plant.fb.pos[2])
    cmd = M.Command(
        vx=jnp.asarray(vx, jnp.float64), vy=jnp.asarray(0.0, jnp.float64),
        yaw_rate=jnp.asarray(0.0, jnp.float64),
        body_height=jnp.asarray(z0, jnp.float64),
    )
    carry, tr = FS.rollout_articulated(
        n, plant, ctrl, cmd, G.preset(gait_name), MC,
        mpc_cfg=MPC_CFG, solver=PDIPConfig(iterations=20),
        use_wbc=True, substeps=10,
    )
    return carry, tr, z0


@pytest.mark.slow
def test_full_stack_stand():
    carry, tr, z0 = run("standing", 0.0, 20)
    pos = np.asarray(tr["pos"])
    assert abs(pos[-1, 2] - z0) < 0.02
    assert abs(float(carry.plant.fb.quat[0])) > 0.999
    assert np.abs(pos[-1, 0:2]).max() < 0.03


@pytest.mark.slow
def test_full_stack_trot_walks():
    """MPC + WBC + joint torques make the articulated robot trot forward."""
    carry, tr, z0 = run("trotting", 0.15, 45)
    pos = np.asarray(tr["pos"])
    vb = np.asarray(tr["v_body"])
    # walks forward a meaningful distance
    assert pos[-1, 0] > 0.10, pos[-1, 0]
    # body height within 4 cm of command throughout the gait cycle
    assert np.abs(pos[10:, 2] - z0).max() < 0.04
    # attitude never tumbles
    assert abs(float(carry.plant.fb.quat[0])) > 0.99
    # forward speed in the right range during steady trot
    assert 0.05 < vb[15:, 3].mean() < 0.3


def test_fused_tick_configuration_matches_xla():
    """The production fused-tick configuration (model-eval + WBC +
    plant-substep kernels, kin_backend/wbc_backend='pallas') must track
    the XLA tick through a full MPC period."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from quad_periodic_mpc_tpu.config import ADMMConfig, MPCConfig
    from quad_periodic_mpc_tpu.control import full_stack as FS
    from quad_periodic_mpc_tpu.control import mpc as M
    from quad_periodic_mpc_tpu.models import floating_base as fb
    from quad_periodic_mpc_tpu.ops import gait as G
    from quad_periodic_mpc_tpu.sim import articulated_sim as art

    dtype = jnp.float32
    B = 2
    MC = fb.build_a1_constants("float32")
    P = fb.A1ModelParams()
    m_tot = P.body_mass + 4 * (
        P.abad_mass + P.hip_mass + P.knee_mass + 3 * P.rotor_mass
    )
    cfg = MPCConfig(horizon=10, mass=float(m_tot),
                    inertia_body=(0.12, 0.45, 0.42))
    solver = ADMMConfig(iterations=30)
    plant = art.init_on_ground((B,), penetration=3.8e-3, dtype=dtype)
    obs0, _, _ = FS.observe_plant(plant, MC)
    ctrl = M.init_state((B,), obs0, dtype=dtype)
    cmd = M.Command(
        vx=jnp.full((B,), 0.15, dtype), vy=jnp.zeros((B,), dtype),
        yaw_rate=jnp.zeros((B,), dtype), body_height=plant.fb.pos[..., 2],
    )
    gait = G.preset("trotting")

    def run(kin, wbc):
        carry, _ = FS.rollout_articulated(
            1, plant, ctrl, cmd, gait, MC, mpc_cfg=cfg, solver=solver,
            use_wbc=True, substeps=5, wbc_backend=wbc, kin_backend=kin,
        )
        return carry.plant.fb

    fb_x = jax.jit(lambda: run("xla", "xla"))()
    fb_p = jax.jit(lambda: run("pallas", "pallas"))()
    # one MPC period (13 ticks, 65 substeps) of three exact-f32 kernels
    # vs the XLA composition: trajectories stay within integrator-scale
    # tolerance
    np.testing.assert_allclose(
        np.asarray(fb_p.pos), np.asarray(fb_x.pos), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(fb_p.v_body), np.asarray(fb_x.v_body), atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(fb_p.q), np.asarray(fb_x.q), atol=5e-3
    )
