"""Live-tunable parameter tier (the dynamic_reconfigure analog).

The reference retunes Q weights, alpha, gains, and swing height at
runtime through its reconfigure server (config/ros_dynamic_params.cfg,
delivered at be2r_cmpc_unitree.cpp:733-739).  Here TunableParams is a
traced pytree argument: retuning between two calls of ONE jitted program
must not recompile (cache size stays 1) while changing the solution.
"""

import jax
import jax.numpy as jnp
import numpy as np

from quad_periodic_mpc_tpu.config import (
    ADMMConfig, EstimatorConfig, LoopConfig, MPCConfig, SwingConfig,
    TunableParams,
)
from quad_periodic_mpc_tpu.control import mpc as M
from quad_periodic_mpc_tpu.models.a1 import A1
from quad_periodic_mpc_tpu.ops import gait as G
from quad_periodic_mpc_tpu.sim import srb_sim as S

MPC = MPCConfig(horizon=5)
LOOP = LoopConfig()
EST = EstimatorConfig()
SOLVER = ADMMConfig(iterations=60)


def _inputs(batch=(), dtype=jnp.float32):
    plant = S.init_plant(batch, body_height=0.29, dtype=dtype)
    obs = S.observe(plant)
    ctrl = M.init_state(batch, obs, dtype=dtype, horizon=MPC.horizon)
    cmd = M.Command(
        vx=jnp.full(batch, 0.3, dtype), vy=jnp.zeros(batch, dtype),
        yaw_rate=jnp.zeros(batch, dtype),
        body_height=jnp.full(batch, 0.29, dtype),
    )
    return ctrl, obs, cmd, G.preset("trotting"), plant.t


def test_retune_mpc_weights_without_recompile():
    ctrl, obs, cmd, gait, t = _inputs()

    @jax.jit
    def solve(tunable, ctrl):
        _, forces = M.mpc_step(
            ctrl, obs, cmd, gait, t, MPC, LOOP, EST, SOLVER,
            tunable=tunable,
        )
        return forces

    base = TunableParams.from_config(MPC, LOOP, EST, SwingConfig())
    f0 = solve(base, ctrl)
    retuned = base._replace(
        weights=base.weights.at[5].set(500.0),      # z-height weight x10
        alpha=jnp.asarray(4e-4, jnp.float32),
        f_max=jnp.asarray(60.0, jnp.float32),
    )
    f1 = solve(retuned, ctrl)
    assert solve._cache_size() == 1, "retune must not recompile"
    assert not np.allclose(np.asarray(f0), np.asarray(f1), atol=1e-6)
    # tightened f_max must bind: no stance z-force above the new cap
    fz = np.asarray(f1)[..., 2]
    assert fz.max() <= 60.0 + 1e-3


def test_default_tunable_matches_static_config():
    """TunableParams.from_config must reproduce the static-config path."""
    ctrl, obs, cmd, gait, t = _inputs()
    _, f_static = M.mpc_step(
        ctrl, obs, cmd, gait, t, MPC, LOOP, EST, SOLVER
    )
    _, f_tun = M.mpc_step(
        ctrl, obs, cmd, gait, t, MPC, LOOP, EST, SOLVER,
        tunable=TunableParams.from_config(MPC, LOOP, EST, SwingConfig()),
    )
    np.testing.assert_allclose(
        np.asarray(f_static), np.asarray(f_tun), atol=1e-5
    )


def test_retune_swing_height_without_recompile():
    ctrl, obs, cmd, gait, t = _inputs()
    model = A1
    swing_cfg = SwingConfig()
    # advance into the gait so a leg swings
    ctrl = ctrl._replace(iteration=jnp.asarray(65, jnp.int32))

    @jax.jit
    def tick(tunable, ctrl):
        _, out = M.swing_update(
            ctrl, obs, cmd, gait, model, swing_cfg, MPC, LOOP,
            LOOP.swing_height, tunable=tunable,
        )
        return out.p_foot_des, out.swing_state

    base = TunableParams.from_config(MPC, LOOP, EST, swing_cfg)
    p0, sw = tick(base, ctrl)
    assert float(jnp.max(sw)) > 0, "scene must have a swinging leg"
    p1, _ = tick(base._replace(swing_height=jnp.asarray(0.18, jnp.float32)), ctrl)
    assert tick._cache_size() == 1
    dz = np.asarray(p1 - p0)[..., 2]
    assert dz.max() > 0.01  # higher apex for the swinging leg


def test_per_instance_weight_sweep_axis():
    """Batched tunables: each instance solves under its own weights —
    the weight-sweep axis for tuning studies."""
    B = 4
    ctrl, obs, cmd, gait, t = _inputs(batch=(B,))
    base = TunableParams.from_config(MPC, LOOP, EST, SwingConfig())
    w = jnp.broadcast_to(base.weights, (B, 12))
    w = w.at[:, 5].set(jnp.asarray([5.0, 50.0, 500.0, 5000.0]))
    tun = base._replace(
        weights=w,
        alpha=jnp.full((B,), 4e-5),
        f_max=jnp.full((B,), 120.0),
    )
    _, forces = M.mpc_step(
        ctrl, obs, cmd, gait, t, MPC, LOOP, EST, SOLVER, tunable=tun
    )
    f = np.asarray(forces)
    assert f.shape[0] == B
    assert not np.allclose(f[0], f[3], atol=1e-6)
