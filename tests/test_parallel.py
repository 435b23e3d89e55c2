"""Sharding tests on the virtual 8-device CPU mesh (conftest forces
--xla_force_host_platform_device_count=8) — the rebuild's analog of the
reference's param-fixture fakes (SURVEY.md section 4)."""

import numpy as np
import jax
import jax.numpy as jnp

from quad_periodic_mpc_tpu.config import (
    ADMMConfig, EstimatorConfig, LoopConfig, MPCConfig,
)
from quad_periodic_mpc_tpu.control import mpc as M
from quad_periodic_mpc_tpu.ops import gait as G
from quad_periodic_mpc_tpu.parallel import mesh as mesh_lib
from quad_periodic_mpc_tpu.sim import srb_sim as S


def test_eight_cpu_devices_present():
    assert len(jax.devices()) == 8


def _batched_inputs(batch):
    dtype = jnp.float32
    plant = S.init_plant((batch,), body_height=0.29, dtype=dtype)
    obs = S.observe(plant)
    ctrl = M.init_state((batch,), obs, dtype=dtype, horizon=5)
    cmd = M.Command(
        vx=jnp.full((batch,), 0.3, dtype),
        vy=jnp.zeros((batch,), dtype),
        yaw_rate=jnp.zeros((batch,), dtype),
        body_height=jnp.full((batch,), 0.29, dtype),
    )
    gait = G.preset("trotting")
    return ctrl, obs, cmd, gait, plant.t


def test_sharded_mpc_step_matches_unsharded():
    mpc_cfg = MPCConfig(horizon=5)
    loop_cfg = LoopConfig()
    est_cfg = EstimatorConfig()
    solver = ADMMConfig(iterations=50)
    batch = 16

    ctrl, obs, cmd, gait, t = _batched_inputs(batch)

    def step(ctrl, obs, cmd, gait, t):
        ctrl2, forces = M.mpc_step(
            ctrl, obs, cmd, gait, t, mpc_cfg, loop_cfg, est_cfg, solver
        )
        return forces, jnp.mean(jnp.abs(forces))

    ref_forces, ref_metric = jax.jit(step)(ctrl, obs, cmd, gait, t)

    mesh = mesh_lib.make_mesh(8)
    ctrl_s, obs_s, cmd_s, t_s = mesh_lib.shard_batch((ctrl, obs, cmd, t), mesh)
    out_forces, out_metric = jax.jit(step)(ctrl_s, obs_s, cmd_s, gait, t_s)

    np.testing.assert_allclose(
        np.asarray(out_forces), np.asarray(ref_forces), atol=2e-4
    )
    assert abs(float(out_metric) - float(ref_metric)) < 1e-4


def test_graft_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    out = jax.block_until_ready(out)
    assert np.isfinite(np.asarray(out)).all()


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
