#!/usr/bin/env python
"""Measure the warm NS seed residual ||I - X0 K||_inf across a walking
trot (vx=0.3, glide foot model): per-step max / p99 / fraction above the
0.9 contractivity gate — the datum behind the round-3 warm-path design.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from quad_periodic_mpc_tpu.config import (
        ADMMConfig, EstimatorConfig, LoopConfig, MPCConfig,
    )
    from quad_periodic_mpc_tpu.control import mpc as M
    from quad_periodic_mpc_tpu.models.a1 import A1
    from quad_periodic_mpc_tpu.ops import gait as G
    from quad_periodic_mpc_tpu.ops import qp_admm
    from quad_periodic_mpc_tpu.ops.rotations import quat_to_rotmat
    from quad_periodic_mpc_tpu.sim import srb_sim as S

    dtype = jnp.float32
    B = int(os.environ.get("B", "2048"))
    mpc_cfg = MPCConfig(horizon=10)
    loop_cfg = LoopConfig()
    est_cfg = EstimatorConfig()
    solver = ADMMConfig(iterations=30)
    dt_mpc = loop_cfg.dt * loop_cfg.iterations_between_mpc
    hips = jnp.asarray(A1.hip_locations(), dtype)
    t_stance = 10 * dt_mpc

    plant = S.init_plant((B,), body_height=0.29, dtype=dtype)
    obs = S.observe(plant)
    ctrl = M.init_state((B,), obs, dtype=dtype, horizon=10)
    ctrl = ctrl._replace(
        iteration=(jnp.arange(B, dtype=jnp.int32) * 7) % 208,
        x_vel_des=jnp.full((B,), 0.3, dtype),
    )
    cmd = M.Command(
        vx=jnp.full((B,), 0.3, dtype), vy=jnp.zeros((B,), dtype),
        yaw_rate=jnp.zeros((B,), dtype),
        body_height=jnp.full((B,), 0.29, dtype),
    )
    gait = G.preset("trotting")
    dist = S.DisturbanceParams.reference((B,), dtype=dtype)

    def step(ctrl, plant):
        obs = S.observe(plant)
        kinv_prev = ctrl.warm_kinv
        ctrl2 = M.setup_command(ctrl, cmd, loop_cfg)
        ctrl2, forces, qp = M.mpc_step(
            ctrl2, obs, cmd, gait, plant.t, mpc_cfg, loop_cfg, est_cfg,
            solver, return_qp=True,
        )
        # the seed residual the NS gate saw THIS step: prev kinv vs the
        # K this step built (uniform eq_mode)
        K = qp_admm.build_kkt_uniform(qp, solver)
        eye = jnp.eye(K.shape[-1], dtype=K.dtype)
        r = jnp.max(jnp.sum(jnp.abs(eye - kinv_prev @ K), axis=-1), axis=-1)
        seg = G.segment_index(
            gait, ctrl2.iteration, loop_cfg.iterations_between_mpc
        )
        stance = G.mpc_table(gait, seg, 1)[..., 0, :].astype(dtype)
        R = quat_to_rotmat(obs.quat)
        hip_w = obs.p[..., None, :] + jnp.einsum(
            "...ij,...kj->...ki", R, jnp.broadcast_to(hips, obs.p_feet.shape)
        )
        p_touch = hip_w + 0.5 * t_stance * obs.v[..., None, :]
        p_touch = p_touch.at[..., 2].set(0.0)
        d = jnp.clip(p_touch - plant.p_feet, -0.04, 0.04)
        p_feet = jnp.where(
            stance[..., None] > 0.5, plant.p_feet, plant.p_feet + d
        )
        plant = S.step(
            plant, forces[..., 0, :, :], p_feet, stance, dist, mpc_cfg,
            dt_mpc,
        )
        ctrl2 = ctrl2._replace(
            iteration=ctrl2.iteration + loop_cfg.iterations_between_mpc
        )
        return ctrl2, plant, r

    step_jit = jax.jit(step)
    for i in range(25):
        ctrl, plant, r = step_jit(ctrl, plant)
        rn = np.asarray(r)
        print(
            f"step {i:2d}: r_max {rn.max():.3f} p99 "
            f"{np.percentile(rn, 99):.3f} p50 {np.percentile(rn, 50):.3f} "
            f"frac>=0.9 {(rn >= 0.9).mean():.4f} "
            f"frac>=1.0 {(rn >= 1.0).mean():.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
