#!/usr/bin/env python
"""Per-step cost of the headline walking step when chained in lax.scan
(the production rollout shape) vs dispatched per step (bench loop) —
isolates the relay's per-dispatch overhead at the headline batch."""

from __future__ import annotations

import os
import sys
import time

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
    from quad_periodic_mpc_tpu.ops.rotations import quat_to_rotmat
    from quad_periodic_mpc_tpu.sim import srb_sim as S

    dtype = jnp.float32
    B = int(os.environ.get("B", "2048"))
    H = int(os.environ.get("H", "10"))
    K = int(os.environ.get("K", "8"))
    mpc_cfg = MPCConfig(horizon=H)
    loop_cfg = LoopConfig()
    est_cfg = EstimatorConfig()
    solver = ADMMConfig(iterations=30, formulation="stagewise",
                        backend="pallas")
    dt_mpc = loop_cfg.dt_mpc
    hips = jnp.asarray(A1.hip_locations(), dtype)
    t_stance = 10 * dt_mpc

    plant = S.init_plant((B,), body_height=0.29, dtype=dtype)
    obs = S.observe(plant)
    ctrl = M.init_state((B,), obs, dtype=dtype, horizon=H,
                        formulation="stagewise")
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
        ctrl = M.setup_command(ctrl, cmd, loop_cfg)
        ctrl, forces = M.mpc_step(
            ctrl, obs, cmd, gait, plant.t, mpc_cfg, loop_cfg, est_cfg,
            solver,
        )
        seg = G.segment_index(gait, ctrl.iteration,
                              loop_cfg.iterations_between_mpc)
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
        plant = S.step(plant, forces[..., 0, :, :], p_feet, stance, dist,
                       mpc_cfg, dt_mpc)
        ctrl = ctrl._replace(
            iteration=ctrl.iteration + loop_cfg.iterations_between_mpc
        )
        return ctrl, plant, forces

    # per-dispatch loop (bench shape)
    sj = jax.jit(step)
    c, p = ctrl, plant
    for _ in range(6):
        c, p, f = sj(c, p)
    float(jnp.sum(f))
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        c, p, f = sj(c, p)
    float(jnp.sum(f))
    per_disp = (time.perf_counter() - t0) / n
    print(f"per-dispatch loop: {per_disp * 1e3:6.2f} ms/step "
          f"({B / per_disp:,.0f} solves/s)", flush=True)

    # scan-chained (production rollout shape)
    def chain(ctrl, plant):
        def body(carry, _):
            ctrl, plant = carry
            ctrl, plant, f = step(ctrl, plant)
            return (ctrl, plant), jnp.sum(f)
        (ctrl, plant), s = jax.lax.scan(body, (ctrl, plant), None, length=K)
        return ctrl, plant, jnp.sum(s)

    cj = jax.jit(chain)
    c, p = ctrl, plant
    c, p, s = cj(c, p)
    float(s)
    t0 = time.perf_counter()
    reps = 6
    for _ in range(reps):
        c, p, s = cj(c, p)
    float(s)
    per_scan = (time.perf_counter() - t0) / (reps * K)
    print(f"scan-chained (K={K}): {per_scan * 1e3:6.2f} ms/step "
          f"({B / per_scan:,.0f} solves/s)", flush=True)


if __name__ == "__main__":
    main()
