#!/usr/bin/env python
"""Round-3 full warm-step throughput probe on TPU (walking trot, uniform
eq_mode): xla vs pallas-f32 vs pallas-bf16 backends at batch 2048."""

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
    from quad_periodic_mpc_tpu.ops import qp_admm
    from quad_periodic_mpc_tpu.ops.rotations import quat_to_rotmat
    from quad_periodic_mpc_tpu.sim import srb_sim as S

    dtype = jnp.float32
    B = int(os.environ.get("B", "2048"))
    mpc_cfg = MPCConfig(horizon=10)
    loop_cfg = LoopConfig()
    est_cfg = EstimatorConfig()
    dt_mpc = loop_cfg.dt * loop_cfg.iterations_between_mpc
    hips = jnp.asarray(A1.hip_locations(), dtype)
    t_stance = 10 * dt_mpc

    def make_inputs():
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
        return ctrl, plant, cmd, gait, dist

    def make_step(solver, audit: bool):
        def step(ctrl, plant, cmd, gait, dist):
            obs = S.observe(plant)
            ctrl = M.setup_command(ctrl, cmd, loop_cfg)
            ctrl, forces, qp = M.mpc_step(
                ctrl, obs, cmd, gait, plant.t, mpc_cfg, loop_cfg, est_cfg,
                solver, return_qp=True,
            )
            res = (
                qp_admm.kkt_residuals(
                    qp, ctrl.warm_x, ctrl.warm_z, ctrl.warm_y
                )
                if audit else {"primal": forces[..., 0, 0, 0] * 0,
                               "dual": forces[..., 0, 0, 0] * 0}
            )
            seg = G.segment_index(
                gait, ctrl.iteration, loop_cfg.iterations_between_mpc
            )
            stance = G.mpc_table(gait, seg, 1)[..., 0, :].astype(dtype)
            R = quat_to_rotmat(obs.quat)
            hip_w = obs.p[..., None, :] + jnp.einsum(
                "...ij,...kj->...ki", R,
                jnp.broadcast_to(hips, obs.p_feet.shape),
            )
            p_touch = hip_w + 0.5 * t_stance * obs.v[..., None, :]
            p_touch = p_touch.at[..., 2].set(0.0)
            # rate-limited glide (see bench.py): a teleport at stance
            # entry forces the warm NS gate cold for the whole batch
            d = jnp.clip(p_touch - plant.p_feet, -0.04, 0.04)
            p_feet = jnp.where(
                stance[..., None] > 0.5, plant.p_feet, plant.p_feet + d
            )
            plant = S.step(
                plant, forces[..., 0, :, :], p_feet, stance, dist,
                mpc_cfg, dt_mpc,
            )
            ctrl = ctrl._replace(
                iteration=ctrl.iteration + loop_cfg.iterations_between_mpc
            )
            return ctrl, plant, forces, res
        return step

    variants = [
        ("xla-30 uniform", ADMMConfig(iterations=30)),
        ("pallas-f32-30 uniform", ADMMConfig(
            iterations=30, backend="pallas", pallas_bf16_kinv=False)),
        ("pallas-bf16-30 uniform", ADMMConfig(
            iterations=30, backend="pallas", pallas_bf16_kinv=True)),
        ("xla-30 unif polish1", ADMMConfig(iterations=30, ns_polish=1)),
        ("xla-50 uniform", ADMMConfig(iterations=50)),
    ]
    for name, solver in variants:
        try:
            step_jit = jax.jit(make_step(solver, audit=False))
            audit_jit = jax.jit(make_step(solver, audit=True))
            ctrl, plant, cmd, gait, dist = make_inputs()
            t0 = time.perf_counter()
            ctrl, plant, f, _ = step_jit(ctrl, plant, cmd, gait, dist)
            float(jnp.sum(f))
            comp = time.perf_counter() - t0
            n = 20
            t0 = time.perf_counter()
            for _ in range(n):
                ctrl, plant, f, _ = step_jit(ctrl, plant, cmd, gait, dist)
            cs = float(jnp.sum(f))
            dt = (time.perf_counter() - t0) / n
            assert np.isfinite(cs), name
            ctrl, plant, f, res = audit_jit(ctrl, plant, cmd, gait, dist)
            prim = float(jnp.max(res["primal"]))
            dual = float(jnp.max(res["dual"]))
            print(
                f"{name:24s} {dt*1e3:7.2f} ms/step  {B/dt:9,.0f} solves/s  "
                f"primal {prim:.2e} dual {dual:.2e}  [compile {comp:.0f}s]",
                flush=True,
            )
        except Exception as e:
            print(f"{name:24s} FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
