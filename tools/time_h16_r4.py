#!/usr/bin/env python
"""Round-4 h=16 probe (walking methodology, batch 1024).

Two questions from VERDICT r3:
1. Reconcile the 23.1k-doc vs 15.9k-driver gap on the condensed h=16
   line: time with PROPER warmup (6 steps — the bucket lax.cond runs the
   full-batch cold branch for the first few steps until warm seeds
   distribute) and report 3 consecutive timing loops to expose run-to-run
   variance.
2. Is the lane-major stagewise path the faster h=16 formulation
   end-to-end (its solver-only 42.2 ms already beat condensed's 64.7 in
   round 2, and the packed rewrite made h=32 end-to-end 26.8 ms @ 512)?
   Audit it with the new qp_stagewise.kkt_residuals.
"""

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
    from quad_periodic_mpc_tpu.ops import qp_admm, qp_stagewise
    from quad_periodic_mpc_tpu.ops.rotations import quat_to_rotmat
    from quad_periodic_mpc_tpu.sim import srb_sim as S

    dtype = jnp.float32
    B = int(os.environ.get("B", "1024"))
    H = int(os.environ.get("H", "16"))
    loop_cfg = LoopConfig()
    est_cfg = EstimatorConfig()
    dt_mpc = loop_cfg.dt * loop_cfg.iterations_between_mpc
    hips = jnp.asarray(A1.hip_locations(), dtype)
    t_stance = 10 * dt_mpc

    def make_inputs(formulation):
        plant = S.init_plant((B,), body_height=0.29, dtype=dtype)
        obs = S.observe(plant)
        ctrl = M.init_state(
            (B,), obs, dtype=dtype, horizon=H, formulation=formulation
        )
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

    mpc_cfg = MPCConfig(horizon=H)

    def make_step(solver, audit: bool):
        def step(ctrl, plant, cmd, gait, dist):
            obs = S.observe(plant)
            ctrl = M.setup_command(ctrl, cmd, loop_cfg)
            if audit:
                ctrl, forces, qp = M.mpc_step(
                    ctrl, obs, cmd, gait, plant.t, mpc_cfg, loop_cfg,
                    est_cfg, solver, return_qp=True,
                )
                lead = obs.p.shape[:-1]
                if solver.formulation == "stagewise":
                    res = qp_stagewise.kkt_residuals(
                        qp,
                        ctrl.warm_x.reshape(lead + (H, 12)),
                        ctrl.warm_z.reshape(lead + (H, 20)),
                        ctrl.warm_y.reshape(lead + (H, 20)),
                    )
                else:
                    res = qp_admm.kkt_residuals(
                        qp, ctrl.warm_x, ctrl.warm_z, ctrl.warm_y
                    )
            else:
                ctrl, forces = M.mpc_step(
                    ctrl, obs, cmd, gait, plant.t, mpc_cfg, loop_cfg,
                    est_cfg, solver,
                )
                res = None
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

    # VARIANTS env: comma list of "sw:<iters>" (stagewise) or
    # "cond:<iters>" (condensed bench recipe); default = the round-4
    # comparison set
    spec = os.environ.get("VARIANTS", "cond:40,sw:30,sw:40")
    variants = []
    for tok in spec.split(","):
        kind, it = tok.split(":")
        it = int(it)
        if kind == "cond":
            variants.append((
                f"cond ADMM-{it} bench-recipe",
                ADMMConfig(iterations=it, ns_cold_iters=14,
                           ns_bucket_precision="default", ns_polish=1),
                "condensed",
            ))
        elif kind == "swp":
            variants.append((
                f"stagewise-pallas ADMM-{it}",
                ADMMConfig(iterations=it, formulation="stagewise",
                           backend="pallas"),
                "stagewise",
            ))
        else:
            variants.append((
                f"stagewise ADMM-{it}",
                ADMMConfig(iterations=it, formulation="stagewise"),
                "stagewise",
            ))
    for name, solver, form in variants:
        try:
            step_jit = jax.jit(make_step(solver, audit=False))
            ctrl, plant, cmd, gait, dist = make_inputs(form)
            t0 = time.perf_counter()
            # warmup: 6 steps so warm seeds distribute and the bucket
            # cond settles into the production branch
            for _ in range(6):
                ctrl, plant, f, _ = step_jit(ctrl, plant, cmd, gait, dist)
            float(jnp.sum(f))
            comp = time.perf_counter() - t0
            loops = []
            for _ in range(3):
                n = 10
                t0 = time.perf_counter()
                for _ in range(n):
                    ctrl, plant, f, _ = step_jit(ctrl, plant, cmd, gait, dist)
                cs = float(jnp.sum(f))
                loops.append((time.perf_counter() - t0) / n)
                assert np.isfinite(cs), name
            ms = [f"{t * 1e3:.1f}" for t in loops]
            med = float(np.median(loops))
            print(
                f"{name:28s} loops {ms} ms/step  median {med * 1e3:.1f} "
                f"-> {B / med:9,.0f} solves/s  [warmup+compile {comp:.0f}s]",
                flush=True,
            )
        except Exception as e:
            print(f"{name:28s} FAILED {type(e).__name__}: {e}", flush=True)

    # ---- warm KKT audits after 6 steps (each variant's own gate) ----
    for name, solver, form in variants:
        try:
            audit_jit = jax.jit(make_step(solver, audit=True))
            ctrl, plant, cmd, gait, dist = make_inputs(form)
            res = None
            for _ in range(6):
                ctrl, plant, f, res = audit_jit(ctrl, plant, cmd, gait, dist)
            kp = float(jnp.max(res["primal"]))
            kd = float(jnp.max(res["dual"]))
            print(f"{name:28s} warm-6 KKT primal {kp:.2e} dual {kd:.2e}",
                  flush=True)
        except Exception as e:
            print(f"{name:28s} audit FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
