#!/usr/bin/env python
"""Round-3 NS redesign experiments on TPU.

E1: stagewise h=10 walking end-to-end step time (gate-free Riccati path).
E2: cold NS convergence on walking-workload K's, Jacobi-scaled vs plain:
    rounds to reach a contractive / floor residual.
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

    def make_inputs(batch, formulation="condensed"):
        plant = S.init_plant((batch,), body_height=0.29, dtype=dtype)
        obs = S.observe(plant)
        ctrl = M.init_state(
            (batch,), obs, dtype=dtype, horizon=10, formulation=formulation
        )
        ctrl = ctrl._replace(
            iteration=(jnp.arange(batch, dtype=jnp.int32) * 7) % 208,
            x_vel_des=jnp.full((batch,), 0.3, dtype),
        )
        cmd = M.Command(
            vx=jnp.full((batch,), 0.3, dtype), vy=jnp.zeros((batch,), dtype),
            yaw_rate=jnp.zeros((batch,), dtype),
            body_height=jnp.full((batch,), 0.29, dtype),
        )
        gait = G.preset("trotting")
        dist = S.DisturbanceParams.reference((batch,), dtype=dtype)
        return ctrl, plant, cmd, gait, dist

    def make_step(solver, ret_qp=False):
        def step(ctrl, plant, cmd, gait, dist):
            obs = S.observe(plant)
            ctrl = M.setup_command(ctrl, cmd, loop_cfg)
            out = M.mpc_step(
                ctrl, obs, cmd, gait, plant.t, mpc_cfg, loop_cfg, est_cfg,
                solver, return_qp=ret_qp,
            )
            if ret_qp:
                ctrl, forces, qp = out
            else:
                ctrl, forces = out
                qp = None
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
                plant, forces[..., 0, :, :], p_feet, stance, dist, mpc_cfg,
                dt_mpc,
            )
            ctrl = ctrl._replace(
                iteration=ctrl.iteration + loop_cfg.iterations_between_mpc
            )
            return (ctrl, plant, forces, qp) if ret_qp else (ctrl, plant, forces)
        return step

    # ---- E1: stagewise h=10 walking ----
    try:
        solver = ADMMConfig(iterations=30, formulation="stagewise")
        step_jit = jax.jit(make_step(solver))
        ctrl, plant, cmd, gait, dist = make_inputs(B, "stagewise")
        t0 = time.perf_counter()
        ctrl, plant, f = step_jit(ctrl, plant, cmd, gait, dist)
        float(jnp.sum(f))
        comp = time.perf_counter() - t0
        n = 20
        t0 = time.perf_counter()
        for _ in range(n):
            ctrl, plant, f = step_jit(ctrl, plant, cmd, gait, dist)
        float(jnp.sum(f))
        dt = (time.perf_counter() - t0) / n
        print(
            f"E1 stagewise h=10 walk: {dt*1e3:.2f} ms/step "
            f"{B/dt:,.0f} solves/s  [compile {comp:.0f}s]", flush=True,
        )
    except Exception as e:
        print(f"E1 failed: {type(e).__name__}: {e}", flush=True)

    # ---- E2: cold NS convergence, Jacobi vs plain, on step-10 K's ----
    solver = ADMMConfig(iterations=30)
    step_jit = jax.jit(make_step(solver, ret_qp=True))
    ctrl, plant, cmd, gait, dist = make_inputs(512)
    qp = None
    for _ in range(10):
        ctrl, plant, f, qp = step_jit(ctrl, plant, cmd, gait, dist)
    K = qp_admm.build_kkt_uniform(qp, solver)
    n = K.shape[-1]
    eye = jnp.eye(n, dtype=K.dtype)

    def ns_residual_traj(Kx, rounds):
        norminf = jnp.max(jnp.sum(jnp.abs(Kx), axis=-1), axis=-1)
        X = jnp.broadcast_to(eye, Kx.shape) / norminf[..., None, None]
        out = []
        for _ in range(rounds):
            Mm = jnp.matmul(Kx, X)
            r = jnp.max(jnp.sum(jnp.abs(eye - Mm), axis=-1), axis=-1)
            out.append(
                (float(jnp.max(r)), float(jnp.percentile(r, 50)))
            )
            X = jnp.matmul(X, 2.0 * eye - Mm)
        return out

    d = jnp.sqrt(jnp.abs(jnp.diagonal(K, axis1=-2, axis2=-1)))
    Khat = K / (d[..., :, None] * d[..., None, :])

    for name, Kx in [("plain ", K), ("jacobi", Khat)]:
        traj = ns_residual_traj(Kx, 20)
        msg = " ".join(
            f"{i}:{mx:.2f}/{p50:.2f}" for i, (mx, p50) in enumerate(traj)
            if i % 2 == 0 or mx < 1.0
        )
        print(f"E2 cold NS {name}: r_max/p50 by round: {msg}", flush=True)

    # conditioning datum
    Kf = np.asarray(K[:8], np.float64)
    ev = np.linalg.eigvalsh(Kf)
    print(
        f"E2 cond(K) sample: min_eig {ev[:, 0].min():.3e} "
        f"max_eig {ev[:, -1].max():.3e} "
        f"cond {(ev[:, -1] / ev[:, 0]).max():.1f}", flush=True,
    )
    Kfh = np.asarray(Khat[:8], np.float64)
    evh = np.linalg.eigvalsh(Kfh)
    print(
        f"E2 cond(Khat) sample: cond {(evh[:, -1] / evh[:, 0]).max():.1f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
