#!/usr/bin/env python
"""Sub-stage timing of the QP build path (batch 2048, h=10).

Stages: reference trajectory, gait table, SRB linearize + discretize,
cost hessian, cost gradient, bounds.  Amortized scalar-checksum fence.
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
        EstimatorConfig, LoopConfig, MPCConfig,
    )
    from quad_periodic_mpc_tpu.control import mpc as M
    from quad_periodic_mpc_tpu.models import srb
    from quad_periodic_mpc_tpu.ops import condense, constraints
    from quad_periodic_mpc_tpu.ops import gait as gait_ops
    from quad_periodic_mpc_tpu.ops import problem
    from quad_periodic_mpc_tpu.ops.rotations import quat_to_rotmat, quat_to_rpy
    from quad_periodic_mpc_tpu.sim import srb_sim as S

    dtype = jnp.float32
    B = 2048
    h = 10
    mpc_cfg = MPCConfig(horizon=h)
    loop_cfg = LoopConfig()

    plant = S.init_plant((B,), body_height=0.29, dtype=dtype)
    obs = S.observe(plant)
    ctrl = M.init_state((B,), obs, dtype=dtype, horizon=h)
    ctrl = ctrl._replace(iteration=(jnp.arange(B, dtype=jnp.int32) * 7) % 208)
    cmd = M.Command(
        vx=jnp.full((B,), 0.3, dtype), vy=jnp.zeros((B,), dtype),
        yaw_rate=jnp.zeros((B,), dtype),
        body_height=jnp.full((B,), 0.29, dtype),
    )
    gait = gait_ops.preset("trotting")

    def bench(name, fn, *args, reps=30):
        f = jax.jit(fn)
        ck = jax.jit(lambda o: sum(jnp.sum(t) for t in jax.tree_util.tree_leaves(o)))
        t0 = time.perf_counter()
        out = f(*args)
        float(ck(out))
        t_comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(*args)
        float(ck(out))
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:44s} compile {t_comp:6.1f}s  {dt*1e3:8.2f} ms")
        return out

    R = quat_to_rotmat(obs.quat)
    rpy = quat_to_rpy(obs.quat)
    v_des_world = jnp.einsum(
        "...ij,...j->...i", R,
        jnp.stack([cmd.vx, cmd.vy, jnp.zeros_like(cmd.vx)], axis=-1),
    )

    def traj(ctrl):
        x_ref, st = M.build_reference_trajectory(
            ctrl, obs, cmd, v_des_world, rpy, mpc_cfg, loop_cfg
        )
        return x_ref

    x_ref = bench("build_reference_trajectory", traj, ctrl)

    def table(it):
        seg = gait_ops.segment_index(gait, it, loop_cfg.iterations_between_mpc)
        return gait_ops.mpc_table(gait, seg, h)

    tbl = bench("gait segment + mpc_table", table, ctrl.iteration)

    r_feet = obs.p_feet - obs.p[..., None, :]
    I_body = jnp.asarray(mpc_cfg.inertia_body, dtype)

    def lin(R, r_feet):
        return srb.ct_dynamics(R, r_feet, mpc_cfg.mass, I_body, 0.0)

    A_ct, B_ct, Q_ct = bench("srb.ct_dynamics (linearize)", lin, R, r_feet)

    def disc(A_ct, B_ct, Q_ct):
        return condense.build_prediction(A_ct, B_ct, Q_ct, mpc_cfg.dt_mpc)

    pred = bench("build_prediction (discretize+powers)", disc, A_ct, B_ct, Q_ct)

    weights = jnp.asarray(mpc_cfg.weights, dtype)

    def hess(pred):
        return condense.cost_hessian(pred, weights, mpc_cfg.alpha, h)

    bench("cost_hessian", hess, pred)

    x0 = srb.pack_state(rpy, obs.p, obs.omega, obs.v, mpc_cfg.gravity)
    f_est = jnp.zeros((B, 6), dtype)

    def grad(pred, x0, x_ref):
        return condense.cost_gradient(pred, weights, x0, x_ref, f_est, h)

    bench("cost_gradient", grad, pred, x0, x_ref)

    def bnds(tbl):
        return constraints.bounds(tbl, mpc_cfg.f_max, mpc_cfg.big_number)

    bench("constraint bounds", bnds, tbl)

    def full(ctrl, obs):
        x_ref, st = M.build_reference_trajectory(
            ctrl, obs, cmd, v_des_world, rpy, mpc_cfg, loop_cfg
        )
        seg = gait_ops.segment_index(
            gait, ctrl.iteration, loop_cfg.iterations_between_mpc
        )
        tbl = gait_ops.mpc_table(gait, seg, h)
        qp_obs = problem.RobotObs(
            p=obs.p, v=obs.v, quat=obs.quat, omega=obs.omega,
            r_feet=obs.p_feet - obs.p[..., None, :],
        )
        qp, pred, x0 = problem.build_qp(qp_obs, x_ref, tbl, mpc_cfg, f_est=f_est)
        return qp.P, qp.q

    bench("FULL build (traj+table+build_qp)", full, ctrl, obs)


if __name__ == "__main__":
    main()
