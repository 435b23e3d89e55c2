#!/usr/bin/env python
"""Decompose build_stagewise at the headline point (h=10, batch 2048):
trajectory+table vs linearize (ct_dynamics) vs discretize
(build_prediction) vs the c/bounds assembly."""

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

    from quad_periodic_mpc_tpu.config import LoopConfig, MPCConfig
    from quad_periodic_mpc_tpu.control import mpc as M
    from quad_periodic_mpc_tpu.models import srb
    from quad_periodic_mpc_tpu.ops import condense, constraints
    from quad_periodic_mpc_tpu.ops import gait as gait_ops
    from quad_periodic_mpc_tpu.ops.rotations import quat_to_rotmat, quat_to_rpy
    from quad_periodic_mpc_tpu.sim import srb_sim as S

    dtype = jnp.float32
    B = int(os.environ.get("B", "2048"))
    H = int(os.environ.get("H", "10"))
    mpc_cfg = MPCConfig(horizon=H)
    loop_cfg = LoopConfig()

    plant = S.init_plant((B,), body_height=0.29, dtype=dtype)
    obs = S.observe(plant)
    ctrl = M.init_state((B,), obs, dtype=dtype, horizon=H,
                        formulation="stagewise")
    ctrl = ctrl._replace(iteration=(jnp.arange(B, dtype=jnp.int32) * 7) % 208)
    cmd = M.Command(
        vx=jnp.full((B,), 0.3, dtype), vy=jnp.zeros((B,), dtype),
        yaw_rate=jnp.zeros((B,), dtype),
        body_height=jnp.full((B,), 0.29, dtype),
    )
    gait = gait_ops.preset("trotting")

    def fence(fn, name, *inputs):
        jfn = jax.jit(fn)
        out = jfn(*inputs)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        t0 = time.perf_counter()
        for _ in range(20):
            out = jfn(*inputs)
        cs = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        dt = (time.perf_counter() - t0) / 20 * 1e3
        assert np.isfinite(cs)
        print(f"{name:44s} {dt:7.3f} ms", flush=True)
        return out

    def traj_table(ctrl, obs, cmd, gait):
        R = quat_to_rotmat(obs.quat)
        rpy = quat_to_rpy(obs.quat)
        vdr = jnp.stack(
            [ctrl.x_vel_des, ctrl.y_vel_des, jnp.zeros_like(ctrl.x_vel_des)],
            axis=-1,
        )
        vdw = jnp.einsum("...ij,...j->...i", R, vdr)
        x_ref, _ = M.build_reference_trajectory(
            ctrl, obs, cmd, vdw, rpy, mpc_cfg, loop_cfg
        )
        seg = gait_ops.segment_index(
            gait, ctrl.iteration, loop_cfg.iterations_between_mpc
        )
        table = gait_ops.mpc_table(gait, seg, H)
        return x_ref, table

    (x_ref, table) = fence(traj_table, "traj + table", ctrl, obs, cmd, gait)

    r_feet = obs.p_feet - obs.p[..., None, :]

    def linearize(obs, r_feet):
        R = quat_to_rotmat(obs.quat)
        I_body = jnp.asarray(mpc_cfg.inertia_body, dtype)
        return srb.ct_dynamics(R, r_feet, mpc_cfg.mass, I_body, 0.0)

    (A_ct, B_ct, Q_ct) = fence(linearize, "linearize (ct_dynamics)", obs, r_feet)

    def discretize(A_ct, B_ct, Q_ct):
        return condense.build_prediction(A_ct, B_ct, Q_ct, mpc_cfg.dt_mpc)

    pred = fence(discretize, "discretize (build_prediction)", A_ct, B_ct, Q_ct)

    def bounds_c(pred, table):
        f_est = jnp.zeros((B, 6), dtype)
        c = jnp.einsum("...nw,...w->...n", pred.Qdt, f_est)
        l, u = constraints.bounds(table, mpc_cfg.f_max, mpc_cfg.big_number)
        return c, l, u

    fence(bounds_c, "c + bounds", pred, table)

    def x0_pack(obs):
        rpy = quat_to_rpy(obs.quat)
        return srb.pack_state(rpy, obs.p, obs.omega, obs.v, mpc_cfg.gravity)

    fence(x0_pack, "x0 pack", obs)


if __name__ == "__main__":
    main()
