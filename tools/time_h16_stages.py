#!/usr/bin/env python
"""h=16 stage decomposition on TPU (batch 1024): where do the ~43 ms go?

Stagewise path: build_stagewise / factorize(+pack) via iterations=0 /
iteration loop via (iters=30) - (iters=0).  Condensed path: build_qp
(O(h^2) condensation at n=192) / bucket NS / ADMM-40 xla loop.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--horizon", type=int, default=16)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from quad_periodic_mpc_tpu.config import (
        ADMMConfig, LoopConfig, MPCConfig,
    )
    from quad_periodic_mpc_tpu.control import mpc as M
    from quad_periodic_mpc_tpu.ops import gait as gait_ops
    from quad_periodic_mpc_tpu.ops import problem, qp_admm, qp_stagewise
    from quad_periodic_mpc_tpu.ops import linalg as L
    from quad_periodic_mpc_tpu.ops.rotations import quat_to_rotmat, quat_to_rpy
    from quad_periodic_mpc_tpu.sim import srb_sim as S

    dtype = jnp.float32
    B = args.batch
    H = args.horizon
    mpc_cfg = MPCConfig(horizon=H)
    loop_cfg = LoopConfig()

    plant = S.init_plant((B,), body_height=0.29, dtype=dtype)
    obs = S.observe(plant)
    ctrl = M.init_state((B,), obs, dtype=dtype, horizon=H)
    ctrl = ctrl._replace(iteration=(jnp.arange(B, dtype=jnp.int32) * 7) % 208)
    cmd = M.Command(
        vx=jnp.full((B,), 0.3, dtype), vy=jnp.zeros((B,), dtype),
        yaw_rate=jnp.zeros((B,), dtype),
        body_height=jnp.full((B,), 0.29, dtype),
    )
    gait = gait_ops.preset("trotting")

    def fence(fn, name, *inputs):
        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        out = jfn(*inputs)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf))
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = jfn(*inputs)
        leaf = jax.tree_util.tree_leaves(out)[0]
        cs = float(jnp.sum(leaf))
        dt = (time.perf_counter() - t0) / args.reps * 1e3
        assert np.isfinite(cs), name
        print(f"{name:44s} {dt:7.2f} ms   [compile {comp:5.1f}s]", flush=True)
        return out, dt

    def assemble(ctrl, obs, cmd, gait, stagewise):
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
        r_feet = obs.p_feet - obs.p[..., None, :]
        qp_obs = problem.RobotObs(
            p=obs.p, v=obs.v, quat=obs.quat, omega=obs.omega, r_feet=r_feet
        )
        if stagewise:
            sw, _, _ = problem.build_stagewise(qp_obs, x_ref, table, mpc_cfg)
            return sw
        qp, _, _ = problem.build_qp(qp_obs, x_ref, table, mpc_cfg)
        return qp

    # ---- stagewise ----
    (sw, _) = fence(
        lambda c, o, cm, g: assemble(c, o, cm, g, True),
        "build_stagewise (traj+table+linearize)", ctrl, obs, cmd, gait,
    )

    _, t0i = fence(
        lambda p: qp_stagewise.solve(p, ADMMConfig(iterations=0,
                                                   formulation="stagewise")),
        "stagewise solve iters=0 (pack+factorize)", sw,
    )
    _, t30 = fence(
        lambda p: qp_stagewise.solve(p, ADMMConfig(iterations=30,
                                                   formulation="stagewise")),
        "stagewise solve iters=30", sw,
    )
    print(f"{'  -> 30 iterations':44s} {t30 - t0i:7.2f} ms "
          f"({(t30 - t0i) / 30:5.3f} ms/iter)", flush=True)

    # ---- condensed ----
    (qp, _) = fence(
        lambda c, o, cm, g: assemble(c, o, cm, g, False),
        "build_qp (condense n=192)", ctrl, obs, cmd, gait,
    )

    cfg40 = ADMMConfig(iterations=40, ns_cold_iters=14,
                       ns_bucket_precision="default", ns_polish=1)

    def kkt_cold(qp):
        K0 = qp_admm.build_kkt_uniform(qp, cfg40)
        return L.ns_inverse(K0, cfg40.ns_iters, polish=cfg40.ns_polish)

    (K_inv, _) = fence(kkt_cold, "condensed NS cold-30 +polish", qp)

    def kkt_bucket(qp, kinv):
        K0 = qp_admm.build_kkt_uniform(qp, cfg40)
        return L.ns_inverse_bucket(
            K0, kinv, warm_iters=1, cold_iters=14, polish=1,
            precision="default",
        )

    fence(kkt_bucket, "condensed NS bucket warm (recipe)", qp, K_inv)

    n = qp.q.shape[-1]
    m = qp.l.shape[-1]
    warm = qp_admm.ADMMState(
        x=jnp.zeros((B, n), dtype), z=jnp.zeros((B, m), dtype),
        y=jnp.zeros((B, m), dtype), kinv=K_inv,
    )
    _, tc0 = fence(
        lambda q, w: qp_admm.solve(q, ADMMConfig(
            iterations=0, ns_cold_iters=14,
            ns_bucket_precision="default", ns_polish=1), warm=w),
        "condensed solve iters=0 (KKT only)", qp, warm,
    )
    _, tc40 = fence(
        lambda q, w: qp_admm.solve(q, cfg40, warm=w),
        "condensed solve iters=40", qp, warm,
    )
    print(f"{'  -> 40 iterations (xla)':44s} {tc40 - tc0:7.2f} ms "
          f"({(tc40 - tc0) / 40:5.3f} ms/iter)", flush=True)


if __name__ == "__main__":
    main()
