#!/usr/bin/env python
"""Decompose the warm KKT-inverse stage (batch 2048, h=10) on TPU:
K0 build, NS seed+round, Woodbury correction, carried-K^{-1} variants."""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from quad_periodic_mpc_tpu.config import ADMMConfig, LoopConfig, MPCConfig
    from quad_periodic_mpc_tpu.control import mpc as M
    from quad_periodic_mpc_tpu.ops import gait as gait_ops
    from quad_periodic_mpc_tpu.ops import linalg, problem, qp_admm
    from quad_periodic_mpc_tpu.sim import srb_sim as S

    dtype = jnp.float32
    B = args.batch
    mpc_cfg = MPCConfig(horizon=10)
    loop_cfg = LoopConfig()
    cfg = ADMMConfig(iterations=30, eq_mode="woodbury")

    plant = S.init_plant((B,), body_height=0.29, dtype=dtype)
    obs = S.observe(plant)
    ctrl = M.init_state((B,), obs, dtype=dtype, horizon=10)
    ctrl = ctrl._replace(iteration=(jnp.arange(B, dtype=jnp.int32) * 7) % 208)
    cmd = M.Command(
        vx=jnp.full((B,), 0.3, dtype), vy=jnp.zeros((B,), dtype),
        yaw_rate=jnp.zeros((B,), dtype),
        body_height=jnp.full((B,), 0.29, dtype),
    )
    gait = gait_ops.preset("trotting")

    seg = gait_ops.segment_index(gait, ctrl.iteration,
                                 loop_cfg.iterations_between_mpc)
    table = gait_ops.mpc_table(gait, seg, mpc_cfg.horizon)
    r_feet = obs.p_feet - obs.p[..., None, :]
    qp_obs = problem.RobotObs(
        p=obs.p, v=obs.v, quat=obs.quat, omega=obs.omega, r_feet=r_feet
    )
    qp, _, _ = jax.jit(
        lambda o, x, t: problem.build_qp(o, x, t, mpc_cfg)
    )(qp_obs, jnp.zeros((B, 10, 13), dtype), table)
    rho = qp_admm.rho_vector(qp.l, qp.u, cfg)
    rho_u = jnp.full_like(rho, cfg.rho)

    def fence(fn, name, *inputs):
        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        out = jfn(*inputs)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf))
        print(f"{name:44s} compile {time.perf_counter()-t0:6.1f}s", end="")
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = jfn(*inputs)
        leaf = jax.tree_util.tree_leaves(out)[0]
        cs = float(jnp.sum(leaf))
        dt = (time.perf_counter() - t0) / args.reps * 1e3
        assert np.isfinite(cs), name
        print(f"  {dt:7.2f} ms")
        return out

    K0 = fence(lambda qp, r: qp_admm.build_kkt(qp, r, cfg), "build_kkt K0",
               qp, rho_u)
    K0_inv = fence(lambda K: linalg.ns_inverse(K, 30), "ns cold 30", K0)
    fence(
        lambda K, X0: linalg.ns_inverse(K, 30, X0=X0, warm_iters=1),
        "ns warm seed+1round", K0, K0_inv,
    )
    fence(
        lambda K, X0: linalg.ns_inverse(K, 30, X0=X0, warm_iters=1, polish=1),
        "ns warm + polish1", K0, K0_inv,
    )

    def woodbury_only(qp, rho, K0_inv):
        # replicate _kkt_inverse_woodbury's correction given K0_inv
        warm = qp_admm.ADMMState(
            x=jnp.zeros((B, 120), dtype), z=jnp.zeros((B, 200), dtype),
            y=jnp.zeros((B, 200), dtype), kinv=K0_inv,
        )
        K_inv, _ = qp_admm._kkt_inverse_woodbury(qp, rho, cfg, warm)
        return K_inv

    fence(woodbury_only, "warm NS + woodbury (full warm stage)", qp, rho, K0_inv)


if __name__ == "__main__":
    main()
