#!/usr/bin/env python
"""Head-to-head on real TPU: XLA scan ADMM iterations vs Pallas fused kernel.

Times ONLY the iteration loop (K^{-1} given), which is the part the Pallas
kernel replaces.  Inputs come from the real pipeline (mpc_step's QP build)
so sizes/sparsity are production-accurate: h=10 -> n=120, m=200.

Usage: python tools/time_pallas_tpu.py [--batch 2048] [--iters 100]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

# repo root on sys.path (NOT via PYTHONPATH: that breaks the axon TPU
# plugin registration at interpreter startup on this image)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--skip-xla", action="store_true")
    ap.add_argument("--skip-pallas", action="store_true")
    ap.add_argument("--bf16", action="store_true", help="bf16 Kinv storage")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from quad_periodic_mpc_tpu.config import (
        ADMMConfig, EstimatorConfig, LoopConfig, MPCConfig,
    )
    from quad_periodic_mpc_tpu.control import mpc as M
    from quad_periodic_mpc_tpu.ops import constraints as con
    from quad_periodic_mpc_tpu.ops import gait as G
    from quad_periodic_mpc_tpu.ops import problem, qp_admm
    from quad_periodic_mpc_tpu.ops.pallas import admm_kernel
    from quad_periodic_mpc_tpu.sim import srb_sim as S

    dtype = jnp.float32
    B = args.batch
    mpc_cfg = MPCConfig(horizon=10)
    loop_cfg = LoopConfig()
    cfg = ADMMConfig(iterations=args.iters)

    # Build a production QP batch through the real path.
    plant = S.init_plant((B,), body_height=0.29, dtype=dtype)
    obs = S.observe(plant)
    ctrl = M.init_state((B,), obs, dtype=dtype, horizon=10)
    ctrl = ctrl._replace(iteration=(jnp.arange(B, dtype=jnp.int32) * 7) % 208)
    cmd = M.Command(
        vx=jnp.full((B,), 0.3, dtype),
        vy=jnp.zeros((B,), dtype),
        yaw_rate=jnp.zeros((B,), dtype),
        body_height=jnp.full((B,), 0.29, dtype),
    )
    gait = G.preset("trotting")

    from quad_periodic_mpc_tpu.ops import gait as gait_ops
    from quad_periodic_mpc_tpu.ops.rotations import quat_to_rotmat, quat_to_rpy

    @jax.jit
    def build(ctrl, obs, cmd, gait, t):
        R = quat_to_rotmat(obs.quat)
        rpy = quat_to_rpy(obs.quat)
        v_des_robot = jnp.stack(
            [ctrl.x_vel_des, ctrl.y_vel_des, jnp.zeros_like(ctrl.x_vel_des)],
            axis=-1,
        )
        v_des_world = jnp.einsum("...ij,...j->...i", R, v_des_robot)
        x_ref, ctrl2 = M.build_reference_trajectory(
            ctrl, obs, cmd, v_des_world, rpy, mpc_cfg, loop_cfg
        )
        seg = gait_ops.segment_index(
            gait, ctrl.iteration, loop_cfg.iterations_between_mpc
        )
        table = gait_ops.mpc_table(gait, seg, mpc_cfg.horizon)
        r_feet = obs.p_feet - obs.p[..., None, :]
        qp_obs = problem.RobotObs(
            p=obs.p, v=obs.v, quat=obs.quat, omega=obs.omega, r_feet=r_feet
        )
        qp, _, _ = problem.build_qp(qp_obs, x_ref, table, mpc_cfg)
        rho = qp_admm.rho_vector(qp.l, qp.u, cfg)
        K_inv, _ = qp_admm._kkt_inverse_woodbury(qp, rho, cfg, None)
        return qp, rho, K_inv

    qp, rho, K_inv = build(ctrl, obs, cmd, gait, plant.t)
    float(jnp.sum(K_inv))
    n = qp.q.shape[-1]
    m = qp.l.shape[-1]
    print(f"QP batch {B}: n={n}, m={m}, iters={args.iters}")

    x0 = jnp.zeros((B, n), dtype)
    z0 = jnp.zeros((B, m), dtype)
    y0 = jnp.zeros((B, m), dtype)

    sigma = cfg.sigma
    a = cfg.over_relax

    def xla_loop(K_inv, q, l, u, rho, F, x0, z0, y0):
        rho_inv = 1.0 / rho

        def step(state, _):
            x, z, y = state
            rhs = sigma * x - q + con.apply_T(F, rho * z - y)
            x_t = jnp.einsum("...nm,...m->...n", K_inv, rhs)
            x_new = a * x_t + (1.0 - a) * x
            z_t = con.apply(F, x_t)
            z_r = a * z_t + (1.0 - a) * z
            z_new = jnp.clip(z_r + rho_inv * y, l, u)
            y_new = y + rho * (z_r - z_new)
            return (x_new, z_new, y_new), None

        (x, z, y), _ = jax.lax.scan(step, (x0, z0, y0), None, length=args.iters)
        return x, z, y

    xla_jit = jax.jit(xla_loop)
    pallas_jit = jax.jit(
        lambda K_inv, q, l, u, rho, F, x0, z0, y0: admm_kernel.fused_admm_iterations(
            K_inv, q, l, u, rho, F, x0, z0, y0,
            iters=args.iters, sigma=sigma, over_relax=a,
            kinv_bf16=args.bf16,
        )
    )

    inputs = (K_inv, qp.q, qp.l, qp.u, rho, qp.F, x0, z0, y0)

    def bench(fn, name):
        t0 = time.perf_counter()
        out = fn(*inputs)
        cs = float(jnp.sum(out[0]))
        print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s checksum {cs:.6g}")
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(*inputs)
        cs = float(jnp.sum(out[0]))  # chained host sync
        dt = (time.perf_counter() - t0) / args.reps
        assert np.isfinite(cs)
        print(f"{name}: {dt*1e3:.2f} ms/call  ({B*1.0/dt:,.0f} inst/s)")
        return out, dt

    res = {}
    if not args.skip_xla:
        res["xla"] = bench(xla_jit, "XLA scan loop ")
    if not args.skip_pallas:
        res["pallas"] = bench(pallas_jit, "Pallas fused  ")

    if "xla" in res and "pallas" in res:
        (xx, _, _), _ = res["xla"]
        (xp, _, _), _ = res["pallas"]
        err = float(jnp.max(jnp.abs(xx - xp)))
        rel = err / (float(jnp.max(jnp.abs(xx))) + 1e-30)
        print(f"parity: max|dx| {err:.3e} (rel {rel:.3e})")
        print(f"speedup pallas vs xla: {res['xla'][1]/res['pallas'][1]:.2f}x")


if __name__ == "__main__":
    main()
