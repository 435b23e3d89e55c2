#!/usr/bin/env python
"""Long-horizon scaling on TPU: condensed ADMM vs stage-wise Riccati-ADMM.

The condensed path is O(h^2) memory / O(h^3)-ish factorization; the
Riccati x-update is O(h) per iteration (SURVEY.md section 5 "sequence
parallel" analog).  This measures both at h in {10, 16, 32, 64},
batch fixed, and prints per-solve times.
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
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--horizons", default="10,16,32,64")
    # The condensed Hessian's f32 dynamic range collapses beyond h ~ 20
    # (P-norm grows ~h^3 against alpha = 4e-5: numerically indefinite,
    # ADMM diverges even with an EXACT inverse — measured at h=32).  The
    # reference hard-caps h at 19 for the same formulation
    # (SolverMPC.cpp:113); long horizons are the stagewise path's job.
    ap.add_argument("--skip-condensed-at", type=int, default=20,
                    help="skip condensed path for h >= this (f32 range)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from quad_periodic_mpc_tpu.config import ADMMConfig, MPCConfig
    from quad_periodic_mpc_tpu.ops import condense, constraints
    from quad_periodic_mpc_tpu.ops import gait as gait_ops
    from quad_periodic_mpc_tpu.ops import problem, qp_admm, qp_stagewise
    from quad_periodic_mpc_tpu.ops.rotations import rpy_to_quat

    B = args.batch
    dtype = jnp.float32
    rng = np.random.default_rng(0)

    def make(h):
        cfg = MPCConfig(horizon=h)
        rpy = rng.uniform(-0.1, 0.1, (B, 3)).astype(np.float32)
        quat = np.asarray(rpy_to_quat(jnp.asarray(rpy)))
        hips = np.array(
            [[0.18, -0.13, -0.27], [0.18, 0.13, -0.27],
             [-0.18, -0.13, -0.27], [-0.18, 0.13, -0.27]], np.float32,
        )
        obs = problem.RobotObs(
            p=jnp.asarray(np.tile([0.0, 0.0, 0.27], (B, 1)), dtype),
            v=jnp.asarray(rng.uniform(-0.3, 0.3, (B, 3)), dtype),
            quat=jnp.asarray(quat, dtype),
            omega=jnp.asarray(rng.uniform(-0.2, 0.2, (B, 3)), dtype),
            r_feet=jnp.asarray(
                hips + rng.uniform(-0.02, 0.02, (B, 4, 3)), dtype
            ),
        )
        xref = np.zeros((B, h, 13), np.float32)
        xref[..., 5] = 0.29
        g = gait_ops.preset("trotting")
        seg = jnp.asarray(rng.integers(0, 10, (B,)), jnp.int32)
        table = gait_ops.mpc_table(g, seg, h)
        f_est = jnp.zeros((B, 6), dtype)
        qp, pred, x0 = problem.build_qp(
            obs, jnp.asarray(xref), table, cfg, f_est=f_est
        )
        l, u = constraints.bounds(table, cfg.f_max, cfg.big_number)
        sw = qp_stagewise.StagewiseProblem(
            Ad=pred.Adt, Bd=pred.Bdt,
            c=(pred.Qdt @ f_est[..., None])[..., 0],
            x0=x0, x_ref=jnp.asarray(xref),
            Q=2.0 * condense.full_weight(jnp.asarray(cfg.weights, dtype)),
            R=2.0 * cfg.alpha * jnp.ones(12, dtype),
            F=qp.F,
            l=l.reshape(B, h, 20),
            u=jnp.minimum(u, 1e4).reshape(B, h, 20),
        )
        return qp, sw

    acfg = ADMMConfig(iterations=args.iters)

    def fence(jfn, *inputs):
        out = jfn(*inputs)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = jfn(*inputs)
        leaf = jax.tree_util.tree_leaves(out)[0]
        assert np.isfinite(float(jnp.sum(leaf)))
        return (time.perf_counter() - t0) / args.reps * 1e3

    cond_solve = jax.jit(lambda qp: qp_admm.solve(qp, acfg)[0])
    sw_solve = jax.jit(lambda sw: qp_stagewise.solve(sw, acfg)[0])

    for h in [int(x) for x in args.horizons.split(",")]:
        qp, sw = make(h)
        row = f"h={h:3d}  "
        if h < args.skip_condensed_at:
            t_c = fence(cond_solve, qp)
            row += f"condensed {t_c:8.2f} ms  "
        else:
            row += "condensed     (skipped)  "
        t_s = fence(sw_solve, sw)
        row += f"stagewise {t_s:8.2f} ms   ({B / t_s * 1e3:,.0f} solves/s)"
        print(row)


if __name__ == "__main__":
    main()
