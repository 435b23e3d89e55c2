#!/usr/bin/env python
"""Structural-lever probe (VERDICT r4 #4): chunk width C=128 vs C=256
on the fused stagewise kernel, isolated dispatch at the headline shape
(h=10, ADMM-30, batch 2048).

If C=256 is faster per instance, the kernel was op-issue/latency bound
(two vregs per tile op amortize issue); if neutral-or-slower, it is
element-throughput bound and the measured time is the VPU floor.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from quad_periodic_mpc_tpu.config import MPCConfig
    from quad_periodic_mpc_tpu.ops import gait as gait_ops
    from quad_periodic_mpc_tpu.ops import problem
    from quad_periodic_mpc_tpu.ops.pallas import stagewise_kernel as SK
    from quad_periodic_mpc_tpu.ops.rotations import rpy_to_quat

    B, h = 4096, 10
    iters = 30
    rho = 0.12
    f32 = jnp.float32
    rng = np.random.default_rng(0)
    cfg = MPCConfig(horizon=h)

    rpy = rng.uniform(-0.1, 0.1, (B, 3))
    hips = np.array(
        [[0.18, -0.13, -0.27], [0.18, 0.13, -0.27],
         [-0.18, -0.13, -0.27], [-0.18, 0.13, -0.27]]
    )
    obs = problem.RobotObs(
        p=jnp.asarray(np.tile([0.0, 0.0, 0.27], (B, 1)), f32),
        v=jnp.asarray(rng.uniform(-0.3, 0.3, (B, 3)), f32),
        quat=jnp.asarray(np.asarray(rpy_to_quat(jnp.asarray(rpy))), f32),
        omega=jnp.asarray(rng.uniform(-0.2, 0.2, (B, 3)), f32),
        r_feet=jnp.asarray(hips + rng.uniform(-0.03, 0.03, (B, 4, 3)), f32),
    )
    xref = np.zeros((B, h, 13), np.float32)
    xref[..., 5] = 0.27
    g = gait_ops.preset("trotting")
    seg = jnp.asarray(rng.integers(0, 10, (B,)), jnp.int32)
    table = gait_ops.mpc_table(g, seg, h)
    sw, _, _ = problem.build_stagewise(obs, jnp.asarray(xref), table, cfg)

    R_eff = jnp.diag(sw.R.astype(f32)) + rho * jnp.kron(
        jnp.eye(4, dtype=f32), jnp.swapaxes(sw.F, -1, -2) @ sw.F
    )
    zeros = lambda r: jnp.zeros((B, h, r), f32)

    for C in (128, 256):
        def run(sw=sw, C=C):
            return SK.fused_stagewise_solve(
                sw.Ad, sw.Bd, sw.c, sw.x0, sw.x_ref, sw.Q.astype(f32),
                R_eff, sw.F.astype(f32), sw.l, sw.u,
                zeros(12), zeros(20), zeros(20),
                iters=iters, rho=rho, ns_it=16, chunk_c=C,
            )

        U, z, y = run()
        float(jnp.sum(U))
        loops = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(10):
                U, z, y = run()
            float(jnp.sum(U))
            loops.append((time.perf_counter() - t0) / 10)
        med = float(np.median(loops)) * 1e3
        print(
            f"C={C}: {med:.2f} ms/dispatch @ B={B} "
            f"({B / (med / 1e3):,.0f} solves/s) loops="
            f"[{', '.join(f'{t*1e3:.2f}' for t in loops)}]",
            flush=True,
        )


if __name__ == "__main__":
    main()
