#!/usr/bin/env python
"""Speed-of-light calibration for the fused stagewise kernel (VERDICT
r4 #4 follow-through).

The round-5 bound model priced every lane-tile op at the VPU's raw f32
element rate (8 sublanes x 128 lanes x ~0.94 GHz) with hand-waved
adjustments for sublane padding and non-FMA ops.  This probe REPLACES
the hand adjustment with a measured primitive calibration:

1. `fma` phase: a Pallas kernel running nothing but the kernels' inner
   op — the row-broadcast FMA `acc += acc[:, k, :][:, None, :] *
   b[k][None, :, :]` on (r, s, 128) tiles with a loop-carried
   dependency — measures the ACHIEVABLE element throughput of the exact
   op pattern (broadcast + FMA issue cost included), which is the
   honest denominator for a speed-of-light ratio.

2. `slope` phase: the production fused kernel at iters 30 vs 60; the
   marginal cost per ADMM iteration and the factorization intercept
   separate where the time goes without instrumenting the kernel.

Usage: python tools/probe_sol.py
"""

from __future__ import annotations

import functools
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # ---- phase 1: primitive lane-contraction throughput ----
    # One fori_loop iteration = one FULL unrolled k-contraction (the
    # kernels' _mm: acc_k += a[:, k, :] (bcast) * b[k], k = 0..n_k-1 —
    # unrolled at trace time exactly like the kernel), so per-round loop
    # overhead is amortized over n_k broadcast-FMAs like the real code.
    # The loop carry feeds the next contraction (the Riccati/NS/sweep
    # dependency structure).
    def cal_kernel(a_ref, out_ref, *, n, r, s, n_k):
        b = a_ref[:] * 1e-3               # (n_k, s, 128) keep chain stable

        def body(i, acc):                 # acc: (r, s, 128)
            out = acc[:, 0, :][:, None, :] * b[0][None, :, :]
            for k in range(1, n_k):
                out = out + acc[:, k % s, :][:, None, :] * b[k][None, :, :]
            return out + acc

        out_ref[:] = jax.lax.fori_loop(
            0, n, body, jnp.ones((r, s, 128), jnp.float32)
        )

    # matvec variant — mirrors _mv exactly: (r, 128) acc accumulated
    # from (r, n_k, 128) slices times broadcast scalar rows
    def cal_mv_kernel(a_ref, out_ref, *, n, r, n_k):
        a = a_ref[:] * 1e-3               # (r, n_k, 128)

        def body(i, acc):                 # acc: (r, 128)
            out = a[:, 0, :] * acc[0][None, :]
            for k in range(1, n_k):
                out = out + a[:, k, :] * acc[k % r][None, :]
            return out + acc

        out_ref[:] = jax.lax.fori_loop(
            0, n, body, jnp.ones((r, 128), jnp.float32)
        )

    def run_cal(r, s, n_k, n, reps=8):
        rng = np.random.default_rng(0)
        if s == 1:                        # matvec shape
            a = jnp.asarray(rng.uniform(0.5, 1.0, (r, n_k, 128)),
                            jnp.float32)
            kern = functools.partial(cal_mv_kernel, n=n, r=r, n_k=n_k)
            out_shape = jax.ShapeDtypeStruct((r, 128), jnp.float32)
            el = ((r + 7) // 8) * 8 * 128 * n * (n_k + 1)
        else:
            a = jnp.asarray(rng.uniform(0.5, 1.0, (n_k, s, 128)),
                            jnp.float32)
            kern = functools.partial(cal_kernel, n=n, r=r, s=s, n_k=n_k)
            out_shape = jax.ShapeDtypeStruct((r, s, 128), jnp.float32)
            el = r * ((s + 7) // 8) * 8 * 128 * n * (n_k + 1)
        call = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=out_shape,
        )
        jitted = jax.jit(lambda a: call(a))
        float(jnp.sum(jitted(a)))          # warm
        loops = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = jitted(a)
            float(jnp.sum(out))
            loops.append((time.perf_counter() - t0) / reps)
        t = float(np.median(loops))
        per_mm = t / n * 1e9
        print(
            f"contraction (r={r:2d}, s={s:2d}, k={n_k:2d}) n={n}: "
            f"{t*1e6:8.1f} us -> {el / t / 1e12:.3f} Tel/s padded, "
            f"{per_mm:6.1f} ns per {n_k}-term contraction",
            flush=True,
        )
        return el / t, per_mm

    print("== phase 1: lane-contraction primitive throughput ==", flush=True)
    rates = {}
    # (r, s, k): the kernel's dominant op shapes — NS round (12,12)x12,
    # Riccati (12..13,13)x12-13, sweep matvecs (13,)x13 / (12,)x12
    for (r, s, k) in ((13, 13, 13), (12, 12, 12), (12, 13, 12),
                      (13, 1, 13), (12, 1, 12)):
        rates[(r, s, k)] = run_cal(r, s, k, n=4000 if s > 1 else 12000)

    # ---- phase 2: production-kernel iteration slope ----
    print("== phase 2: fused kernel iters slope (B=4096, h=10) ==",
          flush=True)
    from quad_periodic_mpc_tpu.config import MPCConfig
    from quad_periodic_mpc_tpu.ops import gait as gait_ops
    from quad_periodic_mpc_tpu.ops import problem
    from quad_periodic_mpc_tpu.ops.pallas import stagewise_kernel as SK
    from quad_periodic_mpc_tpu.ops.rotations import rpy_to_quat

    B, h = 4096, 10
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
    zeros = lambda r_: jnp.zeros((B, h, r_), f32)

    times = {}
    for iters in (30, 60):
        def run(sw=sw, iters=iters):
            return SK.fused_stagewise_solve(
                sw.Ad, sw.Bd, sw.c, sw.x0, sw.x_ref, sw.Q.astype(f32),
                R_eff, sw.F.astype(f32), sw.l, sw.u,
                zeros(12), zeros(20), zeros(20),
                iters=iters, rho=rho, ns_it=16,
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
        times[iters] = float(np.median(loops))
        print(
            f"iters={iters}: {times[iters]*1e3:.2f} ms/dispatch "
            f"({B / times[iters]:,.0f} solves/s) loops="
            f"[{', '.join(f'{t*1e3:.2f}' for t in loops)}]",
            flush=True,
        )

    per_iter = (times[60] - times[30]) / 30
    factor = times[30] - 30 * per_iter
    print(
        f"slope: {per_iter*1e6:.1f} us/iteration, factorization+fixed "
        f"intercept {factor*1e3:.2f} ms "
        f"({factor/times[30]*100:.0f}% of the iters=30 dispatch)",
        flush=True,
    )
    print(
        f"headline config (iters=30): {times[30]*1e3:.2f} ms = "
        f"{times[30]/B*1e6:.2f} us/solve", flush=True,
    )


if __name__ == "__main__":
    main()
