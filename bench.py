#!/usr/bin/env python
"""Headline benchmark: horizon-10 A1 trot MPC solves/s/chip.

Measures the full production control step (mpc_step: reference-trajectory
build, disturbance residual + periodic estimator update, SRB
linearization, closed-form discretization + condensation, batched QP
solve, force extraction) — the TPU rebuild of one solve_mpc call
(SolverMPC.cpp:566) plus its assembly in solveDenseMPC
(ConvexMPCLocomotion.cpp:612).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "solves/s", "vs_baseline": R}

vs_baseline is value / 1e4 — the driver target (BASELINE.md: >= 1e4
horizon-10 solves/s/chip; the reference C++ controller performs 38.5
solves/s on its CPU budget).  Extra detail goes to stderr.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=0, help="0 = auto sweep")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--horizon", type=int, default=10)
    ap.add_argument("--solver", choices=["admm", "pdip"], default="admm")
    # 30 fixed iterations is the steady-state production setting: the
    # (x, z, y) warm start carried across MPC steps makes the effective
    # iteration count cumulative — closed-loop trot tracking matches the
    # PDIP reference at ADMM-30 warm
    # (tests/test_closed_loop.py::test_trot_admm30_warm_matches_pdip)
    ap.add_argument("--admm-iters", type=int, default=30)
    # pallas = fused bf16-K^{-1} iteration kernel, the production TPU path
    # (1.9x the XLA GEMV loop; docs/PERFORMANCE.md)
    ap.add_argument("--backend", choices=["xla", "pallas"], default="pallas",
                    help="ADMM iteration-loop backend")
    ap.add_argument("--latency", action="store_true", help="also measure b=1 latency")
    # Single-dispatch latency through the axon tunnel is RTT-dominated
    # (tens of ms regardless of compute); chaining K steps inside one
    # lax.scan dispatch and dividing isolates the on-device per-solve
    # latency — the number the 2 ms reference budget (BASELINE.md)
    # actually constrains.
    ap.add_argument("--latency-device", action="store_true",
                    help="amortized on-device b=1 per-step latency (scan chain)")
    # SURVEY.md §5 tracing analog (the reference's SHOW_MPC_SOLVE_TIME /
    # Timer stopwatches): full profiler timeline of one measured step.
    ap.add_argument("--profile", default="", metavar="DIR",
                    help="write a jax.profiler trace of one step to DIR")
    args = ap.parse_args()

    import jax

    # persistent compile cache: remote (axon) compiles cost minutes; cached
    # re-runs cost seconds
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from quad_periodic_mpc_tpu.config import (
        ADMMConfig, EstimatorConfig, LoopConfig, MPCConfig, PDIPConfig,
    )
    from quad_periodic_mpc_tpu.control import mpc as M
    from quad_periodic_mpc_tpu.ops import gait as G
    from quad_periodic_mpc_tpu.sim import srb_sim as S

    dtype = jnp.float32
    mpc_cfg = MPCConfig(horizon=args.horizon)
    loop_cfg = LoopConfig()
    est_cfg = EstimatorConfig()
    solver = (
        ADMMConfig(iterations=args.admm_iters, backend=args.backend)
        if args.solver == "admm"
        else PDIPConfig(iterations=25)
    )

    def make_inputs(batch: int):
        plant = S.init_plant((batch,), body_height=0.29, dtype=dtype)
        obs = S.observe(plant)
        ctrl = M.init_state((batch,), obs, dtype=dtype, horizon=args.horizon)
        # spread gait phase across the batch (gait-phase sweep axis)
        ctrl = ctrl._replace(
            iteration=(jnp.arange(batch, dtype=jnp.int32) * 7) % 208
        )
        cmd = M.Command(
            vx=jnp.full((batch,), 0.3, dtype),
            vy=jnp.zeros((batch,), dtype),
            yaw_rate=jnp.zeros((batch,), dtype),
            body_height=jnp.full((batch,), 0.29, dtype),
        )
        gait = G.preset("trotting")
        return ctrl, obs, cmd, gait, plant.t

    def step(ctrl, obs, cmd, gait, t):
        ctrl, forces = M.mpc_step(
            ctrl, obs, cmd, gait, t, mpc_cfg, loop_cfg, est_cfg, solver
        )
        return ctrl, forces

    # NOTE: no donate_argnums and a host-transferred checksum as the timing
    # fence — on the axon-tunneled backend, donation corrupts execution and
    # block_until_ready does not actually block, which silently yields
    # dispatch-rate (fantasy) numbers.
    step_jit = jax.jit(step)

    def throughput(batch: int) -> float:
        ctrl, obs, cmd, gait, t = make_inputs(batch)
        ctrl, f = step_jit(ctrl, obs, cmd, gait, t)
        float(jnp.sum(f))                     # hard sync
        n = args.iters
        t0 = time.perf_counter()
        for _ in range(n):
            ctrl, f = step_jit(ctrl, obs, cmd, gait, t)
        checksum = float(jnp.sum(f))          # chained: forces all n steps
        dt = time.perf_counter() - t0
        if not np.isfinite(checksum):
            raise RuntimeError("non-finite checksum")
        return batch * n / dt

    if args.batch:
        batches = [args.batch]
    else:
        # one shape by default: every distinct batch costs a multi-minute
        # remote compile on this setup (cached thereafter)
        batches = [2048]

    best = 0.0
    best_b = 0
    for b in batches:
        try:
            sps = throughput(b)
        except Exception as e:  # OOM etc — report what we can
            print(f"batch {b}: failed ({type(e).__name__})", file=sys.stderr)
            continue
        print(f"batch {b}: {sps:,.0f} solves/s", file=sys.stderr)
        if sps > best:
            best, best_b = sps, b

    if args.profile:
        ctrl, obs, cmd, gait, t = make_inputs(best_b or 2048)
        ctrl, f = step_jit(ctrl, obs, cmd, gait, t)
        float(jnp.sum(f))                     # compile + settle
        with jax.profiler.trace(args.profile):
            ctrl, f = step_jit(ctrl, obs, cmd, gait, t)
            float(jnp.sum(f))
        print(f"profiler trace written to {args.profile}", file=sys.stderr)

    if args.latency_device:
        K = 256
        ctrl, obs, cmd, gait, t = make_inputs(1)

        def chain(ctrl, obs, cmd, gait, t):
            def body(c, _):
                c, f = step(c, obs, cmd, gait, t)
                return c, jnp.sum(f)
            c, s = jax.lax.scan(body, ctrl, None, length=K)
            return jnp.sum(s)

        chain_jit = jax.jit(chain)
        float(chain_jit(ctrl, obs, cmd, gait, t))      # compile
        times = []
        for _ in range(10):
            t0 = time.perf_counter()
            float(chain_jit(ctrl, obs, cmd, gait, t))  # host-sync fence
            times.append(time.perf_counter() - t0)
        per_step = (min(times) / K) * 1e3
        print(
            f"b=1 on-device per-step latency {per_step:.3f} ms "
            f"(chain of {K}; budget 2 ms; min-of-10 dispatches, "
            f"RTT amortized)",
            file=sys.stderr,
        )

    if args.latency:
        ctrl, obs, cmd, gait, t = make_inputs(1)
        lat_step = jax.jit(step)
        ctrl2, f = lat_step(ctrl, obs, cmd, gait, t)
        float(jnp.sum(f))
        lats = []
        for _ in range(100):
            t0 = time.perf_counter()
            _, f = lat_step(ctrl, obs, cmd, gait, t)
            float(jnp.sum(f))                 # hard sync incl. transfer
            lats.append(time.perf_counter() - t0)
        lats = np.asarray(lats) * 1e3
        print(
            f"b=1 latency p50 {np.percentile(lats, 50):.3f} ms, "
            f"p99 {np.percentile(lats, 99):.3f} ms (budget 2 ms)",
            file=sys.stderr,
        )

    print(
        json.dumps(
            {
                "metric": f"h{args.horizon}_a1_trot_mpc_solves_per_s_per_chip",
                "value": round(best, 1),
                "unit": "solves/s",
                "vs_baseline": round(best / 1e4, 4),
            }
        )
    )
    print(f"best batch: {best_b}", file=sys.stderr)


if __name__ == "__main__":
    main()
