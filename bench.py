#!/usr/bin/env python
"""Headline benchmark: horizon-10 A1 trot MPC solves/s/chip.

Measures the full production control step (mpc_step: reference-trajectory
build, disturbance residual + periodic estimator update, SRB
linearization, closed-form discretization + condensation, batched QP
solve, force extraction) — the TPU rebuild of one solve_mpc call
(SolverMPC.cpp:566) plus its assembly in solveDenseMPC
(ConvexMPCLocomotion.cpp:612).  The timed region ALSO steps the analytic
SRB plant (with the reference's sinusoidal disturbance,
raisim_unitree_ros_driver.cpp:606) and advances the gait counter, so the
observation drifts every step and the carried ADMM warm start does real
closed-loop work — no frozen-input dispatch-rate numbers.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "solves/s", "vs_baseline": R,
   "p99_ms": ..., "tflops": ..., "mfu": ..., "batch": ...}

vs_baseline is value / 1e4 — the driver target (BASELINE.md: >= 1e4
horizon-10 solves/s/chip; the reference C++ controller performs 38.5
solves/s on its CPU budget).  Extra detail goes to stderr.

Robustness contract (the driver runs this under `timeout` from a cold
process): a watchdog emits the best-so-far JSON line and exits 0 when the
QPM_BENCH_BUDGET_S budget (default 420 s) expires, measurements run
smallest-config-first so a partial run still yields a number, and
compiled programs persist in the repo-committed .jaxcache/ directory so a
driver run after a pre-warmed build compiles nothing.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BUDGET_S = float(os.environ.get("QPM_BENCH_BUDGET_S", "420"))

_emit_lock = threading.Lock()
_emitted = False
_result = {
    "metric": "h10_a1_trot_mpc_solves_per_s_per_chip",
    "value": 0.0,
    "unit": "solves/s",
    "vs_baseline": 0.0,
}


def _update(**kw) -> None:
    with _emit_lock:
        _result.update(kw)


def _emit() -> None:
    """Print the result JSON exactly once (watchdog or normal path)."""
    global _emitted
    with _emit_lock:
        if _emitted:
            return
        _emitted = True
        print(json.dumps(_result), flush=True)


def _watchdog() -> None:
    print(
        f"bench watchdog: budget {BUDGET_S:.0f}s expired — emitting "
        "best-so-far result",
        file=sys.stderr,
        flush=True,
    )
    _emit()
    os._exit(0)


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
    # xla (HIGHEST-precision loop) is the production default: 84.8k
    # solves/s with KKT primal residual at the CPU-exact 2e-3 level.
    # pallas (fused bf16-K^{-1} kernel) trades that for +5% throughput
    # (89k) at a ~1-2 N standing primal residual from the bf16 storage
    # bias — select it when raw throughput outranks the accuracy gate.
    ap.add_argument("--backend", choices=["xla", "pallas"], default="xla",
                    help="ADMM iteration-loop backend")
    ap.add_argument("--no-p99", action="store_true",
                    help="skip the b=1 on-device p99 latency phase")
    ap.add_argument("--no-longhorizon", action="store_true",
                    help="skip the h=32 stagewise second metric")
    ap.add_argument("--latency", action="store_true",
                    help="also measure b=1 host-round-trip latency")
    # SURVEY.md §5 tracing analog (the reference's SHOW_MPC_SOLVE_TIME /
    # Timer stopwatches): full profiler timeline of one measured step.
    ap.add_argument("--profile", default="", metavar="DIR",
                    help="write a jax.profiler trace of one step to DIR")
    args = ap.parse_args()

    _update(metric=f"h{args.horizon}_a1_trot_mpc_solves_per_s_per_chip")

    timer = threading.Timer(BUDGET_S, _watchdog)
    timer.daemon = True
    timer.start()
    t_start = time.perf_counter()

    import jax

    # Persistent compile cache, committed to the repo: remote (axon)
    # compiles cost minutes, cached re-runs cost seconds, and /tmp does
    # not survive to the driver's process.
    cache_dir = os.environ.get("QPM_CACHE_DIR", os.path.join(REPO, ".jaxcache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
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
    dt_mpc = loop_cfg.dt * loop_cfg.iterations_between_mpc

    def make_inputs(batch: int):
        plant = S.init_plant((batch,), body_height=0.29, dtype=dtype)
        obs = S.observe(plant)
        ctrl = M.init_state((batch,), obs, dtype=dtype, horizon=args.horizon)
        # spread gait phase across the batch (gait-phase sweep axis)
        ctrl = ctrl._replace(
            iteration=(jnp.arange(batch, dtype=jnp.int32) * 7) % 208
        )
        cmd = M.Command(
            vx=jnp.zeros((batch,), dtype),
            vy=jnp.zeros((batch,), dtype),
            yaw_rate=jnp.zeros((batch,), dtype),
            body_height=jnp.full((batch,), 0.29, dtype),
        )
        gait = G.preset("trotting")
        dist = S.DisturbanceParams.reference((batch,), dtype=dtype)
        return ctrl, plant, cmd, gait, dist

    def step(ctrl, plant, cmd, gait, dist):
        """One MPC period: solve, then hold the first-step forces over the
        period on the plant (the reference's zero-order hold between 38.5 Hz
        solves) so the next observation has drifted."""
        obs = S.observe(plant)
        ctrl, forces = M.mpc_step(
            ctrl, obs, cmd, gait, plant.t, mpc_cfg, loop_cfg, est_cfg, solver
        )
        seg = G.segment_index(gait, ctrl.iteration, loop_cfg.iterations_between_mpc)
        stance = G.mpc_table(gait, seg, 1)[..., 0, :].astype(dtype)
        plant = S.step(
            plant, forces[..., 0, :, :], plant.p_feet, stance, dist,
            mpc_cfg, dt_mpc,
        )
        ctrl = ctrl._replace(
            iteration=ctrl.iteration + loop_cfg.iterations_between_mpc
        )
        return ctrl, plant, forces

    # NOTE: no donate_argnums and a host-transferred checksum as the timing
    # fence — on the axon-tunneled backend, donation corrupts execution and
    # block_until_ready does not actually block, which silently yields
    # dispatch-rate (fantasy) numbers.
    step_jit = jax.jit(step)

    def throughput(batch: int) -> float:
        ctrl, plant, cmd, gait, dist = make_inputs(batch)
        ctrl, plant, f = step_jit(ctrl, plant, cmd, gait, dist)
        float(jnp.sum(f))                     # hard sync (compile)
        n = args.iters
        t0 = time.perf_counter()
        for _ in range(n):
            ctrl, plant, f = step_jit(ctrl, plant, cmd, gait, dist)
        checksum = float(jnp.sum(f))          # chained: forces all n steps
        dt = time.perf_counter() - t0
        if not np.isfinite(checksum):
            raise RuntimeError("non-finite checksum")
        return batch * n / dt

    if args.batch:
        batches = [args.batch]
    else:
        # smallest first: a partial run inside the watchdog budget still
        # records a real number before the headline batch compiles
        batches = [256, 2048]

    best = 0.0
    best_b = 0
    for b in batches:
        try:
            sps = throughput(b)
        except Exception as e:  # OOM etc — report what we can
            print(f"batch {b}: failed ({type(e).__name__}: {e})",
                  file=sys.stderr, flush=True)
            continue
        print(f"batch {b}: {sps:,.0f} solves/s "
              f"[t+{time.perf_counter() - t_start:.0f}s]",
              file=sys.stderr, flush=True)
        if sps > best:
            best, best_b = sps, b
            _update(value=round(best, 1), vs_baseline=round(best / 1e4, 4),
                    batch=b)

    # ---- production-path KKT residuals at batch scale ----
    # Accuracy evidence for the headline number: after warm steps on the
    # drifting plant, compute per-instance KKT residuals of the solution
    # against exactly the QP mpc_step assembled (return_qp audit hook).
    # CPU ceilings are pinned in tests/test_kkt_ceiling.py; the fields
    # here capture the same quantities on the real TPU pallas path.
    if best_b:
        try:
            from quad_periodic_mpc_tpu.ops import qp_admm

            def step_audit(ctrl, plant, cmd, gait, dist):
                obs = S.observe(plant)
                ctrl, forces, qp = M.mpc_step(
                    ctrl, obs, cmd, gait, plant.t, mpc_cfg, loop_cfg,
                    est_cfg, solver, return_qp=True,
                )
                res = qp_admm.kkt_residuals(
                    qp, ctrl.warm_x, ctrl.warm_z, ctrl.warm_y
                )
                seg = G.segment_index(
                    gait, ctrl.iteration, loop_cfg.iterations_between_mpc
                )
                stance = G.mpc_table(gait, seg, 1)[..., 0, :].astype(dtype)
                plant = S.step(
                    plant, forces[..., 0, :, :], plant.p_feet, stance,
                    dist, mpc_cfg, dt_mpc,
                )
                ctrl = ctrl._replace(
                    iteration=ctrl.iteration + loop_cfg.iterations_between_mpc
                )
                return ctrl, plant, res

            audit_jit = jax.jit(step_audit)
            ctrl, plant, cmd, gait, dist = make_inputs(best_b)
            res = None
            for _ in range(6):
                ctrl, plant, res = audit_jit(ctrl, plant, cmd, gait, dist)
            prim = np.asarray(res["primal"])
            kp = float(prim.max())
            kp99 = float(np.percentile(prim, 99))
            kd = float(jnp.max(res["dual"]))
            _update(kkt_primal_max=round(kp, 6),
                    kkt_primal_p99=round(kp99, 6),
                    kkt_dual_max=round(kd, 6))
            print(
                f"warm-step-6 KKT residuals @ batch {best_b}: "
                f"primal max {kp:.2e} / p99 {kp99:.2e} / "
                f"p50 {float(np.percentile(prim, 50)):.2e}, "
                f"dual max {kd:.2e} "
                f"(CPU ceilings 6e-3 / 1e-3, test_kkt_ceiling.py)",
                file=sys.stderr, flush=True,
            )
        except Exception as e:
            print(f"kkt phase failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)

    # ---- achieved FLOP/s vs peak (roofline position) ----
    if best_b:
        try:
            ctrl, plant, cmd, gait, dist = make_inputs(best_b)
            cost = (
                step_jit.lower(ctrl, plant, cmd, gait, dist)
                .compile()
                .cost_analysis()
            )
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            flops_per_dispatch = float(cost.get("flops", 0.0))
            tflops = flops_per_dispatch * (best / best_b) / 1e12
            # TPU v5e peak: 197 TFLOP/s bf16 / ~98.5 f32.  The MPC step is
            # small-matrix dominated, so mfu is reported for honesty, not
            # as the optimization target (HBM + VMEM latency bound).
            mfu = tflops / 197.0
            _update(tflops=round(tflops, 3), mfu=round(mfu, 5))
            print(f"cost: {flops_per_dispatch / best_b / 1e6:.3f} MFLOP/solve, "
                  f"{tflops:.2f} TFLOP/s achieved, mfu {mfu:.4f}",
                  file=sys.stderr, flush=True)
        except Exception as e:
            print(f"cost_analysis unavailable: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)

    # ---- on-device b=1 p99 latency (BASELINE.md: p99 < 2 ms) ----
    # Single-dispatch latency through the axon tunnel is RTT-dominated
    # (tens of ms regardless of compute); chaining K steps inside one
    # lax.scan dispatch and dividing isolates the on-device per-solve
    # latency the 2 ms reference budget actually constrains.  p99 is taken
    # over per-step times of many dispatches.
    if not args.no_p99:
        try:
            K = 64
            ctrl, plant, cmd, gait, dist = make_inputs(1)

            def chain(ctrl, plant, cmd, gait, dist):
                def body(c, _):
                    ctrl, plant = c
                    ctrl, plant, f = step(ctrl, plant, cmd, gait, dist)
                    return (ctrl, plant), jnp.sum(f)
                c, s = jax.lax.scan(body, (ctrl, plant), None, length=K)
                return jnp.sum(s)

            chain_jit = jax.jit(chain)
            float(chain_jit(ctrl, plant, cmd, gait, dist))      # compile
            times = []
            for _ in range(30):
                t0 = time.perf_counter()
                float(chain_jit(ctrl, plant, cmd, gait, dist))  # host fence
                times.append((time.perf_counter() - t0) / K)
            per_step = np.asarray(times) * 1e3
            p50 = float(np.percentile(per_step, 50))
            p99 = float(np.percentile(per_step, 99))
            _update(p99_ms=round(p99, 4))
            print(f"b=1 on-device per-step latency p50 {p50:.3f} ms, "
                  f"p99 {p99:.3f} ms (chain of {K}, 30 dispatches; "
                  "budget 2 ms)", file=sys.stderr, flush=True)
        except Exception as e:
            print(f"p99 phase failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)

    # ---- long-horizon second line: h=32 stagewise (VERDICT r1 item 5) ----
    # The condensed formulation is f32-range-bound past h ~ 20 (the
    # reference hard-caps h = 19, SolverMPC.cpp:113); the lane-major
    # packed Riccati-ADMM is the long-horizon path.  Full mpc_step, end
    # to end, batch 512.
    if not args.no_longhorizon:
        try:
            lh_h = 32
            lh_b = 512
            lh_cfg = MPCConfig(horizon=lh_h)
            lh_solver = ADMMConfig(
                iterations=args.admm_iters, formulation="stagewise"
            )

            def make_lh(batch: int):
                plant = S.init_plant((batch,), body_height=0.29, dtype=dtype)
                obs = S.observe(plant)
                ctrl = M.init_state(
                    (batch,), obs, dtype=dtype, horizon=lh_h,
                    formulation="stagewise",
                )
                ctrl = ctrl._replace(
                    iteration=(jnp.arange(batch, dtype=jnp.int32) * 7) % 208
                )
                cmd = M.Command(
                    vx=jnp.zeros((batch,), dtype),
                    vy=jnp.zeros((batch,), dtype),
                    yaw_rate=jnp.zeros((batch,), dtype),
                    body_height=jnp.full((batch,), 0.29, dtype),
                )
                gait = G.preset("trotting")
                dist = S.DisturbanceParams.reference((batch,), dtype=dtype)
                return ctrl, plant, cmd, gait, dist

            def lh_step(ctrl, plant, cmd, gait, dist):
                obs = S.observe(plant)
                ctrl, forces = M.mpc_step(
                    ctrl, obs, cmd, gait, plant.t, lh_cfg, loop_cfg,
                    est_cfg, lh_solver,
                )
                seg = G.segment_index(
                    gait, ctrl.iteration, loop_cfg.iterations_between_mpc
                )
                stance = G.mpc_table(gait, seg, 1)[..., 0, :].astype(dtype)
                plant = S.step(
                    plant, forces[..., 0, :, :], plant.p_feet, stance,
                    dist, lh_cfg, dt_mpc,
                )
                ctrl = ctrl._replace(
                    iteration=ctrl.iteration + loop_cfg.iterations_between_mpc
                )
                return ctrl, plant, forces

            lh_jit = jax.jit(lh_step)
            ctrl, plant, cmd, gait, dist = make_lh(lh_b)
            ctrl, plant, f = lh_jit(ctrl, plant, cmd, gait, dist)
            float(jnp.sum(f))
            n = max(args.iters // 2, 5)
            t0 = time.perf_counter()
            for _ in range(n):
                ctrl, plant, f = lh_jit(ctrl, plant, cmd, gait, dist)
            checksum = float(jnp.sum(f))
            dt = time.perf_counter() - t0
            if np.isfinite(checksum):
                lh_sps = lh_b * n / dt
                _update(h32_stagewise_solves_per_s=round(lh_sps, 1))
                print(
                    f"h=32 stagewise end-to-end: {lh_sps:,.0f} solves/s "
                    f"@ batch {lh_b} ({dt / n * 1e3:.1f} ms/step)",
                    file=sys.stderr, flush=True,
                )
        except Exception as e:
            print(f"long-horizon phase failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)

    if args.profile:
        ctrl, plant, cmd, gait, dist = make_inputs(best_b or 2048)
        ctrl, plant, f = step_jit(ctrl, plant, cmd, gait, dist)
        float(jnp.sum(f))                     # compile + settle
        with jax.profiler.trace(args.profile):
            ctrl, plant, f = step_jit(ctrl, plant, cmd, gait, dist)
            float(jnp.sum(f))
        print(f"profiler trace written to {args.profile}", file=sys.stderr)

    if args.latency:
        ctrl, plant, cmd, gait, dist = make_inputs(1)
        lat_step = jax.jit(step)
        c2, p2, f = lat_step(ctrl, plant, cmd, gait, dist)
        float(jnp.sum(f))
        lats = []
        for _ in range(100):
            t0 = time.perf_counter()
            _, _, f = lat_step(ctrl, plant, cmd, gait, dist)
            float(jnp.sum(f))                 # hard sync incl. transfer
            lats.append(time.perf_counter() - t0)
        lats = np.asarray(lats) * 1e3
        print(
            f"b=1 host-round-trip latency p50 {np.percentile(lats, 50):.3f} ms, "
            f"p99 {np.percentile(lats, 99):.3f} ms (tunnel RTT included)",
            file=sys.stderr, flush=True,
        )

    timer.cancel()
    _emit()
    print(f"best batch: {best_b} [total {time.perf_counter() - t_start:.0f}s]",
          file=sys.stderr)


if __name__ == "__main__":
    main()
