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
compiled programs persist in the on-disk .jaxcache/ directory (untracked;
warmed by running bench once after any code change) so a driver run after
a pre-warmed build compiles nothing.

QPM_FORCE_CPU=1 forces the CPU backend (shape/logic smoke runs in CI).
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
    # pallas = fused VMEM-resident kernel with HIGHEST-precision
    # in-kernel cone products and f32-resident K^{-1} — the production
    # default since round 4 (the bf16-K^{-1} variant measured ~4.5 N
    # from the qpOASES optimum in weakly-penalized force directions,
    # parity table "production" row; f32 measures 2.6e-3 N at ~1.3%
    # lower throughput).  xla = HIGHEST-precision lax.scan loop, the
    # accuracy reference.  The default run also measures the bf16
    # throughput variant with its own KKT audit (pallas_bf16_* fields)
    # so both variants carry gates.
    ap.add_argument("--backend", choices=["xla", "pallas"], default="pallas",
                    help="ADMM iteration-loop backend for the headline")
    # The headline runs the fused stagewise Riccati-ADMM kernel
    # (ops/pallas/stagewise_kernel.py) — sequential in-VMEM factorize
    # + resident-gain iterations.  The condensed path remains a
    # measured secondary line (condensed_* fields) as the
    # reference-shaped formulation.
    ap.add_argument("--formulation", choices=["stagewise", "condensed"],
                    default="stagewise",
                    help="headline QP formulation")
    ap.add_argument("--no-p99", action="store_true",
                    help="skip the b=1 on-device p99 latency phase")
    ap.add_argument("--no-longhorizon", action="store_true",
                    help="skip the h=32 stagewise second metric")
    ap.add_argument("--no-h16", action="store_true",
                    help="skip the reference-default h=16 line")
    ap.add_argument("--h16-condensed", action="store_true",
                    help="run the h=16 line on the condensed ADMM-40 "
                         "recipe instead of the stagewise default")
    ap.add_argument("--no-fullstack", action="store_true",
                    help="skip the MPC+WBC torque-tier line")
    ap.add_argument("--no-pallas-audit", action="store_true",
                    help="skip the accuracy-gated pallas backend line")
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

    if os.environ.get("QPM_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")

    # Persistent on-disk compile cache: remote (axon) compiles cost
    # minutes, cached re-runs cost seconds, and /tmp does not survive to
    # the driver's process.
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
        ADMMConfig(iterations=args.admm_iters, backend=args.backend,
                   formulation=args.formulation)
        if args.solver == "admm"
        else PDIPConfig(iterations=25)
    )
    dt_mpc = loop_cfg.dt * loop_cfg.iterations_between_mpc

    from quad_periodic_mpc_tpu.models.a1 import A1
    from quad_periodic_mpc_tpu.ops.rotations import quat_to_rotmat

    VX = 0.3  # the trot WALKS: nonzero velocity command in the timed loop

    def make_inputs(batch: int, horizon: int | None = None,
                    formulation: str = "condensed"):
        horizon = horizon or args.horizon
        plant = S.init_plant((batch,), body_height=0.29, dtype=dtype)
        obs = S.observe(plant)
        ctrl = M.init_state(
            (batch,), obs, dtype=dtype, horizon=horizon,
            formulation=formulation,
        )
        # spread gait phase across the batch (gait-phase sweep axis);
        # start with the velocity command already filtered in so the
        # reference trajectory walks from step one
        ctrl = ctrl._replace(
            iteration=(jnp.arange(batch, dtype=jnp.int32) * 7) % 208,
            x_vel_des=jnp.full((batch,), VX, dtype),
        )
        cmd = M.Command(
            vx=jnp.full((batch,), VX, dtype),
            vy=jnp.zeros((batch,), dtype),
            yaw_rate=jnp.zeros((batch,), dtype),
            body_height=jnp.full((batch,), 0.29, dtype),
        )
        gait = G.preset("trotting")
        dist = S.DisturbanceParams.reference((batch,), dtype=dtype)
        return ctrl, plant, cmd, gait, dist

    hips = jnp.asarray(A1.hip_locations(), dtype)      # (4, 3) body frame
    t_stance = 10 * dt_mpc                             # trot: 10 segments

    def make_step(cfg, slv):
        def step(ctrl, plant, cmd, gait, dist):
            """One MPC period: solve, then hold the first-step forces over
            the period on the plant (the reference's zero-order hold
            between 38.5 Hz solves) so the next observation has drifted.
            Swing feet track their hips with a half-stance Raibert lead
            (bench-cadence stand-in for the 500 Hz swing trajectory), so
            the walking trot keeps r_feet bounded and the gait actually
            steps."""
            obs = S.observe(plant)
            ctrl = M.setup_command(ctrl, cmd, loop_cfg)
            ctrl, forces = M.mpc_step(
                ctrl, obs, cmd, gait, plant.t, cfg, loop_cfg, est_cfg, slv
            )
            seg = G.segment_index(
                gait, ctrl.iteration, loop_cfg.iterations_between_mpc
            )
            stance = G.mpc_table(gait, seg, 1)[..., 0, :].astype(dtype)
            R = quat_to_rotmat(obs.quat)
            hip_w = obs.p[..., None, :] + jnp.einsum(
                "...ij,...kj->...ki", R, jnp.broadcast_to(
                    hips, obs.p_feet.shape
                )
            )
            p_touch = hip_w + 0.5 * t_stance * obs.v[..., None, :]
            p_touch = p_touch.at[..., 2].set(0.0)
            # swing feet GLIDE toward the touchdown target (rate-limited,
            # ~swing-foot speed x one MPC period) — the real loop moves
            # feet continuously through the Bezier swing, and a teleport
            # here puts a large K jump into ~10% of the batch every step,
            # which forces the warm NS gate cold (measured +20 ms/step)
            d = jnp.clip(p_touch - plant.p_feet, -0.04, 0.04)
            p_feet = jnp.where(
                stance[..., None] > 0.5, plant.p_feet, plant.p_feet + d
            )
            plant = S.step(
                plant, forces[..., 0, :, :], p_feet, stance, dist,
                cfg, dt_mpc,
            )
            ctrl = ctrl._replace(
                iteration=ctrl.iteration + loop_cfg.iterations_between_mpc
            )
            return ctrl, plant, forces
        return step

    step = make_step(mpc_cfg, solver)

    # NOTE: no donate_argnums and a host-transferred checksum as the timing
    # fence — on the axon-tunneled backend, donation corrupts execution and
    # block_until_ready does not actually block, which silently yields
    # dispatch-rate (fantasy) numbers.
    step_jit = jax.jit(step)

    def throughput(batch: int) -> tuple[float, list]:
        """Median-of-3 timed loops + per-loop spread (VERDICT r4 #2:
        every published line carries run-to-run spread; warmup reaches
        the steady warm-seed state before timing starts)."""
        ctrl, plant, cmd, gait, dist = make_inputs(
            batch, formulation=args.formulation
        )
        for _ in range(6):                    # compile + steady state
            ctrl, plant, f = step_jit(ctrl, plant, cmd, gait, dist)
        float(jnp.sum(f))                     # hard sync
        n = args.iters
        loops = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n):
                ctrl, plant, f = step_jit(ctrl, plant, cmd, gait, dist)
            checksum = float(jnp.sum(f))      # chained: forces all n steps
            loops.append(batch * n / (time.perf_counter() - t0))
            if not np.isfinite(checksum):
                raise RuntimeError("non-finite checksum")
        return float(np.median(loops)), sorted(loops)

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
            sps, loops = throughput(b)
        except Exception as e:  # OOM etc — report what we can
            print(f"batch {b}: failed ({type(e).__name__}: {e})",
                  file=sys.stderr, flush=True)
            continue
        print(f"batch {b}: {sps:,.0f} solves/s (median of "
              f"[{', '.join(f'{v:,.0f}' for v in loops)}]) "
              f"[t+{time.perf_counter() - t_start:.0f}s]",
              file=sys.stderr, flush=True)
        if sps > best:
            best, best_b = sps, b
            _update(value=round(best, 1), vs_baseline=round(best / 1e4, 4),
                    batch=b,
                    value_spread=[round(v, 1) for v in loops])

    # ---- production-path KKT residuals at batch scale ----
    # Accuracy evidence for the headline number: after warm steps on the
    # drifting plant, compute per-instance KKT residuals of the solution
    # against exactly the QP mpc_step assembled (return_qp audit hook).
    # CPU ceilings are pinned in tests/test_kkt_ceiling.py; the fields
    # here capture the same quantities on the real TPU pallas path.
    if best_b:
        try:
            from quad_periodic_mpc_tpu.ops import qp_admm
            from quad_periodic_mpc_tpu.ops import qp_stagewise as _qs

            def step_audit(ctrl, plant, cmd, gait, dist):
                obs = S.observe(plant)
                ctrl = M.setup_command(ctrl, cmd, loop_cfg)
                ctrl, forces, qp = M.mpc_step(
                    ctrl, obs, cmd, gait, plant.t, mpc_cfg, loop_cfg,
                    est_cfg, solver, return_qp=True,
                )
                lead = obs.p.shape[:-1]
                hh = mpc_cfg.horizon
                if getattr(solver, "formulation", "condensed") == "stagewise":
                    res = _qs.kkt_residuals(
                        qp,
                        ctrl.warm_x.reshape(lead + (hh, 12)),
                        ctrl.warm_z.reshape(lead + (hh, 20)),
                        ctrl.warm_y.reshape(lead + (hh, 20)),
                    )
                else:
                    res = qp_admm.kkt_residuals(
                        qp, ctrl.warm_x, ctrl.warm_z, ctrl.warm_y
                    )
                seg = G.segment_index(
                    gait, ctrl.iteration, loop_cfg.iterations_between_mpc
                )
                stance = G.mpc_table(gait, seg, 1)[..., 0, :].astype(dtype)
                R = quat_to_rotmat(obs.quat)
                hip_w = obs.p[..., None, :] + jnp.einsum(
                    "...ij,...kj->...ki", R, jnp.broadcast_to(
                        hips, obs.p_feet.shape
                    )
                )
                p_touch = hip_w + 0.5 * t_stance * obs.v[..., None, :]
                p_touch = p_touch.at[..., 2].set(0.0)
                d = jnp.clip(p_touch - plant.p_feet, -0.04, 0.04)
                p_feet = jnp.where(
                    stance[..., None] > 0.5, plant.p_feet,
                    plant.p_feet + d
                )
                plant = S.step(
                    plant, forces[..., 0, :, :], p_feet, stance,
                    dist, mpc_cfg, dt_mpc,
                )
                ctrl = ctrl._replace(
                    iteration=ctrl.iteration + loop_cfg.iterations_between_mpc
                )
                return ctrl, plant, res

            audit_jit = jax.jit(step_audit)
            ctrl, plant, cmd, gait, dist = make_inputs(
                best_b, formulation=args.formulation
            )
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
            ctrl, plant, cmd, gait, dist = make_inputs(
                best_b, formulation=args.formulation
            )
            cost = (
                step_jit.lower(ctrl, plant, cmd, gait, dist)
                .compile()
                .cost_analysis()
            )
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            flops_per_dispatch = float(cost.get("flops", 0.0))
            bytes_per_dispatch = float(cost.get("bytes accessed", 0.0))
            gbs = bytes_per_dispatch * (best / best_b) / 1e9
            tflops = flops_per_dispatch * (best / best_b) / 1e12
            # TPU v5e peak: 197 TFLOP/s bf16 / ~98.5 f32.  The MPC step is
            # small-matrix dominated, so mfu is reported for honesty, not
            # as the optimization target (HBM + VMEM latency bound).
            mfu = tflops / 197.0
            _update(tflops=round(tflops, 3), mfu=round(mfu, 5),
                    achieved_gbs=round(gbs, 1))
            print(f"cost: {flops_per_dispatch / best_b / 1e6:.3f} MFLOP/solve, "
                  f"{tflops:.2f} TFLOP/s achieved, mfu {mfu:.4f}, "
                  f"{gbs:.0f} GB/s of 819 HBM ({gbs / 8.19:.0f}%)",
                  file=sys.stderr, flush=True)
        except Exception as e:
            print(f"cost_analysis unavailable: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)

    # ---- scan-chained headline (the production ROLLOUT shape): the
    # same walking step inside lax.scan, as run_sweep/rollout execute it
    # — isolates the relay's ~1 ms per-dispatch overhead from the
    # device-side step cost.  Chain of 8 with full step-to-step data
    # dependency (it IS the closed loop), 6 fenced dispatches. ----
    if best_b:
        try:
            KCH = 8

            def chain_steps(ctrl, plant, cmd, gait, dist):
                def body(carry, _):
                    ctrl, plant = carry
                    ctrl, plant, f = step(ctrl, plant, cmd, gait, dist)
                    return (ctrl, plant), jnp.sum(f)

                (ctrl, plant), s = jax.lax.scan(
                    body, (ctrl, plant), None, length=KCH
                )
                return ctrl, plant, jnp.sum(s)

            ch_jit = jax.jit(chain_steps)
            ctrl, plant, cmd, gait, dist = make_inputs(
                best_b, formulation=args.formulation
            )
            ctrl, plant, s = ch_jit(ctrl, plant, cmd, gait, dist)
            float(s)
            loops = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(2):
                    ctrl, plant, s = ch_jit(ctrl, plant, cmd, gait, dist)
                checksum = float(s)
                loops.append((time.perf_counter() - t0) / (2 * KCH))
            dt = float(np.median(loops))
            if np.isfinite(checksum):
                sps_ch = best_b / dt
                _update(
                    scan_chained_solves_per_s=round(sps_ch, 1),
                    scan_chained_solves_per_s_spread=sorted(
                        round(best_b / t, 1) for t in loops
                    ),
                )
                print(
                    f"scan-chained rollout shape: {sps_ch:,.0f} solves/s "
                    f"({dt * 1e3:.2f} ms/step, chain of {KCH}, loops "
                    f"[{', '.join(f'{best_b / t:,.0f}' for t in loops)}]) "
                    f"[t+{time.perf_counter() - t_start:.0f}s]",
                    file=sys.stderr, flush=True,
                )
        except Exception as e:
            print(f"scan-chain phase failed: {type(e).__name__}: {e}",
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
            # b=1 runs the stagewise fused kernel when it is the
            # headline formulation: one 128-lane chunk per step (the
            # kernel pays its lane padding once; the xla loop pays ~30
            # small dispatches per step inside the scan)
            b1_form = args.formulation if args.solver == "admm" else "condensed"
            ctrl, plant, cmd, gait, dist = make_inputs(
                1, formulation=b1_form
            )
            b1_solver = (
                ADMMConfig(iterations=args.admm_iters,
                           backend=("pallas" if b1_form == "stagewise"
                                    else "xla"),
                           formulation=b1_form)
                if args.solver == "admm" else solver
            )
            b1_step = make_step(mpc_cfg, b1_solver)

            def chain(ctrl, plant, cmd, gait, dist):
                def body(c, _):
                    ctrl, plant = c
                    ctrl, plant, f = b1_step(ctrl, plant, cmd, gait, dist)
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
                  f"budget 2 ms) [t+{time.perf_counter() - t_start:.0f}s]",
                  file=sys.stderr, flush=True)
        except Exception as e:
            print(f"p99 phase failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)

    # ---- shared helper for the secondary lines: plant-stepped walking
    # throughput with PROPER warmup + median-of-3 timing loops, plus a
    # warm KKT audit on the exact problem mpc_step assembled.
    #
    # Warmup matters (the round-3 "23.1k vs 15.9k" mystery): for the
    # first ~4 steps after init most warm K^{-1} seeds are still cold,
    # so the NS bucket's lax.cond runs its full-batch fallback branch —
    # timing from step 2 mixes that transient into the steady state
    # (measured 64 ms/step "average" vs 44 ms steady at h=16).  Six
    # warmup steps reach steady state; the median of 3 consecutive
    # timed loops is what gets published (run-to-run spread is printed).
    def walking_line(
        label: str, field: str, horizon: int, batch: int, solver_cfg,
        n_per_loop: int, kkt_prefix: str | None = None, warmup: int = 6,
        n_loops: int = 3,
    ):
        try:
            cfg_h = MPCConfig(horizon=horizon)
            formulation = getattr(solver_cfg, "formulation", "condensed")
            jit_step = jax.jit(make_step(cfg_h, solver_cfg))
            ctrl, plant, cmd, gait, dist = make_inputs(
                batch, horizon=horizon, formulation=formulation
            )
            for _ in range(warmup):
                ctrl, plant, f = jit_step(ctrl, plant, cmd, gait, dist)
            float(jnp.sum(f))
            loops = []
            for _ in range(n_loops):
                t0 = time.perf_counter()
                for _ in range(n_per_loop):
                    ctrl, plant, f = jit_step(ctrl, plant, cmd, gait, dist)
                checksum = float(jnp.sum(f))
                loops.append((time.perf_counter() - t0) / n_per_loop)
                if not np.isfinite(checksum):
                    raise RuntimeError("non-finite checksum")
            med = float(np.median(loops))
            sps = batch / med
            _update(**{
                field: round(sps, 1),
                field + "_spread": sorted(
                    round(batch / t, 1) for t in loops
                ),
            })
            spread = ", ".join(f"{t * 1e3:.1f}" for t in loops)
            print(
                f"{label}: {sps:,.0f} solves/s @ batch {batch} "
                f"(median {med * 1e3:.1f} ms/step of [{spread}]) "
                f"[t+{time.perf_counter() - t_start:.0f}s]",
                file=sys.stderr, flush=True,
            )

            if kkt_prefix is None:
                return
            from quad_periodic_mpc_tpu.ops import qp_admm as _qa
            from quad_periodic_mpc_tpu.ops import qp_stagewise as _qs

            def audit(ctrl, plant, cmd, gait, dist):
                obs = S.observe(plant)
                ctrl2 = M.setup_command(ctrl, cmd, loop_cfg)
                ctrl2, forces, qp = M.mpc_step(
                    ctrl2, obs, cmd, gait, plant.t, cfg_h, loop_cfg,
                    est_cfg, solver_cfg, return_qp=True,
                )
                lead = obs.p.shape[:-1]
                if formulation == "stagewise":
                    res = _qs.kkt_residuals(
                        qp,
                        ctrl2.warm_x.reshape(lead + (horizon, 12)),
                        ctrl2.warm_z.reshape(lead + (horizon, 20)),
                        ctrl2.warm_y.reshape(lead + (horizon, 20)),
                    )
                else:
                    res = _qa.kkt_residuals(
                        qp, ctrl2.warm_x, ctrl2.warm_z, ctrl2.warm_y
                    )
                return res

            res = jax.jit(audit)(ctrl, plant, cmd, gait, dist)
            kp = float(jnp.max(res["primal"]))
            kd = float(jnp.max(res["dual"]))
            _update(**{f"{kkt_prefix}_kkt_primal_max": round(kp, 6),
                       f"{kkt_prefix}_kkt_dual_max": round(kd, 6)})
            print(f"{label} warm KKT: primal max {kp:.2e}, dual max "
                  f"{kd:.2e} (gates 6e-3 / 1e-3)",
                  file=sys.stderr, flush=True)
        except Exception as e:
            print(f"{label} phase failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)

    # ---- long-horizon lines: h=32 and h=64 stagewise ----
    # The condensed formulation is f32-range-bound past h ~ 20 (the
    # reference hard-caps h = 19, SolverMPC.cpp:113); the lane-major
    # packed Riccati-ADMM is the long-horizon path, and h=64 is the
    # capability headline the reference cannot reach at all.
    # ---- condensed-path secondary line (the reference-shaped dense
    # formulation; stays measured for continuity with rounds 1-3 and as
    # the b=1 latency configuration) ----
    if args.solver == "admm" and args.formulation == "stagewise":
        walking_line(
            "condensed pallas-f32 (round-3 headline config)",
            "condensed_solves_per_s",
            horizon=args.horizon, batch=best_b or 2048,
            solver_cfg=ADMMConfig(iterations=args.admm_iters,
                                  backend="pallas"),
            n_per_loop=args.iters, kkt_prefix="condensed",
        )

    # ---- reference-default operating point: h=16 (ros_config.yaml:93,
    # ConvexMPCLocomotion.cpp:14), same plant-stepped methodology.
    # Runs BEFORE the long-horizon phases: a cold-process full run
    # measured the h=16 loops collapsing to 14-90k when scheduled after
    # the h=64/h=128 phases (allocator/relay churn) while the isolated
    # cold run reads a tight ~122k — phase ORDER was the round-4
    # "h=16 swing" (4 loops published with spread either way). ----
    # The h=16 line runs the STAGEWISE formulation on the fused pallas
    # kernel (ops/pallas/stagewise_kernel.py); the round-3 condensed
    # ADMM-40 recipe stays available via --h16-condensed.  Published
    # value + spread live in the bench JSON (h16_solves_per_s*).
    if not args.no_h16:
        if args.solver != "admm":
            h16_solver = solver
        elif args.h16_condensed:
            h16_solver = ADMMConfig(
                iterations=40, ns_cold_iters=14,
                ns_bucket_precision="default", ns_polish=1,
            )
        else:
            h16_solver = ADMMConfig(
                iterations=40, formulation="stagewise", backend="pallas"
            )
        walking_line(
            "h=16 end-to-end", "h16_solves_per_s",
            horizon=16, batch=1024, solver_cfg=h16_solver,
            n_per_loop=max(args.iters // 2, 5), kkt_prefix="h16",
            n_loops=4,
        )

    # ---- full-stack tier runs BEFORE the long-horizon and legacy
    # condensed/bf16 lines: on a cold compile cache the watchdog
    # budget can expire mid-run, and the composed product tier is
    # the highest-value field to have captured when it does ----
    # ---- full-stack torque tier: MPC + KinWBC/WBIC + leg torques on the
    # articulated plant (WBC_Ctrl.cpp:60-205 analog), batched ----
    if not args.no_fullstack:
        try:
            from quad_periodic_mpc_tpu.control import full_stack as FS
            from quad_periodic_mpc_tpu.models import floating_base as fb
            from quad_periodic_mpc_tpu.sim import articulated_sim as art

            fs_b = 256
            MC = fb.build_a1_constants("float32")
            P = fb.A1ModelParams()
            m_tot = P.body_mass + 4 * (
                P.abad_mass + P.hip_mass + P.knee_mass + 3 * P.rotor_mass
            )
            fs_cfg = MPCConfig(
                horizon=10, mass=float(m_tot),
                inertia_body=(0.12, 0.45, 0.42),
            )
            # production config end-to-end: the MPC tier inside the
            # composed stack runs the fused stagewise kernel too
            fs_solver = ADMMConfig(iterations=args.admm_iters,
                                   formulation="stagewise",
                                   backend="pallas")
            plant = art.init_on_ground(
                (fs_b,), penetration=3.8e-3, dtype=dtype
            )
            obs0, _, _ = FS.observe_plant(plant, MC)
            fs_ctrl = M.init_state((fs_b,), obs0, dtype=dtype)
            z0 = plant.fb.pos[..., 2]
            fs_cmd = M.Command(
                vx=jnp.full((fs_b,), 0.15, dtype),
                vy=jnp.zeros((fs_b,), dtype),
                yaw_rate=jnp.zeros((fs_b,), dtype),
                body_height=z0,
            )
            fs_gait = G.preset("trotting")

            def fs_period(plant, ctrl):
                carry, _ = FS.rollout_articulated(
                    1, plant, ctrl, fs_cmd, fs_gait, MC, mpc_cfg=fs_cfg,
                    solver=fs_solver, use_wbc=True, substeps=10,
                    wbc_backend="pallas", kin_backend="pallas",
                )
                return carry.plant, carry.ctrl

            fs_jit = jax.jit(fs_period)
            # 3 warmup periods: settle the plant's contact transient and
            # the ADMM warm carry (the round-3 359 -> 1065 periods/s
            # spread was dominated by where in the transient the timed
            # window started; VERDICT r3 weak #6)
            for _ in range(3):
                plant, fs_ctrl = fs_jit(plant, fs_ctrl)
            float(jnp.sum(plant.fb.pos))
            n = 10
            times = []
            for _ in range(n):
                t1 = time.perf_counter()
                plant, fs_ctrl = fs_jit(plant, fs_ctrl)
                float(jnp.sum(plant.fb.pos))   # per-dispatch fence
                times.append(time.perf_counter() - t1)
            checksum = float(jnp.sum(plant.fb.pos))
            if np.isfinite(checksum):
                # one "solve" = one full MPC period of the torque stack:
                # 1 MPC solve + 13 WBC (KinWBC+WBIC) ticks + 130 plant
                # substeps per instance.  MEDIAN period (not mean): the
                # published number must be stable across driver runs.
                med = float(np.median(times))
                fs_sps = fs_b / med
                tick_ms = np.asarray(times) * 1e3 / 13.0
                _update(
                    fullstack_solves_per_s=round(fs_sps, 1),
                    fullstack_solves_per_s_spread=[
                        round(fs_b / float(np.max(times)), 1),
                        round(fs_sps, 1),
                        round(fs_b / float(np.min(times)), 1),
                    ],
                    fullstack_ms_per_period_median=round(med * 1e3, 2),
                    fullstack_tick_p99_ms=round(
                        float(np.percentile(tick_ms, 99)), 4
                    ),
                )
                print(
                    f"full-stack (MPC+WBC+torques): {fs_sps:,.0f} "
                    f"periods/s @ batch {fs_b} "
                    f"(median {med * 1e3:.1f} ms/period of "
                    f"[{', '.join(f'{t*1e3:.0f}' for t in times)}], "
                    f"batched tick p99 "
                    f"{float(np.percentile(tick_ms, 99)):.2f} ms) "
                    f"[t+{time.perf_counter() - t_start:.0f}s]",
                    file=sys.stderr, flush=True,
                )

            # ---- b=1 full-stack tick latency (VERDICT r3 missing #1):
            # the reference IS a single-robot 500 Hz controller with a
            # 2 ms tick budget (be2r_cmpc_unitree.hpp:49), WBC every
            # tick (WBC_Ctrl.cpp:60-205).  Chain 2 MPC periods (26
            # ticks: 2 MPC solves + 26 WBC+torque ticks + 260 plant
            # substeps) per dispatch at b=1 and divide; p99 over 30
            # dispatches.  NOTE the measured tick INCLUDES the 10
            # articulated-plant substeps (the environment the reference
            # offloads to RaiSim); the plant-only chain below isolates
            # that share so the controller-only margin is quotable.
            b1 = 1
            plant1 = art.init_on_ground(
                (b1,), penetration=3.8e-3, dtype=dtype
            )
            obs1, _, _ = FS.observe_plant(plant1, MC)
            ctrl1 = M.init_state((b1,), obs1, dtype=dtype)
            cmd1 = M.Command(
                vx=jnp.full((b1,), 0.15, dtype),
                vy=jnp.zeros((b1,), dtype),
                yaw_rate=jnp.zeros((b1,), dtype),
                body_height=plant1.fb.pos[..., 2],
            )
            K_periods = 2

            def fs_b1_chain(plant, ctrl):
                carry, _ = FS.rollout_articulated(
                    K_periods, plant, ctrl, cmd1, fs_gait, MC,
                    mpc_cfg=fs_cfg, solver=fs_solver, use_wbc=True,
                    substeps=10, wbc_backend="pallas",
                    kin_backend="pallas",
                )
                return carry.plant, carry.ctrl

            b1_jit = jax.jit(fs_b1_chain)
            for _ in range(2):
                plant1, ctrl1 = b1_jit(plant1, ctrl1)
            float(jnp.sum(plant1.fb.pos))
            ticks = 13 * K_periods
            tlat = []
            for _ in range(30):
                t1 = time.perf_counter()
                plant1, ctrl1 = b1_jit(plant1, ctrl1)
                float(jnp.sum(plant1.fb.pos))
                tlat.append((time.perf_counter() - t1) / ticks)
            per_tick = np.asarray(tlat) * 1e3
            p50t = float(np.percentile(per_tick, 50))
            p99t = float(np.percentile(per_tick, 99))

            # plant-only STREAM chain: the production per-tick plant
            # structure (one model_cache + FK per tick, 10 step_fast
            # substeps on the tick's frozen kinematics), frozen torques
            # — the environment share / the separate plant process of
            # the reference's two-stream deployment
            # (raisim_unitree_ros_driver.cpp:309)
            tau0 = jnp.zeros((b1, 4, 3), dtype)
            cparams = art.ContactParams()

            def plant_chain(plant):
                from quad_periodic_mpc_tpu.ops.pallas import (
                    kinematics_kernel as _kk,
                    plant_kernel as _pk,
                )

                def tick(p, _):
                    _, Ainv_p, G_p, C_p, info = _kk.fused_model_eval(
                        p.fb, MC
                    )
                    p2, _ = _pk.fused_substeps(
                        p, tau0, loop_cfg.dt / 10.0, cparams,
                        (Ainv_p, G_p, C_p), info.Jc, info.p_foot, 10,
                    )
                    return p2, None

                p2, _ = jax.lax.scan(tick, plant, None, length=ticks)
                return p2
            pc_jit = jax.jit(plant_chain)
            p2 = pc_jit(plant1)
            float(jnp.sum(p2.fb.pos))
            tpl = []
            for _ in range(10):
                t1 = time.perf_counter()
                p2 = pc_jit(p2)
                float(jnp.sum(p2.fb.pos))
                tpl.append((time.perf_counter() - t1) / ticks)
            plant_ms = float(np.median(tpl)) * 1e3

            # controller-only STREAM chain (VERDICT r4 #3b): the exact
            # controller tick (estimate -> MPC/13 -> swing -> WBC ->
            # torques) with the plant state held — the stream the 2 ms
            # budget constrains (be2r_cmpc_unitree.hpp:49)
            def ctrl_stream(plant, ctrl):
                def one_period(c, _):
                    c, tau, _ = FS.controller_tick(
                        plant, c, cmd1, fs_gait, MC, True,
                        mpc_cfg=fs_cfg, solver=fs_solver,
                        wbc_backend="pallas", kin_backend="pallas",
                    )

                    def inner(cc, _):
                        cc, tau_i, _ = FS.controller_tick(
                            plant, cc, cmd1, fs_gait, MC, False,
                            mpc_cfg=fs_cfg, solver=fs_solver,
                            wbc_backend="pallas", kin_backend="pallas",
                        )
                        return cc, jnp.sum(tau_i)

                    c, s = jax.lax.scan(inner, c, None, length=12)
                    return c, jnp.sum(s) + jnp.sum(tau)

                ctrl, s = jax.lax.scan(
                    one_period, ctrl, None, length=K_periods
                )
                return ctrl, jnp.sum(s)

            cs_jit = jax.jit(ctrl_stream)
            ctrl_s = ctrl1
            for _ in range(2):
                ctrl_s, s = cs_jit(plant1, ctrl_s)
            float(s)
            tcs = []
            for _ in range(30):
                t1 = time.perf_counter()
                ctrl_s, s = cs_jit(plant1, ctrl_s)
                float(s)
                tcs.append((time.perf_counter() - t1) / ticks)
            cs_tick = np.asarray(tcs) * 1e3
            cs_p50 = float(np.percentile(cs_tick, 50))
            cs_p99 = float(np.percentile(cs_tick, 99))

            _update(
                fullstack_b1_tick_p99_ms=round(p99t, 4),
                fullstack_b1_tick_plant_ms=round(plant_ms, 4),
                fullstack_b1_plant_stream_ms=round(plant_ms, 4),
                fullstack_b1_ctrl_stream_p50_ms=round(cs_p50, 4),
                fullstack_b1_ctrl_stream_p99_ms=round(cs_p99, 4),
            )
            print(
                f"b=1 full-stack tick (MPC/13 + WBC + torque + 10 plant "
                f"substeps): p50 {p50t:.3f} ms, p99 {p99t:.3f} ms "
                f"(budget 2 ms; plant stream {plant_ms:.3f} ms/tick, "
                f"controller stream p50 {cs_p50:.3f} / p99 {cs_p99:.3f} "
                f"ms/tick measured as separate dispatch streams) "
                f"[t+{time.perf_counter() - t_start:.0f}s]",
                file=sys.stderr, flush=True,
            )
        except Exception as e:
            print(f"fullstack phase failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)

    if not args.no_longhorizon:
        # iterations=50: at the long horizons the warm carry covers a
        # smaller fraction of the constraint set — ADMM-30 measured
        # primal 9e-3 (above the gate), ADMM-50 2.2e-4 (40x under)
        lh_solver = ADMMConfig(iterations=50, formulation="stagewise",
                               backend="pallas")
        walking_line(
            "h=32 stagewise end-to-end", "h32_stagewise_solves_per_s",
            horizon=32, batch=512, solver_cfg=lh_solver,
            n_per_loop=max(args.iters // 4, 5), kkt_prefix="h32",
        )
        walking_line(
            "h=64 stagewise end-to-end", "h64_stagewise_solves_per_s",
            horizon=64, batch=256, solver_cfg=lh_solver,
            n_per_loop=max(args.iters // 4, 5), kkt_prefix="h64",
            warmup=4,
        )
        # h=128: the gains-streaming kernel (per-stage K/Quu^{-1} DMA
        # double-buffered through VMEM, fused_stagewise_solve_stream) —
        # 6.7x the reference's hard cap of h=19 (SolverMPC.cpp:113)
        walking_line(
            "h=128 stagewise end-to-end (streamed gains)",
            "h128_stagewise_solves_per_s",
            horizon=128, batch=128, solver_cfg=lh_solver,
            n_per_loop=max(args.iters // 4, 5), kkt_prefix="h128",
            warmup=4,
        )

    # ---- accuracy-gated bf16-K^{-1} pallas variant at the headline
    # batch (the throughput-first option; the headline itself runs the
    # f32-resident production default) ----
    if not args.no_pallas_audit and best_b and args.solver == "admm":
        try:
            from quad_periodic_mpc_tpu.ops import qp_admm as _qa

            pl_solver = ADMMConfig(
                iterations=args.admm_iters, backend="pallas",
                pallas_bf16_kinv=True,
            )
            pl_jit = jax.jit(make_step(mpc_cfg, pl_solver))
            ctrl, plant, cmd, gait, dist = make_inputs(best_b)
            for _ in range(6):
                ctrl, plant, f = pl_jit(ctrl, plant, cmd, gait, dist)
            float(jnp.sum(f))
            n = args.iters
            loops = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(n):
                    ctrl, plant, f = pl_jit(ctrl, plant, cmd, gait, dist)
                checksum = float(jnp.sum(f))
                loops.append(best_b * n / (time.perf_counter() - t0))
            if np.isfinite(checksum):
                sps_pl = float(np.median(loops))
                _update(
                    pallas_bf16_solves_per_s=round(sps_pl, 1),
                    pallas_bf16_solves_per_s_spread=sorted(
                        round(v, 1) for v in loops
                    ),
                )
                print(
                    f"pallas bf16-K^-1: {sps_pl:,.0f} solves/s "
                    f"@ batch {best_b} (median of "
                    f"[{', '.join(f'{v:,.0f}' for v in loops)}]) "
                    f"[t+{time.perf_counter() - t_start:.0f}s]",
                    file=sys.stderr, flush=True,
                )

            # audit the pallas production path with the same KKT hook
            def pl_audit(ctrl, plant, cmd, gait, dist):
                obs = S.observe(plant)
                ctrl = M.setup_command(ctrl, cmd, loop_cfg)
                ctrl, forces, qp = M.mpc_step(
                    ctrl, obs, cmd, gait, plant.t, mpc_cfg, loop_cfg,
                    est_cfg, pl_solver, return_qp=True,
                )
                res = _qa.kkt_residuals(
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

            pl_audit_jit = jax.jit(pl_audit)
            ctrl, plant, cmd, gait, dist = make_inputs(best_b)
            res = None
            for _ in range(6):
                ctrl, plant, res = pl_audit_jit(ctrl, plant, cmd, gait, dist)
            pkp = float(jnp.max(res["primal"]))
            pkd = float(jnp.max(res["dual"]))
            _update(pallas_bf16_kkt_primal_max=round(pkp, 6),
                    pallas_bf16_kkt_dual_max=round(pkd, 6))
            print(
                f"pallas bf16 warm-step-6 KKT: primal max {pkp:.2e}, "
                f"dual max {pkd:.2e} (gate 6e-3)",
                file=sys.stderr, flush=True,
            )
        except Exception as e:
            print(f"pallas phase failed: {type(e).__name__}: {e}",
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
