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
    # in-kernel cone products — the production default: 153.8k walking
    # solves/s at batch 2048 with KKT primal 6.4e-4 / dual 7.3e-4
    # (both ~10x under the 6e-3 gate; the headline audit phase measures
    # this exact config).  xla = HIGHEST-precision lax.scan loop, the
    # accuracy-reference (111.9k, primal 6.7e-4).  The default run also
    # measures the f32-resident pallas variant with its own KKT audit
    # (pallas_* fields) so every published number carries its gate.
    ap.add_argument("--backend", choices=["xla", "pallas"], default="pallas",
                    help="ADMM iteration-loop backend for the headline")
    ap.add_argument("--no-p99", action="store_true",
                    help="skip the b=1 on-device p99 latency phase")
    ap.add_argument("--no-longhorizon", action="store_true",
                    help="skip the h=32 stagewise second metric")
    ap.add_argument("--no-h16", action="store_true",
                    help="skip the reference-default h=16 line")
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
        ADMMConfig(iterations=args.admm_iters, backend=args.backend)
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
                ctrl = M.setup_command(ctrl, cmd, loop_cfg)
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
            # b=1 runs the XLA loop regardless of the headline backend:
            # the pallas kernel pads one instance to 128 lanes (batch-
            # throughput layout), measured ~0.10 ms/step slower here
            b1_solver = (
                ADMMConfig(iterations=args.admm_iters, backend="xla")
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
            lh_jit = jax.jit(make_step(lh_cfg, lh_solver))
            ctrl, plant, cmd, gait, dist = make_inputs(
                lh_b, horizon=lh_h, formulation="stagewise"
            )
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

    # ---- reference-default operating point: h=16 (ros_config.yaml:93,
    # ConvexMPCLocomotion.cpp:14), same plant-stepped methodology ----
    if not args.no_h16:
        try:
            h16_b = 1024
            h16_cfg = MPCConfig(horizon=16)
            # gate-passing h=16 config (tools probe, walking 1024):
            # ADMM-40 + DEFAULT-precision NS bucket + one HIGH polish
            # round measures primal ~2.0e-3 / dual ~1.4e-4 — better than
            # all-HIGHEST rounds (4.2e-3 / 2.0e-4) at equal speed (the
            # polish squares the bf16 floor once).  ADMM-30 with no
            # polish sat ABOVE the 6e-3 gate (1.4e-2).  xla loop: the
            # accuracy-reference backend at this secondary line (pallas
            # at n=192 measured slower AND dual-degraded).
            h16_solver = (
                ADMMConfig(iterations=40, ns_cold_iters=14,
                           ns_bucket_precision="default", ns_polish=1)
                if args.solver == "admm" else solver
            )
            h16_jit = jax.jit(make_step(h16_cfg, h16_solver))
            ctrl, plant, cmd, gait, dist = make_inputs(h16_b, horizon=16)
            ctrl, plant, f = h16_jit(ctrl, plant, cmd, gait, dist)
            float(jnp.sum(f))
            n = max(args.iters // 2, 5)
            t0 = time.perf_counter()
            for _ in range(n):
                ctrl, plant, f = h16_jit(ctrl, plant, cmd, gait, dist)
            checksum = float(jnp.sum(f))
            dt = time.perf_counter() - t0
            if np.isfinite(checksum):
                sps16 = h16_b * n / dt
                _update(h16_solves_per_s=round(sps16, 1))
                print(
                    f"h=16 condensed end-to-end: {sps16:,.0f} solves/s "
                    f"@ batch {h16_b} ({dt / n * 1e3:.1f} ms/step)",
                    file=sys.stderr, flush=True,
                )

            # h16 carries its own gate, like every published number
            from quad_periodic_mpc_tpu.ops import qp_admm as _qa16

            def h16_audit(ctrl, plant, cmd, gait, dist):
                obs = S.observe(plant)
                ctrl = M.setup_command(ctrl, cmd, loop_cfg)
                ctrl, forces, qp = M.mpc_step(
                    ctrl, obs, cmd, gait, plant.t, h16_cfg, loop_cfg,
                    est_cfg, h16_solver, return_qp=True,
                )
                res = _qa16.kkt_residuals(
                    qp, ctrl.warm_x, ctrl.warm_z, ctrl.warm_y
                )
                return ctrl, res

            h16a = jax.jit(h16_audit)
            ctrl, res = h16a(ctrl, plant, cmd, gait, dist)
            kp16 = float(jnp.max(res["primal"]))
            kd16 = float(jnp.max(res["dual"]))
            _update(h16_kkt_primal_max=round(kp16, 6),
                    h16_kkt_dual_max=round(kd16, 6))
            print(f"h=16 warm KKT: primal max {kp16:.2e}, dual max "
                  f"{kd16:.2e} (gates 6e-3 / 1e-3)",
                  file=sys.stderr, flush=True)
        except Exception as e:
            print(f"h16 phase failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)

    # ---- accuracy-gated pallas backend line (f32-resident K^{-1},
    # HIGHEST in-kernel cone products) at the headline batch ----
    if not args.no_pallas_audit and best_b and args.solver == "admm":
        try:
            from quad_periodic_mpc_tpu.ops import qp_admm as _qa

            pl_solver = ADMMConfig(
                iterations=args.admm_iters, backend="pallas",
                pallas_bf16_kinv=False,
            )
            pl_jit = jax.jit(make_step(mpc_cfg, pl_solver))
            ctrl, plant, cmd, gait, dist = make_inputs(best_b)
            ctrl, plant, f = pl_jit(ctrl, plant, cmd, gait, dist)
            float(jnp.sum(f))
            n = args.iters
            t0 = time.perf_counter()
            for _ in range(n):
                ctrl, plant, f = pl_jit(ctrl, plant, cmd, gait, dist)
            checksum = float(jnp.sum(f))
            dt = time.perf_counter() - t0
            if np.isfinite(checksum):
                sps_pl = best_b * n / dt
                _update(pallas_solves_per_s=round(sps_pl, 1))
                print(
                    f"pallas f32-resident: {sps_pl:,.0f} solves/s "
                    f"@ batch {best_b} ({dt / n * 1e3:.1f} ms/step)",
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
            _update(pallas_kkt_primal_max=round(pkp, 6),
                    pallas_kkt_dual_max=round(pkd, 6))
            print(
                f"pallas f32 warm-step-6 KKT: primal max {pkp:.2e}, "
                f"dual max {pkd:.2e} (gate 6e-3)",
                file=sys.stderr, flush=True,
            )
        except Exception as e:
            print(f"pallas phase failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)

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
            fs_solver = ADMMConfig(iterations=args.admm_iters)
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
                )
                return carry.plant, carry.ctrl

            fs_jit = jax.jit(fs_period)
            plant, fs_ctrl = fs_jit(plant, fs_ctrl)
            float(jnp.sum(plant.fb.pos))
            n = 10
            times = []
            t0 = time.perf_counter()
            for _ in range(n):
                t1 = time.perf_counter()
                plant, fs_ctrl = fs_jit(plant, fs_ctrl)
                float(jnp.sum(plant.fb.pos))   # per-dispatch fence
                times.append(time.perf_counter() - t1)
            dt = time.perf_counter() - t0
            checksum = float(jnp.sum(plant.fb.pos))
            if np.isfinite(checksum):
                # one "solve" = one full MPC period of the torque stack:
                # 1 MPC solve + 13 WBC (KinWBC+WBIC) ticks + 130 plant
                # substeps per instance
                fs_sps = fs_b * n / dt
                tick_ms = np.asarray(times) * 1e3 / 13.0
                _update(
                    fullstack_solves_per_s=round(fs_sps, 1),
                    fullstack_tick_p99_ms=round(
                        float(np.percentile(tick_ms, 99)), 4
                    ),
                )
                print(
                    f"full-stack (MPC+WBC+torques): {fs_sps:,.0f} "
                    f"periods/s @ batch {fs_b} "
                    f"({dt / n * 1e3:.1f} ms/period, batched tick p99 "
                    f"{float(np.percentile(tick_ms, 99)):.2f} ms)",
                    file=sys.stderr, flush=True,
                )
        except Exception as e:
            print(f"fullstack phase failed: {type(e).__name__}: {e}",
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
