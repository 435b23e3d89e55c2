"""Typed configuration for the TPU convex-MPC engine.

Replaces the reference's three config tiers (static ROS yaml params,
dynamic_reconfigure, compile-time #defines — see
be2r_cmpc_unitree/config/ros_config.yaml:91-93,
config/config_a1_sim.yaml:20-38, ConvexMPCLocomotion.cpp:14-16) with a
single set of frozen dataclasses.  All fields that shape the compiled
program (horizon, iteration counts) are Python ints so configs are
hashable and usable as jit static arguments; numeric tunables are floats
that become traced constants.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Tuple


@dataclasses.dataclass(frozen=True)
class MPCConfig:
    """Dense convex-MPC problem definition.

    Mirrors problem_setup + the hardcoded weights/limits of the reference:
    - dt_mpc / horizon / mu / f_max: convexMPC_interface.h:15-21 and the
      setup_problem(dtMPC, horizon, 0.4, 120) call at
      ConvexMPCLocomotion.cpp:62.
    - weights Q: solveDenseMPC at ConvexMPCLocomotion.cpp:617.
    - alpha (force regularization): ConvexMPCLocomotion.cpp:623.
    - mass / I_body: RobotState.h:26 (m=12) and RobotState.cpp:45-49.
    """

    horizon: int = 10
    dt_mpc: float = 0.026          # dt * iterationsBetweenMPC = 0.002 * 13
    mu: float = 0.4
    f_max: float = 120.0
    mass: float = 12.0
    inertia_body: Tuple[float, float, float] = (0.07, 0.26, 0.242)
    weights: Tuple[float, ...] = (
        0.25, 0.25, 10.0, 10.0, 2.0, 50.0, 0.0, 0.0, 0.3, 0.2, 0.2, 0.1,
    )
    alpha: float = 4e-5
    gravity: float = 9.8           # x_0[12] = -9.8 (SolverMPC.cpp:592)
    big_number: float = 5e10       # BIG_NUMBER upper bound (SolverMPC.cpp:19)
    # x-drag integral gain (cmpc_x_drag dyn param, default 3,
    # ros_dynamic_params.cfg:97; used at ConvexMPCLocomotion.cpp:817)
    x_drag_gain: float = 3.0

    def __post_init__(self):
        if self.horizon < 1:
            raise ValueError("horizon must be >= 1")
        if len(self.weights) != 12:
            raise ValueError("weights must have 12 entries")


@dataclasses.dataclass(frozen=True)
class ADMMConfig:
    """Batched OSQP-style ADMM settings.

    Semantics follow the reference's JCQP solver settings
    (JCQP/QpProblem.h:16-38, defaults from config/ros_dynamic_params.cfg:102-107)
    but with a fixed iteration count: fixed-shape iteration is the
    XLA-friendly formulation (no data-dependent termination inside jit).
    """

    # rho tuned for the MPC QP family: the force-regularization alpha=4e-5
    # leaves P nearly singular in unweighted-state directions, and large
    # rho makes ADMM crawl there (the reference's JCQP default of
    # max_iter=10000, ros_dynamic_params.cfg:102-107, is the same disease).
    # rho ~ 3e-4 converges those directions in <200 iterations.
    rho: float = 3e-4
    sigma: float = 1e-6
    over_relax: float = 1.6     # alpha in OSQP notation
    iterations: int = 200
    # KKT factorization backend: "ns" = Newton-Schulz GEMM inverse
    # (MXU-native; ~9x faster than XLA's batched Cholesky at n=120) with
    # one residual-refinement GEMV per ADMM iteration; "cholesky" = exact
    # factorization (CPU / verification).
    kkt: str = "ns"
    ns_iters: int = 30
    # Adaptive NS trip count: ns_warm_iters quadratic rounds when every
    # instance carries a contractive warm K^{-1} seed, ns_iters otherwise.
    # 1 suffices: the seed-residual product doubles as a free first NS
    # round (linalg.ns_inverse), and the measured steady-trot seed
    # residual <= 0.056 (||I - X_prev K0_new||_inf over a 40-step
    # rollout, K0 drifting with yaw/foot placement) lands at ~3e-3 after
    # one quadratic round — already below the default-precision matmul
    # floor and the bf16 K^{-1} storage error (~4e-3) of the production
    # Pallas path, so further rounds are pure waste (closed-loop ADMM-30
    # warm still matches PDIP, test_closed_loop).
    ns_warm_iters: int = 1
    # HIGH-precision Newton-Schulz polish rounds after the DEFAULT loop:
    # on TPU the single-pass-bf16 NS floor is ||I - XK|| ~ 1e-2, which
    # biases the warm ADMM fixed point by ~1-2 N at force scale (the
    # kkt_primal_max ~ 2 the bench audit reports); 1 polish round squares
    # it to ~1e-4 at the cost of two 3-pass GEMMs per KKT build.  0 keeps
    # the fastest path (closed-loop validated); accuracy-first configs
    # set 1.
    ns_polish: int = 0
    # Per-iteration K-residual refinement of the x-update.  Measured
    # unnecessary at ns_tol <= 1e-2 (f32 solve error ~1 mN either way);
    # enable only for ill-conditioned custom weight sets.
    refine: int = 0
    # Iteration-loop backend: "xla" = lax.scan of batched GEMVs (HBM-bound:
    # re-reads K^{-1} every iteration); "pallas" = fused kernel with
    # K^{-1} VMEM-resident in bf16 across all iterations (1.9x faster on
    # v5e at batch 2048).  The bf16 operator leaves a ~0.4% relative bias
    # on a SINGLE cold solve; under the carried warm start the closed-loop
    # fixed point re-contracts every MPC step, leaving force errors well
    # below actuator/estimator noise (test_pallas_admm closed-loop check).
    backend: str = "xla"
    # Constraint-type-dependent rho scaling (OSQP "rho_eq" analog): rows
    # whose bounds pin z (l == u) get rho * eq_scale.
    eq_scale: float = 1e3
    # How swing-pin (l == u) rows reach the x-update KKT matrix:
    # - "uniform": plain rho everywhere — no eq bump, no correction
    #   stage.  Under the carried (x, z, y) warm start this MEASURES
    #   BETTER than the eq-scaled Woodbury path at ADMM-30 (primal max
    #   1.2e-3 vs 2.0e-3, dual 2.3e-4 vs 3.1e-4, 8-step warm trot,
    #   tools/exp_eqmode.py): the warm y rows already carry the
    #   swing-pin duals, so the stiff-rho acceleration the reference's
    #   variable elimination approximates is unnecessary, and the whole
    #   low-rank restore (~8 ms/step at batch 2048) disappears.  K's
    #   structure is gait-independent, so the warm NS seed always
    #   contracts.
    # - "woodbury": bounds-based eq-scaled rho in K, restored exactly
    #   from the uniform-rho base inverse via a low-rank Woodbury
    #   correction (round-2 production path) — faster PINNING on cold
    #   starts, worth it for one-shot solves at high iteration counts.
    # Rejected variants (measured, tools/exp_eqmode.py): eq-scaled rho
    # in the z/y updates only diverges (1000x gain mismatch vs the K
    # metric is unstable); eq-scaling the fz row of every block pins
    # stance fz too and leaves ~100 N solution error at ADMM-30.
    eq_mode: str = "uniform"
    # NS escalation policy for non-contractive warm K^{-1} seeds:
    # - "bucket": one warm round for all + a top-(B/4) cold restart of
    #   the worst seeds at fractional cost (lax.cond full-batch fallback
    #   when more than B/4 jump, e.g. the all-cold first step).  The
    #   walking workload jumps ~12.5% of instances per step
    #   (tools/probe_ns_gate.py); the old "global" policy escalated the
    #   whole batch to the cold path whenever ONE instance jumped.
    # - "global": the binary all-or-nothing gate (ns_warm_iters vs
    #   ns_iters), kept for non-flat batches and as the conservative
    #   reference.
    ns_escalate: str = "bucket"
    # Cold NS rounds in the bucket (and its fallback): cold NS reaches
    # its residual floor in 9-10 rounds on the condensed-MPC family
    # (cond(K) ~ 46, tools/exp_ns_design.py); 12 adds margin.
    ns_cold_iters: int = 12
    # Matmul precision of the bucket NS rounds: "auto" (HIGHEST from
    # n >= 168, DEFAULT below), or "default"/"high"/"highest" override.
    # "default" + ns_polish >= 1 is the cheap large-n recipe (see
    # linalg.ns_inverse_bucket).
    ns_bucket_precision: str = "auto"
    # QP formulation: "condensed" (dense 12h-var QP, the reference's
    # SolverMPC shape — fastest at h <= 16) or "stagewise" (Riccati-ADMM
    # over per-stage variables, ops/qp_stagewise.py — the long-horizon
    # path; the condensed Hessian's f32 range collapses past h ~ 20, which
    # is why the reference hard-caps h = 19, SolverMPC.cpp:113).
    formulation: str = "condensed"
    # Matmul precision of the xla iteration loop's x-update GEMVs.  On
    # TPU the f32 default routes through one bf16x bf16 pass, which
    # perturbs the ADMM fixed point by ~1 N at force scale (measured:
    # batch-2048 primal residual p50 ~1.0 at "default" vs 2e-3-level at
    # "highest" — the CPU value).  The GEMV is HBM-bound, so the extra
    # bf16 passes of "highest" are ~free; default accordingly.
    iter_precision: str = "highest"    # "default" | "high" | "highest"
    # Pallas kernel K^{-1} storage.  False (f32-resident) is the
    # production default since round 4: the bf16 operator's bias lives
    # in the WEAKLY-PENALIZED force directions (alpha = 4e-5 curvature),
    # where the KKT audit is nearly blind — measured ~4.5 N from the
    # qpOASES optimum at warm x6 (parity table "production" row) while
    # KKT primal still read 6e-4.  The f32-resident kernel measures
    # ~2.6e-3 N at ~1.3% lower throughput (driver r03: 147.6k vs
    # 149.5k).  True re-enables bf16 for throughput-first deployments
    # that accept the weak-direction bias (closed-loop tracking is
    # unaffected — those directions are weakly penalized by design).
    pallas_bf16_kinv: bool = False


@dataclasses.dataclass(frozen=True)
class PDIPConfig:
    """Primal-dual interior-point settings (high-accuracy verification mode)."""

    iterations: int = 25
    tau: float = 0.995         # fraction-to-boundary
    reg: float = 1e-9
    # Newton-step linear solver: "cholesky" (factored solve — best f32
    # constants near the barrier's cond ~1e8-1e10 endgame, the MPC-size
    # default) or "spd" (linalg.spd_inverse Schur-recursion GEMMs — no
    # tiny batched-Cholesky dispatch, the right choice for SMALL KKT
    # systems like the 12-var WBIC relaxation QP).
    kkt: str = "cholesky"
    # Barrier floor: with a FIXED iteration count the central path must not
    # collapse to exact complementarity (slacks -> 0 -> division blowup);
    # mu is held at >= mu_min.  1e-10 bounds the complementarity-induced
    # force error at ~1e-8 N — far below control tolerance.
    mu_min: float = 1e-10
    slack_floor: float = 1e-14
    # Upper bounds are clamped to this before solving: the reference's
    # BIG_NUMBER=5e10 pyramid bounds (SolverMPC.cpp:19) are never active
    # (forces are <= f_max per foot), and finite slacks keep the IPM
    # well-scaled in f32.
    big_clamp: float = 1e4


@dataclasses.dataclass(frozen=True)
class EstimatorConfig:
    """Periodic disturbance estimator settings.

    Mirrors SolverMPC.cpp: window 400 (:704), freeze after 500 samples
    (:707,:808), Gaussian blur sigmas 7 and 27 (:714-715), EMA smoothing
    0.95/0.05 (:783) and static-estimator EMA 0.97/0.03 (:798).
    """

    window: int = 400
    freeze_after: int = 500
    sigma_fast: float = 7.0
    sigma_slow: float = 27.0
    ema_smooth: float = 0.95
    ema_static: float = 0.97
    # Estimator mode:
    # - "faithful": bit-faithful to the shipped reference —
    #   band-pass + FFT-peak fit with amp = sqrt(2) std, phase = 0, and
    #   compensatory_force = est_amp + sin(2 pi f t) (SolverMPC.cpp:766,
    #   amplitude ADDED to a unit sinusoid, sic), frozen after
    #   freeze_after samples.
    # - "ls": the reference's own disabled proper estimator
    #   (SolverMPC.cpp:1106-1235, commented out): FFT frequency guess
    #   (parabolic-refined) + linear least squares on
    #   [sin(wt), cos(wt), 1] giving full (amp, phase, offset);
    #   comp = c + B sin(wt) + D cos(wt); refit every solve.
    # - "ls6": the ls fit applied independently to EVERY component of the
    #   6-wrench residual (the reference tracks only f_ext[3]) — rejects
    #   periodic disturbances in any direction including torques.
    #
    # DEFAULT = "ls" (round 5): the A/B product table
    # (tools/estimator_ab.py, docs/PERFORMANCE.md) measures "ls" at
    # 0.56x tracking error vs estimator-off at the reference's window
    # 400, while the bit-faithful shipped path measures WORSE than off
    # (1.37x — the amp + sin quirk, SolverMPC.cpp:766).  "faithful"
    # stays available as the reference-parity mode; bit-level parity
    # tests request it explicitly.
    mode: str = "ls"
    # "ls" releases compensation to the QP as soon as the window is full.
    ls_release: int = 400
    # Residual extraction: "reference" uses the continuous-time A, B in the
    # one-step residual exactly as ConvexMPCLocomotion.cpp:641-776 does
    # (dimensionally odd but faithful); "discrete" solves the proper
    # discrete residual Qd w = x_k - Ad x_prev - Bd u_prev for the
    # acceleration-space wrench w (the default, paired with mode="ls";
    # "reference" pairs with mode="faithful" for parity).
    residual: str = "discrete"
    # Predict the fitted sinusoid PER HORIZON STEP instead of holding it
    # constant (the reference applies one f_est to every step,
    # SolverMPC.cpp:810); meaningful with mode="ls".
    predictive: bool = False


@dataclasses.dataclass(frozen=True)
class GaitConfig:
    """Offset-duration gait timing (Gait.cpp OffsetDurationGait).

    offsets/durations are in MPC segments over a period of ``n_segments``
    (ConvexMPCLocomotion.cpp:41-52 builds the 12 preset gaits with
    GAIT_PERIOD=20 segments).
    """

    n_segments: int = 20
    offsets: Tuple[int, int, int, int] = (0, 10, 10, 0)        # trot
    durations: Tuple[int, int, int, int] = (10, 10, 10, 10)
    name: str = "trotting"


@dataclasses.dataclass(frozen=True)
class SwingConfig:
    """Swing trajectory + Raibert foot-placement parameters.

    - step height: ConvexMPCLocomotion.cpp:23 (#define STEP_HEIGHT 0.06)
    - p_rel_max clamp: ConvexMPCLocomotion.cpp:316
    - bonus swing: _dyn_params->cmpc_bonus_swing (ConvexMPCLocomotion.cpp:318)
    """

    step_height: float = 0.06
    p_rel_max: float = 0.3
    bonus_swing: float = 0.0
    interleave_gain: float = -0.2
    interleave_y: Tuple[float, float, float, float] = (-0.08, 0.08, 0.02, -0.02)


@dataclasses.dataclass(frozen=True)
class LoopConfig:
    """Control-loop timing (be2r_cmpc_unitree.hpp:49 MAIN_LOOP_RATE 500,
    FSM_State_Locomotion.cpp:13 ITERATIONS_BETWEEN_MPC 13)."""

    dt: float = 0.002
    iterations_between_mpc: int = 13
    # body_height dyn-param default 0.29 (ros_dynamic_params.cfg:44) — the
    # BODY_HEIGHT 0.24 #define at ConvexMPCLocomotion.cpp:24 is shadowed.
    body_height: float = 0.29
    swing_height: float = 0.09     # Swing_traj_height (ros_dynamic_params.cfg:45)
    max_pos_error: float = 0.1     # ConvexMPCLocomotion.cpp:537
    max_vel_x: float = 1.0
    max_vel_y: float = 0.6
    max_turn_rate: float = 2.0

    @property
    def dt_mpc(self) -> float:
        return self.dt * self.iterations_between_mpc


class TunableParams(NamedTuple):
    """Live-tunable runtime parameters — the dynamic_reconfigure tier.

    The reference retunes these at runtime through its reconfigure server
    (config/ros_dynamic_params.cfg delivered at
    be2r_cmpc_unitree.cpp:733-739: MPC weights/alpha, body/swing height,
    Kp/Kd tabs, x-drag).  Here they are TRACED pytree leaves passed as a
    regular jit argument: changing any value between two calls of one
    jitted program reuses the compiled executable — no recompile — while
    everything shape-affecting (horizon, iteration counts, modes) stays
    in the frozen static configs.

    Body height and leg Kp/Kd are already traced runtime inputs elsewhere
    (Command.body_height, LegCommand.kp/kd_*): this pytree covers the
    remaining tunables that were compile-time constants.

    All leaves are arrays (scalars or (12,)); they may carry leading batch
    dims for PER-INSTANCE tuning (a weight-sweep axis).
    """

    weights: Any        # (..., 12) MPC state-cost diagonal Q
    alpha: Any          # (...,) force regularization
    mu: Any             # (...,) friction coefficient
    f_max: Any          # (...,) per-foot max normal force
    x_drag_gain: Any    # (...,) cmpc_x_drag
    swing_height: Any   # (...,) Swing_traj_height
    bonus_swing: Any    # (...,) cmpc_bonus_swing
    p_rel_max: Any      # (...,) foothold clamp
    ema_smooth: Any     # (...,) estimator smoothing EMA
    ema_static: Any     # (...,) static-estimator EMA

    @staticmethod
    def from_config(
        mpc: MPCConfig = None,
        loop: LoopConfig = None,
        est: "EstimatorConfig" = None,
        swing: SwingConfig = None,
        dtype=None,
    ) -> "TunableParams":
        """Defaults pulled from the static configs."""
        import jax.numpy as jnp

        mpc = mpc or MPCConfig()
        loop = loop or LoopConfig()
        est = est or EstimatorConfig()
        swing = swing or SwingConfig()
        dtype = dtype or jnp.float32
        s = lambda v: jnp.asarray(v, dtype)
        return TunableParams(
            weights=s(mpc.weights),
            alpha=s(mpc.alpha),
            mu=s(mpc.mu),
            f_max=s(mpc.f_max),
            x_drag_gain=s(mpc.x_drag_gain),
            swing_height=s(loop.swing_height),
            bonus_swing=s(swing.bonus_swing),
            p_rel_max=s(swing.p_rel_max),
            ema_smooth=s(est.ema_smooth),
            ema_static=s(est.ema_static),
        )
