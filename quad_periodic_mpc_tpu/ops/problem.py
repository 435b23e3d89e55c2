"""End-to-end MPC QP assembly: robot state -> batched QPData.

This is the TPU-native equivalent of the reference's solve_mpc assembly
stage (SolverMPC.cpp:566-814): pack x0, linearize, discretize, condense,
assemble cost and friction bounds.  Everything is a pure function of
arrays + a static MPCConfig, fully batched over arbitrary leading dims.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from quad_periodic_mpc_tpu.config import MPCConfig, TunableParams
from quad_periodic_mpc_tpu.models import srb
from quad_periodic_mpc_tpu.ops import condense, constraints
from quad_periodic_mpc_tpu.ops.qp_admm import QPData
from quad_periodic_mpc_tpu.ops.rotations import quat_to_rotmat, quat_to_rpy


class RobotObs(NamedTuple):
    """Observation fed to the MPC each solve (update_data_t analog,
    convexMPC_interface.h:23-44)."""

    p: jnp.ndarray          # (..., 3) CoM position, world
    v: jnp.ndarray          # (..., 3) CoM velocity, world
    quat: jnp.ndarray       # (..., 4) orientation (w, x, y, z)
    omega: jnp.ndarray      # (..., 3) angular velocity, world
    r_feet: jnp.ndarray     # (..., 4, 3) foot pos relative to CoM, world


def build_qp(
    obs: RobotObs,
    x_ref: jnp.ndarray,
    gait_table: jnp.ndarray,
    cfg: MPCConfig,
    f_est: jnp.ndarray | None = None,
    x_drag: jnp.ndarray | float = 0.0,
    f_est_steps: jnp.ndarray | None = None,
    tunable: TunableParams | None = None,
) -> tuple[QPData, condense.Prediction, jnp.ndarray]:
    """Assemble the condensed QP.

    Args:
      obs: robot observation (batched).
      x_ref: (..., h, 13) reference trajectory (13th column zero).
      gait_table: (..., h, 4) contact flags in {0, 1}.
      f_est: (..., 6) estimated external wrench [tau; f] fed through the
        Q_d augmentation (SolverMPC.cpp:810), or None for zeros.
      x_drag: drag compensation scalar (update_x_drag).
      tunable: live-tunable overrides of cfg.weights/alpha/mu/f_max
        (traced — retune with no recompile).

    Returns (qp, prediction, x0).
    """
    h = cfg.horizon
    dtype = obs.p.dtype
    R = quat_to_rotmat(obs.quat)
    rpy = quat_to_rpy(obs.quat)
    x0 = srb.pack_state(rpy, obs.p, obs.omega, obs.v, cfg.gravity)

    I_body = jnp.asarray(cfg.inertia_body, dtype)
    A_ct, B_ct, Q_ct = srb.ct_dynamics(R, obs.r_feet, cfg.mass, I_body, x_drag)
    pred = condense.build_prediction(A_ct, B_ct, Q_ct, cfg.dt_mpc)

    t = tunable
    weights = (
        jnp.asarray(cfg.weights, dtype) if t is None
        else t.weights.astype(dtype)
    )
    alpha = cfg.alpha if t is None else t.alpha
    mu = cfg.mu if t is None else t.mu
    f_max = cfg.f_max if t is None else t.f_max
    if f_est is None:
        f_est = jnp.zeros(x0.shape[:-1] + (6,), dtype)

    P = condense.cost_hessian(pred, weights, alpha, h)
    q = condense.cost_gradient(
        pred, weights, x0, x_ref, f_est, h, f_est_steps=f_est_steps
    )

    l, u = constraints.bounds(gait_table, f_max, cfg.big_number)
    batch = l.shape[:-3]
    l = l.reshape(batch + (h * 4 * constraints.NC_PER_FOOT,))
    u = u.reshape(batch + (h * 4 * constraints.NC_PER_FOOT,))
    F = constraints.pyramid_block(mu, dtype)

    return QPData(P=P, q=q, F=F, l=l, u=u), pred, x0


def build_stagewise(
    obs: RobotObs,
    x_ref: jnp.ndarray,
    gait_table: jnp.ndarray,
    cfg: MPCConfig,
    f_est: jnp.ndarray | None = None,
    x_drag: jnp.ndarray | float = 0.0,
    f_est_steps: jnp.ndarray | None = None,
    tunable: TunableParams | None = None,
):
    """Assemble the stage-wise (non-condensed) problem — the long-horizon
    path.  Skips the O(h^2) condensation entirely: the stage quadratics
    (Q, R) equal the condensed cost exactly (qp_stagewise module doc), the
    per-step affine term carries the Q_d disturbance augmentation
    (SolverMPC.cpp:810), and the friction bounds are identical.

    Returns (StagewiseProblem, prediction, x0).
    """
    from quad_periodic_mpc_tpu.ops import qp_stagewise

    h = cfg.horizon
    dtype = obs.p.dtype
    R = quat_to_rotmat(obs.quat)
    rpy = quat_to_rpy(obs.quat)
    x0 = srb.pack_state(rpy, obs.p, obs.omega, obs.v, cfg.gravity)

    I_body = jnp.asarray(cfg.inertia_body, dtype)
    A_ct, B_ct, Q_ct = srb.ct_dynamics(R, obs.r_feet, cfg.mass, I_body, x_drag)
    pred = condense.build_prediction(A_ct, B_ct, Q_ct, cfg.dt_mpc)

    if f_est_steps is not None:
        # per-step wrench prediction: c_k = Q_d @ f_k, (..., h, 13)
        c = jnp.einsum("...nw,...hw->...hn", pred.Qdt, f_est_steps)
    else:
        if f_est is None:
            f_est = jnp.zeros(x0.shape[:-1] + (6,), dtype)
        c = jnp.einsum("...nw,...w->...n", pred.Qdt, f_est)

    t = tunable
    weights = (
        jnp.asarray(cfg.weights, dtype) if t is None
        else t.weights.astype(dtype)
    )
    alpha = cfg.alpha if t is None else t.alpha
    mu = cfg.mu if t is None else t.mu
    f_max = cfg.f_max if t is None else t.f_max
    l, u = constraints.bounds(gait_table, f_max, cfg.big_number)
    batch = l.shape[:-3]
    sw = qp_stagewise.StagewiseProblem(
        Ad=pred.Adt, Bd=pred.Bdt, c=c, x0=x0, x_ref=x_ref,
        Q=2.0 * condense.full_weight(weights),
        R=2.0 * jnp.asarray(alpha, dtype) * jnp.ones(12, dtype),
        F=constraints.pyramid_block(mu, dtype),
        l=l.reshape(batch + (h, 20)),
        u=jnp.minimum(u, 1e4).reshape(batch + (h, 20)),
    )
    return sw, pred, x0
