"""State-estimator container: composes orientation + position/velocity +
contact estimators into one per-tick update.

Rebuilds StateEstimatorContainer (StateEstimatorContainer.h:22-216) and
the trivial pass-through ContactEstimator (ContactEstimator.cpp:1-9):
the shared StateEstimate result struct becomes a NamedTuple; the
composable estimator list becomes one pure function (the reference's
runtime composition was fixed at init anyway,
be2r_cmpc_unitree.cpp:497-517).  The cheater path mirrors cheater_mode.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from quad_periodic_mpc_tpu.estimation import kf as kf_mod
from quad_periodic_mpc_tpu.estimation import orientation as ori_mod
from quad_periodic_mpc_tpu.models.a1 import RobotModel, A1


class StateEstimate(NamedTuple):
    """StateEstimatorContainer's result block (StateEstimatorContainer.h)."""

    position: jnp.ndarray       # (..., 3)
    v_world: jnp.ndarray        # (..., 3)
    v_body: jnp.ndarray         # (..., 3)
    quat: jnp.ndarray           # (..., 4)
    rpy: jnp.ndarray            # (..., 3)
    R: jnp.ndarray              # (..., 3, 3) body->world
    omega_body: jnp.ndarray     # (..., 3)
    omega_world: jnp.ndarray    # (..., 3)
    a_world: jnp.ndarray        # (..., 3)
    contact_phase: jnp.ndarray  # (..., 4)


class EstimatorState(NamedTuple):
    kf: kf_mod.KFState
    yaw_correction: jnp.ndarray   # (..., 4) quaternion
    initialized: jnp.ndarray      # (...,) bool


def init(batch: tuple = (), dtype=jnp.float32) -> EstimatorState:
    ident = jnp.broadcast_to(
        jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype), batch + (4,)
    )
    return EstimatorState(
        kf=kf_mod.init(batch, dtype),
        yaw_correction=ident,
        initialized=jnp.zeros(batch, bool),
    )


def update(
    state: EstimatorState,
    quat_imu: jnp.ndarray,
    gyro_body: jnp.ndarray,
    accel_body: jnp.ndarray,
    q_joints: jnp.ndarray,        # (..., 4, 3)
    qd_joints: jnp.ndarray,       # (..., 4, 3)
    contact_phase: jnp.ndarray,   # (..., 4) scheduled contact
    params: kf_mod.KFParams = kf_mod.KFParams(),
    model: RobotModel = A1,
    kf_backend: str = "xla",
) -> tuple[EstimatorState, StateEstimate]:
    """One estimation tick (StateEstimatorContainer::run,
    StateEstimatorContainer.h:112)."""
    # first-visit yaw zeroing (VectorNavOrientationEstimator)
    corr_new = ori_mod.initial_yaw_correction(quat_imu)
    corr = jnp.where(
        state.initialized[..., None], state.yaw_correction, corr_new
    )
    ori = ori_mod.run(quat_imu, gyro_body, accel_body, corr)

    from quad_periodic_mpc_tpu.control import leg_controller as lc

    legs = lc.update_data(q_joints, qd_joints, model)
    hips = jnp.asarray(model.hip_locations(), q_joints.dtype)
    p_rel = hips + legs.p
    kf_new = kf_mod.update(
        state.kf,
        a_world=ori.a_world,
        R_body=jnp.swapaxes(ori.R, -1, -2),
        omega_body=ori.omega_body,
        p_rel=p_rel,
        v_rel=legs.v,
        contact_phase=contact_phase,
        params=params,
        backend=kf_backend,
    )

    position = kf_new.xhat[..., 0:3]
    v_world = kf_new.xhat[..., 3:6]
    est = StateEstimate(
        position=position,
        v_world=v_world,
        v_body=jnp.einsum("...ji,...j->...i", ori.R, v_world),
        quat=ori.quat,
        rpy=ori.rpy,
        R=ori.R,
        omega_body=ori.omega_body,
        omega_world=ori.omega_world,
        a_world=ori.a_world,
        contact_phase=contact_phase,
    )
    return (
        EstimatorState(
            kf=kf_new, yaw_correction=corr,
            initialized=jnp.ones_like(state.initialized),
        ),
        est,
    )


def cheater(
    position, v_world, quat, omega_body, a_body, contact_phase,
) -> StateEstimate:
    """Ground-truth pass-through (CheaterOrientationEstimator +
    CheaterPositionVelocityEstimator, cheater_mode)."""
    from quad_periodic_mpc_tpu.ops.rotations import quat_to_rotmat, quat_to_rpy

    R = quat_to_rotmat(quat)
    return StateEstimate(
        position=position,
        v_world=v_world,
        v_body=jnp.einsum("...ji,...j->...i", R, v_world),
        quat=quat,
        rpy=quat_to_rpy(quat),
        R=R,
        omega_body=omega_body,
        omega_world=jnp.einsum("...ij,...j->...i", R, omega_body),
        a_world=jnp.einsum("...ij,...j->...i", R, a_body),
        contact_phase=contact_phase,
    )
