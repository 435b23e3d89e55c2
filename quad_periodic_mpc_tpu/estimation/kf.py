"""Batched 18-state / 28-measurement Kalman position-velocity estimator.

Rebuilds LinearKFPositionVelocityEstimator
(PositionVelocityEstimator.cpp:20-250):

State x = [p(3), v(3), p_foot0..3 (12)] (world frame).
Process: p' = p + dt v, v' = v + dt a_world (IMU accel + gravity), feet
static.  Measurements (28): 12 body-from-foot positions (-p_f per leg),
12 foot velocities (trust-blended), 4 foot heights.  Contact-phase trust
gating inflates Q/R by (1 + (1-trust) * 100) outside the mid-stance
trust window (PositionVelocityEstimator.cpp:180-200: trust ramps over
the first/last 0.2 of stance phase).

The per-tick 28x28 LU solve (PositionVelocityEstimator.cpp:223-226)
becomes a batched jnp.linalg.solve.  The whole estimator is a pure
(KFState, inputs) -> KFState transition, vmappable over instances.

Default noise parameters follow config/ros_config.yaml (controller_dt
0.002 tier) as used by initializeStateEstimator
(be2r_cmpc_unitree.cpp:497-517).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from quad_periodic_mpc_tpu.ops import linalg


@dataclasses.dataclass(frozen=True)
class KFParams:
    """Noise parameters (ros_config.yaml analogs)."""

    dt: float = 0.002
    process_noise_pimu: float = 0.02
    process_noise_vimu: float = 0.02
    process_noise_pfoot: float = 0.002
    sensor_noise_pimu_rel_foot: float = 0.001
    sensor_noise_vimu_rel_foot: float = 0.1
    sensor_noise_zfoot: float = 0.001
    trust_window: float = 0.2
    high_suspect_number: float = 100.0


class KFState(NamedTuple):
    xhat: jnp.ndarray   # (..., 18)
    P: jnp.ndarray      # (..., 18, 18)


def _static_matrices(params: KFParams, dtype):
    """A (18x18), B (18x3), C (28x18), Q0 (18,), R0 = I — the constant
    pieces from setup() (PositionVelocityEstimator.cpp:20-61)."""
    dt = params.dt
    A = np.eye(18)
    A[0:3, 3:6] = dt * np.eye(3)
    B = np.zeros((18, 3))
    B[3:6, :] = dt * np.eye(3)
    C = np.zeros((28, 18))
    for i in range(4):
        C[3 * i : 3 * i + 3, 0:3] = np.eye(3)          # p - p_foot rows
        C[12 + 3 * i : 15 + 3 * i, 3:6] = np.eye(3)    # v rows
    C[0:12, 6:18] = -np.eye(12)
    C[24, 8] = 1.0
    C[25, 11] = 1.0
    C[26, 14] = 1.0
    C[27, 17] = 1.0
    q0 = np.ones(18)
    q0[0:3] = (dt / 20.0) * params.process_noise_pimu
    q0[3:6] = (dt * 9.8 / 20.0) * params.process_noise_vimu
    q0[6:18] = dt * params.process_noise_pfoot
    r0 = np.ones(28)
    r0[0:12] = params.sensor_noise_pimu_rel_foot
    r0[12:24] = params.sensor_noise_vimu_rel_foot
    r0[24:28] = params.sensor_noise_zfoot
    return (
        jnp.asarray(A, dtype), jnp.asarray(B, dtype), jnp.asarray(C, dtype),
        jnp.asarray(q0, dtype), jnp.asarray(r0, dtype),
    )


def init(batch: tuple = (), dtype=jnp.float32) -> KFState:
    return KFState(
        xhat=jnp.zeros(batch + (18,), dtype),
        P=jnp.broadcast_to(100.0 * jnp.eye(18, dtype=dtype), batch + (18, 18)),
    )


def trust_from_phase(phase: jnp.ndarray, params: KFParams) -> jnp.ndarray:
    """Mid-stance trust ramp (PositionVelocityEstimator.cpp:180-195)."""
    ph = jnp.minimum(phase, 1.0)
    w = params.trust_window
    return jnp.where(
        ph < w, ph / w, jnp.where(ph > 1.0 - w, (1.0 - ph) / w, 1.0)
    )


def update(
    state: KFState,
    a_world: jnp.ndarray,        # (..., 3) IMU linear accel, world (incl. g removed upstream)
    R_body: jnp.ndarray,         # (..., 3, 3) world->body (rBody)
    omega_body: jnp.ndarray,     # (..., 3)
    p_rel: jnp.ndarray,          # (..., 4, 3) hip + leg FK, body frame
    v_rel: jnp.ndarray,          # (..., 4, 3) leg velocity, body frame
    contact_phase: jnp.ndarray,  # (..., 4)
    params: KFParams,
    backend: str = "xla",
) -> KFState:
    """One KF tick (run(), PositionVelocityEstimator.cpp:130-250).

    backend="pallas" runs the predict + innovation with the covariance
    VMEM-resident (ops/pallas/kf_kernel.py — removes the ~2 GB/tick of
    covariance-chain HBM traffic the XLA path pays at batch 2048); the
    per-leg measurement prep below is shared."""
    dtype = state.xhat.dtype
    A, B, C, q0, r0 = _static_matrices(params, dtype)

    g = jnp.asarray([0.0, 0.0, -9.81], dtype)
    a = a_world + g

    Rbod = jnp.swapaxes(R_body, -1, -2)                   # body->world
    p_f = jnp.einsum("...ij,...kj->...ki", Rbod, p_rel)   # feet rel body, world
    dp_f = jnp.einsum(
        "...ij,...kj->...ki", Rbod,
        jnp.cross(
            jnp.broadcast_to(omega_body[..., None, :], p_rel.shape), p_rel
        ) + v_rel,
    )

    trust = trust_from_phase(contact_phase, params)        # (..., 4)
    suspect = 1.0 + (1.0 - trust) * params.high_suspect_number

    # Q/R diagonals with per-leg inflation
    q_diag = jnp.broadcast_to(q0, state.xhat.shape[:-1] + (18,))
    q_feet = q0[6:18].reshape(4, 3) * suspect[..., None]
    q_diag = jnp.concatenate(
        [q_diag[..., :6], q_feet.reshape(q_feet.shape[:-2] + (12,))], axis=-1
    )
    r_diag = jnp.broadcast_to(r0, state.xhat.shape[:-1] + (28,))
    r_v = r0[12:24].reshape(4, 3) * suspect[..., None]
    r_z = r0[24:28] * suspect
    r_diag = jnp.concatenate(
        [r_diag[..., :12], r_v.reshape(r_v.shape[:-2] + (12,)), r_z], axis=-1
    )

    p0 = state.xhat[..., 0:3]
    v0 = state.xhat[..., 3:6]
    ps = (-p_f).reshape(p_f.shape[:-2] + (12,))
    vs = (
        (1.0 - trust)[..., None] * v0[..., None, :] + trust[..., None] * (-dp_f)
    ).reshape(p_f.shape[:-2] + (12,))
    pzs = (1.0 - trust) * (p0[..., 2:3] + p_f[..., 2])
    y = jnp.concatenate([ps, vs, pzs], axis=-1)

    if backend == "pallas" and dtype == jnp.float32:
        import jax

        from quad_periodic_mpc_tpu.ops.pallas import kf_kernel

        lead = state.xhat.shape[:-1]
        Bn = 1
        for d in lead:
            Bn *= d
        x_new, P_new = kf_kernel.fused_kf_innovate(
            state.xhat.reshape(Bn, 18), state.P.reshape(Bn, 18, 18),
            a.reshape(Bn, 3), y.reshape(Bn, 28),
            q_diag.reshape(Bn, 18), r_diag.reshape(Bn, 28),
            dt=float(params.dt),
            interpret=jax.default_backend() == "cpu",
        )
        return KFState(
            xhat=x_new.reshape(lead + (18,)),
            P=P_new.reshape(lead + (18, 18)),
        )

    # predict
    xhat = jnp.einsum("ij,...j->...i", A, state.xhat) + jnp.einsum(
        "ij,...j->...i", B, a
    )
    Pm = A @ state.P @ A.T + q_diag[..., :, None] * jnp.eye(18, dtype=dtype)

    # innovate
    ey = y - jnp.einsum("ij,...j->...i", C, xhat)
    S = C @ Pm @ C.T + r_diag[..., :, None] * jnp.eye(28, dtype=dtype)
    # one explicit S^{-1} (28x28 SPD, linalg.spd_inverse — exact
    # Schur-recursion GEMMs) serves both the state and covariance
    # updates; the two batched jnp.linalg.solve calls this replaces
    # were 18.5 ms of TPU LU dispatch per tick at batch 2048
    S_inv = linalg.spd_inverse(S)
    S_ey = jnp.einsum("...ij,...j->...i", S_inv, ey)
    PCt = Pm @ C.T
    xhat = xhat + jnp.einsum("...ij,...j->...i", PCt, S_ey)
    S_C = jnp.matmul(S_inv, jnp.broadcast_to(C, S.shape[:-2] + C.shape))
    P = (jnp.eye(18, dtype=dtype) - PCt @ S_C) @ Pm
    P = (P + jnp.swapaxes(P, -1, -2)) / 2.0

    # xy-covariance reset heuristic (PositionVelocityEstimator.cpp:233-239)
    det2 = P[..., 0, 0] * P[..., 1, 1] - P[..., 0, 1] * P[..., 1, 0]
    blowup = (det2 > 1e-6)[..., None, None]
    is_xy = jnp.zeros((18,), bool).at[0:2].set(True)
    cross = is_xy[:, None] ^ is_xy[None, :]    # xy<->rest cross terms
    xyblk = is_xy[:, None] & is_xy[None, :]    # 2x2 xy block
    P = jnp.where(blowup & cross, 0.0, P)
    P = jnp.where(blowup & xyblk, P / 10.0, P)

    return KFState(xhat=xhat, P=P)


def plane_body_height(p_local_stance: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Least-squares ground-plane body height + pitch
    (_getLocalBodyHeight, PositionVelocityEstimator.cpp:64-120):
    solve P k = 1 for the plane A x + B y + C z = 1 through the last
    stance footholds (body frame); height = 1/|k|, pitch = acos(A/|k|) - pi/2.
    """
    P = p_local_stance                                     # (..., 4, 3)
    G = jnp.einsum("...ki,...kj->...ij", P, P)
    b = jnp.sum(P, axis=-2)
    k = jnp.einsum("...ij,...j->...i", linalg.spd_inverse(G), b)
    norm = jnp.linalg.norm(k, axis=-1)
    z = 1.0 / jnp.maximum(norm, 1e-9)
    pitch = jnp.arccos(jnp.clip(k[..., 0] / jnp.maximum(norm, 1e-9), -1, 1)) - jnp.pi / 2
    return z, pitch
