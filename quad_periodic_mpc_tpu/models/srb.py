"""Single-rigid-body (SRB) 13-state convex-MPC dynamics linearization.

State (SolverMPC.cpp:592): x = [roll, pitch, yaw, p(3), omega(3), v(3), g]
with g a constant-gravity augmentation (x[12] = -9.8, A[11,12] = 1).

Continuous-time model (ct_ss_mats, SolverMPC.cpp:260-279):

    A[0:3, 6:9] = R^T          (Euler-rate ~ R^T omega_world approximation)
    A[3,9] = A[4,10] = A[5,11] = 1
    A[11,9] = x_drag           (integral x-drag compensation)
    A[11,12] = 1               (gravity feeds vdot_z)
    B[6:9, 3b:3b+3] = I_world^{-1} [r_b]x    (torque from foot force)
    B[9:12, 3b:3b+3] = I/m

Note: despite the R_yaw name, the reference feeds the FULL body rotation
matrix here (RobotState.cpp:44 overrides R_yaw = R), and
I_world = R I_body R^T (SolverMPC.cpp:593).

Disturbance input map (the Q_d augmentation, SolverMPC.cpp:607-616):
Q_ct is 13x6 with rows 6..11 = I_6 — an external wrench
[tau(3); f(3)] enters angular/linear acceleration directly.

Key structural fact exploited throughout this package: A_ct is NILPOTENT
with A^3 = 0 (rows 6..10 and 12 are zero; chasing the sparsity gives
A^2 with only row 5 nonzero, and A^3 = 0 exactly).  Discretization and
horizon condensation therefore have exact closed forms — see
ops/discretize.py and ops/condense.py.

All functions here are batched: leading batch dims on inputs broadcast.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from quad_periodic_mpc_tpu.ops.rotations import skew

NX = 13   # state dim
NU = 12   # input dim (4 feet x 3 force components)
NW = 6    # disturbance wrench dim


def world_inertia(R: jnp.ndarray, I_body_diag: jnp.ndarray) -> jnp.ndarray:
    """I_world = R diag(I_body) R^T (SolverMPC.cpp:593)."""
    I_body = I_body_diag[..., :, None] * jnp.eye(3, dtype=R.dtype)
    return R @ I_body @ jnp.swapaxes(R, -1, -2)


def ct_dynamics(
    R: jnp.ndarray,
    r_feet: jnp.ndarray,
    mass: jnp.ndarray | float,
    I_body_diag: jnp.ndarray,
    x_drag: jnp.ndarray | float = 0.0,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Continuous-time (A, B, Qc) of the 13-state SRB model.

    Args:
      R: (..., 3, 3) body->world rotation (the reference's "R_yaw", which is
         the full R per RobotState.cpp:44).
      r_feet: (..., 4, 3) foot positions relative to the CoM, world frame
        (note: reference packs r_feet as 3x4 column-per-foot; we use
        (4, 3) row-per-foot and transpose semantics accordingly).
      mass, I_body_diag, x_drag: SRB parameters.

    Returns:
      A: (..., 13, 13), B: (..., 13, 12), Qc: (..., 13, 6).
    """
    batch = jnp.broadcast_shapes(
        R.shape[:-2], r_feet.shape[:-2], jnp.shape(jnp.asarray(x_drag))
    )
    dtype = R.dtype
    x_drag = jnp.broadcast_to(jnp.asarray(x_drag, dtype), batch)

    A = jnp.zeros(batch + (NX, NX), dtype)
    A = A.at[..., 0:3, 6:9].set(jnp.broadcast_to(jnp.swapaxes(R, -1, -2), batch + (3, 3)))
    A = A.at[..., 3, 9].set(1.0)
    A = A.at[..., 4, 10].set(1.0)
    A = A.at[..., 5, 11].set(1.0)
    A = A.at[..., 11, 9].set(x_drag)
    A = A.at[..., 11, 12].set(1.0)

    # I_world^{-1} = R diag(1/I_body) R^T analytically (I_world =
    # R diag(I_body) R^T, SolverMPC.cpp:593) — jnp.linalg.inv's tiny
    # batched LU is a TPU pathology (measured ~2 ms of the build stage
    # at batch 2048 for what is otherwise a couple of 3x3 matmuls).
    I_inv_diag = 1.0 / jnp.asarray(I_body_diag, dtype)
    hp = jax.lax.Precision.HIGHEST
    I_inv = jnp.matmul(
        R * I_inv_diag[..., None, :], jnp.swapaxes(R, -1, -2),
        precision=hp,
    )

    # Torque rows: I_world^{-1} [r_b]x per foot  (cross_mat, SolverMPC.cpp:252-257)
    # HIGHEST precision: default TPU bf16 matmul passes put ~1e-3
    # relative error into the torque blocks (round-5 fused-build audit)
    torque_blocks = jnp.matmul(
        I_inv[..., None, :, :], skew(r_feet), precision=hp
    )                                                           # (..., 4, 3, 3)
    torque_blocks = jnp.broadcast_to(torque_blocks, batch + (4, 3, 3))
    inv_m = jnp.asarray(1.0, dtype) / jnp.asarray(mass, dtype)
    force_block = inv_m * jnp.eye(3, dtype=dtype)

    B = jnp.zeros(batch + (NX, NU), dtype)
    for b in range(4):
        B = B.at[..., 6:9, 3 * b : 3 * b + 3].set(torque_blocks[..., b, :, :])
        B = B.at[..., 9:12, 3 * b : 3 * b + 3].set(
            jnp.broadcast_to(force_block, batch + (3, 3))
        )

    # Disturbance map Qc: rows 6..11 = I_6 (SolverMPC.cpp:607-616).
    Qc = jnp.zeros(batch + (NX, NW), dtype)
    Qc = Qc.at[..., 6:12, 0:6].set(jnp.eye(6, dtype=dtype))

    return A, B, Qc


def pack_state(
    rpy: jnp.ndarray,
    p: jnp.ndarray,
    omega: jnp.ndarray,
    v: jnp.ndarray,
    gravity: float = 9.8,
) -> jnp.ndarray:
    """x_0 = [rpy, p, omega_world, v_world, -g] (SolverMPC.cpp:592)."""
    g = jnp.broadcast_to(
        jnp.asarray(-gravity, rpy.dtype), rpy.shape[:-1] + (1,)
    )
    return jnp.concatenate([rpy, p, omega, v, g], axis=-1)
