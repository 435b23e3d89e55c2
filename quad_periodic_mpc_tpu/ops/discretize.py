"""Q_d-augmented zero-order-hold discretization, closed form.

The reference discretizes by exponentiating a 31x31 augmented block matrix

    M = dt * [[A, B, Qc], [0, 0, 0], [0, 0, 0]]        (c2qp, SolverMPC.cpp:96-146)

and reading Adt / Bdt / Qdt off exp(M).  On TPU a generic expm would be a
Pade solve with LU — slow, unbatchable-friendly, and entirely unnecessary:
the SRB A matrix is nilpotent with A^3 = 0 (see models/srb.py), so

    Adt = exp(A dt)        = I + dt A + dt^2/2 A^2                (exact)
    Phi = int_0^dt exp(As) = dt I + dt^2/2 A + dt^3/6 A^2         (exact)
    Bdt = Phi @ B,  Qdt = Phi @ Qc

This is bit-for-bit the same mathematical object the reference computes
(Pade approximants are exact on nilpotent arguments; the augmented 31x31
matrix is nilpotent of index 4), implemented as three small batched
matmuls.  A generic scaling-squaring expm fallback is provided for
verification of the closed form against arbitrary (non-nilpotent) inputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import expm as _expm


def nilpotent_zoh(
    A: jnp.ndarray,
    B: jnp.ndarray,
    Qc: jnp.ndarray,
    dt: jnp.ndarray | float,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Exact ZOH discretization for A with A^3 = 0.

    Args:
      A: (..., n, n) nilpotent (index <= 3) continuous dynamics.
      B: (..., n, m) input map.
      Qc: (..., n, w) disturbance map.
      dt: scalar or batched timestep.

    Returns (Adt, Bdt, Qdt) with the same batch shape.
    """
    dtype = A.dtype
    dt = jnp.asarray(dt, dtype)
    n = A.shape[-1]
    # HIGHEST precision throughout: at default TPU matmul precision
    # (bf16 passes) the Phi @ B torque blocks carry ~1e-3 relative
    # error, which the fused-kernel audit (exact-f32 in-kernel build)
    # exposed as h-amplified dual-residual gaps at h >= 32 (round 5)
    hp = jax.lax.Precision.HIGHEST
    eye = jnp.eye(n, dtype=dtype)
    A2 = jnp.matmul(A, A, precision=hp)
    dt1 = dt[..., None, None] if dt.ndim else dt
    Adt = eye + dt1 * A + (dt1 * dt1 / 2.0) * A2
    Phi = dt1 * eye + (dt1 * dt1 / 2.0) * A + (dt1 * dt1 * dt1 / 6.0) * A2
    return (
        Adt,
        jnp.matmul(Phi, B, precision=hp),
        jnp.matmul(Phi, Qc, precision=hp),
    )


def zoh_via_expm(
    A: jnp.ndarray,
    B: jnp.ndarray,
    Qc: jnp.ndarray,
    dt: float,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Generic augmented-matrix ZOH via expm (verification path).

    Reproduces the reference's 31x31 exp([A B Q; 0]) construction
    (SolverMPC.cpp:96-107) for arbitrary A.  Not for the hot path.
    """
    n = A.shape[-1]
    m = B.shape[-1]
    w = Qc.shape[-1]
    batch = jnp.broadcast_shapes(A.shape[:-2], B.shape[:-2], Qc.shape[:-2])
    aug = jnp.zeros(batch + (n + m + w, n + m + w), A.dtype)
    aug = aug.at[..., :n, :n].set(A)
    aug = aug.at[..., :n, n : n + m].set(B)
    aug = aug.at[..., :n, n + m :].set(Qc)
    e = _expm(dt * aug)
    return (
        e[..., :n, :n],
        e[..., :n, n : n + m],
        e[..., :n, n + m :],
    )
