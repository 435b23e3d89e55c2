"""Structure-preserving Ruiz equilibration for the condensed MPC QP.

OSQP equilibrates (P, q, A, l, u) with diagonal scalings D, E (modified
Ruiz; the reference's JCQP has no equilibration and its qpOASES path
relies on active-set pivoting instead).  General diagonal scaling would
destroy the property our solver lives on: the constraint matrix is
I_{4h} (x) F with ONE shared 5x3 block (ops/constraints.py), so every
constraint product is a small shared-matrix GEMM on the MXU.

We therefore restrict the scaling to BLOCK SCALARS: D = diag(d_k I_3),
E = diag(d_k^{-1} I_5) per foot-step block k.  Then

    E (I (x) F) D = I (x) F        (exactly invariant)

and only P, q, l, u change: P~ = D P D, q~ = D q, l~ = E l, u~ = E u,
x = D x~, y = E^{-1} y~.  Ruiz iteration on the block inf-norms of P
equalizes the cost curvature across foot-steps — the actual source of
ill-conditioning here (alpha = 4e-5 force regularization vs state
weights spanning 0.1..50 through the condensed Hessian).

The scaled problem is solved by the unmodified `qp_admm.solve`; no hot
path changes, batching/vmap/jit safe.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from quad_periodic_mpc_tpu.config import ADMMConfig
from quad_periodic_mpc_tpu.ops import qp_admm


class Scaling(NamedTuple):
    d: jnp.ndarray       # (..., k) per-block scalar
    d_x: jnp.ndarray     # (..., n) expanded to variables
    d_z: jnp.ndarray     # (..., m) expanded to constraint rows (= 1/d)


def compute(qp: qp_admm.QPData, iters: int = 3) -> Scaling:
    """Block-scalar modified Ruiz on P: d_k <- d_k / sqrt(s_k) with
    s_k the inf-norm over rows of block k of the scaled P."""
    n = qp.P.shape[-1]
    a = qp.F.shape[-1]                      # block width (3)
    c = qp.F.shape[-2]                      # rows per block (5)
    k = n // a
    batch = qp.P.shape[:-2]

    d = jnp.ones(batch + (k,), qp.P.dtype)
    for _ in range(iters):
        dx = jnp.repeat(d, a, axis=-1)
        Ps = dx[..., :, None] * qp.P * dx[..., None, :]
        rownorm = jnp.sum(jnp.abs(Ps), axis=-1)             # (..., n)
        s = jnp.max(rownorm.reshape(batch + (k, a)), -1)    # (..., k)
        d = d / jnp.sqrt(jnp.maximum(s, 1e-12))
    d_x = jnp.repeat(d, a, axis=-1)
    d_z = jnp.repeat(1.0 / d, c, axis=-1)
    return Scaling(d=d, d_x=d_x, d_z=d_z)


def scale(qp: qp_admm.QPData, s: Scaling) -> qp_admm.QPData:
    return qp_admm.QPData(
        P=s.d_x[..., :, None] * qp.P * s.d_x[..., None, :],
        q=s.d_x * qp.q,
        F=qp.F,
        l=s.d_z * qp.l,
        u=s.d_z * qp.u,
    )


def solve(
    qp: qp_admm.QPData,
    cfg: ADMMConfig,
    warm: qp_admm.ADMMState | None = None,
    ruiz_iters: int = 3,
) -> tuple[jnp.ndarray, qp_admm.ADMMState]:
    """Equilibrated ADMM solve; drop-in for qp_admm.solve.

    The returned warm state lives in the ORIGINAL coordinates (so it can
    seed either solver next step); it is re-scaled on entry.  The carried
    K^{-1} is in scaled coordinates of the *current* scaling — between
    consecutive control ticks the scaling drifts as slowly as P does, so
    the Newton-Schulz contractivity guard (ops/linalg.ns_inverse) accepts
    it warm and repairs the drift.
    """
    s = compute(qp, ruiz_iters)
    qps = scale(qp, s)
    if warm is not None:
        warm = qp_admm.ADMMState(
            x=warm.x / s.d_x,
            z=s.d_z * warm.z,
            y=warm.y / s.d_z,
            kinv=warm.kinv,
        )
    x_s, st = qp_admm.solve(qps, cfg, warm)
    x = s.d_x * x_s
    out = qp_admm.ADMMState(
        x=x, z=st.z / s.d_z, y=s.d_z * st.y, kinv=st.kinv
    )
    return x, out
