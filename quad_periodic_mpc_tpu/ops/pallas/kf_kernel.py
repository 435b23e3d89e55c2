"""Fused 18/28 Kalman innovation Pallas kernel.

The XLA KF update (estimation/kf.py, rebuilding
PositionVelocityEstimator.cpp:130-250) is measured genuinely HBM-bound
at batch 2048: the covariance chain (A P A', C Pm C', Pm C', the Joseph
update) materializes ~2 GB of (B, 18, 18)/(B, 28, 28) intermediates per
tick (591 GB/s, 3.41 ms — docs/PERFORMANCE.md stage table).  This
kernel runs the whole innovation with the covariance VMEM-resident per
128-lane chunk, and exploits the measurement matrix's structure so the
only real matmuls are S^{-1} and the two gain products:

- A = I + dt E (E: p<-v shift): A P A' is row/col shifted adds, not a
  matmul chain;
- C rows are selections/differences of state blocks
  (C[3i:3i+3] = x[0:3] - x_foot_i, C[12+3i] = x[3:6], 4 foot-z picks),
  so CP = C Pm and Pm C' are pure row/column combinations;
- S^{-1} (28x28 SPD) is the recursive 2x2-block Schur inverse on
  adjugate base cases (ops/pallas/wbc_kernel.py toolkit);
- P' = Pm - (Pm C') S^{-1} (C Pm) + symmetrize + the xy blow-up reset
  heuristic (PositionVelocityEstimator.cpp:233-239), all in VMEM.

The cheap per-leg input prep (trust gating, measurement assembly,
noise inflation — (B, 28)-sized elementwise) stays in XLA.
Outputs match the XLA path to f32 tolerance (tests/test_kf.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quad_periodic_mpc_tpu.ops.pallas.wbc_kernel import (
    _mm, _mv, _t, _spd_inv_rec,
)

NX = 18
NY = 28
_ZIDX = (8, 11, 14, 17)          # foot-z state indices (C rows 24..27)


def _cp_rows(Pm):
    """C @ Pm for the structured C: (NX, s, C) -> (NY, s, C) by row
    combination (no matmul)."""
    top = Pm[0:3]
    out = []
    for i in range(4):
        blk = top - Pm[6 + 3 * i:9 + 3 * i]
        out.append(blk)
    vrows = Pm[3:6]
    for i in range(4):
        out.append(vrows)
    zrows = jnp.stack([Pm[z] for z in _ZIDX], axis=0)
    out.append(zrows)
    return jnp.concatenate(out, axis=0)


def _pct_cols(Pm):
    """Pm @ C' = (C Pm')' = (C Pm)' for symmetric Pm: (NX, NY, C)."""
    return _t(_cp_rows(Pm), NY, NX)


def _kernel(
    xhat_ref,     # (NX, C)
    P_ref,        # (NX, NX, C)
    a_ref,        # (3, C) world accel + g
    y_ref,        # (NY, C) measurement vector
    qd_ref,       # (NX, C) process-noise diagonal (trust-inflated)
    rd_ref,       # (NY, C) sensor-noise diagonal (trust-inflated)
    x_out,        # (NX, C)
    P_out,        # (NX, NX, C)
    *,
    dt: float,
):
    C = xhat_ref.shape[-1]
    f32 = jnp.float32
    x = xhat_ref[:]
    P = P_ref[:]
    a = a_ref[:]
    y = y_ref[:]
    qd = qd_ref[:]
    rd = rd_ref[:]

    # ---- predict: xhat = A x + B a (A = I + dt E, B rows 3:6 = dt I)
    xp_p = x[0:3] + dt * x[3:6]
    xp_v = x[3:6] + dt * a
    xhat = jnp.concatenate([xp_p, xp_v, x[6:NX]], axis=0)

    # Pm = A P A' + diag(q): (I + dtE) P (I + dtE') expanded —
    # row block 0:3 gains dt * rows 3:6; col block 0:3 gains dt * cols
    # 3:6 (of the row-updated matrix)
    P1 = jnp.concatenate([P[0:3] + dt * P[3:6], P[3:NX]], axis=0)
    P1t = _t(P1, NX, NX)
    P2t = jnp.concatenate([P1t[0:3] + dt * P1t[3:6], P1t[3:NX]], axis=0)
    Pm = _t(P2t, NX, NX)
    # add diag(q): iota eye mask x per-lane qd (zero-size slices from a
    # concatenate-based build are rejected by Mosaic)
    iix = jax.lax.broadcasted_iota(jnp.int32, (NX, NX), 0)
    jjx = jax.lax.broadcasted_iota(jnp.int32, (NX, NX), 1)
    eye_x = jnp.where(iix == jjx, 1.0, 0.0).astype(f32)[:, :, None]
    Pm = Pm + eye_x * qd[:, None, :]

    # ---- innovation ----
    # ey = y - C xhat (structured C)
    cy = []
    for i in range(4):
        cy.append(xhat[0:3] - xhat[6 + 3 * i:9 + 3 * i])
    for i in range(4):
        cy.append(xhat[3:6])
    cy.append(jnp.stack([xhat[z] for z in _ZIDX], axis=0))
    ey = y - jnp.concatenate(cy, axis=0)                  # (NY, C)

    CP = _cp_rows(Pm)                                     # (NY, NX, C)
    PCt = _t(CP, NY, NX)                                  # (NX, NY, C)
    # S = (C Pm) C' + diag(r) = C (Pm C') — column-combine CP
    CPt = _t(CP, NY, NX)                                  # (NX, NY, C)
    S_nt = _cp_rows(CPt)                                  # (NY, NY, C) = C Pm C'
    iiy = jax.lax.broadcasted_iota(jnp.int32, (NY, NY), 0)
    jjy = jax.lax.broadcasted_iota(jnp.int32, (NY, NY), 1)
    eye_y = jnp.where(iiy == jjy, 1.0, 0.0).astype(f32)[:, :, None]
    S = S_nt + eye_y * rd[:, None, :]

    S_inv = _spd_inv_rec(S, NY)
    # one iterative-refinement step on both solves: cond(S) reaches
    # ~1e4-1e5 through the init transient (P0 = 100 I vs r ~ 1e-3) and
    # the raw f32 Schur inverse loses the digits the residual
    # correction recovers (same argument as qp_pdip._kkt_solve "spd")
    S_ey = _mv(S_inv, ey, NY)
    S_ey = S_ey + _mv(S_inv, ey - _mv(S, S_ey, NY), NY)
    xhat_new = xhat + _mv(PCt, S_ey, NY)

    M1 = _mm(S_inv, CP, NY)                               # (NY, NX, C)
    M1 = M1 + _mm(S_inv, CP - _mm(S, M1, NY), NY)
    P_new = Pm - _mm(PCt, M1, NY)                         # (NX, NX, C)
    P_new = (P_new + _t(P_new, NX, NX)) / 2.0

    # xy blow-up reset heuristic (PositionVelocityEstimator.cpp:233-239)
    det2 = P_new[0, 0] * P_new[1, 1] - P_new[0, 1] * P_new[1, 0]
    blowup = (det2 > 1e-6).astype(f32)[None, None, :]     # (1, 1, C)
    ii = jax.lax.broadcasted_iota(jnp.int32, (NX, NX), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (NX, NX), 1)
    is_xy_i = ii < 2
    is_xy_j = jj < 2
    cross = jnp.where(is_xy_i ^ is_xy_j, 1.0, 0.0).astype(f32)[:, :, None]
    xyblk = jnp.where(is_xy_i & is_xy_j, 1.0, 0.0).astype(f32)[:, :, None]
    scale = (
        1.0
        - blowup * cross                     # zero cross terms
        - blowup * xyblk * 0.9               # /10 the 2x2 xy block
    )
    P_out[:] = P_new * scale
    x_out[:] = xhat_new


@functools.partial(jax.jit, static_argnames=("dt", "interpret"))
def fused_kf_innovate(
    xhat: jnp.ndarray,       # (B, NX)
    P: jnp.ndarray,          # (B, NX, NX)
    a: jnp.ndarray,          # (B, 3)
    y: jnp.ndarray,          # (B, NY)
    q_diag: jnp.ndarray,     # (B, NX)
    r_diag: jnp.ndarray,     # (B, NY)
    dt: float,
    interpret: bool = False,
):
    """Fused predict + innovate.  Returns (xhat', P')."""
    B = xhat.shape[0]
    C = 128
    f32 = jnp.float32
    pad = (-B) % C
    args = (xhat, P, a, y, q_diag, r_diag)
    if pad:
        padv = lambda t: jnp.concatenate(
            [t, jnp.repeat(t[-1:], pad, axis=0)], axis=0
        )
        args = tuple(map(padv, args))
    Bp = args[0].shape[0]
    nc = Bp // C

    def to_lanes(t):
        extra = t.shape[1:]
        return jnp.moveaxis(t.astype(f32).reshape((nc, C) + extra), 1, -1)

    lanes = tuple(map(to_lanes, args))
    kernel = functools.partial(_kernel, dt=float(dt))
    chunk = lambda *shape: pl.BlockSpec(
        (None,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    x_o, P_o = pl.pallas_call(
        kernel,
        grid=(nc,),
        in_specs=[
            chunk(NX, C), chunk(NX, NX, C), chunk(3, C), chunk(NY, C),
            chunk(NX, C), chunk(NY, C),
        ],
        out_specs=[chunk(NX, C), chunk(NX, NX, C)],
        out_shape=[
            jax.ShapeDtypeStruct((nc, NX, C), f32),
            jax.ShapeDtypeStruct((nc, NX, NX, C), f32),
        ],
        interpret=interpret,
    )(*lanes)

    x_r = jnp.moveaxis(x_o, -1, 1).reshape(Bp, NX)[:B]
    P_r = jnp.moveaxis(P_o, -1, 1).reshape(Bp, NX, NX)[:B]
    return x_r, P_r
