"""Fused stagewise Riccati-ADMM Pallas kernel.

The XLA stagewise path (ops/qp_stagewise.py) is factorization-bound on
TPU: the associative-scan Riccati + its per-combine Newton-Schulz
inverses compile to ~10^3 tiny lane-major kernels whose HBM round-trips
and launches cost ~20-30 ms at h=16, batch 1024 — 10x above the
arithmetic.  This kernel fuses the ENTIRE solve (factorize + all ADMM
iterations) per 128-lane batch chunk with everything VMEM-resident:

- the associative scan is replaced by a SEQUENTIAL backward Riccati —
  inside one kernel there is no per-step launch or HBM cost, which was
  the only reason the O(log h) scan existed, and the sequential
  recursion runs exact f32 VPU math (better than the scan's HIGH-
  precision bf16 passes);
- per-stage gains (K, Quu^{-1}, P c) stay resident in VMEM scratch
  across all ADMM iterations;
- G = Qux' Minv never materializes: Minv is symmetric, so G = K' and
  every G matvec is a K-transpose matvec;
- each ADMM iteration is one backward costate sweep + one forward
  closed-loop rollout (sequential over stages, all VPU) + vectorized
  cone/projection updates.

Layout: instances ride the LANE axis (chunk C = 128); every block
matmul/matvec is an unrolled sum of row-broadcast multiplies over full
lanes (the 13x13 blocks are ~100x below the MXU tile, ops/qp_stagewise
layout note).  Lane-major block ops are exact f32 on the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NX = 13
NU = 12
NC = 20


def _mm(a, b, n_k):
    """Lane matmul: (r, k, C) x (k, s, C) -> (r, s, C) as k fused
    multiply-adds of (r, s, C) tiles."""
    acc = a[:, 0, :][:, None, :] * b[0][None, :, :]
    for k in range(1, n_k):
        acc = acc + a[:, k, :][:, None, :] * b[k][None, :, :]
    return acc


def _mv(a, v, n_k):
    """Lane matvec: (r, k, C) x (k, C) -> (r, C)."""
    acc = a[:, 0, :] * v[0][None, :]
    for k in range(1, n_k):
        acc = acc + a[:, k, :] * v[k][None, :]
    return acc


def _tmv(a, v, n_r):
    """Transposed lane matvec: (r, k, C) x (r, C) -> (k, C)
    (contract over the LEADING dim)."""
    acc = a[0] * v[0][None, :]
    for r in range(1, n_r):
        acc = acc + a[r] * v[r][None, :]
    return acc


def _t(a, r, c):
    """Lane transpose (r, c, C) -> (c, r, C) via stack of rows."""
    return jnp.stack([a[:, j, :] for j in range(c)], axis=0)


def _kernel(
    Ad_ref,       # (NX, NX, C)
    Bd_ref,       # (NX, NU, C)
    c_ref,        # (h, NX, C)
    x0_ref,       # (NX, C)
    xref_ref,     # (h, NX, C)
    l_ref,        # (h, NC, C)
    u_ref,        # (h, NC, C)
    U0_ref,       # (h, NU, C)
    z0_ref,       # (h, NC, C)
    y0_ref,       # (h, NC, C)
    Qm_ref,       # (NX, NX) shared diag(Q)
    Reff_ref,     # (NU, NU) shared
    A20_ref,      # (NC, NU) shared cone matrix kron(I4, F)
    U_out,        # (h, NU, C)
    z_out,        # (h, NC, C)
    y_out,        # (h, NC, C)
    K_scr,        # (h, NU, NX, C)
    Minv_scr,     # (h, NU, NU, C)
    Pc_scr,       # (h, NX, C)
    P_scr,        # (NX, NX, C)
    p_scr,        # (h, NX, C) costate p_{k+1}
    kf_scr,       # (h, NU, C) iteration scratch (r_lin, then Fu)
    *,
    h: int,
    iters: int,
    rho: float,
    over_relax: float,
    ns_it: int,
):
    C = Ad_ref.shape[-1]
    f32 = jnp.float32
    Ad = Ad_ref[:]
    Bd = Bd_ref[:]
    AdT = _t(Ad, NX, NX)
    BdT = _t(Bd, NX, NU)
    Qm = Qm_ref[:][:, :, None]                      # (NX, NX, 1) bcast
    Reff = Reff_ref[:][:, :, None]
    A20 = A20_ref[:]                                # (NC, NU)
    hp = jax.lax.Precision.HIGHEST

    # ---- factorize: sequential backward Riccati ----
    # terminal P_h = Qm
    P_scr[:] = jnp.broadcast_to(Qm, (NX, NX, C)).astype(f32)

    def backward_stage(kk, _):
        k = h - 1 - kk
        P = P_scr[:]
        BtP = _mm(BdT, P, NX)                       # (NU, NX, C)
        Quu = Reff + _mm(BtP, Bd, NX)               # (NU, NU, C)
        # Newton-Schulz SPD inverse, scalar seed I/||Quu||_inf
        absQ = jnp.abs(Quu)
        row = absQ[:, 0, :]
        for j in range(1, NU):
            row = row + absQ[:, j, :]
        norm = row[0]
        for i in range(1, NU):
            norm = jnp.maximum(norm, row[i])        # (C,)
        eyeu = jax.lax.broadcasted_iota(jnp.int32, (NU, NU), 0) == \
            jax.lax.broadcasted_iota(jnp.int32, (NU, NU), 1)
        eyeu = jnp.where(eyeu, 1.0, 0.0).astype(f32)[:, :, None]
        X = jnp.broadcast_to(eyeu, (NU, NU, C)) / norm[None, None, :]

        def ns_round(_, X):
            MX = _mm(Quu, X, NU)
            return _mm(X, 2.0 * eyeu - MX, NU)

        Minv = jax.lax.fori_loop(0, ns_it, ns_round, X)
        Qux = _mm(BtP, Ad, NX)                      # (NU, NX, C)
        K = _mm(Minv, Qux, NU)                      # (NU, NX, C)
        K_scr[k] = K
        Minv_scr[k] = Minv
        Pc_scr[k] = _mv(P, c_ref[k], NX)
        # P_k = mask_k Qm + Ad' P Ad - Qux' K  (mask_k = 0 at k = 0,
        # where P is never used — skip the masking, stage 0's P is dead)
        AtP = _mm(AdT, P, NX)
        P_new = Qm + _mm(AtP, Ad, NX) - _mm(_t(Qux, NU, NX), K, NU)
        P_new = (P_new + _t(P_new, NX, NX)) / 2.0
        P_scr[:] = P_new
        return 0

    jax.lax.fori_loop(0, h, backward_stage, 0)

    # ---- ADMM iterations ----
    a = over_relax
    rho_inv = 1.0 / rho
    A20T = A20.T

    def iteration(_, carry):
        # carries live in the out refs (U, z, y)
        # r_lin_k = A20' (rho z_k - y_k), all stages
        def stage_r(k, _):
            w = rho * z_out[k] - y_out[k]           # (NC, C)
            kf_scr[k] = jnp.dot(
                A20T, w, preferred_element_type=f32, precision=hp
            )
            return 0

        jax.lax.fori_loop(0, h, stage_r, 0)

        # backward costate: p_h = -Q xref_{h-1}; store p_{k+1} per k
        def bwd(kk, p):
            k = h - 1 - kk
            p_scr[k] = p
            # s_k = q_stage_k + Ft_k Pc_k + K_k' r_k
            # Ft_k v = Ad' v - K_k' (Bd' v)
            K = K_scr[k]
            Pc = Pc_scr[k]
            v = Pc + p
            Ftv = _mv(AdT, v, NX) - _tmv(K, _mv(BdT, v, NX)[:NU], NU)
            rk = kf_scr[k]
            s = Ftv + _tmv(K, rk, NU)
            # q_stage: -Q xref_{k-1} for k >= 1, zero at k = 0 (added
            # via the select below; xref index k-1 clamped at 0)
            km1 = jnp.maximum(k - 1, 0)
            qs = -_mv(Qm * jnp.ones((1, 1, C), f32), xref_ref[km1], NX)
            s = jnp.where(k >= 1, s + qs, s)
            return s

        qT = -_mv(Qm * jnp.ones((1, 1, C), f32), xref_ref[h - 1], NX)
        jax.lax.fori_loop(0, h, bwd, qT)

        # forward closed-loop rollout + relaxed updates
        def fwd(k, x):
            K = K_scr[k]
            rk = kf_scr[k]
            BtPp = _mv(BdT, Pc_scr[k] + p_scr[k], NX)
            kff = _mv(Minv_scr[k], BtPp - rk, NU)
            u_t = -_mv(K, x, NX) - kff              # (NU, C)
            x_new = _mv(Ad, x, NX) + _mv(Bd, u_t, NU) + c_ref[k]
            Fu_t = jnp.dot(
                A20, u_t, preferred_element_type=f32, precision=hp
            )                                        # (NC, C)
            z = z_out[k]
            y = y_out[k]
            U_out[k] = a * u_t + (1.0 - a) * U_out[k]
            Fu_r = a * Fu_t + (1.0 - a) * z
            z_new = jnp.clip(Fu_r + rho_inv * y, l_ref[k], u_ref[k])
            z_out[k] = z_new
            y_out[k] = y + rho * (Fu_r - z_new)
            return x_new

        jax.lax.fori_loop(0, h, fwd, x0_ref[:])
        return carry

    # seed carries
    def seed(k, _):
        U_out[k] = U0_ref[k]
        z_out[k] = z0_ref[k]
        y_out[k] = y0_ref[k]
        return 0

    jax.lax.fori_loop(0, h, seed, 0)
    jax.lax.fori_loop(0, iters, iteration, 0)


@functools.partial(
    jax.jit,
    static_argnames=("iters", "rho", "over_relax", "ns_it", "interpret"),
)
def fused_stagewise_solve(
    Ad: jnp.ndarray,        # (B, NX, NX)
    Bd: jnp.ndarray,        # (B, NX, NU)
    c: jnp.ndarray,         # (B, h, NX) or (B, NX)
    x0: jnp.ndarray,        # (B, NX)
    x_ref: jnp.ndarray,     # (B, h, NX)
    Q: jnp.ndarray,         # (NX,)
    R_eff: jnp.ndarray,     # (NU, NU) R + rho kron(I4, F'F)
    F: jnp.ndarray,         # (5, 3)
    l: jnp.ndarray,         # (B, h, NC)
    u: jnp.ndarray,         # (B, h, NC)
    U0: jnp.ndarray,        # (B, h, NU)
    z0: jnp.ndarray,        # (B, h, NC)
    y0: jnp.ndarray,        # (B, h, NC)
    iters: int,
    rho: float,
    over_relax: float = 1.6,
    ns_it: int = 16,
    interpret: bool = False,
):
    """Fused stagewise solve.  Returns (U, z, y), each (B, h, ...)."""
    B = x0.shape[0]
    h = x_ref.shape[1]
    C = 128
    f32 = jnp.float32

    if c.ndim == 2:
        c = jnp.broadcast_to(c[:, None, :], (B, h, NX))

    pad = (-B) % C
    if pad:
        padv = lambda t: jnp.concatenate(
            [t, jnp.repeat(t[-1:], pad, axis=0)], axis=0
        )
        Ad, Bd, c, x0, x_ref, l, u, U0, z0, y0 = map(
            padv, (Ad, Bd, c, x0, x_ref, l, u, U0, z0, y0)
        )
    Bp = x0.shape[0]
    nc = Bp // C

    def to_lanes(t):
        extra = t.shape[1:]
        return jnp.moveaxis(
            t.astype(f32).reshape((nc, C) + extra), 1, -1
        )

    Ad_t, Bd_t, c_t, x0_t, xref_t, l_t, u_t, U_t, z_t, y_t = map(
        to_lanes, (Ad, Bd, c, x0, x_ref, l, u, U0, z0, y0)
    )
    Qm = jnp.diag(Q.astype(f32))
    A20 = jnp.kron(jnp.eye(4, dtype=f32), F.astype(f32))      # (20, 12)

    kernel = functools.partial(
        _kernel, h=h, iters=iters, rho=float(rho),
        over_relax=float(over_relax), ns_it=ns_it,
    )
    scratch = [
        pltpu.VMEM((h, NU, NX, C), f32),   # K
        pltpu.VMEM((h, NU, NU, C), f32),   # Minv
        pltpu.VMEM((h, NX, C), f32),       # Pc
        pltpu.VMEM((NX, NX, C), f32),      # P carry
        pltpu.VMEM((h, NX, C), f32),       # p_{k+1}
        pltpu.VMEM((h, NU, C), f32),       # r_lin / misc
    ]

    # VMEM budget: gains + sequences + double-buffered chunk IO.  Above
    # the grid budget, fall back to a grid-less single-buffer call
    # mapped over chunks (same trick as admm_kernel).
    seq_bytes = h * (NX + 2 * NC + NU + 2 * NC + NU + NX) * C * 4
    gain_bytes = h * (NU * 16 + NU * 16 + NX) * C * 4
    single_buffer = gain_bytes + 3 * seq_bytes > 11_000_000

    out_shape_1 = [
        jax.ShapeDtypeStruct((h, NU, C), f32),
        jax.ShapeDtypeStruct((h, NC, C), f32),
        jax.ShapeDtypeStruct((h, NC, C), f32),
    ]
    if single_buffer:
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            kernel,
            in_specs=[vmem] * 13,
            out_specs=[vmem] * 3,
            out_shape=out_shape_1,
            scratch_shapes=scratch,
            interpret=interpret,
        )
        U_o, z_o, y_o = jax.lax.map(
            lambda t: call(*t, Qm, R_eff.astype(f32), A20),
            (Ad_t, Bd_t, c_t, x0_t, xref_t, l_t, u_t, U_t, z_t, y_t),
        )
    else:
        chunk = lambda *shape: pl.BlockSpec(
            (None,) + shape, lambda i: (i,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )
        shared = lambda *shape: pl.BlockSpec(
            shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM,
        )
        U_o, z_o, y_o = pl.pallas_call(
            kernel,
            grid=(nc,),
            in_specs=[
                chunk(NX, NX, C), chunk(NX, NU, C), chunk(h, NX, C),
                chunk(NX, C), chunk(h, NX, C), chunk(h, NC, C),
                chunk(h, NC, C), chunk(h, NU, C), chunk(h, NC, C),
                chunk(h, NC, C),
                shared(NX, NX), shared(NU, NU), shared(NC, NU),
            ],
            out_specs=[
                chunk(h, NU, C), chunk(h, NC, C), chunk(h, NC, C),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nc, h, NU, C), f32),
                jax.ShapeDtypeStruct((nc, h, NC, C), f32),
                jax.ShapeDtypeStruct((nc, h, NC, C), f32),
            ],
            scratch_shapes=scratch,
            interpret=interpret,
        )(Ad_t, Bd_t, c_t, x0_t, xref_t, l_t, u_t, U_t, z_t, y_t,
          Qm, R_eff.astype(f32), A20)

    def from_lanes(t, inner):
        return jnp.moveaxis(t, -1, 1).reshape((Bp,) + inner)[:B]

    return (
        from_lanes(U_o, (h, NU)),
        from_lanes(z_o, (h, NC)),
        from_lanes(y_o, (h, NC)),
    )
