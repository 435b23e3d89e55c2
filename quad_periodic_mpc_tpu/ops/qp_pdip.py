"""Batched primal-dual interior-point QP solver (high-accuracy mode).

The verification-grade counterpart to ops/qp_admm.py, playing the role of
the reference's qpOASES active-set solve (SolverMPC.cpp:955-982): where
qpOASES reaches machine-precision KKT points by pivoting (unbatchable),
this runs a fixed number of infeasible-start primal-dual Newton steps —
shape-static, fully batched — and converges to comparable accuracy in
~15-25 iterations on warm MPC problems.

Problem:  min 1/2 x^T P x + q^T x   s.t.  l <= A x <= u,
A = I_{4h} (x) F (block pyramid).  Double-sided bounds are handled with
two slack/dual pairs (sl, zl) and (su, zu):

    A x - l = sl,  u - A x = su,   sl, su, zl, zu > 0.

Newton condensation gives (P + A^T D A) dx = rhs with
D = diag(zl/sl + zu/su) — again a 3x3 block-diagonal bump on P, factored
with a batched Cholesky each iteration.

Use float64 (CPU tests / golden generation) for tight tolerances; on TPU
f32 it delivers ~1e-4 relative force accuracy, well inside control
tolerance.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from quad_periodic_mpc_tpu.config import PDIPConfig
from quad_periodic_mpc_tpu.ops import constraints as con
from quad_periodic_mpc_tpu.ops import linalg
from quad_periodic_mpc_tpu.ops.qp_admm import QPData


class PDIPState(NamedTuple):
    x: jnp.ndarray
    sl: jnp.ndarray
    su: jnp.ndarray
    zl: jnp.ndarray
    zu: jnp.ndarray


def _kkt_solve(qp: QPData, d: jnp.ndarray, rhs: jnp.ndarray, reg,
               kkt: str = "cholesky") -> jnp.ndarray:
    """(P + A^T diag(d) A + reg I) \\ rhs using the block structure."""
    n = qp.P.shape[-1]
    batch = qp.P.shape[:-2]
    k = n // qp.F.shape[-1]
    d_blocks = d.reshape(batch + (k, qp.F.shape[-2]))
    G = jnp.einsum("ca,...kc,cb->...kab", qp.F, d_blocks, qp.F)
    K = qp.P + jnp.asarray(reg, qp.P.dtype) * jnp.eye(n, dtype=qp.P.dtype)
    K = linalg.add_block_diag(K, G)
    if kkt == "spd":
        # One step of iterative refinement on the explicit-inverse solve
        # (ADVICE r3): near the barrier endgame cond(K) reaches
        # ~1e8-1e10 and the f32 Schur-recursion inverse loses digits
        # that Cholesky's back-substitution keeps; the residual
        # correction r = rhs - K dx recovers them at the cost of two
        # GEMVs (HIGHEST precision — the residual is a cancellation).
        hp = jax.lax.Precision.HIGHEST
        Mi = linalg.spd_inverse(K)
        dx = jnp.einsum("...ij,...j->...i", Mi, rhs, precision=hp)
        r = rhs - jnp.einsum("...ij,...j->...i", K, dx, precision=hp)
        return dx + jnp.einsum("...ij,...j->...i", Mi, r, precision=hp)
    return linalg.cho_solve(linalg.cholesky_factor(K), rhs)


def _max_step(v: jnp.ndarray, dv: jnp.ndarray, tau) -> jnp.ndarray:
    """Largest alpha in (0, 1] with v + alpha dv >= (1 - tau) v."""
    ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
    a = jnp.min(ratio, axis=-1)
    return jnp.minimum(1.0, tau * a)


def solve(qp: QPData, cfg: PDIPConfig) -> tuple[jnp.ndarray, PDIPState]:
    """Fixed-iteration infeasible primal-dual IPM; returns (x, state)."""
    dtype = qp.P.dtype
    batch = qp.q.shape[:-1]
    n = qp.q.shape[-1]
    m = qp.l.shape[-1]
    # Keep never-active "infinite" bounds finite so slacks stay well-scaled,
    # and open degenerate l == u rows (swing-foot fz in [0, 0]) by a hair so
    # a strictly interior central path exists.
    u_eff = jnp.minimum(qp.u, jnp.asarray(cfg.big_clamp, dtype))
    u_eff = jnp.where(u_eff - qp.l < 1e-6, qp.l + 1e-6, u_eff)
    qp = qp._replace(u=u_eff)

    x = jnp.zeros(batch + (n,), dtype)
    one = jnp.ones(batch + (m,), dtype)
    state = PDIPState(x=x, sl=one, su=one, zl=one, zu=one)

    floor = jnp.asarray(cfg.slack_floor, dtype)
    mu_min = jnp.asarray(cfg.mu_min, dtype)

    def step(state: PDIPState, _):
        x, sl, su, zl, zu = state
        sl = jnp.maximum(sl, floor)
        su = jnp.maximum(su, floor)
        zl = jnp.maximum(zl, floor)
        zu = jnp.maximum(zu, floor)
        ax = con.apply(qp.F, x)

        r_dual = (
            jnp.einsum("...nm,...m->...n", qp.P, x)
            + qp.q
            - con.apply_T(qp.F, zl - zu)
        )
        r_pl = sl - (ax - qp.l)
        r_pu = su - (qp.u - ax)
        mu = (jnp.sum(sl * zl, -1) + jnp.sum(su * zu, -1)) / (2 * m)
        mu_target = jnp.maximum(0.1 * mu, mu_min)
        r_cl = sl * zl - mu_target[..., None]
        r_cu = su * zu - mu_target[..., None]

        d = zl / sl + zu / su
        rhs = (
            -r_dual
            - con.apply_T(qp.F, (r_cl - zl * r_pl) / sl)
            + con.apply_T(qp.F, (r_cu - zu * r_pu) / su)
        )
        dx = _kkt_solve(qp, d, rhs, cfg.reg, cfg.kkt)

        adx = con.apply(qp.F, dx)
        dsl = adx - r_pl
        dsu = -adx - r_pu
        dzl = -(r_cl + zl * dsl) / sl
        dzu = -(r_cu + zu * dsu) / su

        tau = jnp.asarray(cfg.tau, dtype)
        a = jnp.minimum(
            jnp.minimum(_max_step(sl, dsl, tau), _max_step(su, dsu, tau)),
            jnp.minimum(_max_step(zl, dzl, tau), _max_step(zu, dzu, tau)),
        )[..., None]
        # Late-path NaN freeze: with the f64-tuned mu_min = 1e-10 the
        # f32 Cholesky of P + A^T D A (cond ~ max(d) ~ 1e8-1e10 near
        # exact complementarity) can emit a non-finite Newton step AFTER
        # the iterate has converged (reproduced at h=4/seed 0: NaN at
        # iter 20, x stable from iter 15).  Freeze that instance at its
        # current iterate instead of poisoning it; healthy instances in
        # the batch are unaffected, and accuracy of the frozen one is
        # whatever the path already reached (measured <= 2e-3 N).
        finite = (
            jnp.all(jnp.isfinite(dx), axis=-1)
            & jnp.all(jnp.isfinite(dsl), axis=-1)
            & jnp.all(jnp.isfinite(dsu), axis=-1)
            & jnp.all(jnp.isfinite(dzl), axis=-1)
            & jnp.all(jnp.isfinite(dzu), axis=-1)
        )[..., None]
        a = jnp.where(finite, a, 0.0)
        dx = jnp.where(finite, dx, 0.0)
        dsl = jnp.where(finite, dsl, 0.0)
        dsu = jnp.where(finite, dsu, 0.0)
        dzl = jnp.where(finite, dzl, 0.0)
        dzu = jnp.where(finite, dzu, 0.0)

        return (
            PDIPState(
                x=x + a * dx,
                sl=sl + a * dsl,
                su=su + a * dsu,
                zl=zl + a * dzl,
                zu=zu + a * dzu,
            ),
            None,
        )

    final, _ = jax.lax.scan(step, state, None, length=cfg.iterations)
    return final.x, final
