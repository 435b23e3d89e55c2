"""Friction-pyramid constraint assembly.

The reference builds, per foot per horizon step, the 5x3 pyramid block
(SolverMPC.cpp:657-665; mu_inv = 1/mu):

    F = [[ mu_inv, 0, 1],
         [-mu_inv, 0, 1],
         [ 0,  mu_inv, 1],
         [ 0, -mu_inv, 1],
         [ 0,  0,      1]]

with bounds 0 <= F f <= ub, ub = [BIG, BIG, BIG, BIG, gait * f_max]
(SolverMPC.cpp:643-655).  The full constraint matrix is block-diagonal:
fmat = I_{4h} (x) F — so we never materialize it; every product with fmat
is a reshape + small matmul against F.

Swing-leg handling: the reference eliminates swing-foot variables and
their constraints from the QP (SolverMPC.cpp:859-950) to shrink the
active-set solve.  Elimination is shape-dynamic and anti-XLA; we keep the
full fixed-shape problem and rely on the bound f_z in [0, 0] which forces
the pyramid rows to pin f = 0 — provably the same solution (eliminated
variables re-enter as exact zeros at SolverMPC.cpp:973-981).
"""

from __future__ import annotations

import jax.numpy as jnp

NU_PER_FOOT = 3
NC_PER_FOOT = 5


def pyramid_block(mu, dtype=jnp.float32) -> jnp.ndarray:
    """The 5x3 friction pyramid block F (SolverMPC.cpp:657-665)."""
    mu_inv = 1.0 / jnp.asarray(mu, dtype)
    z = jnp.zeros_like(mu_inv)
    o = jnp.ones_like(mu_inv)
    return jnp.stack(
        [
            jnp.stack([mu_inv, z, o], -1),
            jnp.stack([-mu_inv, z, o], -1),
            jnp.stack([z, mu_inv, o], -1),
            jnp.stack([z, -mu_inv, o], -1),
            jnp.stack([z, z, o], -1),
        ],
        axis=-2,
    )


def bounds(
    gait_table: jnp.ndarray, f_max, big_number: float = 5e10
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(l, u) of shape (..., h, 4, 5) from the MPC contact table.

    gait_table: (..., h, 4) in {0, 1} (1 = stance).  Matches the U_b fill
    at SolverMPC.cpp:643-655 and lb = 0 at SolverMPC.cpp:846-849.
    """
    dtype = jnp.result_type(gait_table, jnp.float32)
    g = gait_table.astype(dtype)
    fm = jnp.asarray(f_max, dtype)
    if fm.ndim:                      # batched f_max: (...) -> (..., 1, 1)
        fm = fm[..., None, None]
    fz_ub = g * fm                                         # (..., h, 4)
    big = jnp.full_like(fz_ub, big_number)
    u = jnp.stack([big, big, big, big, fz_ub], axis=-1)    # (..., h, 4, 5)
    l = jnp.zeros_like(u)
    return l, u


def apply(F: jnp.ndarray, x: jnp.ndarray, precision=None) -> jnp.ndarray:
    """blockdiag(F) @ x via the block structure.

    F is (c, a) (e.g. the 5x3 MPC pyramid or the 6x3 WBIC cone); x is
    (..., k*a) -> (..., k*c).  precision: matmul precision of the tiny
    contraction — pass HIGHEST inside solver iteration loops (on TPU the
    bf16 default injects ~0.4% of |x| per product, which an ADMM fixed
    point then inherits as a standing constraint residual).
    """
    c, a = F.shape[-2], F.shape[-1]
    batch = x.shape[:-1]
    n = x.shape[-1]
    feet = x.reshape(batch + (n // a, a))
    out = jnp.einsum("ca,...ka->...kc", F, feet, precision=precision)
    return out.reshape(batch + (n // a * c,))


def apply_T(F: jnp.ndarray, y: jnp.ndarray, precision=None) -> jnp.ndarray:
    """blockdiag(F)^T @ y: (..., k*c) -> (..., k*a)."""
    c, a = F.shape[-2], F.shape[-1]
    batch = y.shape[:-1]
    m = y.shape[-1]
    rows = y.reshape(batch + (m // c, c))
    out = jnp.einsum("ca,...kc->...ka", F, rows, precision=precision)
    return out.reshape(batch + (m // c * a,))
