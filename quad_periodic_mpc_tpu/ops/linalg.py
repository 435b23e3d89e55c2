"""Small batched linear-algebra helpers shared by the QP solvers."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def add_block_diag(K: jnp.ndarray, G: jnp.ndarray) -> jnp.ndarray:
    """K + blockdiag(G): K (..., k*b, k*b), G (..., k, b, b)."""
    batch = K.shape[:-2]
    k, b = G.shape[-3], G.shape[-1]
    Kb = K.reshape(batch + (k, b, k, b))
    idx = jnp.arange(k)
    # Two advanced indices move the k axis to the front of the result.
    Kb = Kb.at[..., idx, :, idx, :].add(jnp.moveaxis(G, -3, 0))
    return Kb.reshape(batch + (k * b, k * b))


def cholesky_factor(K: jnp.ndarray) -> jnp.ndarray:
    return jnp.linalg.cholesky(K)


def cho_solve(chol: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve K x = rhs given chol(K); rhs (..., n) or (..., n, r)."""
    vec = rhs.ndim == chol.ndim - 1
    if vec:
        rhs = rhs[..., None]
    y = jax.lax.linalg.triangular_solve(chol, rhs, left_side=True, lower=True)
    x = jax.lax.linalg.triangular_solve(
        chol, y, left_side=True, lower=True, transpose_a=True
    )
    return x[..., 0] if vec else x


def cho_inverse(chol: jnp.ndarray) -> jnp.ndarray:
    """Explicit K^{-1} from chol(K) (for GEMM-style repeated solves)."""
    n = chol.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=chol.dtype), chol.shape)
    return cho_solve(chol, eye)
