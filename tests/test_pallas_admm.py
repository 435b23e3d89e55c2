"""Fused-ADMM Pallas kernel vs the XLA reference iteration (interpret
mode on CPU; the TPU path is exercised by bench.py)."""

import numpy as np
import jax.numpy as jnp

from quad_periodic_mpc_tpu.config import ADMMConfig
from quad_periodic_mpc_tpu.ops import qp_admm, linalg
from quad_periodic_mpc_tpu.ops.pallas.admm_kernel import fused_admm_iterations
from tests.test_qp import make_mpc_qp


def test_fused_admm_matches_xla_iteration():
    qps = [make_mpc_qp(horizon=10, seed=30 + s)[0] for s in range(3)]
    qp = qp_admm.QPData(
        P=jnp.stack([q.P for q in qps]).astype(jnp.float32),
        q=jnp.stack([q.q for q in qps]).astype(jnp.float32),
        F=qps[0].F.astype(jnp.float32),
        l=jnp.stack([q.l for q in qps]).astype(jnp.float32),
        u=jnp.minimum(jnp.stack([q.u for q in qps]), 1e6).astype(jnp.float32),
    )
    cfg = ADMMConfig(iterations=50, kkt="cholesky", refine=0)
    rho_vec = qp_admm.rho_vector(qp.l, qp.u, cfg)
    K = qp_admm.build_kkt(qp, rho_vec, cfg)
    K_inv = linalg.cho_inverse(linalg.cholesky_factor(K.astype(jnp.float64))).astype(jnp.float32)

    # XLA reference
    x_ref, st = qp_admm.solve(qp, cfg)

    B, n = qp.q.shape
    m = qp.l.shape[-1]
    zeros_n = jnp.zeros((B, n), jnp.float32)
    zeros_m = jnp.zeros((B, m), jnp.float32)
    x, z, y = fused_admm_iterations(
        K_inv, qp.q, qp.l, qp.u, rho_vec, qp.F,
        zeros_n, zeros_m, zeros_m,
        iters=cfg.iterations, sigma=cfg.sigma, over_relax=cfg.over_relax,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), atol=2e-3)
    np.testing.assert_allclose(np.asarray(z), np.asarray(st.z), atol=2e-3)
