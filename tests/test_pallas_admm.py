"""Fused-ADMM Pallas kernel vs the XLA reference iteration (interpret
mode on CPU; the TPU path is exercised by bench.py)."""

import numpy as np
import jax.numpy as jnp

from quad_periodic_mpc_tpu.config import ADMMConfig
from quad_periodic_mpc_tpu.ops import qp_admm, linalg
from quad_periodic_mpc_tpu.ops.pallas.admm_kernel import fused_admm_iterations
from quad_periodic_mpc_tpu.testing.fixtures import make_mpc_qp


def test_fused_admm_matches_xla_iteration():
    qps = [make_mpc_qp(horizon=10, seed=30 + s)[0] for s in range(3)]
    qp = qp_admm.QPData(
        P=jnp.stack([q.P for q in qps]).astype(jnp.float32),
        q=jnp.stack([q.q for q in qps]).astype(jnp.float32),
        F=qps[0].F.astype(jnp.float32),
        l=jnp.stack([q.l for q in qps]).astype(jnp.float32),
        u=jnp.minimum(jnp.stack([q.u for q in qps]), 1e6).astype(jnp.float32),
    )
    cfg = ADMMConfig(iterations=50, kkt="cholesky", refine=0, eq_mode="woodbury")
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


def test_fused_admm_bf16_single_solve_bias_bounded():
    """bf16 K^{-1} storage: single cold solve carries the ~0.4% operator
    bias — bounded, not bit-accurate."""
    qps = [make_mpc_qp(horizon=10, seed=40 + s)[0] for s in range(2)]
    qp = qp_admm.QPData(
        P=jnp.stack([q.P for q in qps]).astype(jnp.float32),
        q=jnp.stack([q.q for q in qps]).astype(jnp.float32),
        F=qps[0].F.astype(jnp.float32),
        l=jnp.stack([q.l for q in qps]).astype(jnp.float32),
        u=jnp.minimum(jnp.stack([q.u for q in qps]), 1e6).astype(jnp.float32),
    )
    cfg = ADMMConfig(iterations=50, kkt="cholesky", refine=0, eq_mode="woodbury")
    rho_vec = qp_admm.rho_vector(qp.l, qp.u, cfg)
    K = qp_admm.build_kkt(qp, rho_vec, cfg)
    K_inv = linalg.cho_inverse(
        linalg.cholesky_factor(K.astype(jnp.float64))
    ).astype(jnp.float32)
    x_ref, _ = qp_admm.solve(qp, cfg)

    B, n = qp.q.shape
    m = qp.l.shape[-1]
    x, z, y = fused_admm_iterations(
        K_inv, qp.q, qp.l, qp.u, rho_vec, qp.F,
        jnp.zeros((B, n), jnp.float32), jnp.zeros((B, m), jnp.float32),
        jnp.zeros((B, m), jnp.float32),
        iters=cfg.iterations, sigma=cfg.sigma, over_relax=cfg.over_relax,
        interpret=True, kinv_bf16=True,
    )
    scale = float(jnp.max(jnp.abs(x_ref))) + 1e-9
    rel = float(jnp.max(jnp.abs(x - x_ref))) / scale
    assert rel < 0.08, rel


def test_pallas_backend_closed_loop_tracks_like_xla():
    """ADMMConfig(backend='pallas') holds the trot loop: under the carried
    warm start the bf16 operator's fixed-point bias is re-contracted each
    MPC step, so tracking matches the f32 XLA backend."""
    from tests.test_closed_loop import run as cl_run
    import jax.numpy as jnp  # noqa: F811
    from quad_periodic_mpc_tpu.config import EstimatorConfig
    from quad_periodic_mpc_tpu.sim import srb_sim as S

    dist = S.DisturbanceParams.zero((), jnp.float64)
    _, tr_x = cl_run("trotting", 0.3, dist, EstimatorConfig(), 60,
                     solver=ADMMConfig(iterations=50))
    _, tr_p = cl_run("trotting", 0.3, dist, EstimatorConfig(), 60,
                     solver=ADMMConfig(iterations=50, backend="pallas"))
    xx = np.asarray(tr_x.x)
    xp = np.asarray(tr_p.x)
    assert abs(xp[20:, 9].mean() - 0.3) < 0.04        # tracks velocity
    assert abs(xp[-1, 5] - 0.29) < 0.02               # holds height
    # trajectory stays close to the f32 backend's
    assert np.abs(xp[20:, 9] - xx[20:, 9]).max() < 0.02
