"""Ruiz block-scalar equilibration: invariance + badly-scaled rescue."""

import numpy as np
import jax.numpy as jnp

from quad_periodic_mpc_tpu.config import ADMMConfig
from quad_periodic_mpc_tpu.ops import equilibrate as eq
from quad_periodic_mpc_tpu.ops import qp_admm

from quad_periodic_mpc_tpu.testing.fixtures import make_mpc_qp
from tests.test_qp import scipy_solve


def test_constraint_block_invariant():
    qp, _, _ = make_mpc_qp(horizon=4)
    s = eq.compute(qp)
    qps = eq.scale(qp, s)
    # the shared pyramid block is untouched by construction
    assert np.allclose(np.asarray(qps.F), np.asarray(qp.F))
    # block inf-norms of the scaled P are equalized (within Ruiz tolerance)
    n = qps.P.shape[-1]
    k = n // 3
    rn = np.max(np.sum(np.abs(np.asarray(qps.P)), -1).reshape(k, 3), -1)
    assert rn.max() / rn.min() < 10.0 * 1.01  # raw spread is >> this


def test_matches_plain_solution():
    qp, _, _ = make_mpc_qp(horizon=4)
    cfg = ADMMConfig(iterations=400, kkt="cholesky")
    x_plain, _ = qp_admm.solve(qp, cfg)
    x_eq, _ = eq.solve(qp, cfg)
    assert np.max(np.abs(np.asarray(x_eq - x_plain))) < 0.5  # N, ~1% of f_max


def test_rescues_badly_scaled_problem():
    qp, _, _ = make_mpc_qp(horizon=4)
    # corrupt the conditioning: scale alternating foot-blocks of P by 1e3
    n = qp.P.shape[-1]
    k = n // 3
    sblk = np.where(np.arange(k) % 2 == 0, np.sqrt(1e3), 1.0)
    sx = jnp.asarray(np.repeat(sblk, 3), qp.P.dtype)
    bad = qp_admm.QPData(
        P=sx[:, None] * qp.P * sx[None, :], q=sx * qp.q,
        F=qp.F, l=qp.l, u=qp.u,
    )
    x_oracle = scipy_solve(
        np.asarray(bad.P, np.float64), np.asarray(bad.q, np.float64),
        np.asarray(bad.F, np.float64), np.asarray(bad.l, np.float64),
        np.asarray(bad.u, np.float64),
    )
    cfg = ADMMConfig(iterations=200, kkt="cholesky")
    x_plain, _ = qp_admm.solve(bad, cfg)
    x_eq, _ = eq.solve(bad, cfg)
    err_plain = float(np.max(np.abs(np.asarray(x_plain) - x_oracle)))
    err_eq = float(np.max(np.abs(np.asarray(x_eq) - x_oracle)))
    assert err_eq < err_plain  # strictly better on the corrupted family
    assert err_eq < 1.0


def test_warm_start_roundtrip():
    qp, _, _ = make_mpc_qp(horizon=4)
    # eq-scaled rho pins the swing rows fast enough that a cold-100
    # solve is already at the fixed point; uniform mode (the warm-loop
    # production default) converges those rows more slowly cold, so its
    # roundtrip check below is a no-blowup bound, not a fixed-point one
    cfg = ADMMConfig(iterations=100, kkt="cholesky", eq_mode="woodbury")
    x1, st = eq.solve(qp, cfg)
    # warm state is in original coordinates; re-entry must not blow up
    x2, _ = eq.solve(qp, cfg, warm=st)
    assert np.max(np.abs(np.asarray(x2 - x1))) < 0.2

    cfg_u = ADMMConfig(iterations=100, kkt="cholesky", eq_mode="uniform")
    xu1, stu = eq.solve(qp, cfg_u)
    xu2, _ = eq.solve(qp, cfg_u, warm=stu)
    d = np.max(np.abs(np.asarray(xu2 - xu1)))
    assert np.isfinite(d) and d < 1.5  # N: continued convergence, no blowup
