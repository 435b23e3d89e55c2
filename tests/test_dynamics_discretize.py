"""Golden-value tests: SRB dynamics, ZOH discretization, condensation.

Oracle = independent NumPy re-derivation of the reference math
(SolverMPC.cpp:96-146, 260-279) using generic dense routines (expm via
scipy-free scaling-squaring, explicit power loops), checked against the
closed-form nilpotent fast paths.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from quad_periodic_mpc_tpu.config import MPCConfig
from quad_periodic_mpc_tpu.models import srb
from quad_periodic_mpc_tpu.ops import condense, discretize
from quad_periodic_mpc_tpu.ops.rotations import (
    quat_to_rotmat,
    quat_to_rpy,
    rpy_to_quat,
    rpy_to_rotmat,
)

RNG = np.random.default_rng(0)


def np_expm(M, order=30):
    """Scaling-squaring Taylor expm (float64 oracle)."""
    n = M.shape[0]
    s = max(0, int(np.ceil(np.log2(max(1e-16, np.linalg.norm(M, 1))))) + 1)
    A = M / (2.0 ** s)
    out = np.eye(n)
    term = np.eye(n)
    for k in range(1, order):
        term = term @ A / k
        out = out + term
    for _ in range(s):
        out = out @ out
    return out


def random_obs(batch=()):
    rpy = RNG.uniform(-0.3, 0.3, batch + (3,))
    quat = np.asarray(rpy_to_quat(jnp.asarray(rpy)))
    r_feet = RNG.uniform(-0.3, 0.3, batch + (4, 3))
    return rpy, quat, r_feet


def test_rotation_roundtrip():
    rpy, quat, _ = random_obs((16,))
    R = rpy_to_rotmat(jnp.asarray(rpy))
    np.testing.assert_allclose(
        np.asarray(quat_to_rotmat(jnp.asarray(quat))), np.asarray(R), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(quat_to_rpy(jnp.asarray(quat))), rpy, atol=1e-12
    )


def test_a_matrix_nilpotent():
    """The structural fact everything rests on: A_ct^3 == 0 exactly."""
    _, quat, r_feet = random_obs()
    R = quat_to_rotmat(jnp.asarray(quat))
    A, _, _ = srb.ct_dynamics(
        R, jnp.asarray(r_feet), 12.0, jnp.asarray([0.07, 0.26, 0.242]),
        x_drag=0.37,
    )
    A = np.asarray(A)
    assert np.all(A @ A @ A == 0.0)
    assert np.any(A @ A != 0.0)  # index exactly 3, not lower


def test_ct_dynamics_against_manual():
    """B blocks: I_w^{-1} [r]x and I/m (SolverMPC.cpp:260-279)."""
    _, quat, r_feet = random_obs()
    R = np.asarray(quat_to_rotmat(jnp.asarray(quat)))
    I_body = np.diag([0.07, 0.26, 0.242])
    I_w = R @ I_body @ R.T
    I_inv = np.linalg.inv(I_w)
    A, B, Qc = srb.ct_dynamics(
        jnp.asarray(R), jnp.asarray(r_feet), 12.0,
        jnp.asarray([0.07, 0.26, 0.242]),
    )
    A, B, Qc = np.asarray(A), np.asarray(B), np.asarray(Qc)
    for b in range(4):
        r = r_feet[b]
        cm = np.array([[0, -r[2], r[1]], [r[2], 0, -r[0]], [-r[1], r[0], 0]])
        np.testing.assert_allclose(B[6:9, 3 * b : 3 * b + 3], I_inv @ cm, atol=1e-12)
        np.testing.assert_allclose(
            B[9:12, 3 * b : 3 * b + 3], np.eye(3) / 12.0, atol=1e-12
        )
    np.testing.assert_allclose(A[0:3, 6:9], R.T, atol=1e-12)
    assert A[3, 9] == 1 and A[4, 10] == 1 and A[5, 11] == 1 and A[11, 12] == 1
    np.testing.assert_allclose(Qc[6:12, :], np.eye(6), atol=1e-15)


def test_nilpotent_zoh_matches_expm():
    """Closed-form ZOH == the reference's 31x31 augmented expm
    (c2qp, SolverMPC.cpp:96-107)."""
    _, quat, r_feet = random_obs()
    R = quat_to_rotmat(jnp.asarray(quat))
    A, B, Qc = srb.ct_dynamics(
        R, jnp.asarray(r_feet), 12.0, jnp.asarray([0.07, 0.26, 0.242]),
        x_drag=0.15,
    )
    dt = 0.026
    Adt, Bdt, Qdt = discretize.nilpotent_zoh(A, B, Qc, dt)

    aug = np.zeros((31, 31))
    aug[:13, :13] = np.asarray(A)
    aug[:13, 13:25] = np.asarray(B)
    aug[:13, 25:] = np.asarray(Qc)
    e = np_expm(dt * aug)
    np.testing.assert_allclose(np.asarray(Adt), e[:13, :13], atol=1e-12)
    np.testing.assert_allclose(np.asarray(Bdt), e[:13, 13:25], atol=1e-12)
    np.testing.assert_allclose(np.asarray(Qdt), e[:13, 25:], atol=1e-12)

    # and the jax generic-expm path agrees too
    Adt2, Bdt2, Qdt2 = discretize.zoh_via_expm(A, B, Qc, dt)
    np.testing.assert_allclose(np.asarray(Adt2), np.asarray(Adt), atol=1e-9)
    np.testing.assert_allclose(np.asarray(Bdt2), np.asarray(Bdt), atol=1e-9)
    np.testing.assert_allclose(np.asarray(Qdt2), np.asarray(Qdt), atol=1e-9)


@pytest.mark.parametrize("horizon", [1, 5, 10, 16, 19])
def test_condensation_matches_power_iteration(horizon):
    """Closed-form coefficient condensation == the reference's sequential
    powerMats recurrence (SolverMPC.cpp:118-139)."""
    _, quat, r_feet = random_obs()
    R = quat_to_rotmat(jnp.asarray(quat))
    A, B, Qc = srb.ct_dynamics(
        R, jnp.asarray(r_feet), 12.0, jnp.asarray([0.07, 0.26, 0.242]),
        x_drag=0.02,
    )
    dt = 0.026
    pred = condense.build_prediction(A, B, Qc, dt)
    Adt, Bdt, Qdt = map(np.asarray, (pred.Adt, pred.Bdt, pred.Qdt))

    # oracle: literal power-iteration condensation
    powers = [np.eye(13)]
    for i in range(horizon):
        powers.append(Adt @ powers[-1])
    A_qp = np.zeros((13 * horizon, 13))
    B_qp = np.zeros((13 * horizon, 12 * horizon))
    Q_qp = np.zeros((13 * horizon, 6))
    for r in range(horizon):
        A_qp[13 * r : 13 * r + 13] = powers[r + 1]
        for c in range(horizon):
            if r >= c:
                B_qp[13 * r : 13 * r + 13, 12 * c : 12 * c + 12] = (
                    powers[r - c] @ Bdt
                )
                Q_qp[13 * r : 13 * r + 13] += powers[r - c] @ Qdt

    np.testing.assert_allclose(
        np.asarray(condense.materialize_A_qp(pred, horizon)), A_qp, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(condense.materialize_B_qp(pred, horizon)), B_qp, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(condense.materialize_Q_qp(pred, horizon)), Q_qp, atol=1e-10
    )

    # implicit responses match the dense products
    x0 = RNG.uniform(-1, 1, (13,))
    f = RNG.uniform(-1, 1, (6,))
    np.testing.assert_allclose(
        np.asarray(condense.state_response(pred, jnp.asarray(x0), horizon)).ravel(),
        A_qp @ x0,
        atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(
            condense.disturbance_response(pred, jnp.asarray(f), horizon)
        ).ravel(),
        Q_qp @ f,
        atol=1e-10,
    )


@pytest.mark.parametrize("horizon", [4, 10])
def test_cost_structured_vs_naive(horizon):
    """Kronecker-factored qH/qg == materialized B_qp^T S B_qp assembly
    (SolverMPC.cpp:806-814)."""
    cfg = MPCConfig(horizon=horizon)
    _, quat, r_feet = random_obs()
    R = quat_to_rotmat(jnp.asarray(quat))
    A, B, Qc = srb.ct_dynamics(
        R, jnp.asarray(r_feet), cfg.mass, jnp.asarray(cfg.inertia_body)
    )
    pred = condense.build_prediction(A, B, Qc, cfg.dt_mpc)
    w = jnp.asarray(cfg.weights, jnp.float64)
    x0 = jnp.asarray(RNG.uniform(-1, 1, (13,)))
    xref = jnp.asarray(RNG.uniform(-1, 1, (horizon, 13)))
    f = jnp.asarray(RNG.uniform(-5, 5, (6,)))

    H = condense.cost_hessian(pred, w, cfg.alpha, horizon)
    g = condense.cost_gradient(pred, w, x0, xref, f, horizon)
    H_n, g_n = condense.cost_naive(pred, w, cfg.alpha, x0, xref, f, horizon)
    np.testing.assert_allclose(np.asarray(H), np.asarray(H_n), atol=1e-9)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_n), atol=1e-9)
    # symmetry + PD
    np.testing.assert_allclose(np.asarray(H), np.asarray(H).T, atol=1e-9)
    assert np.linalg.eigvalsh(np.asarray(H)).min() > 0


def test_batched_assembly():
    """Batched (vmapped-shape) assembly equals per-instance assembly."""
    cfg = MPCConfig(horizon=6)
    B = 5
    rpy = RNG.uniform(-0.2, 0.2, (B, 3))
    quat = np.asarray(rpy_to_quat(jnp.asarray(rpy)))
    r_feet = RNG.uniform(-0.3, 0.3, (B, 4, 3))
    R = quat_to_rotmat(jnp.asarray(quat))
    A, Bm, Qc = srb.ct_dynamics(
        R, jnp.asarray(r_feet), cfg.mass, jnp.asarray(cfg.inertia_body)
    )
    assert A.shape == (B, 13, 13) and Bm.shape == (B, 13, 12)
    pred = condense.build_prediction(A, Bm, Qc, cfg.dt_mpc)
    H = condense.cost_hessian(
        pred, jnp.asarray(cfg.weights, jnp.float64), cfg.alpha, cfg.horizon
    )
    assert H.shape == (B, 72, 72)
    for i in range(B):
        A1, B1, Q1 = srb.ct_dynamics(
            R[i], jnp.asarray(r_feet[i]), cfg.mass, jnp.asarray(cfg.inertia_body)
        )
        p1 = condense.build_prediction(A1, B1, Q1, cfg.dt_mpc)
        H1 = condense.cost_hessian(
            p1, jnp.asarray(cfg.weights, jnp.float64), cfg.alpha, cfg.horizon
        )
        np.testing.assert_allclose(np.asarray(H[i]), np.asarray(H1), atol=1e-10)


def test_timevarying_disturbance_response():
    """Per-step response: constant w_steps == constant-wrench path; a
    delta at step k propagates as Adt^(r-k) Qdt w."""
    cfg = MPCConfig(horizon=6)
    _, quat, r_feet = random_obs()
    R = quat_to_rotmat(jnp.asarray(quat))
    A, B, Qc = srb.ct_dynamics(
        R, jnp.asarray(r_feet), cfg.mass, jnp.asarray(cfg.inertia_body)
    )
    pred = condense.build_prediction(A, B, Qc, cfg.dt_mpc)
    w = jnp.asarray(RNG.uniform(-1, 1, 6))

    const = condense.disturbance_response(pred, w, 6)
    tv = condense.disturbance_response_timevarying(
        pred, jnp.broadcast_to(w, (6, 6)), 6
    )
    np.testing.assert_allclose(np.asarray(tv), np.asarray(const), atol=1e-10)

    # delta at step k: rows r >= k get Adt^(r-k) Qdt w, rows < k zero
    k = 2
    w_steps = jnp.zeros((6, 6)).at[k].set(w)
    tv2 = np.asarray(
        condense.disturbance_response_timevarying(pred, w_steps, 6)
    )
    Adt, Qdt = np.asarray(pred.Adt), np.asarray(pred.Qdt)
    np.testing.assert_allclose(tv2[:k], 0.0, atol=1e-12)
    expect = Qdt @ np.asarray(w)
    for r in range(k, 6):
        np.testing.assert_allclose(tv2[r], expect, atol=1e-9)
        expect = Adt @ expect

pytestmark = pytest.mark.smoke  # fast cross-layer sanity tier
