"""VBL balance controller + CARE solver tests."""

import numpy as np
import scipy.linalg
import jax.numpy as jnp

from quad_periodic_mpc_tpu.control import balance_vbl as vbl
from quad_periodic_mpc_tpu.ops import linalg

FEET = np.array(
    [[0.18, -0.13, -0.29], [0.18, 0.13, -0.29],
     [-0.18, -0.13, -0.29], [-0.18, 0.13, -0.29]]
)


def test_care_matches_scipy():
    rng = np.random.default_rng(0)
    n, m = 6, 3
    for _ in range(3):
        A = rng.normal(size=(n, n)) * 0.5
        B = rng.normal(size=(n, m))
        Q = np.eye(n) * rng.uniform(1, 5)
        R = np.eye(m) * rng.uniform(0.1, 1)
        P_ref = scipy.linalg.solve_continuous_are(A, B, Q, R)
        P = np.asarray(linalg.care(
            jnp.asarray(A), jnp.asarray(B), jnp.asarray(Q), jnp.asarray(R),
            dt=1e-4, iters=40,
        ))
        np.testing.assert_allclose(P, P_ref, rtol=2e-3, atol=1e-3)


def test_dare_fixed_point():
    """Doubling result satisfies the DARE residual."""
    rng = np.random.default_rng(1)
    n, m = 5, 2
    Ad = np.eye(n) + 0.01 * rng.normal(size=(n, n))
    Bd = 0.01 * rng.normal(size=(n, m))
    Qd = np.eye(n) * 0.01
    Rd = np.eye(m) * 0.01
    P = np.asarray(linalg.dare_doubling(
        jnp.asarray(Ad), jnp.asarray(Bd), jnp.asarray(Qd), jnp.asarray(Rd), 40
    ))
    S = Rd + Bd.T @ P @ Bd
    resid = Ad.T @ P @ Ad - P - Ad.T @ P @ Bd @ np.linalg.solve(S, Bd.T @ P @ Ad) + Qd
    assert np.abs(resid).max() < 1e-8 * max(1.0, np.abs(P).max())


def test_reference_grf_distributes_weight():
    f = np.asarray(vbl.reference_grf(jnp.asarray(FEET), jnp.ones(4)))
    cfg = vbl.VBLSettings()
    assert abs(f[:, 2].sum() - cfg.mass * 9.81) < 1.0
    # symmetric feet -> symmetric forces; zero net moment
    np.testing.assert_allclose(f[:, 2], f[0, 2], rtol=1e-6)
    np.testing.assert_allclose(f[:, 0:2], 0.0)
    # 3-leg stance pins the swing leg
    f3 = np.asarray(vbl.reference_grf(
        jnp.asarray(FEET), jnp.asarray([0.0, 1.0, 1.0, 1.0])
    ))
    assert abs(f3[0, 2]) < 1e-5
    assert abs(f3[1:, 2].sum() - cfg.mass * 9.81) < 1.5
    # moment balance about CoM
    torque = np.sum(np.cross(FEET, f3), axis=0)
    assert np.abs(torque[:2]).max() < 0.5


def _solve(x_off=0.0, v_off=0.0):
    eye = jnp.eye(3)
    return np.asarray(vbl.solve(
        x_com=jnp.asarray([x_off, 0.0, 0.29]),
        v_com=jnp.asarray([v_off, 0.0, 0.0]),
        R_body=eye,
        omega_world=jnp.zeros(3),
        p_feet_des_rel=jnp.asarray(FEET),
        x_des=jnp.asarray([0.0, 0.0, 0.29]),
        v_des=jnp.zeros(3),
        R_des=eye,
        omega_des_world=jnp.zeros(3),
        contact=jnp.ones(4),
    ))


def test_vbl_equilibrium():
    f = _solve()
    cfg = vbl.VBLSettings()
    # at the setpoint dF ~ 0 -> forces ~ f_ref
    f_ref = np.asarray(vbl.reference_grf(jnp.asarray(FEET), jnp.ones(4)))
    np.testing.assert_allclose(f, f_ref, atol=0.5)


def test_vbl_restoring_force():
    """CoM displaced +x -> LQR commands net -x force."""
    f = _solve(x_off=0.05)
    assert f[:, 0].sum() < -5.0
    # friction-cone linearization respected
    cfg = vbl.VBLSettings()
    f_ref = np.asarray(vbl.reference_grf(jnp.asarray(FEET), jnp.ones(4)))
    dfx = np.abs(f[:, 0] - f_ref[:, 0])
    assert (dfx <= cfg.mu * 0.7071 * f_ref[:, 2] + 1e-4).all()
