"""Linear-KF position/velocity estimator tests vs a literal numpy
transliteration of PositionVelocityEstimator.cpp:130-250."""

import numpy as np
import jax.numpy as jnp

from quad_periodic_mpc_tpu.estimation import kf


def np_kf_step(xhat, P, a_world, Rbody, omega_body, p_rel, v_rel, phase, pr: kf.KFParams):
    """Oracle: one run() tick, transliterated."""
    dt = pr.dt
    A = np.eye(18); A[0:3, 3:6] = dt * np.eye(3)
    B = np.zeros((18, 3)); B[3:6, :] = dt * np.eye(3)
    C = np.zeros((28, 18))
    for i in range(4):
        C[3*i:3*i+3, 0:3] = np.eye(3)
        C[12+3*i:15+3*i, 3:6] = np.eye(3)
    C[0:12, 6:18] = -np.eye(12)
    C[24, 8] = 1; C[25, 11] = 1; C[26, 14] = 1; C[27, 17] = 1

    Q = np.eye(18)
    Q[0:3, 0:3] *= (dt / 20.0) * pr.process_noise_pimu
    Q[3:6, 3:6] *= (dt * 9.8 / 20.0) * pr.process_noise_vimu
    Q[6:18, 6:18] *= dt * pr.process_noise_pfoot
    R = np.eye(28)
    R[0:12, 0:12] *= pr.sensor_noise_pimu_rel_foot
    R[12:24, 12:24] *= pr.sensor_noise_vimu_rel_foot
    R[24:28, 24:28] *= pr.sensor_noise_zfoot

    g = np.array([0, 0, -9.81])
    Rbod = Rbody.T
    a = a_world + g
    ps = np.zeros(12); vs = np.zeros(12); pzs = np.zeros(4)
    p0, v0 = xhat[0:3], xhat[3:6]
    for i in range(4):
        p_f = Rbod @ p_rel[i]
        dp_f = Rbod @ (np.cross(omega_body, p_rel[i]) + v_rel[i])
        ph = min(phase[i], 1.0)
        w = pr.trust_window
        if ph < w:
            trust = ph / w
        elif ph > 1 - w:
            trust = (1 - ph) / w
        else:
            trust = 1.0
        s = 1 + (1 - trust) * pr.high_suspect_number
        qi = 6 + 3 * i
        Q[qi:qi+3, qi:qi+3] *= s
        R[12+3*i:15+3*i, 12+3*i:15+3*i] *= s
        R[24+i, 24+i] *= s
        ps[3*i:3*i+3] = -p_f
        vs[3*i:3*i+3] = (1 - trust) * v0 + trust * (-dp_f)
        pzs[i] = (1 - trust) * (p0[2] + p_f[2])

    y = np.concatenate([ps, vs, pzs])
    xhat = A @ xhat + B @ a
    Pm = A @ P @ A.T + Q
    ey = y - C @ xhat
    S = C @ Pm @ C.T + R
    xhat = xhat + Pm @ C.T @ np.linalg.solve(S, ey)
    P = (np.eye(18) - Pm @ C.T @ np.linalg.solve(S, C)) @ Pm
    P = (P + P.T) / 2
    if np.linalg.det(P[0:2, 0:2]) > 1e-6:
        P[0:2, 2:18] = 0
        P[2:18, 0:2] = 0
        P[0:2, 0:2] /= 10
    return xhat, P


def rand_inputs(rng, batch=()):
    a = rng.normal(size=batch + (3,)) * 0.5
    rpy = rng.uniform(-0.1, 0.1, batch + (3,))
    from quad_periodic_mpc_tpu.ops.rotations import rpy_to_rotmat
    R = np.asarray(rpy_to_rotmat(jnp.asarray(rpy)))
    Rbody = np.swapaxes(R, -1, -2)     # world->body
    omega = rng.normal(size=batch + (3,)) * 0.2
    p_rel = rng.uniform(-0.3, 0.3, batch + (4, 3))
    v_rel = rng.normal(size=batch + (4, 3)) * 0.1
    phase = rng.uniform(0, 1, batch + (4,))
    return a, Rbody, omega, p_rel, v_rel, phase


def test_kf_matches_reference_transliteration():
    pr = kf.KFParams()
    rng = np.random.default_rng(0)
    st = kf.init((), jnp.float64)
    xhat = np.asarray(st.xhat).copy()
    P = np.asarray(st.P).copy()
    for _ in range(10):
        a, Rbody, omega, p_rel, v_rel, phase = rand_inputs(rng)
        st = kf.update(
            st, jnp.asarray(a), jnp.asarray(Rbody), jnp.asarray(omega),
            jnp.asarray(p_rel), jnp.asarray(v_rel), jnp.asarray(phase), pr,
        )
        xhat, P = np_kf_step(xhat, P, a, Rbody, omega, p_rel, v_rel, phase, pr)
        # atol 1e-6: the product's innovation solve is the exact
        # Schur-recursion spd_inverse (different rounding than NumPy's
        # LU; measured gap ~1e-7 over 10 f64 steps)
        np.testing.assert_allclose(np.asarray(st.xhat), xhat, atol=1e-6)
        np.testing.assert_allclose(np.asarray(st.P), P, atol=1e-6)


def test_kf_batched_matches_loop():
    pr = kf.KFParams()
    rng = np.random.default_rng(1)
    B = 4
    stb = kf.init((B,), jnp.float64)
    sts = [kf.init((), jnp.float64) for _ in range(B)]
    for _ in range(3):
        a, Rbody, omega, p_rel, v_rel, phase = rand_inputs(rng, (B,))
        stb = kf.update(
            stb, jnp.asarray(a), jnp.asarray(Rbody), jnp.asarray(omega),
            jnp.asarray(p_rel), jnp.asarray(v_rel), jnp.asarray(phase), pr,
        )
        for i in range(B):
            sts[i] = kf.update(
                sts[i], jnp.asarray(a[i]), jnp.asarray(Rbody[i]),
                jnp.asarray(omega[i]), jnp.asarray(p_rel[i]),
                jnp.asarray(v_rel[i]), jnp.asarray(phase[i]), pr,
            )
    for i in range(B):
        np.testing.assert_allclose(
            np.asarray(stb.xhat[i]), np.asarray(sts[i].xhat), atol=1e-10
        )


def test_kf_converges_on_stationary_robot():
    """Standing still: velocity estimate -> 0, height -> foot-anchored z."""
    pr = kf.KFParams()
    st = kf.init((), jnp.float64)
    # truth: body at (0,0,0.3), feet on ground under hips
    feet_w = np.array(
        [[0.18, -0.13, 0.0], [0.18, 0.13, 0.0],
         [-0.18, -0.13, 0.0], [-0.18, 0.13, 0.0]]
    )
    p_body = np.array([0.0, 0.0, 0.3])
    p_rel = feet_w - p_body       # body frame == world (identity attitude)
    for _ in range(300):
        st = kf.update(
            st,
            jnp.asarray([0.0, 0.0, 9.81]),     # accelerometer reads +g
            jnp.asarray(np.eye(3)),
            jnp.zeros(3),
            jnp.asarray(p_rel),
            jnp.zeros((4, 3)),
            jnp.full((4,), 0.5),               # mid-stance, full trust
            pr,
        )
    x = np.asarray(st.xhat)
    assert np.abs(x[3:6]).max() < 1e-3          # at rest
    # relative geometry: body z minus foot z == 0.3
    assert abs((x[2] - x[8]) - 0.3) < 1e-2
    # foot heights pinned to ~0
    assert abs(x[8]) < 5e-3


def test_plane_body_height():
    """Flat ground at height h below body -> z = h, pitch = 0
    (_getLocalBodyHeight, PositionVelocityEstimator.cpp:64-120)."""
    feet = np.array(
        [[0.18, -0.13, -0.27], [0.18, 0.13, -0.27],
         [-0.18, -0.13, -0.27], [-0.18, 0.13, -0.27]]
    )
    z, pitch = kf.plane_body_height(jnp.asarray(feet))
    assert abs(float(z) - 0.27) < 1e-6
    assert abs(float(pitch)) < 1e-6


def test_kf_pallas_kernel_matches_oracle():
    """Fused innovation kernel (ops/pallas/kf_kernel.py) vs a numpy
    oracle on well-conditioned random states (interpret mode).

    NOTE the init transient (P0 = 100 I against r ~ 1e-3 sensor noise,
    cond(S) ~ 5e5) is numerically violent for EVERY f32 innovation
    ((I - K C) Pm amplifies inverse error by ~Pm^2); both the XLA and
    kernel paths are only comparable there to ~1e-2.  Kernel
    correctness is pinned here on conditioned states; end-to-end f32
    behavior on realistic inputs is pinned by the stationary test
    below."""
    from quad_periodic_mpc_tpu.ops.pallas import kf_kernel as KK

    rng = np.random.default_rng(0)
    B, dt = 5, 0.002
    xhat = rng.normal(size=(B, 18)).astype(np.float32)
    Ph = rng.normal(size=(B, 18, 18)).astype(np.float32)
    P = (Ph @ Ph.transpose(0, 2, 1) + 18 * np.eye(18)).astype(np.float32)
    a = rng.normal(size=(B, 3)).astype(np.float32)
    y = rng.normal(size=(B, 28)).astype(np.float32)
    qd = rng.uniform(0.001, 1, (B, 18)).astype(np.float32)
    rd = rng.uniform(0.001, 1, (B, 28)).astype(np.float32)

    A = np.eye(18); A[0:3, 3:6] = dt * np.eye(3)
    Bm = np.zeros((18, 3)); Bm[3:6, :] = dt * np.eye(3)
    C = np.zeros((28, 18))
    for i in range(4):
        C[3*i:3*i+3, 0:3] = np.eye(3)
        C[12+3*i:15+3*i, 3:6] = np.eye(3)
    C[0:12, 6:18] = -np.eye(12)
    C[24, 8] = 1; C[25, 11] = 1; C[26, 14] = 1; C[27, 17] = 1
    xo, Po = [], []
    for b in range(B):
        xp = A @ xhat[b] + Bm @ a[b]
        Pm = A @ P[b] @ A.T + np.diag(qd[b])
        ey = y[b] - C @ xp
        S = C @ Pm @ C.T + np.diag(rd[b])
        Si = np.linalg.inv(S)
        xn = xp + Pm @ C.T @ Si @ ey
        Pn = (np.eye(18) - Pm @ C.T @ Si @ C) @ Pm
        Pn = (Pn + Pn.T) / 2
        det2 = Pn[0, 0] * Pn[1, 1] - Pn[0, 1] * Pn[1, 0]
        if det2 > 1e-6:
            m = np.ones((18, 18)); m[0:2, 2:] = 0; m[2:, 0:2] = 0
            Pn = Pn * m; Pn[0:2, 0:2] /= 10
        xo.append(xn); Po.append(Pn)
    xk, Pk = KK.fused_kf_innovate(
        jnp.asarray(xhat), jnp.asarray(P), jnp.asarray(a), jnp.asarray(y),
        jnp.asarray(qd), jnp.asarray(rd), dt=dt, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(xk), np.stack(xo), atol=2e-3)
    np.testing.assert_allclose(np.asarray(Pk), np.stack(Po), atol=5e-3)


def test_kf_pallas_stationary_matches_xla():
    """Realistic standing-robot loop, f32: the kernel path tracks the
    XLA path through convergence."""
    import jax

    pr = kf.KFParams()
    feet_w = np.array(
        [[0.18, -0.13, 0.0], [0.18, 0.13, 0.0],
         [-0.18, -0.13, 0.0], [-0.18, 0.13, 0.0]]
    )
    p_rel = (feet_w - np.array([0.0, 0.0, 0.3])).astype(np.float32)
    args = (
        jnp.asarray([0.0, 0.0, 9.81], jnp.float32),
        jnp.asarray(np.eye(3, dtype=np.float32)),
        jnp.zeros(3, jnp.float32),
        jnp.asarray(p_rel),
        jnp.zeros((4, 3), jnp.float32),
        jnp.full((4,), 0.5, jnp.float32),
    )
    up_x = jax.jit(lambda s_: kf.update(s_, *args, pr, backend="xla"))
    up_p = jax.jit(lambda s_: kf.update(s_, *args, pr, backend="pallas"))
    st_x = kf.init((), jnp.float32)
    st_p = st_x
    for _ in range(100):
        st_x = up_x(st_x)
        st_p = up_p(st_p)
    np.testing.assert_allclose(
        np.asarray(st_p.xhat), np.asarray(st_x.xhat), atol=2e-3
    )
    x = np.asarray(st_p.xhat)
    assert np.abs(x[3:6]).max() < 5e-3
    assert abs((x[2] - x[8]) - 0.3) < 1e-2
