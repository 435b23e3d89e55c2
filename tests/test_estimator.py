"""Periodic disturbance estimator tests (SolverMPC.cpp:404-553, 692-798)."""

import numpy as np
import jax.numpy as jnp

from quad_periodic_mpc_tpu.config import EstimatorConfig, MPCConfig
from quad_periodic_mpc_tpu.models import srb
from quad_periodic_mpc_tpu.ops import estimator as est
from quad_periodic_mpc_tpu.ops.rotations import rpy_to_rotmat

DT = 0.026


def np_gaussian_filter(data, sigma):
    """Literal transliteration of gaussian_filter (SolverMPC.cpp:404-437)."""
    radius = int(np.ceil(3 * sigma))
    i = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * i * i / (sigma * sigma))
    k /= k.sum()
    n = len(data)
    out = np.zeros(n)
    for j in range(n):
        acc = 0.0
        for m in range(-radius, radius + 1):
            idx = min(max(j + m, 0), n - 1)
            acc += data[idx] * k[m + radius]
        out[j] = acc
    return out


def test_gaussian_filter_matches_reference():
    rng = np.random.default_rng(0)
    x = rng.normal(size=200)
    for sigma in [7.0, 27.0]:
        ours = np.asarray(est.gaussian_filter(jnp.asarray(x), sigma))
        ref = np_gaussian_filter(x, sigma)
        np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_gaussian_filter_batched():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 100))
    out = np.asarray(est.gaussian_filter(jnp.asarray(x), 7.0))
    for b in range(3):
        np.testing.assert_allclose(out[b], np_gaussian_filter(x[b], 7.0), atol=1e-12)


def test_fit_sin_recovers_bin_aligned_sinusoid():
    n = 400
    t = np.arange(n) * DT
    k_true = 4
    f_true = k_true / (n * DT)
    amp_true = 1.3
    y = 0.7 + amp_true * np.sin(2 * np.pi * f_true * t)
    fit = est.fit_sin(jnp.asarray(t), jnp.asarray(y))
    assert abs(float(fit.freq) - f_true) < 1e-9
    assert abs(float(fit.amp) - amp_true) < 0.01
    assert abs(float(fit.offset) - 0.7) < 1e-6
    assert float(fit.phase) == 0.0


def test_update_lifecycle():
    """No adaptation before window fills; fit freezes after freeze_after;
    QP wrench only released after freeze (SolverMPC.cpp:704-814)."""
    cfg = EstimatorConfig(mode="faithful", residual="reference")
    state = est.init((), window=cfg.window, dtype=jnp.float64)
    f_true, amp_true, stat_true = 0.33, 1.25, -0.83

    fq_trace = []
    for k in range(520):
        t = jnp.asarray(k * DT, jnp.float64)
        resid = stat_true + amp_true * np.sin(2 * np.pi * f_true * k * DT)
        f_ext = jnp.zeros(6, jnp.float64).at[3].set(resid)
        state, f_qp = est.update(state, t, f_ext, cfg)
        fq_trace.append(np.asarray(f_qp))

    fq = np.stack(fq_trace)
    # nothing fed to QP until count > 500
    assert np.all(fq[:500] == 0.0)
    assert np.any(fq[500:, 3] != 0.0)
    # frequency found within FFT bin resolution
    assert abs(float(state.est_freq) - f_true) < 1.2 / (cfg.window * DT)
    # amplitude of band-passed signal in the right ballpark
    assert 0.4 * amp_true < float(state.est_amp) < 1.6 * amp_true

    # frozen after 500: pushing different data leaves the fit untouched
    frozen = (float(state.est_amp), float(state.est_freq))
    for k in range(520, 560):
        t = jnp.asarray(k * DT, jnp.float64)
        f_ext = jnp.zeros(6, jnp.float64).at[3].set(np.sin(20.0 * k))
        state, _ = est.update(state, t, f_ext, cfg)
    assert (float(state.est_amp), float(state.est_freq)) == frozen


def test_faithful_compensation_formula():
    """faithful mode: comp = amp + sin(.) (SolverMPC.cpp:766, sic)."""
    cfg = EstimatorConfig(mode="faithful")
    state = est.init((), window=cfg.window, dtype=jnp.float64)
    state = state._replace(
        count=jnp.asarray(510, jnp.int32),
        est_amp=jnp.asarray(1.5, jnp.float64),
        est_freq=jnp.asarray(0.33, jnp.float64),
        est_phase=jnp.asarray(0.0, jnp.float64),
        est_stat=jnp.asarray(-0.8, jnp.float64),
    )
    t = jnp.asarray(100.0, jnp.float64)
    state2, f_qp = est.update(state, t, jnp.zeros(6, jnp.float64), cfg)
    expected = 1.5 + np.sin(2 * np.pi * 100.0 * 0.33)
    assert abs(float(f_qp[3]) - expected) < 1e-9


def test_ls_fit_recovers_amp_phase_offset():
    """fit_sin_ls (the reference's disabled proper estimator,
    SolverMPC.cpp:1106-1235): full (amp, phase, offset) recovery, even
    for off-bin frequencies thanks to parabolic peak refinement."""
    n = 400
    t = np.arange(n) * DT + 5.0
    f_true, amp_true, ph_true, off_true = 0.33, 1.25, 0.7, -0.83
    y = off_true + amp_true * np.sin(2 * np.pi * f_true * t + ph_true)
    fit, B, D = est.fit_sin_ls(jnp.asarray(t), jnp.asarray(y))
    assert abs(float(fit.freq) - f_true) < 0.01
    assert abs(float(fit.amp) - amp_true) < 0.05
    assert abs(float(fit.offset) - off_true) < 0.05
    # reconstruction error over the window
    w = 2 * np.pi * float(fit.freq)
    recon = float(fit.offset) + float(B) * np.sin(w * t) + float(D) * np.cos(w * t)
    assert np.abs(recon - y).max() < 0.12


def test_ls_mode_closed_form_tracking():
    """ls mode converges to a usable compensation signal within the
    window and keeps refitting (no freeze)."""
    cfg = EstimatorConfig(mode="ls")
    state = est.init((), window=cfg.window, dtype=jnp.float64)
    f_true, amp_true, off_true = 0.33, 1.25, -0.83
    errs = []
    for k in range(560):
        t = k * DT
        resid = off_true + amp_true * np.sin(2 * np.pi * f_true * t)
        f_ext = jnp.zeros(6, jnp.float64).at[3].set(resid)
        state, f_qp = est.update(state, jnp.asarray(t, jnp.float64), f_ext, cfg)
        if k >= cfg.ls_release:
            errs.append(abs(float(f_qp[3]) - resid))
    assert np.mean(errs) < 0.15 * amp_true


def test_residual_discrete_recovers_wrench():
    """residual_discrete inverts the exact Qd channel: integrate one step
    with a known wrench, recover it to machine precision."""
    from quad_periodic_mpc_tpu.ops import discretize
    cfg = MPCConfig()
    rng = np.random.default_rng(8)
    rpy = jnp.asarray(rng.uniform(-0.1, 0.1, 3))
    R = rpy_to_rotmat(rpy)
    r_feet = jnp.asarray(rng.uniform(-0.3, 0.3, (4, 3)))
    x_prev = jnp.asarray(rng.uniform(-0.5, 0.5, 13))
    forces = jnp.asarray(rng.uniform(-20, 20, (4, 3)))
    w_true = jnp.asarray(rng.uniform(-2, 2, 6))
    dt = cfg.dt_mpc

    A, B, Qc = srb.ct_dynamics(R, r_feet, cfg.mass, jnp.asarray(cfg.inertia_body), 0.0)
    Adt, Bdt, Qdt = discretize.nilpotent_zoh(A, B, Qc, dt)
    x_k = Adt @ x_prev + Bdt @ forces.reshape(12) + Qdt @ w_true

    w_est = est.residual_discrete(
        x_k, x_prev, forces, R, r_feet, cfg.mass,
        jnp.asarray(cfg.inertia_body), 0.0, dt,
    )
    np.testing.assert_allclose(np.asarray(w_est), np.asarray(w_true), atol=1e-9)


def test_residual_recovers_injected_wrench():
    """On the exact SRB plant, x_{k+1} - A x_k - B u_k isolates the Q_d
    disturbance channel.  The reference computes the residual with the
    CONTINUOUS A, B (ConvexMPCLocomotion.cpp:641-687) — so feeding a
    one-step-integrated state gives residual ~ x_{k+1} - A_ct x_k - B_ct u,
    which for the v-rows equals v_{k+1} - (B_ct u)_v; we verify our
    implementation against that literal formula."""
    cfg = MPCConfig()
    rng = np.random.default_rng(5)
    rpy = jnp.asarray(rng.uniform(-0.1, 0.1, 3))
    R = rpy_to_rotmat(rpy)
    r_feet = jnp.asarray(rng.uniform(-0.3, 0.3, (4, 3)))
    x_k = jnp.asarray(rng.uniform(-1, 1, 13))
    x_prev = jnp.asarray(rng.uniform(-1, 1, 13))
    f_ff = jnp.asarray(rng.uniform(-20, 20, (4, 3)))

    out = est.residual_f_ext(
        x_k, x_prev, f_ff, R, r_feet, cfg.mass,
        jnp.asarray(cfg.inertia_body), 0.1,
    )
    A, B, _ = srb.ct_dynamics(
        R, r_feet, cfg.mass, jnp.asarray(cfg.inertia_body), 0.1
    )
    u_prev = -np.asarray(f_ff).reshape(12)
    full = np.asarray(x_k) - np.asarray(A) @ np.asarray(x_prev) - np.asarray(B) @ u_prev
    expected = full[6:12] * np.array([-1, -1, 1, 1, 1, 1])
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-10)


def test_ls6_full_wrench_fit():
    """ls6: independent per-component sinusoid fits on the 6-wrench
    (beyond the reference's f_ext[3]-only tracking)."""
    cfg = EstimatorConfig(mode="ls6")
    state = est.init((), window=cfg.window, dtype=jnp.float64)
    true = {
        1: (0.4, 0.8, 0.5),   # tau_y: stat, amp, freq
        3: (-0.83, 1.25, 0.33),
        4: (0.2, 0.6, 0.6),
    }
    for k in range(520):
        t = k * DT
        f_ext = np.zeros(6)
        for c, (s, a, f) in true.items():
            f_ext[c] = s + a * np.sin(2 * np.pi * f * t)
        state, f_qp = est.update(
            state, jnp.asarray(t, jnp.float64), jnp.asarray(f_ext), cfg
        )
    for c, (s, a, f) in true.items():
        assert abs(float(state.est6_freq[c]) - f) < 0.02, c
        assert abs(float(state.est6_stat[c]) - s) < 0.1, c
        amp_hat = float(jnp.sqrt(state.est6_sin[c]**2 + state.est6_cos[c]**2))
        assert abs(amp_hat - a) < 0.2 * a + 0.05, c
    # untouched components stay ~zero
    assert abs(float(state.est6_stat[0])) < 0.05
    # released wrench reconstructs the signal at current time
    t = 519 * DT
    for c, (s, a, f) in true.items():
        expect = s + a * np.sin(2 * np.pi * f * t)
        assert abs(float(f_qp[c]) - expect) < 0.25, c


def test_ls6_closed_loop_lateral_disturbance():
    """Closed loop with a lateral (F_y) periodic disturbance: ls6 rejects
    what the reference's x-only estimator cannot see."""
    import jax
    from quad_periodic_mpc_tpu.config import LoopConfig, MPCConfig, PDIPConfig
    from quad_periodic_mpc_tpu.control import loop as L, mpc as M
    from quad_periodic_mpc_tpu.ops import gait as G
    from quad_periodic_mpc_tpu.sim import srb_sim as S

    dtype = jnp.float64
    dist = S.WrenchDisturbance.zero((), dtype)
    dist = dist._replace(
        static=dist.static.at[4].set(-0.6),
        amp=dist.amp.at[4].set(1.0),
        freq=dist.freq.at[4].set(0.4),
    )

    def run(est_cfg, n=700):
        plant = S.init_plant((), body_height=0.29, dtype=dtype)
        obs = S.observe(plant)
        ctrl = M.init_state((), obs, dtype=dtype)
        cmd = M.Command(vx=jnp.asarray(0.3, dtype), vy=jnp.asarray(0.0, dtype),
                        yaw_rate=jnp.asarray(0.0, dtype),
                        body_height=jnp.asarray(0.29, dtype))
        return L.rollout(n, plant, ctrl, cmd, G.preset("trotting"), dist,
                         MPCConfig(horizon=10), LoopConfig(), est_cfg,
                         PDIPConfig(iterations=25))

    _, tr_on = run(EstimatorConfig(mode="ls6", residual="discrete"))
    _, tr_off = run(EstimatorConfig(mode="faithful", residual="reference",
                                    freeze_after=10 ** 9))
    vy_on = np.asarray(tr_on.x)[:, 10]
    vy_off = np.asarray(tr_off.x)[:, 10]
    rms_on = np.sqrt((vy_on[450:] ** 2).mean())
    rms_off = np.sqrt((vy_off[450:] ** 2).mean())
    assert rms_on < 0.7 * rms_off, (rms_on, rms_off)


def test_estimator_static_and_off_arms():
    """A/B baseline arms (paper experiment): "off" feeds zeros to the QP;
    "static" feeds only the EMA'd raw residual once released — it tracks
    the DC offset of the disturbance but not the sinusoid."""
    import jax.numpy as jnp
    import numpy as np
    from quad_periodic_mpc_tpu.config import EstimatorConfig
    from quad_periodic_mpc_tpu.ops import estimator as est_ops

    window = 32
    st_off = est_ops.init((), window=window)
    st_static = est_ops.init((), window=window)
    cfg_off = EstimatorConfig(mode="off", window=window, ls_release=window)
    cfg_st = EstimatorConfig(mode="static", window=window, ls_release=window,
                             ema_static=0.9)
    dt = 0.026
    for k in range(3 * window):
        t = jnp.asarray(k * dt)
        f_ext = jnp.zeros(6).at[3].set(-10.0 + 15.0 * jnp.sin(
            2 * np.pi * 0.33 * t))
        st_off, f_off = est_ops.update(st_off, t, f_ext, cfg_off)
        st_static, f_st = est_ops.update(st_static, t, f_ext, cfg_st)
        assert float(jnp.abs(f_off).max()) == 0.0
    # static arm released: fx channel tracks the EMA of the residual
    # (near the DC offset -10, well within the sinusoid's +-15 swing)
    fx = float(f_st[3])
    assert fx != 0.0
    assert -25.0 < fx < 5.0
    # and only channel 3 is fed (reference tracks f_ext[3] only)
    assert float(jnp.abs(jnp.asarray(f_st).at[3].set(0.0)).max()) == 0.0


def test_residual_discrete_matrix_free():
    """The round-5 matrix-free residual_discrete must match the
    assembled ct_dynamics + nilpotent_zoh + lstsq path to roundoff."""
    from quad_periodic_mpc_tpu.models import srb
    from quad_periodic_mpc_tpu.ops import discretize
    from quad_periodic_mpc_tpu.ops import estimator as est_ops
    from quad_periodic_mpc_tpu.ops.rotations import rpy_to_quat, quat_to_rotmat

    rng = np.random.default_rng(3)
    B = 5
    dt = 0.026
    mass = 12.0
    I_diag = jnp.asarray([0.07, 0.26, 0.242], jnp.float64)
    rpy = rng.uniform(-0.2, 0.2, (B, 3))
    R = quat_to_rotmat(rpy_to_quat(jnp.asarray(rpy)))
    r_feet = jnp.asarray(rng.uniform(-0.3, 0.3, (B, 4, 3)))
    u = jnp.asarray(rng.uniform(-40, 40, (B, 4, 3)))
    x_prev = jnp.asarray(rng.uniform(-1, 1, (B, 13)))
    x_k = jnp.asarray(rng.uniform(-1, 1, (B, 13)))
    xd = jnp.asarray(rng.uniform(-0.5, 0.5, (B,)))

    w_fast = est_ops.residual_discrete(
        x_k, x_prev, u, R, r_feet, mass, I_diag, xd, dt
    )

    A, Bm, Qc = srb.ct_dynamics(R, r_feet, mass, I_diag, xd)
    Adt, Bdt, Qdt = discretize.nilpotent_zoh(A, Bm, Qc, dt)
    u12 = u.reshape(B, 12)
    xi = (
        x_k
        - jnp.einsum("...ij,...j->...i", Adt, x_prev)
        - jnp.einsum("...ij,...j->...i", Bdt, u12)
    )
    G = jnp.einsum("...ni,...nj->...ij", Qdt, Qdt)
    b = jnp.einsum("...ni,...n->...i", Qdt, xi)
    w_ref = np.linalg.solve(np.asarray(G), np.asarray(b)[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(w_fast), w_ref, atol=1e-8)
