"""Periodic external-disturbance estimator, batched.

Rebuilds the adaptive pipeline of SolverMPC.cpp:390-813 +
ConvexMPCLocomotion.cpp:612-781 as pure, scan/vmap-friendly state updates:

1. Residual extraction (ConvexMPCLocomotion.cpp:639-776): each MPC solve
   computes f_ext from the previous solve's round-tripped data,

       f_external = x_k - A_prev @ x_prev - B_prev @ u_prev
       f_ext = [-f[0], -f[1], f[2], f[3], f[4], f[5]]  of f_external[6:12]

   where A_prev/B_prev are the CONTINUOUS-time matrices rebuilt from the
   previous tick's R, r_feet, x_drag (the reference literally uses A_ct,
   not Adt — replicated faithfully) and u_prev = -f_ff (the negated
   world-frame feedforward forces, ConvexMPCLocomotion.cpp:748-759).

2. Sliding window of (sim_time, f_ext[3]) pairs, window=400, pushed every
   solve (SolverMPC.cpp:692-698).

3. While 400 <= count <= 500 (SolverMPC.cpp:705-707): band-pass the
   window with two Gaussian blurs (sigma 7 and 27, edge-replicated,
   radius 3*sigma — gaussian_filter, SolverMPC.cpp:404-437), take
   blurred - very_blurred, then fit_sin (SolverMPC.cpp:478-541): FFT peak
   (excluding DC) -> frequency; sqrt(2)*std -> amplitude; mean -> offset;
   phase = 0.  After 500 samples the fit freezes.

4. Compensatory force (SolverMPC.cpp:766-772):
       faithful: comp = est_amp + sin(2 pi t f + phase)   [sic — the
         reference ADDS the amplitude to a unit sinusoid]
       corrected: comp = est_stat + est_amp * sin(2 pi t f + phase)
   f_est[3] = comp once count >= 400; the QP consumes f_est only once
   count > 500 (SolverMPC.cpp:808-814).

5. EMA side-channels: f_est_smoothed (0.95/0.05, SolverMPC.cpp:783) and
   the static estimator f_est_static[3] (0.97/0.03, SolverMPC.cpp:798).

All state lives in EstimatorState (a pytree of arrays): batch axes lead,
so thousands of disturbance-hypothesis instances update in parallel.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from quad_periodic_mpc_tpu.config import EstimatorConfig


class EstimatorState(NamedTuple):
    times: jnp.ndarray        # (..., window) ordered, newest last
    diffs: jnp.ndarray        # (..., window) component-3 series (faithful/ls)
    wrench_hist: jnp.ndarray  # (..., window, 6) full residual history (ls6)
    count: jnp.ndarray        # (...,) int32 samples pushed
    est_amp: jnp.ndarray      # (...,)
    est_freq: jnp.ndarray     # (...,)  (ls6: shared across components? no — (..., 6))
    est_phase: jnp.ndarray    # (...,)
    est_stat: jnp.ndarray     # (...,)
    est_sin: jnp.ndarray      # (...,) LS sin coefficient (ls mode)
    est_cos: jnp.ndarray      # (...,) LS cos coefficient (ls mode)
    # full-wrench LS fit (ls6 mode): per-component parameters
    est6_freq: jnp.ndarray    # (..., 6)
    est6_stat: jnp.ndarray    # (..., 6)
    est6_sin: jnp.ndarray     # (..., 6)
    est6_cos: jnp.ndarray     # (..., 6)
    f_est: jnp.ndarray        # (..., 6)
    f_est_smoothed: jnp.ndarray   # (..., 6)
    f_est_static: jnp.ndarray     # (..., 6)


def init(batch: tuple = (), window: int = 400, dtype=jnp.float32) -> EstimatorState:
    z = functools.partial(jnp.zeros, dtype=dtype)
    return EstimatorState(
        times=z(batch + (window,)),
        diffs=z(batch + (window,)),
        wrench_hist=z(batch + (window, 6)),
        count=jnp.zeros(batch, jnp.int32),
        est_amp=z(batch),
        est_freq=z(batch),
        est_phase=z(batch),
        est_stat=z(batch),
        est_sin=z(batch),
        est_cos=z(batch),
        est6_freq=z(batch + (6,)),
        est6_stat=z(batch + (6,)),
        est6_sin=z(batch + (6,)),
        est6_cos=z(batch + (6,)),
        f_est=z(batch + (6,)),
        f_est_smoothed=z(batch + (6,)),
        f_est_static=z(batch + (6,)),
    )


@functools.lru_cache(maxsize=8)
def _gauss_kernel(sigma: float) -> np.ndarray:
    """Normalized Gaussian kernel, radius ceil(3 sigma)
    (gaussian_filter, SolverMPC.cpp:404-419)."""
    radius = int(np.ceil(3 * sigma))
    i = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * i * i / (sigma * sigma))
    return k / k.sum()


@functools.lru_cache(maxsize=16)
def _gauss_band_matrix(sigma: float, length: int) -> np.ndarray:
    """Dense banded correlation matrix M (length, length + 2 radius):
    out = xp @ M^T with xp the edge-padded signal.  One shared MXU
    matmul replaces the (batch, length, kernel) sliding-window gather,
    which at sigma=27 materialized 163 taps x window 400 x batch — HBM
    traffic ~500 MB per blur at batch 2048."""
    k = _gauss_kernel(sigma)
    r = (k.shape[0] - 1) // 2
    M = np.zeros((length, length + 2 * r), np.float64)
    for i in range(length):
        M[i, i : i + k.shape[0]] = k
    return M


def gaussian_filter(x: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Edge-replicated 1-D Gaussian blur along the last axis, batched.
    out[i] = sum_j k[j] xp[i + j] (gaussian_filter, SolverMPC.cpp:404-419)
    expressed as one shared banded matmul."""
    k = _gauss_kernel(sigma)
    radius = (k.shape[0] - 1) // 2
    pad = [(0, 0)] * (x.ndim - 1) + [(radius, radius)]
    xp = jnp.pad(x, pad, mode="edge")
    M = jnp.asarray(_gauss_band_matrix(sigma, x.shape[-1]), x.dtype)
    return jnp.einsum(
        "...l,il->...i", xp, M, precision=jax.lax.Precision.HIGHEST
    )


class SinFit(NamedTuple):
    amp: jnp.ndarray
    freq: jnp.ndarray
    phase: jnp.ndarray
    offset: jnp.ndarray


def fit_sin(times: jnp.ndarray, smoothed: jnp.ndarray) -> SinFit:
    """FFT-peak sinusoid fit (fit_sin, SolverMPC.cpp:478-541).

    freq  = |fftfreq(n, dt)[argmax |rfft(y)| excluding DC]|
    amp   = sqrt(2) * std(y);  offset = mean(y);  phase = 0.
    """
    n = smoothed.shape[-1]
    dt = times[..., 1] - times[..., 0]
    spec = jnp.abs(jnp.fft.rfft(smoothed, axis=-1))
    mag = spec.at[..., 0].set(-jnp.inf)   # exclude DC (SolverMPC.cpp:502-510)
    k = jnp.argmax(mag, axis=-1)
    freq = k.astype(smoothed.dtype) / (n * dt)
    m = jnp.mean(smoothed, axis=-1)
    s = jnp.sqrt(jnp.mean((smoothed - m[..., None]) ** 2, axis=-1))
    return SinFit(
        # python-float constant stays weakly typed (np.float64 would
        # promote f32 pipelines to f64 under x64 test configs)
        amp=s * float(np.sqrt(2.0)),
        freq=freq,
        phase=jnp.zeros_like(freq),
        offset=m,
    )


def fit_sin_ls(times: jnp.ndarray, y: jnp.ndarray) -> tuple[SinFit, jnp.ndarray, jnp.ndarray]:
    """Least-squares sinusoid fit — the reference's own disabled proper
    estimator (SolverMPC.cpp:1106-1235, commented out), batched:

    1. frequency guess from the FFT magnitude peak, refined by parabolic
       interpolation of the three bins around the peak;
    2. linear LS of y ~ B sin(w t) + D cos(w t) + c via the 3x3 normal
       equations (the reference's hand-rolled Gauss elimination,
       SolverMPC.cpp:1176-1219).

    Returns (SinFit with amp/freq/phase/offset, B, D) where
    y(t) ~ c + B sin(w t) + D cos(w t).
    """
    n = y.shape[-1]
    dt = times[..., 1] - times[..., 0]
    ym = y - jnp.mean(y, axis=-1, keepdims=True)
    spec = jnp.abs(jnp.fft.rfft(ym, axis=-1))
    mag = spec.at[..., 0].set(-jnp.inf)
    k = jnp.argmax(mag, axis=-1)
    kc = jnp.clip(k, 1, spec.shape[-1] - 2).astype(y.dtype)
    bin_f = 1.0 / (n * dt)

    yy = jnp.sum(y * y, axis=-1)

    def ls_at(freq):
        """LS of y ~ B sin + D cos + c at a fixed frequency; returns
        (sse, coef).  Tikhonov-regularized: at freq -> 0 the sin column
        vanishes and the plain Gram goes singular (NaNs for silent
        components).

        TPU notes: the Gram/rhs come from scalar inner products (no
        (cands, batch, 3, n) basis stack), the 3x3 normal equations are
        solved by explicit Cramer adjugate (XLA's tiny batched LU is
        catastrophically slow on TPU), and the SSE comes from the
        normal-equations identity sse = yy - 2 coef.b + coef G coef
        (no residual materialization).  Together these took the ls-mode
        estimator update from 73 ms to a few ms at batch 2048.
        """
        w = 2.0 * jnp.asarray(np.pi, y.dtype) * freq
        s = jnp.sin(w[..., None] * times)
        c = jnp.cos(w[..., None] * times)
        inv_n = 1.0 / n  # normalize the Gram to O(1) for f32 Cramer
        ss = jnp.sum(s * s, axis=-1) * inv_n
        cc = jnp.sum(c * c, axis=-1) * inv_n
        sc = jnp.sum(s * c, axis=-1) * inv_n
        s1 = jnp.sum(s, axis=-1) * inv_n
        c1 = jnp.sum(c, axis=-1) * inv_n
        ys = jnp.sum(y * s, axis=-1) * inv_n
        yc = jnp.sum(y * c, axis=-1) * inv_n
        y1 = jnp.mean(y, axis=-1)
        reg = jnp.asarray(1e-6, y.dtype)
        g11 = ss + reg
        g22 = cc + reg
        g33 = 1.0 + reg
        # Cramer adjugate of the symmetric 3x3 [[g11,sc,s1],[sc,g22,c1],
        # [s1,c1,g33]]
        a11 = g22 * g33 - c1 * c1
        a12 = s1 * c1 - sc * g33
        a13 = sc * c1 - g22 * s1
        a22 = g11 * g33 - s1 * s1
        a23 = sc * s1 - g11 * c1
        a33 = g11 * g22 - sc * sc
        det = g11 * a11 + sc * a12 + s1 * a13
        inv_det = 1.0 / det
        cb = (a11 * ys + a12 * yc + a13 * y1) * inv_det
        cd = (a12 * ys + a22 * yc + a23 * y1) * inv_det
        co = (a13 * ys + a23 * yc + a33 * y1) * inv_det
        coef = jnp.stack([cb, cd, co], axis=-1)
        # sse/n = yy/n - 2 coef.b + coef^T G coef (all normalized)
        gq = (
            cb * (g11 * cb + sc * cd + s1 * co)
            + cd * (sc * cb + g22 * cd + c1 * co)
            + co * (s1 * cb + c1 * cd + g33 * co)
        )
        sse = yy * inv_n - 2.0 * (cb * ys + cd * yc + co * y1) + gq
        return sse, coef

    # Two-stage fixed-size frequency grid around the FFT peak: shape-static,
    # batched replacement for a nonlinear freq refinement.  Stage 1 spans
    # +-1 bin in 17 points; stage 2 spans +-1 stage-1 step around the
    # winner — net resolution bin/64 (~0.0015 Hz at window 400 / dt 0.026).
    def grid_pick(center, half_span):
        offsets = jnp.linspace(-1.0, 1.0, 17).astype(y.dtype)
        cand = center[..., None] + offsets * half_span[..., None]  # (..., 17)
        # keep candidates away from 0 Hz (DC is handled by the offset term)
        cand = jnp.maximum(cand, 0.1 * bin_f[..., None])
        cand_t = jnp.moveaxis(cand, -1, 0)                         # (17, ...)
        sse, coef = ls_at(cand_t)
        best = jnp.argmin(sse, axis=0)
        freq = jnp.take_along_axis(cand_t, best[None, ...], axis=0)[0]
        coef = jnp.take_along_axis(coef, best[None, ..., None], axis=0)[0]
        return freq, coef

    freq, _ = grid_pick(kc * bin_f, bin_f)
    freq, coef = grid_pick(freq, bin_f / 8.0)
    B, D, off = coef[..., 0], coef[..., 1], coef[..., 2]
    amp = jnp.sqrt(B * B + D * D)
    phase = jnp.arctan2(D, B)
    return SinFit(amp=amp, freq=freq, phase=phase, offset=off), B, D


def update(
    state: EstimatorState,
    sim_time: jnp.ndarray,
    f_ext: jnp.ndarray,
    cfg: EstimatorConfig,
    ema_smooth=None,
    ema_static=None,
) -> tuple[EstimatorState, jnp.ndarray]:
    """One estimator step (per MPC solve).  Returns (new_state, f_for_qp).

    mode="faithful": f_for_qp is f_est once count > freeze_after, zeros
    before (SolverMPC.cpp:808-814); the fit freezes after freeze_after.
    mode="ls": continuous refit; released once count >= ls_release.

    ema_smooth / ema_static: live-tunable (traced) overrides of the
    config EMAs (TunableParams tier).
    """
    if ema_smooth is None:
        ema_smooth = cfg.ema_smooth
    if ema_static is None:
        ema_static = cfg.ema_static
    dtype = state.diffs.dtype
    times = jnp.concatenate(
        [state.times[..., 1:], sim_time[..., None].astype(dtype)], axis=-1
    )
    diffs = jnp.concatenate(
        [state.diffs[..., 1:], f_ext[..., 3][..., None].astype(dtype)], axis=-1
    )
    wrench_hist = jnp.concatenate(
        [state.wrench_hist[..., 1:, :], f_ext[..., None, :].astype(dtype)],
        axis=-2,
    )
    count = state.count + 1
    two_pi = jnp.asarray(2.0 * np.pi, dtype)

    est6 = (state.est6_freq, state.est6_stat, state.est6_sin, state.est6_cos)
    if cfg.mode == "ls6":
        # full-wrench fit: every component of the residual gets its own
        # per-component sinusoid LS (beyond the reference, which only
        # tracks f_ext[3] — SolverMPC.cpp:692-698): component rides a
        # trailing batch axis through the same fit machinery.
        y6 = gaussian_filter(
            jnp.moveaxis(wrench_hist, -1, -2), cfg.sigma_fast
        )                                                   # (..., 6, w)
        fit6, B6, D6 = fit_sin_ls(times[..., None, :], y6)
        fit_active = (count >= cfg.window)[..., None]
        est6_freq = jnp.where(fit_active, fit6.freq, state.est6_freq)
        est6_stat = jnp.where(fit_active, fit6.offset, state.est6_stat)
        est6_sin = jnp.where(fit_active, B6, state.est6_sin)
        est6_cos = jnp.where(fit_active, D6, state.est6_cos)
        est6 = (est6_freq, est6_stat, est6_sin, est6_cos)

        wt6 = two_pi * est6_freq * sim_time[..., None]
        comp6 = est6_stat + est6_sin * jnp.sin(wt6) + est6_cos * jnp.cos(wt6)
        release = count >= cfg.ls_release
        have_fit = count >= cfg.window
        f_est = jnp.where(have_fit[..., None], comp6, state.f_est)
        f_est_smoothed = ema_smooth * state.f_est_smoothed + (
            1.0 - ema_smooth
        ) * f_est
        f_est_static = (
            ema_static * state.f_est_static
            + (1.0 - ema_static) * f_ext
        )
        new_state = state._replace(
            times=times, diffs=diffs, wrench_hist=wrench_hist, count=count,
            est6_freq=est6_freq, est6_stat=est6_stat, est6_sin=est6_sin,
            est6_cos=est6_cos, f_est=f_est, f_est_smoothed=f_est_smoothed,
            f_est_static=f_est_static,
            # mirror component 3 into the scalar telemetry fields
            est_freq=est6_freq[..., 3], est_stat=est6_stat[..., 3],
            est_sin=est6_sin[..., 3], est_cos=est6_cos[..., 3],
            est_amp=jnp.sqrt(
                est6_sin[..., 3] ** 2 + est6_cos[..., 3] ** 2
            ),
        )
        f_for_qp = jnp.where(
            release[..., None], f_est, jnp.zeros_like(f_est)
        )
        return new_state, f_for_qp

    if cfg.mode in ("off", "static"):
        # The paper's two baseline arms (README "Results": adaptive MPC
        # vs static compensation vs none; raisim driver experiment,
        # raisim_unitree_ros_driver.cpp:601-621):
        # - "off": no compensation reaches the QP;
        # - "static": only the EMA'd raw residual (the reference's
        #   f_est_static, SolverMPC.cpp:798) — tracks the DC offset but
        #   not the sinusoid.
        f_est_static = state.f_est_static.at[..., 3].set(
            ema_static * state.f_est_static[..., 3]
            + (1.0 - ema_static) * f_ext[..., 3]
        )
        new_state = state._replace(
            times=times, diffs=diffs, wrench_hist=wrench_hist, count=count,
            f_est_static=f_est_static,
        )
        if cfg.mode == "off":
            return new_state, jnp.zeros_like(state.f_est)
        release = count >= cfg.ls_release
        f_for_qp = jnp.where(
            release[..., None], f_est_static, jnp.zeros_like(f_est_static)
        )
        return new_state, f_for_qp

    if cfg.mode == "faithful":
        blurred = gaussian_filter(diffs, cfg.sigma_fast)
        very_blurred = gaussian_filter(diffs, cfg.sigma_slow)
        fit = fit_sin(times, blurred - very_blurred)

        fit_active = (count >= cfg.window) & (count <= cfg.freeze_after)
        est_amp = jnp.where(fit_active, fit.amp, state.est_amp)
        est_freq = jnp.where(fit_active, fit.freq, state.est_freq)
        est_phase = jnp.where(fit_active, fit.phase, state.est_phase)
        est_stat = jnp.where(fit_active, fit.offset, state.est_stat)
        est_sin, est_cos = state.est_sin, state.est_cos

        comp = est_amp + jnp.sin(two_pi * sim_time * est_freq + est_phase)
        release = count > cfg.freeze_after
    elif cfg.mode == "ls":
        blurred = gaussian_filter(diffs, cfg.sigma_fast)
        fit, B, D = fit_sin_ls(times, blurred)
        fit_active = count >= cfg.window
        est_amp = jnp.where(fit_active, fit.amp, state.est_amp)
        est_freq = jnp.where(fit_active, fit.freq, state.est_freq)
        est_phase = jnp.where(fit_active, fit.phase, state.est_phase)
        est_stat = jnp.where(fit_active, fit.offset, state.est_stat)
        est_sin = jnp.where(fit_active, B, state.est_sin)
        est_cos = jnp.where(fit_active, D, state.est_cos)

        wt = two_pi * est_freq * sim_time
        comp = est_stat + est_sin * jnp.sin(wt) + est_cos * jnp.cos(wt)
        release = count >= cfg.ls_release
    else:
        raise ValueError(f"unknown estimator mode {cfg.mode!r}")

    have_fit = count >= cfg.window
    f_est = state.f_est.at[..., 3].set(
        jnp.where(have_fit, comp, state.f_est[..., 3])
    )
    f_est_smoothed = ema_smooth * state.f_est_smoothed + (
        1.0 - ema_smooth
    ) * f_est
    f_est_static = state.f_est_static.at[..., 3].set(
        ema_static * state.f_est_static[..., 3]
        + (1.0 - ema_static) * f_ext[..., 3]
    )

    new_state = state._replace(
        times=times, diffs=diffs, wrench_hist=wrench_hist, count=count,
        est_amp=est_amp, est_freq=est_freq, est_phase=est_phase,
        est_stat=est_stat, est_sin=est_sin, est_cos=est_cos,
        f_est=f_est, f_est_smoothed=f_est_smoothed,
        f_est_static=f_est_static,
    )
    f_for_qp = jnp.where(
        release[..., None], f_est, jnp.zeros_like(f_est)
    )
    return new_state, f_for_qp


def predict_horizon(
    state: EstimatorState,
    sim_time: jnp.ndarray,
    dt_step: float,
    horizon: int,
    cfg: EstimatorConfig,
) -> jnp.ndarray:
    """Per-step predicted wrench over the MPC horizon (..., h, 6).

    Extends the compensation beyond the reference's constant-wrench
    assumption: with the ls fit (stat, B sin + D cos at freq f), the
    disturbance at t + k dt is evaluated per step — a 0.33 Hz signal
    changes ~30% across the 0.26 s horizon, which the constant model
    ignores.  Released on the same schedule as update()'s f_for_qp.
    """
    dtype = state.diffs.dtype
    k = jnp.arange(horizon, dtype=dtype) * jnp.asarray(dt_step, dtype)
    t_steps = sim_time[..., None] + k                      # (..., h)
    two_pi = jnp.asarray(2.0 * np.pi, dtype)
    if cfg.mode == "ls6":
        wt6 = two_pi * state.est6_freq[..., None, :] * t_steps[..., None]
        w = (
            state.est6_stat[..., None, :]
            + state.est6_sin[..., None, :] * jnp.sin(wt6)
            + state.est6_cos[..., None, :] * jnp.cos(wt6)
        )                                                  # (..., h, 6)
        release = state.count >= cfg.ls_release
        return jnp.where(release[..., None, None], w, jnp.zeros_like(w))
    wt = two_pi * state.est_freq[..., None] * t_steps
    if cfg.mode == "ls":
        comp = (
            state.est_stat[..., None]
            + state.est_sin[..., None] * jnp.sin(wt)
            + state.est_cos[..., None] * jnp.cos(wt)
        )
        release = state.count >= cfg.ls_release
    else:
        comp = state.est_amp[..., None] + jnp.sin(
            wt + state.est_phase[..., None]
        )
        release = state.count > cfg.freeze_after
    w = jnp.zeros(comp.shape[:-1] + (horizon, 6), dtype)
    w = w.at[..., 3].set(comp)
    return jnp.where(release[..., None, None], w, jnp.zeros_like(w))


def residual_f_ext(
    x_k: jnp.ndarray,
    x_prev: jnp.ndarray,
    u_prev_forces: jnp.ndarray,
    R_prev: jnp.ndarray,
    r_feet_prev: jnp.ndarray,
    mass,
    I_body_diag: jnp.ndarray,
    x_drag_prev,
) -> jnp.ndarray:
    """The reference's residual f_ext (ConvexMPCLocomotion.cpp:639-776).

    Args:
      x_k, x_prev: (..., 13) current / previous packed states.
      u_prev_forces: (..., 4, 3) previous f_ff (world-frame feedforward
        forces); the reference feeds u_prev = -f_ff
        (ConvexMPCLocomotion.cpp:748-759).
      R_prev: (..., 3, 3) previous full rotation matrix (the round-tripped
        R built from rpy, ConvexMPCLocomotion.cpp:1081-1097).
      r_feet_prev: (..., 4, 3) previous foot offsets r (world, CoM-rel).

    Returns (..., 6) f_ext with the reference's sign pattern
    (ConvexMPCLocomotion.cpp:771).
    """
    from quad_periodic_mpc_tpu.models import srb

    A_prev, B_prev, _ = srb.ct_dynamics(
        R_prev, r_feet_prev, mass, I_body_diag, x_drag_prev
    )
    u_prev = -u_prev_forces.reshape(u_prev_forces.shape[:-2] + (12,))
    f_full = (
        x_k
        - jnp.einsum("...ij,...j->...i", A_prev, x_prev)
        - jnp.einsum("...ij,...j->...i", B_prev, u_prev)
    )
    seg = f_full[..., 6:12]
    sign = jnp.asarray([-1.0, -1.0, 1.0, 1.0, 1.0, 1.0], x_k.dtype)
    return seg * sign


def residual_discrete(
    x_k: jnp.ndarray,
    x_prev: jnp.ndarray,
    u_prev_forces: jnp.ndarray,
    R_prev: jnp.ndarray,
    r_feet_prev: jnp.ndarray,
    mass,
    I_body_diag: jnp.ndarray,
    x_drag_prev,
    dt,
) -> jnp.ndarray:
    """Proper discrete disturbance residual (recommended for mode="ls").

    Solves the least-squares problem Qd w = x_k - Ad x_prev - Bd u_prev
    for the acceleration-space wrench w (the xi of the README's
    Q_d-augmented model).  u_prev here are the MPC's world-frame reaction
    forces Fr_des (NOT the negated f_ff — this path is self-consistent
    with the model the plant/QP use).

    MATRIX-FREE (round 5): the original implementation re-ran
    srb.ct_dynamics + discretize.nilpotent_zoh (the scatter-heavy 13x13
    assembly the fused MPC kernel exists to avoid) plus a tiny batched
    jnp.linalg.solve — together ~3.5 ms/step at batch 2048, ~45% of the
    whole production MPC step once this became the default residual.
    The nilpotent structure (A^2 has only row 5; A^3 = 0, see
    models/srb.ct_dynamics) makes every product a handful of vector
    ops: Adt x_prev and Bdt u_prev are applied directly, Qdt is built
    column-wise (no scatter), and the 6x6 normal equations go through
    linalg.spd_inverse.  Matches the assembled path to f32 roundoff
    (tests/test_estimator.py::test_residual_discrete_matrix_free).
    """
    from quad_periodic_mpc_tpu.ops import linalg

    dtype = x_k.dtype
    dts = jnp.asarray(dt, dtype)
    xd = jnp.asarray(x_drag_prev, dtype)
    RT = jnp.swapaxes(R_prev, -1, -2)

    def apply_A(v):
        """Continuous A @ v, state [rpy, p, omega, vel, g]:
        rows 0:3 = R^T v[6:9], rows 3:6 = v[9:12],
        row 11 = x_drag v[9] + v[12], everything else zero."""
        top = jnp.einsum("...ij,...j->...i", RT, v[..., 6:9])
        mid = v[..., 9:12]
        z3 = jnp.zeros_like(top)
        z1 = jnp.zeros_like(v[..., 0:1])
        row11 = xd[..., None] * v[..., 9:10] + v[..., 12:13]
        return jnp.concatenate(
            [top, mid, z3, z1, z1, row11, z1], axis=-1
        )

    def a2_row5(v):
        """(A^2 v)[5] — the only nonzero row of A^2."""
        return xd * v[..., 9] + v[..., 12]

    def apply_Phi(v):
        """Phi v = dt v + dt^2/2 A v + dt^3/6 A^2 v."""
        out = dts * v + (dts * dts / 2.0) * apply_A(v)
        return out.at[..., 5].add((dts ** 3 / 6.0) * a2_row5(v))

    # B u in acceleration space: omega_dot = I_world^{-1} sum r_b x f_b,
    # v_dot = sum f_b / m (I_world^{-1} = R diag(1/I) R^T)
    I_inv_diag = 1.0 / jnp.asarray(I_body_diag, dtype)
    tau_w = jnp.cross(r_feet_prev, u_prev_forces).sum(axis=-2)
    omega_dot = jnp.einsum(
        "...ij,...j->...i", R_prev,
        I_inv_diag * jnp.einsum("...ij,...j->...i", RT, tau_w),
    )
    v_dot = u_prev_forces.sum(axis=-2) / jnp.asarray(mass, dtype)
    z3 = jnp.zeros_like(v_dot)
    z1 = jnp.zeros_like(v_dot[..., 0:1])
    Bu = jnp.concatenate([z3, z3, omega_dot, v_dot, z1], axis=-1)

    Adt_x = (
        x_prev + dts * apply_A(x_prev)
    ).at[..., 5].add((dts * dts / 2.0) * a2_row5(x_prev))
    xi = x_k - Adt_x - apply_Phi(Bu)

    # Qdt columns = Phi e_{6+i} (Qc rows 6:12 = I_6), built column-wise
    batch = xi.shape[:-1]
    cols = []
    for i in range(6):
        e = jnp.zeros(batch + (13,), dtype).at[..., 6 + i].set(1.0)
        cols.append(apply_Phi(e))
    Qdt = jnp.stack(cols, axis=-1)                          # (..., 13, 6)

    # normal equations via the exact Schur spd_inverse (jnp.linalg.solve
    # on tiny batched systems is the known TPU pathology)
    G = jnp.einsum("...ni,...nj->...ij", Qdt, Qdt)
    b = jnp.einsum("...ni,...n->...i", Qdt, xi)
    return jnp.einsum("...ij,...j->...i", linalg.spd_inverse(G), b)
