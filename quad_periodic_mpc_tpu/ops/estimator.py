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
import jax.numpy as jnp

from quad_periodic_mpc_tpu.config import EstimatorConfig


class EstimatorState(NamedTuple):
    times: jnp.ndarray        # (..., window) ordered, newest last
    diffs: jnp.ndarray        # (..., window)
    count: jnp.ndarray        # (...,) int32 samples pushed
    est_amp: jnp.ndarray      # (...,)
    est_freq: jnp.ndarray     # (...,)
    est_phase: jnp.ndarray    # (...,)
    est_stat: jnp.ndarray     # (...,)
    f_est: jnp.ndarray        # (..., 6)
    f_est_smoothed: jnp.ndarray   # (..., 6)
    f_est_static: jnp.ndarray     # (..., 6)


def init(batch: tuple = (), window: int = 400, dtype=jnp.float32) -> EstimatorState:
    z = functools.partial(jnp.zeros, dtype=dtype)
    return EstimatorState(
        times=z(batch + (window,)),
        diffs=z(batch + (window,)),
        count=jnp.zeros(batch, jnp.int32),
        est_amp=z(batch),
        est_freq=z(batch),
        est_phase=z(batch),
        est_stat=z(batch),
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


def gaussian_filter(x: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Edge-replicated 1-D Gaussian blur along the last axis, batched."""
    k = jnp.asarray(_gauss_kernel(sigma), x.dtype)
    radius = (k.shape[0] - 1) // 2
    pad = [(0, 0)] * (x.ndim - 1) + [(radius, radius)]
    xp = jnp.pad(x, pad, mode="edge")
    # correlation via sliding windows: out[i] = sum_j k[j] xp[i + j]
    idx = jnp.arange(x.shape[-1])[:, None] + jnp.arange(k.shape[0])[None, :]
    return jnp.einsum("j,...ij->...i", k, xp[..., idx])


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
        amp=s * np.sqrt(2.0),
        freq=freq,
        phase=jnp.zeros_like(freq),
        offset=m,
    )


def update(
    state: EstimatorState,
    sim_time: jnp.ndarray,
    f_ext: jnp.ndarray,
    cfg: EstimatorConfig,
) -> tuple[EstimatorState, jnp.ndarray]:
    """One estimator step (per MPC solve).  Returns (new_state, f_for_qp).

    f_for_qp is the wrench the QP gradient consumes: f_est once
    count > freeze_after, zeros before (SolverMPC.cpp:808-814).
    """
    dtype = state.diffs.dtype
    times = jnp.concatenate(
        [state.times[..., 1:], sim_time[..., None].astype(dtype)], axis=-1
    )
    diffs = jnp.concatenate(
        [state.diffs[..., 1:], f_ext[..., 3][..., None].astype(dtype)], axis=-1
    )
    count = state.count + 1

    blurred = gaussian_filter(diffs, cfg.sigma_fast)
    very_blurred = gaussian_filter(diffs, cfg.sigma_slow)
    fit = fit_sin(times, blurred - very_blurred)

    fit_active = (count >= cfg.window) & (count <= cfg.freeze_after)
    est_amp = jnp.where(fit_active, fit.amp, state.est_amp)
    est_freq = jnp.where(fit_active, fit.freq, state.est_freq)
    est_phase = jnp.where(fit_active, fit.phase, state.est_phase)
    est_stat = jnp.where(fit_active, fit.offset, state.est_stat)

    two_pi = jnp.asarray(2.0 * np.pi, dtype)
    phase_arg = two_pi * sim_time * est_freq + est_phase
    if cfg.faithful:
        comp = est_amp + jnp.sin(phase_arg)       # SolverMPC.cpp:766 (sic)
    else:
        comp = est_stat + est_amp * jnp.sin(phase_arg)

    have_fit = count >= cfg.window
    f_est = state.f_est.at[..., 3].set(
        jnp.where(have_fit, comp, state.f_est[..., 3])
    )
    f_est_smoothed = cfg.ema_smooth * state.f_est_smoothed + (
        1.0 - cfg.ema_smooth
    ) * f_est
    f_est_static = state.f_est_static.at[..., 3].set(
        cfg.ema_static * state.f_est_static[..., 3]
        + (1.0 - cfg.ema_static) * f_ext[..., 3]
    )

    new_state = EstimatorState(
        times=times, diffs=diffs, count=count,
        est_amp=est_amp, est_freq=est_freq, est_phase=est_phase,
        est_stat=est_stat, f_est=f_est, f_est_smoothed=f_est_smoothed,
        f_est_static=f_est_static,
    )
    f_for_qp = jnp.where(
        (count > cfg.freeze_after)[..., None], f_est, jnp.zeros_like(f_est)
    )
    return new_state, f_for_qp


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
