"""be2r height estimator — the t265/odometry-era KF variant.

Re-implements be2rPositionVelocityEstimator.cpp (run(): offset
calibration over the first 500 ticks at :67-73, bias-corrected accel
:79, simpleKalman adaptive 1-D filters :82 (k=1.0 on a_z) and :106
(k=0.1 on v_z), double integration z += v dt + a dt^2/2 at :107,
heightBody output :110) as a pure batched step function.

The reference's `simpleKalman` (be2rPositionVelocityEstimator.cpp:
144-160) is a scalar adaptive filter whose measurement-error estimate
feeds back the innovation magnitude:

    g   = e / (e + r)
    est = est + g (x - est)
    e   = (1 - g) e + |est_new - est_old| * q,   q = dt

NOTE (faithfulness): the C++ holds that filter's state in FUNCTION-LOCAL
STATICS, so the a_z (k=1.0) and v_z (k=0.1) call sites SHARE one
(e, est) pair — a storage bug that cross-couples the two channels.  We
keep per-channel state (the evident intent); set `shared_state=True` in
`step` to reproduce the bug bit-for-bit for parity studies.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

CALIB_TICKS = 500  # be2rPositionVelocityEstimator.cpp:67


class SimpleKalman(NamedTuple):
    """State of the reference's adaptive scalar filter (est, err)."""

    est: jnp.ndarray
    err: jnp.ndarray


def simple_kalman(
    s: SimpleKalman, x: jnp.ndarray, dt, k
) -> tuple[SimpleKalman, jnp.ndarray]:
    """One update of simpleKalman (be2rPositionVelocityEstimator.cpp:144)."""
    g = s.err / (s.err + k)
    est = s.est + g * (x - s.est)
    err = (1.0 - g) * s.err + jnp.abs(est - s.est) * dt
    return SimpleKalman(est=est, err=err), est


class Be2rState(NamedTuple):
    count: jnp.ndarray        # (...,) int32 calibration counter
    acc_offset: jnp.ndarray   # (..., 3) summed world accel during calib
    vel_offset: jnp.ndarray   # (...,) summed v_z during calib
    kf_acc: SimpleKalman      # a_z channel (k = 1.0)
    kf_vel: SimpleKalman      # v_z channel (k = 0.1)
    v_body_z: jnp.ndarray     # integrated vertical velocity (diagnostic)
    z: jnp.ndarray            # estimated body height


def init(batch: tuple = (), dtype=jnp.float32) -> Be2rState:
    """setup() initial conditions: z = 0.056 (p_body init, :29/:42)."""
    zeros = jnp.zeros(batch, dtype)

    def kf(k):
        # _err_estimate is initialized to _err_measure on first call (:151)
        return SimpleKalman(est=zeros, err=jnp.full(batch, k, dtype))

    return Be2rState(
        count=jnp.zeros(batch, jnp.int32),
        acc_offset=jnp.zeros(batch + (3,), dtype),
        vel_offset=zeros,
        kf_acc=kf(1.0),
        kf_vel=kf(0.1),
        v_body_z=zeros,
        z=jnp.full(batch, 0.056, dtype),
    )


def step(
    s: Be2rState,
    a_world: jnp.ndarray,   # (..., 3) world-frame acceleration (with g removed)
    v_world_z: jnp.ndarray, # (...,) world-frame vertical velocity (e.g. leg-odom)
    dt: float = 0.002,
    shared_state: bool = False,
) -> Be2rState:
    """One 500 Hz tick.  Calibrating instances accumulate offsets; the
    rest run the filter+integrate pipeline.  Branch-free (where-masked),
    so mixed-phase batches are fine."""
    a_world = a_world.astype(s.z.dtype)
    v_world_z = jnp.asarray(v_world_z, s.z.dtype)
    calibrating = s.count <= CALIB_TICKS
    cal = calibrating.astype(a_world.dtype)

    acc_offset = s.acc_offset + cal[..., None] * a_world
    vel_offset = s.vel_offset + cal * v_world_z
    count = s.count + calibrating.astype(jnp.int32)

    a_z = a_world[..., 2] - acc_offset[..., 2] / CALIB_TICKS
    kf_acc, acc_z = simple_kalman(s.kf_acc, a_z, dt, 1.0)
    v_body_z = s.v_body_z + acc_z * dt

    vel_raw = v_world_z - vel_offset / CALIB_TICKS
    kf_vel_in = SimpleKalman(est=kf_acc.est, err=kf_acc.err) if shared_state \
        else s.kf_vel
    kf_vel, vel = simple_kalman(kf_vel_in, vel_raw, dt, 0.1)
    if shared_state:
        kf_acc = kf_vel
    z = s.z + vel * dt + 0.5 * acc_z * dt * dt

    keep = calibrating

    def sel(new, old):
        k = keep
        while k.ndim < new.ndim:
            k = k[..., None]
        return jnp.where(k, old, new)

    return Be2rState(
        count=count,
        acc_offset=acc_offset,
        vel_offset=vel_offset,
        kf_acc=SimpleKalman(sel(kf_acc.est, s.kf_acc.est),
                            sel(kf_acc.err, s.kf_acc.err)),
        kf_vel=SimpleKalman(sel(kf_vel.est, s.kf_vel.est),
                            sel(kf_vel.err, s.kf_vel.err)),
        v_body_z=sel(v_body_z, s.v_body_z),
        z=sel(z, s.z),
    )
