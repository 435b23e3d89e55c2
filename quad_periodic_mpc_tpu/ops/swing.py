"""Cubic-Bezier swing-foot trajectories, vectorized over legs x instances.

Rebuilds FootSwingTrajectory (FootSwingTrajectory.cpp:17-41) +
Interpolate::cubicBezier* (Math/Interpolation.h) as pure functions of
(p0, pf, height, phase, swing_time): xy follow one cubic Bezier over the
whole swing; z runs two stacked Beziers (lift to p0.z + height over
phase in [0, 0.5], land to pf.z over [0.5, 1]).

The reference mutates per-leg trajectory objects; here the swing state is
just (p0, pf) arrays carried by the control loop, so the whole batch of
leg trajectories evaluates as a couple of fused VPU expressions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


def cubic_bezier(y0, yf, x):
    """y0 + (x^3 + 3 x^2 (1 - x)) (yf - y0)  (Interpolation.h:30-37)."""
    b = x * x * x + 3.0 * (x * x * (1.0 - x))
    return y0 + b * (yf - y0)


def cubic_bezier_d1(y0, yf, x):
    """First derivative wrt x (Interpolation.h:44-51)."""
    return 6.0 * x * (1.0 - x) * (yf - y0)


def cubic_bezier_d2(y0, yf, x):
    """Second derivative wrt x (Interpolation.h:58-65)."""
    return (6.0 - 12.0 * x) * (yf - y0)


class SwingEval(NamedTuple):
    p: jnp.ndarray   # (..., 3) position
    v: jnp.ndarray   # (..., 3) velocity
    a: jnp.ndarray   # (..., 3) acceleration


def evaluate(
    p0: jnp.ndarray,
    pf: jnp.ndarray,
    height,
    phase: jnp.ndarray,
    swing_time: jnp.ndarray,
) -> SwingEval:
    """Evaluate the swing curve at phase in [0, 1].

    Matches computeSwingTrajectoryBezier (FootSwingTrajectory.cpp:17-41):
    xy single-segment Bezier; z two-segment lift/land with chain-rule
    factors 2/swingTime and 4/swingTime^2.
    """
    ph = phase[..., None]
    st = swing_time[..., None]
    p = cubic_bezier(p0, pf, ph)
    v = cubic_bezier_d1(p0, pf, ph) / st
    a = cubic_bezier_d2(p0, pf, ph) / (st * st)

    z0 = p0[..., 2]
    zf = pf[..., 2]
    zmid = z0 + jnp.asarray(height, p0.dtype)
    first = phase < 0.5
    x1 = phase * 2.0
    x2 = phase * 2.0 - 1.0
    stz = swing_time

    zp = jnp.where(
        first, cubic_bezier(z0, zmid, x1), cubic_bezier(zmid, zf, x2)
    )
    zv = jnp.where(
        first,
        cubic_bezier_d1(z0, zmid, x1) * 2.0 / stz,
        cubic_bezier_d1(zmid, zf, x2) * 2.0 / stz,
    )
    za = jnp.where(
        first,
        cubic_bezier_d2(z0, zmid, x1) * 4.0 / (stz * stz),
        cubic_bezier_d2(zmid, zf, x2) * 4.0 / (stz * stz),
    )
    p = p.at[..., 2].set(zp)
    v = v.at[..., 2].set(zv)
    a = a.at[..., 2].set(za)
    return SwingEval(p=p, v=v, a=a)


def evaluate_stairs(
    p0: jnp.ndarray,
    pf: jnp.ndarray,
    height,
    phase: jnp.ndarray,
    swing_time: jnp.ndarray,
) -> SwingEval:
    """Stairs variant (computeStairsSwingTrajectoryBezier,
    FootSwingTrajectory.cpp:49-97): xy hold in each half-segment while z
    clears the riser — x/y position stays at p0 until mid-swing and the
    velocity/acceleration profile uses the 1/3-waypoint Beziers.
    """
    ph = phase
    st = swing_time
    first = ph < 0.5
    x1 = ph * 2.0
    x2 = ph * 2.0 - 1.0

    def seg(c, which):
        y0 = p0[..., c]
        yf = pf[..., c]
        ymid = y0 + (yf - y0) / 3.0
        if which == "p":
            return jnp.where(
                first, cubic_bezier(y0, y0, x1), cubic_bezier(y0, y0, x2)
            )
        if which == "v":
            return jnp.where(
                first,
                cubic_bezier_d1(y0, ymid, x1) * 2.0 / st,
                cubic_bezier_d1(ymid, yf, x2) * 2.0 / st,
            )
        return jnp.where(
            first,
            cubic_bezier_d2(y0, ymid, x1) * 4.0 / (st * st),
            cubic_bezier_d2(ymid, yf, x2) * 4.0 / (st * st),
        )

    base = evaluate(p0, pf, height, phase, swing_time)   # supplies z rows
    p = base.p
    v = base.v
    a = base.a
    for c in range(2):
        p = p.at[..., c].set(seg(c, "p"))
        v = v.at[..., c].set(seg(c, "v"))
        a = a.at[..., c].set(seg(c, "a"))
    return SwingEval(p=p, v=v, a=a)


def raibert_foothold(
    p_body: jnp.ndarray,
    v_world: jnp.ndarray,
    v_des_world: jnp.ndarray,
    v_des_robot: jnp.ndarray,
    R_body: jnp.ndarray,
    hip_location: jnp.ndarray,
    side_sign: jnp.ndarray,
    abad_link_length,
    yaw_turn_rate,
    stance_time: jnp.ndarray,
    swing_time_remaining: jnp.ndarray,
    body_height_z: jnp.ndarray,
    interleave_y: jnp.ndarray,
    interleave_gain,
    bonus_swing,
    p_rel_max,
    dt_mpc,
) -> jnp.ndarray:
    """Raibert-heuristic swing target Pf (ConvexMPCLocomotion.cpp:287-331).

    All leg-indexed args carry a trailing leg axis (..., 4) or (..., 4, 3).
    Returns (..., 4, 3) world-frame footholds with z = 0.

    Faithfully reproduces the reference expression, including its quirks:
    the y-speed term multiplies stance_time by dtMPC once more than x
    does (ConvexMPCLocomotion.cpp:320), and the yaw correction rotates by
    -yaw_rate * stance_time / 2.
    """
    dtype = p_body.dtype
    v_abs = jnp.abs(v_des_robot[..., 0:1])
    offset_y = side_sign * jnp.asarray(abad_link_length, dtype)
    p_robot = hip_location.at[..., 1].add(
        offset_y + interleave_y * v_abs * jnp.asarray(interleave_gain, dtype)
    )

    # coordinateRotation(Z, th) (orientation_tools.h:85) is the transpose of
    # the active rotation Rz(th); the reference's coordinateRotation(Z,
    # -yaw_rate*ts/2) @ p is therefore an ACTIVE rotation by +yaw_rate*ts/2.
    ang = yaw_turn_rate * stance_time / 2.0
    c, s = jnp.cos(ang), jnp.sin(ang)
    px, py, pz = p_robot[..., 0], p_robot[..., 1], p_robot[..., 2]
    p_yaw = jnp.stack([c * px - s * py, s * px + c * py, pz], axis=-1)

    des_vel = jnp.concatenate(
        [v_des_robot[..., :2], jnp.zeros_like(v_des_robot[..., :1])], axis=-1
    )
    pf = p_body[..., None, :] + jnp.einsum(
        "...ij,...kj->...ki",
        jnp.swapaxes(R_body, -1, -2),
        p_yaw + des_vel[..., None, :] * swing_time_remaining[..., None],
    )

    g = jnp.asarray(9.81, dtype)
    pfx_rel = (
        v_world[..., 0:1] * (0.5 + jnp.asarray(bonus_swing, dtype)) * stance_time
        + 0.03 * (v_world[..., 0:1] - v_des_world[..., 0:1])
        + (0.5 * body_height_z[..., None] / g)
        * (v_world[..., 1:2] * yaw_turn_rate)
    )
    pfy_rel = (
        v_world[..., 1:2] * 0.5 * stance_time * jnp.asarray(dt_mpc, dtype)
        + 0.03 * (v_world[..., 1:2] - v_des_world[..., 1:2])
        + (0.5 * body_height_z[..., None] / g)
        * (-v_world[..., 0:1] * yaw_turn_rate)
    )
    m = jnp.asarray(p_rel_max, dtype)
    pfx_rel = jnp.clip(pfx_rel, -m, m)
    pfy_rel = jnp.clip(pfy_rel, -m, m)
    pf = pf.at[..., 0].add(pfx_rel)
    pf = pf.at[..., 1].add(pfy_rel)
    pf = pf.at[..., 2].set(0.0)
    return pf
