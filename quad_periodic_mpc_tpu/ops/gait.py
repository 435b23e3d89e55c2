"""Offset-duration gait timing, vectorized.

Rebuilds OffsetDurationGait (Gait.cpp) as pure integer/float array math:
a gait is (offsets[4], durations[4], n_segments) in MPC segments; phases
and the horizon contact table are functions of the global iteration
counter — no mutable gait object, so the whole thing vmaps over gaits,
phase offsets, and batch instances.

The 12 preset gaits mirror ConvexMPCLocomotion.cpp:41-52 at
GAIT_PERIOD = 20 segments (the MixedFrequency "random" gaits are modeled
by their own table-builder below).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp


class GaitParams(NamedTuple):
    """Array-of-struct gait parameters; every field may carry batch dims."""

    offsets: jnp.ndarray      # (..., 4) int segments
    durations: jnp.ndarray    # (..., 4) int segments (stance length)
    n_segments: jnp.ndarray   # (...,) int period in MPC segments


def _preset_tables(period: int) -> dict[str, tuple[tuple[int, ...], tuple[int, ...]]]:
    """(offsets, durations) per gait at a given period, reproducing the
    constructor expressions at ConvexMPCLocomotion.cpp:41-52.  The runtime
    period comes from the gait_period dyn param (default 16,
    ros_dynamic_params.cfg:111), not the GAIT_PERIOD #define."""
    p = period
    return {
        "trotting": ((0, p // 2, p // 2, 0), (p // 2,) * 4),
        "bounding": ((5, 5, 0, 0), (4, 4, 4, 4)),
        "pronking": ((0, 0, 0, 0), (8, 8, 8, 8)),
        "jumping": ((0, 0, 0, 0), (2, 2, 2, 2)),
        "galloping": ((0, 2, 7, 9), (4, 4, 4, 4)),
        "standing": ((0, 0, 0, 0), (p,) * 4),
        "trot_running": ((0, 5, 5, 0), (4, 4, 4, 4)),
        "walking": ((2 * p // 4, 0, p // 4, 3 * p // 4), (int(0.75 * p),) * 4),
        "walking2": ((0, 5, 5, 0), (7, 7, 7, 7)),
        "pacing": ((5, 0, 5, 0), (5, 5, 5, 5)),
        # CMPC-driver extras (CMPC_Locomotion.cpp:52-70)
        "trot_long": ((0, 16, 16, 0), (24, 24, 24, 24)),   # fixed period 32
        "trot_contact": ((0, p // 2, p // 2, 0), (p // 4,) * 4),
        "give_hand": ((0, 0, 0, 0), (p,) * 4),
        "two_leg_balance": ((0, 0, 0, 0), (p, p, p, 0)),
    }


# Gaits whose period is hardwired in the reference regardless of the
# gait_period dyn param (_gait_period_long = 32, CMPC_Locomotion.cpp:46)
_FIXED_PERIODS: dict[str, int] = {"trot_long": 32}


DEFAULT_PERIOD = 16
PRESET_GAITS = _preset_tables(DEFAULT_PERIOD)

# FSM gait-number -> preset name (ConvexMPCLocomotion.cpp:159-200)
GAIT_NUMBERS: dict[int, str] = {
    0: "trotting", 1: "bounding", 2: "pronking", 3: "jumping",
    4: "standing", 5: "trot_running", 6: "galloping", 8: "pacing",
    9: "trotting", 10: "walking", 11: "walking2",
}


def preset(name: str, period: int = DEFAULT_PERIOD, dtype=jnp.int32) -> GaitParams:
    period = _FIXED_PERIODS.get(name, period)
    off, dur = _preset_tables(period)[name]
    return GaitParams(
        offsets=jnp.asarray(off, dtype),
        durations=jnp.asarray(dur, dtype),
        n_segments=jnp.asarray(period, dtype),
    )


def stacked_presets(
    names: list[str] | None = None, period: int = DEFAULT_PERIOD
) -> GaitParams:
    """Stack presets along a leading gait axis (for gait-sweep batches)."""
    names = names or list(PRESET_GAITS)
    tables = _preset_tables(period)
    off = np.array([tables[n][0] for n in names], np.int32)
    dur = np.array([tables[n][1] for n in names], np.int32)
    seg = np.full((len(names),), period, np.int32)
    return GaitParams(jnp.asarray(off), jnp.asarray(dur), jnp.asarray(seg))


def phase(gait: GaitParams, iteration: jnp.ndarray, iters_per_mpc: int) -> jnp.ndarray:
    """Global gait phase in [0, 1) (setIterations, Gait.cpp:218-226)."""
    period_iters = iters_per_mpc * gait.n_segments
    return (iteration % period_iters).astype(jnp.float32) / period_iters.astype(
        jnp.float32
    )


def segment_index(
    gait: GaitParams, iteration: jnp.ndarray, iters_per_mpc: int
) -> jnp.ndarray:
    """Current MPC segment in [0, n_segments) (Gait.cpp:221)."""
    return (iteration // iters_per_mpc) % gait.n_segments


def contact_state(gait: GaitParams, ph: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) stance progress in (0, 1], 0 if in swing
    (getContactState, Gait.cpp:47-74)."""
    seg = gait.n_segments.astype(jnp.float32)[..., None]
    offset = gait.offsets.astype(jnp.float32) / seg
    duration = gait.durations.astype(jnp.float32) / seg
    offset = jnp.where(offset < 0, offset + 1.0, offset)
    progress = ph[..., None] - offset
    progress = jnp.where(progress < 0, progress + 1.0, progress)
    # duration 0 = always-swing leg (two_leg_balance): guard the 0/0
    return jnp.where(
        (progress > duration) | (duration <= 0.0),
        0.0,
        progress / jnp.where(duration > 0, duration, 1.0),
    )


def swing_state(gait: GaitParams, ph: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) swing progress in (0, 1), 0 if in stance
    (getSwingState, Gait.cpp:102-135)."""
    seg = gait.n_segments.astype(jnp.float32)[..., None]
    offset = gait.offsets.astype(jnp.float32) / seg
    duration = gait.durations.astype(jnp.float32) / seg
    swing_offset = offset + duration
    swing_offset = jnp.where(swing_offset > 1.0, swing_offset - 1.0, swing_offset)
    swing_duration = 1.0 - duration
    progress = ph[..., None] - swing_offset
    progress = jnp.where(progress < 0, progress + 1.0, progress)
    return jnp.where(
        progress >= swing_duration,
        0.0,
        progress / jnp.where(swing_duration > 0, swing_duration, 1.0),
    )


def mpc_table(
    gait: GaitParams,
    seg_idx: jnp.ndarray,
    horizon: int,
) -> jnp.ndarray:
    """(..., horizon, 4) contact table for the QP
    (getMpcTable, Gait.cpp:159-188).

    Step i looks at segment (i + seg_idx + 1) mod n_segments.
    """
    i = jnp.arange(horizon, dtype=seg_idx.dtype)
    iter_h = (i[..., :, None] + seg_idx[..., None, None] + 1) % gait.n_segments[
        ..., None, None
    ]
    progress = iter_h - gait.offsets[..., None, :]
    progress = jnp.where(
        progress < 0, progress + gait.n_segments[..., None, None], progress
    )
    return (progress < gait.durations[..., None, :]).astype(jnp.int32)


def swing_time(gait: GaitParams, dt_mpc: float) -> jnp.ndarray:
    """(..., 4) swing duration in seconds (getCurrentSwingTime uses leg 0's
    duration for all legs, Gait.cpp:252-256; we keep per-leg generality)."""
    return dt_mpc * (gait.n_segments[..., None] - gait.durations).astype(
        jnp.float32
    )


def stance_time(gait: GaitParams, dt_mpc: float) -> jnp.ndarray:
    """(..., 4) stance duration in seconds (Gait.cpp:263-267)."""
    return dt_mpc * gait.durations.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Mixed-frequency gaits: per-leg periods, shared duty cycle
# ---------------------------------------------------------------------------


class MixedGaitParams(NamedTuple):
    """MixedFrequncyGait (Gait.cpp:26-41): each leg cycles on its OWN
    period (in MPC segments) with a common duty cycle; legs drift in and
    out of phase instead of holding fixed offsets."""

    periods: jnp.ndarray      # (..., 4) int segments per leg
    duty_cycle: jnp.ndarray   # (...,) stance fraction in (0, 1)
    n_segments: jnp.ndarray   # (...,) horizon-table length


def mixed(
    periods=(10, 10, 10, 10), duty_cycle: float = 0.5, n_segments: int = 10,
) -> MixedGaitParams:
    return MixedGaitParams(
        periods=jnp.asarray(periods, jnp.int32),
        duty_cycle=jnp.asarray(duty_cycle, jnp.float32),
        n_segments=jnp.asarray(n_segments, jnp.int32),
    )


def mixed_phase(
    gait: MixedGaitParams, iteration: jnp.ndarray, iters_per_mpc: int
) -> jnp.ndarray:
    """(..., 4) per-leg phase (MixedFrequncyGait::setIterations,
    Gait.cpp:238-245): phase_i = (it mod ipm*T_i) / (ipm*T_i)."""
    span = iters_per_mpc * gait.periods
    return (iteration[..., None] % span).astype(jnp.float32) / span.astype(
        jnp.float32
    )


def mixed_contact_state(
    gait: MixedGaitParams, ph: jnp.ndarray
) -> jnp.ndarray:
    """Stance progress in [0,1], 0 while swinging (Gait.cpp:76-100)."""
    d = gait.duty_cycle[..., None]
    return jnp.where(ph > d, 0.0, ph / d)


def mixed_swing_state(gait: MixedGaitParams, ph: jnp.ndarray) -> jnp.ndarray:
    """Swing progress in [0,1], 0 while in stance (Gait.cpp:137-157)."""
    d = gait.duty_cycle[..., None]
    p = ph - d
    return jnp.where(p < 0.0, 0.0, p / (1.0 - d))


def mixed_mpc_table(
    gait: MixedGaitParams,
    iteration: jnp.ndarray,
    iters_per_mpc: int,
    horizon: int,
) -> jnp.ndarray:
    """(..., horizon, 4) contact table (Gait.cpp:190-215): leg j is in
    stance at future segment i iff (i + itr + 1) mod T_j < T_j * duty,
    with itr the UNWRAPPED segment counter (the reference deliberately
    drops the % nIterations here, Gait.cpp:230)."""
    itr = iteration // iters_per_mpc
    i = jnp.arange(horizon, dtype=jnp.int32)
    prog = (
        i[:, None] + itr[..., None, None] + 1
    ) % gait.periods[..., None, :]
    thresh = gait.periods[..., None, :].astype(jnp.float32) * gait.duty_cycle[
        ..., None, None
    ]
    return (prog.astype(jnp.float32) < thresh).astype(jnp.int32)


def mixed_swing_time(gait: MixedGaitParams, dt_mpc: float) -> jnp.ndarray:
    """(..., 4) seconds of swing per leg (Gait.cpp:258-261)."""
    return dt_mpc * (1.0 - gait.duty_cycle[..., None]) * gait.periods


def mixed_stance_time(gait: MixedGaitParams, dt_mpc: float) -> jnp.ndarray:
    """(..., 4) seconds of stance per leg (Gait.cpp:269-272)."""
    return dt_mpc * gait.duty_cycle[..., None] * gait.periods
