"""Phase-based gait scheduler — the GaitScheduler rebuild.

Rebuilds src/common/Controllers/GaitScheduler.{h,cpp}: a continuous-time
per-leg phase machine (distinct from the segment-counted OffsetDuration
gaits of ops/gait.py): each leg carries a phase variable in [0, 1),
advanced by dt / (periodTime / phaseScale); contact is scheduled while
phase <= switchingPhase.  Gait definitions are (periodTimeNominal,
switchingPhaseNominal, phaseOffset[4], phaseScale[4], enabled[4])
(createGait, GaitScheduler.cpp:306-480).

State is an explicit array pytree; step() is pure and batched, so gait
sweeps run thousands of schedulers in lockstep.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

# GaitType parameter table (createGait, GaitScheduler.cpp:306-460):
# name: (period_s, switching_phase, offsets[4], scale[4], enabled[4])
GAIT_TABLE: dict[str, tuple] = {
    "stand":           (10.0, 1.0, (0.5, 0.5, 0.5, 0.5), (1, 1, 1, 1), (1, 1, 1, 1)),
    "stand_cycle":     (1.0, 1.0, (0.5, 0.5, 0.5, 0.5), (1, 1, 1, 1), (1, 1, 1, 1)),
    "static_walk":     (1.25, 0.8, (0.25, 0.0, 0.75, 0.5), (1, 1, 1, 1), (1, 1, 1, 1)),
    "amble":           (0.5, 0.625, (0.0, 0.5, 0.25, 0.75), (1, 1, 1, 1), (1, 1, 1, 1)),
    "trot_walk":       (0.5, 0.6, (0.0, 0.5, 0.5, 0.0), (1, 1, 1, 1), (1, 1, 1, 1)),
    "trot":            (0.5, 0.5, (0.0, 0.5, 0.5, 0.0), (1, 1, 1, 1), (1, 1, 1, 1)),
    "trot_run":        (0.4, 0.4, (0.0, 0.5, 0.5, 0.0), (1, 1, 1, 1), (1, 1, 1, 1)),
    "pace":            (0.35, 0.5, (0.0, 0.5, 0.0, 0.5), (1, 1, 1, 1), (1, 1, 1, 1)),
    "bound":           (0.4, 0.4, (0.0, 0.0, 0.5, 0.5), (1, 1, 1, 1), (1, 1, 1, 1)),
    "rotary_gallop":   (0.4, 0.2, (0.0, 0.8571, 0.3571, 0.5), (1, 1, 1, 1), (1, 1, 1, 1)),
    "traverse_gallop": (0.5, 0.2, (0.0, 0.8571, 0.3571, 0.5), (1, 1, 1, 1), (1, 1, 1, 1)),
    "pronk":           (0.5, 0.5, (0.0, 0.0, 0.0, 0.0), (1, 1, 1, 1), (1, 1, 1, 1)),
    "three_foot":      (0.4, 0.666, (0.0, 0.666, 0.0, 0.333), (0, 1, 1, 1), (0, 1, 1, 1)),
}


class SchedulerParams(NamedTuple):
    period: jnp.ndarray           # (...,) seconds
    switching_phase: jnp.ndarray  # (...,)
    phase_offset: jnp.ndarray     # (..., 4)
    phase_scale: jnp.ndarray      # (..., 4)
    enabled: jnp.ndarray          # (..., 4)


class SchedulerState(NamedTuple):
    phase: jnp.ndarray            # (..., 4) per-leg phase in [0, 1)
    contact_prev: jnp.ndarray     # (..., 4)


class SchedulerOutput(NamedTuple):
    contact: jnp.ndarray              # (..., 4) scheduled contact
    phase_stance: jnp.ndarray         # (..., 4)
    phase_swing: jnp.ndarray          # (..., 4)
    time_stance_remaining: jnp.ndarray
    time_swing_remaining: jnp.ndarray
    touchdown: jnp.ndarray            # (..., 4) scheduled TD this tick
    liftoff: jnp.ndarray              # (..., 4)


def params(name: str, dtype=jnp.float32) -> SchedulerParams:
    p, sw, off, sc, en = GAIT_TABLE[name]
    return SchedulerParams(
        period=jnp.asarray(p, dtype),
        switching_phase=jnp.asarray(sw, dtype),
        phase_offset=jnp.asarray(off, dtype),
        phase_scale=jnp.asarray(sc, dtype),
        enabled=jnp.asarray(en, dtype),
    )


def init(prm: SchedulerParams) -> SchedulerState:
    """Initial phases at the gait's offsets (initialization semantics of
    GaitScheduler::initialize + phaseOffset)."""
    ph = prm.phase_offset * prm.enabled
    return SchedulerState(
        phase=ph, contact_prev=(ph <= prm.switching_phase[..., None]).astype(ph.dtype)
    )


def step(
    state: SchedulerState, prm: SchedulerParams, dt: float
) -> tuple[SchedulerState, SchedulerOutput]:
    """One scheduler tick (GaitScheduler::step, GaitScheduler.cpp:96-205)."""
    dtype = state.phase.dtype
    dphase = prm.phase_scale * (jnp.asarray(dt, dtype) / prm.period[..., None])
    phase = jnp.mod(state.phase + dphase, 1.0) * prm.enabled

    sw = prm.switching_phase[..., None]
    in_contact = (phase <= sw) & (prm.enabled > 0)
    period_leg = prm.period[..., None] / jnp.where(
        prm.phase_scale > 0, prm.phase_scale, 1.0
    )

    phase_stance = jnp.where(in_contact, phase / sw, 1.0)
    phase_swing = jnp.where(
        in_contact, 0.0, (phase - sw) / jnp.maximum(1.0 - sw, 1e-9)
    )
    t_stance_rem = jnp.where(in_contact, period_leg * (sw - phase), 0.0)
    t_swing_rem = jnp.where(in_contact, 0.0, period_leg * (1.0 - phase))

    contact = in_contact.astype(dtype)
    touchdown = (contact > 0) & (state.contact_prev == 0)
    liftoff = (contact == 0) & (state.contact_prev > 0)

    new_state = SchedulerState(phase=phase, contact_prev=contact)
    return new_state, SchedulerOutput(
        contact=contact,
        phase_stance=phase_stance,
        phase_swing=phase_swing,
        time_stance_remaining=t_stance_rem,
        time_swing_remaining=t_swing_rem,
        touchdown=touchdown,
        liftoff=liftoff,
    )


def early_contact_handle(
    gait_offsets_f: jnp.ndarray,
    gait_durations_f: jnp.ndarray,
    swing_state: jnp.ndarray,
    phase: jnp.ndarray,
    foot_sensor: jnp.ndarray,
    n_segments: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Contact-adaptive gait reshaping (OffsetDurationGait::
    earlyContactHandle, Gait.cpp:282-302, active in the CMPC variant via
    Gait_contact.cpp:179): when a foot touches down in the last quarter of
    its swing, pull its stance window earlier — offset -= diff, duration
    += diff with diff = (offset - phase) mod 1.

    Pure-array version over float offsets/durations; returns the updated
    (offsets_f, durations_f).
    """
    late_swing_touch = (swing_state > 0.75) & (foot_sensor > 0)
    diff = gait_offsets_f - phase[..., None]
    diff = jnp.where(diff < -0.001, diff + 1.0, diff)
    new_off = jnp.where(
        late_swing_touch, gait_offsets_f - diff * 1.0001, gait_offsets_f
    )
    new_dur = jnp.where(
        late_swing_touch, gait_durations_f + diff, gait_durations_f
    )
    return new_off, new_dur
