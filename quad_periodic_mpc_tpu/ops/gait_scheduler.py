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
# name: (period_s, switching_phase, offsets[4], scale[4], enabled[4],
#        initial_phase) — initial_phase is 0 for every case except PACE,
# which seeds a quarter period in (GaitScheduler.cpp:387).
GAIT_TABLE: dict[str, tuple] = {
    "stand":           (10.0, 1.0, (0.5, 0.5, 0.5, 0.5), (1, 1, 1, 1), (1, 1, 1, 1), 0.0),
    "stand_cycle":     (1.0, 1.0, (0.5, 0.5, 0.5, 0.5), (1, 1, 1, 1), (1, 1, 1, 1), 0.0),
    "static_walk":     (1.25, 0.8, (0.25, 0.0, 0.75, 0.5), (1, 1, 1, 1), (1, 1, 1, 1), 0.0),
    "amble":           (0.5, 0.625, (0.0, 0.5, 0.25, 0.75), (1, 1, 1, 1), (1, 1, 1, 1), 0.0),
    "trot_walk":       (0.5, 0.6, (0.0, 0.5, 0.5, 0.0), (1, 1, 1, 1), (1, 1, 1, 1), 0.0),
    "trot":            (0.5, 0.5, (0.0, 0.5, 0.5, 0.0), (1, 1, 1, 1), (1, 1, 1, 1), 0.0),
    "trot_run":        (0.4, 0.4, (0.0, 0.5, 0.5, 0.0), (1, 1, 1, 1), (1, 1, 1, 1), 0.0),
    "pace":            (0.35, 0.5, (0.0, 0.5, 0.0, 0.5), (1, 1, 1, 1), (1, 1, 1, 1), 0.25),
    "bound":           (0.4, 0.4, (0.0, 0.0, 0.5, 0.5), (1, 1, 1, 1), (1, 1, 1, 1), 0.0),
    "rotary_gallop":   (0.4, 0.2, (0.0, 0.8571, 0.3571, 0.5), (1, 1, 1, 1), (1, 1, 1, 1), 0.0),
    "traverse_gallop": (0.5, 0.2, (0.0, 0.8571, 0.3571, 0.5), (1, 1, 1, 1), (1, 1, 1, 1), 0.0),
    "pronk":           (0.5, 0.5, (0.0, 0.0, 0.0, 0.0), (1, 1, 1, 1), (1, 1, 1, 1), 0.0),
    "three_foot":      (0.4, 0.666, (0.0, 0.666, 0.0, 0.333), (0, 1, 1, 1), (0, 1, 1, 1), 0.0),
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
    p, sw, off, sc, en, _ip = GAIT_TABLE[name]
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


# ---------------------------------------------------------------------------
# Full dynamic scheduler: the complete GaitScheduler state machine
# (createGait / modifyGait / calcAuxiliaryGaitData, GaitScheduler.cpp:206-560)
# with all 15 GaitTypes including CUSTOM and the computed-parameter
# TRANSITION_TO_STAND.  Everything is batched arrays + selects — gait type,
# override mode, and user parameters are data, so mixed fleets of
# schedulers step in lockstep under one jit.
# ---------------------------------------------------------------------------

# GaitType enum order (GaitScheduler.h:16-33)
GAIT_IDS: dict[str, int] = {
    "stand": 0, "stand_cycle": 1, "static_walk": 2, "amble": 3,
    "trot_walk": 4, "trot": 5, "trot_run": 6, "pace": 7, "bound": 8,
    "rotary_gallop": 9, "traverse_gallop": 10, "pronk": 11,
    "three_foot": 12, "custom": 13, "transition_to_stand": 14,
}
STAND = 0
CUSTOM = 13
TRANSITION_TO_STAND = 14

# overrideable flag per type (GaitScheduler.cpp:314-475): STAND/STAND_CYCLE
# and TRANSITION_TO_STAND are not, every parameterized gait is.
_OVERRIDEABLE = (0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0)


class GaitData(NamedTuple):
    """The full mutable gait definition + phase state (GaitData struct,
    GaitScheduler.h:38-110), as batched arrays."""

    current_gait: jnp.ndarray        # (...,) int32
    next_gait: jnp.ndarray           # (...,) int32
    period_nominal: jnp.ndarray      # (...,)
    switching_nominal: jnp.ndarray   # (...,)
    phase_offset: jnp.ndarray        # (..., 4)
    phase_scale: jnp.ndarray         # (..., 4)
    enabled: jnp.ndarray             # (..., 4)
    overrideable: jnp.ndarray        # (...,)
    initial_phase: jnp.ndarray       # (...,) reference phase variable
    period_natural: jnp.ndarray      # (...,) mode-4 natural-gait store
    switching_natural: jnp.ndarray   # (...,)
    phase: jnp.ndarray               # (..., 4)
    contact_prev: jnp.ndarray        # (..., 4)


def _stacked_table(dtype=jnp.float32):
    """(15, ...) parameter rows in GaitType order.  The CUSTOM row is a
    placeholder (createGait keeps the running parameters for CUSTOM —
    'get custom gait parameters from operator GUI' is a TODO in the
    reference, GaitScheduler.cpp:450-453); the TRANSITION_TO_STAND row is
    computed from the running state, not the table (:455-476)."""
    names = list(GAIT_IDS)[:13]
    rows = [GAIT_TABLE[n] for n in names] + [GAIT_TABLE["stand"]] * 2
    period = np.array([r[0] for r in rows])
    sw = np.array([r[1] for r in rows])
    off = np.array([r[2] for r in rows])
    sc = np.array([r[3] for r in rows], float)
    en = np.array([r[4] for r in rows], float)
    ov = np.array(_OVERRIDEABLE, float)
    ip = np.array([r[5] for r in rows])
    return (jnp.asarray(period, dtype), jnp.asarray(sw, dtype),
            jnp.asarray(off, dtype), jnp.asarray(sc, dtype),
            jnp.asarray(en, dtype), jnp.asarray(ov, dtype),
            jnp.asarray(ip, dtype))


def gait_data_init(
    batch: tuple = (), gait: str = "stand", dtype=jnp.float32
) -> GaitData:
    """initialize() semantics (GaitScheduler.cpp:75-89): start in STAND
    (or the named gait), zero phases, create the gait, store naturals."""
    gid = jnp.full(batch, GAIT_IDS[gait], jnp.int32)
    gd = GaitData(
        current_gait=jnp.full(batch, -1, jnp.int32),  # force create
        next_gait=gid,
        period_nominal=jnp.ones(batch, dtype),
        switching_nominal=jnp.ones(batch, dtype),
        phase_offset=jnp.zeros(batch + (4,), dtype),
        phase_scale=jnp.ones(batch + (4,), dtype),
        enabled=jnp.ones(batch + (4,), dtype),
        overrideable=jnp.zeros(batch, dtype),
        initial_phase=jnp.zeros(batch, dtype),
        period_natural=jnp.ones(batch, dtype),
        switching_natural=jnp.ones(batch, dtype),
        phase=jnp.zeros(batch + (4,), dtype),
        contact_prev=jnp.zeros(batch + (4,), dtype),
    )
    gd = create_gait(gd, gid)
    return gd._replace(
        period_natural=gd.period_nominal,
        switching_natural=gd.switching_nominal,
    )


def create_gait(gd: GaitData, next_gait: jnp.ndarray) -> GaitData:
    """createGait + calcAuxiliaryGaitData (GaitScheduler.cpp:278-575):
    load the parameter row for ``next_gait`` (table gaits), keep the
    running parameters for CUSTOM, or compute the TRANSITION_TO_STAND
    parameters from the current phases so each foot's time-to-cycle-end
    is preserved while the period stretches 3x (:455-476); then
    re-initialize the phase variables phase = initial_phase + offset."""
    dtype = gd.period_nominal.dtype
    period_t, sw_t, off_t, sc_t, en_t, ov_t, ip_t = _stacked_table(dtype)
    gid = next_gait

    # table row (CUSTOM/TRANSITION rows are placeholders, masked below)
    period = period_t[gid]
    sw = sw_t[gid]
    off = off_t[gid]
    sc = sc_t[gid]
    en = en_t[gid]
    ov = ov_t[gid]

    is_custom = (gid == CUSTOM)[..., None]
    is_trans = (gid == TRANSITION_TO_STAND)[..., None]

    # CUSTOM: keep running parameters (reference leaves GaitData as-is)
    period = jnp.where(is_custom[..., 0], gd.period_nominal, period)
    sw = jnp.where(is_custom[..., 0], gd.switching_nominal, sw)
    off = jnp.where(is_custom, gd.phase_offset, off)
    sc = jnp.where(is_custom, gd.phase_scale, sc)
    en = jnp.where(is_custom, gd.enabled, en)
    ov = jnp.where(is_custom[..., 0], gd.overrideable, ov)

    # TRANSITION_TO_STAND (:455-476)
    p_old = gd.period_nominal
    p_new = 3.0 * p_old
    sw_trans = (p_new + p_old * (gd.switching_nominal - 1.0)) / p_new
    off_trans = (
        p_new[..., None] + p_old[..., None] * (gd.phase - 1.0)
    ) / p_new[..., None]
    period = jnp.where(is_trans[..., 0], p_new, period)
    sw = jnp.where(is_trans[..., 0], sw_trans, sw)
    off = jnp.where(is_trans, off_trans, off)
    sc = jnp.where(is_trans, 1.0, sc)
    en = jnp.where(is_trans, 1.0, en)
    ov = jnp.where(is_trans[..., 0], 0.0, ov)

    # every non-CUSTOM createGait case resets initialPhase to the table
    # value — 0 for all gaits except PACE, which seeds a quarter period
    # (GaitScheduler.cpp:387; calcAuxiliaryGaitData then re-seeds
    # per-foot phases initial_phase + offset, :545-551).  The CUSTOM case
    # never touches initialPhase, so switching to CUSTOM mid-cycle keeps
    # the running value — zeroing it would snap phases back to the raw
    # offsets, a discontinuity the reference does not have.
    # TRANSITION_TO_STAND folds the current phases into its offsets
    # (:455-476), so its initialPhase stays 0 (its table-row value).
    ip = jnp.where(is_custom[..., 0], gd.initial_phase, ip_t[gid])
    phase = (ip[..., None] + off) * en
    return gd._replace(
        current_gait=gid, next_gait=gid,
        period_nominal=period, switching_nominal=sw,
        phase_offset=off, phase_scale=sc, enabled=en, overrideable=ov,
        initial_phase=ip, phase=phase,
    )


def modify_gait(
    gd: GaitData,
    override_mode: jnp.ndarray,
    user_gait: jnp.ndarray,
    user_period: jnp.ndarray,
    user_switching: jnp.ndarray,
) -> GaitData:
    """modifyGait (GaitScheduler.cpp:206-273), all 5 override modes as
    batched selects:

    0/3 — follow next_gait set by control code (create on change);
    1   — force the user-chosen gait, default settings;
    2   — user gait + live period/switching override, gated by the
          gait's overrideable flag, phases re-seeded (calcAux);
    4   — natural-gait modification: on change store the new nominals as
          'natural', otherwise restore them and re-seed phases each step.
    """
    mode = override_mode
    want_next = jnp.where(
        (mode == 1) | (mode == 2), user_gait, gd.next_gait
    ).astype(jnp.int32)
    do_create = want_next != gd.current_gait

    created = create_gait(gd, want_next)
    sel = lambda c, a, b: jnp.where(c, a, b)
    selv = lambda c, a, b: jnp.where(c[..., None], a, b)
    gd = GaitData(
        current_gait=sel(do_create, created.current_gait, gd.current_gait),
        next_gait=sel(do_create, created.next_gait, gd.next_gait),
        period_nominal=sel(do_create, created.period_nominal, gd.period_nominal),
        switching_nominal=sel(do_create, created.switching_nominal, gd.switching_nominal),
        phase_offset=selv(do_create, created.phase_offset, gd.phase_offset),
        phase_scale=selv(do_create, created.phase_scale, gd.phase_scale),
        enabled=selv(do_create, created.enabled, gd.enabled),
        overrideable=sel(do_create, created.overrideable, gd.overrideable),
        initial_phase=sel(do_create, created.initial_phase, gd.initial_phase),
        period_natural=gd.period_natural,
        switching_natural=gd.switching_natural,
        phase=selv(do_create, created.phase, gd.phase),
        contact_prev=gd.contact_prev,
    )

    # mode 2: live parameter override when the gait allows it (:230-252)
    differs = (
        (jnp.abs(gd.period_nominal - user_period) > 1e-4)
        | (jnp.abs(gd.switching_nominal - user_switching) > 1e-4)
    )
    apply2 = (mode == 2) & differs & (gd.overrideable == 1)
    new_period = sel(apply2, user_period, gd.period_nominal)
    new_sw = sel(apply2, user_switching, gd.switching_nominal)

    # mode 4: store naturals on change, restore them otherwise (:254-271)
    store4 = (mode == 4) & do_create
    restore4 = (mode == 4) & ~do_create
    period_nat = sel(store4, gd.period_nominal, gd.period_natural)
    sw_nat = sel(store4, gd.switching_nominal, gd.switching_natural)
    new_period = sel(restore4, period_nat, new_period)
    new_sw = sel(restore4, sw_nat, new_sw)

    # calcAuxiliaryGaitData after a parameter change re-seeds the phases
    reseed = apply2 | restore4
    phase = selv(
        reseed,
        (gd.initial_phase[..., None] + gd.phase_offset) * gd.enabled,
        gd.phase,
    )
    return gd._replace(
        period_nominal=new_period, switching_nominal=new_sw,
        period_natural=period_nat, switching_natural=sw_nat, phase=phase,
    )


def step_full(
    gd: GaitData,
    dt: float,
    override_mode=0,
    user_gait=STAND,
    user_period=0.5,
    user_switching=0.5,
) -> tuple[GaitData, SchedulerOutput]:
    """One full scheduler tick: modifyGait, reference-phase tracking,
    per-foot monotonic phase advance with the STAND freeze
    (GaitScheduler.cpp:95-205), contact/swing outputs.

    override_mode / user_* may be scalars or batched arrays (the
    dynamic_reconfigure analog is just another traced input here)."""
    dtype = gd.period_nominal.dtype
    batch = gd.period_nominal.shape
    asb = lambda v, dt_=dtype: jnp.broadcast_to(jnp.asarray(v, dt_), batch)
    gd = modify_gait(
        gd, asb(override_mode, jnp.int32), asb(user_gait, jnp.int32),
        asb(user_period), asb(user_switching),
    )

    in_stand = gd.current_gait == STAND
    dt_a = jnp.asarray(dt, dtype)
    # reference phase only advances outside STAND (:101-105)
    ip = jnp.where(
        in_stand, gd.initial_phase,
        jnp.mod(gd.initial_phase + dt_a / gd.period_nominal, 1.0),
    )
    dphase = jnp.where(
        in_stand[..., None], 0.0,
        gd.phase_scale * (dt_a / gd.period_nominal[..., None]),
    )
    phase = jnp.mod(gd.phase + dphase, 1.0) * gd.enabled

    sw = gd.switching_nominal[..., None]
    en = gd.enabled > 0
    in_contact = (phase <= sw) & en
    period_leg = gd.period_nominal[..., None] / jnp.where(
        gd.phase_scale > 0, gd.phase_scale, 1.0
    )
    phase_stance = jnp.where(in_contact, phase / sw, 1.0)
    phase_swing = jnp.where(
        in_contact, 0.0, (phase - sw) / jnp.maximum(1.0 - sw, 1e-9)
    )
    t_stance_rem = jnp.where(in_contact, period_leg * (sw - phase), 0.0)
    t_swing_rem = jnp.where(in_contact, 0.0, period_leg * (1.0 - phase))
    contact = in_contact.astype(dtype)
    touchdown = (contact > 0) & (gd.contact_prev == 0)
    liftoff = (contact == 0) & (gd.contact_prev > 0)

    gd = gd._replace(initial_phase=ip, phase=phase, contact_prev=contact)
    return gd, SchedulerOutput(
        contact=contact, phase_stance=phase_stance, phase_swing=phase_swing,
        time_stance_remaining=t_stance_rem,
        time_swing_remaining=t_swing_rem,
        touchdown=touchdown, liftoff=liftoff,
    )
