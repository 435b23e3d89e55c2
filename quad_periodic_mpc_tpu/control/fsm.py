"""Vectorized control FSM.

Rebuilds ControlFSM (src/fsm/ControlFSM.cpp) + the state set
(src/fsm/fsm_states/) as a batched integer-state machine: each instance
carries (state, operating_mode, transition counters); transitions are a
pure function of (requested state, safety masks).  Where the reference
dispatches to virtual FSM_State objects, we select behaviors with masks
— every instance in a batch can be in a different state.

State numbering follows the dyn-param control values
(FSM_State.h:16-25): 0 PASSIVE, 1 STAND_UP, 3 BALANCE_STAND,
4 LOCOMOTION, 6 RECOVERY_STAND, 7 LAY_DOWN, 8 VISION, 9 BACKFLIP,
12 TESTING, 14 TESTING_CV.  Operating modes (ControlFSM.h):
0 NORMAL, 1 TRANSITIONING, 2 ESTOP, 3 EDAMP.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

# FSM states (dyn-param numbering, FSM_State.h:16-25 + routing notes
# in SURVEY.md section 2.1)
PASSIVE = 0
STAND_UP = 1
BALANCE_STAND = 3
LOCOMOTION = 4
RECOVERY_STAND = 6
LAY_DOWN = 7
VISION = 8
BACKFLIP = 9
TESTING = 12
TESTING_CV = 14

# operating modes (ControlFSM.h OperatingMode)
NORMAL = 0
TRANSITIONING = 1
ESTOP = 2
EDAMP = 3

# EDAMP damping window before ESTOP (ControlFSM.cpp:106-133)
EDAMP_ITERATIONS = 1000


class FSMState(NamedTuple):
    state: jnp.ndarray            # (...,) int32 current FSM state
    next_state: jnp.ndarray       # (...,) int32 transition target
    mode: jnp.ndarray             # (...,) int32 operating mode
    damp_iter: jnp.ndarray        # (...,) int32 EDAMP counter
    transition_done: jnp.ndarray  # (...,) bool


def init(batch: tuple = ()) -> FSMState:
    z = lambda v: jnp.full(batch, v, jnp.int32)
    return FSMState(
        state=z(PASSIVE),
        next_state=z(PASSIVE),
        mode=z(NORMAL),
        damp_iter=z(0),
        transition_done=jnp.ones(batch, bool),
    )


# Legal direct transitions (getNextState routing, ControlFSM.cpp:318-380):
# conservative approximation of the reference graph — everything routes
# through RECOVERY_STAND/STAND_UP except the direct pairs below.
_ALLOWED = {
    (PASSIVE, STAND_UP), (STAND_UP, PASSIVE),
    (STAND_UP, BALANCE_STAND), (BALANCE_STAND, STAND_UP),
    (STAND_UP, LOCOMOTION), (LOCOMOTION, STAND_UP),
    (BALANCE_STAND, LOCOMOTION), (LOCOMOTION, BALANCE_STAND),
    (STAND_UP, LAY_DOWN), (LAY_DOWN, PASSIVE), (LAY_DOWN, STAND_UP),
    (LOCOMOTION, RECOVERY_STAND), (BALANCE_STAND, RECOVERY_STAND),
    (RECOVERY_STAND, STAND_UP), (RECOVERY_STAND, BALANCE_STAND),
    (RECOVERY_STAND, LOCOMOTION),
    (STAND_UP, VISION), (VISION, STAND_UP), (VISION, RECOVERY_STAND),
    (STAND_UP, TESTING), (TESTING, STAND_UP), (TESTING, RECOVERY_STAND),
    (STAND_UP, TESTING_CV), (TESTING_CV, STAND_UP),
    (STAND_UP, BACKFLIP), (BACKFLIP, STAND_UP),
    (PASSIVE, RECOVERY_STAND),
}


def _allowed_mask(cur: jnp.ndarray, req: jnp.ndarray) -> jnp.ndarray:
    ok = cur == req
    for a, b in _ALLOWED:
        ok = ok | ((cur == a) & (req == b))
    return ok


def step(
    fsm: FSMState,
    requested_state: jnp.ndarray,
    safe_orientation: jnp.ndarray,
    locomotion_safe: jnp.ndarray,
    transition_complete: jnp.ndarray | None = None,
) -> FSMState:
    """One FSM tick (runFSM, ControlFSM.cpp:99-200), batched.

    - pre-check failure in an active state -> EDAMP, then ESTOP after
      EDAMP_ITERATIONS (ControlFSM.cpp:106-133);
    - unsafe locomotion -> forced RECOVERY_STAND
      (FSM_State_Locomotion.cpp:88-96);
    - requested transitions gated by the legality graph.
    """
    if transition_complete is None:
        transition_complete = jnp.ones_like(safe_orientation)

    active = (fsm.state != PASSIVE) & (fsm.state != LAY_DOWN)
    # EDAMP entry / progression
    enter_edamp = active & ~safe_orientation & (fsm.mode != ESTOP)
    damp_iter = jnp.where(
        fsm.mode == EDAMP, fsm.damp_iter + 1, jnp.zeros_like(fsm.damp_iter)
    )
    mode = jnp.where(enter_edamp, EDAMP, fsm.mode)
    mode = jnp.where(
        (mode == EDAMP) & (damp_iter >= EDAMP_ITERATIONS), ESTOP, mode
    )

    # forced recovery from unsafe locomotion
    req = jnp.where(
        (fsm.state == LOCOMOTION) & ~locomotion_safe,
        RECOVERY_STAND,
        requested_state,
    )

    want = (req != fsm.state) & (mode == NORMAL)
    legal = _allowed_mask(fsm.state, req)
    start = want & legal
    mode = jnp.where(start, TRANSITIONING, mode)
    next_state = jnp.where(start, req, fsm.next_state)

    finish = (mode == TRANSITIONING) & transition_complete
    state = jnp.where(finish, next_state, fsm.state)
    mode = jnp.where(finish, NORMAL, mode)

    # ESTOP/EDAMP drop to passive-like damping state
    state = jnp.where(mode == ESTOP, PASSIVE, state)

    return FSMState(
        state=state,
        next_state=next_state,
        mode=mode,
        damp_iter=damp_iter,
        transition_done=finish,
    )
