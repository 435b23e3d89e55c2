"""CMPC-variant locomotion features (the newer CMPCLocomotion driver).

The reference ships a second-generation driver
(src/controllers/CMPC/CMPC_Locomotion.cpp, routed to FSM state 12 via
FSM_State_Testing.cpp:29) that extends the adaptive ConvexMPCLocomotion
with terrain-reactive behaviors.  The rebuild expresses them as optional,
composable pure functions over the same ControllerState:

- ``pitch_reference``: desired pitch from the estimated stance plane plus
  a velocity-dependent offset (CMPC_Locomotion.cpp:676-695);
- ``adaptive_gait_update``: early-contact gait reshaping wired in from
  ops/gait_scheduler.early_contact_handle (the Gait_contact behavior,
  Gait_contact.cpp:108-220, active at CMPC_Locomotion.cpp:652);
- ``terrain_foothold``: map-aware Raibert target adjustment via
  terrain/heightmap.select_foothold (the CMPCLocomotion_Cv / VisionMPC
  behavior, CMPC_Locomotion_cv.cpp:768-940,
  VisionMPCLocomotion.cpp:549-640).
"""

from __future__ import annotations

import jax.numpy as jnp

from quad_periodic_mpc_tpu.estimation.kf import plane_body_height
from quad_periodic_mpc_tpu.ops import gait as gait_ops
from quad_periodic_mpc_tpu.ops.gait_scheduler import early_contact_handle
from quad_periodic_mpc_tpu.terrain import heightmap as hmap


def pitch_reference(
    pitch_cmd: jnp.ndarray,
    rpy: jnp.ndarray,
    p_feet_body: jnp.ndarray,
    x_vel_des: jnp.ndarray,
    max_vel_x: float,
    standing: jnp.ndarray | bool = False,
) -> jnp.ndarray:
    """Desired pitch = cmd + actual pitch + stance-plane pitch +
    velocity-dependent crouch (CMPC_Locomotion.cpp:676-695).

    p_feet_body: (..., 4, 3) last stance footholds in the body frame
    (the reference uses debug->last_p_local_stance via
    _getLocalBodyHeight's LS plane).
    """
    _, est_pitch_plane = plane_body_height(p_feet_body)
    vel_term = jnp.where(
        x_vel_des > 0,
        -0.3 * x_vel_des / max_vel_x,
        -0.2 * x_vel_des / max_vel_x,
    )
    pitch = pitch_cmd + rpy[..., 1] + est_pitch_plane + vel_term
    return jnp.where(jnp.asarray(standing), 0.0, pitch)


def adaptive_gait_update(
    gait: gait_ops.GaitParams,
    swing_state: jnp.ndarray,
    phase: jnp.ndarray,
    foot_sensor: jnp.ndarray,
) -> gait_ops.GaitParams:
    """Early-contact gait reshaping on integer gait params: converts to
    phase fractions, applies earlyContactHandle, converts back
    (Gait.cpp:282-302 semantics on the OffsetDurationGait tables)."""
    seg = gait.n_segments.astype(jnp.float32)[..., None]
    off_f = gait.offsets.astype(jnp.float32) / seg
    dur_f = gait.durations.astype(jnp.float32) / seg
    off2, dur2 = early_contact_handle(
        off_f, dur_f, swing_state, phase, foot_sensor, gait.n_segments
    )
    return gait._replace(
        offsets=(off2 * seg).astype(gait.offsets.dtype),
        durations=(dur2 * seg).astype(gait.durations.dtype),
    )


def terrain_foothold(
    hm: hmap.HeightMap,
    pf_raibert: jnp.ndarray,       # (..., 4, 3)
    search_radius_m: float = 0.10,
    foot_offset: float = 0.0,
) -> jnp.ndarray:
    """Adjust all four Raibert targets against the elevation map."""
    import jax

    def one_leg(pf):
        return hmap.select_foothold(
            hm, pf, search_radius_m=search_radius_m, foot_offset=foot_offset,
        )

    return jax.vmap(one_leg, in_axes=-2, out_axes=-2)(pf_raibert)
