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


def foothold_update(
    hm: hmap.HeightMap,
    pf_raibert: jnp.ndarray,       # (..., 4, 3) Raibert targets, world
    p0: jnp.ndarray,               # (..., 4, 3) swing-start foot pos, world
    search_radius_m: float = 0.10,
    traversability_min: float = 0.8,
    max_step_height: float = 0.17,
) -> jnp.ndarray:
    """Full _updateFoothold semantics (CMPC_Locomotion_cv.cpp:768-883):

    xy — snap each Raibert target to the first valid cell in spiral
    order within ``search_radius_m`` (``_idxMapChecking``:913-940,
    validity = traversability > 0.8);

    z — RELATIVE to the swing-start cell: pf_z = p0_z + (pf_h - p0_h)
    with the step height clamped from above at MAX_STEP_HEIGHT
    (CMPC_Locomotion_cv.h:24 = 0.17; :878-882 clamps only upward — the
    downward clamp at :1046 is commented out in the reference, so a
    drop-off is followed unclamped).

    The reference's freeze-pose index arithmetic (:787-813) compensates
    its robot-centric grid when map updates stop; this rebuild's grid is
    world-anchored (``hm.center``), which makes the frozen-map case the
    SAME world-frame lookup — proven by test_terrain_loop.py's frozen-map
    test rather than re-derived per query.
    """
    import jax

    def one_leg(pf, p0_leg):
        sel = hmap.select_foothold(
            hm, pf, search_radius_m=search_radius_m,
            traversability_min=traversability_min,
            keep_xy_if_unmoved=True,   # avoid the ceil-quantization CoP bias
        )
        idx0 = hmap.world_to_index(hm, p0_leg[..., 0:2])
        z0 = hmap.sample(hm.elevation, idx0[..., None, :])[..., 0]
        dz = jnp.minimum(sel[..., 2] - z0, max_step_height)
        z = p0_leg[..., 2] + dz
        return jnp.concatenate([sel[..., 0:2], z[..., None]], axis=-1)

    return jax.vmap(one_leg, in_axes=(-2, -2), out_axes=-2)(pf_raibert, p0)
