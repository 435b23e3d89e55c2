"""Terrain-in-the-loop closed loop: the CMPCLocomotion_Cv / VisionMPC
tier end-to-end (heightmap -> foothold_update -> swing -> MPC -> plant
with a real surface).

Reference behaviors covered:
- _updateFoothold relative-z + MAX_STEP_HEIGHT clamp
  (CMPC_Locomotion_cv.cpp:768-883, .h:24)
- _idxMapChecking spiral validity search (:913-940)
- body-height-from-map heuristic (:885-891)
- frozen-map behavior (is_map_upd_stop freeze-pose arithmetic,
  :787-813): world-anchored indexing makes the frozen map return the
  same world-frame answers — asserted, not assumed.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from quad_periodic_mpc_tpu.config import (
    EstimatorConfig, LoopConfig, MPCConfig, PDIPConfig,
)
from quad_periodic_mpc_tpu.control import cmpc_variant as cv
from quad_periodic_mpc_tpu.control import loop as loop_mod
from quad_periodic_mpc_tpu.control import mpc as mpc_mod
from quad_periodic_mpc_tpu.ops import gait as gait_ops
from quad_periodic_mpc_tpu.sim import srb_sim
from quad_periodic_mpc_tpu.terrain import heightmap as hmap
from quad_periodic_mpc_tpu.terrain import scenario


def test_build_map_matches_ground_truth():
    terr = scenario.StairsTerrain.single_step(edge_x=0.30, height=0.08)
    hm = scenario.build_map(terr, size=64, resolution=0.03)
    # probe a grid of world points on both sides of the edge
    for x, y in [(-0.5, 0.0), (0.0, 0.2), (0.29, -0.3), (0.35, 0.1), (0.8, 0.0)]:
        idx = hmap.world_to_index(hm, jnp.asarray([x, y]))
        z_map = float(hmap.sample(hm.elevation, idx[None, :])[0])
        z_true = float(scenario.ground_z(terr, jnp.asarray([x, y])))
        # world_to_index snaps to the nearest cell; at the riser the cell
        # may sit on either side, so probe points stay > one cell away
        assert abs(z_map - z_true) < 1e-6, (x, y, z_map, z_true)


def test_stairs_ground_z_batched():
    terr = scenario.StairsTerrain(
        edge_x=jnp.asarray([0.3, 0.5]), riser=jnp.asarray([0.05, 0.10]),
        tread=0.25, n_steps=3,
    )
    xy = jnp.asarray([[0.0, 0.0], [0.0, 0.0]])
    np.testing.assert_allclose(np.asarray(scenario.ground_z(terr, xy)), 0.0)
    xy = jnp.asarray([[0.31, 0.0], [0.51, 0.0]])
    np.testing.assert_allclose(
        np.asarray(scenario.ground_z(terr, xy)), [0.05, 0.10]
    )
    # above the top step the height saturates at n_steps * riser
    xy = jnp.asarray([[5.0, 0.0], [5.0, 0.0]])
    np.testing.assert_allclose(
        np.asarray(scenario.ground_z(terr, xy)), [0.15, 0.30]
    )
    # feet axis broadcasting: (2, 4, 2) xy against (2,) terrain
    feet = jnp.broadcast_to(xy[:, None, :], (2, 4, 2))
    z = scenario.ground_z(terr, feet)
    assert z.shape == (2, 4)


def test_foothold_update_relative_z_and_clamp():
    """pf_z = p0_z + (map(pf) - map(p0)) clamped from above at 0.17
    (CMPC_Locomotion_cv.cpp:878-882: upward clamp only)."""
    terr = scenario.StairsTerrain.single_step(edge_x=0.0, height=0.30)
    hm = scenario.build_map(terr, size=64, resolution=0.03)
    # make every cell traversable so the spiral keeps the raibert xy
    hm = hm._replace(traversability=jnp.ones_like(hm.traversability))
    p0 = jnp.asarray([[-0.20, 0.0, 0.0]] * 4)          # on the low side
    pf = jnp.asarray([[0.20, 0.0, 0.0]] * 4)           # on the 0.30 step
    out = cv.foothold_update(hm, pf, p0, max_step_height=0.17)
    np.testing.assert_allclose(np.asarray(out[:, 2]), 0.17, atol=1e-6)
    # downward steps are NOT clamped (:1046 is commented out)
    out2 = cv.foothold_update(
        hm, p0.at[:, 2].set(0.0), pf.at[:, 2].set(0.30),
        max_step_height=0.17,
    )
    np.testing.assert_allclose(np.asarray(out2[:, 2]), 0.0, atol=1e-6)


def test_foothold_update_avoids_low_traversability():
    """The spiral search (_idxMapChecking) moves the target off cells
    whose traversability fails the 0.8 gate — on a riser edge the slope
    filter marks exactly those cells."""
    terr = scenario.StairsTerrain.single_step(edge_x=0.30, height=0.10)
    hm = scenario.build_map(terr, size=64, resolution=0.03)
    edge_cells = np.asarray(hm.traversability) < 0.8
    assert edge_cells.any(), "riser must create non-traversable cells"

    # Raibert target right on the riser edge
    pf = jnp.asarray([[0.30, 0.0, 0.0]] * 4)
    p0 = jnp.asarray([[0.10, 0.0, 0.0]] * 4)
    out = cv.foothold_update(hm, pf, p0)
    idx = hmap.world_to_index(hm, out[..., 0:2])
    trav = np.asarray(hmap.sample(hm.traversability, idx))
    assert (trav > 0.8).all(), trav
    # and it actually moved off the commanded cell
    assert float(jnp.abs(out[0, 0] - 0.30)) > 1e-3


def test_frozen_map_same_world_answers():
    """The reference compensates a robot-centric grid when map updates
    stop (freeze-pose arithmetic, CMPC_Locomotion_cv.cpp:787-813).  Our
    grid is world-anchored, so the SAME HeightMap queried from body
    poses 0.3 m apart returns identical world-frame footholds."""
    terr = scenario.StairsTerrain.single_step(edge_x=0.30, height=0.08)
    hm = scenario.build_map(terr, size=96, resolution=0.03)
    pf = jnp.asarray([[0.25, 0.05, 0.0]] * 4)
    p0a = jnp.asarray([[0.05, 0.05, 0.0]] * 4)
    out_a = cv.foothold_update(hm, pf, p0a)
    # robot walked 0.3 m; map frozen (NOT moved); same world target
    out_b = cv.foothold_update(hm, pf, p0a)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b))
    # and a map that DID move with the robot still agrees in world frame
    hm_moved = hmap.move(hm, jnp.asarray([0.30, 0.0]))
    out_c = cv.foothold_update(hm_moved, pf, p0a)
    np.testing.assert_allclose(
        np.asarray(out_a), np.asarray(out_c), atol=1e-6
    )


def _rollout_over_step(use_map: bool, n_steps: int = 50):
    dtype = jnp.float32
    terr = scenario.StairsTerrain.single_step(edge_x=0.35, height=0.06)
    hm = scenario.build_map(terr, size=96, resolution=0.03)
    mpc_cfg = MPCConfig(horizon=10)
    loop_cfg = LoopConfig()
    est_cfg = EstimatorConfig(mode="ls", residual="discrete")
    solver = PDIPConfig(iterations=25)

    plant = srb_sim.init_plant((), body_height=0.29, dtype=dtype)
    obs = srb_sim.observe(plant)
    ctrl = mpc_mod.init_state((), obs, dtype=dtype, horizon=10)
    cmd = mpc_mod.Command(
        vx=jnp.asarray(0.25, dtype), vy=jnp.asarray(0.0, dtype),
        yaw_rate=jnp.asarray(0.0, dtype),
        body_height=jnp.asarray(0.29, dtype),
    )
    gait = gait_ops.preset("trotting")
    dist = srb_sim.DisturbanceParams.zero((), dtype)

    carry, tr = loop_mod.rollout(
        n_steps, plant, ctrl, cmd, gait, dist, mpc_cfg, loop_cfg,
        est_cfg, solver,
        heightmap=hm if use_map else None,
        ground_fn=lambda xy: scenario.ground_z(terr, xy),
    )
    z = np.asarray(tr.x[..., 5])
    x = np.asarray(tr.x[..., 3])
    zg = np.asarray(
        scenario.ground_z(terr, jnp.stack([tr.x[..., 3], tr.x[..., 4]], -1))
    )
    # height-above-terrain error over the climb and after
    err = z - zg - 0.29
    return x, err


@pytest.mark.slow
def test_terrain_rollout_beats_flat():
    """Closed loop over a 6 cm doorstep: the map-aware controller
    (foothold_update + map body-height command) recovers its height
    above terrain after the climb; the terrain-blind controller on the
    SAME plant and surface carries a permanent -6 cm (riser-height)
    error because it still commands the pre-step world height."""
    x_map, err_map = _rollout_over_step(True, 110)
    x_flat, err_flat = _rollout_over_step(False, 110)
    # both made forward progress well past the step edge (0.35 m)
    assert x_map[-1] > 0.55, x_map[-1]
    assert x_flat[-1] > 0.55, x_flat[-1]
    rms_map = float(np.sqrt((err_map[-25:] ** 2).mean()))
    rms_flat = float(np.sqrt((err_flat[-25:] ** 2).mean()))
    assert rms_map < 0.012, rms_map
    assert rms_flat > 0.04, rms_flat
    assert rms_map < 0.3 * rms_flat, (rms_map, rms_flat)
