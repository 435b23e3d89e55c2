"""Value-iteration footstep planner (GraphSearch-tier capability)."""

import jax.numpy as jnp
import numpy as np

from quad_periodic_mpc_tpu.terrain import footstep_planner as fp
from quad_periodic_mpc_tpu.terrain.heightmap import HeightMap


def _flat_map(H=20, W=20, res=0.02):
    return HeightMap(
        elevation=jnp.zeros((H, W)),
        variance=jnp.ones((H, W)),
        traversability=jnp.ones((H, W)),
        center=jnp.zeros(2),
        resolution=res,
    )


def test_flat_ground_straight_path():
    hm = _flat_map()
    goal = jnp.array([10, 18])
    p = fp.plan(hm, goal)
    # V is zero at the goal and grows with distance
    assert float(p.value[10, 18]) == 0.0
    assert float(p.value[10, 17]) > 0.0
    path = fp.extract_path(p, jnp.array([10, 2]), n_steps=16)
    # reaches the goal and V is non-increasing along the path
    assert np.array_equal(np.asarray(path[-1]), [10, 18])
    vals = np.asarray(p.value)[tuple(np.asarray(path).T)]
    assert np.all(np.diff(vals) <= 1e-6)


def test_wall_with_gap_routes_through_gap():
    hm = _flat_map()
    trav = np.ones((20, 20), np.float32)
    trav[:, 10] = 0.0        # wall at column 10 ...
    trav[9:12, 10] = 1.0     # ... with a gap at rows 9-11
    hm = hm._replace(traversability=jnp.asarray(trav))
    p = fp.plan(hm, jnp.array([2, 18]))
    path = np.asarray(fp.extract_path(p, jnp.array([17, 2]), n_steps=40))
    # crossing of column 10 happens inside the gap rows
    crossing_rows = path[path[:, 1] == 10][:, 0]
    assert len(crossing_rows) > 0
    assert np.all((crossing_rows >= 9) & (crossing_rows <= 11))
    # never steps on a blocked cell
    assert np.all(trav[tuple(path.T)] > 0.0)


def test_slope_penalty_prefers_flat_route():
    # A ridge along the direct route; flat detour should win.
    H, W = 16, 16
    elev = np.zeros((H, W), np.float32)
    elev[7:9, 4:12] = 0.5     # steep bump across the middle columns
    hm = _flat_map(H, W)._replace(elevation=jnp.asarray(elev))
    p = fp.plan(hm, jnp.array([8, 14]), slope_weight=50.0)
    path = np.asarray(fp.extract_path(p, jnp.array([8, 1]), n_steps=30))
    # path avoids the high-slope band rows 6-9 in the bump columns
    in_bump_cols = path[(path[:, 1] >= 4) & (path[:, 1] <= 11)]
    assert np.all((in_bump_cols[:, 0] <= 5) | (in_bump_cols[:, 0] >= 10))


def test_batched_maps():
    hm = _flat_map()
    hm2 = HeightMap(
        elevation=jnp.zeros((3, 20, 20)),
        variance=jnp.ones((3, 20, 20)),
        traversability=jnp.ones((3, 20, 20)),
        center=jnp.zeros((3, 2)),
        resolution=0.02,
    )
    goal = jnp.tile(jnp.array([5, 5]), (3, 1))
    p = fp.plan(hm2, goal, sweeps=20)
    assert p.value.shape == (3, 20, 20)
    assert np.allclose(np.asarray(p.value[:, 5, 5]), 0.0)
