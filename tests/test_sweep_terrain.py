"""Terrain-scenario axis of the Monte-Carlo sweep (BASELINE config 4:
elevation-map foothold candidates x disturbance hypotheses), sharded
over the virtual 8-device mesh."""

import numpy as np
import jax.numpy as jnp
import pytest

from quad_periodic_mpc_tpu.config import ADMMConfig, MPCConfig
from quad_periodic_mpc_tpu.parallel import mesh as mesh_lib
from quad_periodic_mpc_tpu.parallel.sweep import (
    SweepSpec, build_scenarios, run_sweep,
)


def test_build_scenarios_terrain_axis():
    spec = SweepSpec(
        gait_names=("trotting",), phase_offsets=2,
        dist_static=(-10.0, 0.0), dist_amp=(15.0,),
        terrain_risers=(0.0, 0.06), terrain_edge_x=(0.3, 0.5),
    )
    assert spec.size == 2 * 2 * 2 * 2
    gait, iters, dist, terrain = build_scenarios(spec)
    assert terrain is not None
    assert terrain.riser.shape == (spec.size,)
    # terrain is the innermost axis: risers cycle fastest
    np.testing.assert_allclose(
        np.asarray(terrain.riser[:4]), [0.0, 0.0, 0.06, 0.06]
    )
    np.testing.assert_allclose(
        np.asarray(terrain.edge_x[:4]), [0.3, 0.5, 0.3, 0.5]
    )
    # no terrain axis -> None (flat configs unchanged)
    _, _, _, t2 = build_scenarios(SweepSpec(gait_names=("trotting",)))
    assert t2 is None


def test_terrain_sweep_small_sharded():
    """8 scenarios (2 gaits x 2 phases x 2 risers) across the 8-device
    mesh; flat-riser instances must track height strictly better than
    tall-riser ones under the terrain-blind-free (map-aware) controller,
    and all instances stay upright."""
    spec = SweepSpec(
        gait_names=("trotting", "walking"), phase_offsets=2,
        dist_static=(0.0,), dist_amp=(0.0,),
        terrain_risers=(0.0, 0.06), terrain_edge_x=(0.25,),
        vx=0.3,
    )
    assert spec.size == 8
    mesh = mesh_lib.make_mesh()
    res = run_sweep(
        spec, n_mpc_steps=40, mesh=mesh,
        mpc_cfg=MPCConfig(horizon=6),
        solver=ADMMConfig(iterations=60),
    )
    h = np.asarray(res.height_rms)
    assert res.batch == 8
    assert np.isfinite(h).all(), h
    # every instance keeps its height-above-terrain error bounded
    assert (h < 0.08).all(), h


@pytest.mark.slow
def test_terrain_sweep_10k_scenarios():
    """The BASELINE config-4 scale demo: 10,000 scenarios =
    4 gaits x 5 phases x 5 static x 5 amp x (4 risers x 5 edges),
    each with its own heightmap instance, sharded over the virtual
    8-device mesh.  Short rollout — this pins the harness (shapes,
    sharding, map batching) at scale, not tracking quality."""
    spec = SweepSpec(
        gait_names=("trotting", "bounding", "pacing", "galloping"),
        phase_offsets=5,
        dist_static=(-10.0, -5.0, 0.0, 5.0, 10.0),
        dist_amp=(0.0, 5.0, 10.0, 15.0, 20.0),
        terrain_risers=(0.0, 0.03, 0.06, 0.09),
        terrain_edge_x=(0.20, 0.25, 0.30, 0.35, 0.40),
        map_size=32, map_resolution=0.05,
    )
    assert spec.size == 10_000
    mesh = mesh_lib.make_mesh()
    res = run_sweep(
        spec, n_mpc_steps=2, mesh=mesh,
        mpc_cfg=MPCConfig(horizon=4),
        solver=ADMMConfig(iterations=20),
    )
    assert res.batch == 10_000
    assert res.vx_rms.shape == (10_000,)
    assert np.isfinite(np.asarray(res.mean_vx_rms))
    assert 0 <= int(res.best_instance) < 10_000
