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


def _sharded_sweep_check():
    """Body of test_terrain_sweep_small_sharded (run in a subprocess)."""
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
    print("SHARDED_SWEEP_OK")


def test_terrain_sweep_small_sharded():
    """8 scenarios (2 gaits x 2 phases x 2 risers) across the 8-device
    mesh; flat-riser instances must track height strictly better than
    tall-riser ones under the terrain-blind-free (map-aware) controller,
    and all instances stay upright.

    Runs in a SUBPROCESS with the persistent compile cache DISABLED for
    it: this 8-device SPMD rollout is the suite's largest compiled
    program, and its persistent-cache entry has crashed long-lived suite
    processes on BOTH write (SIGSEGV in backend_compile_and_load) and
    read (SIGABRT deserializing in get_executable_and_time) — a fresh
    interpreter compiling it in-memory is reliable."""
    import os as _os
    import subprocess
    import sys as _sys

    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    script = (
        "import sys; sys.path[:0] = [%r, %r]\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_enable_x64', True)\n"
        "from test_sweep_terrain import _sharded_sweep_check\n"
        "_sharded_sweep_check()\n"
    ) % (repo, _os.path.join(repo, "tests"))
    out = subprocess.run(
        [_sys.executable, "-c", script],
        capture_output=True, text=True, timeout=900,
        env={"PATH": "/usr/bin:/bin:/usr/local/bin",
             "JAX_PLATFORMS": "cpu",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
    )
    assert out.returncode == 0, (out.stdout[-1000:], out.stderr[-3000:])
    assert "SHARDED_SWEEP_OK" in out.stdout


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
