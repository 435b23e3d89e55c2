"""Sharded Monte-Carlo sweep runner.

Implements the BASELINE.json scaling configs as first-class harnesses:
- config 3: gait sweep (trot/bound/pace/gallop x phase offsets), 1k+ QPs
  batched per chip;
- config 4: disturbance-hypothesis sweep (static x amp x freq x phase),
  10k scenarios;
- config 5: multi-host gait x disturbance Monte-Carlo, instances sharded
  over the full device mesh (DCN across hosts via jax.distributed).

A sweep = (scenario axes -> batched closed-loop rollout -> per-instance
metrics -> collective reductions).  The reduction (mean/percentile
tracking error, best-hypothesis argmin) rides XLA collectives inserted by
sharding propagation — the rebuild's psum/all-gather analog of the
reference's ROS-topic aggregation (SURVEY.md section 2.4).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from quad_periodic_mpc_tpu.config import (
    ADMMConfig, EstimatorConfig, LoopConfig, MPCConfig, PDIPConfig,
)
from quad_periodic_mpc_tpu.control import loop as loop_mod
from quad_periodic_mpc_tpu.control import mpc as mpc_mod
from quad_periodic_mpc_tpu.ops import gait as gait_ops
from quad_periodic_mpc_tpu.parallel import mesh as mesh_lib
from quad_periodic_mpc_tpu.sim import srb_sim


class SweepSpec(NamedTuple):
    """Cartesian scenario axes; total batch = product of axis lengths.

    The terrain axes realize BASELINE config 4 ("elevation-map foothold
    candidates x disturbance hypotheses"): each (riser, edge_x) pair gets
    its own heightmap instance, and the rollout runs the full
    map-foothold/body-height terrain tier per scenario.  Empty
    terrain_risers = flat ground, no map (configs 3/5)."""

    gait_names: tuple = ("trotting", "bounding", "pacing", "galloping")
    phase_offsets: int = 4            # initial gait-phase shifts
    dist_static: tuple = (-10.0,)     # N
    dist_amp: tuple = (15.0,)         # N
    dist_freq: tuple = (0.33,)        # Hz
    dist_phase: tuple = (0.0,)        # rad
    terrain_risers: tuple = ()        # m; () = flat, no heightmap
    terrain_edge_x: tuple = (0.30,)   # m, first riser position
    terrain_tread: float = 10.0       # m (single long step by default)
    terrain_n_steps: int = 1
    map_size: int = 48                # heightmap cells per side
    map_resolution: float = 0.04      # m / cell
    vx: float = 0.3

    @property
    def size(self) -> int:
        n_terrain = (
            len(self.terrain_risers) * len(self.terrain_edge_x)
            if self.terrain_risers else 1
        )
        return (
            len(self.gait_names) * self.phase_offsets * len(self.dist_static)
            * len(self.dist_amp) * len(self.dist_freq) * len(self.dist_phase)
            * n_terrain
        )


class SweepResult(NamedTuple):
    vx_rms: jnp.ndarray          # (B,) per-instance tracking error
    height_rms: jnp.ndarray      # (B,)
    mean_vx_rms: jnp.ndarray     # () cross-device mean
    best_instance: jnp.ndarray   # () argmin of vx_rms
    batch: int


def build_scenarios(spec: SweepSpec, dtype=jnp.float32):
    """Expand the spec into batched (gait, phase-iteration, disturbance,
    terrain).  terrain is None when the spec has no terrain axis."""
    import itertools

    from quad_periodic_mpc_tpu.terrain import scenario as terrain_scn

    terrain_axis = (
        list(itertools.product(spec.terrain_risers, spec.terrain_edge_x))
        if spec.terrain_risers else [None]
    )

    gaits, iters = [], []
    dist_s, dist_a, dist_f, dist_p = [], [], [], []
    risers, edges = [], []
    period_iters = 13 * gait_ops.DEFAULT_PERIOD
    for name, ph, ds, da, df, dp, terr in itertools.product(
        spec.gait_names, range(spec.phase_offsets), spec.dist_static,
        spec.dist_amp, spec.dist_freq, spec.dist_phase, terrain_axis,
    ):
        off, dur = gait_ops.PRESET_GAITS[name]
        gaits.append((off, dur))
        iters.append((ph * period_iters) // spec.phase_offsets)
        dist_s.append(ds); dist_a.append(da); dist_f.append(df); dist_p.append(dp)
        if terr is not None:
            risers.append(terr[0]); edges.append(terr[1])

    off = jnp.asarray([g[0] for g in gaits], jnp.int32)
    dur = jnp.asarray([g[1] for g in gaits], jnp.int32)
    gait = gait_ops.GaitParams(
        offsets=off, durations=dur,
        n_segments=jnp.full((len(gaits),), gait_ops.DEFAULT_PERIOD, jnp.int32),
    )
    dist = srb_sim.DisturbanceParams(
        static=jnp.asarray(dist_s, dtype), amp=jnp.asarray(dist_a, dtype),
        freq=jnp.asarray(dist_f, dtype), phase=jnp.asarray(dist_p, dtype),
    )
    terrain = None
    if spec.terrain_risers:
        terrain = terrain_scn.StairsTerrain(
            edge_x=jnp.asarray(edges, dtype),
            riser=jnp.asarray(risers, dtype),
            tread=spec.terrain_tread, n_steps=spec.terrain_n_steps,
        )
    return gait, jnp.asarray(iters, jnp.int32), dist, terrain


def run_sweep(
    spec: SweepSpec,
    n_mpc_steps: int = 100,
    mesh: "jax.sharding.Mesh | None" = None,
    mpc_cfg: MPCConfig = MPCConfig(horizon=10),
    loop_cfg: LoopConfig = LoopConfig(),
    est_cfg: EstimatorConfig = EstimatorConfig(mode="ls", residual="discrete"),
    solver=ADMMConfig(iterations=100),
    dtype=jnp.float32,
) -> SweepResult:
    """Roll out every scenario in lockstep, sharded over the mesh."""
    from quad_periodic_mpc_tpu.terrain import scenario as terrain_scn

    gait, iters, dist, terrain = build_scenarios(spec, dtype)
    B = spec.size
    batch = (B,)

    plant = srb_sim.init_plant(batch, body_height=0.29, dtype=dtype)
    obs = srb_sim.observe(plant)
    ctrl = mpc_mod.init_state(
        batch, obs, window=est_cfg.window, dtype=dtype,
        horizon=mpc_cfg.horizon,
        formulation=getattr(solver, "formulation", "condensed"),
    )
    ctrl = ctrl._replace(iteration=iters)
    cmd = mpc_mod.Command(
        vx=jnp.full(batch, spec.vx, dtype),
        vy=jnp.zeros(batch, dtype),
        yaw_rate=jnp.zeros(batch, dtype),
        body_height=jnp.full(batch, 0.29, dtype),
    )
    hm = None
    if terrain is not None:
        hm = terrain_scn.build_map(
            terrain, size=spec.map_size, resolution=spec.map_resolution,
            dtype=dtype,
        )

    if mesh is not None:
        plant, ctrl, cmd, gait, dist, terrain, hm = mesh_lib.shard_batch(
            (plant, ctrl, cmd, gait, dist, terrain, hm), mesh
        )

    def go(plant, ctrl, cmd, gait, dist, terrain, hm):
        if hm is not None:
            # resolution / tread / n_steps are static metadata, but
            # sharding/jit turned the pytree leaves into traced scalars —
            # re-pin them (spiral-offset table sizes and clip bounds
            # derive from them at trace time)
            hm = hm._replace(resolution=spec.map_resolution)
        if terrain is not None:
            # re-pin from the spec (single source of truth with
            # build_scenarios) — jit/sharding traced the leaves
            terrain = terrain._replace(
                tread=spec.terrain_tread, n_steps=spec.terrain_n_steps
            )
        carry, trace = loop_mod.rollout(
            n_mpc_steps, plant, ctrl, cmd, gait, dist, mpc_cfg, loop_cfg,
            est_cfg, solver,
            heightmap=hm,
            ground_fn=(
                None if terrain is None
                else lambda xy: terrain_scn.ground_z(terrain, xy)
            ),
        )
        vx = trace.x[..., 9]
        half = vx.shape[-1] // 2
        vx_rms = jnp.sqrt(jnp.mean((vx[..., half:] - cmd.vx[..., None]) ** 2, -1))
        z = trace.x[..., 5]
        z_ref = jnp.broadcast_to(cmd.body_height[..., None], z.shape)
        if terrain is not None:
            # height error measured above the local terrain surface
            xy = jnp.stack([trace.x[..., 3], trace.x[..., 4]], axis=-1)
            z_ref = z_ref + terrain_scn.ground_z(terrain, xy)
        height_err = z[..., half:] - z_ref[..., half:]
        height_rms = jnp.sqrt(jnp.mean(height_err ** 2, -1))
        return vx_rms, height_rms, jnp.mean(vx_rms), jnp.argmin(vx_rms)

    vx_rms, height_rms, mean_rms, best = jax.jit(go)(
        plant, ctrl, cmd, gait, dist, terrain, hm
    )
    return SweepResult(
        vx_rms=vx_rms, height_rms=height_rms, mean_vx_rms=mean_rms,
        best_instance=best, batch=B,
    )
