"""Analytic terrain scenarios: the ground truth behind the heightmap.

The reference validates its terrain tier (CMPCLocomotion_Cv /
VisionMPCLocomotion) on RaiSim scenes with stairs and doorsteps
(raisim_unitree_ros_driver `scene:=2`); this module is the rebuild's
analytic analog — a batched staircase height field that (a) drives the
SRB plant's ground contact, (b) generates the elevation map the
controller queries, and (c) parameterizes the terrain-scenario axis of
the Monte-Carlo sweep (BASELINE config 4).

All fields are arrays: thousands of (riser height x edge position)
scenarios batch along leading axes, like DisturbanceParams.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from quad_periodic_mpc_tpu.terrain import heightmap as hmap


class StairsTerrain(NamedTuple):
    """Ascending staircase along +x: flat at z=0 for x < edge_x, then
    ``n_steps`` risers of height ``riser`` every ``tread`` meters, flat
    at the top beyond.  riser/edge_x are arrays (scenario axes); tread
    and n_steps are static (they set no shapes, but keeping them python
    floats keeps the ground function trivially fusable)."""

    edge_x: jnp.ndarray   # (...,) world x of the first riser
    riser: jnp.ndarray    # (...,) step height, m
    tread: float = 0.25   # tread depth, m
    n_steps: int = 4

    @staticmethod
    def single_step(
        edge_x: float = 0.30, height: float = 0.08,
        batch: tuple = (), dtype=jnp.float32,
    ) -> "StairsTerrain":
        """One doorstep — the reference's doorstep case
        (CMPC_Locomotion_cv.cpp `_doorstep_case`)."""
        return StairsTerrain(
            edge_x=jnp.full(batch, edge_x, dtype),
            riser=jnp.full(batch, height, dtype),
            tread=10.0, n_steps=1,
        )

    @staticmethod
    def flat(batch: tuple = (), dtype=jnp.float32) -> "StairsTerrain":
        return StairsTerrain(
            edge_x=jnp.full(batch, 1e6, dtype),
            riser=jnp.zeros(batch, dtype),
        )


def ground_z(terrain: StairsTerrain, xy: jnp.ndarray) -> jnp.ndarray:
    """Ground elevation under world xy (..., 2) -> (...,).

    Broadcasts terrain batch axes against xy batch axes (terrain fields
    are (...,) and xy is (..., 2) over the same leading shape, or either
    side scalar).
    """
    x = xy[..., 0]
    extra = x.ndim - terrain.edge_x.ndim
    if extra > 0:
        # x carries trailing axes (feet, grid) beyond the scenario batch
        terrain = jax_tree_expand(terrain, extra)
    k = jnp.floor((x - terrain.edge_x) / terrain.tread) + 1.0
    k = jnp.clip(k, 0.0, float(terrain.n_steps))
    return terrain.riser * k


def build_map(
    terrain: StairsTerrain,
    size: int = 64,
    resolution: float = 0.03,
    center_xy=None,
    noise_std: float = 0.0,
    seed: int = 0,
    dtype=jnp.float32,
) -> hmap.HeightMap:
    """Sample the analytic terrain onto a HeightMap grid and compute its
    traversability layer (the postprocessor filter chain the reference
    runs before _idxMapChecking reads `plane_classification`,
    CMPC_Locomotion_cv.cpp:928).

    Cell centers follow the grid convention of heightmap.world_to_index:
    row r, col c sits at world
      xy = center + resolution * ((W//2) - c, r - (H//2)).
    noise_std > 0 adds iid measurement noise (imperfect-map studies).
    """
    H = W = size
    batch = terrain.edge_x.shape
    if center_xy is None:
        center_xy = jnp.zeros(batch + (2,), dtype)
    center_xy = jnp.asarray(center_xy, dtype)

    r = jnp.arange(H, dtype=dtype)
    c = jnp.arange(W, dtype=dtype)
    xs = resolution * ((W // 2) - c)                     # (W,)
    ys = resolution * (r - (H // 2))                     # (H,)
    x = center_xy[..., 0, None, None] + xs[None, :]      # (..., 1, W)
    y = center_xy[..., 1, None, None] + ys[:, None]      # (..., H, 1)
    xy = jnp.stack(
        [jnp.broadcast_to(x, batch + (H, W)),
         jnp.broadcast_to(y, batch + (H, W))], axis=-1,
    )
    z = ground_z(terrain, xy)
    if noise_std > 0.0:
        import jax

        key = jax.random.PRNGKey(seed)
        z = z + noise_std * jax.random.normal(key, z.shape, dtype)

    hm = hmap.HeightMap(
        elevation=z.astype(dtype),
        variance=jnp.full(batch + (H, W), 1e-4, dtype),
        traversability=jnp.ones(batch + (H, W), dtype),
        center=center_xy,
        resolution=resolution,
    )
    return hmap.compute_traversability(hm)


def jax_tree_expand(terrain: StairsTerrain, n: int) -> StairsTerrain:
    """Append n singleton axes to every array field (broadcast helper)."""
    idx = (Ellipsis,) + (None,) * n
    return terrain._replace(
        edge_x=terrain.edge_x[idx], riser=terrain.riser[idx]
    )
