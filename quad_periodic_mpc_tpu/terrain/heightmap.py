"""Body-centered elevation grid: Kalman fusion + foothold selection.

Rebuilds the compute core of the reference's terrain stack:

- elevation_mapping's per-cell Kalman fusion (ElevationMap::add /
  fuseAll, elevation_mapping/src/ElevationMap.cpp): each cell carries
  (height, variance); point measurements combine by precision weighting
  (the exact multi-measurement scalar-KF update, which is associative and
  therefore scatter-add friendly);
- the map-aware foothold adjustment of VisionMPCLocomotion::
  _updateFoothold (VisionMPCLocomotion.cpp:549-640) and
  CMPCLocomotion_Cv::{_updateFoothold,_idxMapChecking}
  (CMPC_Locomotion_cv.cpp:768-940): index the body-centered grid at the
  Raibert target, spiral-search a traversable cell within 0.1 m, take the
  elevation there.

TPU-first: the spiral search becomes a fixed precomputed candidate-offset
table (host side, SpiralIterator order) + batched gathers + a
first-valid argmax — no data-dependent loops; everything vmaps over legs
and instances.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp


class HeightMap(NamedTuple):
    """Body-centered 2.5-D grid (rows = y, cols = x, like grid_map)."""

    elevation: jnp.ndarray       # (..., H, W)
    variance: jnp.ndarray        # (..., H, W)
    traversability: jnp.ndarray  # (..., H, W) in [0, 1]
    center: jnp.ndarray          # (..., 2) world xy of the grid center
    resolution: float


def create(
    size: int = 64, resolution: float = 0.03, batch: tuple = (),
    dtype=jnp.float32, init_variance: float = 1e4,
) -> HeightMap:
    z = jnp.zeros(batch + (size, size), dtype)
    return HeightMap(
        elevation=z,
        variance=jnp.full(batch + (size, size), init_variance, dtype),
        traversability=jnp.ones(batch + (size, size), dtype),
        center=jnp.zeros(batch + (2,), dtype),
        resolution=resolution,
    )


def world_to_index(hm: HeightMap, xy: jnp.ndarray) -> jnp.ndarray:
    """World xy (..., 2) -> (row, col) int indices, clamped to the grid.

    Follows the reference's body-centered convention
    (CMPC_Locomotion_cv.cpp:805-821): the body sits at the grid center;
    +x decreases the column index, +y increases the row index.
    """
    H = hm.elevation.shape[-2]
    W = hm.elevation.shape[-1]
    rel = (xy - hm.center) / hm.resolution
    col = (W // 2) - jnp.ceil(rel[..., 0]).astype(jnp.int32)
    row = (H // 2) + jnp.ceil(rel[..., 1]).astype(jnp.int32)
    return jnp.stack(
        [jnp.clip(row, 0, H - 1), jnp.clip(col, 0, W - 1)], axis=-1
    )


def sample(grid: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather grid (..., H, W) at integer (row, col) (..., k, 2)."""
    return jnp.take_along_axis(
        jnp.take_along_axis(
            grid[..., None, :, :],
            idx[..., 0][..., None, None].astype(jnp.int32), axis=-2,
        )[..., 0, :],
        idx[..., 1][..., None].astype(jnp.int32), axis=-1,
    )[..., 0]


def fuse_points(
    hm: HeightMap,
    points: jnp.ndarray,       # (..., n, 3) world points
    meas_variance: jnp.ndarray # (..., n)
) -> HeightMap:
    """Precision-weighted Kalman fusion of point measurements into cells
    (the scalar-KF update of ElevationMap::add, batched + scattered):

      1/var' = 1/var + sum 1/var_m;  h' = var' (h/var + sum z/var_m)
    """
    H = hm.elevation.shape[-2]
    W = hm.elevation.shape[-1]
    idx = world_to_index(hm, points[..., 0:2])
    flat = idx[..., 0] * W + idx[..., 1]                     # (..., n)

    w = 1.0 / meas_variance
    zeros = jnp.zeros(hm.elevation.shape[:-2] + (H * W,), hm.elevation.dtype)
    dnum = _batched_scatter_add(zeros, flat, points[..., 2] * w)
    dden = _batched_scatter_add(zeros, flat, w)

    prec_old = 1.0 / hm.variance.reshape(hm.variance.shape[:-2] + (H * W,))
    h_old = hm.elevation.reshape(hm.elevation.shape[:-2] + (H * W,))
    prec_new = prec_old + dden
    h_new = (h_old * prec_old + dnum) / prec_new
    return hm._replace(
        elevation=h_new.reshape(hm.elevation.shape),
        variance=(1.0 / prec_new).reshape(hm.variance.shape),
    )


def _batched_scatter_add(base, flat_idx, vals):
    """Scatter-add along the last axis with leading batch dims."""
    return base.at[
        tuple(
            jnp.arange(s).reshape(
                (1,) * i + (s,) + (1,) * (flat_idx.ndim - i - 1)
            )
            for i, s in enumerate(base.shape[:-1])
        )
        + (flat_idx,)
    ].add(vals)


def predict(hm: HeightMap, process_variance: float) -> HeightMap:
    """Variance growth per update cycle (RobotMotionMapUpdater analog)."""
    return hm._replace(variance=hm.variance + process_variance)


@functools.lru_cache(maxsize=8)
def spiral_offsets(radius_cells: int) -> np.ndarray:
    """Ordered (dr, dc) offsets within a radius, center-out — the
    SpiralIterator search order (grid_map_utils::SpiralIterator)."""
    offs = []
    for dr in range(-radius_cells, radius_cells + 1):
        for dc in range(-radius_cells, radius_cells + 1):
            d2 = dr * dr + dc * dc
            if d2 <= radius_cells * radius_cells:
                offs.append((d2, dr, dc))
    offs.sort()
    return np.array([(dr, dc) for _, dr, dc in offs], np.int32)


def select_foothold(
    hm: HeightMap,
    pf: jnp.ndarray,                # (..., 3) Raibert target, world
    search_radius_m: float = 0.10,
    traversability_min: float = 0.8,
    foot_offset: float = 0.0,
) -> jnp.ndarray:
    """Map-aware foothold: snap pf to the first traversable cell in
    spiral order and take its elevation (z) — _idxMapChecking +
    _updateFoothold (CMPC_Locomotion_cv.cpp:768-940), shape-static.
    """
    H = hm.elevation.shape[-2]
    W = hm.elevation.shape[-1]
    r_cells = max(1, int(np.ceil(search_radius_m / hm.resolution)))
    offs = jnp.asarray(spiral_offsets(r_cells))              # (k, 2)
    k = offs.shape[0]

    center_idx = world_to_index(hm, pf[..., 0:2])            # (..., 2)
    cand = center_idx[..., None, :] + offs                   # (..., k, 2)
    cand = jnp.stack(
        [jnp.clip(cand[..., 0], 0, H - 1), jnp.clip(cand[..., 1], 0, W - 1)],
        axis=-1,
    )
    trav = sample(hm.traversability, cand)                   # (..., k)
    valid = trav > traversability_min
    # first valid in spiral order; fall back to the center cell
    order_score = jnp.where(
        valid, jnp.arange(k, 0, -1, dtype=jnp.int32), 0
    )
    best = jnp.argmax(order_score, axis=-1)
    any_valid = jnp.any(valid, axis=-1)
    sel = jnp.take_along_axis(cand, best[..., None, None], axis=-2)[..., 0, :]
    sel = jnp.where(any_valid[..., None], sel, center_idx)

    z = sample(hm.elevation, sel[..., None, :])[..., 0]
    # convert the selected cell back to world xy (inverse of world_to_index)
    rel_col = (W // 2) - sel[..., 1]
    rel_row = sel[..., 0] - (H // 2)
    xy = hm.center + hm.resolution * jnp.stack(
        [rel_col.astype(z.dtype), rel_row.astype(z.dtype)], axis=-1
    )
    return jnp.concatenate(
        [
            jnp.where(any_valid[..., None], xy, pf[..., 0:2]),
            (z + foot_offset)[..., None],
        ],
        axis=-1,
    )
