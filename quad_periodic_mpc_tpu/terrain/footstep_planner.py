"""Footstep planning on the elevation grid — the GraphSearch tier.

The reference ships only a scaffold (src/common/FootstepPlanner/
GraphSearch.{h,cpp}: ContactState/FootplanState structs and cost stubs,
mostly unused).  This module implements the capability TPU-natively:
instead of a sequential A* (divergent frontier — anti-XLA), a dense
VALUE-ITERATION cost-to-go over the grid:

    V <- min_{8-neighborhood} (V_nbr + edge_cost)

where edge_cost = step length + slope penalty + non-traversability
penalty.  Each sweep is a vectorized stencil (shifted adds + min), runs
on the VPU, batches over maps, and K sweeps propagate the frontier K
cells — pick K ~ grid diameter.  Greedy descent on V yields footstep
paths from any start cell (all starts share one V — amortized planning
for 4 feet x many candidate sequences).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from quad_periodic_mpc_tpu.terrain.heightmap import HeightMap

_BIG = 1e9

# 8-neighborhood (dr, dc) and step lengths
_OFFS = np.array(
    [(-1, 0), (1, 0), (0, -1), (0, 1), (-1, -1), (-1, 1), (1, -1), (1, 1)],
    np.int32,
)
_LENS = np.array([1.0, 1.0, 1.0, 1.0] + [np.sqrt(2.0)] * 4, np.float32)


class Plan(NamedTuple):
    value: jnp.ndarray     # (..., H, W) cost-to-go
    step_cost: jnp.ndarray # (..., H, W) per-cell entry cost


def cell_costs(
    hm: HeightMap,
    slope_weight: float = 20.0,
    traversability_min: float = 0.5,
) -> jnp.ndarray:
    """Per-cell entry cost from terrain: slope + traversability gate."""
    h = hm.elevation
    dr = jnp.abs(jnp.roll(h, -1, -2) - jnp.roll(h, 1, -2)) / (2 * hm.resolution)
    dc = jnp.abs(jnp.roll(h, -1, -1) - jnp.roll(h, 1, -1)) / (2 * hm.resolution)
    slope = jnp.sqrt(dr * dr + dc * dc)
    blocked = hm.traversability < traversability_min
    return slope_weight * slope * hm.resolution + jnp.where(blocked, _BIG, 0.0)


def _shift(v: jnp.ndarray, dr: int, dc: int) -> jnp.ndarray:
    """Shift with +inf fill at the borders (no wraparound paths)."""
    out = jnp.roll(v, (dr, dc), axis=(-2, -1))
    H, W = v.shape[-2:]
    r = jnp.arange(H)[:, None]
    c = jnp.arange(W)[None, :]
    invalid = jnp.zeros((H, W), bool)
    if dr > 0:
        invalid |= r < dr
    elif dr < 0:
        invalid |= r >= H + dr
    if dc > 0:
        invalid |= c < dc
    elif dc < 0:
        invalid |= c >= W + dc
    return jnp.where(invalid, _BIG, out)


def plan(
    hm: HeightMap,
    goal_rc: jnp.ndarray,          # (..., 2) goal cell
    sweeps: int | None = None,
    slope_weight: float = 20.0,
    traversability_min: float = 0.5,
) -> Plan:
    """Cost-to-go by parallel value iteration."""
    H, W = hm.elevation.shape[-2:]
    sweeps = sweeps or (H + W)
    entry = cell_costs(hm, slope_weight, traversability_min)

    r = jnp.arange(H)[:, None]
    c = jnp.arange(W)[None, :]
    is_goal = (r == goal_rc[..., 0, None, None]) & (
        c == goal_rc[..., 1, None, None]
    )
    V0 = jnp.where(is_goal, 0.0, _BIG).astype(hm.elevation.dtype)

    step_len = jnp.asarray(_LENS, hm.elevation.dtype) * hm.resolution

    def sweep(V, _):
        cands = [
            _shift(V, int(dr), int(dc)) + step_len[i] + entry
            for i, (dr, dc) in enumerate(_OFFS)
        ]
        V_new = jnp.minimum(V, jnp.min(jnp.stack(cands, 0), axis=0))
        return V_new, None

    V, _ = jax.lax.scan(sweep, V0, None, length=sweeps)
    return Plan(value=V, step_cost=entry)


def next_step(plan_: Plan, rc: jnp.ndarray) -> jnp.ndarray:
    """Greedy descent: best neighbor cell (..., 2) from rc."""
    H, W = plan_.value.shape[-2:]
    offs = jnp.asarray(_OFFS)
    cand = rc[..., None, :] + offs                       # (..., 8, 2)
    cand = jnp.stack(
        [jnp.clip(cand[..., 0], 0, H - 1), jnp.clip(cand[..., 1], 0, W - 1)],
        axis=-1,
    )
    from quad_periodic_mpc_tpu.terrain.heightmap import sample

    vals = sample(plan_.value, cand)
    best = jnp.argmin(vals, axis=-1)
    return jnp.take_along_axis(cand, best[..., None, None], axis=-2)[..., 0, :]


def extract_path(plan_: Plan, start_rc: jnp.ndarray, n_steps: int) -> jnp.ndarray:
    """(..., n_steps+1, 2) greedy path from start toward the goal."""
    def body(rc, _):
        nxt = next_step(plan_, rc)
        return nxt, nxt

    _, path = jax.lax.scan(body, start_rc, None, length=n_steps)
    path = jnp.moveaxis(path, 0, -2)
    return jnp.concatenate([start_rc[..., None, :], path], axis=-2)
