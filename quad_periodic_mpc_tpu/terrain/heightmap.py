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
import jax
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
    points: jnp.ndarray,        # (..., n, 3) world points
    meas_variance: jnp.ndarray, # (..., n)
    mahalanobis_threshold: float = 0.0,
    multi_height_noise: float = 9e-7,
    valid_mask: jnp.ndarray | None = None,   # (..., n) bool
) -> HeightMap:
    """Precision-weighted Kalman fusion of point measurements into cells
    (the scalar-KF update of ElevationMap::add, batched + scattered):

      1/var' = 1/var + sum 1/var_m;  h' = var' (h/var + sum z/var_m)

    With mahalanobis_threshold > 0, reproduces the reference's
    multi-height handling (ElevationMap.cpp:152-166): points whose
    |z - h| / sqrt(var) exceeds the threshold do NOT fuse — a higher
    outlier point REPLACES the cell (new surface appeared), a lower one
    only inflates the cell variance by multi_height_noise (slow decay
    toward re-acceptance).  Scatter-friendly reformulation: fusion,
    noise bumps, and replacement are three independent scatter passes
    (replacement, a scatter-max, wins last — the same steady state the
    reference's sequential per-point loop converges to).
    """
    H = hm.elevation.shape[-2]
    W = hm.elevation.shape[-1]
    idx = world_to_index(hm, points[..., 0:2])
    flat = idx[..., 0] * W + idx[..., 1]                     # (..., n)
    gshape = hm.elevation.shape[:-2] + (H * W,)
    h_old = hm.elevation.reshape(gshape)
    var_old = hm.variance.reshape(gshape)

    z = points[..., 2]
    w = 1.0 / meas_variance
    if valid_mask is not None:
        # excluded points (e.g. outside a sensor's depth cutoff — the
        # reference PassThrough-filters them before computeVariances,
        # StereoSensorProcessor.cpp:99-111) contribute no fusion weight
        # and cannot trigger multi-height replacement
        w = jnp.where(valid_mask, w, 0.0)
    if mahalanobis_threshold > 0.0:
        h_at = jnp.take_along_axis(h_old, flat, axis=-1)
        var_at = jnp.take_along_axis(var_old, flat, axis=-1)
        maha = jnp.abs(z - h_at) / jnp.sqrt(var_at)
        outlier = maha > mahalanobis_threshold
        if valid_mask is not None:
            outlier = outlier & valid_mask
        higher = outlier & (z > h_at)
        lower = outlier & ~higher
        w_fuse = jnp.where(outlier, 0.0, w)
    else:
        higher = lower = jnp.zeros(z.shape, bool)
        w_fuse = w

    zeros = jnp.zeros(gshape, hm.elevation.dtype)
    dnum = _batched_scatter_add(zeros, flat, z * w_fuse)
    dden = _batched_scatter_add(zeros, flat, w_fuse)

    prec_new = 1.0 / var_old + dden
    h_new = (h_old / var_old + dnum) / prec_new
    var_new = 1.0 / prec_new

    if mahalanobis_threshold > 0.0:
        # variance bump for rejected-lower points
        var_new = var_new + _batched_scatter_add(
            zeros, flat, jnp.where(lower, multi_height_noise, 0.0)
        )
        # higher-outlier replacement: scatter-max of candidate heights
        neg_inf = jnp.asarray(-jnp.inf, h_new.dtype)
        cand = jnp.where(higher, z, neg_inf)
        repl = zeros + neg_inf
        repl = repl.at[
            _batch_index(repl.shape[:-1], flat) + (flat,)
        ].max(cand)
        replaced = repl > neg_inf
        meas_var_grid = jnp.full(gshape, jnp.inf, hm.variance.dtype).at[
            _batch_index(gshape[:-1], flat) + (flat,)
        ].min(jnp.where(higher, meas_variance, jnp.inf))
        h_new = jnp.where(replaced, repl, h_new)
        var_new = jnp.where(replaced, meas_var_grid, var_new)

    return hm._replace(
        elevation=h_new.reshape(hm.elevation.shape),
        variance=var_new.reshape(hm.variance.shape),
    )


def wecdf_quantile(
    values: jnp.ndarray,     # (..., m)
    weights: jnp.ndarray,    # (..., m); zero-weight entries are ignored
    q: float,
) -> jnp.ndarray:
    """Batched weighted empirical quantile with the reference's WECDF
    semantics (WeightedEmpiricalCumulativeDistributionFunction.hpp):
    duplicate values merge their weights (std::map), the smallest
    observation maps to probability 0 and the largest to 1
    (p_i = (cumw_i - w_first) / (total - w_first)), linear interpolation
    between nodes, clamped outside [0, 1].

    Shape-static: m is the (fixed) candidate count; invalid entries are
    passed with weight 0.  Degenerate inputs (single distinct value, or
    all weights zero) return the smallest retained value, matching the
    reference's size-1 special case.
    """
    m = values.shape[-1]
    dtype = values.dtype
    big = jnp.asarray(3e38, dtype)
    tiny = jnp.asarray(1e-30, dtype)
    v = jnp.where(weights > 0, values, big)
    order = jnp.argsort(v, axis=-1)
    v = jnp.take_along_axis(v, order, -1)
    w = jnp.take_along_axis(jnp.where(weights > 0, weights, 0.0), order, -1)
    c = jnp.cumsum(w, -1)

    # duplicate-run merging: every entry takes its run's LAST cumulative
    # weight.  c is ascending, so "c at the nearest run end to the right"
    # is the suffix MINIMUM of c over run-last positions.
    is_last = jnp.concatenate(
        [v[..., 1:] != v[..., :-1],
         jnp.ones(v.shape[:-1] + (1,), bool)], -1,
    )
    cl = jnp.where(is_last, c, big)
    cl = jnp.flip(jax.lax.cummin(jnp.flip(cl, -1), axis=cl.ndim - 1), -1)

    w_first = cl[..., 0]                       # merged weight of v_min
    total = c[..., -1]
    span = total - w_first
    p = (cl - w_first[..., None]) / jnp.maximum(span, tiny)[..., None]

    qc = jnp.clip(jnp.asarray(q, dtype), 0.0, 1.0)
    i_up = jnp.clip(jnp.sum(p < qc, -1), 0, m - 1)   # first node p >= q
    i_low = jnp.clip(i_up - 1, 0, m - 1)
    take = lambda a, i: jnp.take_along_axis(a, i[..., None], -1)[..., 0]
    p_up, p_lo = take(p, i_up), take(p, i_low)
    v_up, v_lo = take(v, i_up), take(v, i_low)
    frac = (qc - p_lo) / jnp.maximum(p_up - p_lo, tiny)
    out = v_lo + frac * (v_up - v_lo)
    out = jnp.where(i_up == 0, v[..., 0], out)       # q at/below p_0 = 0
    return jnp.where(span <= 0, v[..., 0], out)      # single distinct value


def _gauss_cdf(x: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (1.0 + jax.lax.erf(x / jnp.sqrt(jnp.asarray(2.0, x.dtype))))


def fuse_area(
    hm: HeightMap,
    radius_cells: int = 2,
    sigma: float = 0.05,
    min_weight: float = 1e-6,
    valid_var_max: float = 1e3,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused map layers (elevation, lower_bound, upper_bound) — the
    rebuild of ElevationMap::fuseArea (ElevationMap.cpp:320-410): each
    cell fuses its neighborhood with weights = product of per-axis
    Gaussian cell-overlap probabilities (floored at min_weight), fused
    elevation = weighted mean, and the bound layers are the WECDF
    quantiles q=0.01 / q=0.99 of (z_i -/+ 2 sqrt(var_i)).

    TPU-native reformulation: the reference sizes a per-cell ellipse from
    the cell's horizontal variance and iterates it; we use a fixed
    (2 radius_cells + 1)^2 stencil (static shapes) with the spread
    `sigma` [m] taken as a parameter — pass the pose-covariance-derived
    horizontal sigma from motion_update's inputs for equivalent behavior.
    Cells with no valid neighbor fall back to (raw, raw -/+ 2 sqrt(var)),
    the reference's i == 0 branch (ElevationMap.cpp:381-390).
    """
    r = radius_cells
    res = hm.resolution
    dtype = hm.elevation.dtype
    batch = hm.elevation.shape[:-2]
    H, W = hm.elevation.shape[-2:]

    pad = [(0, 0)] * len(batch) + [(r, r), (r, r)]
    zp = jnp.pad(hm.elevation, pad)
    vp = jnp.pad(hm.variance, pad, constant_values=1e30)

    zs, vs, ws = [], [], []
    sig = jnp.maximum(jnp.asarray(sigma, dtype), 1e-6)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            zs.append(zp[..., r + dy : r + dy + H, r + dx : r + dx + W])
            vs.append(vp[..., r + dy : r + dy + H, r + dx : r + dx + W])
            # per-axis Gaussian cell-overlap probability (cdf difference
            # over the cell width), product over axes, floored
            p1 = _gauss_cdf((abs(dx) * res + res / 2) / sig) - _gauss_cdf(
                (abs(dx) * res - res / 2) / sig
            )
            p2 = _gauss_cdf((abs(dy) * res + res / 2) / sig) - _gauss_cdf(
                (abs(dy) * res - res / 2) / sig
            )
            ws.append(jnp.maximum(jnp.asarray(min_weight, dtype), p1 * p2))
    z_n = jnp.stack(zs, -1)                        # (..., H, W, m)
    v_n = jnp.stack(vs, -1)
    w_n = jnp.broadcast_to(jnp.stack(ws), z_n.shape).astype(dtype)

    valid = v_n < valid_var_max
    w_n = jnp.where(valid, w_n, 0.0)
    any_valid = jnp.any(valid, -1)

    wsum = jnp.maximum(jnp.sum(w_n, -1), 1e-30)
    mean = jnp.sum(w_n * z_n, -1) / wsum
    sd = jnp.sqrt(jnp.where(valid, v_n, 0.0))
    lower = wecdf_quantile(z_n - 2.0 * sd, w_n, 0.01)
    upper = wecdf_quantile(z_n + 2.0 * sd, w_n, 0.99)

    raw_sd = jnp.sqrt(hm.variance)
    mean = jnp.where(any_valid, mean, hm.elevation)
    lower = jnp.where(any_valid, lower, hm.elevation - 2.0 * raw_sd)
    upper = jnp.where(any_valid, upper, hm.elevation + 2.0 * raw_sd)
    return mean, lower, upper


def _batch_index(batch_shape, flat_idx):
    """Leading-dim index arrays matching flat_idx for .at[] updates."""
    return tuple(
        jnp.arange(s).reshape(
            (1,) * i + (s,) + (1,) * (flat_idx.ndim - i - 1)
        )
        for i, s in enumerate(batch_shape)
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


def motion_update(
    hm: HeightMap,
    position_cov: jnp.ndarray,   # (..., 3, 3) relative pose pos covariance
    R_map_to_body: jnp.ndarray,  # (..., 3, 3)
    covariance_scale: float = 1.0,
) -> HeightMap:
    """Pose-uncertainty-driven variance growth — RobotMotionMapUpdater::
    update (RobotMotionMapUpdater.cpp:30-118): the vertical variance bump
    is J_t Sigma_p J_t^T with translation Jacobian J_t = -R^T, identical
    for every cell (the per-cell rotation Jacobian feeds only the
    HORIZONTAL variance layers, which this grid does not carry — our
    foothold logic consumes elevation/variance/traversability only).
    """
    J = -jnp.swapaxes(R_map_to_body, -1, -2)
    cov = covariance_scale * position_cov
    bump = jnp.einsum("...ij,...jk,...ik->...i", J, cov, J)[..., 2]
    return hm._replace(variance=hm.variance + bump[..., None, None])


def move(hm: HeightMap, new_center: jnp.ndarray) -> HeightMap:
    """Shift the grid to a new world center, keeping world-anchored data
    (ElevationMap::move / grid_map's circular-buffer move): cells that
    stay in view keep their estimates, newly exposed strips reset to the
    uninformative prior.  The shift snaps to whole cells so repeated
    moves never blur the map.  Batched: per-instance shifts via gathers
    (jnp.roll needs a scalar shift).
    """
    H = hm.elevation.shape[-2]
    W = hm.elevation.shape[-1]
    res = hm.resolution
    # whole-cell snap
    shift_cells = jnp.round((new_center - hm.center) / res).astype(jnp.int32)
    snapped = hm.center + shift_cells.astype(hm.center.dtype) * res
    # index motion of a fixed world point: col += sx, row -= sy
    sx = shift_cells[..., 0]
    sy = shift_cells[..., 1]

    rows = jnp.arange(H)
    cols = jnp.arange(W)
    # destination (r, c) pulls from source (r + sy, c - sx)
    src_r = rows + sy[..., None]                        # (..., H)
    src_c = cols - sx[..., None]                        # (..., W)
    valid = (
        ((src_r >= 0) & (src_r < H))[..., :, None]
        & ((src_c >= 0) & (src_c < W))[..., None, :]
    )
    src_r = jnp.clip(src_r, 0, H - 1)
    src_c = jnp.clip(src_c, 0, W - 1)

    def shift(grid, fill):
        g = jnp.take_along_axis(grid, src_r[..., :, None], axis=-2)
        g = jnp.take_along_axis(g, src_c[..., None, :], axis=-1)
        return jnp.where(valid, g, jnp.asarray(fill, grid.dtype))

    return hm._replace(
        elevation=shift(hm.elevation, 0.0),
        variance=shift(hm.variance, 1e4),
        traversability=shift(hm.traversability, 1.0),
        center=snapped,
    )


def visibility_cleanup(
    hm: HeightMap,
    points: jnp.ndarray,         # (..., n, 3) latest scan, world
    meas_variance: jnp.ndarray,  # (..., n)
    sensor_pos: jnp.ndarray,     # (..., 3) sensor origin, world
    ray_samples: int = 12,
) -> HeightMap:
    """Remove ghost cells the latest scan saw THROUGH — ElevationMap::
    visibilityCleanup (ElevationMap.cpp:435-531): for every observed
    point, the sensor->point ray bounds the height of each cell it
    crosses (max_height = interpolated ray height); cells whose map
    elevation minus 3 sigma exceeds their max_height are reset to the
    uninformative prior (the reference NaNs them; this grid carries an
    explicit variance, so reset = prior).

    TPU-native: the reference's per-cell grid_map::LineIterator becomes
    a fixed ray_samples-point discretization of every ray + one
    scatter-min of interpolated ray heights — shape-static, batched.
    """
    H = hm.elevation.shape[-2]
    W = hm.elevation.shape[-1]
    dtype = hm.elevation.dtype
    gshape = hm.elevation.shape[:-2] + (H * W,)

    # lowest scan point per ray: z + 3 sigma (ElevationMap.cpp:169-171)
    z_low = points[..., 2] + 3.0 * jnp.sqrt(meas_variance)   # (..., n)

    # sample each sensor->point segment at fixed fractions
    fr = jnp.linspace(0.0, 1.0, ray_samples, dtype=dtype)    # (S,)
    seg = points - sensor_pos[..., None, :]                  # (..., n, 3)
    xy = (
        sensor_pos[..., None, None, 0:2]
        + fr[:, None] * seg[..., :, None, 0:2]               # (..., n, S, 2)
    )
    ray_h = (
        sensor_pos[..., None, None, 2]
        + fr * (z_low[..., None] - sensor_pos[..., None, None, 2])
    )                                                        # (..., n, S)

    idx = world_to_index(hm, xy)                             # (..., n, S, 2)
    flat = (idx[..., 0] * W + idx[..., 1]).reshape(
        idx.shape[:-3] + (-1,)
    )                                                        # (..., n*S)
    heights = ray_h.reshape(ray_h.shape[:-2] + (-1,))

    max_h = jnp.full(gshape, jnp.inf, dtype).at[
        _batch_index(gshape[:-1], flat) + (flat,)
    ].min(heights)

    elev = hm.elevation.reshape(gshape)
    var = hm.variance.reshape(gshape)
    ghost = elev - 3.0 * jnp.sqrt(var) > max_h
    return hm._replace(
        elevation=jnp.where(ghost, 0.0, elev).reshape(hm.elevation.shape),
        variance=jnp.where(ghost, 1e4, var).reshape(hm.variance.shape),
    )


def compute_traversability(
    hm: HeightMap,
    critical_slope: float = 0.7,
    critical_roughness: float = 0.06,
) -> HeightMap:
    """Slope+roughness traversability layer — the filter-chain the
    reference's postprocessor pipeline computes for CMPC_Locomotion_cv's
    validity checks (elevation_mapping_demos postprocessor_pipeline.yaml:
    slope via surface normals, roughness via local plane residual,
    traversability = weighted combination clipped to [0, 1]).

    Central-difference slope + 3x3 local standard deviation; cells with
    high prior variance (never observed) stay traversable (the reference
    treats NaN cells as "unknown", checked separately by _idxMapChecking).
    """
    e = hm.elevation
    res = hm.resolution
    dzdx = (jnp.roll(e, -1, axis=-1) - jnp.roll(e, 1, axis=-1)) / (2 * res)
    dzdy = (jnp.roll(e, -1, axis=-2) - jnp.roll(e, 1, axis=-2)) / (2 * res)
    slope = jnp.sqrt(dzdx**2 + dzdy**2)

    # 3x3 roughness: std of neighborhood heights
    acc = jnp.zeros_like(e)
    acc2 = jnp.zeros_like(e)
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            v = jnp.roll(jnp.roll(e, dr, axis=-2), dc, axis=-1)
            acc = acc + v
            acc2 = acc2 + v * v
    mean = acc / 9.0
    rough = jnp.sqrt(jnp.maximum(acc2 / 9.0 - mean**2, 0.0))

    t_slope = 1.0 - jnp.minimum(slope / critical_slope, 1.0)
    t_rough = 1.0 - jnp.minimum(rough / critical_roughness, 1.0)
    trav = 0.5 * t_slope + 0.5 * t_rough
    unknown = hm.variance > 1e2
    return hm._replace(
        traversability=jnp.where(unknown, 1.0, trav)
    )


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
    keep_xy_if_unmoved: bool = False,
) -> jnp.ndarray:
    """Map-aware foothold: snap pf to the first traversable cell in
    spiral order and take its elevation (z) — _idxMapChecking +
    _updateFoothold (CMPC_Locomotion_cv.cpp:768-940), shape-static.

    keep_xy_if_unmoved: when the spiral search selects the Raibert
    target's own cell, return the EXACT Raibert xy instead of the cell
    center.  The reference always rewrites pf from the (ceil-quantized)
    cell index (:835-838), which biases every foothold up to one cell
    toward +x/+y and, applied to all four feet, shifts the support
    polygon and walks the body sideways (measured: -0.25 m lateral drift
    over 110 trot steps on a 3 cm grid).  Snapping only MOVED targets
    removes the bias while preserving the search semantics.
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
    xy = jnp.where(any_valid[..., None], xy, pf[..., 0:2])
    if keep_xy_if_unmoved:
        unmoved = jnp.all(sel == center_idx, axis=-1)
        xy = jnp.where(unmoved[..., None], pf[..., 0:2], xy)
    return jnp.concatenate([xy, (z + foot_offset)[..., None]], axis=-1)
