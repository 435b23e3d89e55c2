"""Elevation-map postprocessing — the thread-pool pipeline, TPU-style.

The reference runs elevation_mapping's PostprocessorPool
(elevation_mapping/src/postprocessing/PostprocessorPool.cpp): a chain of
grid_map filters (median fill, inpainting, smoothing) applied to each
fused map on worker threads.  Threads are the CPU answer to throughput;
on TPU the same pipeline is a chain of batched stencil ops over
(..., H, W) maps — one fused XLA program, no pool needed.

Filters provided (grid_map_filters analogs):
- median_filter: 3x3/5x5 ordered-statistic smoothing (MedianFillFilter).
- inpaint: fill invalid cells (variance above a threshold) by iterative
  neighbor diffusion — the dense equivalent of OpenCV telea inpainting
  used by grid_map_cv::InpaintFilter.
- box_smooth: mean smoothing (grid_map_filters::MeanInRadiusFilter).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from quad_periodic_mpc_tpu.terrain.heightmap import HeightMap


def _neighborhood(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Stack the k*k shifted copies of x: (..., H, W) -> (k*k, ..., H, W).

    Edge cells replicate the border (roll + overwrite), keeping shapes
    static.
    """
    r = k // 2
    H, W = x.shape[-2:]
    rows = jnp.clip(jnp.arange(H)[:, None] + np.arange(-r, r + 1)[None], 0, H - 1)
    cols = jnp.clip(jnp.arange(W)[:, None] + np.arange(-r, r + 1)[None], 0, W - 1)
    # gather rows then cols for each (dr, dc) pair
    out = []
    for i in range(k):
        xi = jnp.take(x, rows[:, i], axis=-2)
        for j in range(k):
            out.append(jnp.take(xi, cols[:, j], axis=-1))
    return jnp.stack(out, 0)


def median_filter(x: jnp.ndarray, k: int = 3) -> jnp.ndarray:
    """k x k median (MedianFillFilter analog), batched."""
    nb = _neighborhood(x, k)
    return jnp.median(nb, axis=0)


def box_smooth(x: jnp.ndarray, k: int = 3) -> jnp.ndarray:
    """k x k mean smoothing."""
    return jnp.mean(_neighborhood(x, k), axis=0)


def inpaint(
    x: jnp.ndarray,
    valid: jnp.ndarray,
    iters: int = 16,
) -> jnp.ndarray:
    """Fill invalid cells by iterative valid-neighbor averaging.

    Each sweep replaces invalid cells with the mean of their currently
    valid 3x3 neighbors (cells with no valid neighbor stay put until the
    front reaches them); `iters` sweeps propagate the fill `iters` cells
    inward.  Valid cells are never modified.
    """
    w0 = valid.astype(x.dtype)

    def sweep(carry, _):
        z, w = carry
        nb_z = _neighborhood(z * w, 3)
        nb_w = _neighborhood(w, 3)
        s = jnp.sum(nb_z, 0)
        c = jnp.sum(nb_w, 0)
        fill = s / jnp.maximum(c, 1.0)
        newly = (c > 0.0) & (w == 0.0)
        z = jnp.where(w > 0.0, z, jnp.where(newly, fill, z))
        w = jnp.where(newly, 1.0, w)
        return (z, w), None

    (z, _), _ = jax.lax.scan(sweep, (x, w0), None, length=iters)
    return jnp.where(valid, x, z)


def postprocess(
    hm: HeightMap,
    variance_valid: float = 1e2,
    inpaint_iters: int = 16,
    median_k: int = 3,
) -> HeightMap:
    """Full pipeline: inpaint unobserved cells, then median-denoise.

    Matches the reference's filter-chain ordering (inpaint before
    smoothing, elevation_mapping config/postprocessor_pipeline.yaml
    convention).  Inpainted cells get the validity-threshold variance so
    downstream precision-weighted fusion treats them as soft.
    """
    valid = hm.variance < variance_valid
    z = inpaint(hm.elevation, valid, inpaint_iters)
    z = median_filter(z, median_k)
    var = jnp.where(valid, hm.variance, jnp.asarray(variance_valid, hm.variance.dtype))
    return hm._replace(elevation=z, variance=var)
