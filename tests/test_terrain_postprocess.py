"""Elevation-map postprocessing filters."""

import jax.numpy as jnp
import numpy as np

from quad_periodic_mpc_tpu.terrain import postprocess as pp
from quad_periodic_mpc_tpu.terrain.heightmap import HeightMap


def test_median_removes_salt_noise():
    rng = np.random.default_rng(0)
    z = np.zeros((16, 16), np.float32)
    spikes = rng.choice(256, 8, replace=False)
    z.flat[spikes] = 5.0
    out = np.asarray(pp.median_filter(jnp.asarray(z), 3))
    assert np.max(np.abs(out)) < 1e-6  # isolated spikes vanish


def test_median_preserves_step_edge():
    z = np.zeros((12, 12), np.float32)
    z[:, 6:] = 0.1
    out = np.asarray(pp.median_filter(jnp.asarray(z), 3))
    # a clean step edge is a median fixed point
    assert np.allclose(out, z, atol=1e-7)


def test_inpaint_fills_hole_smoothly():
    z = np.zeros((16, 16), np.float32)
    z[:, 8:] = 0.2
    valid = np.ones((16, 16), bool)
    valid[6:10, 6:10] = False
    z[6:10, 6:10] = 99.0  # garbage under the hole
    out = np.asarray(pp.inpaint(jnp.asarray(z), jnp.asarray(valid), iters=8))
    hole = out[6:10, 6:10]
    assert np.all(hole >= -1e-6) and np.all(hole <= 0.2 + 1e-6)
    # valid cells untouched
    assert np.allclose(out[valid], z[valid])


def test_postprocess_pipeline_batched():
    z = jnp.zeros((2, 16, 16))
    var = jnp.ones((2, 16, 16)) * 1.0
    var = var.at[:, 5, 5].set(1e4)       # unobserved cell
    z = z.at[:, 5, 5].set(50.0)          # garbage elevation there
    hm = HeightMap(
        elevation=z, variance=var, traversability=jnp.ones((2, 16, 16)),
        center=jnp.zeros((2, 2)), resolution=0.03,
    )
    out = pp.postprocess(hm)
    assert out.elevation.shape == (2, 16, 16)
    assert float(jnp.max(jnp.abs(out.elevation))) < 1e-3  # garbage gone
    assert float(out.variance[0, 5, 5]) == 100.0          # soft validity
