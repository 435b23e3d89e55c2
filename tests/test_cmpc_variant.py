"""CMPC-variant feature tests (CMPC_Locomotion.cpp extensions)."""

import pytest
import numpy as np
import jax.numpy as jnp

from quad_periodic_mpc_tpu.control import cmpc_variant as cv
from quad_periodic_mpc_tpu.ops import gait as gait_ops
from quad_periodic_mpc_tpu.terrain import heightmap as hmap

pytestmark = pytest.mark.smoke  # fast cross-layer sanity tier


def test_pitch_reference_flat_ground():
    feet = jnp.asarray(
        [[0.18, -0.13, -0.28], [0.18, 0.13, -0.28],
         [-0.18, -0.13, -0.28], [-0.18, 0.13, -0.28]]
    )
    rpy = jnp.zeros(3)
    # flat plane, zero velocity -> pitch ~ 0
    p = cv.pitch_reference(jnp.asarray(0.0), rpy, feet, jnp.asarray(0.0), 1.0)
    assert abs(float(p)) < 1e-6
    # forward command crouches the nose (CMPC_Locomotion.cpp:687-691)
    p_fwd = cv.pitch_reference(jnp.asarray(0.0), rpy, feet, jnp.asarray(0.5), 1.0)
    assert abs(float(p_fwd) - (-0.15)) < 1e-6
    # standing overrides to zero
    p_stand = cv.pitch_reference(
        jnp.asarray(0.1), rpy, feet, jnp.asarray(0.5), 1.0, standing=True
    )
    assert float(p_stand) == 0.0


def test_pitch_reference_slope():
    """Feet on an inclined plane -> est pitch reflects the slope."""
    feet = np.array(
        [[0.18, -0.13, -0.28], [0.18, 0.13, -0.28],
         [-0.18, -0.13, -0.28], [-0.18, 0.13, -0.28]]
    )
    slope = 0.2   # rad, front feet higher
    feet[:, 2] += np.tan(slope) * feet[:, 0]
    p = cv.pitch_reference(
        jnp.asarray(0.0), jnp.zeros(3), jnp.asarray(feet),
        jnp.asarray(0.0), 1.0,
    )
    assert abs(abs(float(p)) - slope) < 0.05


def test_adaptive_gait_update():
    g = gait_ops.preset("trotting")
    swing = jnp.asarray([0.9, 0.0, 0.0, 0.0])
    sensor = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    ph = jnp.asarray(0.45)
    g2 = cv.adaptive_gait_update(g, swing, ph, sensor)
    # leg 0's stance pulled earlier: duration grew
    assert int(g2.durations[0]) > int(g.durations[0])
    assert int(g2.durations[1]) == int(g.durations[1])


def test_terrain_foothold_four_legs():
    hm = hmap.create(size=32, resolution=0.02, dtype=jnp.float64)
    hm = hm._replace(elevation=jnp.full((32, 32), 0.05, jnp.float64))
    pf = jnp.asarray(
        [[0.1, -0.1, 0.0], [0.1, 0.1, 0.0], [-0.1, -0.1, 0.0], [-0.1, 0.1, 0.0]]
    )
    out = cv.terrain_foothold(hm, pf)
    assert out.shape == (4, 3)
    np.testing.assert_allclose(np.asarray(out[:, 2]), 0.05, atol=1e-9)
    np.testing.assert_allclose(np.asarray(out[:, :2]), np.asarray(pf[:, :2]),
                               atol=1e-9)
