"""Terrain tier tests: Kalman height fusion + spiral foothold selection."""

import pytest
import numpy as np
import jax.numpy as jnp

from quad_periodic_mpc_tpu.ops import gait_scheduler as gs
from quad_periodic_mpc_tpu.terrain import heightmap as hmap

pytestmark = pytest.mark.smoke  # fast cross-layer sanity tier


def test_fuse_points_kalman():
    hm = hmap.create(size=16, resolution=0.05, init_variance=100.0,
                     dtype=jnp.float64)
    # two measurements of the same cell combine precision-weighted
    pt = jnp.asarray([[0.1, 0.1, 0.5], [0.1, 0.1, 0.7]])
    var = jnp.asarray([0.01, 0.01])
    hm2 = hmap.fuse_points(hm, pt, var)
    idx = hmap.world_to_index(hm, pt[0:1, 0:2])[0]
    h = float(hm2.elevation[idx[0], idx[1]])
    v = float(hm2.variance[idx[0], idx[1]])
    # prior is nearly uninformative -> ~mean of the two, var ~ 0.005
    assert abs(h - 0.6) < 1e-3
    assert abs(v - 0.005) < 1e-3
    # untouched cells unchanged
    assert float(hm2.variance[0, 0]) == 100.0


def test_fuse_convergence():
    hm = hmap.create(size=8, resolution=0.1, init_variance=1e4, dtype=jnp.float64)
    for _ in range(20):
        hm = hmap.fuse_points(
            hm, jnp.asarray([[0.0, 0.0, 0.25]]), jnp.asarray([0.02])
        )
        hm = hmap.predict(hm, 1e-5)
    idx = hmap.world_to_index(hm, jnp.asarray([0.0, 0.0]))
    assert abs(float(hm.elevation[idx[0], idx[1]]) - 0.25) < 1e-3


def test_select_foothold_snaps_to_traversable():
    hm = hmap.create(size=32, resolution=0.02, dtype=jnp.float64)
    hm = hm._replace(elevation=jnp.full((32, 32), 0.12, jnp.float64))
    # make the target cell untraversable; nearest traversable is adjacent
    pf = jnp.asarray([0.0, 0.0, 0.0])
    idx = hmap.world_to_index(hm, pf[0:2])
    trav = jnp.ones((32, 32), jnp.float64)
    trav = trav.at[idx[0], idx[1]].set(0.0)
    hm = hm._replace(traversability=trav)
    out = hmap.select_foothold(hm, pf)
    # z picked from the map; xy moved at most one cell
    assert abs(float(out[2]) - 0.12) < 1e-9
    assert abs(float(out[0]) - pf[0]) <= 0.02 + 1e-9
    assert abs(float(out[1]) - pf[1]) <= 0.02 + 1e-9
    out_idx = hmap.world_to_index(hm, out[0:2])
    assert float(hm.traversability[out_idx[0], out_idx[1]]) > 0.8


def test_select_foothold_batched():
    hm = hmap.create(size=32, resolution=0.02, batch=(3,), dtype=jnp.float64)
    pf = jnp.asarray([[0.05, 0.0, 0.0], [0.0, 0.05, 0.0], [0.0, 0.0, 0.0]])
    out = hmap.select_foothold(hm, pf)
    assert out.shape == (3, 3)
    np.testing.assert_allclose(np.asarray(out[..., 2]), 0.0, atol=1e-9)


def test_gait_scheduler_trot_timing():
    prm = gs.params("trot", jnp.float64)
    st = gs.init(prm)
    dt = 0.002
    contacts = []
    for _ in range(int(0.5 / dt)):        # one full 0.5 s period
        st, out = gs.step(st, prm, dt)
        contacts.append(np.asarray(out.contact))
    contacts = np.stack(contacts)
    # diagonal pairs alternate with 50% duty
    duty = contacts.mean(axis=0)
    np.testing.assert_allclose(duty, 0.5, atol=0.02)
    np.testing.assert_allclose(contacts[:, 0], contacts[:, 3])
    np.testing.assert_allclose(contacts[:, 1], contacts[:, 2])
    assert (contacts[:, 0] + contacts[:, 1] == 1).all()
    # exactly one touchdown per leg per period
    st2 = gs.init(prm)
    tds = np.zeros(4)
    for _ in range(int(0.5 / dt)):
        st2, out = gs.step(st2, prm, dt)
        tds += np.asarray(out.touchdown)
    np.testing.assert_allclose(tds, 1.0)


def test_gait_scheduler_three_foot():
    prm = gs.params("three_foot", jnp.float64)
    st = gs.init(prm)
    for _ in range(100):
        st, out = gs.step(st, prm, 0.002)
        assert float(out.contact[0]) == 0.0   # disabled leg never contacts


def test_early_contact_handle():
    off = jnp.asarray([0.0, 0.5, 0.5, 0.0])
    dur = jnp.asarray([0.5, 0.5, 0.5, 0.5])
    swing = jnp.asarray([0.9, 0.2, 0.0, 0.0])   # leg 0 late in swing
    sensor = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    phase = jnp.asarray(0.9)
    off2, dur2 = gs.early_contact_handle(off, dur, swing, phase, sensor,
                                         jnp.asarray(16))
    # leg 0: diff = (0.0 - 0.9) + 1 = 0.1 -> offset shrinks, duration grows
    assert abs(float(off2[0]) - (0.0 - 0.1 * 1.0001)) < 1e-6
    assert abs(float(dur2[0]) - 0.6) < 1e-6
    # leg 1: touched but early in swing -> unchanged
    assert float(off2[1]) == 0.5 and float(dur2[1]) == 0.5


def test_sensor_processor_pipeline():
    """Sensor processors: variance grows with distance; points land in
    the map frame; fusing a processed cloud reconstructs the surface."""
    import jax.numpy as jnp
    from quad_periodic_mpc_tpu.terrain import sensor

    model = sensor.StructuredLightModel()
    # camera looking straight down from 0.5 m, points on flat ground
    n = 32
    xs = np.linspace(-0.3, 0.3, n)
    pts_sensor = jnp.asarray(
        np.stack([xs, np.zeros(n), np.full(n, 0.5)], axis=-1)
    )
    R_cam_down = jnp.asarray(
        [[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]]
    )  # sensor z -> -map z
    p_map, var = sensor.process_points(
        pts_sensor, model,
        R_map_base=jnp.eye(3),
        R_base_sensor=R_cam_down,
        t_base_sensor=jnp.asarray([0.0, 0.0, 0.5]),
        t_map_base=jnp.zeros(3),
    )
    np.testing.assert_allclose(np.asarray(p_map)[:, 2], 0.0, atol=1e-6)
    assert (np.asarray(var) > 0).all()

    far = sensor.process_points(
        pts_sensor.at[:, 2].set(2.0), model,
        R_map_base=jnp.eye(3), R_base_sensor=R_cam_down,
        t_base_sensor=jnp.asarray([0.0, 0.0, 2.0]), t_map_base=jnp.zeros(3),
    )[1]
    assert float(np.asarray(far).mean()) > float(np.asarray(var).mean())

    # end-to-end: fuse the processed cloud into the map
    hm = hmap.create(size=32, resolution=0.04, dtype=jnp.float64)
    hm = hmap.fuse_points(hm, jnp.asarray(p_map, jnp.float64),
                          jnp.asarray(var, jnp.float64) + 1e-6)
    idx = hmap.world_to_index(hm, jnp.asarray([0.0, 0.0]))
    assert abs(float(hm.elevation[idx[0], idx[1]])) < 1e-3


def test_move_keeps_world_anchored_data():
    """move() shifts the grid under the robot without smearing: a bump
    fused at a world point stays at that world point (ElevationMap::move
    semantics)."""
    hm = hmap.create(size=32, resolution=0.05)
    pt = jnp.array([[0.30, -0.10, 0.12]])
    hm = hmap.fuse_points(hm, pt, jnp.array([1e-4]))
    z_before = float(hmap.sample(
        hm.elevation, hmap.world_to_index(hm, pt[:, 0:2])[None, 0]
    )[0])
    assert abs(z_before - 0.12) < 1e-3

    hm2 = hmap.move(hm, jnp.array([0.25, 0.15]))
    # center snapped to whole cells
    np.testing.assert_allclose(
        np.asarray(hm2.center) / 0.05,
        np.round(np.asarray(hm2.center) / 0.05), atol=1e-6,
    )
    z_after = float(hmap.sample(
        hm2.elevation, hmap.world_to_index(hm2, pt[:, 0:2])[None, 0]
    )[0])
    assert abs(z_after - 0.12) < 1e-3
    # newly exposed strip is reset to the prior
    assert float(jnp.max(hm2.variance)) > 1e3


def test_mahalanobis_gate_higher_replaces_lower_inflates():
    """Multi-height handling (ElevationMap.cpp:152-166): a far-higher
    point replaces the surface; a far-lower one only inflates variance."""
    hm = hmap.create(size=16, resolution=0.05)
    base = jnp.array([[0.0, 0.0, 0.10]])
    hm = hmap.fuse_points(hm, base, jnp.array([1e-6]))

    # higher outlier -> replace
    hi = jnp.array([[0.0, 0.0, 0.50]])
    hm_hi = hmap.fuse_points(hm, hi, jnp.array([1e-4]),
                             mahalanobis_threshold=2.5)
    idx = hmap.world_to_index(hm, jnp.array([0.0, 0.0]))
    z = float(hm_hi.elevation[tuple(np.asarray(idx))])
    assert abs(z - 0.50) < 1e-6

    # lower outlier -> height unchanged, variance inflated
    lo = jnp.array([[0.0, 0.0, -0.50]])
    hm_lo = hmap.fuse_points(hm, lo, jnp.array([1e-4]),
                             mahalanobis_threshold=2.5,
                             multi_height_noise=1e-3)
    z = float(hm_lo.elevation[tuple(np.asarray(idx))])
    v0 = float(hm.variance[tuple(np.asarray(idx))])
    v = float(hm_lo.variance[tuple(np.asarray(idx))])
    assert abs(z - 0.10) < 1e-6
    assert v > v0 + 0.5e-3


def test_visibility_cleanup_removes_ghost():
    """A cell holding a stale high obstacle is reset when the latest scan
    sees through it (ElevationMap::visibilityCleanup)."""
    hm = hmap.create(size=32, resolution=0.05)
    # ground everywhere the scan sees, plus a stale ghost at (0.3, 0)
    ghost = jnp.array([[0.30, 0.0, 0.60]])
    hm = hmap.fuse_points(hm, ghost, jnp.array([1e-6]))

    sensor = jnp.array([0.0, 0.0, 0.40])
    # scan point at ground level BEHIND the ghost: the ray passes over
    # the ghost cell far below 0.6
    scan = jnp.array([[0.60, 0.0, 0.0]])
    hm2 = hmap.visibility_cleanup(hm, scan, jnp.array([1e-4]), sensor)
    idx = tuple(np.asarray(hmap.world_to_index(hm, jnp.array([0.30, 0.0]))))
    assert float(hm2.variance[idx]) > 1e3          # reset to prior
    # the scan's own endpoint cell is NOT a ghost target here (ray ends
    # at its lowest point); cells never crossed stay untouched
    far = tuple(np.asarray(hmap.world_to_index(hm, jnp.array([-0.5, -0.5]))))
    assert float(hm2.variance[far]) == float(hm.variance[far])


def test_traversability_flags_slope_and_roughness():
    hm = hmap.create(size=32, resolution=0.05)
    # observed flat ground (low variance) with a sharp step
    e = jnp.zeros((32, 32))
    e = e.at[:, 16:].set(0.3)
    hm = hm._replace(elevation=e, variance=jnp.full((32, 32), 1e-4))
    hm = hmap.compute_traversability(hm)
    t = np.asarray(hm.traversability)
    assert t[5, 16] < 0.2       # step edge untraversable
    assert t[5, 5] > 0.95       # flat interior fine
    assert t[5, 28] > 0.95


def test_motion_update_grows_variance_by_pose_cov():
    hm = hmap.create(size=8, resolution=0.05)
    hm = hm._replace(variance=jnp.full((8, 8), 0.01))
    cov = jnp.diag(jnp.array([0.0, 0.0, 4e-4]))   # 2 cm z std
    hm2 = hmap.motion_update(hm, cov, jnp.eye(3))
    np.testing.assert_allclose(np.asarray(hm2.variance), 0.01 + 4e-4,
                               rtol=1e-5)


class TestWecdfQuantile:
    """Mirrors the reference's gtest numeric cases
    (elevation_mapping/test/WeightedEmpiricalCumulativeDistributionFunctionTest.cpp)."""

    def _q(self, values, weights, q):
        import numpy as np
        v = jnp.asarray(values, jnp.float64)
        w = jnp.asarray(weights, jnp.float64)
        return float(hmap.wecdf_quantile(v, w, q))

    def test_trivial_two_points(self):
        v, w = [0.0, 1.0], [1.0, 1.0]
        for q, want in [(-0.1, 0.0), (0.0, 0.0), (0.25, 0.25), (0.5, 0.5),
                        (2/3, 2/3), (0.95, 0.95), (1.0, 1.0), (1.1, 1.0)]:
            assert abs(self._q(v, w, q) - want) < 1e-12

    def test_linear_equally_spaced(self):
        v = [0.0, 10/3, 20/3, 10.0]
        w = [1.0] * 4
        for q, want in [(0.0, 0.0), (0.25, 2.5), (0.5, 5.0),
                        (2/3, 20/3), (0.95, 9.5), (1.1, 10.0)]:
            assert abs(self._q(v, w, q) - want) < 1e-12

    def test_single_value_duplicates(self):
        v, w = [3.0, 3.0, 3.0], [1.0] * 3
        for q in [0.0, 0.25, 0.5, 1.0, 2.0]:
            assert abs(self._q(v, w, q) - 3.0) < 1e-12

    def test_synthetic_duplicate_merge(self):
        # 10x value 1.0 + 1x value 2.0: merged runs give 1.05 / 1.95 —
        # unmerged per-entry nodes would give 1.0 / 1.5 (wrong)
        v = [1.0] * 10 + [2.0]
        w = [1.0] * 11
        assert abs(self._q(v, w, 0.05) - 1.05) < 1e-12
        assert abs(self._q(v, w, 0.95) - 1.95) < 1e-12

    def test_zero_weight_entries_ignored(self):
        v = [5.0, 0.0, 1.0, 9.0]
        w = [0.0, 1.0, 1.0, 0.0]
        assert abs(self._q(v, w, 0.5) - 0.5) < 1e-12

    def test_batched(self):
        v = jnp.asarray([[0.0, 1.0, 0.5], [2.0, 4.0, 3.0]], jnp.float64)
        w = jnp.ones((2, 3), jnp.float64)
        out = np.asarray(hmap.wecdf_quantile(v, w, 0.5))
        assert abs(out[0] - 0.5) < 1e-12 and abs(out[1] - 3.0) < 1e-12


def test_fuse_area_bounds():
    """fuse_area: flat seen region -> fused mean == height, bounds bracket
    it by ~2 sigma; unseen cells fall back to the raw-cell branch
    (ElevationMap.cpp:381-390)."""
    hm = hmap.create(size=16, resolution=0.03, dtype=jnp.float64,
                     init_variance=1e4)
    # observe a flat 0.1 m plateau in a 8x8 patch with variance 1e-4
    elev = hm.elevation.at[4:12, 4:12].set(0.1)
    var = hm.variance.at[4:12, 4:12].set(1e-4)
    hm = hm._replace(elevation=elev, variance=var)
    mean, lower, upper = hmap.fuse_area(hm, radius_cells=2, sigma=0.05)
    mean, lower, upper = map(np.asarray, (mean, lower, upper))
    # interior of the plateau
    assert np.allclose(mean[6:10, 6:10], 0.1, atol=1e-6)
    assert np.allclose(lower[6:10, 6:10], 0.1 - 2e-2, atol=1e-3)
    assert np.allclose(upper[6:10, 6:10], 0.1 + 2e-2, atol=1e-3)
    # unseen corner: raw fallback
    assert abs(mean[0, 0] - 0.0) < 1e-9
    assert abs(lower[0, 0] - (0.0 - 2 * 100.0)) < 1e-6
    assert abs(upper[0, 0] - (0.0 + 2 * 100.0)) < 1e-6
