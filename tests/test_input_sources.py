"""InputSourceManager config validation + stereo sensor model.

Mirrors the reference's rostest suite
(elevation_mapping/test/input_sources/InputSourcesTest.cpp:24-119) with
the same fixture shapes (TestConfigurations.yaml), plus an end-to-end
multi-source fusion check and StereoSensorProcessor variance parity
(StereoSensorProcessor.cpp:40-97).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from quad_periodic_mpc_tpu.terrain import heightmap as hm_lib
from quad_periodic_mpc_tpu.terrain import sensor as sensor_lib
from quad_periodic_mpc_tpu.terrain.input_sources import InputSourceManager


def _valid(topic="/lidar/depth/points", proc="perfect", **over):
    cfg = {
        "type": "pointcloud",
        "topic": topic,
        "queue_size": 1,
        "publish_on_update": True,
        "sensor_processor": {"type": proc},
    }
    cfg.update(over)
    return cfg


def _configure(config):
    mgr = InputSourceManager()
    ok = mgr.configure(config)
    return ok, mgr


# -- the reference's gtest matrix (InputSourcesTest.cpp) ---------------

def test_single_input_valid():
    ok, mgr = _configure({"standard_single_input": _valid()})
    assert ok and mgr.number_of_sources() == 1


def test_multiple_inputs_valid():
    ok, mgr = _configure({
        "input_1": _valid("/lidar_1/depth/points"),
        "input_2": _valid("/image/depth/image_rect_raw",
                          type="depthimage", publish_on_update=False),
        "input_3": _valid("/lidar_2/depth/points", queue_size=5),
    })
    assert ok and mgr.number_of_sources() == 3


@pytest.mark.parametrize("missing", [
    "type", "topic", "queue_size", "publish_on_update", "sensor_processor",
])
def test_missing_member_rejected(missing):
    cfg = _valid()
    del cfg[missing]
    ok, mgr = _configure({"bad": cfg})
    assert not ok and mgr.number_of_sources() == 0


def test_subscribing_same_topic_twice_keeps_first():
    ok, mgr = _configure({
        "input_1": _valid("/lidar/points", queue_size=1),
        "input_2": _valid("/lidar/points", queue_size=7),
    })
    assert not ok
    assert mgr.number_of_sources() == 1
    assert mgr.sources[0].queue_size == 1


def test_configuration_not_given():
    ok, mgr = _configure(None)
    assert not ok and mgr.number_of_sources() == 0


def test_configuration_empty_sources_succeeds():
    ok, mgr = _configure([])
    assert ok and mgr.number_of_sources() == 0


def test_configuration_wrong_type_and_not_a_struct():
    # wrong_type_configuration / not_a_struct fixtures: a list is not a
    # mapping (InputSourceManager.cpp:35-42)
    for bad in ([_valid()], "nope", 3):
        ok, mgr = _configure(bad)
        assert not ok and mgr.number_of_sources() == 0


def test_queue_size_is_string_rejected():
    ok, mgr = _configure({"bad": _valid(queue_size="1")})
    assert not ok and mgr.number_of_sources() == 0


def test_negative_queue_size_rejected():
    ok, mgr = _configure({"bad": _valid(queue_size=-1)})
    assert not ok and mgr.number_of_sources() == 0


def test_unknown_sensor_processor_rejected():
    ok, mgr = _configure({"bad": _valid(proc="sonar_proc")})
    assert not ok and mgr.number_of_sources() == 0


def test_unknown_message_type_fails_registration():
    # UnknownType (InputSourcesTest.cpp:75-87): 'sonar' configures fine,
    # registerCallbacks has no handler for it → False
    ok, mgr = _configure({"unknown_input": _valid(type="sonar")})
    assert ok and mgr.number_of_sources() == 1
    assert not mgr.register_callbacks({"pointcloud": lambda *a: None})


def test_registration_routes_by_type():
    ok, mgr = _configure({
        "input_1": _valid("/lidar_1/depth/points"),
        "input_2": _valid("/lidar_2/depth/points"),
    })
    assert ok
    handler = lambda *a: None  # noqa: E731
    assert mgr.register_callbacks({"pointcloud": handler})
    assert [s.topic for s, _ in mgr.routing] == mgr.topics()
    # empty manager registers trivially (InputSourceManager.hpp:78-81)
    empty = InputSourceManager()
    empty.configure([])
    assert empty.register_callbacks({})


# -- stereo variance model ---------------------------------------------

def test_stereo_variance_matches_scalar_reference():
    m = sensor_lib.StereoModel(
        p_1=0.1, p_2=0.002, p_3=0.5, p_4=320.0, p_5=0.001,
        lateral_factor=0.01, depth_to_disparity_factor=100.0,
        v_center=240.0,
    )
    pixel_ij = jnp.array([[200.0, 300.0], [240.0, 320.0]])
    pts = jnp.array([[0.3, -0.1, 1.5], [0.0, 0.2, 2.5]])
    var = np.asarray(m.sensor_variance(pts, pixel_ij=pixel_ij))
    f = 100.0
    for k in range(2):
        x, y, z = np.asarray(pts)[k]
        dp = f / z
        i, j = np.asarray(pixel_ij)[k]
        vn = (f / dp**2) ** 2 * (
            (0.001 * dp + 0.002)
            * np.sqrt((0.5 * dp + 320.0 - j) ** 2 + (240.0 - i) ** 2)
            + 0.1
        )
        vl = (0.01 * np.sqrt(x * x + y * y + z * z)) ** 2
        np.testing.assert_allclose(var[k], [vl, vl, vn], rtol=1e-5)
    mask = np.asarray(
        sensor_lib.StereoModel(cutoff_min_depth=1.0, cutoff_max_depth=2.0)
        .depth_mask(pts)
    )
    assert mask.tolist() == [True, False]


# -- end-to-end: two sources fused through the manager ------------------

def test_multi_source_fusion_updates_map():
    ok, mgr = _configure({
        "lidar": _valid("/lidar/points", proc="laser"),
        "cam": _valid("/cam/points", proc="structured_light"),
    })
    assert ok
    hm = hm_lib.create(size=20, resolution=0.1)
    eye = jnp.eye(3)
    zero = jnp.zeros(3)
    # flat ground at z=0.1, sensor frame == map frame
    pts = jnp.stack(
        [jnp.linspace(-0.5, 0.5, 16), jnp.zeros(16), jnp.full((16,), 0.1)],
        axis=-1,
    )
    for s in mgr.sources:
        hm = s.process(hm, pts, eye, eye, zero, zero)
    fused_cells = np.asarray(hm.variance) < 1e3
    assert fused_cells.sum() >= 8
    heights = np.asarray(hm.elevation)[fused_cells]
    np.testing.assert_allclose(heights, 0.1, atol=1e-3)


def test_depth_cutoff_excludes_points_from_fusion():
    """ADVICE r1: the stereo cutoff (PassThrough on z,
    StereoSensorProcessor.cpp:99-111) must drop out-of-range points before
    fusion — a far bogus point may not corrupt the map."""
    ok, mgr = _configure({
        "cam": {
            "type": "pointcloud", "topic": "/cam/points", "queue_size": 1,
            "publish_on_update": True,
            "sensor_processor": {
                "type": "stereo", "p_1": 0.01, "lateral_factor": 0.01,
                "depth_to_disparity_factor": 100.0,
                "cutoff_min_depth": 0.5, "cutoff_max_depth": 2.0,
            },
        },
    })
    assert ok
    hm = hm_lib.create(size=20, resolution=0.1)
    eye = jnp.eye(3)
    zero = jnp.zeros(3)
    # two points land in the SAME cell: a valid one at z(depth)=1.0 and a
    # cutoff-violating one at depth 5.0 whose (wrong) height is 5.0
    pts = jnp.array([[0.05, 0.05, 1.0], [0.049, 0.049, 5.0]])
    hm2 = mgr.sources[0].process(hm, pts, eye, eye, zero, zero)
    idx = hm_lib.world_to_index(hm, pts[:1, :2])
    i, j = int(idx[0, 0]), int(idx[0, 1])
    assert abs(float(hm2.elevation[i, j]) - 1.0) < 1e-3
    # and with mahalanobis handling on a pre-fused map, the cutoff point
    # cannot trigger multi-height replacement either
    hm3 = mgr.sources[0].process(
        hm2, pts, eye, eye, zero, zero, mahalanobis_threshold=2.0
    )
    assert abs(float(hm3.elevation[i, j]) - 1.0) < 1e-3


def test_configure_twice_detects_cross_call_duplicates():
    """ADVICE r1: duplicate topics across repeated configure() calls are
    rejected (seen set seeded from already-configured sources)."""
    mgr = InputSourceManager()
    assert mgr.configure({"a": _valid("/points")})
    assert not mgr.configure({"b": _valid("/points")})
    assert mgr.number_of_sources() == 1


def test_failed_registration_clears_previous_routing():
    """ADVICE r1: register_callbacks resets routing; a failed call leaves
    no stale routing behind and routing is always defined."""
    mgr = InputSourceManager()
    assert mgr.routing == []
    mgr.configure({"a": _valid("/points")})
    assert mgr.register_callbacks({"pointcloud": lambda *a: None})
    assert len(mgr.routing) == 1
    assert not mgr.register_callbacks({"other": lambda *a: None})
    assert mgr.routing == []
