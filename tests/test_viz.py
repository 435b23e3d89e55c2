"""Marker-hub tests (utils/viz.py — the headless RViz marker analog)."""

import io
import json
import os

import numpy as np
import pytest

from quad_periodic_mpc_tpu.utils import viz

pytestmark = pytest.mark.smoke  # fast cross-layer sanity tier


def _example_scene():
    p_feet = np.array(
        [[0.18, -0.13, 0.0], [0.18, 0.13, 0.0],
         [-0.18, -0.13, 0.0], [-0.18, 0.13, 0.05]]
    )
    return viz.scene(
        p_body=np.array([0.0, 0.0, 0.29]),
        p_feet=p_feet,
        contact_state=np.array([1.0, 1.0, 1.0, 0.0]),
        swing_pf=p_feet + np.array([0.08, 0.0, 0.0]),
        forces=np.array([[0, 0, 40.0]] * 4),
        x_ref_positions=np.array([[0, 0, 0.29], [0.1, 0, 0.29]]),
        plane_coeffs=(0.0, 0.1, 0.0),
    )


def test_scene_marker_set_matches_reference_topics():
    names = {m.name for m in _example_scene()}
    # the /visual/* topic set (debug.cpp:27-38)
    assert names == {
        "last_p_stance", "swing_pf", "leg_forces", "des_trajectory",
        "estimated_stance_plane",
    }


def test_scene_partition_and_geometry():
    sc = {m.name: m for m in _example_scene()}
    # 3 stance feet, 1 swing target
    assert sc["last_p_stance"].points.shape == (3, 3)
    assert sc["swing_pf"].points.shape == (1, 3)
    # force arrow end = foot + f/120
    arrows = sc["leg_forces"].points
    np.testing.assert_allclose(
        arrows[:, 1, 2] - arrows[:, 0, 2], 40.0 / 120.0
    )
    # plane cube center sits on the plane under the body
    cube = sc["estimated_stance_plane"].points
    np.testing.assert_allclose(cube[0], [0.0, 0.0, 0.0], atol=1e-12)


def test_jsonl_round_trip():
    buf = io.StringIO()
    viz.to_jsonl(_example_scene(), buf)
    lines = [json.loads(l) for l in buf.getvalue().splitlines()]
    assert len(lines) == 5
    assert all({"name", "kind", "points", "color", "scale"} <= set(l)
               for l in lines)


def test_render_svg(tmp_path):
    path = os.path.join(tmp_path, "scene.svg")
    viz.render_svg(_example_scene(), path, view="xz")
    svg = open(path).read()
    assert svg.startswith("<svg")
    assert svg.count("<circle") == 4          # 3 stance + 1 swing
    assert svg.count("<line") == 4            # 4 force arrows
    assert svg.count("<polyline") == 1        # trajectory
    assert svg.count("<rect") == 2            # background + plane cube
