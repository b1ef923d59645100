"""Unit tests for the vectorized geometry kernels (pure numpy, no Spark)."""

import math

import numpy as np

from osmzen_spark.geom.kernels import geometry_stats
from osmzen_spark.geom.mercator import mercator_x, mercator_y, unproject_lat, unproject_lon


def _stats(geoms):
    """geoms: list of (geom_type, [rings as [(lon,lat)...]], roles)."""
    xs, ys, rl, rr, pt_off, ring_off = [], [], [], [], [0], [0]
    for gt, rings, roles in geoms:
        for ring, role in zip(rings, roles):
            xs.extend(p[0] for p in ring)
            ys.extend(p[1] for p in ring)
            rl.append(len(ring))
            rr.append(role)
        pt_off.append(len(xs))
        ring_off.append(len(rl))
    return geometry_stats(
        np.array([g[0] for g in geoms], dtype=object),
        np.array(xs), np.array(ys), np.array(pt_off),
        np.array(rl), np.array(ring_off), np.array(rr),
    )


def square(cx, cy, half):
    return [
        (cx - half, cy - half), (cx + half, cy - half),
        (cx + half, cy + half), (cx - half, cy + half),
        (cx - half, cy - half),
    ]


def test_golden_area():
    ring = [
        (-122.2565497, 37.8243324), (-122.2557092, 37.8249618),
        (-122.2551399, 37.8244875), (-122.25593, 37.8238958),
        (-122.2562084, 37.8241277), (-122.2562588, 37.82409),
        (-122.2565497, 37.8243324),
    ]
    area, length, clon, clat = _stats([("Polygon", [ring], [0])])
    assert area[0] == 11528.0  # ref:process_test.go:58
    assert -122.257 < clon[0] < -122.255
    assert 37.824 < clat[0] < 37.825


def test_polygon_with_hole():
    outer = square(0, 0, 0.01)
    hole = square(0, 0, 0.005)
    a_full, _, _, _ = _stats([("Polygon", [outer], [0])])
    a_holed, _, _, _ = _stats([("Polygon", [outer, hole], [0, 1])])
    assert abs(a_holed[0] - a_full[0] * 0.75) < 2.0


def test_multi_row_batch_independence():
    rows = [
        ("Point", [[(10.0, 50.0)]], [0]),
        ("Polygon", [square(5, 5, 0.01)], [0]),
        ("LineString", [[(0.0, 0.0), (0.01, 0.0)]], [0]),
        ("Point", [[(-70.0, -30.0)]], [0]),
    ]
    area, length, clon, clat = _stats(rows)
    assert area[0] == 0 and area[2] == 0 and area[3] == 0
    assert area[1] > 0
    assert length[2] > 0 and length[0] == 0
    assert clon[0] == 10.0 and clat[0] == 50.0
    assert abs(clon[1] - 5.0) < 1e-9
    assert clon[3] == -70.0 and clat[3] == -30.0


def test_line_length_mercator():
    # 0.01 deg of longitude at the equator ~ 1113.2m in mercator
    _, length, _, _ = _stats([("LineString", [[(0.0, 0.0), (0.01, 0.0)]], [0])])
    expected = mercator_x(0.01) - mercator_x(0.0)
    assert abs(length[0] - expected) < 1e-6


def test_mercator_roundtrip():
    lons = np.array([-180.0, -1.5, 0.0, 3.7, 179.9])
    lats = np.array([-80.0, -45.0, 0.0, 37.8, 80.0])
    assert np.allclose(unproject_lon(mercator_x(lons)), lons)
    assert np.allclose(unproject_lat(mercator_y(lats)), lats)
