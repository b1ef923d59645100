"""Integration tests ported from the reference's height/quantize suite
(ref:integration_tests/height_test.go)."""

import pytest

from osmzen_spark.geom.derive import geometry_from_rings, point_geometry
from osmzen_spark.pipeline.normalize import NormalizeEngine

from conftest import make_elements


@pytest.mark.parametrize(
    "tags,expected_height",
    [
        ({"height": "10", "building": "yes"}, 10.0),
        ({"building:levels": "7", "building": "yes"}, 23.0),
        ({"height": "4", "waterway": "waterfall", "name": "Great Falls"}, 4.0),
        ({"height": "4m", "waterway": "waterfall", "name": "Great Falls"}, 4.0),
        ({"height": "10ft", "waterway": "waterfall", "name": "Great Falls"}, 3.048),
    ],
)
def test_height_cases(spark, tags, expected_height):
    elements = make_elements(spark, [(1, "node", tags, "Point", point_geometry(0.0, 0.0))])
    engine = NormalizeEngine()
    layers = engine.process(elements, zoom=20)
    found = []
    for name, df in layers.items():
        for r in df.collect():
            if r["id"] == 1 and r.asDict().get("height") is not None:
                found.append((name, r["height"]))
    assert found, "feature not matched by any layer"
    for _, h in found:
        assert h == expected_height


# the quantize test triangle (ref:integration_tests/height_test.go:84-96)
TRIANGLE = [(0.0, 0.001), (-0.001, 0.001), (-0.001, 0.0), (0.0, 0.001)]
TRI_TAGS = {"building": "yes", "name": "parking garage", "height": "13"}


@pytest.mark.parametrize("zoom,expected", [(13, 20.0), (14, 10.0), (15, 10.0), (16, 13.0)])
def test_quantize_height_by_zoom(spark, zoom, expected):
    elements = make_elements(
        spark, [(22942652, "way", TRI_TAGS, "Polygon", geometry_from_rings([TRIANGLE], "Polygon"))]
    )
    engine = NormalizeEngine()
    layers = engine.process(elements, zoom=zoom, layer_names=["buildings", "pois"])
    rows = layers["buildings"].collect()
    # at z>=16 a named building also gets a label-placement Point
    # appended (ref label config queries.yaml:868-879); the reference
    # test only inspects Features[0] (the polygon)
    polys = [r for r in rows if r["geom_type"] != "Point"]
    assert len(polys) == 1
    assert polys[0]["height"] == expected
    if zoom >= 16:
        labels = [r for r in rows if r["geom_type"] == "Point"]
        assert len(labels) == 1 and labels[0]["label_placement"] is True
    else:
        assert len(rows) == 1
