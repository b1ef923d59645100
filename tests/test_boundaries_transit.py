"""Boundaries + transit layer rules (ref:config/yaml/boundaries.yaml
osm rules, ref:config/yaml/transit.yaml)."""

from osmzen_spark.geom.derive import geometry_from_rings
from osmzen_spark.pipeline.normalize import NormalizeEngine

from conftest import make_elements

SQ = geometry_from_rings(
    [[(0.0, 0.0), (0.01, 0.0), (0.01, 0.01), (0.0, 0.01)]], "Polygon"
)
LINE = geometry_from_rings([[(0.0, 0.0), (0.01, 0.0)]], "LineString")


def run_layer(spark, layer, rows):
    elements = make_elements(spark, rows)
    engine = NormalizeEngine()
    layers = engine.process(elements, zoom=20, layer_names=[layer])
    return {r["id"]: r.asDict() for r in layers[layer].collect()}


def test_admin_boundaries(spark):
    rows = run_layer(
        spark,
        "boundaries",
        [
            (1, "relation", {"boundary": "administrative", "admin_level": "2", "name": "X"}, "Polygon", SQ),
            (2, "relation", {"boundary": "administrative", "admin_level": "4"}, "Polygon", SQ),
            (3, "relation", {"boundary": "administrative", "admin_level": "6"}, "Polygon", SQ),
            (4, "relation", {"boundary": "administrative", "admin_level": "8"}, "Polygon", SQ),
            # plain boundary WAY without the from-polygon flag: excluded
            (5, "way", {"boundary": "administrative", "admin_level": "2"}, "LineString", LINE),
            # flagged line: included (boundary_poly hack)
            (6, "way", {"boundary": "administrative", "admin_level": "2", "mz_boundary_from_polygon": "true"}, "LineString", LINE),
            # aboriginal lands via protected_area class 24
            (7, "relation", {"boundary": "protected_area", "protect_class": "24", "admin_level": "4"}, "Polygon", SQ),
            # claim
            (8, "way", {"boundary": "claim", "admin_level": "2", "claimed_by": "XX"}, "LineString", LINE),
        ],
    )
    # relations get negated ids (ref:process.go:209-214)
    assert rows[-1]["kind"] == "country" and rows[-1]["kind_detail"] == "2"
    assert rows[-1]["min_zoom"] == 8.0
    assert rows[-2]["kind"] == "region"
    assert rows[-3]["kind"] == "county" and rows[-3]["min_zoom"] == 10.0
    assert rows[-4]["kind"] == "locality" and rows[-4]["min_zoom"] == 11.0
    assert 5 not in rows
    assert rows[6]["kind"] == "country"
    assert rows[-7]["kind"] == "aboriginal_lands" and rows[-7]["kind_detail"] == "4"
    assert rows[8]["kind"] == "unrecognized_country" and rows[8]["claimed_by"] == "XX"
    # admin_level_as_int is a faithful NO-OP here: no rule emits an
    # admin_level property (the reference's tags_create_dict is a nil
    # no-op in the Go port, so the transform never sees the tag either)
    assert "admin_level" not in rows[-1]


def test_dispute_mask(spark):
    rows = run_layer(
        spark,
        "boundaries",
        [
            (1, "way", {"dispute": "yes", "disputed_by": "AA;BB"}, "LineString", LINE),
            (2, "way", {"disputed": "yes"}, "LineString", LINE),  # no disputed_by -> no match
        ],
    )
    assert rows[1]["kind"] == "mz_internal_dispute_mask"
    assert rows[1]["disputed_by"] == "AA;BB"
    assert 2 not in rows


def test_transit_routes_and_stops(spark):
    rows = run_layer(
        spark,
        "transit",
        [
            (1, "relation", {"route": "train", "service": "high_speed", "name": "TGV"}, "LineString", LINE),
            (2, "relation", {"route": "train", "name": "Slow"}, "LineString", LINE),
            (3, "relation", {"route": "subway", "colour": "#ff0000"}, "LineString", LINE),
            (4, "relation", {"route": "tram"}, "LineString", LINE),
            (5, "relation", {"route": "monorail"}, "LineString", LINE),
            (6, "way", {"railway": "platform"}, "Polygon", SQ),
            (7, "way", {"public_transport": "platform", "bus": "yes"}, "Polygon", SQ),
            (8, "way", {"highway": "platform"}, "Polygon", SQ),
        ],
    )
    assert rows[-1]["kind"] == "train" and rows[-1]["min_zoom"] == 5.0
    assert rows[-2]["kind"] == "train" and rows[-2]["min_zoom"] == 6.0
    assert rows[-3]["kind"] == "subway" and rows[-3]["colour"] == "#ff0000"
    assert rows[-4]["kind"] == "tram" and rows[-4]["min_zoom"] == 9.0
    assert rows[-5]["kind"] == "monorail" and rows[-5]["min_zoom"] == 12.0
    assert rows[6]["kind"] == "platform" and rows[6]["min_zoom"] == 15.0
    assert rows[7]["kind"] == "bus_stop" and rows[7]["min_zoom"] == 17.0
    assert rows[8]["kind"] == "bus_stop"
    # detect_osm_relation transform
    assert rows[-1]["osm_relation"] is True


def test_transit_route_name_promotion(spark):
    # route_name == name -> route_name dropped (ref:transforms.go:176-189)
    rows = run_layer(
        spark,
        "transit",
        [
            (1, "relation", {"route": "train", "name": "A", "route_name": "A"}, "LineString", LINE),
            (2, "relation", {"route": "train", "route_name": "B"}, "LineString", LINE),
        ],
    )
    assert rows[-1]["route_name"] is None and rows[-1]["name"] == "A"
    # name missing -> promoted from route_name
    assert rows[-2]["name"] == "B" and rows[-2]["route_name"] is None


def test_tags_name_i18n(spark):
    # alt-name tags copied when named and different (ref:transforms.go:745-752)
    rows = run_layer(
        spark,
        "transit",
        [
            (1, "relation", {"route": "train", "name": "A", "short_name": "A", "old_name": "B"}, "LineString", LINE),
            (2, "relation", {"route": "train", "short_name": "X"}, "LineString", LINE),  # unnamed: no copy
        ],
    )
    assert rows[-1]["old_name"] == "B"
    assert rows[-1]["short_name"] is None  # equal to name -> not copied
    assert rows[-2].get("short_name") is None
