"""Roads layer tests: classification, oneway reversal, name
abbreviation, vehicle restrictions (semantics per ref:config/yaml/
roads.yaml + transform/transforms.go)."""

from osmzen_spark.geom.derive import geometry_from_rings
from osmzen_spark.pipeline.normalize import NormalizeEngine

from conftest import make_elements

LINE = [[(0.0, 0.0), (0.01, 0.0), (0.02, 0.001)]]


def line_geom():
    return geometry_from_rings(LINE, "LineString")


def run_roads(spark, tags_list):
    elements = make_elements(
        spark,
        [(i + 1, "way", t, "LineString", line_geom()) for i, t in enumerate(tags_list)],
    )
    engine = NormalizeEngine()
    layers = engine.process(elements, zoom=20, layer_names=["roads"])
    return {r["id"]: r.asDict() for r in layers["roads"].collect()}


def test_highway_classification(spark):
    rows = run_roads(
        spark,
        [
            {"highway": "motorway", "name": "The Big Road"},
            {"highway": "residential", "name": "North Main Street"},
            {"highway": "footway", "name": "A Path"},
            {"highway": "service", "service": "driveway"},
            {"railway": "rail"},
            {"aeroway": "runway"},
            {"aerialway": "cableway"},
        ],
    )
    assert rows[1]["kind"] == "highway" and rows[1]["kind_detail"] == "motorway"
    assert rows[1]["min_zoom"] == 5.0
    assert rows[2]["kind"] == "minor_road" and rows[2]["kind_detail"] == "residential"
    assert rows[3]["kind"] == "path" and rows[3]["kind_detail"] == "footway"
    assert rows[4]["kind_detail"] == "service" and rows[4]["service"] == "driveway"
    assert rows[5]["kind"] == "rail" and rows[5]["min_zoom"] == 11.0
    assert rows[6]["kind"] == "aeroway" and rows[6]["min_zoom"] == 9.0
    # normalize_aerialways: cableway -> zip_line kind_detail via case,
    # and the aerialway property normalized (ref:transforms.go:412-427)
    assert rows[7]["kind"] == "aerialway"
    assert rows[7]["kind_detail"] == "cableway"  # kind_detail from {col: aerialway} pre-transform


def test_street_name_abbreviation(spark):
    # ref:util/streetnames/shorten_test.go style cases
    rows = run_roads(
        spark,
        [
            {"highway": "residential", "name": "North Expressway Northeast"},
            {"highway": "residential", "name": "North Herp Derp Road"},
            {"highway": "residential", "name": "Herp Derp Road North"},
            {"highway": "residential", "name": "Herp Derp Road"},
            {"highway": "residential", "name": "Mononym"},
        ],
    )
    # case2 wins: 2nd-to-last is a type, last a direction
    # (ref:util/streetnames/shorten.go doc example)
    assert rows[1]["name"] == "North Expwy. NE"
    assert rows[2]["name"] == "N Herp Derp Rd."
    assert rows[3]["name"] == "Herp Derp Rd. N"
    assert rows[4]["name"] == "Herp Derp Rd."
    assert rows[5]["name"] == "Mononym"


def test_road_oneway_reverses_geometry(spark):
    rows = run_roads(
        spark,
        [
            {"highway": "residential", "oneway": "-1"},
            {"highway": "residential", "oneway": "true"},
            {"highway": "residential", "oneway": "false"},
        ],
    )
    assert rows[1]["oneway"] == "yes"
    g = rows[1]["geometry"]
    assert list(g["xs"]) == [0.02, 0.01, 0.0]  # reversed
    assert rows[2]["oneway"] == "yes"
    g2 = rows[2]["geometry"]
    assert list(g2["xs"]) == [0.0, 0.01, 0.02]  # untouched
    assert rows[3]["oneway"] == "no"


def test_is_link_and_bridge_flags(spark):
    rows = run_roads(
        spark,
        [
            {"highway": "motorway_link", "bridge": "yes"},
            {"highway": "primary", "tunnel": "true"},
        ],
    )
    assert rows[1]["is_link"] is True and rows[1]["is_bridge"] is True
    assert rows[2]["is_tunnel"] is True
    # road_trim_properties drops bridge/tunnel
    assert "bridge" not in rows[1] or rows[1]["bridge"] is None
    # roads sort_rank decision table at z20: row
    # '>=15,-,major_road,primary,*,-,true' -> 330; the bridged
    # motorway_link hits '>=15,-,highway,motorway_link;...' -> 424
    assert rows[2]["sort_rank"] == 330.0
    assert rows[1]["sort_rank"] == 424.0


def test_vehicle_restrictions(spark):
    rows = run_roads(
        spark,
        [
            {"highway": "primary", "maxheight": "3.5"},
            {"highway": "primary", "maxweight": "7.5"},
            {"highway": "primary", "maxheight": "3.5", "maxweight": "7.5"},
            {"highway": "primary", "hazmat": "no"},
        ],
    )
    assert rows[1]["hgv_restriction"] == "height"
    assert rows[1]["hgv_restriction_shield_text"] == "3.5m"
    assert rows[2]["hgv_restriction"] == "weight"
    assert rows[2]["hgv_restriction_shield_text"] == "7.5t"
    assert rows[3]["hgv_restriction"] == "multiple"
    assert rows[3]["hgv_restriction_shield_text"] is None
    assert rows[4]["hgv_restriction"] == "hazmat"
