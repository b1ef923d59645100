"""Ported reference integration tests (ref:integration_tests/*.go):
label placement, bound filtering, dedup, parenthetical kinds, remap,
conditional names — run through the full NormalizeEngine pipeline."""

import pytest

from osmzen_spark.geom.derive import geometry_from_rings, point_geometry
from osmzen_spark.pipeline.normalize import NormalizeEngine

from conftest import make_elements


@pytest.fixture(scope="module")
def engine():
    return NormalizeEngine()


def tile_bound(z, x, y):
    import math

    n = 2**z
    lon0 = x / n * 360.0 - 180.0
    lon1 = (x + 1) / n * 360.0 - 180.0

    def lat_of(yy):
        return math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * yy / n))))

    return (lon0, lat_of(y + 1), lon1, lat_of(y))


# ---- labels_test.go:11-47 -------------------------------------------------
def test_label_only_if_in_tile(spark, engine):
    ring = [(1.0, 1.0), (-0.00001, 1.0), (-0.00001, -0.00001), (1.0, -0.00001), (1.0, 1.0)]
    elements = make_elements(
        spark,
        [(1, "way", {"name": "my park", "leisure": "park"}, "Polygon", geometry_from_rings([ring]))],
    )
    x = 1 << 14
    bound = tile_bound(15, x, x - 1)
    layers = engine.process(elements, zoom=15, bound=bound, layer_names=["landuse", "pois", "buildings"])
    landuse = layers["landuse"].collect()
    assert len(landuse) == 1, [r.asDict() for r in landuse]
    assert landuse[0]["geom_type"] == "Polygon"
    assert layers["pois"].count() == 0


# ---- labels_test.go:49-94 -------------------------------------------------
def test_label_housename(spark, engine):
    ring = [(0.0, 0.0001), (0.0001, 0.0001), (0.0001, 0.0), (0.0, 0.0001)]
    tags = {
        "name": "my park",
        "addr:housename": "my house",
        "building": "yes",
        "amenity": "school",
    }
    elements = make_elements(spark, [(1, "way", tags, "Polygon", geometry_from_rings([ring]))])
    x = 1 << 15
    bound = tile_bound(16, x, x - 1)
    layers = engine.process(elements, zoom=16, bound=bound, layer_names=["landuse", "pois", "buildings"])
    buildings = sorted(layers["buildings"].collect(), key=lambda r: bool(r["label_placement"]))
    assert len(buildings) == 2  # building + its label point
    assert buildings[0]["name"] == "my house"
    assert buildings[1]["name"] == "my house"
    assert buildings[1]["label_placement"] is True
    assert layers["pois"].count() == 1


# ---- pois_test.go:11-38 ---------------------------------------------------
def test_only_pois_in_tile(spark, engine):
    elements = make_elements(
        spark,
        [(2, "node", {"name": "my park", "leisure": "park"}, "Point", point_geometry(-0.00001, -0.00001))],
    )
    x = 1 << 14
    bound = tile_bound(15, x, x - 1)
    layers = engine.process(elements, zoom=15, bound=bound, layer_names=["pois"])
    assert layers["pois"].count() == 0


# ---- pois_test.go:40-76 ---------------------------------------------------
def test_dedup_pois_school_park(spark, engine):
    ring = [(0.0, 0.0), (0.0, 0.0001), (0.0001, 0.0001), (0.0001, 0.0), (0.0, 0.0)]
    elements = make_elements(
        spark,
        [(1, "way", {"name": "my park", "leisure": "park"}, "Polygon", geometry_from_rings([ring]))],
    )
    x = 1 << 14
    bound = tile_bound(15, x, x - 1)
    layers = engine.process(elements, zoom=16, bound=bound, layer_names=["landuse", "pois", "buildings"])
    landuse = layers["landuse"].collect()
    # conditional names removed the landuse name (also in pois), so no
    # label point is appended — just the polygon
    assert len(landuse) == 1
    assert landuse[0]["geom_type"] == "Polygon"
    assert layers["pois"].count() == 1


# ---- remap_test.go --------------------------------------------------------
@pytest.mark.parametrize(
    "tags,expected_kind",
    [
        ({"military": "airfield", "area": "yes"}, "aerodrome"),
        ({"leisure": "dog_park", "area": "yes"}, "dog_park"),
    ],
)
def test_remap(spark, engine, tags, expected_kind):
    ring = [(0.0, 0.1), (-0.001, 0.1), (-0.001, 0.0), (0.0, 0.1)]
    elements = make_elements(spark, [(1, "way", tags, "Polygon", geometry_from_rings([ring]))])
    layers = engine.process(elements, zoom=13, layer_names=["landuse", "pois", "buildings"])
    rows = layers["landuse"].collect()
    assert len(rows) >= 1
    assert rows[0]["kind"] == expected_kind


# ---- parenthetical_test.go ------------------------------------------------
@pytest.mark.parametrize("value", ["closed", "historical"])
def test_parenthetical(spark, engine, value):
    ring = [(0.0, 0.001), (-0.01, 0.001), (-0.01, 0.0), (0.0, 0.001)]
    tags = {"building": "yes", "name": f"abc ({value})"}
    elements = make_elements(spark, [(1, "way", tags, "Polygon", geometry_from_rings([ring]))])
    layers16 = engine.process(elements, zoom=16, layer_names=["buildings", "pois", "landuse"])
    rows = [r for r in layers16["buildings"].collect() if not r["label_placement"]]
    assert len(rows) == 1
    assert rows[0]["kind"] == value
    assert rows[0]["min_zoom"] == 17.0

    layers15 = engine.process(elements, zoom=15, layer_names=["buildings", "pois", "landuse"])
    assert layers15["buildings"].count() == 0


# ---- remove_duplicates_test.go:11-62 ---------------------------------------
def test_school_building_in_one_layer(spark, engine):
    ring = [(0.0, 0.0), (0.0, 0.0001), (0.0001, 0.0001), (0.0001, 0.0), (0.0, 0.0)]
    tags = {"name": "my park", "building": "yes", "amenity": "school"}
    elements = make_elements(spark, [(1, "way", tags, "Polygon", geometry_from_rings([ring]))])
    x = 1 << 14
    bound = tile_bound(15, x, x - 1)
    layers = engine.process(elements, zoom=16, bound=bound, layer_names=["landuse", "pois", "buildings"])
    buildings = layers["buildings"].collect()
    assert len(buildings) == 1
    assert buildings[0]["name"] is None
    assert layers["landuse"].count() == 0  # dropped: is a building
    assert layers["pois"].count() == 1


# ---- point dedup semantics (remove_duplicate_features) ----------------------
def test_remove_duplicate_points(spark, engine):
    # two identical-key restaurants 1m apart + one far away
    els = [
        (1, "node", {"amenity": "restaurant", "name": "Dup"}, "Point", point_geometry(0.0, 0.0)),
        (2, "node", {"amenity": "restaurant", "name": "Dup"}, "Point", point_geometry(0.000001, 0.0)),
        (3, "node", {"amenity": "restaurant", "name": "Dup"}, "Point", point_geometry(10.0, 10.0)),
    ]
    layers = engine.process(make_elements(spark, els), zoom=16, layer_names=["pois", "buildings", "landuse"])
    rows = sorted(r["id"] for r in layers["pois"].collect())
    assert rows == [1, 3]  # first-wins greedy keeps id 1, drops 2, keeps far 3
