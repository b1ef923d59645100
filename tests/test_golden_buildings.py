"""End-to-end golden test: the reference's canonical fixture
(ref:process_test.go:13-69) — a parking-garage way must produce EXACTLY

    {min_zoom: 13, sort_rank: 475, scale_rank: 2, height: 23,
     area: 11528, volume: 265144, kind: building,
     kind_detail: parking_garage, id: 22942652, type: way}

in the buildings layer (name dropped by SetConditionalNames because the
same way matched pois; kind_detail backfilled from pois.kind).
"""

import math

from osmzen_spark.geom.derive import geometry_from_rings
from osmzen_spark.pipeline.normalize import NormalizeEngine

from conftest import PARKING_GARAGE_RING, PARKING_GARAGE_TAGS, make_elements


def test_parking_garage_golden(spark):
    elements = make_elements(
        spark,
        [
            (
                22942652,
                "way",
                PARKING_GARAGE_TAGS,
                "Polygon",
                geometry_from_rings([PARKING_GARAGE_RING], "Polygon"),
            )
        ],
    )
    engine = NormalizeEngine()
    layers = engine.process(elements, zoom=20)

    rows = layers["buildings"].collect()
    assert len(rows) == 1
    row = rows[0].asDict()

    expected = {
        "min_zoom": 13.0,
        "sort_rank": 475.0,
        "scale_rank": 2.0,
        "height": 23.0,
        "area": 11528.0,
        "volume": 265144.0,
        "kind": "building",
        "kind_detail": "parking_garage",
        "id": 22942652,
        "type": "way",
    }
    for k, v in expected.items():
        assert row[k] == v, f"{k}: {row[k]!r} != {v!r}"

    # name dropped: building matched pois too, no addr:housename
    assert row.get("name") is None

    # all other emitted properties must be absent (NULL)
    for k in ("building_part", "building_levels", "building_min_levels",
              "min_height", "layer", "location", "roof_color"):
        assert row.get(k) is None, f"{k} should be NULL, got {row.get(k)!r}"

    # pois side: parking garage POI with min_zoom 15 (capacity estimate
    # 11528/46*2 = 501.2 -> lookup >=350 -> 15)
    prows = layers["pois"].collect()
    assert len(prows) == 1
    p = prows[0].asDict()
    assert p["kind"] == "parking_garage"
    assert p["min_zoom"] == 15.0

    # tile assignment of the centroid at z16 (slippy math)
    lon, lat = -122.25581, 37.82442
    n = 2**16
    ex_x = int((lon + 180) / 360 * n)
    lat_r = math.radians(lat)
    ex_y = int((1 - math.log(math.tan(lat_r) + 1 / math.cos(lat_r)) / math.pi) / 2 * n)
    assert row["tile_z"] == 16
    assert row["tile_x"] == ex_x
    assert row["tile_y"] == ex_y
