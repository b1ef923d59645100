"""A/B parity: the Arrow-batch vectorized evaluator
(compiler/arrow_layer.py) must produce row-identical results to the
Catalyst Column path (compiler/layer.py) over a probe corpus that
exercises every condition/expression/function family."""

from osmzen_spark.geom.derive import geometry_from_rings, point_geometry
from osmzen_spark.pipeline.normalize import NormalizeEngine

from conftest import PARKING_GARAGE_RING, PARKING_GARAGE_TAGS, make_elements

SQ = geometry_from_rings([[(0.0, 0.0), (0.01, 0.0), (0.01, 0.01), (0.0, 0.01)]], "Polygon")
BIG = geometry_from_rings([[(0.0, 0.0), (0.3, 0.0), (0.3, 0.3), (0.0, 0.3)]], "Polygon")
LINE = geometry_from_rings([[(0.0, 0.0), (0.01, 0.0), (0.02, 0.001)]], "LineString")
PT = point_geometry(12.3, 45.6)

PROBES = [
    (1, "way", PARKING_GARAGE_TAGS, "Polygon", geometry_from_rings([PARKING_GARAGE_RING], "Polygon")),
    (2, "way", {"building": "yes", "building:levels": "7", "name": "Tower"}, "Polygon", SQ),
    (3, "node", {"amenity": "restaurant", "cuisine": "pizza", "name": "Pizza!"}, "Point", PT),
    (4, "node", {"waterway": "waterfall", "height": "41m", "name": "Falls"}, "Point", PT),
    (5, "way", {"leisure": "park", "name": "Big Park"}, "Polygon", BIG),
    (6, "way", {"highway": "motorway", "name": "M1", "ref": "M 1", "network": "GB:motorway"}, "LineString", LINE),
    (7, "way", {"highway": "residential", "name": "North Main Street", "oneway": "-1"}, "LineString", LINE),
    (8, "node", {"place": "city", "name": "Bigtown", "population": "2000000", "capital": "yes"}, "Point", PT),
    (9, "way", {"natural": "wood", "name": "Forest"}, "Polygon", BIG),
    (10, "node", {"tourism": "hotel", "name": "Inn (closed)"}, "Point", PT),
    (11, "way", {"aeroway": "aerodrome", "name": "Airport", "iata": "abc", "passenger_count": "2000000"}, "Polygon", BIG),
    (12, "node", {"natural": "peak", "ele": "1234", "name": "Peak"}, "Point", PT),
    (13, "way", {"amenity": "parking", "parking": "multi-storey", "building": "yes", "building:levels": "3"}, "Polygon", SQ),
    (14, "node", {"shop": "supermarket", "name": "Shop"}, "Point", PT),
    (15, "way", {"landuse": "military", "military": "danger_area"}, "Polygon", BIG),
    (16, "node", {"highway": "motorway_junction", "ref": "12", "exit_to": "A1"}, "Point", PT),
    (17, "way", {"waterway": "river", "name": "River"}, "LineString", LINE),
    (18, "node", {"place": "country", "name": "Land", "population": "8000000"}, "Point", PT),
    (19, "way", {"boundary": "administrative", "admin_level": "4"}, "Polygon", BIG),
    (20, "relation", {"route": "train", "service": "high_speed", "name": "X"}, "LineString", LINE),
]


def _rows(df):
    out = {}
    for r in df.collect():
        d = r.asDict()
        key = (d["id"], d.get("label_placement"), d.get("match_idx"))
        # normalize floats for comparison
        out[key] = {
            k: (round(v, 9) if isinstance(v, float) else v)
            for k, v in sorted(d.items())
            if k not in ("geometry",)
        }
    return out


def test_arrow_column_parity(spark):
    """Compare paths on every layer whose Column-path plan is still
    cheap enough to build (pois/landuse cost minutes of py4j per plan —
    the reason the Arrow path exists; their parity is covered by the
    fixture goldens + oracle checks instead)."""
    elements = make_elements(spark, PROBES)
    engine = NormalizeEngine()
    derived = engine.derive(elements)
    for name in ("water", "earth", "places", "roads", "buildings", "boundaries", "transit"):
        layer = engine.config.layers[name]
        a = _rows(layer.evaluate(derived, 20, use_arrow=True))
        c = _rows(layer.evaluate(derived, 20, use_arrow=False))
        assert set(a) == set(c), f"{name}: row keys differ: {set(a) ^ set(c)}"
        for k in a:
            assert a[k] == c[k], f"{name} row {k}:\n arrow={a[k]}\n column={c[k]}"
