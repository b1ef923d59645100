"""ClipAndWrapGeometry (geom/clip.py; semantics per
ref:postprocess/functions.go:886-953): bbox fast paths, polygon
Sutherland-Hodgman, line Liang-Barsky, open-ring exact-bound rule,
winding fix, vanished-feature drop."""

import pytest
from pyspark.sql import functions as F

from osmzen_spark.geom.clip import clip_layer, pad_bound
from osmzen_spark.geom.derive import geometry_from_rings

from conftest import make_elements

BOUND = (0.0, 0.0, 10.0, 10.0)  # padded(2.0) = (-5, -5, 15, 15)


def geom(df_rows):
    return df_rows


def run(spark, rows, bound=BOUND):
    df = make_elements(spark, rows)
    out = clip_layer(df, bound)
    return {r["element_id"]: r.asDict() for r in out.collect()}


def ring_of(row):
    g = row["geometry"]
    return list(zip(g["xs"], g["ys"]))


def test_pad_bound():
    assert pad_bound(BOUND, 2.0) == (-5.0, -5.0, 15.0, 15.0)
    assert pad_bound(BOUND, 1.0) == BOUND


def test_points_inside_outside(spark):
    pt_in = geometry_from_rings([[(5.0, 5.0)]], "Point")
    pt_pad = geometry_from_rings([[(12.0, 12.0)]], "Point")  # in padded
    pt_out = geometry_from_rings([[(30.0, 30.0)]], "Point")
    rows = run(
        spark,
        [
            (1, "node", {}, "Point", pt_in),
            (2, "node", {}, "Point", pt_pad),
            (3, "node", {}, "Point", pt_out),
        ],
    )
    assert set(rows) == {1, 2}  # points clip to the PADDED bound


def test_polygon_clip_and_winding(spark):
    # closed square crossing the right edge of the padded bound:
    # (10..20) x (2..8) -> clipped at x=15
    sq = geometry_from_rings([[(10.0, 2.0), (20.0, 2.0), (20.0, 8.0), (10.0, 8.0)]], "Polygon")
    # fully inside: untouched
    sq_in = geometry_from_rings([[(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0)]], "Polygon")
    # fully outside padded bound: dropped
    sq_out = geometry_from_rings([[(40.0, 40.0), (41.0, 40.0), (41.0, 41.0), (40.0, 41.0)]], "Polygon")
    rows = run(
        spark,
        [
            (1, "way", {}, "Polygon", sq),
            (2, "way", {}, "Polygon", sq_in),
            (3, "way", {}, "Polygon", sq_out),
        ],
    )
    assert set(rows) == {1, 2}
    pts = ring_of(rows[1])
    assert all(x <= 15.0 + 1e-9 for x, _ in pts)
    assert max(x for x, _ in pts) == pytest.approx(15.0)
    # winding: outer ring CCW (positive shoelace)
    xs = [p[0] for p in pts[:-1]]
    ys = [p[1] for p in pts[:-1]]
    area2 = sum(xs[i] * ys[(i + 1) % len(xs)] - xs[(i + 1) % len(xs)] * ys[i] for i in range(len(xs)))
    assert area2 > 0
    # untouched polygon keeps its original coordinates
    assert ring_of(rows[2])[0] == (1.0, 1.0)


def test_open_ring_clips_to_exact_bound(spark):
    # open outer ring (not closed) crossing the EXACT bound right edge
    open_poly = {
        "xs": [5.0, 20.0, 20.0, 5.0],
        "ys": [2.0, 2.0, 8.0, 8.0],
        "ring_lens": [4],
        "ring_roles": [0],
    }
    rows = run(spark, [(1, "relation", {}, "Polygon", open_poly)])
    pts = ring_of(rows[1])
    # exact bound (x<=10), not padded (x<=15)
    assert max(x for x, _ in pts) == pytest.approx(10.0)
    assert pts[0] == pts[-1]  # closed on output


def test_line_clip_produces_parts(spark):
    # line crossing the padded bound twice: enters, exits, re-enters
    line = {
        "xs": [-10.0, 5.0, 25.0, 5.0],
        "ys": [6.0, 6.0, 6.0, 2.0],
        "ring_lens": [4],
        "ring_roles": [0],
    }
    rows = run(spark, [(1, "way", {}, "LineString", line)])
    g = rows[1]["geometry"]
    # 3 sub-parts: (-5..5..15], [15..back..], clipped at x=15/x=-5
    assert len(g["ring_lens"]) >= 2
    assert all(-5.0 - 1e-9 <= x <= 15.0 + 1e-9 for x in g["xs"])


def test_hole_dropped_with_outer(spark):
    # polygon with hole entirely outside the bound -> feature dropped
    poly = geometry_from_rings(
        [
            [(40.0, 40.0), (50.0, 40.0), (50.0, 50.0), (40.0, 50.0)],
            [(42.0, 42.0), (43.0, 42.0), (43.0, 43.0), (42.0, 43.0)],
        ],
        "Polygon",
    )
    rows = run(spark, [(1, "way", {}, "Polygon", poly)])
    assert rows == {}


def test_engine_bound_run_drops_tags_and_clips(spark):
    from osmzen_spark.pipeline.normalize import NormalizeEngine

    sq = geometry_from_rings(
        [[(0.001, 0.001), (0.002, 0.001), (0.002, 0.002), (0.001, 0.002)]], "Polygon"
    )
    far = geometry_from_rings(
        [[(50.0, 50.0), (50.01, 50.0), (50.01, 50.01), (50.0, 50.01)]], "Polygon"
    )
    elements = make_elements(
        spark,
        [
            (1, "way", {"building": "yes", "name": "in"}, "Polygon", sq),
            (2, "way", {"building": "yes", "name": "out"}, "Polygon", far),
        ],
    )
    engine = NormalizeEngine()
    layers = engine.process(
        elements, zoom=20, layer_names=["buildings"], bound=(0.0, 0.0, 0.01, 0.01)
    )
    rows = layers["buildings"].collect()
    ids = {r["id"] for r in rows}
    assert ids == {1}
    assert "tags" not in layers["buildings"].columns
