"""Douglas-Peucker simplification (geom/simplify.py): invariants and
golden behavior."""

import numpy as np


def _mk(spark, rows):
    """rows: (id, geom_type, xs, ys, ring_lens, ring_roles)."""
    data = [
        {
            "id": r[0],
            "geom_type": r[1],
            "geometry": {"xs": r[2], "ys": r[3], "ring_lens": r[4], "ring_roles": r[5]},
        }
        for r in rows
    ]
    from tests.conftest import ELEMENTS_SCHEMA  # noqa: F401  (schema style)
    from pyspark.sql import types as T
    from osmzen_spark.geom.derive import GEOMETRY_TYPE

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("geom_type", T.StringType()),
            T.StructField("geometry", GEOMETRY_TYPE),
        ]
    )
    return spark.createDataFrame(data, schema)


def _point_seg_dist(px, py, x0, y0, x1, y1):
    dx, dy = x1 - x0, y1 - y0
    seg2 = dx * dx + dy * dy
    if seg2 == 0:
        return float(np.hypot(px - x0, py - y0))
    t = min(1.0, max(0.0, ((px - x0) * dx + (py - y0) * dy) / seg2))
    return float(np.hypot(px - (x0 + t * dx), py - (y0 + t * dy)))


def _dist_to_chain(px, py, xs, ys):
    return min(
        _point_seg_dist(px, py, xs[k], ys[k], xs[k + 1], ys[k + 1]) for k in range(len(xs) - 1)
    )


def test_collinear_line_collapses_to_endpoints(spark):
    from osmzen_spark.geom.simplify import simplify_layer

    xs = [float(i) for i in range(10)]
    ys = [2.0 * i + 1.0 for i in range(10)]
    df = _mk(spark, [(1, "LineString", xs, ys, [10], [0])])
    out = simplify_layer(df, 0.001).collect()
    assert len(out) == 1
    g = out[0].geometry
    assert list(g.xs) == [0.0, 9.0]
    assert list(g.ys) == [1.0, 19.0]


def test_deviation_bound_and_subset(spark):
    """Every original vertex must lie within eps of the simplified
    chain; output vertices are an ordered subset of the input."""
    from osmzen_spark.geom.simplify import simplify_layer

    rng = np.random.RandomState(3)
    eps = 0.5
    rows = []
    originals = {}
    for i in range(20):
        n = 30
        xs = np.cumsum(rng.uniform(0.1, 1.0, n))
        ys = np.cumsum(rng.uniform(-0.8, 0.8, n))
        rows.append((i, "LineString", xs.tolist(), ys.tolist(), [n], [0]))
        originals[i] = (xs, ys)
    out = simplify_layer(_mk(spark, rows), eps).collect()
    assert len(out) == 20
    for r in out:
        xs0, ys0 = originals[r.id]
        kxs, kys = np.array(r.geometry.xs), np.array(r.geometry.ys)
        assert len(kxs) <= len(xs0)
        # ordered subset
        pos = [np.nonzero((xs0 == x) & (ys0 == y))[0][0] for x, y in zip(kxs, kys)]
        assert pos == sorted(pos)
        assert pos[0] == 0 and pos[-1] == len(xs0) - 1
        for px, py in zip(xs0, ys0):
            assert _dist_to_chain(px, py, kxs, kys) <= eps + 1e-9


def test_ring_stays_closed_and_square_survives(spark):
    from osmzen_spark.geom.simplify import simplify_layer

    # square with redundant midpoints on each edge
    xs = [0.0, 1.0, 2.0, 2.0, 2.0, 1.0, 0.0, 0.0, 0.0]
    ys = [0.0, 0.0, 0.0, 1.0, 2.0, 2.0, 2.0, 1.0, 0.0]
    df = _mk(spark, [(1, "Polygon", xs, ys, [9], [0])])
    out = simplify_layer(df, 0.1).collect()
    g = out[0].geometry
    assert g.xs[0] == g.xs[-1] and g.ys[0] == g.ys[-1]
    assert len(g.xs) == 5  # 4 corners + closing dup
    assert set(zip(g.xs, g.ys)) == {(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)}


def test_degenerate_ring_drops_feature_and_holes(spark):
    from osmzen_spark.geom.simplify import simplify_layer

    # sliver outer ring thinner than eps -> collapses -> feature dropped
    xs = [0.0, 10.0, 10.0, 0.0, 0.0]
    ys = [0.0, 0.001, 0.002, 0.001, 0.0]
    df = _mk(spark, [(1, "Polygon", xs, ys, [5], [0])])
    assert simplify_layer(df, 0.5).count() == 0


def test_points_and_small_lines_pass_through(spark):
    from osmzen_spark.geom.simplify import simplify_layer

    rows = [
        (1, "Point", [3.0], [4.0], [1], [0]),
        (2, "LineString", [0.0, 5.0], [0.0, 5.0], [2], [0]),
    ]
    out = {r.id: r for r in simplify_layer(_mk(spark, rows), 1.0).collect()}
    assert list(out[1].geometry.xs) == [3.0]
    assert list(out[2].geometry.xs) == [0.0, 5.0]


def test_multilinestring_parts_independent(spark):
    from osmzen_spark.geom.simplify import simplify_layer

    # part 1 collinear (collapses to 2), part 2 a sharp V (keeps 3)
    xs = [0.0, 1.0, 2.0, 0.0, 1.0, 2.0]
    ys = [0.0, 0.0, 0.0, 0.0, 5.0, 0.0]
    df = _mk(spark, [(1, "MultiLineString", xs, ys, [3, 3], [0, 0])])
    g = simplify_layer(df, 0.5).collect()[0].geometry
    assert list(g.ring_lens) == [2, 3]
    assert list(g.xs) == [0.0, 2.0, 0.0, 1.0, 2.0]
