"""Tiling core tests: Morton cells, tile math, PIP, kNN vs brute force."""

import numpy as np

from pyspark.sql import functions as F

from osmzen_spark.tiling.cells import cell_id, cell_to_zxy, morton, cell_col, tile_x_col, tile_y_col
from osmzen_spark.tiling.knn import knn_bruteforce, knn_join
from osmzen_spark.tiling.pip import point_in_polygon_join, ray_cast


def test_morton_roundtrip():
    for z, x, y in [(0, 0, 0), (5, 17, 9), (16, 17896, 24450), (29, 2**29 - 1, 12345)]:
        c = cell_id(z, x, y)
        assert cell_to_zxy(c) == (z, x, y)


def test_morton_locality():
    # adjacent cells share high bits more often than distant ones
    assert morton(3, 5) != morton(5, 3)


def test_cell_col_matches_python(spark):
    df = spark.createDataFrame(
        [(i, -180.0 + i * 37.3, -80.0 + i * 17.1) for i in range(9)], "id long, lon double, lat double"
    )
    rows = df.select(
        "lon", "lat",
        cell_col(F.col("lon"), F.col("lat"), 12).alias("cell"),
        tile_x_col(F.col("lon"), 12).alias("x"),
        tile_y_col(F.col("lat"), 12).alias("y"),
    ).collect()
    for r in rows:
        assert r["cell"] == cell_id(12, r["x"], r["y"])
        z, x, y = cell_to_zxy(r["cell"])
        assert (z, x, y) == (12, r["x"], r["y"])


def test_reference_tile_assignment(spark):
    # the reference benchmark tile: z16 x=17896 y=24450
    # (ref:testdata/tile-16-17896-24450.xml); its bound center must map back
    import math

    n = 2**16
    lon = (17896 + 0.5) / n * 360.0 - 180.0
    lat = math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * (24450 + 0.5) / n))))
    df = spark.createDataFrame([(lon, lat)], "lon double, lat double")
    row = df.select(
        tile_x_col(F.col("lon"), 16).alias("x"), tile_y_col(F.col("lat"), 16).alias("y")
    ).collect()[0]
    assert (row["x"], row["y"]) == (17896, 24450)


def test_ray_cast_unit():
    # unit square with a hole in the middle
    xs = np.array([0, 4, 4, 0, 0, 1, 3, 3, 1, 1], dtype=float)
    ys = np.array([0, 0, 4, 4, 0, 1, 1, 3, 3, 1], dtype=float)
    # three pairs against the same polygon buffers
    px = np.array([0.5, 2.0, 5.0])
    py = np.array([0.5, 2.0, 5.0])
    xs3 = np.tile(xs, 3)
    ys3 = np.tile(ys, 3)
    pt_off = np.array([0, 10, 20, 30])
    rl = np.array([5, 5] * 3)
    ring_off = np.array([0, 2, 4, 6])
    inside = ray_cast(px, py, xs3, ys3, pt_off, rl, ring_off)
    assert inside.tolist() == [True, False, False]  # in ring, in hole, outside


def test_pip_join(spark):
    pts = spark.createDataFrame(
        [(1, 0.5, 0.5), (2, 10.0, 10.0), (3, -0.5, 0.5)], "id long, lon double, lat double"
    )
    polys = spark.createDataFrame(
        [
            (
                100,
                {
                    "xs": [0.0, 1.0, 1.0, 0.0, 0.0],
                    "ys": [0.0, 0.0, 1.0, 1.0, 0.0],
                    "ring_lens": [5],
                    "ring_roles": [0],
                },
            )
        ],
        "poly_id long, geometry struct<xs:array<double>,ys:array<double>,ring_lens:array<int>,ring_roles:array<int>>",
    )
    res = point_in_polygon_join(pts, polys, z=8).select("id", "poly_id").collect()
    assert [(r["id"], r["poly_id"]) for r in res] == [(1, 100)]


def test_knn_matches_bruteforce(spark):
    import random

    rnd = random.Random(7)
    pts = spark.createDataFrame(
        [(i, rnd.uniform(-20, 20), rnd.uniform(-20, 20)) for i in range(300)],
        "id long, lon double, lat double",
    )
    queries = spark.createDataFrame(
        [(i, rnd.uniform(-15, 15), rnd.uniform(-15, 15)) for i in range(5)],
        "id long, lon double, lat double",
    )
    exact = {
        (r["q_id"], r["knn_rank"]): r["p_id"]
        for r in knn_bruteforce(queries, pts, k=3).collect()
    }
    approx = {
        (r["q_id"], r["knn_rank"]): r["p_id"]
        for r in knn_join(queries, pts, k=3, z=5, ring=2).collect()
    }
    assert exact == approx


def test_salted_join_equals_plain_join(spark):
    """salted_join changes only the physical plan: result rows must be
    identical to the unsalted join, the small side must replicate via
    one explode, and the join keys must include the salt (so the hot
    key spreads over n_salt shuffle partitions)."""
    from pyspark.sql import functions as F

    from osmzen_spark.tiling.skew import salted_join

    # 90% of rows share one hot key
    big = spark.range(1, 1001).select(
        F.col("id"),
        F.when(F.pmod("id", F.lit(10)) > 0, F.lit(7)).otherwise(F.pmod("id", F.lit(5))).alias("k"),
    )
    small = spark.range(0, 10).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id").cast("string")).alias("attr")
    )
    salted = salted_join(big, small, on=["k"], entropy="id", n_salt=8)
    plain = big.join(small, on="k")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan and ("Generate explode" in plan or "explode" in plan)
    # the join must be a SHUFFLE join with the salt in its keys — a
    # broadcast join has no shuffle to skew, so salting it would prove
    # nothing (the small side is shuffle_hash-hinted for exactly this)
    assert "BroadcastHashJoin" not in plan
    join_line = next(ln for ln in plan.splitlines() if "HashJoin" in ln or "SortMergeJoin" in ln)
    assert "__salt" in join_line


def test_tile_partitioned_sink_prunes_scan(spark, tmp_path):
    """The deployment sink is a tile-partitioned table (Iceberg on a
    cluster; partitioned parquet here): a tile-filtered read must show
    PartitionFilters in the scan — partitions outside the filter are
    never opened — and a narrow projection must prune ReadSchema to
    the requested columns with the residual filter pushed down."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "tiles")
    pts = spark.range(1, 2001).select(
        "id",
        F.pmod("id", F.lit(8)).alias("tile_x"),
        F.pmod(F.col("id") * 7, F.lit(8)).alias("tile_y"),
        (F.col("id") * 2.5).alias("score"),
    )
    pts.write.partitionBy("tile_x").parquet(path)

    rd = spark.read.parquet(path).filter(F.col("tile_x") == 3).filter(F.col("tile_y") >= 4)
    narrow = rd.select("id", "tile_y")
    plan = narrow._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "tile_x" in plan.split("PartitionFilters", 1)[1][:200]
    assert "PushedFilters" in plan and "GreaterThanOrEqual(tile_y,4" in plan
    read_schema = plan.split("ReadSchema", 1)[1][:200]
    assert "score" not in read_schema  # column pruning reached the scan
    got = narrow.count()
    assert got == sum(1 for i in range(1, 2001) if i % 8 == 3 and (7 * i) % 8 >= 4)
