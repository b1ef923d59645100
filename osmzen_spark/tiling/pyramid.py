"""Tile-pyramid rollup: multi-zoom aggregation by hierarchical shifts.

``tile_pyramid_rollup`` aggregates points once at the finest zoom, then
derives every coarser level from the PREVIOUS level's aggregate with an
integer shift (parent tile x = x >> step, y = y >> step) — the
hypertable/tile-server rollup shape. At scale this matters: the naive
plan (one groupBy over the raw points per zoom level) is L full
shuffles of the fact table, while this one shuffles the raw points
exactly once; each coarser level re-aggregates the previous aggregate,
whose size shrinks by ~4^step per level, so all upper levels together
cost less than a second pass over the base. All math is Column-side
(whole-stage codegen) — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osmzen_spark.tiling.cells import tile_x_col, tile_y_col


def tile_pyramid_rollup(
    points: DataFrame,
    zmax: int,
    zmin: int,
    step: int = 1,
    lon: str = "lon",
    lat: str = "lat",
    value: Column | None = None,
) -> DataFrame:
    """Counts (and optionally a summed value) per tile at every zoom in
    ``range(zmax, zmin-1, -step)``, as one unioned DataFrame
    (z, tile_x, tile_y, n_points[, sum_value])."""
    if zmin > zmax:
        raise ValueError(f"zmin {zmin} > zmax {zmax}")
    sel = [
        tile_x_col(F.col(lon), zmax).alias("tile_x"),
        tile_y_col(F.col(lat), zmax).alias("tile_y"),
    ]
    aggs = [F.count("*").alias("n_points")]
    if value is not None:
        sel.append(value.alias("_v"))
        aggs.append(F.sum("_v").cast("long").alias("sum_value"))
    base = points.select(*sel).groupBy("tile_x", "tile_y").agg(*aggs)

    rollup_aggs = [F.sum("n_points").alias("n_points")]
    if value is not None:
        rollup_aggs.append(F.sum("sum_value").cast("long").alias("sum_value"))

    levels = []
    cur = base
    z = zmax
    levels.append(cur.select(F.lit(z).alias("z"), "*"))
    while z - step >= zmin:
        z -= step
        cur = (
            cur.select(
                F.shiftright("tile_x", step).alias("tile_x"),
                F.shiftright("tile_y", step).alias("tile_y"),
                *[c for c in (["n_points"] + (["sum_value"] if value is not None else []))],
            )
            .groupBy("tile_x", "tile_y")
            .agg(*rollup_aggs)
        )
        levels.append(cur.select(F.lit(z).alias("z"), "*"))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out
