"""Snap-to-nearest-segment join (the map-matching primitive).

``snap_to_segments``: for every point, the nearest line segment within
``max_dist`` (planar, in coordinate units), or no row if none
qualifies — the bounded-radius nearest-road snap used by trajectory
/ map-matching pipelines.

Scale shape: segments explode to the zoom-``z`` tiles their bbox
covers (a handful when z matches the typical segment length); points
explode to their (2r+1)^2 neighbor cells; candidates come from an
int64 (cx, cy) equi-join and the exact point-to-segment distance +
window argmin run on candidates only. Completeness: if a segment
passes within ``max_dist`` of a point, its closest location lies in a
cell within Chebyshev distance ``ring`` of the point's cell whenever
``max_dist < ring * cell_extent`` — and that cell is covered by the
segment's bbox explosion, so no qualifying segment is missed.

A segment covering several of the point's neighbor cells meets the
point more than once; the duplicates carry identical (d2, seg_id), so
the argmin window is deterministic without a distinct pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from osmzen_spark.tiling.cells import neighbor_offsets, tile_x_col, tile_y_col


def point_segment_d2(px, py, x0, y0, x1, y1):
    """Squared planar distance from point to segment, Column math
    (clamped projection — the geom/simplify.py kernel as Columns)."""
    dx, dy = x1 - x0, y1 - y0
    seg2 = dx * dx + dy * dy
    t = F.when(seg2 == 0.0, F.lit(0.0)).otherwise(
        F.least(F.lit(1.0), F.greatest(F.lit(0.0), ((px - x0) * dx + (py - y0) * dy) / seg2))
    )
    cx, cy = x0 + t * dx, y0 + t * dy
    return (px - cx) * (px - cx) + (py - cy) * (py - cy)


def snap_to_segments(
    points: DataFrame,
    segments: DataFrame,
    max_dist: float,
    z: int,
    ring: int = 1,
    p_id: str = "id",
    s_id: str = "seg_id",
) -> DataFrame:
    """points: (id, lon, lat); segments: (seg_id, x0, y0, x1, y1).
    Output: point id + nearest seg_id + d2, one row per snapped point
    (ties break on seg_id)."""
    n = 2**z
    seg = segments.select([F.col(c).alias(f"s_{c}") for c in segments.columns])
    sx_lo = tile_x_col(F.least("s_x0", "s_x1"), z)
    sx_hi = tile_x_col(F.greatest("s_x0", "s_x1"), z)
    sy_lo = tile_y_col(F.greatest("s_y0", "s_y1"), z)
    sy_hi = tile_y_col(F.least("s_y0", "s_y1"), z)
    seg = seg.withColumn("cx", F.explode(F.sequence(sx_lo, sx_hi))).withColumn(
        "cy", F.explode(F.sequence(sy_lo, sy_hi))
    )
    pt = points.select([F.col(c).alias(f"p_{c}") for c in points.columns])
    pt = (
        pt.withColumn("_px", tile_x_col(F.col("p_lon"), z))
        .withColumn("_py", tile_y_col(F.col("p_lat"), z))
        .withColumn(
            "_off",
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                        for dx, dy in neighbor_offsets(ring)
                    ]
                )
            ),
        )
    )
    qx = F.pmod(F.col("_px") + F.col("_off.dx"), F.lit(n))
    qy = F.col("_py") + F.col("_off.dy")
    pt = (
        pt.filter((qy >= 0) & (qy < n))
        .withColumn("cx", qx.cast("long"))
        .withColumn("cy", qy.cast("long"))
        .drop("_px", "_py", "_off")
    )
    j = pt.join(seg, on=["cx", "cy"], how="inner").drop("cx", "cy")
    d2 = point_segment_d2(
        F.col("p_lon"), F.col("p_lat"), F.col("s_x0"), F.col("s_y0"), F.col("s_x1"), F.col("s_y1")
    )
    j = j.withColumn("d2", d2).filter(F.col("d2") <= F.lit(float(max_dist) ** 2))
    w = Window.partitionBy(f"p_{p_id}").orderBy(F.col("d2").asc(), F.col(f"s_{s_id}").asc())
    return j.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
