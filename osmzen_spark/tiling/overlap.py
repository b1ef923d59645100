"""Rectangle-overlap spatial join with duplicate-free cell partitioning.

``rect_overlap_join``: all pairs of axis-aligned lon/lat rectangles
(a, b) whose interiors intersect, plus the exact overlap box. Scale
shape: each rectangle explodes to the zoom-``z`` tiles its bbox covers
(a few cells when z is matched to the typical rect size), candidates
come from an int64 (cx, cy) equi-join, and the exact interval test
runs per candidate.

The classic problem with cover-cell spatial joins is duplicate pairs —
two rects overlapping across 4 shared cells meet 4 times, and the
usual fix (DISTINCT) is a second full shuffle of the pair stream. This
join uses the report-once trick instead: a pair is emitted ONLY from
the cell that contains the overlap region's north-west corner (max of
the two min-lons, min of the two max-lats). That cell is covered by
both rects by construction, so every true pair is reported exactly
once and the dedup shuffle disappears from the plan.

Rectangles must not cross the antimeridian; callers at the poles are
clipped by the Web-Mercator MAX_LAT like every tile op here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osmzen_spark.tiling.cells import tile_x_col, tile_y_col


def _cover(df: DataFrame, z: int, prefix: str) -> DataFrame:
    """Explode each rect (id, x1, x2, y1, y2) to its covered z-tiles."""
    p = df.select([F.col(c).alias(f"{prefix}{c}") for c in df.columns])
    # y2 (max lat) maps to the SMALLER tile_y (slippy y grows south)
    x_lo, x_hi = tile_x_col(F.col(f"{prefix}x1"), z), tile_x_col(F.col(f"{prefix}x2"), z)
    y_lo, y_hi = tile_y_col(F.col(f"{prefix}y2"), z), tile_y_col(F.col(f"{prefix}y1"), z)
    return p.withColumn("cx", F.explode(F.sequence(x_lo, x_hi))).withColumn(
        "cy", F.explode(F.sequence(y_lo, y_hi))
    )


def rect_overlap_join(a: DataFrame, b: DataFrame, z: int) -> DataFrame:
    """Interior-overlapping pairs of rects from ``a`` x ``b``.

    Inputs need columns (id, x1, x2, y1, y2) — lon/lat degree bounds,
    x1 < x2, y1 < y2. Output: a_id, b_id, ov_x1, ov_x2, ov_y1, ov_y2
    (the exact overlap box) and ov_area (degree^2 product).
    """
    ca = _cover(a, z, "a_")
    cb = _cover(b, z, "b_")
    j = ca.join(cb, on=["cx", "cy"], how="inner")
    ov_x1 = F.greatest("a_x1", "b_x1")
    ov_x2 = F.least("a_x2", "b_x2")
    ov_y1 = F.greatest("a_y1", "b_y1")
    ov_y2 = F.least("a_y2", "b_y2")
    overlaps = (ov_x1 < ov_x2) & (ov_y1 < ov_y2)
    # report-once: only the cell holding the overlap's NW corner emits
    report_here = (F.col("cx") == tile_x_col(ov_x1, z)) & (F.col("cy") == tile_y_col(ov_y2, z))
    return j.filter(overlaps & report_here).select(
        "a_id",
        "b_id",
        ov_x1.alias("ov_x1"),
        ov_x2.alias("ov_x2"),
        ov_y1.alias("ov_y1"),
        ov_y2.alias("ov_y2"),
        ((ov_x2 - ov_x1) * (ov_y2 - ov_y1)).alias("ov_area"),
    )
