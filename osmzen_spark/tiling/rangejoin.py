"""Radius (distance-within) spatial join via cell-ring candidate expansion.

``within_distance_join``: for every left-side point, find all right-side
points within ``radius_m`` meters (great-circle). The scale shape is the
same as ``tiling.knn``: the (usually larger) right side gets ONE Morton
cell each at zoom ``z``; the left side explodes to its (2*ring+1)^2
neighbor cells (wrapping x across the antimeridian); candidates come
from an int64 equi-join, and the exact haversine filter runs on the
candidate set only. One shuffle, no cross join, AQE handles skew from
dense cells — the plan that survives at 10^9 x 10^9 points, where a
theta-join on distance explodes.

Completeness envelope (same argument as knn_join, checked by tests
against the brute force): the join finds ALL pairs within ``radius_m``
iff ring * min-cell-ground-extent >= radius over the data's latitude
domain. A z-cell's ground extent is ~cos(lat) * 40_075_017 m / 2^z on
both axes (Web-Mercator compresses x and y identically), so callers
pick z/ring from their |lat| bound, e.g. |lat| < 75 and z=5, ring=1
covers radii up to ~324 km.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osmzen_spark.tiling.cells import cell_from_xy_col, neighbor_offsets, tile_x_col, tile_y_col
from osmzen_spark.tiling.knn import haversine_m

EARTH_CIRCUMFERENCE_M = 40_075_017.0


def min_cell_extent_m(z: int, max_abs_lat: float) -> float:
    """Smallest ground extent (m) of a zoom-z cell over |lat| <= bound."""
    return math.cos(math.radians(max_abs_lat)) * EARTH_CIRCUMFERENCE_M / 2**z


def within_distance_join(
    left: DataFrame,
    right: DataFrame,
    radius_m: float,
    z: int,
    ring: int = 1,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """All (left, right) pairs within ``radius_m`` meters.

    Output columns: l_<left cols>, r_<right cols>, dist_m.
    """
    if 2**z < 2 * ring + 1:
        # with fewer than 2*ring+1 x-cells the pmod antimeridian wrap
        # folds distinct ring offsets onto the same cell, and the join
        # (which has no pair-dedup, unlike snap's argmin window) would
        # emit duplicate (left, right) rows
        raise ValueError(
            f"ring={ring} needs at least 2*ring+1={2 * ring + 1} x-cells, "
            f"but z={z} has only {2**z}; raise z or shrink ring"
        )
    l = left.select([F.col(c).alias(f"l_{c}") for c in left.columns])
    r = right.select([F.col(c).alias(f"r_{c}") for c in right.columns]).withColumn(
        "cell",
        cell_from_xy_col(tile_x_col(F.col(f"r_{lon}"), z), tile_y_col(F.col(f"r_{lat}"), z), z),
    )
    n = 2**z
    l = (
        l.withColumn("_lx", tile_x_col(F.col(f"l_{lon}"), z))
        .withColumn("_ly", tile_y_col(F.col(f"l_{lat}"), z))
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
    lx = F.pmod(F.col("_lx") + F.col("_off.dx"), F.lit(n))  # antimeridian wrap
    ly = F.col("_ly") + F.col("_off.dy")
    l = (
        l.filter((ly >= 0) & (ly < n))
        .withColumn("cell", cell_from_xy_col(lx.cast("long"), ly.cast("long"), z))
        .drop("_lx", "_ly", "_off")
    )
    joined = l.join(r, on="cell", how="inner").drop("cell")
    dist = haversine_m(F.col(f"l_{lon}"), F.col(f"l_{lat}"), F.col(f"r_{lon}"), F.col(f"r_{lat}"))
    return joined.withColumn("dist_m", dist).filter(F.col("dist_m") <= F.lit(float(radius_m)))
