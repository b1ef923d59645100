"""Raster-tile <-> vector-feature join (north-rule operator).

A "raster" side is any table keyed by (z, x, y) — e.g. image tiles
with binary payloads. Features carry centroid lon/lat; we compute
their (x, y) at the raster's zoom and equi-join. Payload columns pass
through untouched (byte-equality invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osmzen_spark.tiling.cells import tile_x_col, tile_y_col


def raster_vector_join(
    features: DataFrame,
    rasters: DataFrame,
    z: int,
    lon: str = "clon",
    lat: str = "clat",
    raster_x: str = "tile_x",
    raster_y: str = "tile_y",
    how: str = "inner",
    broadcast_rasters: bool = False,
) -> DataFrame:
    feats = features.withColumn("_fx", tile_x_col(F.col(lon), z)).withColumn(
        "_fy", tile_y_col(F.col(lat), z)
    )
    r = rasters
    if broadcast_rasters:
        r = F.broadcast(r)
    cond = (F.col("_fx") == F.col(raster_x)) & (F.col("_fy") == F.col(raster_y))
    return feats.join(r, on=cond, how=how).drop("_fx", "_fy")
