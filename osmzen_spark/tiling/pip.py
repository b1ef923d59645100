"""Point-in-polygon spatial join: cell equi-join prefilter + vectorized
ray-cast refine (the north-rule PIP operator).

Plan shape (scale rationale):
  1. polygons -> covering cells at zoom ``z`` (bbox cover, pure Column
     math: ``sequence() x sequence()`` explode — no UDF). At 100TB the
     polygon side is the small side; the explode factor is bounded by
     choosing z from typical polygon extent.
  2. points -> one cell each (Column math).
  3. equi-join on cell (broadcast if polygon side is small, else a
     plain shuffled hash join on an int64 key — skew handled by AQE).
  4. exact refine: even-odd ray cast, Arrow-batch-vectorized over the
     flat edge buffers (numpy reduceat, no per-row Python).

Ray-cast semantics: even-odd rule over ALL rings (holes handled
automatically); points exactly on an edge are implementation-defined
(consistent with the usual crossing-count convention).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from osmzen_spark.tiling.cells import cell_from_xy_col, tile_x_col, tile_y_col


def ray_cast(px, py, xs_flat, ys_flat, pt_row_offsets, ring_lens_flat, ring_row_offsets):
    """Vectorized even-odd test. One (point, polygon) pair per row.

    px/py: float64[n]; polygon buffers flat as in geom.kernels.
    Returns bool[n].
    """
    n = len(px)
    if n == 0:
        return np.zeros(0, dtype=bool)
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    xs = np.ascontiguousarray(xs_flat, dtype=np.float64)
    ys = np.ascontiguousarray(ys_flat, dtype=np.float64)
    pt_off = np.ascontiguousarray(pt_row_offsets, dtype=np.int64)
    ring_lens = np.ascontiguousarray(ring_lens_flat, dtype=np.int64)
    ring_off = np.ascontiguousarray(ring_row_offsets, dtype=np.int64)

    n_pts = len(xs)
    if n_pts == 0:
        return np.zeros(n, dtype=bool)

    # broadcast the query point to every vertex of its pair's polygon
    counts = np.diff(pt_off)
    PX = np.repeat(px, counts)
    PY = np.repeat(py, counts)

    x1, y1 = xs, ys
    x2 = np.empty_like(xs)
    y2 = np.empty_like(ys)
    x2[:-1], x2[-1] = xs[1:], xs[-1]
    y2[:-1], y2[-1] = ys[1:], ys[-1]

    with np.errstate(divide="ignore", invalid="ignore"):
        straddles = (y1 > PY) != (y2 > PY)
        xint = (x2 - x1) * (PY - y1) / (y2 - y1) + x1
        crossing = straddles & (PX < xint)

    cross = np.where(crossing, 1, 0).astype(np.int64)
    # zero out edges that straddle a ring boundary (invalid pairings)
    n_rings = len(ring_lens)
    ring_starts = np.zeros(n_rings, dtype=np.int64)
    if n_rings > 1:
        np.cumsum(ring_lens[:-1], out=ring_starts[1:])
    boundary = ring_starts + ring_lens - 1
    boundary = boundary[(boundary >= 0) & (boundary < n_pts)]
    cross[boundary] = 0

    row_counts = np.add.reduceat(cross, np.minimum(pt_off[:-1], n_pts - 1))
    row_counts[counts == 0] = 0
    return (row_counts % 2) == 1


def polygon_cover_cells(polygons: DataFrame, z: int, geometry_col: str = "geometry") -> DataFrame:
    """Explode each polygon to its bbox-covering cells at zoom z.

    Adds column ``cell``. Pure Column math (sequence x sequence).
    """
    g = F.col(geometry_col)
    df = (
        polygons.withColumn("_x0", tile_x_col(F.array_min(g["xs"]), z))
        .withColumn("_x1", tile_x_col(F.array_max(g["xs"]), z))
        .withColumn("_y0", tile_y_col(F.array_max(g["ys"]), z))  # y grows south
        .withColumn("_y1", tile_y_col(F.array_min(g["ys"]), z))
    )
    df = df.withColumn("_tx", F.explode(F.sequence("_x0", "_x1")))
    df = df.withColumn("_ty", F.explode(F.sequence("_y0", "_y1")))
    df = df.withColumn("cell", cell_from_xy_col(F.col("_tx"), F.col("_ty"), z))
    return df.drop("_x0", "_x1", "_y0", "_y1", "_tx", "_ty")


def point_in_polygon_join(
    points: DataFrame,
    polygons: DataFrame,
    z: int = 12,
    lon: str = "lon",
    lat: str = "lat",
    geometry_col: str = "geometry",
    broadcast_polygons: bool = False,
) -> DataFrame:
    """Join points to the polygons containing them.

    Result: all point columns + all polygon columns (caller should
    pre-select/rename to avoid collisions), only matching pairs.
    """
    pts = points.withColumn(
        "cell", cell_from_xy_col(tile_x_col(F.col(lon), z), tile_y_col(F.col(lat), z), z)
    )
    polys = polygon_cover_cells(polygons, z, geometry_col)
    if broadcast_polygons:
        polys = F.broadcast(polys)
    cand = pts.join(polys, on="cell", how="inner").drop("cell")

    out_schema = T.StructType(
        [f for f in cand.schema.fields] + [T.StructField("_pip", T.BooleanType())]
    )

    def refine(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            names = batch.schema.names
            geom = batch.column(names.index(geometry_col))
            if isinstance(geom, pa.ChunkedArray):
                geom = geom.combine_chunks()
            px = batch.column(names.index(lon)).to_numpy(zero_copy_only=False)
            py = batch.column(names.index(lat)).to_numpy(zero_copy_only=False)

            def flat(arr):
                offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
                vals = arr.values.to_numpy(zero_copy_only=False)
                base = offs[0]
                if base != 0:
                    vals = vals[base : offs[-1]]
                    offs = offs - base
                else:
                    vals = vals[: offs[-1]]
                return vals, offs

            xs, pt_off = flat(geom.field("xs"))
            ys, _ = flat(geom.field("ys"))
            rl, ring_off = flat(geom.field("ring_lens"))
            inside = ray_cast(px, py, xs, ys, pt_off, rl, ring_off)
            arrays = list(batch.columns) + [pa.array(inside)]
            yield pa.RecordBatch.from_arrays(arrays, names=names + ["_pip"])

    return cand.mapInArrow(refine, schema=out_schema).filter(F.col("_pip")).drop("_pip")
