"""Douglas-Peucker geometry simplification (tile-pipeline stage).

The reference engine emits full-resolution geometry and leaves
per-zoom simplification to the tile server; at 100 TB the engine is
the tile server, so this stage exists here as an engine addition (like
streaming): drop vertices whose removal moves the line/ring by less
than ``tolerance`` (same units as the coordinates), per feature, with
the classic stack-based Douglas-Peucker.

Scale shape: one mapInArrow pass, same batch layout as geom/clip.py —
rows whose parts are already at minimum vertex count (points, 2-point
lines, triangle rings) pass through via a boolean mask without
touching Python; the per-ring DP loop runs numpy-vectorized distance
kernels (one argmax per split), so the cost is O(vertices log vertices)
per feature and zero shuffle. Guarantees, pytest-asserted:

  * output vertices are a subset of input vertices, order preserved
  * line endpoints survive; rings stay closed
  * every dropped vertex lies within ``tolerance`` of the simplified
    part (the DP segment-distance invariant)
  * rings that collapse below 3 distinct vertices are dropped; a
    feature whose geometry vanishes is dropped (clip_layer semantics)
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame


def _seg_d2(xs: np.ndarray, ys: np.ndarray, i: int, j: int) -> np.ndarray:
    """Squared distance of points i+1..j-1 to SEGMENT (i, j)."""
    x0, y0, x1, y1 = xs[i], ys[i], xs[j], ys[j]
    dx, dy = x1 - x0, y1 - y0
    px, py = xs[i + 1 : j], ys[i + 1 : j]
    seg2 = dx * dx + dy * dy
    if seg2 == 0.0:
        return (px - x0) ** 2 + (py - y0) ** 2
    t = np.clip(((px - x0) * dx + (py - y0) * dy) / seg2, 0.0, 1.0)
    return (px - (x0 + t * dx)) ** 2 + (py - (y0 + t * dy)) ** 2


def dp_keep_mask(xs: np.ndarray, ys: np.ndarray, eps: float) -> np.ndarray:
    """Boolean keep-mask for an open polyline (endpoints always kept)."""
    n = len(xs)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    eps2 = eps * eps
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        d2 = _seg_d2(xs, ys, i, j)
        k = int(np.argmax(d2))  # first max wins on ties (deterministic)
        if d2[k] > eps2:
            m = i + 1 + k
            keep[m] = True
            stack.append((i, m))
            stack.append((m, j))
    return keep


def simplify_part(xs: np.ndarray, ys: np.ndarray, eps: float, closed: bool):
    """Simplify one line or ring. Returns (xs, ys) or None if a ring
    degenerates (< 3 distinct vertices)."""
    if closed:
        # drop the closing duplicate, anchor DP at vertex 0 and the
        # vertex farthest from it (the standard ring split), re-close
        if len(xs) >= 2 and xs[0] == xs[-1] and ys[0] == ys[-1]:
            xs, ys = xs[:-1], ys[:-1]
        n = len(xs)
        if n < 3:
            return None
        far = int(np.argmax((xs - xs[0]) ** 2 + (ys - ys[0]) ** 2))
        if far == 0:  # all vertices identical
            return None
        keep = np.zeros(n, dtype=bool)
        keep[: far + 1] |= dp_keep_mask(xs[: far + 1], ys[: far + 1], eps)
        k2 = dp_keep_mask(np.concatenate([xs[far:], xs[:1]]), np.concatenate([ys[far:], ys[:1]]), eps)
        keep[far:] |= k2[:-1]
        keep[0] = True
        if keep.sum() < 3:
            return None
        kx, ky = xs[keep], ys[keep]
        return np.append(kx, kx[0]), np.append(ky, ky[0])
    if len(xs) <= 2:
        return xs, ys
    keep = dp_keep_mask(xs, ys, eps)
    return xs[keep], ys[keep]


def simplify_layer(df: DataFrame, tolerance: float, geom_col: str = "geometry") -> DataFrame:
    """The Spark stage: simplify every feature's geometry in place.
    Point/MultiPoint rows (and anything already minimal) pass through
    untouched; rows whose geometry degenerates are dropped."""
    from osmzen_spark.geom.derive import _flat

    eps = float(tolerance)

    def mapper(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            names = batch.schema.names
            gi = names.index(geom_col)
            ti = names.index("geom_type")
            geom = batch.column(gi)
            if isinstance(geom, pa.ChunkedArray):
                geom = geom.combine_chunks()
            gtypes = np.asarray(batch.column(ti).to_pylist(), dtype=object).astype(str)
            n = len(gtypes)
            if n == 0:
                yield batch
                continue
            xs, pt_off = _flat(geom.field("xs"))
            ys, _ = _flat(geom.field("ys"))
            ring_lens, ring_off = _flat(geom.field("ring_lens"))
            ring_roles, _ = _flat(geom.field("ring_roles"))

            is_poly = np.isin(gtypes, ("Polygon", "MultiPolygon"))
            is_line = np.isin(gtypes, ("LineString", "MultiLineString"))
            n_pts = pt_off[1:] - pt_off[:-1]
            # minimal geometries can't lose vertices: points, 2-point
            # lines, closed triangles (4 incl. closing dup)
            candidate = (is_line & (n_pts > 2)) | (is_poly & (n_pts > 4))
            if not candidate.any():
                yield batch
                continue

            keep_row = np.ones(n, dtype=bool)
            new_geoms: dict[int, tuple] = {}
            for i in np.nonzero(candidate)[0]:
                rl = ring_lens[ring_off[i] : ring_off[i + 1]]
                rr = ring_roles[ring_off[i] : ring_off[i + 1]]
                rxs = xs[pt_off[i] : pt_off[i + 1]]
                rys = ys[pt_off[i] : pt_off[i + 1]]
                out_x, out_y, out_l, out_r = [], [], [], []
                pos = 0
                outer_died = False
                for ridx, ln in enumerate(rl):
                    px, py = rxs[pos : pos + ln], rys[pos : pos + ln]
                    pos += ln
                    res = simplify_part(px, py, eps, closed=bool(is_poly[i]))
                    if res is None:
                        # a dead outer ring kills its holes too
                        if is_poly[i] and (len(rr) == 0 or rr[ridx] == 0):
                            outer_died = True
                        continue
                    if outer_died and is_poly[i] and len(rr) > ridx and rr[ridx] == 1:
                        continue
                    if is_poly[i] and (len(rr) == 0 or rr[ridx] == 0):
                        outer_died = False
                    out_x.extend(res[0].tolist())
                    out_y.extend(res[1].tolist())
                    out_l.append(len(res[0]))
                    out_r.append(int(rr[ridx]) if len(rr) > ridx else 0)
                if not out_l:
                    keep_row[i] = False
                else:
                    new_geoms[int(i)] = (out_x, out_y, out_l, out_r)

            idx = np.nonzero(keep_row)[0]
            gxs, gys, glens, groles = [], [], [], []
            for i in idx:
                if int(i) in new_geoms:
                    nx, ny, nl, nr = new_geoms[int(i)]
                else:
                    nx = xs[pt_off[i] : pt_off[i + 1]].tolist()
                    ny = ys[pt_off[i] : pt_off[i + 1]].tolist()
                    nl = ring_lens[ring_off[i] : ring_off[i + 1]].tolist()
                    nr = ring_roles[ring_off[i] : ring_off[i + 1]].tolist()
                gxs.append(nx)
                gys.append(ny)
                glens.append(nl)
                groles.append(nr)
            geom_arr = pa.StructArray.from_arrays(
                [
                    pa.array(gxs, type=pa.list_(pa.float64())),
                    pa.array(gys, type=pa.list_(pa.float64())),
                    pa.array(glens, type=pa.list_(pa.int32())),
                    pa.array(groles, type=pa.list_(pa.int32())),
                ],
                names=["xs", "ys", "ring_lens", "ring_roles"],
            )
            filtered = batch.filter(pa.array(keep_row))
            arrays = [
                geom_arr if j == gi else filtered.column(j) for j in range(filtered.num_columns)
            ]
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return df.mapInArrow(mapper, schema=df.schema)
