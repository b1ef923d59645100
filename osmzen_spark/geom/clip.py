"""ClipAndWrapGeometry (ref:postprocess/functions.go:886-953): clip
every feature to the tile bound — open-outer-ring polygons (tainted
multipolygon relations) to the EXACT bound, everything else to a
2x-padded bound — drop features whose geometry vanishes, and fix ring
winding (outer CCW, holes CW — the "wrap" in the name).

Scale design: clipping only changes features that CROSS the clip
rectangle, a perimeter-to-area sliver of any tile's features. The
Arrow-batch stage classifies every row with vectorized bbox reductions
(np.minimum.reduceat over the flat coordinate buffer):

  fully inside  -> pass through untouched (zero-copy columns)
  fully outside -> dropped by a boolean mask
  crossing      -> per-ring Sutherland-Hodgman / Liang-Barsky in numpy
                   (bounded work: only boundary-crossers)

Deviation from the reference: orb/clip/smartclip reconstructs open
rings by walking the bound perimeter between entry/exit points; here an
open outer ring is closed first (first point appended) and then clipped
like a closed ring. For single-entry/exit rings (the
patched-multipolygon case the reference feeds it,
ref:process.go:317-331) the results agree up to the collinear points
along the bound edge.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame

# world-ish bound: clip is a no-op there (kept cheap by the bbox gate)
_LINES = ("LineString", "MultiLineString")
_POLYS = ("Polygon", "MultiPolygon")


def pad_bound(bound, factor: float):
    """ref:postprocess/functions.go:921-930 — pad BOTH dims by
    height*(factor-1)/2."""
    if not factor or factor == 1.0:
        return bound
    minx, miny, maxx, maxy = bound
    pad = (maxy - miny) * (factor - 1.0) / 2.0
    return (minx - pad, miny - pad, maxx + pad, maxy + pad)


def _ring_signed_area(xs: np.ndarray, ys: np.ndarray) -> float:
    return float(np.dot(xs, np.roll(ys, -1)) - np.dot(ys, np.roll(xs, -1))) / 2.0


def _clip_ring_sh(xs, ys, bound):
    """Sutherland-Hodgman polygon clip of one closed ring against an
    axis-aligned rectangle. Input/output rings are closed."""
    minx, miny, maxx, maxy = bound
    pts = list(zip(xs.tolist(), ys.tolist()))
    if pts and pts[0] == pts[-1]:
        pts = pts[:-1]

    def clip_edge(pts, inside, intersect):
        out = []
        n = len(pts)
        for i in range(n):
            cur, prev = pts[i], pts[i - 1]
            cin, pin = inside(cur), inside(prev)
            if cin:
                if not pin:
                    out.append(intersect(prev, cur))
                out.append(cur)
            elif pin:
                out.append(intersect(prev, cur))
        return out

    def ix(p, c, x):  # intersect with vertical line x
        t = (x - p[0]) / (c[0] - p[0])
        return (x, p[1] + t * (c[1] - p[1]))

    def iy(p, c, y):  # intersect with horizontal line y
        t = (y - p[1]) / (c[1] - p[1])
        return (p[0] + t * (c[0] - p[0]), y)

    pts = clip_edge(pts, lambda p: p[0] >= minx, lambda p, c: ix(p, c, minx))
    if pts:
        pts = clip_edge(pts, lambda p: p[0] <= maxx, lambda p, c: ix(p, c, maxx))
    if pts:
        pts = clip_edge(pts, lambda p: p[1] >= miny, lambda p, c: iy(p, c, miny))
    if pts:
        pts = clip_edge(pts, lambda p: p[1] <= maxy, lambda p, c: iy(p, c, maxy))
    if len(pts) < 3:
        return None
    pts.append(pts[0])
    return np.array([p[0] for p in pts]), np.array([p[1] for p in pts])


def _clip_line_lb(xs, ys, bound):
    """Per-segment Liang-Barsky; stitches consecutive surviving segments.
    Returns list of (xs, ys) line parts."""
    minx, miny, maxx, maxy = bound
    parts: list[tuple[list, list]] = []
    cur_x: list = []
    cur_y: list = []
    for i in range(len(xs) - 1):
        x0, y0, x1, y1 = xs[i], ys[i], xs[i + 1], ys[i + 1]
        dx, dy = x1 - x0, y1 - y0
        t0, t1 = 0.0, 1.0
        ok = True
        for p, q in (
            (-dx, x0 - minx),
            (dx, maxx - x0),
            (-dy, y0 - miny),
            (dy, maxy - y0),
        ):
            if p == 0:
                if q < 0:
                    ok = False
                    break
                continue
            r = q / p
            if p < 0:
                if r > t1:
                    ok = False
                    break
                if r > t0:
                    t0 = r
            else:
                if r < t0:
                    ok = False
                    break
                if r < t1:
                    t1 = r
        if not ok:
            if cur_x:
                parts.append((cur_x, cur_y))
                cur_x, cur_y = [], []
            continue
        ax, ay = x0 + t0 * dx, y0 + t0 * dy
        bx, by = x0 + t1 * dx, y0 + t1 * dy
        if cur_x and (cur_x[-1] == ax and cur_y[-1] == ay):
            cur_x.append(bx)
            cur_y.append(by)
        else:
            if cur_x:
                parts.append((cur_x, cur_y))
            cur_x, cur_y = [ax, bx], [ay, by]
        if t1 < 1.0:  # exits the bound: break the part
            parts.append((cur_x, cur_y))
            cur_x, cur_y = [], []
    if cur_x:
        parts.append((cur_x, cur_y))
    return [p for p in parts if len(p[0]) >= 2]


def _clip_row(gtype, xs, ys, ring_lens, ring_roles, bound):
    """Clip one feature. Returns (xs, ys, ring_lens, ring_roles) or None
    when the geometry vanishes. Winding fixed: outer CCW, holes CW."""
    if gtype in ("Point", "MultiPoint"):
        minx, miny, maxx, maxy = bound
        keep = (xs >= minx) & (xs <= maxx) & (ys >= miny) & (ys <= maxy)
        if not keep.any():
            return None
        return xs[keep], ys[keep], np.ones(int(keep.sum()), np.int32), np.zeros(int(keep.sum()), np.int32)

    out_xs, out_ys, out_lens, out_roles = [], [], [], []
    off = 0
    if gtype in _LINES:
        for rl in ring_lens:
            for px, py in _clip_line_lb(xs[off : off + rl], ys[off : off + rl], bound):
                out_xs.extend(px)
                out_ys.extend(py)
                out_lens.append(len(px))
                out_roles.append(0)
            off += rl
    else:  # polygons
        dropped_outer = False
        for rl, role in zip(ring_lens, ring_roles):
            rx, ry = xs[off : off + rl], ys[off : off + rl]
            off += rl
            if role == 1 and dropped_outer:
                # hole of a vanished outer ring: drop with it
                continue
            if rx[0] != rx[-1] or ry[0] != ry[-1]:
                rx = np.append(rx, rx[0])
                ry = np.append(ry, ry[0])
            clipped = _clip_ring_sh(rx, ry, bound)
            if clipped is None:
                dropped_outer = role == 0
                continue
            cx, cy = clipped
            dropped_outer = False
            # wrap: outer CCW (signed area > 0), holes CW
            sa = _ring_signed_area(cx[:-1], cy[:-1])
            if (role == 0 and sa < 0) or (role == 1 and sa > 0):
                cx, cy = cx[::-1], cy[::-1]
            out_xs.extend(cx.tolist())
            out_ys.extend(cy.tolist())
            out_lens.append(len(cx))
            out_roles.append(int(role))
    if not out_lens or (gtype in _POLYS and all(r == 1 for r in out_roles)):
        return None
    return (
        np.asarray(out_xs, np.float64),
        np.asarray(out_ys, np.float64),
        np.asarray(out_lens, np.int32),
        np.asarray(out_roles, np.int32),
    )


def clip_layer(df: DataFrame, bound, clip_factor: float = 1.0) -> DataFrame:
    """The Spark stage. Open-outer-ring polygons clip to the exact
    bound; everything else to the 2x-padded bound
    (ref:postprocess/functions.go:899-907)."""
    from osmzen_spark.geom.derive import _flat

    padded = pad_bound(bound, 2.0)

    def mapper(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            names = batch.schema.names
            gi = names.index("geometry")
            ti = names.index("geom_type")
            geom = batch.column(gi)
            if isinstance(geom, pa.ChunkedArray):
                geom = geom.combine_chunks()
            gtypes = np.asarray(batch.column(ti).to_pylist(), dtype=object)
            n = len(gtypes)
            if n == 0:
                yield batch
                continue
            xs, pt_off = _flat(geom.field("xs"))
            ys, _ = _flat(geom.field("ys"))
            ring_lens, ring_off = _flat(geom.field("ring_lens"))
            ring_roles, _ = _flat(geom.field("ring_roles"))

            # vectorized bbox per row (reduceat over flat coords)
            starts = pt_off[:-1]
            nonempty = pt_off[1:] > starts
            bx0 = np.full(n, np.inf)
            bx1 = np.full(n, -np.inf)
            by0 = np.full(n, np.inf)
            by1 = np.full(n, -np.inf)
            if nonempty.any():
                red_idx = starts[nonempty]
                bx0[nonempty] = np.minimum.reduceat(xs, red_idx)
                bx1[nonempty] = np.maximum.reduceat(xs, red_idx)
                by0[nonempty] = np.minimum.reduceat(ys, red_idx)
                by1[nonempty] = np.maximum.reduceat(ys, red_idx)

            # open-outer-ring detection (per row: first ring unclosed)
            is_poly = np.isin(gtypes.astype(str), _POLYS)
            open_ring = np.zeros(n, bool)
            if len(xs):
                has_ring = ring_off[1:] > ring_off[:-1]
                first_ring_len = np.zeros(n, np.int64)
                first_ring_len[has_ring] = ring_lens[ring_off[:-1][has_ring]]
                # clamp so fancy indexing is safe for empty rows (masked
                # out by has_ring anyway)
                fr_start = np.minimum(starts, len(xs) - 1)
                fr_end = np.minimum(
                    fr_start + np.maximum(first_ring_len - 1, 0), len(xs) - 1
                )
                open_ring = (
                    is_poly
                    & has_ring
                    & ((xs[fr_start] != xs[fr_end]) | (ys[fr_start] != ys[fr_end]))
                )

            bminx = np.where(open_ring, bound[0], padded[0])
            bminy = np.where(open_ring, bound[1], padded[1])
            bmaxx = np.where(open_ring, bound[2], padded[2])
            bmaxy = np.where(open_ring, bound[3], padded[3])

            inside = (bx0 >= bminx) & (bx1 <= bmaxx) & (by0 >= bminy) & (by1 <= bmaxy) & ~open_ring
            outside = (bx1 < bminx) | (bx0 > bmaxx) | (by1 < bminy) | (by0 > bmaxy) | ~nonempty
            crossing = ~inside & ~outside

            if not crossing.any():
                if outside.any():
                    yield batch.filter(pa.array(~outside))
                else:
                    yield batch
                continue

            # slow path: rebuild geometry for crossing rows
            keep = ~outside
            new_geoms: dict[int, tuple] = {}
            for i in np.nonzero(crossing)[0]:
                rl = ring_lens[ring_off[i] : ring_off[i + 1]]
                rr = ring_roles[ring_off[i] : ring_off[i + 1]]
                b = (bminx[i], bminy[i], bmaxx[i], bmaxy[i])
                res = _clip_row(
                    str(gtypes[i]), xs[pt_off[i] : pt_off[i + 1]], ys[pt_off[i] : pt_off[i + 1]], rl, rr, b
                )
                if res is None:
                    keep[i] = False
                else:
                    new_geoms[int(i)] = res

            idx = np.nonzero(keep)[0]
            # rebuild the geometry struct column for the kept rows
            gxs, gys, glens, groles = [], [], [], []
            for i in idx:
                if int(i) in new_geoms:
                    nx, ny, nl, nr = new_geoms[int(i)]
                else:
                    nx = xs[pt_off[i] : pt_off[i + 1]]
                    ny = ys[pt_off[i] : pt_off[i + 1]]
                    nl = ring_lens[ring_off[i] : ring_off[i + 1]]
                    nr = ring_roles[ring_off[i] : ring_off[i + 1]]
                gxs.append(nx.tolist())
                gys.append(ny.tolist())
                glens.append(nl.tolist())
                groles.append(nr.tolist())
            geom_arr = pa.StructArray.from_arrays(
                [
                    pa.array(gxs, type=pa.list_(pa.float64())),
                    pa.array(gys, type=pa.list_(pa.float64())),
                    pa.array(glens, type=pa.list_(pa.int32())),
                    pa.array(groles, type=pa.list_(pa.int32())),
                ],
                names=["xs", "ys", "ring_lens", "ring_roles"],
            )
            filtered = batch.filter(pa.array(keep))
            arrays = [
                geom_arr if j == gi else filtered.column(j) for j in range(filtered.num_columns)
            ]
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return df.mapInArrow(mapper, schema=df.schema)


def clip_and_wrap(layers: dict[str, DataFrame], bound, clip_factors=None) -> dict[str, DataFrame]:
    """Hard-wired final post-processor (ref:process.go:115-122)."""
    return {name: clip_layer(df, bound) for name, df in layers.items()}
