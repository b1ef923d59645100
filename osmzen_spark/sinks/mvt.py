"""Mapbox Vector Tile (MVT 2.1) sink — pure-stdlib protobuf encoder.

The reference engine's output feeds tilezen-style map rendering; the
deployment sink for that stack is the MVT tile blob. This module
encodes the engine's per-tile feature groups into spec-compliant MVT
bytes (vector-tile-spec 2.1: protobuf wire format written by hand —
varints, zigzag deltas, MoveTo/LineTo/ClosePath command integers,
per-layer interned key/value tables), with a decoder twin used by the
tests to round-trip every byte.

Spark shape: `mvt_tiles` shuffles the normalized feature table ONCE on
(tile_x, tile_y) — the engine's natural partition key — sorts within
partitions so tiles arrive contiguous, and encodes batch-vectorized
inside mapInPandas (projection/quantization/zigzag/varint all as
whole-array numpy; per-tile state is O(tile) via a carry buffer, not
O(partition)). At 10^12 features this is the standard tile-build
fan-out: shuffle on the tile key, encode locally, write blobs to
object storage.

Scope: Point / LineString / Polygon geometries, string/double/bool
properties, configurable extent (default 4096). Geometries arrive in
tile-local fractional coordinates [0, 1) and are quantized to the
integer extent grid here.
"""

from __future__ import annotations

import struct
from typing import Iterable

# wire types
_VARINT = 0
_LEN = 2


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_field(field: int, payload: bytes) -> bytes:
    return _tag(field, _LEN) + _varint(len(payload)) + payload


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _mvt_value(v) -> bytes:
    """vector_tile.Tile.Value message."""
    if isinstance(v, bool):
        return _tag(7, _VARINT) + _varint(1 if v else 0)
    if isinstance(v, int):
        return _tag(6, _VARINT) + _varint(_zigzag(v))
    if isinstance(v, float):
        return _tag(3, 1) + struct.pack("<d", v)
    s = str(v).encode("utf-8")
    return _len_field(1, s)


def _commands_point(coords: list[tuple[int, int]]) -> list[int]:
    out = [1 | (len(coords) << 3)]  # MoveTo x n
    px = py = 0
    for x, y in coords:
        out.append(_zigzag(x - px))
        out.append(_zigzag(y - py))
        px, py = x, y
    return out


def _commands_path(rings: list[list[tuple[int, int]]], close: bool) -> list[int]:
    out: list[int] = []
    px = py = 0
    for ring in rings:
        pts = ring[:-1] if close and len(ring) > 1 and ring[0] == ring[-1] else ring
        if len(pts) < 2:
            continue
        x, y = pts[0]
        out += [1 | (1 << 3), _zigzag(x - px), _zigzag(y - py)]  # MoveTo 1
        px, py = x, y
        out.append(2 | ((len(pts) - 1) << 3))  # LineTo n-1
        for x, y in pts[1:]:
            out += [_zigzag(x - px), _zigzag(y - py)]
            px, py = x, y
        if close:
            out.append(7 | (1 << 3))  # ClosePath
    return out


GEOM_TYPES = {"Point": 1, "LineString": 2, "Polygon": 3}


def _varints_with_counts(vals):
    """Vectorized varint encoder core: uint64 array -> (packed LEB128
    bytes, per-value byte counts). The byte counts let callers slice
    the packed stream at value boundaries (the batch command encoder
    cuts per-feature ranges out of ONE encode pass instead of paying
    one numpy call per feature)."""
    import numpy as np

    v = np.asarray(vals, dtype=np.uint64)
    if len(v) == 0:
        return b"", np.zeros(0, dtype=np.int64)
    nbytes = np.ones(len(v), dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nbytes += tmp > 0
        tmp >>= np.uint64(7)
    ends = np.cumsum(nbytes)
    total = int(ends[-1])
    starts = ends - nbytes
    idx = np.arange(total, dtype=np.int64) - np.repeat(starts, nbytes)
    shifted = np.repeat(v, nbytes) >> (idx.astype(np.uint64) * np.uint64(7))
    out = (shifted & np.uint64(0x7F)).astype(np.uint8)
    out[idx != np.repeat(nbytes - 1, nbytes)] |= 0x80
    return out.tobytes(), nbytes


def encode_varints(vals) -> bytes:
    """Vectorized varint encoder: uint64 array -> packed LEB128 bytes.

    Twin of osmpbf.decode_varints, same no-per-value-Python idea in
    reverse: per-value byte counts from 7-bit shifts, byte payloads
    from a repeat + per-byte-index shift, continuation bits from an
    is-last-byte mask. All inputs here (command integers, zigzagged
    deltas, tag indices) are non-negative and < 2^63."""
    return _varints_with_counts(vals)[0]


# Small-varint lookup (tag indices, lengths, ids): one list index per
# value instead of a bytearray-building loop. Varint encoding of a
# given value is unique, so the bytes are identical either way.
_VARINT_CACHE = [_varint(i) for i in range(16384)]


def _varint_c(v: int) -> bytes:
    return _VARINT_CACHE[v] if 0 <= v < 16384 else _varint(v)


def _encode_commands_batch(gx, gy, offs, gcodes, rl_l):
    """Geometry-command bytes for EVERY feature of a batch in one
    vectorized pass per geometry class.

    The per-feature version paid two tiny-numpy `encode_varints` calls
    plus `np.diff`/`concatenate` per feature (~26 s of single-thread
    CPU for 200k features, profiled — all numpy-call overhead, not
    arithmetic). Here the command-integer stream for all features is
    assembled with whole-batch index math, varint-packed ONCE, and cut
    into per-feature byte ranges from the per-value byte counts; the
    emitted bytes are identical because the command layout and varint
    coding are unchanged.

    Semantics mirrored exactly from the per-feature loop:
    * delta cursor starts at (0,0) per FEATURE and chains across that
      feature's kept rings (dropped rings never advance it);
    * Polygon rings (gcode 3) with >1 declared points and equal first/
      last quantized endpoints lose the duplicate endpoint;
    * rings with <2 points after trimming are dropped;
    * a path feature whose rings all drop emits empty command bytes;
    * Point features flatten all rings into one MoveTo-n.

    gx/gy: all quantized points (int64); offs: per-feature point
    offsets (len n+1); gcodes: 1/2/3 per feature; rl_l: per-feature
    ring-length arrays. Returns list[bytes] per feature."""
    import numpy as np

    n = len(gcodes)
    feat_cmds: list[bytes] = [b""] * n
    npts = np.diff(offs)

    def _zz64(d):
        return ((d << 1) ^ (d >> 63)).astype(np.uint64)

    def _slice_per_feature(cmd, vcount, out_idx):
        # one varint pass over the class's whole command stream, then
        # per-feature byte ranges at value boundaries
        blob, nb = _varints_with_counts(cmd)
        cumb = np.concatenate(([0], np.cumsum(nb)))
        vb = np.concatenate(([0], np.cumsum(vcount)))
        bs, be = cumb[vb[:-1]], cumb[vb[1:]]
        mv = memoryview(blob)
        for k, fi in enumerate(out_idx):
            feat_cmds[fi] = bytes(mv[bs[k] : be[k]])

    # ---- Point features: all rings flattened into one MoveTo-n
    pmask = gcodes == 1
    if pmask.any():
        pidx = np.flatnonzero(pmask)
        pn = npts[pidx]
        total = int(pn.sum())
        fstart_pt = np.cumsum(pn) - pn
        rep = np.repeat(np.arange(len(pidx)), pn)
        pos = np.arange(total, dtype=np.int64) - np.repeat(fstart_pt, pn)
        gidx = offs[pidx][rep] + pos
        px, py = gx[gidx], gy[gidx]
        dx = np.empty(total, np.int64)
        dy = np.empty(total, np.int64)
        if total:
            dx[0] = px[0]
            dx[1:] = px[1:] - px[:-1]
            dy[0] = py[0]
            dy[1:] = py[1:] - py[:-1]
            fb = fstart_pt[fstart_pt < total]  # delta cursor resets per feature
            dx[fb] = px[fb]
            dy[fb] = py[fb]
        zzx, zzy = _zz64(dx), _zz64(dy)
        osz = 1 + 2 * pn
        oend = np.cumsum(osz)
        ostart = oend - osz
        cmd = np.zeros(int(oend[-1]) if len(osz) else 0, dtype=np.uint64)
        cmd[ostart] = (1 | (pn << 3)).astype(np.uint64)  # MoveTo n
        slot = ostart[rep] + 1 + 2 * pos
        cmd[slot] = zzx
        cmd[slot + 1] = zzy
        _slice_per_feature(cmd, osz, pidx)

    # ---- LineString / Polygon features: per-ring MoveTo/LineTo chains
    smask = gcodes >= 2
    if smask.any():
        sidx = np.flatnonzero(smask)
        ns = len(sidx)
        nr = np.fromiter((len(rl_l[i]) for i in sidx), dtype=np.int64, count=ns)
        rlen = (
            np.concatenate([np.asarray(rl_l[i], dtype=np.int64) for i in sidx])
            if int(nr.sum())
            else np.zeros(0, dtype=np.int64)
        )
        rfeat = np.repeat(np.arange(ns), nr)  # ring -> local path-feature
        # ring start offsets inside each feature's point range
        rcum = np.cumsum(rlen) - rlen
        firstr = np.cumsum(nr) - nr
        base = rcum[np.minimum(firstr, max(len(rlen) - 1, 0))] if len(rlen) else firstr
        within = rcum - np.repeat(base, nr)
        fstart, fend = offs[sidx], offs[sidx + 1]
        rstart = fstart[rfeat] + within
        # declared ring lengths clipped to the feature's points (the
        # per-feature slicing truncated silently; same here)
        rlen_eff = np.minimum(rlen, np.maximum(fend[rfeat] - rstart, 0))
        close_r = gcodes[sidx][rfeat] == 3
        nonempty = rlen_eff > 0
        sf = np.where(nonempty, rstart, 0)
        sl = np.where(nonempty, rstart + rlen_eff - 1, 0)
        closed = (
            close_r & (rlen_eff > 1) & (gx[sf] == gx[sl]) & (gy[sf] == gy[sl])
        )
        tlen = rlen_eff - closed
        keep = tlen >= 2
        klen = tlen[keep]
        kstart = rstart[keep]
        kfeat = rfeat[keep]
        kclose = close_r[keep]
        nk = len(klen)
        # kept-point stream (feature-major, ring order preserved)
        tk = int(klen.sum())
        kk = np.cumsum(klen) - klen  # first kept point per ring
        rep = np.repeat(np.arange(nk), klen)
        pos = np.arange(tk, dtype=np.int64) - np.repeat(kk, klen)
        gidx = kstart[rep] + pos
        px, py = gx[gidx], gy[gidx]
        fpt = kfeat[rep]
        first = np.zeros(tk, dtype=bool)
        if tk:
            first[0] = True
            first[1:] = fpt[1:] != fpt[:-1]
        dx = np.empty(tk, np.int64)
        dy = np.empty(tk, np.int64)
        if tk:
            dx[0] = px[0]
            dx[1:] = px[1:] - px[:-1]
            dy[0] = py[0]
            dy[1:] = py[1:] - py[:-1]
            dx[first] = px[first]  # cursor resets per feature, not per ring
            dy[first] = py[first]
        zzx, zzy = _zz64(dx), _zz64(dy)
        # ring output layout: MoveTo1, dx0, dy0, LineTo(c-1), 2(c-1)
        # deltas, optional ClosePath
        osz = 4 + 2 * (klen - 1) + kclose.astype(np.int64)
        oend = np.cumsum(osz)
        ostart = oend - osz
        cmd = np.zeros(int(oend[-1]) if nk else 0, dtype=np.uint64)
        if nk:
            cmd[ostart] = np.uint64(9)  # MoveTo 1
            cmd[ostart + 1] = zzx[kk]
            cmd[ostart + 2] = zzy[kk]
            cmd[ostart + 3] = (2 | ((klen - 1) << 3)).astype(np.uint64)
            nfm = pos > 0
            slot = ostart[rep[nfm]] + 4 + 2 * (pos[nfm] - 1)
            cmd[slot] = zzx[nfm]
            cmd[slot + 1] = zzy[nfm]
            cp = np.flatnonzero(kclose)
            cmd[ostart[cp] + 4 + 2 * (klen[cp] - 1)] = np.uint64(15)  # ClosePath
        vcount = np.zeros(ns, dtype=np.int64)
        np.add.at(vcount, kfeat, osz)
        _slice_per_feature(cmd, vcount, sidx)

    return feat_cmds


def encode_layer(
    name: str,
    features: Iterable[dict],
    extent: int = 4096,
    version: int = 2,
) -> bytes:
    """One vector_tile.Tile.Layer message.

    Each feature dict: {"id": int|None, "geom_type": str,
    "rings": [[(gx, gy), ...], ...] in INTEGER extent coordinates,
    "properties": {str: str|int|float|bool}}. Keys and values are
    interned per layer in first-seen order (spec requirement)."""
    keys: dict[str, int] = {}
    vals: dict[tuple, int] = {}
    feats = []
    for f in features:
        tags: list[int] = []
        for k, v in f.get("properties", {}).items():
            if v is None:
                continue
            ki = keys.setdefault(k, len(keys))
            vk = (type(v).__name__, v)
            vi = vals.setdefault(vk, len(vals))
            tags += [ki, vi]
        gt = GEOM_TYPES[f["geom_type"]]
        if gt == 1:
            cmds = _commands_point([pt for ring in f["rings"] for pt in ring])
        else:
            cmds = _commands_path(f["rings"], close=(gt == 3))
        body = b""
        if f.get("id") is not None:
            body += _tag(1, _VARINT) + _varint(int(f["id"]))
        body += _len_field(2, b"".join(_varint(t) for t in tags))
        body += _tag(3, _VARINT) + _varint(gt)
        body += _len_field(4, b"".join(_varint(c) for c in cmds))
        feats.append(_len_field(2, body))

    out = bytearray()
    out += _tag(15, _VARINT) + _varint(version)
    out += _len_field(1, name.encode("utf-8"))
    for fe in feats:
        out += fe
    for k in keys:
        out += _len_field(3, k.encode("utf-8"))
    for (_t, v) in vals:
        out += _len_field(4, _mvt_value(v))
    out += _tag(5, _VARINT) + _varint(extent)
    return bytes(out)


def encode_tile(layers: dict[str, list[dict]], extent: int = 4096) -> bytes:
    """vector_tile.Tile: one Layer message per entry."""
    return b"".join(_len_field(3, encode_layer(n, fs, extent)) for n, fs in layers.items())


# ---------------------------------------------------------- Spark sink


def mvt_tiles(
    df,
    zoom: int,
    extent: int = 4096,
    property_cols: tuple[str, ...] = ("kind",),
):
    """Normalized feature rows -> one MVT blob per (tile_x, tile_y).

    Scale shape: ONE shuffle (repartition on the engine's natural tile
    key) + sortWithinPartitions(tile, zen_layer, id) so every tile's
    rows arrive contiguous and in deterministic order, then a
    mapInPandas encoder that runs batch-VECTORIZED: Mercator
    projection + extent quantization over all points of an Arrow
    batch at once, zigzag deltas as whole-array int math, varints via
    the numpy LEB128 kernel (encode_varints). Python touches features
    (assembling ~100-byte protobuf bodies) and tiles (key/value
    interning tables), never points or varint bytes — the first
    applyInPandas-per-tile version spent ~3 ms/feature on per-point
    math and per-group overhead; this one is ~30 us/feature.

    A tile whose rows straddle an Arrow batch boundary is carried into
    the next batch (tiles cannot straddle partitions: the shuffle is
    ON the tile key), so memory is O(batch + largest tile), not
    O(partition). Input needs: geometry struct (xs/ys/ring_lens),
    geom_type, zen_layer, id, tile_x, tile_y at ``zoom``, plus
    ``property_cols``. Returns (tile_x, tile_y, n_features, mvt).
    Byte-parity with the scalar encode_tile path is pytest-gated
    (tests/test_mvt.py)."""
    import numpy as np
    import pandas as pd

    n_tiles = 1 << zoom
    max_lat = 85.05112877980659
    pcols = list(property_cols)
    out_cols = ["tile_x", "tile_y", "n_features", "mvt"]

    def encode_ready(pdf):
        n = len(pdf)
        if n == 0:
            return []
        geo = pdf["geometry"]
        xs_l = [np.asarray(g["xs"], dtype=np.float64) for g in geo]
        ys_l = [np.asarray(g["ys"], dtype=np.float64) for g in geo]
        rl_l = [np.asarray(g["ring_lens"], dtype=np.int64) for g in geo]
        npts = np.fromiter((len(a) for a in xs_l), dtype=np.int64, count=n)
        xs = np.concatenate(xs_l)
        ys = np.concatenate(ys_l)
        tx = pdf["tile_x"].to_numpy(dtype=np.int64)
        ty = pdf["tile_y"].to_numpy(dtype=np.int64)
        # projection + quantization, all points at once (trunc toward
        # zero then clamp — identical to the scalar reference)
        xn = (xs + 180.0) / 360.0 * n_tiles - np.repeat(tx, npts)
        rlat = np.radians(np.clip(ys, -max_lat, max_lat))
        yn = (1.0 - np.log(np.tan(rlat) + 1.0 / np.cos(rlat)) / np.pi) / 2.0 * n_tiles
        yn -= np.repeat(ty, npts)
        gx = np.clip(np.trunc(xn * extent), 0, extent).astype(np.int64)
        gy = np.clip(np.trunc(yn * extent), 0, extent).astype(np.int64)

        offs = np.concatenate(([0], np.cumsum(npts)))
        gts = pdf["geom_type"].to_numpy()
        ids = pdf["id"].to_numpy()
        lnames = pdf["zen_layer"].to_numpy()
        props = {c: pdf[c].to_numpy() for c in pcols}

        gcodes = np.fromiter(
            (
                3 if g.endswith("Polygon") else 2 if g.endswith("LineString") else 1
                for g in gts
            ),
            dtype=np.int8,
            count=n,
        )
        feat_cmds = _encode_commands_batch(gx, gy, offs, gcodes, rl_l)

        keys = pdf[["tile_x", "tile_y"]].to_numpy()
        change = np.flatnonzero((keys[1:] != keys[:-1]).any(axis=1)) + 1
        bounds = np.concatenate(([0], change, [n]))
        # constant protobuf tag bytes + the small-varint cache replace
        # four function calls per feature; byte output is identical
        # (varint coding of a value is unique)
        t1v, t2l, t3v, t4l = (
            _tag(1, _VARINT),
            _tag(2, _LEN),
            _tag(3, _VARINT),
            _tag(4, _LEN),
        )
        out_rows = []
        for bi in range(len(bounds) - 1):
            s, e = int(bounds[bi]), int(bounds[bi + 1])
            layer_parts: dict[str, tuple[dict, dict, list]] = {}
            for i in range(s, e):
                keys_t, vals_t, feats = layer_parts.setdefault(
                    str(lnames[i]), ({}, {}, [])
                )
                tags_b = b""
                for c in pcols:
                    v = props[c][i]
                    if v is None or v != v:  # drop None/NaN
                        continue
                    if isinstance(v, np.generic):
                        v = v.item()
                    ki = keys_t.setdefault(c, len(keys_t))
                    vi = vals_t.setdefault((type(v).__name__, v), len(vals_t))
                    tags_b += _varint_c(ki) + _varint_c(vi)
                cb = feat_cmds[i]
                body = (
                    t1v
                    + _varint_c(abs(int(ids[i])))
                    + t2l
                    + _varint_c(len(tags_b))
                    + tags_b
                    + t3v
                    + _varint_c(int(gcodes[i]))
                    + t4l
                    + _varint_c(len(cb))
                    + cb
                )
                feats.append(t2l + _varint_c(len(body)) + body)
            blob = bytearray()
            nfeat = 0
            for lname, (keys_t, vals_t, feats) in layer_parts.items():
                lb = bytearray()
                lb += _tag(15, _VARINT) + _varint(2)
                lb += _len_field(1, lname.encode("utf-8"))
                for fe in feats:
                    lb += fe
                for kk in keys_t:
                    lb += _len_field(3, kk.encode("utf-8"))
                for _t, vv in vals_t:
                    lb += _len_field(4, _mvt_value(vv))
                lb += _tag(5, _VARINT) + _varint(extent)
                blob += _len_field(3, bytes(lb))
                nfeat += len(feats)
            out_rows.append((int(keys[s][0]), int(keys[s][1]), nfeat, bytes(blob)))
        return out_rows

    def gen(batches):
        # carry: list of frames, all rows of ONE (still-open) tile key.
        # Kept as a frame LIST so a tile spanning k Arrow batches costs
        # one concat total, not k re-concats of the growing carry
        # (the O(k^2) copying a hot tile used to pay).
        carry: list = []
        carry_key = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            first_key = (pdf["tile_x"].iat[0], pdf["tile_y"].iat[0])
            if carry and first_key != carry_key:
                # the carried tile is complete: flush it on its own
                rows = encode_ready(pd.concat(carry, ignore_index=True))
                carry = []
                if rows:
                    yield pd.DataFrame(rows, columns=out_cols)
            lx, ly = pdf["tile_x"].iat[-1], pdf["tile_y"].iat[-1]
            last = ((pdf["tile_x"] == lx) & (pdf["tile_y"] == ly)).to_numpy()
            ready = pdf[~last]
            if len(ready):
                if carry:  # carried rows belong to ready's first tile
                    ready = pd.concat([*carry, ready], ignore_index=True)
                    carry = []
                rows = encode_ready(ready)
                if rows:
                    yield pd.DataFrame(rows, columns=out_cols)
            carry.append(pdf[last].reset_index(drop=True))
            carry_key = (lx, ly)
        if carry:
            rows = encode_ready(pd.concat(carry, ignore_index=True))
            if rows:
                yield pd.DataFrame(rows, columns=out_cols)

    cols = ["tile_x", "tile_y", "geometry", "geom_type", "zen_layer", "id", *property_cols]
    # Explicit partition count: a bare repartition(cols) exchange is
    # AQE-coalescible, and the encoder's input is few BYTES relative to
    # its CPU cost (quantization + varint assembly per feature), so AQE
    # folded the whole encode onto 1-2 cores (measured: the sf0.1
    # encode of 200k features ran ~7 s nearly single-core). Pinning the
    # count to the session's shuffle parallelism keeps the Python stage
    # wide; the value is config-derived (the submitter sizes
    # spark.sql.shuffle.partitions to the cluster), not a local
    # constant.
    n_parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return (
        df.select(*dict.fromkeys(cols))
        .repartition(n_parts, "tile_x", "tile_y")
        .sortWithinPartitions("tile_x", "tile_y", "zen_layer", "id")
        .mapInPandas(gen, "tile_x long, tile_y long, n_features int, mvt binary")
    )


# ------------------------------------------------------------- decoder
# test twin: parses exactly what the encoder above writes (plus any
# spec-conformant field order), so round-trip tests check every byte.


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    v = 0
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7


def _fields(data: bytes):
    pos = 0
    while pos < len(data):
        key, pos = _read_varint(data, pos)
        field, wire = key >> 3, key & 7
        if wire == _VARINT:
            v, pos = _read_varint(data, pos)
        elif wire == 1:
            v, pos = data[pos : pos + 8], pos + 8
        elif wire == _LEN:
            ln, pos = _read_varint(data, pos)
            v, pos = data[pos : pos + ln], pos + ln
        elif wire == 5:
            v, pos = data[pos : pos + 4], pos + 4
        else:
            raise ValueError(f"wire type {wire}")
        yield field, wire, v


def _decode_value(data: bytes):
    for field, _w, v in _fields(data):
        if field == 1:
            return v.decode("utf-8")
        if field == 3:
            return struct.unpack("<d", v)[0]
        if field == 6:
            return _unzigzag(v)
        if field == 7:
            return bool(v)
    raise ValueError("empty Value")


def _decode_geometry(gtype: int, cmds: list[int]) -> list[list[tuple[int, int]]]:
    rings: list[list[tuple[int, int]]] = []
    cur: list[tuple[int, int]] = []
    x = y = 0
    i = 0
    while i < len(cmds):
        cid, count = cmds[i] & 7, cmds[i] >> 3
        i += 1
        if cid == 1:  # MoveTo
            for _ in range(count):
                x += _unzigzag(cmds[i]); y += _unzigzag(cmds[i + 1]); i += 2
                if gtype == 1:
                    rings.append([(x, y)])
                else:
                    if cur:
                        rings.append(cur)
                    cur = [(x, y)]
        elif cid == 2:  # LineTo
            for _ in range(count):
                x += _unzigzag(cmds[i]); y += _unzigzag(cmds[i + 1]); i += 2
                cur.append((x, y))
        elif cid == 7:  # ClosePath
            cur.append(cur[0])
        else:
            raise ValueError(f"geometry command {cid}")
    if cur:
        rings.append(cur)
    return rings


def decode_tile(data: bytes) -> dict[str, dict]:
    """MVT bytes -> {layer: {"extent", "version", "features": [...]}}
    with features carrying id/geom_type/rings/properties."""
    out: dict[str, dict] = {}
    for field, _w, layer_bytes in _fields(data):
        if field != 3:
            continue
        name = ""
        version = extent = 0
        keys: list[str] = []
        values: list = []
        raw_feats: list[bytes] = []
        for f2, _w2, v2 in _fields(layer_bytes):
            if f2 == 1:
                name = v2.decode("utf-8")
            elif f2 == 2:
                raw_feats.append(v2)
            elif f2 == 3:
                keys.append(v2.decode("utf-8"))
            elif f2 == 4:
                values.append(_decode_value(v2))
            elif f2 == 5:
                extent = v2
            elif f2 == 15:
                version = v2
        feats = []
        for fb in raw_feats:
            fid = None
            gtype = 0
            tags: list[int] = []
            cmds: list[int] = []
            for f3, _w3, v3 in _fields(fb):
                if f3 == 1:
                    fid = v3
                elif f3 == 2:
                    pos = 0
                    while pos < len(v3):
                        t, pos = _read_varint(v3, pos)
                        tags.append(t)
                elif f3 == 3:
                    gtype = v3
                elif f3 == 4:
                    pos = 0
                    while pos < len(v3):
                        c, pos = _read_varint(v3, pos)
                        cmds.append(c)
            props = {keys[tags[i]]: values[tags[i + 1]] for i in range(0, len(tags), 2)}
            gname = {1: "Point", 2: "LineString", 3: "Polygon"}[gtype]
            feats.append(
                {
                    "id": fid,
                    "geom_type": gname,
                    "rings": _decode_geometry(gtype, cmds),
                    "properties": props,
                }
            )
        out[name] = {"extent": extent, "version": version, "features": feats}
    return out
