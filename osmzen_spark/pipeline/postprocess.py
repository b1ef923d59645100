"""Cross-feature / cross-layer post-processors (SURVEY.md §2.G).

Each is ``fn(layers: dict[str, DataFrame], zoom, params) -> layers``.
The reference's nested-loop scans over per-tile feature lists become
joins: id-equality joins are broadcast-friendly (the matched side per
operation is small relative to the fact side) and spatial ones key on
tile cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from osmzen_spark.pipeline.matcher import CSVMatcher


def _ids_of(df: DataFrame) -> DataFrame:
    return df.select(F.col("id").alias("__oid"), F.col("type").alias("__otype")).distinct()


def set_conditional_names(layers: dict[str, DataFrame], zoom: int, params=None) -> dict[str, DataFrame]:
    """Hard-wired first post-processor (ref:postprocess/functions.go:83-152):

    * building features whose (id,type) also matched pois or landuse:
      name <- addr:housename tag, or dropped;
    * landuse features whose (id,type) also matched pois: name dropped.
    """
    out = dict(layers)
    buildings = out.get("buildings")
    pois = out.get("pois")
    landuse = out.get("landuse")

    if buildings is not None and (pois is not None or landuse is not None):
        srcs = [s for s in (pois, landuse) if s is not None]
        b = buildings
        hit = F.lit(False)
        for i, s in enumerate(srcs):
            m = F.broadcast(
                s.select(F.col("id").alias(f"__oid{i}"), F.col("type").alias(f"__otype{i}")).distinct()
            )
            b = b.join(
                m, (b["id"] == m[f"__oid{i}"]) & (b["type"] == m[f"__otype{i}"]), "left"
            )
            hit = hit | F.col(f"__oid{i}").isNotNull()
        housename = F.nullif(F.element_at(F.col("tags"), F.lit("addr:housename")), F.lit(""))
        name_col = F.col("name") if "name" in b.columns else F.lit(None).cast("string")
        b = b.withColumn("name", F.when(hit, housename).otherwise(name_col))
        b = b.drop(*[c for c in b.columns if c.startswith("__oid") or c.startswith("__otype")])
        out["buildings"] = b

    if landuse is not None and pois is not None:
        m = F.broadcast(_ids_of(pois))
        l = landuse.join(
            m, (landuse["id"] == m["__oid"]) & (landuse["type"] == m["__otype"]), "left"
        )
        if "name" in landuse.columns:
            l = l.withColumn("name", F.when(F.col("__oid").isNotNull(), F.lit(None)).otherwise(F.col("name")))
        out["landuse"] = l.drop("__oid", "__otype")

    return out


def csv_match_properties(layers, zoom, params):
    """First-matching CSV row assigns sort_rank/scale_rank
    (ref:postprocess/functions.go:174-208 + matcher/)."""
    layer = params["source_layer"]
    if layer not in layers:
        return layers
    matcher: CSVMatcher = params["matcher"]
    out = dict(layers)
    out[layer] = matcher.apply(out[layer], zoom)
    return out


def backfill_from_other_layer(layers, zoom, params):
    """dst[key] <- src[other_key] by feature id, only when dst key absent
    (ref:postprocess/functions.go:822-881). Join on id (reference indexes
    id only), broadcast the source side."""
    dst_name, dst_key = params["layer"], params["layer_key"]
    src_name, src_key = params["other_layer"], params["other_key"]
    if dst_name not in layers or src_name not in layers:
        return layers
    src = layers[src_name]
    if src_key not in src.columns:
        return layers
    vals = (
        src.filter(F.col("id") != 0)
        .filter(F.col(src_key).isNotNull())
        .groupBy("id")
        .agg(F.max(F.col(src_key)).alias("__backfill"))
        .withColumnRenamed("id", "__bid")
    )
    dst = layers[dst_name]
    dst_col = F.col(dst_key) if dst_key in dst.columns else F.lit(None).cast("string")
    joined = dst.join(F.broadcast(vals), dst["id"] == vals["__bid"], "left")
    joined = joined.withColumn(dst_key, F.coalesce(dst_col, F.col("__backfill"))).drop(
        "__bid", "__backfill"
    )
    out = dict(layers)
    out[dst_name] = joined
    return out


def quantize_height(layers, zoom, params):
    """z13: 20m steps; z14/15: 10m; val<step -> floor(step)
    (ref:postprocess/quantize_height.go:11-102)."""
    layer = params["source_layer"]
    start = params.get("start_zoom", 0)
    end = params.get("end_zoom", 50)
    if layer not in layers or zoom < start or zoom > end:
        return layers
    step = {13: 20.0, 14: 10.0, 15: 10.0}.get(zoom)
    if step is None:
        return layers
    df = layers[layer]
    if "height" not in df.columns:
        return layers
    h = F.col("height").cast("double")
    q = F.when(h < step, F.floor(F.lit(step)).cast("double")).otherwise(
        F.floor(F.lit(step) * F.round(h / F.lit(step))).cast("double")
    )
    out = dict(layers)
    out[layer] = df.withColumn("height", F.when(h.isNotNull(), q))
    return out


def clamp_min_zoom(layers, zoom, params):
    """min_zoom raised (never lowered) per a property-keyed clamp table
    (ref:postprocess/clamp_min_zoom.go:11-96)."""
    layer = params["layer"]
    start = params.get("start_zoom", 0)
    end = params.get("end_zoom", 50)
    if layer not in layers or zoom < start or zoom > end:
        return layers
    df = layers[layer]
    prop = params["property"]
    if prop not in df.columns:
        return layers
    chain = None
    for k, v in params["clamp"].items():
        cond = F.col(prop).cast("double") == F.lit(float(k))
        val = F.lit(float(v))
        chain = F.when(cond, val) if chain is None else chain.when(cond, val)
    clamped = F.greatest(F.col("min_zoom"), F.coalesce(chain, F.col("min_zoom")))
    out = dict(layers)
    out[layer] = df.withColumn("min_zoom", clamped)
    return out


def numeric_min_filter(layers, zoom, params):
    """Keep feature if any/all per-zoom minima met
    (ref:postprocess/functions.go:350-444)."""
    layer = params["source_layer"]
    if layer not in layers:
        return layers
    filters = params["filters"].get(zoom)
    if filters is None:
        return layers
    df = layers[layer]
    mode = params.get("mode", "all")
    preds = []
    for prop, minimum in filters.items():
        col = F.col(prop).cast("double") if prop in df.columns else F.lit(None).cast("double")
        preds.append(F.coalesce(col, F.lit(0.0)) >= F.lit(float(minimum)))
    combined = preds[0]
    for p in preds[1:]:
        combined = (combined | p) if mode == "any" else (combined & p)
    out = dict(layers)
    out[layer] = df.filter(combined)
    return out


def remap(layers, zoom, params):
    """Value remap for a property on given geometry types
    (ref:postprocess/remap.go:11-115)."""
    layer = params["source_layer"]
    if layer not in layers:
        return layers
    start = params.get("start_zoom", 0)
    end = params.get("end_zoom", 50)
    if zoom < start or zoom > end:
        return layers
    df = layers[layer]
    prop = params.get("property", "kind")
    if prop not in df.columns:
        return layers
    table: dict = params["remap"]
    geom_types = params.get("geom_types")
    map_col = F.create_map(*[F.lit(x) for kv in sorted(table.items()) for x in kv])
    remapped = F.coalesce(F.element_at(map_col, F.col(prop).cast("string")), F.col(prop))
    if geom_types:
        remapped = F.when(F.col("geom_type").isin(*geom_types), remapped).otherwise(F.col(prop))
    out = dict(layers)
    out[layer] = df.withColumn(prop, remapped)
    return out


def drop_names(layers, zoom, params):
    """Null out name-like properties in a zoom range
    (ref:postprocess/functions.go:632-726)."""
    layer = params["source_layer"]
    if layer not in layers:
        return layers
    start = params.get("start_zoom", 0)
    end = params.get("end_zoom", 50)
    if zoom < start or zoom > end:
        return layers
    df = layers[layer]
    name_cols = [c for c in df.columns if c == "name" or c.startswith("name:") or c in ("int_name", "loc_name", "nat_name", "official_name", "old_name", "reg_name", "short_name", "alt_name")]
    out_df = df
    for c in name_cols:
        out_df = out_df.withColumn(c, F.lit(None).cast("string"))
    out = dict(layers)
    out[layer] = out_df
    return out


POSTPROCESSORS = {
    "csv_match_properties": csv_match_properties,
    "backfill_from_other_layer": backfill_from_other_layer,
    "quantize_height": quantize_height,
    "clamp_min_zoom": clamp_min_zoom,
    "numeric_min_filter": numeric_min_filter,
    "remap": remap,
    "drop_names": drop_names,
}
