"""Per-feature transforms (SURVEY.md §2.F): pure property edits
-> narrow ``withColumn`` stages, no shuffle (ref:transform/transforms.go).

Each transform is ``fn(df, ctx, zoom) -> df`` where ``ctx`` is the
EvalContext bound to the layer output's columns (tags = original OSM
tag stash, kept through layer eval exactly like the reference keeps
the `tags` property until post-processing ends, ref:process.go:216-218).

Transforms must tolerate absent columns (a layer that never emits
`zoo` simply skips normalize_tourism_kind's zoo branch).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osmzen_spark.compiler.context import EvalContext
from osmzen_spark.compiler.functions import to_float_meters_col, try_double

CARDINALS = {
    "north": 0.0, "n": 0.0, "nne": 22.0, "ne": 45.0, "ene": 67.0,
    "east": 90.0, "e": 90.0, "ese": 112.0, "se": 135.0, "sse": 157.0,
    "south": 180.0, "s": 180.0, "ssw": 202.0, "sw": 225.0, "wsw": 247.0,
    "west": 270.0, "w": 270.0, "wnw": 292.0, "nw": 315.0, "nnw": 337.0,
}


def _has(df: DataFrame, col: str) -> bool:
    return col in df.columns


def t_parse_layer_as_float(df, ctx, zoom):
    """layer -> float else drop (ref:transforms.go:399-410)."""
    if not _has(df, "layer"):
        return df
    return df.withColumn("layer", try_double(F.col("layer").cast("string")))


def t_building_height(df, ctx, zoom):
    """height property from Context.Height(); 0 -> absent
    (ref:transforms.go:95-100)."""
    return df.withColumn("height", F.nullif(ctx.height(), F.lit(0.0)))


def t_building_min_height(df, ctx, zoom):
    """min_height float, else building_min_levels*3, else absent
    (ref:transforms.go:102-116)."""
    min_h = try_double(F.col("min_height").cast("string")) if _has(df, "min_height") else F.lit(None).cast("double")
    levels = (
        try_double(F.col("building_min_levels").cast("string"))
        if _has(df, "building_min_levels")
        else F.lit(None).cast("double")
    )
    from_levels = F.when(levels.isNotNull(), F.greatest(levels, F.lit(0.0)) * 3)
    return df.withColumn("min_height", F.coalesce(min_h, from_levels))


def t_synthesize_volume(df, ctx, zoom):
    """floor(area * height) when both present (ref:transforms.go:118-126)."""
    if not (_has(df, "area") and _has(df, "height")):
        return df
    return df.withColumn(
        "volume",
        F.when(
            F.col("area").isNotNull() & F.col("height").isNotNull(),
            F.floor(F.col("area").cast("double") * F.col("height").cast("double")).cast("double"),
        ),
    )


def t_building_trim_properties(df, ctx, zoom):
    """drop building/building_part/building_levels/building_min_levels
    (ref:transforms.go:128-133)."""
    drops = [c for c in ("building", "building_part", "building_levels", "building_min_levels") if _has(df, c)]
    return df.drop(*drops)


def t_normalize_tourism_kind(df, ctx, zoom):
    """zoo/attraction tags override kind (ref:transforms.go:485-499)."""
    zoo = F.col("zoo") if _has(df, "zoo") else F.lit(None).cast("string")
    attr = F.col("attraction") if _has(df, "attraction") else F.lit(None).cast("string")
    promoted = F.coalesce(zoo, attr)
    out = df.withColumn("kind", F.coalesce(promoted, F.col("kind"))) if _has(df, "kind") else df
    if _has(df, "zoo") or _has(df, "attraction"):
        tourism = F.col("tourism") if _has(df, "tourism") else F.lit(None).cast("string")
        out = out.withColumn("tourism", F.when(promoted.isNotNull(), F.lit("attraction")).otherwise(tourism))
    return out


def t_detect_osm_relation(df, ctx, zoom):
    """type == relation -> osm_relation true (ref:transforms.go:89-93)."""
    return df.withColumn("osm_relation", F.when(F.col("type") == "relation", F.lit(True)))


def t_make_representative_point(df, ctx, zoom):
    """polygon -> centroid point geometry (ref:transforms.go:432-434)."""
    if not _has(df, "geometry"):
        return df
    is_poly = F.col("geom_type").isin("Polygon", "MultiPolygon")
    point = F.struct(
        F.array(F.col("clon")).alias("xs"),
        F.array(F.col("clat")).alias("ys"),
        F.array(F.lit(1)).alias("ring_lens"),
        F.array(F.lit(0)).alias("ring_roles"),
    )
    return df.withColumn(
        "geometry", F.when(is_poly, point).otherwise(F.col("geometry"))
    ).withColumn("geom_type", F.when(is_poly, F.lit("Point")).otherwise(F.col("geom_type")))


def t_height_to_meters(df, ctx, zoom):
    """height TAG parse -> meters else drop the property
    (ref:transforms.go:546-560: reads the original tag stash)."""
    tag = ctx.tag_str("height")
    parsed = to_float_meters_col(tag)
    height_col = F.col("height").cast("double") if _has(df, "height") else F.lit(None).cast("double")
    return df.withColumn("height", F.when(tag == "", height_col).otherwise(parsed))


def t_elevation_to_meters(df, ctx, zoom):
    """elevation property parse -> meters else drop (ref:transforms.go:561-573)."""
    if not _has(df, "elevation"):
        return df
    ev = F.coalesce(F.col("elevation").cast("string"), F.lit(""))
    return df.withColumn("elevation", F.when(ev == "", F.lit(None)).otherwise(to_float_meters_col(ev)))


def t_pois_capacity_int(df, ctx, zoom):
    """capacity -> floor(float) else drop (ref:transforms.go:269-287)."""
    if not _has(df, "capacity"):
        return df
    return df.withColumn("capacity", F.floor(try_double(F.col("capacity").cast("string"))).cast("double"))


def t_pois_direction_int(df, ctx, zoom):
    """direction string -> degrees (numbers truncated mod 360, cardinal
    names mapped); unparseable -> 0 (faithful to ref:transforms.go:289-299
    + util/utils.go:129-152)."""
    if not _has(df, "direction"):
        return df
    d = F.lower(F.trim(F.col("direction").cast("string")))
    num = try_double(d)
    card = F.element_at(
        F.create_map(*[F.lit(v) for kv in sorted(CARDINALS.items()) for v in kv]), d
    )
    deg = F.coalesce(F.pmod(num.cast("long"), F.lit(360)).cast("double"), card, F.lit(0.0))
    return df.withColumn("direction", F.when(F.col("direction").isNotNull(), deg))


def t_major_airport_detector(df, ctx, zoom):
    """aerodrome passenger heuristics (ref:transforms.go:238-267)."""
    if not _has(df, "kind"):
        return df
    detail = F.coalesce(F.col("kind_detail").cast("string"), F.lit("")) if _has(df, "kind_detail") else F.lit("")
    passengers = (
        F.coalesce(try_double(F.col("passenger_count").cast("string")), F.lit(0.0))
        if _has(df, "passenger_count")
        else F.lit(0.0)
    )
    is_aero = F.col("kind") == "aerodrome"
    new_detail = (
        F.when(is_aero & (detail != "international") & (passengers > 1000000), F.lit("international"))
        .when(is_aero & (detail == "") & (passengers > 10000), F.lit("regional"))
        .otherwise(F.nullif(detail, F.lit("")))
    )
    if not _has(df, "kind_detail"):
        return df.withColumn("kind_detail", new_detail)
    return df.withColumn("kind_detail", new_detail)


def t_place_population_int(df, ctx, zoom):
    """population -> floor(float) else drop (ref:transforms.go:191-198)."""
    if not _has(df, "population"):
        return df
    return df.withColumn("population", F.floor(try_double(F.col("population").cast("string"))).cast("double"))


# population_rank 18-break table (ref:transforms.go:200-235)
_POPULATION_BREAKS = [
    1000000000, 100000000, 50000000, 20000000, 10000000, 5000000, 1000000,
    500000, 200000, 100000, 50000, 20000, 10000, 5000, 2000, 1000, 200, 0,
]


def t_population_rank(df, ctx, zoom):
    pop = F.coalesce(F.col("population").cast("double"), F.lit(0.0)) if _has(df, "population") else F.lit(0.0)
    rank = F.lit(0)
    out = None
    for i, b in enumerate(_POPULATION_BREAKS):
        c = pop >= F.lit(float(b))
        v = F.lit(len(_POPULATION_BREAKS) - i)
        out = F.when(c, v) if out is None else out.when(c, v)
    return df.withColumn("population_rank", out.otherwise(rank).cast("double"))


def t_admin_level_as_int(df, ctx, zoom):
    """admin_level -> floor(float) else drop (ref:transforms.go:312-322)."""
    if not _has(df, "admin_level"):
        return df
    return df.withColumn("admin_level", F.floor(try_double(F.col("admin_level").cast("string"))).cast("double"))


def t_water_tunnel(df, ctx, zoom):
    """tunnel tag (non-no) -> is_tunnel, drop tunnel (ref:transforms.go:301-310)."""
    tunnel = ctx.tag_str("tunnel")
    out = df.withColumn("is_tunnel", F.when(~tunnel.isin("", "no", "false", "0"), F.lit(True)))
    return out.drop("tunnel") if _has(df, "tunnel") else out


def t_road_classifier(df, ctx, zoom):
    """_link suffix -> is_link; tunnel/bridge flags (ref:transforms.go:135-155)."""
    out = df
    if _has(df, "kind_detail"):
        out = out.withColumn(
            "is_link", F.when(F.col("kind_detail").cast("string").endswith("_link"), F.lit(True))
        )
    bridge = ctx.tag_str("bridge")
    tunnel = ctx.tag_str("tunnel")
    out = out.withColumn("is_bridge", F.when(bridge.isin("yes", "true"), F.lit(True)))
    out = out.withColumn("is_tunnel", F.when(tunnel.isin("yes", "true"), F.lit(True)))
    return out


def t_road_trim_properties(df, ctx, zoom):
    drops = [c for c in ("bridge", "tunnel") if _has(df, c)]
    return df.drop(*drops) if drops else df


def t_add_iata_code_to_airports(df, ctx, zoom):
    """3-letter IATA uppercased (ref:transforms.go:440-457)."""
    if not _has(df, "iata"):
        return df
    code = F.upper(F.trim(F.col("iata").cast("string")))
    return df.withColumn("iata", F.when(code.rlike("^[A-Z]{3}$"), code))


def t_add_uic_ref(df, ctx, zoom):
    """7-digit uic_ref -> int (ref:transforms.go:462-478)."""
    if not _has(df, "uic_ref"):
        return df
    v = F.trim(F.col("uic_ref").cast("string"))
    return df.withColumn("uic_ref", F.when(v.rlike("^[0-9]{7}$"), v.try_cast("double")))


def t_route_name(df, ctx, zoom):
    """route_name == name or name missing -> promote/drop
    (ref:transforms.go:176-189)."""
    if not _has(df, "route_name"):
        return df
    name = F.col("name") if _has(df, "name") else F.lit(None).cast("string")
    rn = F.col("route_name")
    out = df.withColumn("name", F.coalesce(name, rn))
    return out.withColumn("route_name", F.when(rn != F.coalesce(name, rn), rn))


# default place min_zoom table (ref:transforms.go:326-350)
_PLACE_DEFAULT_MZ = {
    "locality": 13.0, "isolated_dwelling": 13.0, "farm": 13.0, "hamlet": 12.0,
    "village": 11.0, "suburb": 10.0, "quarter": 10.0, "borough": 10.0,
    "town": 8.0, "city": 8.0, "province": 4.0, "state": 4.0, "sea": 3.0,
    "country": 0.0, "ocean": 0.0, "continent": 0.0,
}


def t_calculate_default_place_min_zoom(df, ctx, zoom):
    """kind-keyed default min_zoom, capitals promoted (-1/-2); only
    applies when min_zoom is absent — in this engine min_zoom is always
    set by rule eval (as in the reference pipeline, where this is
    effectively a no-op; ref:transforms.go:355-382). Kept faithful."""
    if "min_zoom" not in df.columns or "kind" not in df.columns:
        return df
    kind_mz = F.element_at(
        F.create_map(*[F.lit(x) for kv in sorted(_PLACE_DEFAULT_MZ.items()) for x in kv]),
        F.col("kind").cast("string"),
    )
    is_city_town = F.col("kind").isin("city", "town")
    region_cap = F.col("region_capital").isNotNull() if "region_capital" in df.columns else F.lit(False)
    country_cap = F.col("country_capital").isNotNull() if "country_capital" in df.columns else F.lit(False)
    adjusted = kind_mz - F.when(is_city_town & region_cap, 1.0).when(
        is_city_town & country_cap, 2.0
    ).otherwise(0.0)
    return df.withColumn("min_zoom", F.coalesce(F.col("min_zoom"), adjusted))


def t_noop(df, ctx, zoom):
    return df


TRANSFORMS: dict[str, Callable] = {
    # intentional no-ops, matching the reference's nil registry entries
    # (ref:transforms.go:28-40)
    "tags_create_dict": t_noop,
    "tags_remove": t_noop,
    "add_id_to_properties": t_noop,
    "remove_feature_id": t_noop,
    "add_road_network_from_ncat": t_noop,
    "remove_zero_area": t_noop,
    "truncate_min_zoom_to_1dp": t_noop,
    "truncate_min_zoom_to_2dp": t_noop,
    "capital_alternate_viewpoint": t_noop,
    "remap_viewpoint_kinds": t_noop,
    "unpack_viewpoint_claims": t_noop,
    "calculate_default_place_min_zoom": t_calculate_default_place_min_zoom,
    "parse_layer_as_float": t_parse_layer_as_float,
    "building_height": t_building_height,
    "building_min_height": t_building_min_height,
    "synthesize_volume": t_synthesize_volume,
    "building_trim_properties": t_building_trim_properties,
    "normalize_tourism_kind": t_normalize_tourism_kind,
    "detect_osm_relation": t_detect_osm_relation,
    "make_representative_point": t_make_representative_point,
    "height_to_meters": t_height_to_meters,
    "elevation_to_meters": t_elevation_to_meters,
    "pois_capacity_int": t_pois_capacity_int,
    "pois_direction_int": t_pois_direction_int,
    "major_airport_detector": t_major_airport_detector,
    "place_population_int": t_place_population_int,
    "population_rank": t_population_rank,
    "admin_level_as_int": t_admin_level_as_int,
    "water_tunnel": t_water_tunnel,
    "road_classifier": t_road_classifier,
    "road_trim_properties": t_road_trim_properties,
    "add_iata_code_to_airports": t_add_iata_code_to_airports,
    "add_uic_ref": t_add_uic_ref,
    "route_name": t_route_name,
}


def apply_transforms(df: DataFrame, names: list[str], zoom: int) -> DataFrame:
    ctx = EvalContext(tags="tags", geom_type="geom_type", derived={"area": F.col("area"), "length": F.col("length")}, zoom=zoom)
    for name in names:
        fn = TRANSFORMS.get(name)
        if fn is None:
            raise ValueError(f"unknown transform: {name}")
        df = fn(df, ctx, zoom)
    return df
