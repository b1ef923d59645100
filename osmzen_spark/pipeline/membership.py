"""Membership-join derived columns (SURVEY.md §2.D membership functions).

The reference evaluates per-feature closures over in-memory membership
indexes built per tile (ref:process.go:271-299, ref:filter/context.go:
183-249). Distributed, the indexes are *tables*:

* ``relation_members(relation_id, member_type, member_id, rel_tags)`` —
  one row per (relation, member); relation tags denormalized onto the
  row (an explode of the relations table — tiny relative to elements).
* ``way_nodes(way_id, node_id, way_tags)`` — one row per (way, node).

``with_membership_columns`` aggregates each table per member key (one
shuffle over the SMALL side) and left-joins the per-member summary onto
the elements table. The summary is ≤1 row per element that belongs to
anything, so it broadcasts when it fits (relations are a sliver of OSM:
~10M relations vs ~9B elements) and falls back to a sort-merge join on
the id key otherwise — pass ``broadcast=False`` at cluster scale if the
aggregated side exceeds the broadcast threshold.

Derived columns produced (consumed by compiler.functions /
compiler.context pseudo-columns):

  is_bus_route               boolean  (ref:filter/functions.go:163-180)
  mz_cycling_network         string   (ref:filter/functions.go:231-296)
  mz_hiking_network          string   (ref:filter/functions.go:182-229)
  mz_networks                array<struct<route,network,ref>>
                                      (ref:filter/functions.go:298-329)
  path_major_route_min_zoom  double   (ref:filter/functions.go:340-383)
  gate_min_zoom              double   (ref:filter/functions.go:120-159)

Determinism note: the reference collects mz_networks triples in OSM
input-file relation order; here the order is ascending relation_id
(deterministic under any partitioning — documented deviation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# mz_is_path_major_route_relation (ref:filter/functions.go:333-338)
_PATH_ROUTES = ("hiking", "foot", "bicycle")
_PATH_NETWORKS = ("iwn", "nwn", "rwn", "lwn", "icn", "ncn", "rcn", "lcn")

# network -> path-major min zoom (ref:filter/functions.go:349-380)
_PATH_ZOOMS = {
    "icn": 8.0, "ncn": 8.0,
    "iwn": 9.0, "nwn": 9.0,
    "rcn": 10.0,
    "rwn": 11.0, "lcn": 11.0,
    "lwn": 12.0,
}

# highway class -> gate zoom (ref:filter/functions.go:131-149)
_GATE_Z14 = ("motorway", "trunk", "primary", "motorway_link", "trunk_link", "primary_link")
_GATE_Z15 = ("secondary", "tertiary", "secondary_link", "tertiary_link")
_GATE_Z16 = ("residential", "service", "path", "track", "footway", "unclassified")

MEMBERSHIP_COLS = (
    "is_bus_route",
    "mz_cycling_network",
    "mz_hiking_network",
    "mz_networks",
    "path_major_route_min_zoom",
    "gate_min_zoom",
)


def _rt(key: str) -> Column:
    """Relation tag with Go map-miss semantics (missing -> '')."""
    return F.coalesce(F.element_at(F.col("rel_tags"), F.lit(key)), F.lit(""))


def relation_membership_summary(relation_members: DataFrame) -> DataFrame:
    """One row per (member_type, member_id) with every relation-derived
    aggregate the call-functions need. One shuffle over the small
    relation_members table; map-side combine applies to all aggregates
    but the collect_list (bounded: a way is in a handful of relations).
    """
    t = _rt("type")
    route = _rt("route")
    network = _rt("network")
    ref = _rt("ref")

    is_path_major = (
        (t == "route") & route.isin(*_PATH_ROUTES) & network.isin(*_PATH_NETWORKS)
    )
    is_bus = (t == "route") & route.isin("bus", "trolleybus")

    path_zoom_chain = None
    for net, z in _PATH_ZOOMS.items():
        c = network == net
        path_zoom_chain = (
            F.when(c, F.lit(z)) if path_zoom_chain is None else path_zoom_chain.when(c, F.lit(z))
        )
    path_zoom = F.when(is_path_major, F.coalesce(path_zoom_chain, F.lit(20.0)))

    def net_count(net: str) -> Column:
        return F.sum(F.when(is_path_major & (network == net), 1).otherwise(0)).alias(
            f"__n_{net}"
        )

    # mz_networks triple, NULL for non-qualifying relations
    # (route != '' and (network != '' or ref != ''), ref:functions.go:318-321)
    triple = F.when(
        (route != "") & ((network != "") | (ref != "")),
        F.struct(
            F.col("relation_id").alias("rel_id"),
            route.alias("route"),
            network.alias("network"),
            ref.alias("ref"),
        ),
    )

    agg = (
        relation_members.groupBy("member_type", "member_id")
        .agg(
            F.max(is_bus).alias("__is_bus"),
            *[net_count(n) for n in _PATH_NETWORKS],
            F.min(path_zoom).alias("path_major_route_min_zoom"),
            F.sort_array(F.collect_list(triple)).alias("__triples"),
        )
    )
    # strip the rel_id sort key; empty list -> NULL (reference returns
    # nil when no relations qualify, ref:functions.go:311-313... actually
    # nil only when NO member relations at all; [] when none qualify --
    # but an empty []string is falsy everywhere it is consumed, and the
    # `col: mz_networks` output drops empty values, so NULL is faithful)
    triples = F.transform(
        F.col("__triples"),
        lambda s: F.struct(
            s["route"].alias("route"), s["network"].alias("network"), s["ref"].alias("ref")
        ),
    )
    return agg.withColumn(
        "mz_networks", F.when(F.size(F.col("__triples")) > 0, triples)
    ).drop("__triples")


def way_membership_summary(way_nodes: DataFrame) -> DataFrame:
    """Per-node max gate zoom over containing ways
    (ref:filter/functions.go:120-159). The reference skips untagged
    member nodes when building the index (ref:process.go:283-287);
    untagged nodes never reach rule evaluation, so the summary is only
    ever joined against tagged nodes and the skip is implicit."""
    hw = F.coalesce(F.element_at(F.col("way_tags"), F.lit("highway")), F.lit(""))
    z = (
        F.when(hw.isin(*_GATE_Z14), F.lit(14.0))
        .when(hw.isin(*_GATE_Z15), F.lit(15.0))
        .when(hw.isin(*_GATE_Z16), F.lit(16.0))
        .otherwise(F.lit(17.0))
    )
    return way_nodes.groupBy("node_id").agg(F.max(z).alias("gate_min_zoom"))


def _tag(key: str) -> Column:
    return F.coalesce(F.element_at(F.col("tags"), F.lit(key)), F.lit(""))


def _cycling_network_col() -> Column:
    """mz_cycling_network: icn tag short-circuit, then relation counts
    interleaved with tag fallbacks in strict priority order
    (ref:filter/functions.go:231-296)."""
    def n(net: str) -> Column:
        return F.coalesce(F.col(f"__n_{net}"), F.lit(0)) > 0

    def tag_fallback(net: str) -> Column:
        return (_tag(net) == "yes") | (_tag(f"{net}_ref") != "")

    return (
        F.when(tag_fallback("icn"), "icn")
        .when(n("icn"), "icn")
        .when(n("ncn"), "ncn")
        .when(tag_fallback("ncn"), "ncn")
        .when(n("rcn"), "rcn")
        .when(tag_fallback("rcn"), "rcn")
        .when(n("lcn"), "lcn")
        .when(tag_fallback("lcn"), "lcn")
    )


def _hiking_network_col() -> Column:
    """mz_hiking_network: pure relation-count hierarchy, no tag
    fallbacks (ref:filter/functions.go:182-229)."""
    def n(net: str) -> Column:
        return F.coalesce(F.col(f"__n_{net}"), F.lit(0)) > 0

    return (
        F.when(n("iwn"), "iwn").when(n("nwn"), "nwn").when(n("rwn"), "rwn").when(n("lwn"), "lwn")
    )


def with_membership_columns(
    elements: DataFrame,
    relation_members: DataFrame | None = None,
    way_nodes: DataFrame | None = None,
    broadcast: bool = True,
) -> DataFrame:
    """Left-join membership summaries onto the elements table and
    compute the final derived columns. Joins key on
    (element_type, element_id); node-only gate zoom keys on element_id.
    """
    out = elements
    if relation_members is not None:
        summary = relation_membership_summary(relation_members)
        if broadcast:
            summary = F.broadcast(summary)
        out = out.join(
            summary,
            (out["element_type"] == summary["member_type"])
            & (out["element_id"] == summary["member_id"]),
            "left",
        ).drop("member_type", "member_id")
        out = (
            out.withColumn("is_bus_route", F.when(F.col("__is_bus"), F.lit(True)))
            .withColumn("mz_cycling_network", _cycling_network_col())
            .withColumn("mz_hiking_network", _hiking_network_col())
            .withColumn(
                "path_major_route_min_zoom",
                F.coalesce(F.col("path_major_route_min_zoom"), F.lit(20.0)),
            )
        )
        out = out.drop("__is_bus", *[f"__n_{n}" for n in _PATH_NETWORKS])
    if way_nodes is not None:
        summary = way_membership_summary(way_nodes)
        if broadcast:
            summary = F.broadcast(summary)
        out = out.join(
            summary,
            (out["element_type"] == F.lit("node")) & (out["element_id"] == summary["node_id"]),
            "left",
        ).drop("node_id")
        out = out.withColumn("gate_min_zoom", F.coalesce(F.col("gate_min_zoom"), F.lit(17.0)))
    return out
