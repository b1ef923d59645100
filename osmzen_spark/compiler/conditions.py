"""Condition (predicate) compiler: YAML condition tree -> Spark Column.

Operator semantics follow ref:filter/conditions.go:26-37 (registry) —
see SURVEY.md §2.B. Catalyst short-circuits the generated boolean
expressions, replacing the reference's interpreter-level short-circuit.
"""

from __future__ import annotations

import functools
import math
import operator

from pyspark.sql import Column
from pyspark.sql import functions as F

from osmzen_spark.compiler.context import EvalContext

# GeoJSON-type expansion (ref:filter/conditions.go:278-286)
_GEOM_EXPAND = {
    "point": ["Point", "MultiPoint"],
    "multipoint": ["MultiPoint"],
    "line": ["LineString", "MultiLineString"],
    "linestring": ["LineString", "MultiLineString"],
    "multilinestring": ["MultiLineString"],
    "polygon": ["Polygon", "MultiPolygon"],
    "multipolygon": ["MultiPolygon"],
}

_COMPARE_OPS = {
    "lt": operator.lt,
    "gt": operator.gt,
    "lte": operator.le,
    "gte": operator.ge,
}


def _and_all(cols: list[Column]) -> Column:
    return functools.reduce(operator.and_, cols)


def _or_all(cols: list[Column]) -> Column:
    return functools.reduce(operator.or_, cols)


def _min_max_range(value: Column, spec) -> Column:
    """{min: a, max: b} range with +-inf defaults
    (ref:filter/conditions.go:363-406)."""
    if not isinstance(spec, dict):
        raise ValueError(f"range condition requires a min/max map, got {spec!r}")
    lo = float(spec.get("min", -math.inf))
    hi = float(spec.get("max", math.inf))
    conds = []
    if lo != -math.inf:
        conds.append(value >= F.lit(lo))
    if hi != math.inf:
        conds.append(value <= F.lit(hi))
    if not conds:
        return F.lit(True)
    return _and_all(conds)


def compile_condition(node, ctx: EvalContext) -> Column:
    """Compile a condition node (map / list-of-maps) to a boolean Column."""
    if isinstance(node, list):
        return _and_all([compile_condition(n, ctx) for n in node])
    if not isinstance(node, dict):
        raise ValueError(f"condition must be map or list, got {node!r}")
    if not node:
        return F.lit(True)

    parts = []
    for key, val in node.items():
        parts.append(_compile_entry(key, val, ctx))
    return _and_all(parts)


def _compile_entry(key: str, val, ctx: EvalContext) -> Column:
    from osmzen_spark.compiler.expressions import compile_num_expression

    if key == "all":
        items = val if isinstance(val, list) else [val]
        return _and_all([compile_condition(v, ctx) for v in items])
    if key == "any":
        if isinstance(val, list):
            return _or_all([compile_condition(v, ctx) for v in val])
        # map form: OR across entries (ref:filter/conditions.go:139-195)
        return _or_all([_compile_entry(k, v, ctx) for k, v in val.items()])
    if key == "not":
        return ~compile_condition(val, ctx)
    if key == "none":
        items = val if isinstance(val, list) else [val]
        return ~_or_all([compile_condition(v, ctx) for v in items])
    if key == "osm_tags":
        # evaluate against original OSM tags (ref:conditions.go:230-252);
        # identical during layer eval, distinct in post-process `where`s
        osm_ctx = ctx.with_tags(ctx.derived.get("osm_tags", ctx.tags))
        return compile_condition(val, osm_ctx)
    if key in ("geometry_types", "geom_type"):
        names = val if isinstance(val, list) else [val]
        expanded: list[str] = []
        for n in names:
            expanded.extend(_GEOM_EXPAND.get(str(n).lower(), [str(n)]))
        return ctx.geom_type.isin(*sorted(set(expanded)))
    if key == "way_area":
        return _min_max_range(ctx.area(), val)
    if key == "volume":
        return _min_max_range(ctx.volume(), val)
    if key == "compare":
        lhs, op, rhs = val
        if op not in _COMPARE_OPS:
            raise ValueError(f"unknown compare op: {op}")
        return _COMPARE_OPS[op](
            compile_num_expression(lhs, ctx), compile_num_expression(rhs, ctx)
        )
    if key == "way":
        # legacy, explicitly ignored (ref:filter/conditions.go:13-15)
        return F.lit(True)

    # plain tag conditions
    if isinstance(val, bool):
        # presence test (ref:conditions.go:512-521)
        return ctx.tag_present(key) == F.lit(val)
    if isinstance(val, list):
        # membership; compile-time lowercased values (ref:conditions.go:499).
        # A YAML null entry means "missing/empty tag matches" — same as
        # the Arrow path (vectorized.py inlist), NOT the string "none".
        lowered = ["" if v is None else str(v).lower() for v in val]
        return ctx.tag_str(key).isin(*lowered)
    # exact match; Go map-miss yields "" (ref:conditions.go:466-473);
    # YAML null compares as the empty string, mirroring that rule
    return ctx.tag_str(key) == F.lit("" if val is None else str(val))
