"""Layer evaluation via the Arrow-batch vectorized compiler
(compiler/vectorized.py) — ONE mapInArrow stage per layer instead of a
megabyte Catalyst expression tree.

Pipeline inside the mapper (all NumPy, no per-row Python):
  1. geometry-type gate (np.isin)
  2. first-match: per-rule predicate over still-unmatched rows
     (vectorized; early-exits when every row is matched)
  3. min_zoom: distinct expression nodes evaluated once (hoisting),
     selected per row by match_idx; nil-skip + zoom gate + 2dp floor
     (ref:process.go:192-207)
  4. emits: distinct expression nodes evaluated once, masked-assigned
     into typed output arrays

Array-typed emits (mz_networks passthrough) can't be built in NumPy;
they are added by a tiny Catalyst `when(match_idx.isin(...))` after the
Arrow stage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from osmzen_spark.compiler.vectorized import (
    BatchContext,
    compile_condition_np,
    compile_num_np,
    compile_value_np,
)

# ---------------------------------------------------------------------------
# output type inference
# ---------------------------------------------------------------------------

_NUM_FUNCS = {
    "util.safe_int",
    "mz_to_float_meters",
    "mz_calculate_ferry_level",
    "mz_get_min_zoom_highway_level_gate",
    "mz_calculate_path_major_route",
    "tz_estimate_parking_capacity",
    "tz_looks_like_service_area",
    "tz_looks_like_rest_area",
}
_BOOL_FUNCS = {"util.tag_str_to_bool", "util.true_or_none", "util.is_building",
               "mz_calculate_is_building_or_part", "mz_calculate_is_bus_route"}
_STR_FUNCS = {"mz_building_kind_detail", "mz_building_part_kind_detail",
              "mz_cycling_network", "mz_hiking_network"}
_NUM_PSEUDO = {"zoom", "area", "way_area", "volume", "height"}


def infer_type(node) -> str:
    """'double' | 'boolean' | 'string' | 'networks' | 'null'."""
    if node is None or node == "":
        return "null"
    if isinstance(node, bool):
        return "boolean"
    if isinstance(node, (int, float)):
        return "double"
    if isinstance(node, str):
        return "string"
    if isinstance(node, dict) and len(node) == 1:
        (op, val), = node.items()
        if op == "col":
            if val in _NUM_PSEUDO:
                return "double"
            if val == "mz_is_building" or val == "is_bus_route":
                return "boolean"
            if val == "mz_networks":
                return "networks"
            return "string"
        if op == "call":
            f = val["func"]
            if f in _NUM_FUNCS:
                return "double"
            if f in _BOOL_FUNCS:
                return "boolean"
            if f == "mz_get_rel_networks":
                return "networks"
            return "string"
        if op == "case":
            ts = set()
            for e in val:
                ts.add(infer_type(e.get("then") if "when" in e else e.get("else")))
            return merge_types(ts)
        if op in ("clamp", "min", "max", "sum", "mul"):
            return "double"
        if op == "cond":
            return "boolean"
        if op == "lookup":
            ts = {infer_type(t) for t, _ in val["table"]}
            ts.add(infer_type(val.get("default")))
            return merge_types(ts)
    return "string"


def merge_types(ts: set[str]) -> str:
    ts = {t for t in ts if t != "null"}
    if not ts:
        return "null"
    if len(ts) == 1:
        return next(iter(ts))
    if ts == {"double", "boolean"}:
        return "string"
    return "string"


_SPARK_TYPES = {
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "string": T.StringType(),
    "null": T.StringType(),
}
_ARROW_TYPES = {
    "double": pa.float64(),
    "boolean": pa.bool_(),
    "string": pa.string(),
    "null": pa.string(),
}


def _coerce_to_arrow(obj_arr: np.ndarray, typ: str) -> pa.Array:
    """object ndarray -> typed Arrow array (vectorized; the slow
    per-element stringify path only runs when a column actually mixes
    types, which the YAML essentially never does)."""
    import pandas as pd

    if typ == "double":
        vals = pd.to_numeric(pd.Series(obj_arr, dtype=object), errors="coerce").to_numpy(
            dtype=np.float64
        )
        return pa.array(vals, type=pa.float64(), from_pandas=True)  # NaN -> null
    if typ == "boolean":
        return pa.array(obj_arr, type=pa.bool_(), from_pandas=True)
    try:
        return pa.array(obj_arr, type=pa.string(), from_pandas=True)
    except (pa.ArrowInvalid, pa.ArrowTypeError):
        out = []
        for x in obj_arr:
            if x is None:
                out.append(None)
            elif isinstance(x, str):
                out.append(x)
            elif isinstance(x, bool):
                out.append("true" if x else "false")
            elif isinstance(x, float) and x == int(x):
                out.append(str(int(x)))
            else:
                out.append(str(x))
        return pa.array(out, type=pa.string())


# ---------------------------------------------------------------------------
# layer compilation (driver-side, cached on the CompiledLayer)
# ---------------------------------------------------------------------------


class ArrowLayerPlan:
    def __init__(self, layer):
        from osmzen_spark.compiler.errors import rule_compile

        lname = getattr(layer, "name", "?")
        keys: set[str] = set()
        self.preds = [
            rule_compile(lname, i, "when", r.when, lambda r=r: compile_condition_np(r.when, keys))
            for i, r in enumerate(layer.rules)
        ]

        # hoist distinct min_zoom nodes
        self.mz_of_rule = np.full(len(layer.rules), -1, dtype=np.int64)
        self.mz_fns = []
        mz_ids: dict[str, int] = {}
        for i, r in enumerate(layer.rules):
            if r.min_zoom is None:
                continue
            k = repr(r.min_zoom)
            if k not in mz_ids:
                mz_ids[k] = len(self.mz_fns)
                self.mz_fns.append(
                    rule_compile(
                        lname, i, "min_zoom", r.min_zoom, lambda r=r: compile_num_np(r.min_zoom, keys)
                    )
                )
            self.mz_of_rule[i] = mz_ids[k]

        # hoist distinct emit nodes per output key (array types excluded)
        self.emit_keys: list[tuple[str, str]] = []  # (key, merged type)
        self.emit_plan: dict[str, list[tuple[np.ndarray, int]]] = {}
        self.emit_fns: dict[str, list] = {}
        self.network_keys: dict[str, list[int]] = {}  # key -> rule idxs (Catalyst post-step)
        for key in layer.output_keys:
            if key == "min_zoom":
                continue
            types = set()
            nodes: dict[str, tuple[int, object]] = {}
            rule_to_node = {}
            for i, r in enumerate(layer.rules):
                if key not in r.emit:
                    continue
                node = r.emit[key]
                t = infer_type(node)
                types.add(t)
                k = repr(node)
                if k not in nodes:
                    nodes[k] = (len(nodes), node)
                rule_to_node[i] = nodes[k][0]
            merged = merge_types(types)
            if merged == "networks":
                self.network_keys[key] = sorted(rule_to_node.keys())
                continue
            self.emit_keys.append((key, merged))
            self.emit_fns[key] = [
                rule_compile(
                    lname, None, f"emit.{key}", node, lambda node=node: compile_value_np(node, keys)
                )
                for _, node in sorted(nodes.values(), key=lambda x: x[0])
            ]
            m = np.full(len(layer.rules), -1, dtype=np.int64)
            for i, nid in rule_to_node.items():
                m[i] = nid
            self.emit_plan[key] = m
        self.needed_keys = sorted(keys)
        self.geometry_types = list(layer.geometry_types)


def evaluate_layer_arrow(layer, df: DataFrame, zoom: int) -> DataFrame:
    """Arrow-path equivalent of CompiledLayer.evaluate(); returns the
    same column shape (id/type/zen_layer/min_zoom/match_idx + emits +
    passthrough input columns)."""
    plan = getattr(layer, "_arrow_plan", None)
    if plan is None:
        plan = ArrowLayerPlan(layer)
        layer._arrow_plan = plan

    in_fields = list(df.schema.fields)
    out_schema = T.StructType(
        in_fields
        + [T.StructField("match_idx", T.IntegerType())]
        + [T.StructField("__emit_min_zoom", T.DoubleType())]
        + [T.StructField(f"__emit_{k}", _SPARK_TYPES[t]) for k, t in plan.emit_keys]
    )
    zoom_gate = float(zoom + 1)
    geometry_types = plan.geometry_types
    n_rules = len(plan.preds)

    def mapper(batches):
        for batch in batches:
            b = BatchContext(batch, plan.needed_keys, zoom)
            n = b.n
            if n == 0:
                continue
            gmask = np.isin(b.geom_type(), geometry_types)
            match = np.full(n, -1, dtype=np.int64)
            un = gmask.copy()
            for i, pred in enumerate(plan.preds):
                if not un.any():
                    break
                hit = un & pred(b)
                if hit.any():
                    match[hit] = i
                    un &= ~hit
            matched = match >= 0

            # min_zoom selection by hoisted node id
            mz = np.full(n, np.nan)
            mz_ok = np.zeros(n, bool)
            gids = plan.mz_of_rule[np.clip(match, 0, n_rules - 1)]
            gids = np.where(matched, gids, -1)
            for g in np.unique(gids):
                if g < 0:
                    continue
                rows = gids == g
                vals, ok = plan.mz_fns[g](b)
                mz[rows] = vals[rows]
                mz_ok[rows] = ok[rows]
            keep = matched & mz_ok & (zoom_gate >= mz)
            if not keep.any():
                continue
            mz = np.floor(mz * 100) / 100.0  # (ref:process.go:207)

            kept = np.nonzero(keep)[0]
            filtered = batch.filter(pa.array(keep))
            arrays = list(filtered.columns)
            names = list(batch.schema.names)
            arrays.append(pa.array(match[kept].astype(np.int32)))
            names.append("match_idx")
            arrays.append(pa.array(mz[kept], type=pa.float64()))
            names.append("__emit_min_zoom")

            for key, typ in plan.emit_keys:
                rule_map = plan.emit_plan[key]
                nids = rule_map[match[kept]]
                out = np.empty(len(kept), dtype=object)
                out[:] = None
                for g in np.unique(nids):
                    if g < 0:
                        continue
                    rows_local = nids == g
                    vals = plan.emit_fns[key][g](b)
                    out[rows_local] = vals[kept[rows_local]]
                arrays.append(_coerce_to_arrow(out, typ))
                names.append(f"__emit_{key}")
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    out = df.mapInArrow(mapper, schema=out_schema)

    # final shape identical to CompiledLayer.evaluate()
    out = out.withColumn(
        "id",
        F.when(F.col("element_type") == "relation", -F.col("element_id")).otherwise(
            F.col("element_id")
        ),
    )
    out = out.withColumn("type", F.col("element_type"))
    out = out.withColumn("zen_layer", F.lit(layer.name))

    emit_cols = {k for k, _ in plan.emit_keys}
    select = [
        F.col("id"), F.col("type"), F.col("zen_layer"),
        F.col("__emit_min_zoom").alias("min_zoom"), F.col("match_idx"),
    ]
    for k, _t in plan.emit_keys:
        select.append(F.col(f"__emit_{k}").alias(k))
    # array-typed passthrough emits (mz_networks)
    for k, rule_idxs in plan.network_keys.items():
        src = k if k in df.columns else None
        if src is None:
            # emitted from the membership column of the same name only
            select.append(F.lit(None).alias(k))
        else:
            cond = F.col("match_idx").isin(*rule_idxs)
            select.append(F.when(cond, F.col(src)).alias(f"__net_{k}"))
    meta = {"id", "type", "zen_layer", "min_zoom", "match_idx"}
    for c in df.columns:
        if c not in emit_cols and c not in meta and c not in plan.network_keys:
            select.append(F.col(c))
    out = out.select(*select)
    for k in plan.network_keys:
        if f"__net_{k}" in out.columns:
            out = out.withColumnRenamed(f"__net_{k}", k)
    return out
