"""Single-pass multi-layer evaluation: ONE scan, ONE projection for all
layers' rule matching + transforms.

The naive plan (evaluate each layer as its own branch of a union)
re-reads and re-derives the source once per layer plus once per
cross-layer join side — 7 scans for 5 layers. At 100 TB the scan IS
the cost, so this module folds the whole per-feature pipeline into a
single pass:

  derived --> [per-layer match_idx columns]        (one projection)
          --> explode(candidate (layer, match, mz) entries)
          --> per-layer emit/transform expressions, assembled as
              when(zen_layer == L, ...) chains      (same projection)

Per-feature transforms participate as *expression rewrites* over each
layer's emit dict (pipeline.transforms), so they add zero passes. An
element matching k layers produces k rows via the explode — exactly
the reference's semantics (an element may appear in multiple layers,
ref:README.md:229).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osmzen_spark.compiler.context import EvalContext
from osmzen_spark.compiler.expressions import compile_expression, compile_num_expression
from osmzen_spark.compiler.loader import CompiledConfig
from osmzen_spark.pipeline.transforms import apply_transforms_props

# passthrough/meta columns every output row carries (geometry/geom_type
# are per-layer props because make_representative_point rewrites them)
META_KEYS = ("geometry", "geom_type", "clon", "clat")


def eval_all_layers_single_pass(
    derived: DataFrame,
    config: CompiledConfig,
    zoom: int,
    layer_names: list[str] | None = None,
    derived_extra: dict[str, Column] | None = None,
) -> DataFrame:
    names = layer_names or list(config.layers)
    base_derived = {"area": F.col("area"), "length": F.col("length")}
    from osmzen_spark.pipeline.membership import MEMBERSHIP_COLS

    for mc in MEMBERSHIP_COLS:
        if mc in derived.columns:
            base_derived[mc] = F.col(mc)
    base_derived.update(derived_extra or {})
    ctx = EvalContext(tags="tags", geom_type="geom_type", derived=base_derived, zoom=zoom)

    # ---- global expression hoisting (shared across layers) -------------
    hoisted: dict[str, tuple[str, Column]] = {}

    def hoist(kind: str, node) -> str:
        key = f"{kind}:{node!r}"
        if key not in hoisted:
            col = compile_num_expression(node, ctx) if kind == "num" else compile_expression(node, ctx)
            hoisted[key] = (f"__x{len(hoisted)}", col)
        return hoisted[key][0]

    # ---- per-layer match columns + candidate entries --------------------
    mi_cols: dict[str, Column] = {}
    entries = []
    for name in names:
        layer = config.layers[name]
        gate = F.col("geom_type").isin(*layer.geometry_types)
        mi_cols[f"__mi_{name}"] = F.when(gate, layer.match_idx_col(ctx))
        for rule in layer.rules:
            if rule.min_zoom is not None:
                hoist("num", rule.min_zoom)
            for node in rule.emit.values():
                hoist("out", node)

    out = derived.withColumns({n: c for n, c in hoisted.values()} | mi_cols)

    for name in names:
        layer = config.layers[name]
        mi = F.col(f"__mi_{name}")
        mz = layer.min_zoom_col(hoist, mi)
        entries.append(
            F.struct(F.lit(name).alias("layer"), mi.alias("mi"), mz.alias("mz"))
        )

    keep = F.filter(
        F.array(*entries),
        lambda e: e["mi"].isNotNull()
        & e["mz"].isNotNull()
        & (F.lit(float(zoom + 1)) >= e["mz"]),  # gate (ref:process.go:199-203)
    )
    out = out.withColumn("__e", F.explode(keep))
    out = out.withColumns(
        {
            "zen_layer": F.col("__e.layer"),
            "match_idx": F.col("__e.mi"),
            # floor to 2dp (ref:process.go:207)
            "min_zoom": F.floor(F.col("__e.mz") * 100) / 100.0,
        }
    )

    # ---- per-layer emit dicts + transforms, assembled by zen_layer -----
    per_layer_props: dict[str, dict[str, Column]] = {}
    for name in names:
        layer = config.layers[name]
        mi = F.col(f"__mi_{name}")
        props: dict[str, Column] = {}
        for key in layer.output_keys:
            if key == "min_zoom":
                continue
            props[key] = layer.output_col(key, hoist, mi)
        # meta available to transforms
        props["type"] = F.col("element_type")
        props["id"] = F.when(
            F.col("element_type") == "relation", -F.col("element_id")
        ).otherwise(F.col("element_id"))
        for mk in META_KEYS:
            props[mk] = F.col(mk)
        apply_transforms_props(props, layer.transforms, ctx, zoom)
        per_layer_props[name] = props

    all_keys: dict[str, None] = {}
    for props in per_layer_props.values():
        for k in props:
            all_keys[k] = None

    final_cols: dict[str, Column] = {}
    for key in all_keys:
        chain = None
        for name in names:
            col = per_layer_props[name].get(key)
            if col is None:
                continue
            cond = F.col("zen_layer") == name
            chain = F.when(cond, col) if chain is None else chain.when(cond, col)
        final_cols[key] = chain

    passthrough = [
        c
        for c in ("element_id", "element_type", "tags", "length", "lon", "lat")
        if c in derived.columns
    ]
    select_cols = (
        [F.col("zen_layer"), F.col("min_zoom"), F.col("match_idx")]
        + [col.alias(k) for k, col in final_cols.items()]
        + [F.col(c) for c in passthrough]
    )
    return out.select(*select_cols)


def split_layers(union_df: DataFrame, names: list[str]) -> dict[str, DataFrame]:
    """Per-layer views over the (ideally persisted) single-pass output."""
    return {name: union_df.filter(F.col("zen_layer") == name) for name in names}
