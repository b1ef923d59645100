"""Collision ranking (ref:postprocess/functions.go:210-269 +
ref:ranker/ranker.go + ref:ranker/condition.go).

The rank table (config/ranks/collision_rank.yaml, explicit-rank
re-encoding of the reference's positional YAML — see
scripts/port_collision_ranks.py) hashes matchers by (layer, kind);
within a group, first match wins; a feature whose kind has NO group in
its layer gets the catch-all (even if kind-less matchers exist for the
layer — a faithful quirk of ref:ranker/ranker.go:100-105).

Compiled per layer into one generated when-chain over (kind, predicate)
pairs — the table is broadcast inside the plan as literals; no join, no
shuffle.
"""

from __future__ import annotations

import yaml

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ref:postprocess/functions.go:632-664
_NAME_ALTERNATES = (
    "int_name",
    "loc_name",
    "nat_name",
    "official_name",
    "old_name",
    "reg_name",
    "short_name",
    "name_left",
    "name_right",
    "name:short",
)


def key_is_name(key: str) -> bool:
    if key == "name" or key.startswith("name:"):
        return True
    return any(key.startswith(alt) for alt in _NAME_ALTERNATES)


def _eq_cond(df: DataFrame, key: str, val) -> Column:
    """ranker eqCond: vals[key] == val; missing property -> no match
    (ref:ranker/condition.go:48-56). Numeric comparison is loose
    (int/double) since our property columns are typed."""
    if key not in df.columns:
        return F.lit(val is None)
    col = F.col(key)
    if isinstance(val, bool):
        return F.coalesce(col.cast("boolean") == F.lit(val), F.lit(False))
    if isinstance(val, (int, float)):
        return F.coalesce(col.cast("double") == F.lit(float(val)), F.lit(False))
    if val is None:
        return col.isNull()
    return F.coalesce(col.cast("string") == F.lit(str(val)), F.lit(False))


def _compile_when(df: DataFrame, node: dict) -> Column:
    conds = []
    for key, val in node.items():
        if key == "not":
            conds.append(~_compile_when(df, val))
        else:
            conds.append(_eq_cond(df, key, val))
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


class CollisionRanker:
    def __init__(self, doc: dict):
        self.catch_all = int(doc.get("catch_all", 0))
        # groups[layer][kind] = ordered [(when-dict-or-None, rank)]
        self.groups: dict[str, dict[str, list[tuple[dict | None, int]]]] = {}
        for e in doc.get("entries", []):
            layer = e["layer"]
            kind = e.get("kind", "") or ""
            self.groups.setdefault(layer, {}).setdefault(kind, []).append(
                (e.get("when"), int(e["rank"]))
            )

    @classmethod
    def from_path(cls, path: str) -> "CollisionRanker":
        from osmzen_spark.confio import read_text

        return cls(yaml.safe_load(read_text(path)))

    def rank_col(self, layer_name: str, df: DataFrame) -> Column:
        groups = self.groups.get(layer_name)
        if not groups:
            return F.lit(self.catch_all)
        kind_col = (
            F.coalesce(F.col("kind").cast("string"), F.lit(""))
            if "kind" in df.columns
            else F.lit("")
        )
        nokind = groups.get("", [])
        chain: Column | None = None
        for kind_key, ms in groups.items():
            seq = ms + nokind if kind_key != "" else ms
            kc = kind_col == F.lit(kind_key)
            for when_node, rank in seq:
                cond = kc if when_node is None else (kc & _compile_when(df, when_node))
                chain = (
                    F.when(cond, F.lit(rank)) if chain is None else chain.when(cond, F.lit(rank))
                )
        if chain is None:
            return F.lit(self.catch_all)
        return F.coalesce(chain, F.lit(self.catch_all))


def add_collision_rank(layers: dict[str, DataFrame], zoom: int, params) -> dict:
    """Hard-coded where gate (ref:postprocess/functions.go:218-240):
    pois layer, name-like property present, or ref/shield_text
    present."""
    ranker: CollisionRanker = params["ranker"]
    out = dict(layers)
    shield_cols = (
        "ref",
        "shield_text",
        "bicycle_shield_text",
        "bus_shield_text",
        "walking_shield_text",
    )
    for name, df in layers.items():
        add = F.lit(name == "pois")
        for c in df.columns:
            if key_is_name(c) or c in shield_cols:
                add = add | F.col(c).isNotNull()
        out[name] = df.withColumn(
            "collision_rank", F.when(add, ranker.rank_col(name, df)).cast("int")
        )
    return out
