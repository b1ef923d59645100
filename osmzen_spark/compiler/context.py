"""Evaluation context: maps the rule language's value references onto
Spark Columns.

The reference evaluates rules against a per-feature ``filter.Context``
(tags + cached derived scalars, ref:filter/context.go:15-41). Here the
context is a set of *columns*: derived values are computed once per
DataFrame (Catalyst reuses common subexpressions), so each of the
hundreds of rule predicates references the same column.

NULL semantics: a Go map miss yields "" (ref:filter/conditions.go:471),
while the expression language's ``col:`` yields nil for missing/empty
(ref:filter/expressions.go:134-183). Hence ``tag_str`` (comparison
form, NULL->'') vs ``tag`` (value form, ''->NULL).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

# min_zoom(area) constants -- ref:filter/context.go:154-181
_MZ_MAX_AREA_ZOOM = 16.0
_MZ_AREA_CUTOFF = 5.704
_MZ_C = 17.256
_LN4 = math.log(4.0)


class EvalContext:
    """Column bindings for one evaluation pass.

    tags      -- map<string,string> column of OSM tags
    geom_type -- string column (GeoJSON type names)
    derived   -- name -> Column for precomputed values (area, length,
                 height, plus optional membership-join results like
                 is_bus_route); missing entries fall back to NULL.
    zoom      -- the tile zoom being built (int), for the `zoom`
                 pseudo-column gate math done by callers.
    """

    def __init__(
        self,
        tags: Column | str = "tags",
        geom_type: Column | str = "geom_type",
        derived: dict[str, Column] | None = None,
        zoom: int = 20,
    ):
        self.tags = F.col(tags) if isinstance(tags, str) else tags
        self.geom_type = F.col(geom_type) if isinstance(geom_type, str) else geom_type
        self.derived = dict(derived or {})
        self.zoom = zoom

    def with_tags(self, tags: Column) -> "EvalContext":
        return EvalContext(tags, self.geom_type, self.derived, self.zoom)

    # -- tag access ------------------------------------------------------
    def tag(self, key: str) -> Column:
        """Value form: missing or empty -> NULL (ref:expressions.go:160-171)."""
        return F.nullif(F.element_at(self.tags, F.lit(key)), F.lit(""))

    def tag_str(self, key: str) -> Column:
        """Comparison form: missing -> '' (Go map-miss semantics)."""
        return F.coalesce(F.element_at(self.tags, F.lit(key)), F.lit(""))

    def tag_present(self, key: str) -> Column:
        return F.map_contains_key(self.tags, F.lit(key))

    # -- derived / pseudo columns ---------------------------------------
    def area(self) -> Column:
        return self.derived.get("area", F.lit(None).cast("double"))

    def length(self) -> Column:
        return self.derived.get("length", F.lit(None).cast("double"))

    def height(self) -> Column:
        """floor(buildingHeight + 0.5) -- ref:filter/context.go:146-148."""
        if "height" in self.derived:
            return self.derived["height"]
        return F.floor(self.building_height_raw() + F.lit(0.5)).cast("double")

    def building_height_raw(self) -> Column:
        """ref:util/utils.go + filter/functions.go:606-634:
        height tag: meters-parse else 1e10; elif levels: plain-float
        parse -> max(l,1)*3+2 else 1e10; else 0."""
        from osmzen_spark.compiler.functions import to_float_meters_col

        height = self.tag_str("height")
        levels = self.tag_str("building:levels")
        levels_f = F.trim(levels).try_cast("double")
        return (
            F.when(height != "", F.coalesce(to_float_meters_col(height), F.lit(1.0e10)))
            .when(
                levels != "",
                # NB greatest() skips NULLs in Spark, so guard the
                # unparseable-levels case explicitly (-> 1e10)
                F.when(levels_f.isNotNull(), F.greatest(levels_f, F.lit(1.0)) * 3 + 2).otherwise(
                    F.lit(1.0e10)
                ),
            )
            .otherwise(F.lit(0.0))
        )

    def volume(self) -> Column:
        """height * area (condition form, ref:filter/conditions.go:343-358)."""
        return self.height() * self.area()

    def zoom_pseudo(self) -> Column:
        """The `{col: zoom}` pseudo-column: min zoom from mercator area
        (ref:filter/context.go:154-181)."""
        a = self.area()
        formula = F.floor((F.lit(_MZ_C) - F.log(a) / F.lit(_LN4)) * 100) / 100.0
        return F.when(
            a < F.lit(_MZ_AREA_CUTOFF), F.lit(_MZ_MAX_AREA_ZOOM)
        ).otherwise(F.least(formula, F.lit(_MZ_MAX_AREA_ZOOM)))

    def pseudo(self, name: str) -> Column | None:
        """Pseudo-columns dispatched by `col:` (ref:expressions.go:146-159).

        Returns None if `name` is a plain tag lookup.
        """
        if name == "height":
            # output form: 0 -> nil (ref:expressions.go:118-124); numeric
            # contexts use .height() directly
            return F.nullif(self.height(), F.lit(0.0))
        if name == "zoom":
            return self.zoom_pseudo()
        if name in ("area", "way_area"):
            return self.area()
        if name == "volume":
            return self.volume()
        if name == "mz_is_building":
            from osmzen_spark.compiler.functions import is_building_col

            return is_building_col(self)
        if name in ("is_bus_route", "mz_cycling_network", "mz_networks", "mz_hiking_network"):
            # membership-join results; provided by pipeline pre-join
            # stages when configured, NULL otherwise
            return self.derived.get(name, F.lit(None))
        if name in ("mz_transit_score", "mz_transit_root_relation_id"):
            return F.lit(None)  # explicit nils (ref:expressions.go:156-158)
        if name in ("mz_label_placement", "mz_n_photos"):
            return None  # plain tag lookups (ref:expressions.go:175-180)
        if name.startswith("mz_"):
            raise ValueError(f"unknown pseudo-column: {name}")
        return None
