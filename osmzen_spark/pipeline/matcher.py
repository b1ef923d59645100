"""Ordered CSV decision tables -> first-match `when` chains
(the reference's sort_rank / scale_rank spreadsheet matcher,
ref:matcher/matcher.go:13-293; SURVEY.md §2.G csv_match_properties).

Cell language (ref:matcher/matcher.go:122-170):
  *        any value (incl. absent)
  -        absent (nil)
  +        present (not nil)
  true     boolean true
  a;b;c    string set membership
  >=x <=x >x <x   numeric comparison (absent -> no match)
  <number> exact numeric (or string-form) match
  <text>   exact string match
  (empty)  exact match against "" — faithfully reproducing the Go
           port, where an empty cell compiles to exactCell("") and in
           practice never matches (properties are nil or non-empty)

Header `col::type` suffixes are display-only; `zoom` is a pseudo-column
bound to the tile zoom (ref:matcher/matcher.go:55-58). The whole table
compiles to ONE generated when-chain per layer — first-match preserved
by chain order, evaluated entirely in whole-stage codegen.
"""

from __future__ import annotations

import csv
import io

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cell_to_pred(cell: str, prop: Column, is_numeric: bool) -> Column | None:
    """None means 'always true' (no constraint)."""
    if cell == "*":
        return None
    if cell == "-":
        return prop.isNull()
    if cell == "+":
        return prop.isNotNull()
    if cell == "true":
        return prop.cast("boolean") == F.lit(True)
    if ";" in cell:
        return prop.cast("string").isin(*cell.split(";"))
    for op in (">=", "<=", ">", "<"):
        if cell.startswith(op):
            v = F.lit(float(cell[len(op):]))
            p = prop.cast("double")
            return {"<": p < v, ">": p > v, "<=": p <= v, ">=": p >= v}[op]
    try:
        num = float(cell)
    except ValueError:
        return prop.cast("string") == F.lit(cell)
    if is_numeric:
        return prop.cast("double") == F.lit(num)
    # exactFloat64Cell also matches the original string form
    return (prop.cast("double") == F.lit(num)) | (prop.cast("string") == F.lit(cell))


class CSVMatcher:
    """Compiled decision table; apply() adds/overwrites the output column
    on first match, leaves it NULL (property untouched) otherwise."""

    def __init__(self, headers: list[str], rows: list[list[str]]):
        self.output_key = headers[-1].split("::")[0]
        self.props = [h.split("::")[0] for h in headers[:-1]]
        self.rows = rows

    @classmethod
    def from_text(cls, text: str) -> "CSVMatcher":
        records = list(csv.reader(io.StringIO(text)))
        return cls(records[0], records[1:])

    @classmethod
    def from_path(cls, path: str) -> "CSVMatcher":
        from osmzen_spark.confio import read_text

        if path.endswith((".yaml", ".yml")):
            import yaml

            doc = yaml.safe_load(read_text(path))
            return cls([str(c) for c in doc["columns"]], [[str(x) for x in r] for r in doc["rows"]])
        return cls.from_text(read_text(path))

    def value_col(self, df: DataFrame, zoom: int) -> Column:
        dtypes = dict(df.dtypes)

        def prop_col(name: str) -> tuple[Column, bool]:
            if name == "zoom":
                return F.lit(float(zoom)), True
            if name not in df.columns:
                return F.lit(None), False
            return F.col(name), dtypes.get(name) in ("double", "float", "int", "bigint", "smallint")

        chain = None
        for row in self.rows:
            preds = []
            for cell, prop_name in zip(row[:-1], self.props):
                col, is_num = prop_col(prop_name)
                p = _cell_to_pred(cell, col, is_num)
                if p is not None:
                    preds.append(p)
            cond = F.lit(True)
            for p in preds:
                cond = cond & p
            value = F.lit(float(row[-1]))
            chain = F.when(cond, value) if chain is None else chain.when(cond, value)
        return chain if chain is not None else F.lit(None).cast("double")

    def apply(self, df: DataFrame, zoom: int) -> DataFrame:
        matched = self.value_col(df, zoom)
        if self.output_key in df.columns:
            matched = F.coalesce(matched, F.col(self.output_key))
        return df.withColumn(self.output_key, matched)
