"""PII redaction and text canonicalization — the scrub/normalize
stages of a training-data pipeline.

Both operators are pure Column projections (regexp_replace /
regexp_count chains): no shuffle, no UDF, fully scan-fused and
whole-stage-codegen'd, so they are free at 100 TB relative to the
scan itself and compose with filter/column pushdown.

Regex dialect: every pattern here is written in the common subset of
Java regex (Spark) and RE2 (DuckDB) — character classes, bounded
repetition, grouping; no backreferences, no lookaround — so a DuckDB
oracle re-derives the redaction byte-for-byte (DuckDB needs the 'g'
flag to match Spark's replace-all default).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: emails go first (they may contain dots/digits that the
# looser patterns would chew on), then IPs, then phone shapes.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"([0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
    ("phone", r"[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
]


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "redacted",
    patterns: list[tuple[str, str, str]] | None = None,
) -> DataFrame:
    """Replace PII-shaped spans with typed placeholders and count each
    kind (counted on the ORIGINAL text, before any replacement eats a
    later pattern's matches). Adds `n_<kind>` per pattern + `out_col`.
    """
    pats = PII_PATTERNS if patterns is None else patterns
    t = F.col(text_col)
    out = df
    for kind, pat, _repl in pats:
        out = out.withColumn(f"n_{kind}", F.regexp_count(t, F.lit(pat)).cast("long"))
    red = t
    for _kind, pat, repl in pats:
        red = F.regexp_replace(red, pat, repl)
    return out.withColumn(out_col, red)


def normalize_text_col(text: Column) -> Column:
    """Canonical text form: lowercase, runs of spaces collapsed,
    leading/trailing space stripped. The class is literal '[ ]+' (not
    \\s+) so Java's and RE2's slightly different \\s definitions can't
    diverge; real corpora normalize tabs/newlines upstream at ingest.
    """
    return F.lower(F.trim(F.regexp_replace(text, "[ ]+", " ")))
