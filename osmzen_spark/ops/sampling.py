"""Deterministic hash sampling and train/val/test split assignment.

A training-data pipeline needs splits that are (a) deterministic —
re-running the job, on any cluster size, assigns every document the
same split; (b) stable under corpus growth — adding documents never
moves an existing one between splits (no row_number, no
percent_rank: anything rank-based reshuffles everything on every
ingest); (c) key-based — all rows of one document (or one domain, one
URL) land in the same split, preventing train/test leakage through
near-identical siblings.

The standard construction is hash-bucketing the split key. We use
md5 (not xxhash64) as the hash: both Spark and DuckDB implement md5
with identical output, so the assignment is exactly re-derivable by
the oracle — and the first 8 hex chars give 2^32 buckets, plenty of
split resolution. Lowercase hex strings of equal length compare
lexicographically exactly like the numbers they encode, so the split
thresholds are string constants and the whole operator is one
codegen'd projection: no shuffle, no UDF, trivially 100 TB-safe
(it composes with partition pruning: `WHERE split = 'train'` prunes
at the scan when written partitioned-by-split).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hex_threshold(p: float) -> str:
    """p in [0,1] -> 8-char lowercase hex cut point in 2^32 space."""
    return format(min(int(p * 2**32), 2**32 - 1), "08x")


def _bucket_col(key: Column) -> Column:
    return F.substring(F.md5(key.cast("string")), 1, 8)


def hash_sample(df: DataFrame, rate: float, key_col: str) -> DataFrame:
    """Keep a deterministic `rate` fraction of rows by key hash."""
    if rate >= 1.0:
        # the clamped ceiling 'ffffffff' with strict '<' would drop
        # keys whose md5 prefix is exactly 'ffffffff' (~2^-32 of keys)
        return df
    return df.filter(_bucket_col(F.col(key_col)) < F.lit(_hex_threshold(rate)))


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float] | None = None,
    out_col: str = "split",
) -> DataFrame:
    """Add a split-assignment column from cumulative hash ranges.

    `splits` maps name -> weight (normalized; insertion order defines
    the ranges, so pass an ordered dict). Default 90/5/5
    train/val/test.
    """
    if splits is None:
        splits = {"train": 0.90, "val": 0.05, "test": 0.05}
    total = sum(splits.values())
    bucket = _bucket_col(F.col(key_col))
    expr = None
    acc = 0.0
    names = list(splits)
    for name in names[:-1]:
        acc += splits[name] / total
        cond = bucket < F.lit(_hex_threshold(acc))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    return df.withColumn(out_col, last if expr is None else expr.otherwise(last))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling — the dataset-mixing
    primitive ("keep 80% of en, 30% of de, drop the rest"). Each
    stratum gets its own md5-prefix cut point over the SAME key hash
    as hash_sample, so mixing decisions stay consistent with global
    samples/splits of the same key and re-runs are reproducible
    row-for-row (no RNG state, no sampleBy seed drift).

    Scale shape: a single codegen'd CASE over the stratum column —
    no shuffle, no per-stratum scans; the filter pushes to the scan
    when strata/keys are scan columns. Rates >= 1.0 short-circuit to
    TRUE so the 'ffffffff' prefix-collision edge cannot drop rows
    (same guard as hash_sample).
    """
    bucket = _bucket_col(F.col(key_col))
    expr = None
    for name in sorted(rates):
        rate = rates[name]
        keep = F.lit(True) if rate >= 1.0 else bucket < F.lit(_hex_threshold(rate))
        cond = F.col(strata_col) == name
        expr = F.when(cond, keep) if expr is None else expr.when(cond, keep)
    if default_rate >= 1.0:
        fallback = F.lit(True)
    elif default_rate <= 0.0:
        fallback = F.lit(False)
    else:
        fallback = bucket < F.lit(_hex_threshold(default_rate))
    return df.filter(expr.otherwise(fallback) if expr is not None else fallback)
