"""Per-group frequency capping — "at most N documents per domain".

Web-scale corpora are dominated by a few mega-sources (one crawl
domain contributing millions of near-identical pages); capping
per-source document counts is a standard curation stage (used by
C4/RefinedWeb-style pipelines) that bounds any single source's
influence on the training mix.

The selection must be deterministic and re-derivable: we rank each
group's rows by the SAME md5 key-hash as hash_sample/hash_split
(ties broken by the key itself), so the kept set is a pure function
of (key, group, n) — no RNG, identical on re-runs and across engines.

Scale shape: one shuffle on the group column. The predicate is
`row_number() <= n`, which Spark >= 3.5 rewrites to a
WindowGroupLimit: each map task pre-filters its partition to the
top-n per group BEFORE the exchange, so a mega-domain with 10^8 rows
ships at most n rows per upstream task instead of all of them — the
skew-safety this operator needs at 100 TB (verified in
tests/test_capping.py via the physical plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from osmzen_spark.ops.sampling import _bucket_col


def frequency_cap(
    df: DataFrame,
    key_col: str,
    group_col: str,
    n: int,
    keep_rank: bool = False,
) -> DataFrame:
    """Keep at most ``n`` rows per ``group_col``, chosen by md5 key
    hash order (then key) — deterministic, engine-independent."""
    w = Window.partitionBy(group_col).orderBy(
        _bucket_col(F.col(key_col)), F.col(key_col)
    )
    out = df.withColumn("__fc_rank", F.row_number().over(w)).filter(
        F.col("__fc_rank") <= n
    )
    if keep_rank:
        return out.withColumnRenamed("__fc_rank", "cap_rank")
    return out.drop("__fc_rank")
