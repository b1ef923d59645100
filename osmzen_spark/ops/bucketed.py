"""Bucketed (co-located) big-big joins: the zero-shuffle join at 100 TB.

The dominant cost of a fact-fact equi-join at scale is shuffling BOTH
sides on the join key. If the tables are written bucketed on that key
(`df.write.bucketBy(n, key).sortBy(key)` — the Hive/Iceberg bucket
transform on a real lakehouse), Spark's file scan exposes the bucket
layout as `HashPartitioning(key, n)` and the planner elides both
exchanges: the join becomes a per-bucket merge of co-located files.
For a table that is joined on the same key by many downstream jobs
(the canonical example: an element/payload table keyed by element_id,
re-joined per batch), bucketing pays the shuffle ONCE at write time
and never again.

The reference engine is a single-process Go library with no
distributed joins (ref:README.md:267-268 "No concurrency is used");
this module is engine-native capability for the 100 TB design point.

Numbers worth knowing (why bucket count matters at scale): buckets are
the unit of join parallelism — at 100 TB choose buckets so each is
100-500 MB (e.g. 4096 buckets for a 1 TB-per-partition-key table), and
both join sides MUST use the same count (Spark can merge mismatched
counts only when one divides the other, and only with
spark.sql.bucketing.coalesceBucketsInJoin.enabled).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int = 8,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Write `df` as a bucketed parquet table registered in the session
    catalog (bucket metadata lives in the catalog, which is why this is
    `saveAsTable` and not a bare `.parquet()` write — a pathless scan
    cannot know the bucketing and would re-shuffle).

    sort=True additionally sorts within buckets on the key, which lets
    the downstream sort-merge join skip its per-bucket Sort as well.
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """Join two same-bucket-count catalog tables on their bucket keys.

    The merge hint forces the sort-merge strategy (a broadcast of the
    smaller side would be picked at sandbox scale and would hide the
    point — at 100 TB neither side broadcasts). With both scans
    reporting HashPartitioning(key, n), the executed plan contains NO
    Exchange on either side (asserted in tests/test_bucketed.py).
    """
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key])
