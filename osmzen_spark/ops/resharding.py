"""Deterministic resharding for training and corpus-mix reporting.

`reshard_for_training` is the "global shuffle" a training run wants,
made reproducible: every document gets a (shard, position) that is a
pure function of its key — identical on re-runs, on any cluster size,
and after partial corpus growth *within* a shard (positions after an
insertion point shift, but shard membership never does). No RNG, no
monotonically_increasing_id (both are partitioning-dependent).

Shard = the first two hex chars of md5(key) → 0..255 → % n_shards:
md5 is the one hash Spark and DuckDB compute identically, so the
assignment is exactly oracle-re-derivable (same construction as
ops/sampling.py's split buckets — a key's sample/split/shard fates
all cohere).

Scale shape: the shard column is a scan-fused projection; the
position is one row_number window = ONE hash exchange on shard + an
in-partition sort — exactly the repartition(shard) +
sortWithinPartitions a sharded training-data write performs, so the
operator IS the write plan. 256 hash buckets spread any n_shards ≤
256 evenly (Zipf-free: md5 is uniform on keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"


def reshard_for_training(
    df: DataFrame, key_col: str, n_shards: int = 8, out_prefix: str = ""
) -> DataFrame:
    """Add `shard` (0..n_shards-1) and `pos` (1-based within shard,
    ordered by the key's md5 then the key — total order, so ties are
    impossible and re-runs are byte-stable)."""
    if not 1 <= n_shards <= 256:
        raise ValueError("n_shards must be in 1..256 (md5 two-hex-char buckets)")
    h = F.md5(F.col(key_col).cast("string"))
    # instr() has the same (haystack, needle) order in Spark SQL and
    # DuckDB; conv() does not exist in DuckDB, so hex digits are
    # decoded positionally instead.
    b = (
        (F.expr(f"instr('{_HEX}', substring(md5(cast({key_col} as string)), 1, 1))") - 1) * 16
        + F.expr(f"instr('{_HEX}', substring(md5(cast({key_col} as string)), 2, 1))")
        - 1
    )
    shard = (b % F.lit(n_shards)).cast("int").alias(f"{out_prefix}shard")
    w = Window.partitionBy(f"{out_prefix}shard").orderBy(h, F.col(key_col))
    return df.withColumn(f"{out_prefix}shard", shard).withColumn(
        f"{out_prefix}pos", F.row_number().over(w).cast("long")
    )


def corpus_mix_report(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group corpus mix: docs, tokens (single-space split — the
    same tokenization as token_rarity/repetition/bm25), token share,
    and cumulative share in descending-token order — the table a
    data-mixing decision reads ("top 3 sources are 80% of tokens").

    Scale shape: one partial-aggregating groupBy on the (low-
    cardinality) group key; the two windows then run over the tiny
    aggregated frame — a single-partition sort of |groups| rows, never
    of the corpus. All integer sums; the two shares are single int/int
    double divisions (IEEE-identical across engines).
    """
    agg = df.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.size(F.split(F.col(text_col), " ")).cast("long")).alias("n_tokens"),
    )
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w_cum = Window.orderBy(F.desc("n_tokens"), F.col(group_col)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = F.sum("n_tokens").over(w_all)
    cum = F.sum("n_tokens").over(w_cum)
    return agg.select(
        group_col,
        "n_docs",
        "n_tokens",
        (F.col("n_tokens").cast("double") / total.cast("double")).alias("token_share"),
        (cum.cast("double") / total.cast("double")).alias("cum_share"),
    )
