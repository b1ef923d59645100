"""Sequence packing: concat-and-chunk documents into fixed-size token
windows — the canonical LLM-pretraining data layout (documents are
concatenated in a deterministic order and sliced into max_tokens-sized
chunks; a document may span chunk boundaries).

Shape at 100 TB: documents are sharded by id, each shard packs
INDEPENDENTLY (one window cumsum per shard — a single shuffle on the
shard key, then per-shard sorted cumulative math, all in whole-stage
codegen; no Python). `num_shards` is the parallelism knob: at web
scale you run 2^14-2^16 shards so each holds a few GB and chunk ids
are globally unique as (shard, chunk_id). Packing quality is
unaffected by sharding (every chunk except the last-per-shard is
exactly max_tokens full), which is why real pretraining pipelines
shard exactly this way.

Everything is integer Column math (`div`, not float division) so the
result is bit-identical to the DuckDB oracle at any scale. The
reference engine has no analog (single-process geo library); this is
engine-native capability for the training-data tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from osmzen_spark.ops.textstats import token_count_col


def pack_sequences(
    docs: DataFrame,
    max_tokens: int = 512,
    num_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign every document its (shard, chunk, offset, length) spans
    under concat-and-chunk packing.

    Returns one row per (document, chunk) span:
      shard           bigint  id-mod shard (production would hash; mod
                              keeps the oracle exact and is uniform for
                              dense synthetic ids)
      chunk_id        bigint  chunk index within the shard
      doc_id          bigint
      offset_in_chunk bigint  token offset where this doc's slice starts
      tokens_in_chunk bigint  tokens of this doc inside this chunk

    Empty documents (0 tokens) occupy no space and are dropped.
    """
    c = int(max_tokens)
    d = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            token_count_col(F.col(text_col)).cast("long").alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
        .withColumn("shard", F.pmod(F.col("doc_id"), F.lit(num_shards)).cast("long"))
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = (
        d.withColumn("start", F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long")))
        .withColumn("end", F.col("start") + F.col("n_tokens"))
        # integer division (DIV), never float: floor(x/c) via doubles
        # silently loses exactness past 2^53 cumulative tokens
        .withColumn("first_chunk", F.expr(f"start div {c}"))
        .withColumn("last_chunk", F.expr(f"(end - 1) div {c}"))
        .withColumn("chunk_id", F.explode(F.sequence("first_chunk", "last_chunk")))
    )
    span_start = F.greatest(F.col("start"), F.col("chunk_id") * c)
    span_end = F.least(F.col("end"), (F.col("chunk_id") + 1) * c)
    return d.select(
        "shard",
        "chunk_id",
        "doc_id",
        (span_start - F.col("chunk_id") * c).alias("offset_in_chunk"),
        (span_end - span_start).alias("tokens_in_chunk"),
    )
