"""Benchmark decontamination: find training documents that contain a
benchmark/eval item's n-grams.

The standard metric (GPT-3 appendix C style) is CONTAINMENT of the
benchmark item in the training doc: |grams(bench) ∩ grams(train)| /
|grams(bench)| — asymmetric on purpose (a 10-word eval question buried
in a 10k-word web page is contamination; Jaccard would score it ~0).

Scale shape at 100 TB: the benchmark side is tiny (eval suites are
thousands of items vs billions of train docs), so its shingle table
BROADCASTS — the train corpus is never shuffled: one Arrow shingling
pass over train, a map-side broadcast hash join against the benchmark
grams, then a partial-aggregated count grouped on the (sparse) match
pairs. The only exchange carries actual matches, which is minuscule.
Word k-grams at the production default k=8 are near-unique, so no hot
keys; `max_gram_df` additionally drops degenerate grams (boilerplate
that appears in more than N benchmark items) the way real
decontamination pipelines do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from osmzen_spark.ops.dedup import shingle_explode


def contamination_check(
    train: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_containment: float = 0.8,
    broadcast_bench: bool = True,
    max_gram_df: int | None = None,
) -> DataFrame:
    """(train_id, bench_id, n_bench, shared, containment) for every
    train/bench pair with containment >= min_containment.

    `shared` counts DISTINCT shared grams (shingle_explode emits each
    doc's distinct gram set, so the equi-join yields one row per shared
    gram per pair). `max_gram_df` drops grams occurring in more than
    that many BENCHMARK items before joining (None = exact).
    """
    tr = shingle_explode(train, text_col, id_col, k).select(
        F.col("id").alias("train_id"), F.xxhash64("g").alias("g")
    )
    be = shingle_explode(bench, text_col, id_col, k).select(
        F.col("id").alias("bench_id"), F.col("n").alias("n_bench"),
        F.xxhash64("g").alias("g"),
    )
    if max_gram_df is not None:
        w = be.groupBy("g").agg(F.count("*").alias("__df"))
        be = be.join(w.filter(F.col("__df") <= max_gram_df).select("g"), "g")
    if broadcast_bench:
        be = F.broadcast(be)
    shared = (
        tr.join(be, "g")
        .groupBy("train_id", "bench_id", "n_bench")
        .agg(F.count("*").alias("shared"))
    )
    containment = F.col("shared") / F.col("n_bench")
    return shared.select(
        "train_id",
        "bench_id",
        "n_bench",
        "shared",
        containment.alias("containment"),
    ).filter(F.col("containment") >= min_containment)
