"""Sequence packing (concat-and-chunk) and deterministic hash splits."""

import hashlib

from pyspark.sql import functions as F

from osmzen_spark.ops.packing import pack_sequences
from osmzen_spark.ops.sampling import hash_sample, hash_split


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pack_sequences_spans(spark):
    # one shard (num_shards=1), capacity 10 tokens; token counts: 4, 8, 3
    rows = [
        (0, "a b c d"),          # 4 tokens -> chunk0 [0,4)
        (1, "a b c d e f g h"),  # 8 tokens -> chunk0 [4,10) + chunk1 [10,12)
        (2, "x y z"),            # 3 tokens -> chunk1 [12,15)
    ]
    out = pack_sequences(_docs(spark, rows), max_tokens=10, num_shards=1)
    got = [
        (r.chunk_id, r.doc_id, r.offset_in_chunk, r.tokens_in_chunk)
        for r in out.orderBy("chunk_id", "doc_id").collect()
    ]
    assert got == [
        (0, 0, 0, 4),
        (0, 1, 4, 6),
        (1, 1, 0, 2),
        (1, 2, 2, 3),
    ]


def test_pack_sequences_full_chunks_and_conservation(spark):
    # random-ish sizes; every chunk except the last per shard is full,
    # and per-doc span tokens sum to the doc's token count
    rows = [(i, " ".join(["w"] * ((i * 7) % 23 + 1))) for i in range(50)]
    df = _docs(spark, rows)
    out = pack_sequences(df, max_tokens=16, num_shards=4).cache()
    per_chunk = (
        out.groupBy("shard", "chunk_id").agg(F.sum("tokens_in_chunk").alias("t"))
    )
    last = per_chunk.groupBy("shard").agg(F.max("chunk_id").alias("last_chunk"))
    not_last = per_chunk.join(
        last,
        (per_chunk.shard == last.shard) & (per_chunk.chunk_id < last.last_chunk),
        "inner",
    )
    assert not_last.filter(F.col("t") != 16).count() == 0
    per_doc = out.groupBy("doc_id").agg(F.sum("tokens_in_chunk").alias("t"))
    want = df.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("n")
    )
    bad = per_doc.join(want, "doc_id").filter(F.col("t") != F.col("n"))
    assert bad.count() == 0
    # a doc spanning chunks starts each continuation span at offset 0
    multi = out.filter(F.col("offset_in_chunk") == 0).count()
    assert multi > 0
    out.unpersist()


def test_pack_sequences_empty_docs_dropped(spark):
    out = pack_sequences(_docs(spark, [(0, ""), (1, "a b")]), max_tokens=4, num_shards=1)
    assert [r.doc_id for r in out.collect()] == [1]


def test_hash_split_deterministic_and_exhaustive(spark):
    df = spark.range(0, 2000).select(F.col("id").alias("k"))
    out = hash_split(df, "k").cache()
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    # 90/5/5 within loose binomial bounds at n=2000
    assert 1650 <= counts["train"] <= 1950
    # python re-derivation: the split is md5-prefix bucketing, exactly
    for r in out.limit(50).collect():
        h = hashlib.md5(str(r.k).encode()).hexdigest()[:8]
        want = (
            "train"
            if h < format(int(0.9 * 2**32), "08x")
            else ("val" if h < format(int(0.95 * 2**32), "08x") else "test")
        )
        assert r.split == want
    out.unpersist()


def test_hash_split_stable_under_growth(spark):
    small = hash_split(spark.range(0, 100).select(F.col("id").alias("k")), "k")
    big = hash_split(spark.range(0, 1000).select(F.col("id").alias("k")), "k")
    s = {r.k: r.split for r in small.collect()}
    b = {r.k: r.split for r in big.collect()}
    assert all(b[k] == v for k, v in s.items())


def test_hash_sample_subset_semantics(spark):
    df = spark.range(0, 1000).select(F.col("id").alias("k"))
    kept = hash_sample(df, 0.2, "k")
    n = kept.count()
    assert 120 <= n <= 280
    # sampling is a prefix of the split ordering: a 0.2 sample is a
    # subset of a 0.5 sample (nested samples — the property rank-based
    # sampling lacks)
    k2 = {r.k for r in kept.collect()}
    k5 = {r.k for r in hash_sample(df, 0.5, "k").collect()}
    assert k2 <= k5


def test_hash_sample_rate_one_keeps_everything(spark):
    """rate>=1.0 must be a no-op: the clamped 'ffffffff' ceiling with
    strict '<' used to drop keys whose md5 prefix is exactly
    'ffffffff' (~2^-32 of keys)."""
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    assert hash_sample(df, 1.0, "k").count() == 1000
    assert hash_sample(df, 1.5, "k").count() == 1000


def test_stratified_sample_rates_and_determinism(spark):
    from osmzen_spark.ops.sampling import stratified_sample

    rows = [(i, "en" if i % 3 == 0 else ("de" if i % 3 == 1 else "zz"))
            for i in range(3000)]
    df = spark.createDataFrame(rows, ["k", "lang"])
    out = stratified_sample(
        df, key_col="k", strata_col="lang",
        rates={"en": 1.0, "de": 0.5}, default_rate=0.0,
    )
    got = out.groupBy("lang").count().collect()
    by = {r["lang"]: r["count"] for r in got}
    assert by["en"] == 1000          # rate 1.0 keeps EVERY row
    assert 400 <= by.get("de", 0) <= 600  # ~50%
    assert "zz" not in by            # default 0.0 drops the stratum
    # deterministic: a re-run keeps the identical key set
    again = stratified_sample(
        df, key_col="k", strata_col="lang",
        rates={"en": 1.0, "de": 0.5}, default_rate=0.0,
    )
    assert sorted(r["k"] for r in out.collect()) == sorted(
        r["k"] for r in again.collect()
    )
