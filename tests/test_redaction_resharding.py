"""redact_pii / normalize_text_col / reshard_for_training /
corpus_mix_report unit tests."""

import hashlib


def test_redact_pii_counts_and_replaces(spark):
    from osmzen_spark.ops.redaction import redact_pii

    rows = [
        (1, "mail bob@site.org and bob@site.org twice"),
        (2, "server at 10.0.0.1 call 555-123-4567"),
        (3, "nothing sensitive here"),
        (4, "edge a@b.co 1.2.3.4 999-000-1111 mixed"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    got = {r["id"]: r for r in redact_pii(df).collect()}
    assert (got[1]["n_email"], got[1]["n_ip"], got[1]["n_phone"]) == (2, 0, 0)
    assert got[1]["redacted"] == "mail <EMAIL> and <EMAIL> twice"
    assert (got[2]["n_email"], got[2]["n_ip"], got[2]["n_phone"]) == (0, 1, 1)
    assert got[2]["redacted"] == "server at <IP> call <PHONE>"
    assert got[3]["redacted"] == "nothing sensitive here"
    assert (got[4]["n_email"], got[4]["n_ip"], got[4]["n_phone"]) == (1, 1, 1)
    assert got[4]["redacted"] == "edge <EMAIL> <IP> <PHONE> mixed"


def test_redact_pii_counts_before_replacement_order(spark):
    from osmzen_spark.ops.redaction import redact_pii

    df = spark.createDataFrame(
        [(1, "x user@1.2.3.4io y"), (2, "x 555-123-4567@x.com y")], ["id", "text"]
    )
    got = {r["id"]: r for r in redact_pii(df).collect()}
    # digit-only "domain" is not an email (needs a letter TLD); the IP
    # inside it is still found
    assert got[1]["n_email"] == 0 and got[1]["n_ip"] == 1
    assert got[1]["redacted"] == "x user@<IP>io y"
    # phone-shaped local part: email (ordered first) wins the
    # replacement, but counts are raw-text counts, so both register
    assert got[2]["n_email"] == 1 and got[2]["n_phone"] == 1
    assert got[2]["redacted"] == "x <EMAIL> y"


def test_normalize_text_col_folds_case_and_spaces(spark):
    from pyspark.sql import functions as F

    from osmzen_spark.ops.redaction import normalize_text_col

    df = spark.createDataFrame(
        [("  A  b   C ",), ("a b c",), ("A B C",)], ["t"]
    )
    out = df.select(normalize_text_col(F.col("t")).alias("n")).collect()
    assert [r["n"] for r in out] == ["a b c"] * 3


def test_reshard_deterministic_and_dense(spark):
    from osmzen_spark.ops.resharding import reshard_for_training

    df = spark.createDataFrame([(i,) for i in range(200)], ["k"])
    out = reshard_for_training(df, "k", n_shards=8).collect()
    # matches the scalar md5 construction exactly
    hexd = "0123456789abcdef"
    for r in out:
        h = hashlib.md5(str(r["k"]).encode()).hexdigest()
        assert r["shard"] == (hexd.index(h[0]) * 16 + hexd.index(h[1])) % 8
    # positions are dense 1..n per shard, ordered by (md5, key)
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["pos"])
        assert [r["pos"] for r in rs] == list(range(1, len(rs) + 1))
        keys = [r["k"] for r in rs]
        assert keys == sorted(
            keys, key=lambda k: (hashlib.md5(str(k).encode()).hexdigest(), k)
        )
    # shard membership is stable under corpus growth
    grown = spark.createDataFrame([(i,) for i in range(400)], ["k"])
    g = {
        r["k"]: r["shard"]
        for r in reshard_for_training(grown, "k", n_shards=8).collect()
    }
    for r in out:
        assert g[r["k"]] == r["shard"]


def test_reshard_rejects_bad_shard_count(spark):
    import pytest

    from osmzen_spark.ops.resharding import reshard_for_training

    df = spark.createDataFrame([(1,)], ["k"])
    with pytest.raises(ValueError):
        reshard_for_training(df, "k", n_shards=257)


def test_corpus_mix_report_shares(spark):
    from osmzen_spark.ops.resharding import corpus_mix_report

    rows = [
        (1, "a b c d", "big"),
        (2, "a b c d", "big"),
        (3, "a b", "small"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = {r["source"]: r for r in corpus_mix_report(df).collect()}
    assert got["big"]["n_docs"] == 2 and got["big"]["n_tokens"] == 8
    assert got["small"]["n_tokens"] == 2
    assert got["big"]["token_share"] == 0.8
    assert got["big"]["cum_share"] == 0.8  # big sorts first (desc tokens)
    assert got["small"]["cum_share"] == 1.0
