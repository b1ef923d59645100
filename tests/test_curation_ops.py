"""Round-5 curation operators: repetition filters, BM25 ranking,
SemDeDup semantic deduplication."""

import numpy as np

from osmzen_spark.ops.ranking import bm25_rank
from osmzen_spark.ops.repetition import repetition_filter, repetition_stats
from osmzen_spark.ops.similarity import semantic_dedup


def test_repetition_stats_spam_vs_clean(spark):
    docs = spark.createDataFrame(
        [
            # pure bigram spam: "foo bar" repeated
            (1, "foo bar foo bar foo bar foo bar"),
            # clean: all bigrams distinct
            (2, "a b c d e f g h"),
            # trigram dup: "x y z" twice with noise between
            (3, "x y z q w x y z"),
            # too short for a trigram
            (4, "p q"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    # doc 1: 7 bigrams, "foo bar" x4 -> top frac 4/7; all trigrams dup'd
    assert rows[1]["n_bigrams"] == 7
    assert rows[1]["top_bigram_n"] == 4
    assert abs(rows[1]["top_bigram_frac"] - 4 / 7) < 1e-12
    assert rows[1]["dup_trigram_frac"] > 0.5
    # doc 2: everything unique
    assert rows[2]["top_bigram_n"] == 1
    assert rows[2]["dup_trigram_frac"] == 0.0
    # doc 3: "x y z" appears twice among 6 trigrams -> dup frac 2/6
    assert abs(rows[3]["dup_trigram_frac"] - 2 / 6) < 1e-12
    # doc 4: one bigram, zero trigrams -> frac 0, no crash
    assert rows[4]["n_bigrams"] == 1
    assert rows[4]["dup_trigram_frac"] == 0.0

    kept = {r["doc_id"] for r in repetition_filter(docs).select("doc_id").collect()}
    assert 2 in kept and 1 not in kept  # spam dropped, clean kept


def test_bm25_ranks_matching_docs_first(spark):
    docs = spark.createDataFrame(
        [
            (1, "table table table scan"),  # high tf for 'table', short
            (2, "table scan row filter merge sort window window"),
            (3, "join join join join"),
            (4, "row scan filter"),  # no query terms at all
        ],
        ["doc_id", "text"],
    )
    res = bm25_rank(docs, terms=["table", "join"], k=2).collect()
    by_term = {}
    for r in res:
        by_term.setdefault(r["term"], []).append(r)
    # doc 1 (tf=3, dl=4) must outrank doc 2 (tf=1, dl=8) for 'table'
    t = sorted(by_term["table"], key=lambda r: r["bm25_rank"])
    assert [r["doc_id"] for r in t] == [1, 2]
    assert t[0]["score"] > t[1]["score"] > 0
    # 'join' only matches doc 3
    assert [r["doc_id"] for r in by_term["join"]] == [3]
    # df counts docs containing the term
    assert t[0]["df"] == 2 and by_term["join"][0]["df"] == 1


def test_semantic_dedup_drops_within_cluster_only(spark):
    # two well-separated clusters in 4-d; one near-duplicate pair in
    # cluster A, plus a cross-cluster pair that is NOT similar
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),  # near-dup of 1 -> dropped
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.98, 0.2, 0.0]),  # cos to 3 ~= 0.98 -> dropped
        (5, [0.0, 0.0, 1.0, 0.0]),  # alone in its direction
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = np.array(
        [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]]
    )
    kept = semantic_dedup(emb, cents, threshold=0.95, dim=4)
    ids = sorted(r["vec_id"] for r in kept.collect())
    assert ids == [1, 3, 5]
    # every survivor carries its cluster id
    cids = {r["vec_id"]: r["cid"] for r in kept.collect()}
    assert cids == {1: 0, 3: 1, 5: 2}


def test_semantic_dedup_keep_lowest_id_is_non_cascading(spark):
    # chain: 1~2, 2~3, but 1!~3. Rule: drop anything with a lower-id
    # similar mate -> 2 and 3 both dropped (3 via 2, even though 2 is
    # itself dropped). One cluster so all pairs compared.
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.96, 0.28]),  # cos(1,2) ~ 0.96
        (3, [0.82, 0.57]),  # cos(2,3) ~ 0.95, cos(1,3) ~ 0.82
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = np.array([[1.0, 0.0]])
    kept = semantic_dedup(emb, cents, threshold=0.9, dim=2)
    assert sorted(r["vec_id"] for r in kept.collect()) == [1]
