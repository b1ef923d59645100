"""incremental_dedup: Bloom-prefiltered, exact-confirmed batch-vs-history
dedup. The invariant under test: the result is EXACTLY the anti-join
(`new WHERE text NOT IN history`) regardless of Bloom sizing — false
positives must be confirmed away, false negatives must not exist."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmzen_spark.ops.incremental import build_text_bloom, incremental_dedup


def _frames(spark):
    history = spark.createDataFrame(
        [("alpha bravo",), ("charlie delta",), ("echo foxtrot",), ("golf hotel",)],
        "text string",
    )
    new_batch = spark.createDataFrame(
        [
            (1, "alpha bravo"),        # dup -> dropped
            (2, "new text one"),       # unseen -> kept
            (3, "echo foxtrot"),       # dup -> dropped
            (4, "new text two"),       # unseen -> kept
            (5, "new text one"),       # unseen (dup within batch is KEPT: history dedup only)
        ],
        "doc_id int, text string",
    )
    return history, new_batch


def test_exact_anti_join_semantics(spark):
    history, new_batch = _frames(spark)
    out = incremental_dedup(new_batch, history).orderBy("doc_id").collect()
    assert [(r.doc_id, r.text) for r in out] == [
        (2, "new text one"),
        (4, "new text two"),
        (5, "new text one"),
    ]


def test_tiny_bloom_forces_false_positives_result_still_exact(spark):
    """m=8 bits saturates the filter (every probe is a 'maybe'), so the
    exact-confirm stage does ALL the work — the result must not change."""
    history, new_batch = _frames(spark)
    out = incremental_dedup(new_batch, history, bloom_bits=8).orderBy("doc_id")
    assert [r.doc_id for r in out.collect()] == [2, 4, 5]


def test_no_false_negatives_in_bitmap(spark):
    """Every history text must probe positive in the built bitmap."""
    history, _ = _frames(spark)
    m, k = 1 << 12, 5
    bits = build_text_bloom(history, bloom_bits=m, n_hashes=k)
    probes = history.select(
        *[F.pmod(F.xxhash64("text", F.lit(i)), F.lit(m)).alias(f"p{i}") for i in range(k)]
    ).collect()
    for row in probes:
        for i in range(k):
            p = row[f"p{i}"]
            assert (bits[p >> 3] >> (p & 7)) & 1 == 1


def test_empty_history_keeps_everything(spark):
    history, new_batch = _frames(spark)
    out = incremental_dedup(new_batch, history.limit(0)).orderBy("doc_id")
    assert [r.doc_id for r in out.collect()] == [1, 2, 3, 4, 5]


def test_bitmap_deterministic(spark):
    history, _ = _frames(spark)
    a = build_text_bloom(history, bloom_bits=1 << 12)
    b = build_text_bloom(history.repartition(7), bloom_bits=1 << 12)
    assert np.array_equal(a, b)


def test_rejects_unaligned_bits(spark):
    history, _ = _frames(spark)
    with pytest.raises(ValueError):
        build_text_bloom(history, bloom_bits=12)
