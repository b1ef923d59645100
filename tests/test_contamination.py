"""Benchmark decontamination: containment semantics + broadcast plan."""

from pyspark.sql import functions as F

from osmzen_spark.ops.contamination import contamination_check


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_containment_exact_values(spark):
    # bench item: 4 words -> 3 distinct bigrams {a b, b c, c d}
    bench = _df(spark, [(100, "a b c d")])
    train = _df(
        spark,
        [
            (1, "x a b c d y"),   # contains all 3 -> containment 1.0
            (2, "a b q c d"),     # shares {a b, c d} -> 2/3
            (3, "q w e r t"),     # shares none -> absent
        ],
    )
    out = contamination_check(train, bench, k=2, min_containment=0.5)
    got = {(r.train_id, r.bench_id): (r.shared, round(r.containment, 6)) for r in out.collect()}
    assert got == {(1, 100): (3, 1.0), (2, 100): (2, round(2 / 3, 6))}


def test_asymmetry_vs_jaccard(spark):
    # a short eval question buried in a long page: containment flags it
    # even though Jaccard would be tiny
    bench = _df(spark, [(9, "the quick brown fox")])
    filler = " ".join(f"w{i}" for i in range(200))
    train = _df(spark, [(1, filler + " the quick brown fox " + filler)])
    out = contamination_check(train, bench, k=2, min_containment=0.9)
    rows = out.collect()
    assert len(rows) == 1 and rows[0].containment == 1.0


def test_max_gram_df_drops_boilerplate(spark):
    # a gram occurring in many bench items is boilerplate; with
    # max_gram_df=1 it no longer counts toward containment
    bench = _df(spark, [(10, "copyright notice alpha"), (11, "copyright notice beta")])
    train = _df(spark, [(1, "copyright notice gamma")])
    loose = contamination_check(train, bench, k=2, min_containment=0.4)
    strict = contamination_check(train, bench, k=2, min_containment=0.4, max_gram_df=1)
    # 'copyright notice' is shared with both bench docs (1 of 2 grams = 0.5)
    assert loose.count() == 2
    assert strict.count() == 0


def test_bench_side_broadcasts(spark):
    bench = _df(spark, [(9, "a b c")])
    train = _df(spark, [(1, "a b c")])
    plan = (
        contamination_check(train, bench, k=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
