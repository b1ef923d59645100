"""Bucketed co-located join: correctness + the zero-Exchange plan claim."""

from pyspark.sql import functions as F

from osmzen_spark.ops.bucketed import bucketed_join, write_bucketed


def test_bucketed_join_no_exchange_and_correct(spark, tmp_path):
    fact = spark.range(0, 5000).select(
        (F.col("id") % 97).alias("k"), (F.col("id") * 3).alias("v")
    )
    dim = spark.range(0, 97).select(
        F.col("id").alias("k2"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )
    write_bucketed(fact, "tb_fact", "k", 4, path=str(tmp_path / "fact"))
    write_bucketed(dim, "tb_dim", "k2", 4, path=str(tmp_path / "dim"))
    try:
        j = bucketed_join(spark, "tb_fact", "tb_dim", "k", "k2")
        # THE point of bucketing: no shuffle on either side of the join
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        # row-for-row parity with the plain (shuffling) join
        got = (
            j.groupBy("k").agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
            .orderBy("k").collect()
        )
        want = (
            fact.join(dim, fact.k == dim.k2)
            .groupBy("k").agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
            .orderBy("k").collect()
        )
        assert got == want
        # the aggregation after the join ALSO rides the bucket
        # partitioning (grouped on the bucket key): still no Exchange
        agg_plan = (
            j.groupBy("k").agg(F.count("*").alias("n"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in agg_plan
    finally:
        spark.sql("DROP TABLE IF EXISTS tb_fact")
        spark.sql("DROP TABLE IF EXISTS tb_dim")


def test_unbucketed_baseline_does_shuffle(spark):
    """Sanity check that the assertion above is meaningful: the same
    join over pathless frames DOES plan an Exchange."""
    fact = spark.range(0, 500).select((F.col("id") % 7).alias("k"))
    dim = spark.range(0, 7).select(F.col("id").alias("k2"))
    j = fact.hint("merge").join(dim, fact.k == dim.k2)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan
