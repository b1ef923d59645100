"""As-of join (ops/asof.py): pandas-truth comparison and the
one-shuffle plan guarantee."""

import pandas as pd

SF_DIR = "/root/testdata/sf0.001"


def test_asof_join_matches_pandas_merge_asof(spark):
    from osmzen_spark.ops.asof import asof_join
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    views = ev.filter("event_type = 'view'").select(
        "user_id", "ts", F.col("event_id").alias("view_id")
    )
    clicks = ev.filter("event_type = 'click'").select("event_id", "user_id", "ts")
    got = (
        asof_join(clicks, views, by=["user_id"], left_ts="ts", right_ts="ts",
                  right_payload=["view_id"])
        .orderBy("event_id")
        .toPandas()
    )

    pev = ev.toPandas()
    pv = (
        pev[pev.event_type == "view"][["user_id", "ts", "event_id"]]
        .rename(columns={"event_id": "view_id"})
        .sort_values("ts")
    )
    pc = pev[pev.event_type == "click"][["event_id", "user_id", "ts"]].sort_values("ts")
    exp = (
        pd.merge_asof(pc, pv, on="ts", by="user_id", direction="backward")
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    g = got.set_index("event_id")["asof_view_id"]
    e = exp.set_index("event_id")["view_id"]
    for k in e.index:
        ge, ee = g[k], e[k]
        assert (pd.isna(ge) and pd.isna(ee)) or ge == ee, (k, ge, ee)


def test_asof_join_single_exchange(spark):
    """The union-and-window implementation must cost exactly one hash
    exchange (on the by-keys) — the property that makes it viable at
    100 TB. A second exchange means the plan regressed to a join."""
    from osmzen_spark.ops.asof import asof_join
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    views = ev.filter("event_type = 'view'").select(
        "user_id", "ts", F.col("event_id").alias("view_id")
    )
    clicks = ev.filter("event_type = 'click'").select("event_id", "user_id", "ts")
    j = asof_join(clicks, views, by=["user_id"], left_ts="ts", right_ts="ts",
                  right_payload=["view_id"])
    plan = j._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan
