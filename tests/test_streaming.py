"""Structured Streaming twins of the event-table operators.

The reference engine has no streaming surface; these tests pin the
engine's own guarantee: a streaming query drained with availableNow
produces the SAME rows as its batch twin (hourly window agg exactly;
sessionization for every session the stream closes).
"""

import os

import pytest

from osmzen_spark.streaming import (
    sessionize_batch,
    sessionize_stream,
    stream_events_hourly,
)

SF_DIR = os.environ.get("OSMZEN_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def test_stream_hourly_equals_batch(spark, events):
    from pyspark.sql import functions as F

    got = stream_events_hourly(spark, SF_DIR, query_name="t_hourly").collect()
    want = (
        events.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .collect()
    )
    key = lambda r: (r["hour"], r["event_type"])  # noqa: E731
    got_map = {key(r): (r["n_events"], r["sum_value"]) for r in got}
    want_map = {key(r): (r["n_events"], r["sum_value"]) for r in want}
    assert got_map.keys() == want_map.keys()
    for k in want_map:
        assert got_map[k][0] == want_map[k][0], k
        assert got_map[k][1] == pytest.approx(want_map[k][1], abs=1e-9), k


def test_sessionize_stream_matches_batch(spark, events):
    gap = 30
    got = sessionize_stream(spark, SF_DIR, gap_minutes=gap, query_name="t_sessions").collect()
    assert got, "stream closed no sessions — timeout path never fired"

    batch = {
        (r["user_id"], r["session_start_us"]): (r["session_end_us"], r["n_events"], r["sum_value"])
        for r in sessionize_batch(events, gap_minutes=gap).collect()
    }
    # every emitted session must be a real batch session, identical in
    # bounds and counts (sums to float64 tolerance: the batch twin
    # accumulates in decimal, the stream in float64)
    for r in got:
        k = (r["user_id"], r["session_start_us"])
        assert k in batch, f"stream emitted a session batch does not have: {r}"
        end, n, sv = batch[k]
        assert r["session_end_us"] == end, r
        assert r["n_events"] == n, r
        assert r["sum_value"] == pytest.approx(sv, abs=1e-9), r

    # and the stream must close the overwhelming majority: only
    # sessions still open at the final watermark may be withheld
    # (watermark = max ts, so that is at most one per user)
    n_users_open_allowed = events.select("user_id").distinct().count()
    assert len(got) >= len(batch) - n_users_open_allowed


def test_sessionize_batch_session_count(spark, events):
    """Session invariants: counts sum to the event count; session ids
    are 1..k per user; bounds are ordered."""
    from pyspark.sql import functions as F

    s = sessionize_batch(events, gap_minutes=30)
    total = s.agg(F.sum("n_events")).first()[0]
    assert total == events.count()
    bad = s.filter(F.col("session_end_us") < F.col("session_start_us")).count()
    assert bad == 0


def test_stream_tile_counts_equals_batch(spark, events):
    """Streaming geospatial rollup: the drained (hour, tile) counts
    must equal the batch twin row-for-row."""
    from osmzen_spark.streaming import stream_tile_counts, tile_counts_batch

    got = stream_tile_counts(spark, SF_DIR, z=6, query_name="t_tiles").collect()
    want = tile_counts_batch(events, z=6).collect()
    key = lambda r: (r["hour"], r["tile_x"], r["tile_y"])  # noqa: E731
    got_map = {key(r): r["n_events"] for r in got}
    want_map = {key(r): r["n_events"] for r in want}
    assert len(got) == len(got_map), "duplicate (hour, tile) rows"
    assert got_map == want_map
    assert len(want_map) > 50, "degenerate: tiles not spread"


def test_stream_tile_counts_update_mode(spark, events):
    """Update-mode + foreachBatch upsert (the unbounded deployment
    shape) over several micro-batches equals the batch rollup."""
    from pyspark.sql import functions as F

    from osmzen_spark.streaming.events import (
        stream_tile_counts_update,
        tile_counts_batch,
    )

    got, n_batches = stream_tile_counts_update(spark, SF_DIR, z=6)
    want = tile_counts_batch(
        events.withColumn("ts", F.col("ts").cast("timestamp")), z=6
    )
    a = {(r["hour"], r["tile_x"], r["tile_y"]): r["n_events"] for r in got.collect()}
    b = {(r["hour"], r["tile_x"], r["tile_y"]): r["n_events"] for r in want.collect()}
    assert a == b
    assert n_batches >= 1


def test_stream_dedup_matches_batch_distinct_across_batches(spark, events, tmp_path):
    """Cross-micro-batch dedup state: the fixture is re-staged as FOUR
    parquet files drained one per trigger, so keys repeating across
    files exercise the state store, not just in-batch dedup."""
    from osmzen_spark.streaming import stream_dedup_events

    staged = tmp_path / "events.parquet"
    events.repartition(4).write.parquet(str(staged))
    n_files = len([f for f in os.listdir(staged) if f.endswith(".parquet")])
    assert n_files == 4

    got = stream_dedup_events(
        spark, str(tmp_path), keys=("user_id", "event_type"), query_name="t_dedup"
    ).collect()
    want = events.select("user_id", "event_type").distinct().collect()
    key = lambda r: (r["user_id"], r["event_type"])  # noqa: E731
    assert sorted(map(key, got)) == sorted(map(key, want))
    # no duplicate survived the drain (cross-batch state held)
    assert len(got) == len(set(map(key, got)))
    # and the fixture genuinely repeats keys across the staged files
    assert events.count() > len(want)
