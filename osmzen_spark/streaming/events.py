"""Structured Streaming over the events table.

The reference engine is batch-only (no streaming surface exists in
paulmach/osmzen), but a deployed 100 TB normalization pipeline ingests
continuously, so the engine ships first-class streaming twins of its
event-table operators:

* ``stream_events_hourly`` — the streaming twin of the batch
  ``events_window`` query: ``readStream`` file source -> event-time
  tumbling window aggregation. Run with ``trigger(availableNow=True)``
  it drains the table deterministically and must produce EXACTLY the
  batch result (tests/test_streaming.py asserts row-for-row equality).
* ``sessionize_stream`` — a custom stateful operator
  (``applyInPandasWithState``): gap-based sessionization with
  event-time timeouts. Its batch twin ``sessionize_batch`` (pure
  window Columns, DuckDB-oracled as the ``sessionize`` driver query)
  defines the semantics; the stream emits a session when either the
  in-batch gap closes it or the watermark passes its timeout.

Scale notes (the 1000-executor shape):

* The window aggregation shuffles on (window, event_type) — low
  cardinality, map-side partial aggregation does almost all the work.
* Sessionization shuffles on user_id (the state key). State per key is
  O(1) (one open session), so state-store size is bounded by the
  active-user cardinality, not the event volume. Skewed users cost
  memory not correctness; a production deployment puts a salt+merge
  in front only if a single user exceeds executor memory (not the
  case for gap sessions, which are O(1)).
* ``availableNow`` is the batch-backfill trigger: the same query
  object serves both the live stream and historical replay, which is
  how the engine would re-normalize a 100 TB backlog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        # the driver's parquet stores naive (NTZ) timestamps
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over the events parquet. The schema must be
    provided explicitly (a streaming source cannot infer), and the
    source must be a DIRECTORY (FileStreamSource lists it for new
    files), so the single test parquet is exposed through a symlink
    staging dir — a production table is already a directory of files.
    The stored naive (NTZ) timestamps are cast to instants at face
    value (the engine pins the session TZ to UTC) because event-time
    watermarks require TIMESTAMP."""
    import os
    import tempfile

    src = os.path.abspath(f"{sf_dir}/events.parquet")
    if os.path.isdir(src):
        path = src
    else:
        stage = os.path.join(
            tempfile.gettempdir(), "osmzen_stream", src.strip("/").replace("/", "_")
        )
        os.makedirs(stage, exist_ok=True)
        link = os.path.join(stage, "part-000.parquet")
        if not os.path.exists(link):
            os.symlink(src, link)
        path = stage
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        # split the availableNow drain into several micro-batches so
        # update-mode incremental emission is actually exercised
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(path)
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def stream_events_hourly(
    spark: SparkSession, sf_dir: str, watermark: str = "1 hour", query_name: str = "events_hourly"
) -> DataFrame:
    """Streaming twin of the batch events_window query: event-time
    tumbling 1-hour windows per event_type, drained with
    availableNow + complete mode into an in-memory sink.

    Complete mode re-emits every window per trigger, which is exact
    (and what the equality test needs); a production job over an
    unbounded stream uses append mode + this same watermark so the
    state store can evict closed windows."""
    events = read_events_stream(spark, sf_dir).withWatermark("ts", watermark)
    agg = (
        events.groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization as pure window Columns (the DuckDB-
    oracled batch semantics): a new session starts when the gap to the
    previous event of the same user exceeds ``gap_minutes``. Session
    ids number sessions per user in time order from 1. Timestamps are
    compared and emitted at microsecond precision (unix_micros) so the
    oracle comparison is integer-exact."""
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # NTZ-safe: with the engine's pinned UTC session TZ the cast takes
    # the naive value at face value, matching DuckDB's epoch_us
    tus = F.unix_micros(F.col("ts").cast("timestamp"))
    prev = F.lag(tus).over(w)
    new_s = F.when(prev.isNull() | ((tus - prev) > gap_us), F.lit(1)).otherwise(F.lit(0))
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        events.withColumn("__tus", tus)
        .withColumn("__sid", F.sum(new_s).over(cum))
        .groupBy("user_id", F.col("__sid").cast("int").alias("session_id"))
        .agg(
            F.min("__tus").alias("session_start_us"),
            F.max("__tus").alias("session_end_us"),
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )


def _session_fn(gap_minutes: int):
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdf_iter, state):
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            start_us, end_us, n, sv = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start_us": [start_us],
                    "session_end_us": [end_us],
                    "n_events": [n],
                    "sum_value": [sv],
                }
            )
            return

        import numpy as np

        cur = list(state.get) if state.exists else None
        out = []
        pdf = pd.concat(list(pdf_iter), ignore_index=True)
        if len(pdf):
            pdf = pdf.sort_values(["ts", "event_id"])
            # microsecond ints regardless of the pandas datetime unit
            tus = pdf["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            vals = pdf["value"].to_numpy(dtype=np.float64)
            n = len(tus)
            # vectorized gap split: segment starts where the gap to the
            # previous event exceeds gap_us
            flags = np.empty(n, dtype=bool)
            flags[0] = True
            flags[1:] = np.diff(tus) > gap_us
            starts = np.flatnonzero(flags)
            ends = np.append(starts[1:], n) - 1
            counts = (ends - starts + 1).astype(np.int64)
            sums = np.add.reduceat(vals, starts)
            segs = [
                [int(tus[s]), int(tus[e]), int(c), float(v)]
                for s, e, c, v in zip(starts, ends, counts, sums)
            ]
            if cur is not None and segs and segs[0][0] - cur[1] <= gap_us:
                # first segment continues the open session
                cur = [cur[0], segs[0][1], cur[2] + segs[0][2], cur[3] + segs[0][3]]
                segs = segs[1:]
            for seg in segs:
                if cur is not None:
                    out.append((user_id, cur[0], cur[1], cur[2], cur[3]))
                cur = seg
        if cur is not None:
            state.update(tuple(cur))
            # close the open session once the watermark passes its end
            # by more than the gap (event-time timeout); never set a
            # timeout at/behind the current watermark (Spark rejects it)
            desired_ms = cur[1] // 1000 + gap_minutes * 60 * 1000
            state.setTimeoutTimestamp(max(desired_ms, state.getCurrentWatermarkMs() + 1))
        if out:
            yield pd.DataFrame(
                out,
                columns=["user_id", "session_start_us", "session_end_us", "n_events", "sum_value"],
            )

    return fn


def sessionize_stream(
    spark: SparkSession,
    sf_dir: str,
    gap_minutes: int = 30,
    watermark: str = "0 seconds",
    query_name: str = "events_sessions",
) -> DataFrame:
    """Custom stateful streaming operator: gap sessionization via
    applyInPandasWithState with event-time timeouts. Emits a session
    row when (a) a later event of the same user closes it in-batch, or
    (b) the watermark passes session_end + gap (timeout path). Open
    sessions whose timeout the final watermark never passes remain in
    state — exactly the semantics an unbounded stream needs.

    Sums are accumulated in float64 event order (sorted by ts,
    event_id), so values match the batch twin to float64 exactness for
    in-gap sessions; the equality test compares against
    sessionize_batch on the sessions the stream closed."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    events = read_events_stream(spark, sf_dir).withWatermark("ts", watermark)
    sessions = events.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_minutes),
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


# ---------------------------------------------------------------- geospatial

def _event_points(df: DataFrame) -> DataFrame:
    """Deterministic per-user lon/lat (the customer-points arithmetic),
    standing in for the device-location column of a real event feed."""
    return df.withColumn(
        "lon", F.pmod(F.col("user_id") * 2654435761, F.lit(360000000)) / 1000000.0 - 180.0
    ).withColumn(
        "lat", F.pmod(F.col("user_id") * 2246822519, F.lit(150000000)) / 1000000.0 - 75.0
    )


def tile_counts_batch(events: DataFrame, z: int = 6) -> DataFrame:
    """Batch twin of stream_tile_counts: per (hour, tile) event counts."""
    from osmzen_spark.tiling.cells import tile_x_col, tile_y_col

    pts = _event_points(events)
    return pts.groupBy(
        F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias("hour"),
        tile_x_col(F.col("lon"), z).alias("tile_x"),
        tile_y_col(F.col("lat"), z).alias("tile_y"),
    ).agg(F.count("*").alias("n_events"))


def stream_tile_counts(
    spark: SparkSession,
    sf_dir: str,
    z: int = 6,
    watermark: str = "1 hour",
    query_name: str = "tile_counts",
) -> DataFrame:
    """Streaming geospatial ingestion: event stream -> per-event tile
    assignment (pure Column Web-Mercator math, no UDF) -> event-time
    tumbling-hour counts per (window, tile_x, tile_y). This is the
    live-map/heatmap rollup shape: the shuffle key is (window, tile)
    and map-side partial aggregation compacts dense metro tiles.

    State-size caveat: this demo runs outputMode('complete') so the
    availableNow drain emits EVERY window once and equals
    tile_counts_batch exactly (tests/test_streaming.py) — but in
    complete mode Spark never evicts aggregation state by watermark,
    so the watermark here is inert and state grows with the number of
    distinct (window, tile) keys. An UNBOUNDED deployment of this
    shape must run outputMode('update') into a last-write-wins sink
    keyed on (hour, tile_x, tile_y) (e.g. an upsert table); there the
    same withWatermark call really does bound the state store to the
    open windows."""
    from osmzen_spark.tiling.cells import tile_x_col, tile_y_col

    events = _event_points(read_events_stream(spark, sf_dir)).withWatermark("ts", watermark)
    agg = (
        events.groupBy(
            F.window("ts", "1 hour").alias("win"),
            tile_x_col(F.col("lon"), z).alias("tile_x"),
            tile_y_col(F.col("lat"), z).alias("tile_y"),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "tile_x",
            "tile_y",
            "n_events",
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def stream_dedup_events(
    spark: SparkSession,
    sf_dir: str,
    keys: tuple[str, ...] = ("user_id", "event_type"),
    watermark: str = "100000 hours",
    max_files_per_trigger: int | None = 1,
    query_name: str = "dedup_events",
) -> DataFrame:
    """Streaming ingestion dedup — dropDuplicatesWithinWatermark over
    the event stream, the exactly-once-by-content-key stage an
    at-least-once delivery pipeline (Kafka/Kinesis replays, file
    re-lists) puts in front of everything else. State is keyed on
    ``keys``; a re-delivery whose event time lands within the
    watermark of the first arrival is suppressed, across micro-batch
    boundaries (the state store carries seen keys between triggers).

    Only the key columns are emitted, which makes the drained result
    arrival-order-invariant: with a watermark longer than the
    fixture's time span nothing ever expires, so the availableNow
    drain equals the batch distinct-key set EXACTLY
    (tests/test_streaming.py, split across several micro-batches via
    maxFilesPerTrigger). In production the watermark is the
    re-delivery SLA: state is bounded by keys seen within the SLA
    horizon, and a duplicate arriving later than the SLA re-emits —
    the standard streaming dedup contract, not a defect.

    Scale shape: one shuffle on the key columns (same key layout as
    the batch exact_dedup operator); per-key state is a single
    timestamp, so the state store is O(distinct keys in the horizon),
    independent of event volume."""
    events = read_events_stream(
        spark, sf_dir, max_files_per_trigger=max_files_per_trigger
    ).withWatermark("ts", watermark)
    deduped = events.dropDuplicatesWithinWatermark(list(keys)).select(*keys)
    q = (
        deduped.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def stream_tile_counts_update(
    spark: SparkSession,
    sf_dir: str,
    z: int = 6,
    watermark: str = "100000 hours",
    max_files_per_trigger: int | None = 1,
) -> tuple[DataFrame, int]:
    """The UNBOUNDED deployment shape of stream_tile_counts: the same
    watermarked (window, tile) aggregation in outputMode('update'),
    landed by foreachBatch into a last-write-wins upsert keyed on
    (hour, tile_x, tile_y). In update mode the watermark genuinely
    bounds the state store — windows older than (max event time -
    watermark) are finalized, emitted one last time, and evicted — so
    state is O(open windows x active tiles) forever, while the upsert
    sink keeps the final count per key. maxFilesPerTrigger splits the
    availableNow drain into several micro-batches so the incremental
    update/upsert path is actually exercised (one batch would
    degenerate to append-like behavior).

    Returns (upserted table as a DataFrame, number of micro-batches).
    With a watermark longer than the fixture's time span nothing is
    dropped as late and the upsert result equals tile_counts_batch
    exactly (tests/test_streaming.py); in production the watermark is
    the late-data SLA and later-than-SLA events are dropped — the
    standard streaming contract, not a defect of this operator.
    """
    from osmzen_spark.tiling.cells import tile_x_col, tile_y_col

    events = _event_points(
        read_events_stream(spark, sf_dir, max_files_per_trigger=max_files_per_trigger)
    ).withWatermark("ts", watermark)
    agg = (
        events.groupBy(
            F.window("ts", "1 hour").alias("win"),
            tile_x_col(F.col("lon"), z).alias("tile_x"),
            tile_y_col(F.col("lat"), z).alias("tile_y"),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "tile_x",
            "tile_y",
            "n_events",
        )
    )

    sink: dict[tuple, int] = {}
    batches: list[int] = []

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        # per-key last write wins; micro-batches are tile-count sized
        # (bounded by open windows x tiles), so the collect is the
        # sink adapter, not a data move
        batches.append(batch_id)
        for r in batch_df.collect():
            sink[(r["hour"], r["tile_x"], r["tile_y"])] = r["n_events"]

    q = (
        agg.writeStream.foreachBatch(upsert)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = [(h, x, y, n) for (h, x, y), n in sink.items()]
    out = spark.createDataFrame(
        rows, "hour string, tile_x long, tile_y long, n_events long"
    )
    return out, len(batches)
