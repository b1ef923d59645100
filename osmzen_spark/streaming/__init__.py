from osmzen_spark.streaming.events import (
    EVENTS_SCHEMA,
    read_events_stream,
    sessionize_batch,
    sessionize_stream,
    stream_dedup_events,
    stream_events_hourly,
    stream_tile_counts,
    tile_counts_batch,
)

__all__ = [
    "EVENTS_SCHEMA",
    "read_events_stream",
    "sessionize_batch",
    "sessionize_stream",
    "stream_dedup_events",
    "stream_events_hourly",
    "stream_tile_counts",
    "tile_counts_batch",
]
