"""Streaming analytics operators: stream-stream interval join and
watermarked stream deduplication.

Completes the Structured Streaming operator surface next to
``crawl_stream`` (file-source ingest + foreachBatch, windowed watermark
aggregation, applyInPandasWithState): the two remaining canonical
stateful patterns a production event feed needs —

- **click attribution** as a stream-stream self-join: each click pairs
  with the same user's views in the preceding ``gap_seconds``. Both
  sides carry watermarks and the join predicate bounds view_ts to a
  CLOSED interval relative to click_ts, so Spark can expire join state:
  without the time bound the state store grows forever at 100 TB/day.
- **stream dedup** via ``dropDuplicatesWithinWatermark``: exactly-once
  seed/URL feeds from at-least-once transports. State per key expires
  after the watermark passes, unlike plain ``dropDuplicates`` whose
  state is unbounded on a stream.

Both run with ``trigger(availableNow=True)`` in tests — same code path
a continuous trigger uses, but drainable and deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = [
    "click_attribution_stream",
    "dedup_stream",
    "session_rollup_stream",
    "EVENTS_SCHEMA",
]

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _events_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)


def click_attribution_stream(
    spark: SparkSession,
    events_dir: str,
    gap_seconds: int = 3600,
    watermark: str = "2 hours",
    query_name: str = "attribution",
):
    """clicks ⨝ same-user views within the trailing ``gap_seconds``
    (inclusive both ends), as a watermarked stream-stream join into an
    in-memory sink; returns the started StreamingQuery."""
    ev = _events_stream(spark, events_dir)
    clicks = (
        ev.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", watermark)
    )
    views = (
        ev.where(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("view_ts", watermark)
    )
    joined = clicks.join(
        views,
        F.expr(
            f"""
            c_user = v_user AND
            view_ts <= click_ts AND
            view_ts >= click_ts - INTERVAL {int(gap_seconds)} SECONDS
            """
        ),
        "inner",
    ).select("click_id", F.col("c_user").alias("user_id"), "view_id")
    return (
        joined.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def dedup_stream(
    spark: SparkSession,
    events_dir: str,
    keys: list[str] | None = None,
    event_time: str = "ts",
    watermark: str = "2 hours",
    query_name: str = "deduped",
):
    """at-least-once feed → exactly-once rows on ``keys`` via
    ``dropDuplicatesWithinWatermark`` (key state expires with the
    watermark); returns the started StreamingQuery."""
    keys = keys or ["event_id"]
    ev = _events_stream(spark, events_dir).withWatermark(event_time, watermark)
    deduped = ev.dropDuplicatesWithinWatermark(keys)
    return (
        deduped.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def session_rollup_stream(
    spark: SparkSession,
    events_dir: str,
    gap: str = "30 minutes",
    watermark: str = "0 seconds",
    query_name: str = "sessions",
):
    """Per-user gap sessionization on a stream via ``session_window`` —
    the streaming twin of the batch ``q_gap_sessions`` query.

    ``session_window`` keeps ONE merging window per (user, open session)
    in the state store and the watermark closes it ``gap`` after the
    user's last event — state is O(open sessions), not O(events), which
    is what makes gap sessionization viable on an unbounded feed. Append
    mode emits each session exactly once, when it closes; the batch
    lag-flag/running-sum formulation (queries.py::q_gap_sessions) cannot
    run on a stream because lag needs the whole history per key.

    Returns the started StreamingQuery writing to an in-memory sink.
    """
    ev = _events_stream(spark, events_dir).withWatermark("ts", watermark)
    agg = (
        ev.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
