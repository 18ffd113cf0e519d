"""Structured Streaming surface: event-time windows + watermarks over the
events stream, with batch-equivalent formulations for the oracle gate.

The reference has no streaming at all (SURVEY.md §2.5); its closest analog
is the batch-incremental fullOuterJoin(maybeLazy) pattern
(reference IndexedRDD.scala:237-252). Here the same aggregation logic runs
in BOTH modes from one definition:

- batch: F.window over the static events table (oracle-checkable);
- streaming: identical plan over readStream + withWatermark, verified in
  tests with an availableNow trigger against the batch result.

Scale: windowed aggregation shuffles on (window, keys) with partial
aggregation; the watermark bounds state size — late rows beyond it are
dropped instead of growing state forever.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _as_stream_dir(path: str) -> str:
    """The file-based streaming source needs a DIRECTORY. If given a
    single parquet file, expose it via a symlink in a temp dir."""
    if os.path.isdir(path):
        return path
    d = tempfile.mkdtemp(prefix="stream_src_")
    os.symlink(os.path.abspath(path), os.path.join(d, os.path.basename(path)))
    return d


def events_stream(spark: SparkSession, events_path: str) -> DataFrame:
    """readStream over the events parquet, normalized (ts_us + ts).
    Sets the nanos-timestamp legacy conf itself — streaming entry points
    must be session-independent, never rely on an earlier load_table
    call having set it (the harness runs queries in ITS session)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch_df = spark.read.parquet(events_path)
    stream = spark.readStream.schema(batch_df.schema).parquet(
        _as_stream_dir(events_path)
    )
    from spark_indexedrdd_spark.sources.tables import _normalize_events

    return _normalize_events(stream)


def tumbling_counts(events: DataFrame, minutes: int = 60) -> DataFrame:
    """Tumbling event-time window: per (window, event_type) count + exact
    value sum. Works on a batch OR streaming events DataFrame."""
    return (
        events.groupBy(
            F.window("ts", f"{minutes} minutes").alias("w"), "event_type"
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("win_start_us"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sql_tumbling_counts(minutes: int = 60) -> str:
    """DuckDB twin: time_bucket over epoch micros. Spark's window()
    aligns tumbling windows to the epoch, as does time_bucket."""
    us = minutes * 60 * 1_000_000
    return f"""
        SELECT (epoch_us(ts) // {us}) * {us} AS win_start_us,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY 1, 2
    """


def sliding_counts(events: DataFrame, length_min: int = 60, slide_min: int = 30) -> DataFrame:
    """Sliding window counts per event_type."""
    return (
        events.groupBy(
            F.window("ts", f"{length_min} minutes", f"{slide_min} minutes").alias("w"),
            "event_type",
        )
        .agg(F.count("*").cast("long").alias("n"))
        .select(
            F.unix_micros(F.col("w.start")).alias("win_start_us"),
            "event_type",
            "n",
        )
    )


def sql_sliding_counts(length_min: int = 60, slide_min: int = 30) -> str:
    """DuckDB twin. Spark aligns sliding windows to the epoch in steps of
    the slide; an event at t belongs to the L/S windows with starts
    floor(t/S)*S - i*S, i in [0, L/S) (all satisfy start > t-L when S
    divides L)."""
    slide_us = slide_min * 60 * 1_000_000
    hops = length_min // slide_min
    return f"""
        SELECT (epoch_us(e.ts) // {slide_us}) * {slide_us} - h.i * {slide_us} AS win_start_us,
               e.event_type,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events e, (SELECT UNNEST(range({hops})) AS i) h
        GROUP BY 1, 2
    """


def session_window_counts(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Native session windows (F.session_window): gap-based sessions per
    user computed by the engine's session-window operator — the
    streaming-capable twin of operators/analytics.sessionize (which
    builds sessions with lag+cumsum). Equivalence of the two is asserted
    in tests. Works on batch and streaming inputs (streaming requires a
    watermark upstream)."""
    return (
        events.groupBy(
            F.session_window("ts", f"{gap_minutes} minutes").alias("w"),
            "user_id",
        )
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("sess_start_us"),
            "n_events",
        )
    )


def streaming_tumbling_counts(
    spark: SparkSession,
    events_path: str,
    minutes: int = 60,
    watermark: str = "2 hours",
) -> DataFrame:
    """The same tumbling aggregation as a STREAMING query: parquet
    readStream + event-time watermark (late rows beyond it dropped,
    bounding state). Returned unstarted; tests drive it with
    trigger(availableNow=True) into a memory sink and diff against
    tumbling_counts on the same data."""
    stream = events_stream(spark, events_path)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{minutes} minutes").alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("win_start_us"),
            "event_type",
            "n",
            "total_value",
        )
    )


def run_stream_to_memory(df: DataFrame, name: str) -> None:
    """Drive an availableNow streaming query to completion synchronously
    (complete mode: windowed aggregation emits final rows)."""
    q = (
        df.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
