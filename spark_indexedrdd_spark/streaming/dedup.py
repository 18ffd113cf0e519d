"""Streaming dedup with bounded state — the streaming twin of
``functions.dedup.exact_dedup``.

An unbounded ``dropDuplicates`` must keep every key ever seen; at
100 TB/day of events that state never stops growing. The native
Structured Streaming operator ``dropDuplicatesWithinWatermark`` keeps a
key's state only until the event-time watermark passes it, so state is
O(keys-per-watermark-window), not O(keys-ever). Duplicates arriving
within the watermark horizon (the realistic at-least-once-delivery case:
retries, replayed micro-batches) are dropped; a duplicate arriving later
than the watermark is by definition outside the delivery-replay horizon.

The reference has no streaming surface at all (SURVEY.md §2); this sits
alongside the repo's other Structured Streaming operators
(windows.py, stateful.py, kv_sink.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from spark_indexedrdd_spark.streaming.windows import _as_stream_dir, events_stream


def streaming_dedup(
    spark: SparkSession,
    events_path: str,
    keys: Sequence[str] = ("event_id",),
    watermark: str = "2 hours",
) -> DataFrame:
    """readStream over the events table, event-time watermark on ``ts``,
    first-occurrence dedup by ``keys`` with watermark-bounded state.
    Returned unstarted; drive with ``trigger(availableNow=True)`` in
    append mode (dedup emits rows immediately — no window close to wait
    for)."""
    stream = events_stream(spark, events_path)
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )
