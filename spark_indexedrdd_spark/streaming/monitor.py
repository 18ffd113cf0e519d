"""Streaming event-rate monitoring: a foreachBatch counts store whose
read path reports exactly what the batch operator
(operators.analytics.event_rate_anomalies) would say over the same
events — the monitoring twin of the signature/sketch/IVF stores.

State: one (event_type, bucket, cnt) row per micro-batch per touched
hour — KB-sized, independent of event volume. Micro-batches that split
an hour are handled by the read-time SUM merge (counts are additive),
so verdicts are invariant to trigger cadence (pytest-pinned
stream ≡ batch).

Delivery: each micro-batch writes to ``path/batch_id=N`` with
mode=overwrite — an at-least-once REPLAY of batch N overwrites its own
directory instead of double-counting (the classic idempotent
foreachBatch sink; stronger than the append-only sketch store, which
tolerates replays only statistically)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HOUR_US = 3_600_000_000


def _batch_counts(df: DataFrame) -> DataFrame:
    return (
        df.select(
            "event_type", F.expr(f"ts_us div {HOUR_US}").alias("bucket")
        )
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


class StreamingEventRateMonitor:
    """foreachBatch ingest of hourly per-type counts. Attach to a
    stream of events rows (must carry ``ts_us``; use the
    sources.tables normalization or derive it in the stream)."""

    def __init__(self, path: str):
        self.path = path

    def foreach_batch(self, batch_df, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        _batch_counts(batch_df).write.mode("overwrite").parquet(
            f"{self.path}/batch_id={batch_id}"
        )

    def attach(self, stream_df, checkpoint_dir: str, **trigger_kwargs):
        return (
            stream_df.writeStream.outputMode("update")
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(self.foreach_batch)
            .trigger(**trigger_kwargs)
            .start()
        )


def read_event_anomalies(
    spark,
    path: str,
    z_thresh: float = 3.0,
    baseline_hours: int = 24,
    min_baseline: int = 12,
) -> DataFrame:
    """Merge the counts store (SUM per (type, bucket) across batches)
    and run the SAME z-score derivation as the batch operator — one
    shared implementation (analytics.anomalies_from_counts), so stream
    and batch verdicts cannot drift apart."""
    from spark_indexedrdd_spark.operators.analytics import (
        anomalies_from_counts,
    )

    counts = (
        spark.read.parquet(path)
        .groupBy("event_type", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    return anomalies_from_counts(
        counts, z_thresh, baseline_hours, min_baseline
    )
